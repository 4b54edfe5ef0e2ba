"""Checkpoint manifests and resumable partition commit."""
