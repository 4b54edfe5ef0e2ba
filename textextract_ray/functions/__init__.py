"""Vectorized scalar kernels (the reference's scalar-function surface,
SURVEY.md §2.8, re-expressed over Arrow/numpy batches)."""

from . import scalar, text  # noqa: F401
