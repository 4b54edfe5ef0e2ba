"""map_batches stages: validate, extract (actor pool), dedup,
similarity, metrics, multimodal plumbing."""
