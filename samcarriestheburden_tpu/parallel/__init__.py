"""Device-mesh utilities: data-parallel sharding for training and embedding
precompute.  Greenfield capability — the reference is single-device (SURVEY §5)."""
