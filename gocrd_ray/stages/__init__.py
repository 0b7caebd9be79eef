"""map_batches stage bodies and actor classes."""
