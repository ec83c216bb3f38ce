"""Reusable Ray Data stage callables (map_batches bodies, actor-pool classes,
aggregation helpers)."""
