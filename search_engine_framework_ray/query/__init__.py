"""Structured query engine: parser → AST → per-shard DAAT kernels → models →
distributed executor (actor pool + heap merge) and single-process oracle."""
