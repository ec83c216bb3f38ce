"""End-to-end Ray Data pipelines: index build, distributed query run, dedup,
ANN, text analytics."""
