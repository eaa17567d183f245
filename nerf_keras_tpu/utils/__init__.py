"""Utilities: image resize, storage IO, metrics/history, checkpointing,
visualization, profiling."""
