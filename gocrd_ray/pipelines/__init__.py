"""Composed Dataset pipelines (flagship extraction, resumable runs, metrics)."""
