"""Checkpoint / lineage / metrics state for resumable pipelines."""
