"""End-to-end Ray Data pipelines."""

from .extraction import extraction_pipeline, read_transcripts, run_flagship

__all__ = ["extraction_pipeline", "read_transcripts", "run_flagship"]
