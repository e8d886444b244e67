"""Stateful stream processing: the reference's drain loop (SURVEY §2
A7-A13) as a Structured Streaming pipeline, plus streaming twins of the
batch event-window operators."""

from .drain import DrainConfig, IngestionPipeline

__all__ = ["DrainConfig", "IngestionPipeline"]
