"""Pipelines: end-to-end KG construction, checkpoint/resume, queries."""

from .checkpoint import run_kg_pipeline_resumable
from .kg import (annotate_pages, dedup_triples, materialize_adjacency,
                 prepare_index, run_kg_pipeline)

__all__ = ["run_kg_pipeline", "run_kg_pipeline_resumable", "prepare_index",
           "annotate_pages", "dedup_triples", "materialize_adjacency"]
