"""Ontology backbone: OBO parsing, identifier semantics, macros, writers.

API parity with the reference's top-level module (``fastobo.load/loads/
iter/load_graph/dump_graph/dump_owl``, ``/root/reference/src/py/mod.rs``):
``iter`` is the Ray Dataset source
:func:`fastobo_py_ray.sources.obo_source.read_obo_frames`.
"""

from . import ids
from .graphjson import dump_graph, dumps_graph, load_graph, loads_graph
from .model import Frame, HeaderMeta, Ontology
from .owl import dump_owl, dumps_owl
from .parser import ParseError, ParseResult, load, loads
from .serializer import dump, dumps

__all__ = ["ids", "Frame", "HeaderMeta", "Ontology", "ParseError",
           "ParseResult", "load", "loads", "dump", "dumps",
           "load_graph", "loads_graph", "dump_graph", "dumps_graph",
           "dump_owl", "dumps_owl"]
