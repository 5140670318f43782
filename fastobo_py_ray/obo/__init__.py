"""Ontology backbone: OBO parsing, identifier semantics, macros, writer."""

from . import ids
from .model import Frame, HeaderMeta, Ontology
from .parser import ParseError, ParseResult, load, loads
from .serializer import dump, dumps

__all__ = ["ids", "Frame", "HeaderMeta", "Ontology", "ParseError",
           "ParseResult", "load", "loads", "dump", "dumps"]
