"""Relational building blocks (joins, lookups)."""

from .relops import broadcast_join, hash_join, lookup_map

__all__ = ["broadcast_join", "hash_join", "lookup_map"]
