"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship KG-construction pipeline over
  ``/root/testdata/sf0.001``: documents -> pages adapter -> mention
  detection/linking actor pool -> canonicalized triple emission -> dedup.
* ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (see ``fastobo_py_ray/pipelines/queries.py``).
* ``oracle_sql()`` — DuckDB oracles with matching column names; stateful
  hash/heuristic ops are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fastobo_py_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _q.kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.registry()


def oracle_sql() -> dict[str, str]:
    return _q.oracles()
