"""fastobo_py_ray — a Ray-Data-native knowledge-graph-construction engine.

Reimagines the ontology data model and canonicalization semantics of
fastobo/fastobo-py (reference at /root/reference, v0.14.1) as the backbone of
a distributed triple-extraction pipeline over Common-Crawl-style web pages:

* :mod:`.obo` — OBO 1.4 parsing / identifier semantics / serialization
  (driver-side; the ontology is broadcast, the corpus is distributed);
* :mod:`.sources` — page-corpus readers and adapters;
* :mod:`.stages` — Ray Data batch transforms and actor-pool stages
  (text extraction, mention detection, entity linking, triple emission,
  canonicalization, dedup, text stats, similarity search);
* :mod:`.pipelines` — end-to-end composed pipelines;
* :mod:`.state` — lineage manifests, checkpoint/resume;
* :mod:`.testing` — deterministic fixtures (pages corpus, mini ontologies).

No module in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

# Reference-namespace convenience surface: a fastobo user's top-level
# calls (fastobo.load / loads / load_graph / dump_graph / dump_owl /
# iter / fastobo.id.*, src/py/mod.rs pyfunctions) resolve here with the
# same names — `iter` returns the parallel Ray Dataset frame source
# (the engine's projection of the reference's threaded frame iterator).
from .obo import (dump, dump_graph, dump_owl, dumps, dumps_graph,  # noqa: E402,F401
                  dumps_owl, load, load_graph, loads, loads_graph)
from .obo import ids as id  # noqa: E402,F401,A001
from .sources.obo_source import read_obo_frames as iter  # noqa: E402,F401,A001

__all__ = [
    "load", "loads", "dump", "dumps", "load_graph", "loads_graph",
    "dump_graph", "dumps_graph", "dump_owl", "dumps_owl", "id", "iter",
    "__version__",
]
