"""Ray Data execution-context policy for this engine.

Measured pathology (single node, 32 files x 600k pages, Ray 2.49): with the
default ``ReservationOpResourceAllocator``, a DAG of
``read -> map_batches(annotate) -> repartition -> groupby -> sort`` runs the
map stage at ~1 concurrent task regardless of ``num_cpus`` — the reservation
splits the CPU budget across every operator including the three all-to-all
stages, starving the only compute-heavy operator (38.5s vs 7.0s at 8 CPUs).

Our pipelines always pre-reduce before a shuffle (combiner pattern), so the
all-to-all inputs are orders of magnitude smaller than the map input and the
reservation buys no memory safety here; we disable it and let operators
compete for the shared budget.  Re-enable with FASTOBO_RAY_OP_RESERVATION=1
for pipelines that shuffle unreduced data.
"""

from __future__ import annotations

import os


def tune_data_context():
    """Apply the engine's DataContext policy; idempotent, safe pre-init."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if os.environ.get("FASTOBO_RAY_OP_RESERVATION", "0") != "1":
        ctx.op_resource_reservation_enabled = False
    # "0" / "0.0" means DISABLED (the conventional off value), not a
    # zero logical budget — fraction 0.0 would backpressure every
    # operator to a standstill
    over = float(os.environ.get("FASTOBO_RAY_STORE_OVERCOMMIT") or 0)
    if over > 0:
        allow_store_overcommit(over)
    return ctx


def allow_store_overcommit(multiple: float = 4.0):
    """Let Ray Data's LOGICAL object-store budget exceed the physical
    plasma cap by ``multiple``x, so blocking all-to-all stages (sort /
    hash exchanges) keep admitting producer tasks and lean on plasma's
    transparent disk spill for the overflow, instead of collapsing to
    ~1 concurrent task.

    Measured pathology (1M-doc ``minhash_dedup``, 32 cpus, plasma
    capped to 1-4 GiB — below the ~10 GiB verify-exchange working
    set): the streaming executor's logical budget is plasma x 0.25
    (the no-reservation default fraction), every map op upstream of
    the blocking exchange sits ``[backpressured]`` at <=1 running
    task, and block progress stalls at ~30/256 after 8 minutes — a
    >20x collapse while the DISK the store would spill to is idle.
    The budget is logical bookkeeping (`resource_manager.py`
    ``get_global_limits``: detected plasma x fraction); plasma itself
    never exceeds its cap — overflow objects spill to disk and
    restore on demand — so overcommitting the bookkeeping is safe for
    heap: worker memory is bounded by concurrent tasks x batch size,
    both unchanged.  See BASELINE.md "spill rehearsal (round 5)" for
    the capped-vs-uncapped measurements.

    On a multi-node deployment this is the "per-node store smaller
    than the node's shuffle share" regime.  Prefer sizing
    ``num_*_buckets`` so each bucket fits the node store; use this
    overcommit to survive when the estimate is wrong.  Also settable
    per-process via FASTOBO_RAY_STORE_OVERCOMMIT=<multiple>.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.override_object_store_memory_limit_fraction = float(multiple)
    return ctx
