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
    return ctx
