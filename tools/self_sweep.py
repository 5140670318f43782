"""Full-registry self-sweep (VERDICT r4 ask #2): run EVERY queries()
entry against its DuckDB oracle at all three scale factors via
tools/check_oracles.py (fresh Ray session per SF), and merge the
per-entry results into one committed artifact in the driver's
CORRECTNESS schema:

    python tools/self_sweep.py [CORRECTNESS_SELF_r05.json] [sf ...]

The artifact keys are scale factors; each value maps entry ->
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
(rows-only entries carry err="no_oracle", exactly like the driver's
sampled sweep) so the next judge can diff the driver's sample against
this full sweep line by line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "CORRECTNESS_SELF_r05.json"
    sfs = sys.argv[2:] or ["sf0.001", "sf0.01", "sf0.1"]
    merged = {}
    fail = 0
    for sf in sfs:
        tmp = f"/tmp/self_sweep_{sf}.json"
        print(f"=== {sf} ===", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracles.py"),
             "--json", tmp, f"/root/testdata/{sf}"]).returncode
        fail |= rc
        with open(tmp) as fh:
            merged[sf] = json.load(fh)
        with open(out_path, "w") as fh:   # checkpoint after each SF
            json.dump(merged, fh, indent=2)
    n = sum(len(v) for v in merged.values())
    bad = [(sf, k) for sf, v in merged.items() for k, r in v.items()
           if r["err"] not in (None, "no_oracle")]
    print(f"wrote {out_path}: {n} entry-results across {len(merged)} "
          f"SFs, {len(bad)} failures {bad[:10]}")
    return 1 if (fail or bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
