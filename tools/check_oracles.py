"""Local replica of the driver's correctness gate: run every queries()
entry and its DuckDB oracle side by side; compare row count, sorted-column
schema, and order-insensitive values. Usage:

    python tools/check_oracles.py [--json OUT.json] [sf_dir] [query ...]

With --json, per-entry results are also written in the driver's
CORRECTNESS_r{N}.json schema (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err; rows-only entries carry
err="no_oracle" like the driver's sweep) so a full self-sweep can be
committed as CORRECTNESS_SELF_r{N}.json and diffed against the
driver's sample.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    results = {}

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    qs, sqls = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        def record(rows_match=None, schema_match=None, hash_match=None,
                   spark_rows=None, oracle_rows=None, err=None):
            results[name] = {
                "rows_match": rows_match, "schema_match": schema_match,
                "hash_match": hash_match, "spark_rows": spark_rows,
                "oracle_rows": oracle_rows, "err": err}

        try:
            got = to_df(fn(sf))
        except Exception as exc:
            print(f"FAIL {name}: query raised {exc!r}")
            record(err=f"query raised: {exc!r}"[:300])
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(got)} rows  [{dt:.1f}s]")
            record(spark_rows=len(got), err="no_oracle")
            continue
        exp = con.execute(sqls[name]).df()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            record(rows_match=len(g) == len(e), schema_match=False,
                   spark_rows=len(g), oracle_rows=len(e),
                   err="schema mismatch")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            record(rows_match=False, schema_match=True,
                   spark_rows=len(g), oracle_rows=len(e),
                   err="row count mismatch")
            failures += 1
            continue
        # the driver's compare HASHES values, so dtype kind matters:
        # int64 1234 vs float64 1234.0 hash-mismatch even when
        # assert_frame_equal(check_dtype=False) passes — this is how
        # the r3 q3 NA-widening regression escaped the local sweep.
        kind_bad = [c for c in g.columns
                    if g[c].dtype.kind != e[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch on {kind_bad}: "
                  f"{[(str(g[c].dtype), str(e[c].dtype)) for c in kind_bad]}")
            record(rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e),
                   err=f"dtype kind mismatch: {kind_bad}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"ok   {name}: {len(g)} rows match  [{dt:.1f}s]")
            record(rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(g), oracle_rows=len(e))
        except AssertionError as exc:
            print(f"FAIL {name}: values differ: {str(exc)[:400]}")
            record(rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e),
                   err=f"values differ: {str(exc)[:200]}")
            failures += 1
    ray.shutdown()
    if json_out:
        import json
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {len(results)} entries -> {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
