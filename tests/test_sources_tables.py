"""JSONL/CSV table sources must be drop-in equivalents of the parquet
path under the (columns, schema) projection contract."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001/documents.parquet"


def _dump(tmp_path):
    df = pd.read_parquet(SF)
    jl = tmp_path / "docs.jsonl"
    df.to_json(jl, orient="records", lines=True)
    cv = tmp_path / "docs.csv"
    df.to_csv(cv, index=False)
    return str(jl), str(cv), df


def test_jsonl_csv_roundtrip_matches_parquet(ray_session, tmp_path):
    from fastobo_py_ray.sources.tables import read_table

    jl, cv, df = _dump(tmp_path)
    schema = pq.read_schema(SF)
    cols = ["doc_id", "lang", "n_chars"]
    want = df[cols].sort_values("doc_id").reset_index(drop=True)
    for path, fmt in ((jl, "jsonl"), (cv, "csv")):
        got = read_table(path, format=fmt, columns=cols,
                         schema=schema).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the schema cast pins the parquet dtypes exactly
        got_t = read_table(path, format=fmt, columns=cols,
                           schema=schema).schema()
        assert got_t.base_schema.field("n_chars").type == pa.int64()


def test_read_table_rejects_unknown_format(ray_session):
    import pytest

    from fastobo_py_ray.sources.tables import read_table

    with pytest.raises(ValueError):
        read_table("/tmp/x", format="orc")


def test_q_profile_handles_nulls_and_all_null_columns(ray_session,
                                                      tmp_path):
    """End-to-end on a crafted lineitem with NULLs (incl. one all-null
    profiled column): engine output must equal the DuckDB oracle —
    exercises the NaN min/max sentinel and the left-merge n_distinct=0
    path that the null-free sf tables leave latent."""
    import duckdb
    import numpy as np

    from fastobo_py_ray.pipelines.queries import _profile_sql, q_profile

    df = pd.DataFrame({
        "l_quantity": [1.0, np.nan, 3.0, 3.0, np.nan],
        "l_discount": [np.nan] * 5,                     # all-null column
        "l_returnflag": ["A", None, "R", "A", None],
        "l_shipdate": pd.to_datetime(
            ["2020-01-02", None, "2021-06-30", "2020-01-02", None]),
    })
    df.to_parquet(tmp_path / "lineitem.parquet")
    got = q_profile(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    want = con.execute(_profile_sql()).df()
    g = got.fillna("~null~").astype(str)
    w = want[got.columns].fillna("~null~").astype(str)
    pd.testing.assert_frame_equal(
        g.reset_index(drop=True), w.reset_index(drop=True))


def test_read_table_parquet_applies_schema_cast(ray_session, tmp_path):
    from fastobo_py_ray.sources.tables import read_table

    pd.DataFrame({"x": pd.array([1, 2], dtype="int32")}) \
        .to_parquet(tmp_path / "t.parquet")
    sch = pa.schema([("x", pa.int64())])
    got = read_table(str(tmp_path / "t.parquet"), format="parquet",
                     schema=sch).schema()
    assert got.base_schema.field("x").type == pa.int64()


def test_q_first_last_null_values_positional(ray_session, tmp_path):
    """FIRST_VALUE semantics: a NULL in the first row is the answer,
    not skipped (pandas groupby.first would skip it)."""
    import duckdb
    import numpy as np

    from fastobo_py_ray.pipelines.queries import (Q_FIRST_LAST_SQL,
                                                  q_first_last)

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 8, 8],
        "ts": pd.to_datetime(["2020-01-01", "2020-01-02",
                              "2020-01-01", "2020-01-02"]),
        "value": [np.nan, 5.0, 1.0, np.nan]})
    df.to_parquet(tmp_path / "events.parquet")
    got = q_first_last(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(Q_FIRST_LAST_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns],
        check_dtype=False)


def test_write_table_jsonl_roundtrip_and_gzip_read(ray_session,
                                                   tmp_path):
    import gzip

    import pyarrow.parquet as pq
    import ray.data as rd

    from fastobo_py_ray.sources.tables import read_table, write_table

    df = pd.read_parquet(SF)[["doc_id", "lang", "n_chars"]]
    out_dir = tmp_path / "export"
    write_table(rd.from_pandas(df), str(out_dir), format="jsonl")
    back = read_table(str(out_dir), format="jsonl",
                      schema=pq.read_schema(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[["doc_id", "lang", "n_chars"]],
        df.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)

    # gzip-compressed jsonl reads through the same path
    gz = tmp_path / "docs.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        df.to_json(f, orient="records", lines=True)
    import pyarrow as _pa
    got = read_table(str(gz), format="jsonl",
                     columns=["doc_id", "n_chars"],
                     arrow_open_stream_args={"compression": "gzip"}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(df)
    assert got["n_chars"].tolist() == \
        df.sort_values("doc_id")["n_chars"].tolist()


def test_write_table_rejects_unknown_format(ray_session):
    import pytest
    import ray.data as rd

    from fastobo_py_ray.sources.tables import write_table

    with pytest.raises(ValueError):
        write_table(rd.from_pandas(pd.DataFrame({"x": [1]})),
                    "/tmp/x", format="orc")
