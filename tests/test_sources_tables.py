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
