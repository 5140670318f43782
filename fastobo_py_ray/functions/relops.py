"""Relational building blocks: broadcast joins and partitioned hash joins.

The reference has no joins (single-document library); these are the engine
operators the KG/testdata pipelines compose (SURVEY.md §2.2 coverage:
joins, aggregations, sorts/top-k).

Join strategy selection (ray_guide.md "Joins and lookups"):

* small side (dimension table, representative map, vocab) ->
  :func:`broadcast_join`: ``ray.put`` once, pandas merge per batch inside
  ``map_batches`` — no shuffle, the small side is fetched once per worker.
* both sides large -> :func:`hash_join`: explicit partitioned hash join —
  add ``__bucket = hash(key) % B`` to both sides, tag, union, group by
  bucket, merge within each bucket. Two shuffles total, no driver
  materialization; bucket count B is the skew/parallelism knob (salt hot
  keys into sub-buckets by raising B).

Why not the native ``Dataset.join`` (added in Ray 2.49)? Measured on
this box (sf0.1 lineitem ⋈ orders, 600k x 150k rows, 32 cpus,
num_partitions=32, warm, best of 2): native 5.4s vs :func:`hash_join`
1.5s — 3.6x — and the native API has no ``bucket_finalize`` hook, which
is where q3/q5/minhash piggyback their per-key aggregation/dedup on the
join exchange instead of paying a second all-to-all. Revisit if the
native hash-shuffle closes the gap in a later Ray.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa


def typed_empty(df: pd.DataFrame) -> pd.DataFrame:
    """Give a 0-row frame's object columns an explicit ``string`` dtype.

    Ray's block size estimator calls ``np.vectorize`` over object
    columns and errors on size-0 input (harmless but floods logs at
    scale), and all-null object columns become Arrow null-typed blocks
    that break sort boundaries — typed empties sidestep both.  No-op on
    non-empty frames, so steady-state batches are untouched."""
    if len(df) == 0:
        obj = {c: "string" for c in df.columns if df[c].dtype == object}
        if obj:
            df = df.astype(obj)
    return df


def broadcast_join(ds, small: pd.DataFrame, on: Union[str, List[str]],
                   how: str = "inner", small_ref=None):
    """Join a Dataset against a broadcast pandas DataFrame.

    Pass ``small_ref=ray.put(small)`` to share one copy across tasks (the
    plain ``small`` argument is then ignored); otherwise the frame is
    embedded in the task closure (fine for tiny tables).
    """
    import ray

    ref = small_ref if small_ref is not None else ray.put(small)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return ds.map_batches(_Join, batch_format="pandas", concurrency=(1, 8))


def _apply_cast(df: pd.DataFrame, cast: Optional[Dict[str, str]]
                ) -> pd.DataFrame:
    """Restore declared dtypes after a tagged-union join (NA-widening
    floats int columns and objects datetimes in transit — the q3
    ``1234.0`` vs ``1234`` oracle-hash lesson). Runs INSIDE the bucket
    task so every output block carries the same schema deterministically.
    Columns absent from ``df`` (e.g. dropped by ``bucket_finalize``) are
    skipped; a cast that cannot hold the data (NaN -> int64) raises —
    the caller declared a dtype the join semantics don't guarantee."""
    if not cast:
        return df
    todo = {c: t for c, t in cast.items()
            if c in df.columns and str(df[c].dtype) != str(t)}
    return df.astype(todo) if todo else df


def hash_join(left, right, on: Union[str, List[str]],
              num_buckets: int = 16, how: str = "inner",
              suffixes=("_l", "_r"), bucket_finalize=None,
              lcols: Optional[List[str]] = None,
              rcols: Optional[List[str]] = None,
              salt: Optional[int] = None,
              cast: Optional[Dict[str, str]] = None):
    """Partitioned hash join of two Datasets on equality keys.

    Both sides are hash-bucketed on the key, unioned with a side tag, and
    merged per bucket inside ``groupby(bucket).map_groups`` — the portable
    large-large join (no reliance on a Dataset.join API). Deterministic:
    bucket id is a stable string hash of the key columns. ``how`` covers
    the full pandas merge set (``inner``/``left``/``right``/``outer`` —
    exact per bucket because a bucket holds every row of its keys on
    BOTH sides, so unmatched rows surface in exactly one bucket) and
    also accepts ``"semi"`` / ``"anti"`` (existence filter: left rows
    kept / dropped by key membership in the right side; output columns =
    ``lcols`` only — the scale shape for NOT EXISTS / IN subqueries).

    NULL keys follow SQL semantics on EVERY path (a null key never
    matches): ``inner`` drops null-keyed rows, ``left``/``right``/
    ``outer`` surface them unmatched on their own side, ``semi`` drops
    and ``anti`` keeps null-keyed left rows — unlike raw pandas
    ``merge``, which matches NaN keys to each other.

    ``bucket_finalize(df) -> df`` runs on each bucket's joined frame
    inside the same task.  Because a bucket holds EVERY row of its keys,
    key-grouped aggregation and per-key top-k are exact here — use it to
    piggyback group-bys on the join shuffle instead of paying a second
    all-to-all (partition-aware aggregation).

    Pass ``lcols``/``rcols`` (each side's column names) when known to skip
    the ``schema()`` probes — on an unexecuted upstream a schema probe
    runs part of the plan, and a second consumption re-executes it.
    ``num_buckets`` is also the merge-stage parallelism knob: size it to
    at least the cluster's core count.

    ``salt=S`` is the HOT-KEY remedy for power-law join keys (raising
    ``num_buckets`` only thins the cold keys — one hot key still lands
    wholly in one task): left rows spread across S synthetic sub-keys,
    right rows REPLICATE S times, and the exchange buckets on
    (key, salt), so the hottest key's rows split across S tasks at the
    price of an S-fold copy of the (assumed modest) right side.  Exact
    for ``inner``/``left``/``semi``/``anti``; ``right``/``outer`` raise
    (a replicated right row would surface as unmatched S-1 times), and
    ``bucket_finalize`` raises (a bucket no longer holds every row of
    its keys, so piggybacked per-key aggregation would be partial —
    the analogue of ``grouped_agg(salt=)``'s algebraic-only rule).

    ``cast={"col": "int64", ...}`` restores declared dtypes on the
    joined frame inside each bucket task (after ``bucket_finalize``):
    the tagged union NA-widens each side's exclusive columns (int64 ->
    float64, datetime64 -> object), which is value-preserving for ints
    < 2^53 but NOT schema-preserving — an oracle comparing ``1234`` to
    ``1234.0`` hash-mismatches.  Declare it for any id/date column that
    the join semantics guarantee non-null (always true for the columns
    of ``semi``/``anti``/``inner`` output; left columns of ``left``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt is not None and salt > 1:
        if how in ("right", "outer", "full"):
            raise ValueError(
                f"salted hash_join supports inner/left/semi/anti, not "
                f"{how!r}: replicated right rows would each surface as "
                f"unmatched")
        if bucket_finalize is not None:
            raise ValueError(
                "salted hash_join cannot piggyback bucket_finalize: a "
                "bucket holds only one salt shard of each key")
    else:
        salt = None
    if lcols is None:
        lcols = [c for c in left.schema().names]
    if rcols is None:
        rcols = [c for c in right.schema().names]
    all_cols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            # vectorized, process-stable row hash (fixed internal hash key,
            # independent of PYTHONHASHSEED) — never a per-row Python loop.
            # Numeric keys hash via float64 so int64 on one side and
            # float64 on the other (e.g. a column NA-widened by an earlier
            # hash_join) still land in the same bucket; a float collision
            # only co-locates keys, the in-bucket merge stays exact.
            if salt is None:
                df["__bucket"] = _bucket_ids(df, keys, num_buckets)
            else:
                # bucket = base*S + shard: each key's S shards occupy S
                # DISTINCT buckets by construction.  (Hashing (key,
                # shard) as a pair instead is WRONG: the column-combine
                # can map two shards of one key to the same bucket, and
                # a bucket holding two identical right replicas would
                # double every match there — caught by the 1M-row skew
                # rehearsal, recorded in BASELINE.md.)
                base = _bucket_ids(df, keys, num_buckets)
                if side == "r":
                    # replicate each right row to every salt shard
                    rep = np.repeat(np.arange(len(df)), salt)
                    df = df.iloc[rep].reset_index(drop=True)
                    shard = np.tile(np.arange(salt, dtype="int64"),
                                    len(rep) // salt)
                    base = base[rep] if len(rep) else base
                else:
                    # shard by a WHOLE-ROW hash, not arange % salt: the
                    # round-robin restarts at shard 0 every batch, so
                    # blocks smaller than S would pile the hot key into
                    # low shards; a row-content hash spreads the hot
                    # key's (distinct) rows uniformly and stays
                    # deterministic across runs and partitionings
                    shard = _bucket_ids(df, list(df.columns), salt)
                df["__bucket"] = base * salt + shard
            df["__side"] = side
            # widen to the union schema in the same pass (union requires
            # identical schemas; one map stage per side instead of two).
            # np.nan (not pd.NA): NA-filling an int column must yield
            # float64, never object — an object column of ints would hash
            # differently from its int64 twin in a downstream hash_join.
            for c in all_cols:
                if c not in df.columns:
                    df[c] = np.nan
            return typed_empty(df[all_cols + ["__bucket", "__side"]])
        return fn

    u = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas"))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"][[c for c in lcols]]
        r = df[df["__side"] == "r"][[c for c in rcols]]
        if how in ("semi", "anti"):
            # existence filter: left rows kept (semi) / dropped (anti)
            # by key membership in the right side — exact per bucket.
            # SQL NULL semantics (unlike pandas merge, which matches
            # NaN to NaN): a null key never matches, so null-keyed left
            # rows are dropped by semi and kept by anti, and null-keyed
            # right rows never evidence existence.
            lnull = l[keys].isna().any(axis=1)
            m = l[~lnull].merge(r[keys].dropna().drop_duplicates(),
                                on=keys, how="left", indicator="__in_r")
            keep = m["__in_r"] == ("both" if how == "semi"
                                   else "left_only")
            out = m.loc[keep, lcols]
            if how == "anti" and lnull.any():
                out = pd.concat([out, l.loc[lnull, lcols]],
                                ignore_index=True)
            if bucket_finalize is not None:
                out = bucket_finalize(out)
            return typed_empty(_apply_cast(out, cast))
        # SQL NULL semantics (pandas merge would MATCH NaN keys to each
        # other): null-keyed rows never match — inner drops them,
        # left/right/outer surface them unmatched on their own side.
        lnull = l[keys].isna().any(axis=1)
        rnull = r[keys].isna().any(axis=1)
        out = l[~lnull].merge(r[~rnull], on=keys, how=how,
                              suffixes=suffixes)
        overlap = (set(lcols) & set(rcols)) - set(keys)
        if how in ("left", "outer") and lnull.any():
            ln = l[lnull].rename(
                columns={c: c + suffixes[0] for c in overlap})
            out = pd.concat([out, ln], ignore_index=True)
        if how in ("right", "outer") and rnull.any():
            rn = r[rnull].rename(
                columns={c: c + suffixes[1] for c in overlap})
            out = pd.concat([out, rn], ignore_index=True)
        out = out.drop(columns=[c for c in ("__bucket", "__side")
                                if c in out.columns])
        if bucket_finalize is not None:
            out = bucket_finalize(out)
        return typed_empty(_apply_cast(out, cast))

    return u.groupby("__bucket").map_groups(merge_bucket,
                                            batch_format="pandas")


def asof_join(left, right, on: str, by: str,
              direction: str = "backward", num_buckets: int = 32,
              lcols: Optional[List[str]] = None,
              rcols: Optional[List[str]] = None,
              suffixes=("", "_r"),
              cast: Optional[Dict[str, str]] = None):
    """Distributed as-of join (the time-series join Ray Data lacks): for
    each left row, the nearest right row by ``on`` (backward = most
    recent right.on <= left.on) within the same ``by`` partition key.

    Shape: both sides hash-bucket on ``by`` (ONE exchange, same tagging
    as :func:`hash_join`); inside a bucket — which holds every row of
    its ``by`` keys, so the match is globally exact — both sides sort by
    ``on`` and run C-speed ``pandas.merge_asof(..., by=by)``.
    Partitioning assumption: per-``by``-key row count fits a task (same
    bound as any keyed exchange); ``num_buckets`` is the skew knob.
    Left rows with no match keep NaN/NaT right columns (left join).
    Dtype note: the tagged union NA-widens each side's exclusive
    columns, so integer columns (including LEFT-side ones like an int
    event id) come back float64 — declare ``cast={"col": "int64"}``
    (applied per bucket, like :func:`hash_join`) for LEFT columns,
    which an as-of join never nulls; right columns stay nullable.
    """
    if lcols is None:
        lcols = [c for c in left.schema().names]
    if rcols is None:
        rcols = [c for c in right.schema().names]
    all_cols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str, cols: List[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__bucket"] = _bucket_ids(df, [by], num_buckets)
            df["__side"] = side
            for c in all_cols:
                if c not in df.columns:
                    df[c] = np.nan
            return typed_empty(df[all_cols + ["__bucket", "__side"]])
        return fn

    u = left.map_batches(tag("l", lcols), batch_format="pandas").union(
        right.map_batches(tag("r", rcols), batch_format="pandas"))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # l and r slice the SAME combined frame, so the on/by columns
        # (present on both sides) share one dtype by construction;
        # only side-exclusive columns NA-widen (see docstring)
        l = df[df["__side"] == "l"][lcols].sort_values(on)
        r = df[df["__side"] == "r"][rcols].sort_values(on)
        out = pd.merge_asof(l, r, on=on, by=by, direction=direction,
                            suffixes=suffixes)
        return _apply_cast(out, cast)

    return u.groupby("__bucket").map_groups(merge_bucket,
                                            batch_format="pandas")


def range_join(left, right, by: str, on: str, lo: str, hi: str,
               num_buckets: int = 32,
               lcols: Optional[List[str]] = None,
               rcols: Optional[List[str]] = None,
               closed: str = "both"):
    """Distributed range (interval) join Ray Data lacks: each left row
    (point ``on``) pairs with every right row whose ``[lo, hi]`` interval
    contains it, within the same ``by`` equality key.

    Shape: ONE keyed exchange — both sides hash-bucket on ``by`` (same
    tagged-union as :func:`hash_join`); inside a bucket, which holds
    every row of its ``by`` keys, an equi-merge on ``by`` followed by a
    vectorized interval mask is globally exact.  ``closed`` picks the
    boundary semantics: ``"both"`` = ``lo <= on <= hi``, ``"left"`` =
    ``lo <= on < hi``, ``"right"`` = ``lo < on <= hi``.

    Partitioning assumption (document per call site): the in-bucket
    merge materializes the per-``by``-key cross product before the mask,
    so per-key ``n_left x n_right`` must fit a task — true for
    event-vs-window workloads where windows per key are bounded.  For
    unbounded fanout, pre-split intervals into fixed-width time chunks
    and add the chunk id to ``by`` (turns the blowup into per-chunk
    work); ``num_buckets`` remains the skew/parallelism knob.
    """
    if closed not in ("both", "left", "right"):
        raise ValueError(
            f"range_join closed must be 'both', 'left' or 'right' "
            f"(got {closed!r}) — a typo here would silently change "
            f"boundary semantics")
    if lcols is None:
        lcols = [c for c in left.schema().names]
    if rcols is None:
        rcols = [c for c in right.schema().names]
    overlap = (set(lcols) & set(rcols)) - {by}
    if overlap:
        raise ValueError(
            f"range_join: columns {sorted(overlap)} exist on BOTH "
            f"sides; pandas would suffix them _x/_y and the interval "
            f"mask could silently read the wrong one — rename before "
            f"joining (only the `by` key may be shared)")
    all_cols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str, cols: List[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__bucket"] = _bucket_ids(df, [by], num_buckets)
            df["__side"] = side
            for c in all_cols:
                if c not in df.columns:
                    df[c] = np.nan
            return typed_empty(df[all_cols + ["__bucket", "__side"]])
        return fn

    u = left.map_batches(tag("l", lcols), batch_format="pandas").union(
        right.map_batches(tag("r", rcols), batch_format="pandas"))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"][lcols]
        r = df[df["__side"] == "r"][rcols]
        m = l.merge(r, on=by, how="inner")
        if closed == "both":
            keep = (m[on] >= m[lo]) & (m[on] <= m[hi])
        elif closed == "left":
            keep = (m[on] >= m[lo]) & (m[on] < m[hi])
        else:
            keep = (m[on] > m[lo]) & (m[on] <= m[hi])
        return typed_empty(m[keep])

    return u.groupby("__bucket").map_groups(merge_bucket,
                                            batch_format="pandas")


def _bucket_ids(df: pd.DataFrame, keys: List[str],
                num_buckets: int) -> np.ndarray:
    """Stable hash-bucket id per row (same numeric-widening rule as
    :func:`hash_join` so int64/float64 twins of a key co-locate)."""
    kdf = df[keys].copy()
    for c in keys:
        if pd.api.types.is_numeric_dtype(kdf[c]):
            kdf[c] = kdf[c].astype("float64")
    h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
    return (h % num_buckets).astype("int64")


def grouped_map(ds, keys: Union[str, List[str]], bucket_fn,
                num_buckets: int = 64, exchange: str = "pandas"):
    """High-cardinality groupby-apply: coarse hash-bucket shuffle, then a
    C-speed pandas groupby inside each bucket task.

    Ray Data's sort-based ``groupby(keys)`` pays a fixed Python cost per
    distinct group (group-boundary slicing + per-group callable dispatch,
    ~0.1 ms/group measured on this box) — ruinous when the key is
    high-cardinality (content hashes, shingles, LSH buckets: 10^4..10^9
    groups). This helper keeps the exchange to ``num_buckets`` coarse
    groups and hands each task the FULL frame of its bucket; because a
    bucket holds every row of its keys, any per-key computation done
    inside ``bucket_fn`` (``df.groupby(keys).agg``, dedup, pair
    explosion) is globally exact.

    ``bucket_fn(df) -> df`` receives one bucket's rows (``__bucket``
    already dropped) and does its own in-task pandas groupby over
    ``keys``. ``num_buckets`` is the parallelism/skew knob — size it to
    the cluster's core count; per-key skew inside a bucket is bounded by
    the hottest single key, same as any hash exchange.

    ``exchange`` selects the BLOCK FORMAT the shuffle moves:
    ``"pandas"`` (default) ships pandas blocks — object-string columns
    cost ~2-3x Arrow memory on fat text; ``"pyarrow"`` tags and
    exchanges Arrow blocks (bucket ids computed from the KEY columns
    only — the fat payload columns never convert) and converts to
    pandas only inside each bucket task, so ``bucket_fn`` is unchanged.
    Measured A/B in BASELINE.md (passage_dedup / minhash verify);
    note an object-dtype string column comes back from Arrow as
    object, not pandas ``string`` — bucket_fns here don't care.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    if exchange == "pyarrow":
        import pyarrow as pa

        def tag_a(t: "pa.Table") -> "pa.Table":
            b = _bucket_ids(t.select(keys).to_pandas(), keys,
                            num_buckets)
            return t.append_column("__bucket", pa.array(b, pa.int64()))

        def run_a(t: "pa.Table") -> "pa.Table":
            df = t.drop_columns(["__bucket"]).to_pandas()
            return pa.Table.from_pandas(typed_empty(bucket_fn(df)),
                                        preserve_index=False)

        return ds.map_batches(tag_a, batch_format="pyarrow") \
                 .groupby("__bucket") \
                 .map_groups(run_a, batch_format="pyarrow")
    if exchange != "pandas":
        raise ValueError(f"exchange must be pandas|pyarrow: {exchange!r}")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_ids(df, keys, num_buckets)
        return typed_empty(df)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return typed_empty(bucket_fn(df.drop(columns="__bucket")))

    return ds.map_batches(tag, batch_format="pandas") \
             .groupby("__bucket").map_groups(run, batch_format="pandas")


def group_min(df: pd.DataFrame, keys: List[str], col: str) -> pd.DataFrame:
    """``df.groupby(keys)[col].min()`` safe for string/object columns:
    pandas' per-group min over object dtype is a Python-level fallback
    (~30x slower, measured 18s vs 0.3s on 600k rows); computing the min
    on sorted factor codes stays in C and maps back exactly. Numeric
    columns take the plain C path directly. NaN semantics match
    ``groupby.min``: nulls are skipped; an all-null group yields NaN
    (factorize codes NaN as -1, which would otherwise win every min
    and wrap ``take(-1)`` to the LARGEST unique — guarded here)."""
    if df.empty:
        return df.loc[:, keys + [col]]
    if pd.api.types.is_numeric_dtype(df[col]):
        return df.groupby(keys, as_index=False, sort=False)[col].min()
    if df[col].isna().any():
        nn = df.dropna(subset=[col])
        out = group_min(nn, keys, col) if not nn.empty \
            else nn.loc[:, keys + [col]]
        allna = df[keys].drop_duplicates().merge(
            out[keys], on=keys, how="left", indicator="__in")
        miss = allna.loc[allna["__in"] == "left_only", keys]
        if len(miss):
            out = pd.concat([out, miss.assign(**{col: np.nan})],
                            ignore_index=True)
        return out
    codes, uniq = pd.factorize(df[col], sort=True)
    out = df.assign(__code=codes).groupby(
        keys, as_index=False, sort=False)["__code"].min()
    out[col] = np.asarray(uniq).take(out.pop("__code").to_numpy())
    return out


_SALT_REAGG = {"sum": "sum", "count": "sum", "size": "sum",
               "min": "min", "max": "max"}


def grouped_agg(ds, keys: Union[str, List[str]],
                num_buckets: int = 64, salt: Optional[int] = None,
                **named_aggs):
    """:func:`grouped_map` convenience for named aggregations:
    ``grouped_agg(ds, "k", out=("col", "sum"))`` ==
    ``SELECT k, sum(col) AS out GROUP BY k`` with no per-group Python.

    ``salt=S`` splits every key across ``S`` synthetic sub-keys for the
    first exchange and re-reduces the S partials in a second (tiny)
    exchange — the standard hot-key remedy when one group's rows exceed
    a single bucket task's capacity (a power-law key at corpus scale).
    Only algebraic aggregations can be salted (sum/count/size/min/max —
    the partials recombine exactly); anything else raises rather than
    silently double-counting.  The per-batch combiner most callers
    already run makes salting unnecessary for KB-scale partials; reach
    for it when raw rows must move, e.g. collecting distinct pairs.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys_l, as_index=False, sort=False).agg(**named_aggs)

    if salt is None or salt <= 1:
        return grouped_map(ds, keys_l, agg, num_buckets=num_buckets)

    bad = {n: f for n, (c, f) in named_aggs.items()
           if f not in _SALT_REAGG}
    if bad:
        raise ValueError(
            f"salted grouped_agg supports only algebraic aggregations "
            f"{sorted(_SALT_REAGG)}; got {bad}")

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # any row->[0,S) spread works (aggregation is invariant to the
        # assignment); arange keeps it deterministic and loop-free
        df["__salt"] = np.arange(len(df), dtype="int64") % salt
        return df

    part = grouped_map(ds.map_batches(add_salt, batch_format="pandas"),
                       keys_l + ["__salt"],
                       lambda df: df.groupby(
                           keys_l + ["__salt"], as_index=False,
                           sort=False).agg(**named_aggs),
                       num_buckets=num_buckets)
    part = part.map_batches(
        lambda df: df.drop(columns="__salt"), batch_format="pandas")
    reaggs = {n: (n, _SALT_REAGG[f]) for n, (c, f) in named_aggs.items()}
    return grouped_map(part, keys_l,
                       lambda df: df.groupby(
                           keys_l, as_index=False, sort=False)
                       .agg(**reaggs),
                       num_buckets=num_buckets)


def lookup_map(ds_or_df, key: str, value: str) -> Dict:
    """Small table -> python dict (driver-side; for broadcast lookups)."""
    df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") and not \
        isinstance(ds_or_df, pd.DataFrame) else ds_or_df
    return dict(zip(df[key], df[value]))


def global_row_number(ds, keys: Union[str, List[str]],
                      pos_col: str = "pos",
                      ascending: Union[bool, List[bool]] = True):
    """Distributed GLOBAL row_number over a total order — the
    un-partitioned window the per-key ``grouped_map`` rank family can't
    express (``PARTITION BY`` buckets are key-bounded; a global order
    crosses every bucket).

    Shape: one distributed ``Dataset.sort`` on ``keys`` (the only
    exchange), then positions are attached WITHOUT moving data again:
    per-block row counts come from the sorted blocks' metadata (a
    driver-side scan of block-count-scale metadata, no block fetch),
    the exclusive prefix sum gives each block its global offset, and a
    per-block remote task adds ``offset + arange(n)``.  The driver
    holds O(num_blocks) integers — never rows.  Callers must pass a
    TOTAL order (include a unique tiebreak column in ``keys``);
    otherwise positions among equal keys follow the sort's block
    layout, which is deterministic for a given input partitioning but
    not a semantic contract."""
    import ray
    from ray.data.block import BlockAccessor

    keys = [keys] if isinstance(keys, str) else list(keys)
    s = ds.sort(keys, descending=[not a for a in (
        [ascending] * len(keys) if isinstance(ascending, bool)
        else list(ascending))])

    @ray.remote
    def _count(block) -> int:
        return BlockAccessor.for_block(block).num_rows()

    @ray.remote
    def _attach(block, offset: int):
        df = BlockAccessor.for_block(block).to_pandas()
        df[pos_col] = np.arange(offset, offset + len(df),
                                dtype=np.int64)
        return df

    block_refs = []
    counts = []
    for bundle in s.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            block_refs.append(block_ref)
            counts.append(meta.num_rows)
    # metadata num_rows is populated by the sort; fall back to a
    # metadata-only remote count for any block that lacks it
    missing = [i for i, c in enumerate(counts) if c is None]
    if missing:
        fetched = ray.get([_count.remote(block_refs[i]) for i in missing])
        for i, c in zip(missing, fetched):
            counts[i] = c
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if counts else np.empty(0, dtype=np.int64)
    if not block_refs:
        import ray.data as rd
        return s  # empty dataset: nothing to attach
    refs = [_attach.remote(b, int(o))
            for b, o in zip(block_refs, offsets)]
    import ray.data as rd
    return rd.from_pandas_refs(refs)


def global_running_sum(ds, keys: Union[str, List[str]],
                       sum_cols: Union[str, List[str]],
                       ascending: Union[bool, List[bool]] = True,
                       suffix: str = "_cum"):
    """Distributed GLOBAL cumulative sums over a total order — the
    un-partitioned ``sum(col) OVER (ORDER BY keys ROWS UNBOUNDED
    PRECEDING)`` window that :func:`grouped_map`'s per-key rank family
    can't express.  For every column in ``sum_cols`` a new
    ``<col><suffix>`` column carries the inclusive running sum.

    Shape (the :func:`global_row_number` discipline): one distributed
    ``Dataset.sort`` on ``keys`` — the ONLY exchange — then each
    sorted block answers one scalar-per-column partial-sum task, the
    driver exclusive-prefixes O(num_blocks x cols) scalars, and a
    per-block remote task attaches ``offset + local cumsum``.  Rows
    never move after the sort and the driver never holds rows.
    Integer columns stay exact int64 end-to-end (numpy cumsum of int64
    is int64); callers must pass a TOTAL order for a deterministic
    result."""
    import ray
    from ray.data.block import BlockAccessor

    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    s = ds.sort(keys, descending=[not a for a in (
        [ascending] * len(keys) if isinstance(ascending, bool)
        else list(ascending))])

    @ray.remote
    def _nrows_sums(block):
        df = BlockAccessor.for_block(block).to_pandas()
        if len(df) == 0:
            return 0, [0] * len(cols)
        return len(df), [df[c].to_numpy().sum() for c in cols]

    @ray.remote
    def _attach(block, offs):
        df = BlockAccessor.for_block(block).to_pandas()
        for c, o in zip(cols, offs):
            df[c + suffix] = df[c].to_numpy().cumsum() + o
        return df

    block_refs = [br for bundle in s.iter_internal_ref_bundles()
                  for br in bundle.block_refs]
    if not block_refs:
        return s
    got = ray.get([_nrows_sums.remote(b) for b in block_refs])
    # drop empty blocks: a 0-row pandas block after a sort can carry NO
    # columns at all, which would poison both the cumsum attach and any
    # downstream schema union
    block_refs = [b for b, (nr, _) in zip(block_refs, got) if nr]
    if not block_refs:
        return s
    totals = np.asarray([sm for nr, sm in got if nr])
    offsets = np.vstack([np.zeros(len(cols), dtype=totals.dtype),
                         np.cumsum(totals, axis=0)[:-1]])
    refs = [_attach.remote(b, list(o))
            for b, o in zip(block_refs, offsets)]
    import ray.data as rd
    return rd.from_pandas_refs(refs)


def ntile_from_pos(pos: "np.ndarray", n_rows: int,
                   n_tiles: int) -> "np.ndarray":
    """SQL ``ntile(n_tiles)`` (1-based) from 0-based positions in the
    window order, closed-form: the first ``n_rows % n_tiles`` tiles
    take ``n_rows // n_tiles + 1`` rows.  Shared by every engine-side
    ntile so each matches DuckDB exactly."""
    p = np.asarray(pos, dtype=np.int64)
    q, r = divmod(int(n_rows), int(n_tiles))
    boundary = r * (q + 1)
    small = p < boundary
    big_branch = (r + (np.maximum(p - boundary, 0) // q
                       if q > 0 else 0))
    return np.where(small, p // (q + 1), big_branch).astype(np.int64) + 1
