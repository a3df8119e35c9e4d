"""Windowed / relational operators the reference lacks, built Ray-Data
first: salted-bucket rolling windows, broadcast range join, exact
distributed quantiles, deterministic hash sampling, exact distinct
counts. Every operator here has an exact DuckDB oracle in queries.py —
integer arithmetic at decision boundaries so float rounding can never
flip a row between the engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def rolling_window_sum(ds: "rd.Dataset", *, key_col: str, order_cols: list[str],
                       value_col: str, window: int = 4,
                       num_buckets: int = 32) -> "rd.Dataset":
    """Per-key sliding window (``ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW``) sum + count over an integer value column.

    Scale shape: keys are salted into ``num_buckets`` buckets
    (``key % num_buckets``) and the shuffle is one ``groupby(bucket)`` —
    each group then holds MANY keys and the per-key windows run as one
    vectorized pandas groupby-rolling pass. This amortizes Ray's
    per-group ``map_groups`` overhead (~0.5-1 ms/group), which would
    dominate if we grouped by the raw key: 10^6 users → 10^6 groups vs
    32 buckets. Window state never crosses keys, so bucket-locality of
    the KEY is the only partitioning requirement.

    Scale sizing: ONE bucket is processed by ONE task and must fit its
    heap — pick ``num_buckets ≈ total_rows·row_width / target_partition
    _bytes`` (e.g. ~512 MB per bucket), not the CPU count; the default
    32 is for fixture-scale data."""

    def add_bucket(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket",
                               pa.array(key % num_buckets, pa.int32()))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        grp = g.groupby(key_col)[value_col]
        win_sum = grp.rolling(window=window, min_periods=1).sum() \
            .reset_index(level=0, drop=True)
        win_n = grp.rolling(window=window, min_periods=1).count() \
            .reset_index(level=0, drop=True)
        out = g[[c for c in g.columns
                 if c not in ("bucket", value_col)]].copy()
        out["win_sum"] = win_sum.astype("int64")
        out["win_n"] = win_n.astype("int64")
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(roll, batch_format="pandas")


def range_band_join(ds: "rd.Dataset", *, value_col: str,
                    edges: list[float], labels: list[str],
                    agg_col: str) -> "rd.Dataset":
    """Broadcast range join: assign each row to the band whose
    ``[edges[i], edges[i+1])`` half-open interval contains ``value_col``,
    then aggregate per band (count + milli-int sum of ``agg_col``).

    The band table is the classic small side of a range join — it ships
    inside the task closure (a dozen floats), so there is NO shuffle at
    all until the final tiny ``groupby(band)`` over pre-aggregated
    per-batch partials. Rows outside [edges[0], edges[-1]) are dropped
    (inner-join semantics, same as the SQL BETWEEN oracle)."""
    inner = np.asarray(edges[1:-1], dtype=np.float64)
    lo, hi = float(edges[0]), float(edges[-1])
    lab = np.asarray(labels)

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (v >= lo) & (v < hi)
        v = v[keep]
        a = t[agg_col].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        idx = np.digitize(v, inner, right=False)
        # floor(x+0.5), not rint: rint is half-to-EVEN while DuckDB's
        # round() is half-away — the oracle uses the identical
        # floor(x*1000 + 0.5) so a .5 boundary can never diverge
        milli = np.floor(a * 1000 + 0.5).astype(np.int64)
        df = pd.DataFrame({"band": lab[idx], "n": 1, "s": milli})
        g = df.groupby("band", as_index=False).agg(n=("n", "sum"),
                                                   s=("s", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("band").aggregate(Sum("n", alias_name="n_rows"),
                                   Sum("s", alias_name="sum_milli"))


def exact_quantiles(ds: "rd.Dataset", *, value_col: str,
                    qs: list[float]) -> pd.DataFrame:
    """Exact rank-based quantiles of a LOW-CARDINALITY column via a
    distributed value-count histogram: ``groupby(value).count()`` is the
    only shuffle and moves one row per DISTINCT value; the driver folds
    the (tiny) histogram into ranks. Quantile definition: element at
    0-based index ``floor(q·(n-1))`` of the sorted multiset — replicated
    verbatim by the SQL oracle via row_number().

    For high-cardinality/continuous columns this histogram is no longer
    small; the scale path is ``sketches.approx_quantiles`` (mergeable
    t-digest), at which point the result is approximate and leaves the
    oracle gate — its rank error is pinned against this function in
    tests/test_sketches_modes.py."""
    hist = ds.groupby(value_col).count().to_pandas()
    if value_col not in hist.columns or not len(hist):
        hist = pd.DataFrame()   # zero-block empty (no columns)
    else:
        hist = hist.sort_values(value_col).reset_index(drop=True)
    if not len(hist):
        # empty input: the SQL twin returns 0 rows; degrade identically
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "val": pd.Series([], dtype="float64")})
    counts = hist["count()"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    vals = []
    for q in qs:
        idx = int(np.floor(q * (n - 1)))
        vals.append(float(hist[value_col][int(np.searchsorted(cum, idx,
                                                              side="right"))]))
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "val": pd.Series(vals, dtype="float64")})


def _pair_count_hist(ds: "rd.Dataset", key_col: str, value_col: str,
                     num_buckets: int = 64) -> pd.DataFrame:
    """(key, value, c) count histogram of row-level data via a
    per-batch pair-count combiner + salted-bucket fold — the
    composite-key aggregate rule (BASELINE.md round 3): Ray's
    sort-aggregate over composite keys costs by INPUT ROWS, not
    distinct pairs (25 s over 600 k rows / 150 pairs vs ~2 s through
    this fold). Exact — each distinct pair lives in exactly one
    value-salt bucket. Shared by grouped_quantiles / grouped_mad."""
    from ..rayutil import salt_bucket

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            g = b.head(0)[[key_col, value_col]].copy()
            g["c"] = pd.Series([], dtype="int64")
            g["bucket"] = pd.Series([], dtype="int32")
            return g
        g = b.groupby([key_col, value_col], as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        v = g[value_col].to_numpy()
        if v.dtype.kind == "f":
            # float values bucket by their BIT PATTERN (equal floats
            # share bits; −0.0 normalized so it co-buckets with 0.0) —
            # grouping itself stays on the real values
            v = np.where(v == 0.0, 0.0, v.astype(np.float64)) \
                .view(np.int64)
        g["bucket"] = salt_bucket(v, num_buckets)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby([key_col, value_col], as_index=False)["c"].sum()
        s["c"] = s["c"].astype("int64")
        return s

    return ds.select_columns([key_col, value_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .to_pandas()


def grouped_quantiles(ds: "rd.Dataset", *, key_col: str, value_col: str,
                      qs: list[float]) -> pd.DataFrame:
    """Exact per-key rank quantiles via a (key, value) count histogram
    (:func:`_pair_count_hist` — combiner + bucket fold, one row per
    DISTINCT (key, value) per batch on the wire); the driver folds
    n_keys·n_values rows (small by the same low-cardinality contract
    as :func:`exact_quantiles`). Same index rule: element at 0-based
    ``floor(q·(n_k-1))`` within each key's sorted multiset."""
    hist = _pair_count_hist(ds, key_col, value_col)
    if key_col not in hist.columns or not len(hist):
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "q": pd.Series([], dtype="float64"),
                             "val": pd.Series([], dtype="float64")})
    hist = hist.sort_values([key_col, value_col]).reset_index(drop=True)
    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        counts = g["c"].to_numpy(dtype=np.int64)
        vals_sorted = g[value_col].to_numpy()
        n = int(counts.sum())
        cum = np.cumsum(counts)
        for q in qs:
            idx = int(np.floor(q * (n - 1)))
            rows.append((key, q, float(
                vals_sorted[int(np.searchsorted(cum, idx, side="right"))])))
    return pd.DataFrame(rows, columns=[key_col, "q", "val"]) \
        .astype({"q": "float64", "val": "float64"})


def grouped_mad(ds: "rd.Dataset", *, key_col: str,
                value_col: str) -> pd.DataFrame:
    """Exact per-key median and median absolute deviation — the robust
    location/dispersion pair behind outlier-resistant quality gates
    (|x − med| > k·MAD filters survive heavy-tailed spam that
    mean/stddev gates don't).

    Same low-cardinality histogram contract and rank rule as
    :func:`grouped_quantiles`: median = element at 0-based
    ``floor((n−1)/2)`` of the key's sorted multiset (lower median, no
    interpolation), so INTEGER inputs stay integral end-to-end and the
    SQL twin (row_number window) matches bit-for-bit. Two passes:
    (key, value) count histogram → per-key median (tiny driver fold,
    broadcast back), then (key, |value − med|) histogram → per-key MAD.

    The histograms go through :func:`_pair_count_hist` (per-batch
    pair-count combiner + 64-bucket salted fold), NOT the native
    ``groupby([key, value]).count()`` — the composite-key aggregate
    rule: the sort-aggregate costs by INPUT rows, not distinct pairs
    (measured 25 s over 600 k lineitem rows with only 150 distinct
    pairs; the fold runs the same data in ~2 s)."""
    import ray

    from ..rayutil import cached_object

    def _fold_median(hist: pd.DataFrame, vcol: str) -> dict:
        out = {}
        for key, g in hist.sort_values([key_col, vcol]) \
                .groupby(key_col, sort=True):
            counts = g["c"].to_numpy(dtype=np.int64)
            vals = g[vcol].to_numpy()
            idx = (int(counts.sum()) - 1) // 2
            out[key] = vals[int(np.searchsorted(np.cumsum(counts), idx,
                                                side="right"))]
        return out

    hist = _pair_count_hist(ds, key_col, value_col)
    if key_col not in hist.columns or not len(hist):
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "med": pd.Series([], dtype="int64"),
                             "mad": pd.Series([], dtype="int64")})
    med = _fold_median(hist, value_col)
    med_ref = ray.put(med)

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        m = cached_object(med_ref)
        return pd.DataFrame({
            key_col: b[key_col],
            "d": (b[value_col] - b[key_col].map(m)).abs()})

    hist2 = _pair_count_hist(
        ds.map_batches(dev, batch_format="pandas"), key_col, "d")
    mad = _fold_median(hist2, "d")
    keys = sorted(med)
    return pd.DataFrame({key_col: keys,
                         "med": [med[k] for k in keys],
                         "mad": [mad[k] for k in keys]})


def hash_sample(ds: "rd.Dataset", *, id_col: str, pct: int = 10,
                mod: int = 100) -> "rd.Dataset":
    """Deterministic hash-threshold sampling: keep rows where
    ``md5(str(id))[:4] % mod < pct`` — stable across runs, machines and
    engines (the SQL oracle computes the identical predicate), and
    embarrassingly parallel (pure per-batch filter, no shuffle, no RNG
    state). The standard way to carve reproducible held-out slices from
    a 100-TB corpus without materializing an id list."""

    from .splits import md5_bucket

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        keep = np.fromiter((md5_bucket(str(i), mod) < pct for i in ids),
                           dtype=bool, count=len(ids))
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def distinct_count(ds: "rd.Dataset", *, col: str,
                   tokenize: bool = False) -> int:
    """EXACT distinct count (the oracle twin of the HLL sketch in
    sketches.py): per-batch local dedup → ``groupby(value).count()``
    (one shuffle of the deduped values) → the grouped dataset's row
    count. No driver materialization of the value set."""

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        if tokenize:
            seen: set[str] = set()
            for t in batch[col].fillna(""):
                seen.update(t.split())
            return pd.DataFrame({"v": sorted(seen)})
        return pd.DataFrame({"v": batch[col].drop_duplicates()})

    return ds.map_batches(local_distinct, batch_format="pandas") \
        .groupby("v").count().count()


def prefix_sum(ds: "rd.Dataset", *, key_col: str, value_col: str,
               part_size: int = 4096) -> "rd.Dataset":
    """Distributed prefix sum (running total in ``key_col`` order) —
    the scan primitive behind sequence packing, running token budgets
    and offset assignment.

    Classic two-pass scan, Ray-Data-shaped: keys are range-partitioned
    by ``key // part_size`` (dense-integer keys → partition id is pure
    arithmetic, no sampling pass); pass 1 computes one (partition, sum)
    row per partition-slice per batch via ``map_batches`` + a tiny
    ``groupby(part).sum``; the driver cumsums the per-partition totals
    (ONE int64 per partition, broadcast as two numpy arrays — at 10^10
    rows / 4096-row partitions that is ~2.4M entries ≈ 40 MB,
    driver-safe; raise ``part_size`` to shrink it) and broadcasts the
    exclusive offsets; pass 2 re-scans,
    sorts each partition locally (a partition is wholly inside one
    group) and emits local cumsum + its partition's offset. No global
    sort, no all-to-all: the only shuffles are the id-level partial
    groupby and the ``groupby(part)`` that co-locates each partition.

    Contract: ``key_col`` must be UNIQUE integer ids (it is the ORDER BY
    key — duplicate keys would make the running split between them
    nondeterministic) and ``value_col`` must be integral (integer sums
    are summation-order independent, which is what makes the two-pass
    result exact; floats would be order-dependent approximations).

    Returns (key_col, value_col, running) with ``running`` the
    INCLUSIVE prefix sum; the SQL twin is
    ``SUM(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``."""
    import ray

    from ..rayutil import cached_object

    sch = ds.schema()   # ray.data Schema wrapper: .names / .types lists
    if not pa.types.is_integer(
            dict(zip(sch.names, sch.types))[value_col]):
        raise TypeError(
            f"prefix_sum: {value_col} must be an integer column "
            "(float prefix sums are summation-order dependent); "
            "scale to integer units first")

    def partials(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = keys // part_size
        uniq, inv = np.unique(part, return_inverse=True)
        return pa.table({
            "part": pa.array(uniq, pa.int64()),
            "psum": pa.array(np.bincount(inv, weights=vals)
                             .astype(np.int64))})

    totals = ds.select_columns([key_col, value_col]) \
        .map_batches(partials, batch_format="pyarrow") \
        .groupby("part").sum("psum").to_pandas()
    if "part" not in totals.columns:   # empty input → typed empty scan
        return rd.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "running": pa.array([], pa.int64())}))
    totals = totals.sort_values("part").reset_index(drop=True)
    # exclusive offset per partition, broadcast as TWO NUMPY ARRAYS
    # (sorted part ids + offsets, searchsorted lookup): a Python dict of
    # boxed ints would cost ~100 B/entry to pickle and unpickle per
    # worker at millions of partitions; the arrays are 16 B/entry and
    # zero-copy out of plasma
    csum = totals["sum(psum)"].cumsum().shift(1, fill_value=0)
    offsets_ref = ray.put((totals["part"].to_numpy(dtype=np.int64),
                           csum.to_numpy(dtype=np.int64)))

    def add_part(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(keys // part_size))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        parts_arr, offs_arr = cached_object(offsets_ref)
        g = g.sort_values(key_col, kind="mergesort") \
            .reset_index(drop=True)
        i = int(np.searchsorted(parts_arr, int(g["part"].iloc[0])))
        base = int(offs_arr[i]) if i < len(parts_arr) \
            and parts_arr[i] == int(g["part"].iloc[0]) else 0
        run = g[value_col].astype("int64").cumsum() + base
        return pd.DataFrame({
            key_col: g[key_col],
            value_col: g[value_col],
            "running": run.astype("int64")})

    return ds.select_columns([key_col, value_col]) \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(scan, batch_format="pandas")


def prefix_max(ds: "rd.Dataset", *, key_col: str, value_col: str,
               extra_cols: list[str] | None = None,
               part_size: int = 4096) -> "rd.Dataset":
    """Distributed prefix MAX (running maximum in ``key_col`` order) —
    the order-statistic sibling of :func:`prefix_sum` and the scan
    behind event-time WATERMARKS: in a stream ordered by arrival, the
    watermark at row i is the max event time seen so far.

    Identical two-pass shape and contract as prefix_sum (UNIQUE int
    ``key_col`` as the ORDER BY; per-partition max → driver cummax of
    one int per partition → broadcast exclusive prefixes → local
    cummax + floor). Max is idempotent and order-insensitive inside a
    partition slice, so the result is exact for any dtype, but the
    int64 contract is kept for symmetry. ``extra_cols`` pass through
    pass 2 untouched (pass 2 re-scans the original rows, so carrying
    e.g. an event-type column is free — no join back needed).

    Returns (key_col, value_col, *extra_cols, running) with
    ``running`` the INCLUSIVE prefix max; SQL twin
    ``MAX(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``."""
    import ray

    from ..rayutil import cached_object

    extra_cols = list(extra_cols or [])
    in_cols = [key_col, value_col] + extra_cols
    int64_min = np.iinfo(np.int64).min

    def partials(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        part = keys // part_size
        uniq, inv = np.unique(part, return_inverse=True)
        pmax = np.full(len(uniq), int64_min, np.int64)
        np.maximum.at(pmax, inv, vals)
        return pa.table({"part": pa.array(uniq, pa.int64()),
                         "pmax": pa.array(pmax)})

    totals = ds.select_columns([key_col, value_col]) \
        .map_batches(partials, batch_format="pyarrow") \
        .groupby("part").max("pmax").to_pandas()
    # empty input: schema may survive (empty frame WITH "part") or not
    if "part" not in totals.columns or not len(totals):
        empty = {key_col: pa.array([], pa.int64()),
                 value_col: pa.array([], pa.int64())}
        for c in extra_cols:
            empty[c] = pa.array([], pa.string())
        empty["running"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(empty))
    totals = totals.sort_values("part").reset_index(drop=True)
    # exclusive prefix max per partition (INT64_MIN floor = "nothing
    # before the first partition")
    excl = totals["max(pmax)"].cummax().shift(1, fill_value=int64_min)
    offsets_ref = ray.put((totals["part"].to_numpy(dtype=np.int64),
                           excl.to_numpy(dtype=np.int64)))

    def add_part(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(keys // part_size))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        parts_arr, offs_arr = cached_object(offsets_ref)
        g = g.sort_values(key_col, kind="mergesort") \
            .reset_index(drop=True)
        i = int(np.searchsorted(parts_arr, int(g["part"].iloc[0])))
        base = int(offs_arr[i]) if i < len(parts_arr) \
            and parts_arr[i] == int(g["part"].iloc[0]) else int64_min
        run = np.maximum(g[value_col].astype("int64").cummax()
                         .to_numpy(), base)
        out = {key_col: g[key_col], value_col: g[value_col]}
        for c in extra_cols:
            out[c] = g[c]
        out["running"] = pd.Series(run, dtype="int64")
        return pd.DataFrame(out)

    return ds.select_columns(in_cols) \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(scan, batch_format="pandas")


def grouped_running_sum(ds: "rd.Dataset", *, key_col: str,
                        order_cols: list[str], value_col: str,
                        num_buckets: int = 32) -> "rd.Dataset":
    """Per-key running total (``SUM OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)``) — the grouped companion of
    ``prefix_sum``: running user balances, per-host byte budgets,
    per-source token tallies.

    Same salted-bucket shape as ``rolling_window_sum`` (one
    ``groupby(bucket)`` shuffle, many keys per bucket, one vectorized
    pandas groupby-cumsum per bucket) — cumulative state never crosses
    keys, so key-locality is the only partitioning requirement and the
    per-group map_groups overhead stays amortized over whole buckets.

    ``running`` keeps the value column's dtype (int stays int64, float
    stays float64 — the per-key cumsum order is fixed by the sort, so
    float results are deterministic too). ``(key, order_cols)`` must
    uniquely order rows; ties would receive nondeterministic
    intermediate running values."""

    def add_bucket(t: pa.Table) -> pa.Table:
        # shared salting helper: handles int AND string/binary keys
        # (an int-only cast here broke the first string-keyed caller)
        from ..rayutil import salt_bucket
        return t.append_column(
            "bucket", pa.array(salt_bucket(t[key_col], num_buckets),
                               pa.int32()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        run = g.groupby(key_col)[value_col].cumsum()
        out = g[[c for c in g.columns if c != "bucket"]].copy()
        out["running"] = run
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(scan, batch_format="pandas")


def latest_per_key(ds: "rd.Dataset", *, key_col: str,
                   order_cols: list[str],
                   num_buckets: int = 64) -> "rd.Dataset":
    """Keep each key's row with the greatest ``order_cols`` value —
    argmax-per-key. THE snapshot-dedup primitive for a Common-Crawl
    corpus: one (url, warc_ts, …) row per url, the newest capture
    (the input_hint's url/warc_ts table shape); equally the
    latest-event-per-user / current-state-per-entity query.

    Combiner shape, not a window shuffle: each batch keeps at most one
    row per key (vectorized sort + drop_duplicates), so the exchange
    moves ≤ 1 row per (key, batch) — at 10^10 page-snapshots with ~1.2
    captures per url, that is the distinct-url count, not the corpus.
    The final pass groups SALTED buckets (num_buckets vectorized pandas
    passes, not one map_groups group per key; same rationale as
    ``grouped_running_sum``). ``order_cols`` must totally order each
    key's rows (append a unique id as tie-break) or the argmax row is
    ambiguous; the SQL twin is ``QUALIFY row_number() OVER (PARTITION
    BY key ORDER BY order_cols DESC) = 1``."""
    from ..rayutil import salt_bucket

    by = [key_col] + list(order_cols)
    asc = [True] + [False] * len(order_cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        best = batch.sort_values(by, ascending=asc, kind="mergesort") \
            .drop_duplicates(key_col, keep="first").copy()
        # set the column on empty frames too: an empty block missing
        # "bucket" would diverge from the non-empty block schema
        best["bucket"] = salt_bucket(best[key_col], num_buckets) \
            if len(best) else pd.Series([], dtype="int32")
        return best

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc, kind="mergesort") \
            .drop_duplicates(key_col, keep="first") \
            .drop(columns=["bucket"])

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(final, batch_format="pandas")


def grouped_pearson(ds: "rd.Dataset", *, key_col: str, x_col: str,
                    y_col: str, num_buckets: int = 32) -> "rd.Dataset":
    """Per-group Pearson correlation — the numeric-profiling aggregate
    (feature drift, quality-signal coupling) as a pure combiner: each
    batch folds its rows into SIX moments per key (n, Σx, Σy, Σxy, Σx²,
    Σy²; one vectorized pandas agg), so the shuffle moves one 6-float
    row per (key, batch) and the salted final pass assembles

        corr = (nΣxy − ΣxΣy) / √(nΣx² − (Σx)²) · √(nΣy² − (Σy)²)

    Mathematically identical to SQL corr() (sample/population factors
    cancel in the ratio); the moment fold loses ~n·eps relative
    precision to cancellation, far below the 1e-6 integerization both
    sides apply (the tf-idf rounding-parity convention). Groups with
    zero variance in either column yield NULL, matching SQL."""
    from ..rayutil import salt_bucket

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                key_col: pd.Series([], dtype=batch[key_col].dtype
                                   if key_col in batch else "object"),
                "n": pd.Series([], dtype="int64"),
                **{c: pd.Series([], dtype="float64")
                   for c in ("sx", "sy", "sxy", "sxx", "syy")},
                "bucket": pd.Series([], dtype="int32")})
        x = batch[x_col].to_numpy(dtype=np.float64)
        y = batch[y_col].to_numpy(dtype=np.float64)
        g = pd.DataFrame({key_col: batch[key_col].to_numpy(),
                          "n": 1, "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x, "syy": y * y}) \
            .groupby(key_col, as_index=False).sum()
        g["bucket"] = salt_bucket(g[key_col], num_buckets)
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key_col, as_index=False)[
            ["n", "sx", "sy", "sxy", "sxx", "syy"]].sum()
        n = s["n"].to_numpy(dtype=np.float64)
        cov = n * s["sxy"].to_numpy() - s["sx"].to_numpy() * s["sy"].to_numpy()
        vx = n * s["sxx"].to_numpy() - s["sx"].to_numpy() ** 2
        vy = n * s["syy"].to_numpy() - s["sy"].to_numpy() ** 2
        denom = np.sqrt(np.maximum(vx, 0)) * np.sqrt(np.maximum(vy, 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where(denom > 0, cov / denom, np.nan)
        return pd.DataFrame({key_col: s[key_col],
                             "n": s["n"].astype("int64"),
                             "corr": corr})

    return ds.select_columns([key_col, x_col, y_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(final, batch_format="pandas")


def hopping_window_agg(ds: "rd.Dataset", *, ts_col: str, value_col: str,
                       width_s: int = 900, hop_s: int = 300) -> "rd.Dataset":
    """Hopping (sliding) window aggregate: count + centi-int sum of
    ``value_col`` per ``width_s``-second window advancing every
    ``hop_s`` seconds — the streaming-analytics windowed aggregate the
    reference's continuous loop never needed (it has no windows, §2.9)
    but any event/metrics pipeline does.

    Each event belongs to exactly ``width_s // hop_s`` windows, so the
    per-batch map fans each row out ``k`` ways ARITHMETICALLY (numpy
    tile, no join against a window table) and immediately folds partials
    per (window, batch) — the shuffle then moves one row per (window,
    batch), never one per (event, window). Window identity is its start
    epoch-second; timestamps enter as int64 microseconds so bucket
    arithmetic is exact (no float epoch).

    ``width_s`` must be a multiple of ``hop_s`` (tumbling = equal)."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"wstart": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        centi = np.floor(v * 100 + 0.5).astype(np.int64)
        base = us - us % hop_us
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64) * hop_us,
                            len(us))) // 1_000_000
        centi_k = np.repeat(centi, k)
        uniq, inv = np.unique(starts, return_inverse=True)
        return pa.table({
            "wstart": pa.array(uniq, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=centi_k)
                          .astype(np.int64))})

    from ray.data.aggregate import Sum
    return ds.select_columns([ts_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("wstart").aggregate(Sum("n", alias_name="n_events"),
                                     Sum("s", alias_name="sum_centi"))


def grouped_distinct_count(ds: "rd.Dataset", *, key_col: str,
                           value_col: str) -> "rd.Dataset":
    """EXACT ``count(DISTINCT value) GROUP BY key`` — PAIR-bucketed
    reduce: per-batch local (key, value) dedup (vectorized
    drop_duplicates, so the shuffle moves distinct pairs per batch, not
    raw rows), pairs bucketed by a hash of the WHOLE pair (each
    distinct pair lives in exactly one bucket, so per-bucket distinct
    counts sum exactly) → one ``groupby(bucket)`` over 64 int keys with
    a vectorized dedup+count per bucket → a tiny ``groupby(key).sum``.
    Nothing ever materializes a per-key value set in one process (the
    classic OOM of naive grouped distinct on a hot key), and no
    multi-key string groupby reaches Ray's sort-based aggregate — the
    two-level native-groupby version of this ran 2.6× slower on the
    same input, all of it in the (key, value) Aggregate. The approx
    twin is ``sketches.grouped_hll_distinct`` (one mergeable HLL row
    per (key, batch)), pinned against this in tests."""
    from ray.data.aggregate import Sum

    from ..rayutil import salt_bucket

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, value_col]].drop_duplicates()
        pair = b[key_col].astype(str) + "\x1f" + b[value_col].astype(str)
        b = b.copy()
        b["bucket"] = salt_bucket(pair.to_numpy(), 64) if len(b) \
            else pd.Series([], dtype="int32")
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key_col, value_col])
        c = d.groupby(key_col, as_index=False).size() \
            .rename(columns={"size": "n"})
        c["n"] = c["n"].astype("int64")
        return c

    return ds.select_columns([key_col, value_col]) \
        .map_batches(local, batch_format="pandas") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .groupby(key_col).aggregate(Sum("n", alias_name="n_distinct"))


def interpolated_quantiles(ds: "rd.Dataset", *, value_col: str,
                           qs: list[float]) -> pd.DataFrame:
    """Linearly INTERPOLATED quantiles (SQL ``quantile_cont`` /
    percentile_cont semantics: position ``h = q·(n-1)``, value
    ``v[⌊h⌋] + (h-⌊h⌋)·(v[⌊h⌋+1] - v[⌊h⌋])``) — the companion of
    :func:`exact_quantiles`, whose element-at-rank definition is a step
    function. Same distributed shape and the same LOW-CARDINALITY
    contract: one ``groupby(value).count()`` histogram shuffle (one row
    per DISTINCT value), driver folds ranks; t-digest is the
    high-cardinality path."""
    hist = ds.groupby(value_col).count().to_pandas()
    if value_col not in hist.columns or not len(hist):
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "val": pd.Series([], dtype="float64")})
    hist = hist.sort_values(value_col).reset_index(drop=True)
    counts = hist["count()"].to_numpy(dtype=np.int64)
    v = hist[value_col].to_numpy(dtype=np.float64)
    n = int(counts.sum())
    cum = np.cumsum(counts)

    def at(i: int) -> float:
        return float(v[int(np.searchsorted(cum, i, side="right"))])

    vals = []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        frac = h - lo
        x0 = at(lo)
        vals.append(x0 if frac == 0.0 or lo + 1 > n - 1
                    else x0 + frac * (at(lo + 1) - x0))
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "val": pd.Series(vals, dtype="float64")})


def grouped_mode(ds: "rd.Dataset", *, key_col: str, value_col: str,
                 num_buckets: int = 64) -> "rd.Dataset":
    """Most frequent value per key (deterministic tie-break: smallest
    value) — the categorical profiling aggregate. Two-level shape:
    per-batch (key, value, n) partials → native
    ``groupby([key, value]).sum`` collapses each distinct pair to one
    row → salted argmax over the pair counts (one vectorized pandas
    sort + drop_duplicates per bucket; same amortization as
    ``latest_per_key``, which can't be reused directly because the
    tie-break runs ASCENDING on the value while the count runs
    DESCENDING). Returns (key, mode_value, n)."""
    from ray.data.aggregate import Sum

    from ..rayutil import salt_bucket

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby([key_col, value_col], as_index=False).size()
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            value_col: g[value_col].to_numpy(),
            "n": pd.Series(g["size"].to_numpy(), dtype="int64")})

    pairs = ds.select_columns([key_col, value_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby([key_col, value_col]).aggregate(Sum("n", alias_name="n"))

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = salt_bucket(batch[key_col], num_buckets) \
            if len(batch) else pd.Series([], dtype="int32")
        return batch

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "n", value_col],
                          ascending=[True, False, True],
                          kind="mergesort") \
            .drop_duplicates(key_col, keep="first")
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "mode_value": g[value_col].to_numpy(),
            "n": pd.Series(g["n"].to_numpy(), dtype="int64")})

    return pairs.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(argmax, batch_format="pandas")


def grouped_lag(ds: "rd.Dataset", *, key_col: str,
                order_cols: list[str], value_col: str,
                num_buckets: int = 32) -> "rd.Dataset":
    """Per-key LAG: each row gains ``prev`` = the previous row's
    ``value_col`` in ``(key, order_cols)`` order (NaN/null for the
    key's first row) — the inter-event-gap / delta-encoding primitive
    (time since a user's previous event, per-host fetch spacing).

    Same salted-bucket shape as ``grouped_running_sum``: one
    ``groupby(bucket)`` shuffle, many keys per bucket, one vectorized
    ``groupby.shift`` per bucket. Lag state never crosses keys, so
    key-locality is the only partitioning requirement.

    For NUMERIC ``value_col`` ``prev`` is emitted as float64 (pandas
    shift semantics — the null for each key's first row forces the
    cast); int64 values up to 2⁵³ (every epoch-microsecond timestamp)
    survive the round-trip exactly, so integer consumers can difference
    and re-cast losslessly. Non-numeric values (e.g. lagging an
    event-type string for transition counting) keep their dtype, with
    None for each key's first row. ``(key, order_cols)`` must uniquely
    order rows."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from ..rayutil import salt_bucket
        return t.append_column(
            "bucket", pa.array(salt_bucket(t[key_col], num_buckets),
                               pa.int32()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        prev = g.groupby(key_col)[value_col].shift(1)
        out = g[[c for c in g.columns if c != "bucket"]].copy()
        out["prev"] = prev.astype("float64") \
            if pd.api.types.is_numeric_dtype(g[value_col]) else prev
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(scan, batch_format="pandas")


def grouped_percent_rank(ds: "rd.Dataset", *, key_col: str,
                         order_col: str, id_cols: list[str],
                         num_buckets: int = 64) -> "rd.Dataset":
    """Per-key PERCENT_RANK — the per-key feature-scaling window
    (``(rank-1)/(n-1)`` with RANK tie semantics): per-user score
    percentiles, per-host latency percentiles. Emitted as exact
    integers — ``rnk`` (1-based RANK, ties share), ``n_key``, and
    ``pr_micro = (rnk-1)·1e6 // (n_key-1)`` (0 for singleton keys) —
    so the twin comparison needs no float tolerance.

    Shape: ONE salted-bucket shuffle (a full per-key rank admits no
    local pruning — every row of a key must meet every other), one
    vectorized ``groupby.rank(method='min')`` + transform-size pass
    per bucket. ``id_cols`` ride the shuffle for output identity."""
    from ..rayutil import salt_bucket

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(salt_bucket(t[key_col], num_buckets),
                               pa.int32()))

    out_cols = id_cols + [key_col, "rnk", "n_key", "pr_micro"]

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or key_col not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in out_cols})
        grp = g.groupby(key_col)[order_col]
        rnk = grp.rank(method="min").astype("int64")
        n = grp.transform("size").astype("int64")
        pr = np.where(n > 1, (rnk - 1) * 1_000_000 // np.maximum(
            n - 1, 1), 0)
        out = {c: g[c] for c in id_cols}
        out[key_col] = g[key_col]
        out["rnk"] = rnk
        out["n_key"] = n
        out["pr_micro"] = pd.Series(pr, index=g.index, dtype="int64")
        return pd.DataFrame(out)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(rank_bucket,
                                      batch_format="pandas")


def grouped_topk_dense(ds: "rd.Dataset", *, key_col: str,
                       value_col: str, k: int = 3,
                       num_buckets: int = 64) -> "rd.Dataset":
    """Rows whose ``value_col`` is among their key's top-``k`` DISTINCT
    values, plus that dense rank (1-based) — ``QUALIFY dense_rank()
    OVER (PARTITION BY key ORDER BY value DESC) <= k`` with ties kept
    (the leaderboard-with-ties shape ROW_NUMBER top-k can't express).

    Combiner shape: each batch pre-prunes to its LOCAL per-key top-k
    distinct values (a cythonized ``groupby.rank(method='dense')``) —
    a superset of the global winners, since a value in the global
    top-k distinct set is in the top-k of any batch containing it —
    so the shuffle moves at most k distinct values' rows per
    (key, batch). The salted final pass re-ranks whole keys (all rows
    of a key share a bucket)."""
    from ..rayutil import salt_bucket

    def rank_filter(batch: pd.DataFrame,
                    drop_bucket: bool = False) -> pd.DataFrame:
        if not len(batch):
            batch = batch.copy()
            batch["dense_rank"] = pd.Series([], dtype="int64")
            if not drop_bucket:
                batch["bucket"] = pd.Series([], dtype="int32")
            return batch
        dr = batch.groupby(key_col)[value_col] \
            .rank(method="dense", ascending=False)
        out = batch[dr <= k].copy()
        out["dense_rank"] = dr[dr <= k].astype("int64")
        if drop_bucket:
            out = out.drop(columns=["bucket"])
        else:
            out["bucket"] = salt_bucket(out[key_col], num_buckets)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return rank_filter(g.drop(columns=["dense_rank"]),
                           drop_bucket=True)

    return ds.map_batches(rank_filter, batch_format="pandas") \
        .groupby("bucket").map_groups(final, batch_format="pandas")


def global_rank_by_value(ds: "rd.Dataset", *, value_col: str,
                         id_col: str, num_parts: int = 1024) -> "rd.Dataset":
    """Global 0-based rank of every row by ``(value_col, id_col)``
    ascending — the ORDER-BY-rank primitive behind NTILE / percentile
    buckets / leaderboard positions, without a driver-side sort.

    Two-pass scan (the ``prefix_sum`` / ``seeded_shuffle_positions``
    shape) with VALUE-range partitions: a 3-number pre-pass (min, max,
    count) fixes ``part = (v - min) · num_parts // span``, so rows with
    equal values always share a partition and the tie-break by
    ``id_col`` stays local. Pass 1 moves one int per (partition,
    batch); the driver cumsums ``num_parts`` ints; pass 2 co-locates
    each range, sorts locally and emits offset + local rank.

    Arithmetic ranges assume roughly uniform values (id-like keys,
    integerized money); heavily clustered values overload a partition —
    the production path for pathological skew is sampled split points,
    the same upgrade documented on ``prefix_sum``. ``value_col`` must
    be integral; ``(value, id)`` must be unique."""
    import ray

    from ray.data.aggregate import Max, Min

    from ..rayutil import cached_object

    def _typed_empty() -> "rd.Dataset":
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))

    # the op scans its input three times (min/max pre-pass, partition
    # counts, final rank); materialize the 2-int-column projection ONCE
    # so the upstream pipeline (parquet read, decode maps) doesn't
    # re-execute per pass — id-level rows, never the payload
    ds = ds.select_columns([value_col, id_col]).materialize()

    stats = ds.aggregate(Min(value_col), Max(value_col))
    if not stats or stats.get(f"min({value_col})") is None:
        return _typed_empty()   # empty input → typed empty ranks
    lo, hi = int(stats[f"min({value_col})"]), int(stats[f"max({value_col})"])
    span = max(hi - lo + 1, 1)

    def part_of(v: np.ndarray) -> np.ndarray:
        return ((v.astype(np.int64) - lo) * num_parts // span) \
            .astype(np.int64)

    def pcounts(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(part_of(v), return_counts=True)
        return pa.table({"part": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    # pcounts emits ARROW blocks, so the native aggregate stays on its
    # fast path (pandas blocks degrade it ~12× — rayutil.
    # bucketed_group_sum docstring)
    totals = ds.select_columns([value_col]) \
        .map_batches(pcounts, batch_format="pyarrow") \
        .groupby("part").sum("c").to_pandas()
    if "part" not in totals.columns:   # no counted rows → typed empty
        return _typed_empty()
    totals = totals.sort_values("part").reset_index(drop=True)
    csum = totals["sum(c)"].cumsum().shift(1, fill_value=0)
    offsets_ref = ray.put((totals["part"].to_numpy(dtype=np.int64),
                           csum.to_numpy(dtype=np.int64)))

    def add_part(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(v)))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        parts_arr, offs_arr = cached_object(offsets_ref)
        g = g.sort_values([value_col, id_col], kind="mergesort") \
            .reset_index(drop=True)
        i = int(np.searchsorted(parts_arr, int(g["part"].iloc[0])))
        base = int(offs_arr[i])
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            value_col: g[value_col].astype("int64"),
            "rank": base + np.arange(len(g), dtype=np.int64)})

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(rank, batch_format="pandas")


def grouped_zscore(ds: "rd.Dataset", *, key_col: str, value_col: str,
                   num_join_partitions: int = 8) -> "rd.Dataset":
    """Per-key z-score normalization (the feature-scaling / outlier
    primitive): each row gains ``z_milli`` = ⌊(v − µ_key)/σ_key · 1000⌋
    with the SAMPLE stddev. Rows of keys with n < 2 or zero variance
    are dropped (no defined z), matching the SQL twin's WHERE.

    Scale shape: pass 1 folds (n, Σv, Σv²) per (key, batch) into a tiny
    ``groupby(key)`` — one row per key-batch on the wire; pass 2 is a
    NATIVE hash join of the rows against the per-key moments (keys
    number in the millions at web scale — a join, never a driver dict),
    then one vectorized double expression shared verbatim with the
    DuckDB twin (same division order, same sqrt, same floor — the
    moments are exact int64, so both engines see identical doubles).

    Contract: ``value_col`` is int64 (caller integerizes) and Σv² /
    (Σv)² per key fit int64 — same bound the BIGINT SQL twin has.
    The input is scanned twice (moments, then the join) and ALL its
    columns ride through the join — prune to id-level columns before
    calling; the pruned input is materialized once here so the
    upstream read doesn't re-execute."""
    from ray.data.aggregate import Sum

    from ..rayutil import light_shuffle_aggregators, project_blocks

    ds = ds.materialize()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                key_col: pd.Series([], dtype=batch[key_col].dtype),
                "n_part": pd.Series([], dtype="int64"),
                "s_part": pd.Series([], dtype="int64"),
                "s2_part": pd.Series([], dtype="int64")})
        v = batch[value_col].to_numpy()
        g = batch.assign(_v2=v * v).groupby(key_col, as_index=False) \
            .agg(n_part=(value_col, "size"), s_part=(value_col, "sum"),
                 s2_part=("_v2", "sum"))
        return g.astype({"n_part": "int64", "s_part": "int64",
                         "s2_part": "int64"})

    # bucketed fold, NOT groupby().aggregate(Sum): the partials number
    # keys×batches rows and the native aggregate's reduce is ~0.1 ms of
    # Python per input row (rayutil.bucketed_group_sum docstring)
    from ..rayutil import bucketed_group_sum
    moments = bucketed_group_sum(
        ds.select_columns([key_col, value_col])
        .map_batches(partial, batch_format="pandas"),
        [key_col], {"n_part": "n_key", "s_part": "s_key",
                    "s2_part": "s2_key"})

    with light_shuffle_aggregators():
        joined = ds.join(moments, join_type="inner",
                         num_partitions=num_join_partitions,
                         on=(key_col,)).materialize()

    def zscore(batch: pd.DataFrame) -> pd.DataFrame:
        out_cols = [c for c in batch.columns
                    if c not in ("n_key", "s_key", "s2_key")]
        if not len(batch):
            out = batch[out_cols].copy()
            out["z_milli"] = pd.Series([], dtype="int64")
            return out
        v = batch[value_col].to_numpy(dtype=np.float64)
        n = batch["n_key"].to_numpy(dtype=np.int64)
        s = batch["s_key"].to_numpy(dtype=np.int64)
        s2 = batch["s2_key"].to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = (s2 - (s * s) / n) / (n - 1)
            keep = (n >= 2) & (var > 0)
            z = np.floor((v - s / n) / np.sqrt(var) * 1000)
        out = batch.loc[keep, out_cols].copy()
        out["z_milli"] = z[keep].astype(np.int64)
        return out

    return joined.map_batches(zscore, batch_format="pandas")


def rolling_window_median(ds: "rd.Dataset", *, key_col: str,
                          order_cols: list[str], value_col: str,
                          window: int = 4,
                          num_buckets: int = 32) -> "rd.Dataset":
    """Per-key sliding-window MEDIAN (``ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW``) — the order-statistic sibling of
    :func:`rolling_window_sum`, used where a rolling mean is
    outlier-poisoned (latency smoothing, robust rate profiles).

    Identical salted-bucket shape to rolling_window_sum (one vectorized
    pandas groupby-rolling pass per bucket; window state never crosses
    keys). Exactness contract: the median of an even window is the
    midpoint of the two middle values, so the output column is
    ``2·median`` as int64 — exact in both engines (DuckDB's
    ``2 * median(...) OVER w`` lands on the same integer; no float
    rounding seam)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket",
                               pa.array(key % num_buckets, pa.int32()))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        grp = g.groupby(key_col)[value_col]
        med2 = (grp.rolling(window=window, min_periods=1).median() * 2) \
            .reset_index(level=0, drop=True)
        out = g[[c for c in g.columns
                 if c not in ("bucket", value_col)]].copy()
        out["win_median_x2"] = med2.astype("int64")
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(roll, batch_format="pandas")
