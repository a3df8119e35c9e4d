"""Query catalog: every operator family exposed as ``(sf_dir) → result``
callables plus matching DuckDB oracle SQL (driver correctness gate).

Column names match the oracle SQL exactly (driver hashes values after
sorting columns by name). Float aggregates are rounded on BOTH sides to
absorb summation-order differences.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from . import corpus as corpus_mod
from .rayutil import (cached_object, light_shuffle_aggregators,
                      read_parquet)
from .functions import dedup as dd
from .functions import multimodal as mm
from .functions import similarity as sim
from .functions import textops as to
from .functions import windows as wn


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ts_us(t: "pa.Table", col: str = "ts") -> "pa.ChunkedArray":
    """Timestamp column → epoch MICROseconds, unit-robust: the explicit
    ``timestamp("us")`` hop makes a ns-unit column (pandas-written
    parquet) land on the same µs scale the fixture's ``timestamp[us]``
    schema does — a bare ``pc.cast(..., int64())`` yields the STORAGE
    unit, silently 1000× off on ns inputs (the q_gap_fill_hours
    ADVICE-r3 hazard; every DuckDB twin uses ``epoch_us`` which is
    unit-independent). Pinned by a ns-unit fixture in
    tests/test_cohort_paragraph.py."""
    return pc.cast(pc.cast(t[col], pa.timestamp("us")), pa.int64())


# ---------------------------------------------------------------------------
# Relational / aggregation queries (TPC-H-flavored engine exercises)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with per-batch partial pre-aggregation before the
    shuffle (scale pattern: the groupby moves one partial row per
    (key, batch), not per lineitem row)."""
    # the ship-date predicate is pushed INTO the scan (row-group pruning
    # + exact row filtering inside the reader), so filtered rows never
    # enter the object store; the shipdate column itself is then not
    # needed downstream
    ds = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") <= pa.scalar(
            pd.Timestamp("1998-09-02"), pa.timestamp("us")))

    # Money sums are floored to integer milli-units per ROW before
    # summing: integer sums are summation-order independent, so the Ray
    # and DuckDB results are bit-identical (a float SUM is not — its
    # rounding can straddle a .005 boundary between engines).
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({k: [] for k in (
                "l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price_milli", "sum_disc_price_milli",
                "count_order")})
        disc = batch["l_extendedprice"] * (1 - batch["l_discount"])
        batch = batch.assign(
            disc_milli=np.floor(disc * 1000).astype("int64"),
            base_milli=np.floor(batch["l_extendedprice"] * 1000).astype("int64"))
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price_milli=("base_milli", "sum"),
            sum_disc_price_milli=("disc_milli", "sum"),
            count_order=("l_quantity", "size"))
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_milli", alias_name="sum_base_price_milli"),
        Sum("sum_disc_price_milli", alias_name="sum_disc_price_milli"),
        Sum("count_order", alias_name="count_order"),
    ).to_pandas()
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(4)
    out["sum_qty"] = out["sum_qty"].round(2)
    for c in ("sum_base_price_milli", "sum_disc_price_milli", "count_order"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 1000) AS BIGINT)) AS BIGINT) AS sum_base_price_milli,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT)) AS BIGINT) AS sum_disc_price_milli,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """Fully distributed TPC-H Q3: both dimension sides are filtered IN
    the scan and joined with the native hash-partitioned ``Dataset.join``
    (the q_status_revenue pattern) — orders scales with the corpus, so
    no side is ever read whole on the driver or broadcast. Lineitem is
    pre-aggregated per batch before its shuffle; the final global
    ordering is a native sort + limit over per-order aggregate rows."""
    cutoff = pa.scalar(pd.Timestamp("1995-03-15"), pa.timestamp("us"))
    cust = read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey"],
        # segment predicate pushed into the scan
        filter=pc.field("c_mktsegment") == "BUILDING")
    orders = read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cutoff)
    li = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > cutoff)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # PER-BATCH combiner only (lineitem is clustered by orderkey, so
        # this collapses most rows in-task); the full-cardinality
        # groupby over every shipped lineitem would be a ~n_orders-key
        # hash aggregate BEFORE any selectivity is applied — measured
        # 180 s vs this plan's join-then-aggregate over only the
        # BUILDING∩date matches
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        batch = batch.assign(
            revenue_milli=np.floor(rev * 1000).astype("int64"))
        return batch.groupby("l_orderkey", as_index=False).agg(
            revenue_milli=("revenue_milli", "sum"))

    rev_part = li.map_batches(partial, batch_format="pandas")
    from .rayutil import project_blocks
    with light_shuffle_aggregators():
        # join outputs feed further shuffles → project_blocks (explicit
        # projection + metadata strip; see rayutil docstring)
        orders_b = project_blocks(
            orders.join(cust, join_type="inner", num_partitions=8,
                        on=("o_custkey",), right_on=("c_custkey",)),
            ["o_orderkey", "o_orderdate"])
        joined = project_blocks(
            rev_part.join(orders_b, join_type="inner", num_partitions=8,
                          on=("l_orderkey",), right_on=("o_orderkey",)),
            ["l_orderkey", "revenue_milli", "o_orderdate"])
        # final aggregate runs over surviving matches only (~segment ×
        # date selectivity of the corpus, not every order)
        agg = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(
            Sum("revenue_milli", alias_name="revenue_milli"))
        out = agg.sort(["revenue_milli", "l_orderkey"],
                       descending=[True, False]).limit(10).to_pandas()
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    return out[["o_orderkey", "revenue_milli", "o_orderdate"]] \
        .reset_index(drop=True)


Q3_SQL = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000) AS BIGINT)) AS BIGINT) AS revenue_milli,
       o.o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_milli DESC, o_orderkey
LIMIT 10
"""


def q_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Per-nation revenue: lineitem pre-aggregates by SUPPLIER inside
    each batch (≤1 row per (suppkey, batch) crosses the wire), a small
    ``groupby(l_suppkey)`` folds them, then a native hash join attaches
    the supplier's nation — supplier SCALES with the corpus, so it is
    never read whole on the driver or broadcast (the q3/segment-stats
    ruling). Nation (25 fixed rows) rides the same join: a second code
    shape for one tiny dim isn't worth it."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                      columns=["l_suppkey", "l_extendedprice",
                               "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        g = batch.assign(
            revenue_milli=np.floor(rev * 1000).astype("int64")) \
            .groupby("l_suppkey", as_index=False) \
            .agg(revenue_milli=("revenue_milli", "sum"))
        return pd.DataFrame({
            "l_suppkey": pd.Series(g["l_suppkey"].to_numpy(),
                                   dtype="int64"),
            "revenue_milli": pd.Series(g["revenue_milli"].to_numpy(),
                                       dtype="int64")})

    from .rayutil import project_blocks
    by_supp = ds.map_batches(partial, batch_format="pandas") \
        .groupby("l_suppkey") \
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"))
    by_supp = project_blocks(by_supp, ["l_suppkey", "revenue_milli"])
    sup = read_parquet(_t(sf_dir, "supplier"),
                       columns=["s_suppkey", "s_nationkey"])
    nat = read_parquet(_t(sf_dir, "nation"),
                       columns=["n_nationkey", "n_name"])
    with light_shuffle_aggregators():
        j = by_supp.join(sup, join_type="inner", num_partitions=8,
                         on=("l_suppkey",), right_on=("s_suppkey",))
        j = project_blocks(j, ["revenue_milli", "s_nationkey"])
        j = j.join(nat, join_type="inner", num_partitions=8,
                   on=("s_nationkey",), right_on=("n_nationkey",))
        out = j.groupby("n_name") \
            .aggregate(Sum("revenue_milli",
                           alias_name="revenue_milli")).to_pandas()
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


Q_NATION_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000) AS BIGINT)) AS BIGINT) AS revenue_milli
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


def q_orders_priority(sf_dir: str) -> pd.DataFrame:
    out = read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority"]) \
        .groupby("o_orderpriority").aggregate(Count(alias_name="n_orders")) \
        .to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            hour_ts=batch["ts"].dt.floor("h"),
            value_milli=np.floor(batch["value"] * 1000).astype("int64"))
        return batch.groupby(["event_type", "hour_ts"], as_index=False).agg(
            n_events=("value_milli", "size"),
            sum_value_milli=("value_milli", "sum"))

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "hour_ts"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_milli", alias_name="sum_value_milli")).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value_milli"] = out["sum_value_milli"].astype("int64")
    return out.sort_values(["event_type", "hour_ts"]).reset_index(drop=True)


Q_EVENTS_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour_ts,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events GROUP BY 1, 2 ORDER BY event_type, hour_ts
"""


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped op: per-user sessionization (30-min gap).
    Users are salted into 64 buckets (one shuffle, one vectorized
    groupby-diff pass per bucket) instead of one map_groups group per
    user — the per-group ~1 ms Python cost dominates at 10^5+ users."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        from .rayutil import salt_bucket
        return t.append_column("bucket", pa.array(salt_bucket(t["user_id"])))

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = g.groupby("user_id")["ts"].diff()
        starts = gaps.isna() | (gaps > pd.Timedelta(minutes=30))
        n = starts.groupby(g["user_id"]).sum()
        return pd.DataFrame({"user_id": n.index.to_numpy(dtype=np.int64),
                             "n_sessions": n.to_numpy(dtype=np.int64)})

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(sess, batch_format="pandas") \
        .to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id,
         ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events)
SELECT user_id,
       count(*) FILTER (WHERE gap IS NULL OR gap > INTERVAL 30 MINUTE) AS n_sessions
FROM d GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Documents: dedup + text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.exact_dedup(ds).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


Q_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY text_hash
"""


def q_near_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Reference A4 (script2.py:8-21) over the documents table."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.near_dup_text_groups(ds, min_len=100, max_count=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


Q_NEAR_DUP_SQL = """
SELECT md5(text) AS text_hash, count(*) AS n
FROM documents WHERE length(text) > 100
GROUP BY 1 HAVING count(*) < 4 ORDER BY text_hash
"""


def q_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return to.token_counts(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


Q_TOKEN_SQL = r"""
SELECT doc_id,
       length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
       length(text) AS n_chars
FROM documents ORDER BY doc_id
"""


def q_quality(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.quality_scores(ds).to_pandas()
    for c in ("avg_word_len", "punct_ratio", "stopword_ratio"):
        out[c] = out[c].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


_EN_STOPS_SQL = ", ".join(
    f"'{w}'" for w in sorted(__import__(
        "news_crawler_ray.extract.textstats", fromlist=["STOPWORDS"]
    ).STOPWORDS["en"]))

Q_QUALITY_SQL = rf"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       length(words) AS n_words,
       round(CASE WHEN length(words) = 0 THEN 0
             ELSE list_aggregate(list_transform(words, x -> length(x)), 'sum')
                  / CAST(length(words) AS DOUBLE) END, 6) AS avg_word_len,
       round(CASE WHEN length(text) = 0 THEN 0
             ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                  / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio,
       round(CASE WHEN length(words) = 0 THEN 0
             ELSE length(list_filter(words, x -> list_contains([{_EN_STOPS_SQL}], lower(x))))
                  / CAST(length(words) AS DOUBLE) END, 6) AS stopword_ratio
FROM w ORDER BY doc_id
"""


def q_lang_counts(sf_dir: str) -> pd.DataFrame:
    out = read_parquet(_t(sf_dir, "documents"), columns=["lang"]) \
        .groupby("lang").aggregate(Count(alias_name="n_docs")).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


Q_LANG_SQL = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"


def q_status_revenue(sf_dir: str) -> pd.DataFrame:
    """Large-large join via the native hash-partitioned ``Dataset.join``
    (both sides shuffle on the key — the pattern for joins where neither
    side broadcasts), then grouped aggregate."""
    li = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def add_milli(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        return pd.DataFrame({
            "l_orderkey": batch["l_orderkey"],
            "revenue_milli": np.floor(rev * 1000).astype("int64")})

    li = li.map_batches(add_milli, batch_format="pandas")
    orders = read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderstatus"])
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    out = joined.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_items"),
        Sum("revenue_milli", alias_name="revenue_milli")).to_pandas()
    out["n_items"] = out["n_items"].astype("int64")
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


Q_STATUS_REVENUE_SQL = """
SELECT o.o_orderstatus, count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000) AS BIGINT)) AS BIGINT) AS revenue_milli
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
"""


def q_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Top-20 tokens across documents (deterministic tie-break on
    token). The reduce is crc32-BUCKETED, never keyed by the raw token:
    a vocabulary-sized groupby (10^6+ groups at corpus scale) collapses
    Ray's sort-based aggregate, while 64 buckets reduce and top-k
    locally — exact, because each token lives in exactly one bucket, so
    the global top-20 is contained in the union of per-bucket
    top-20s."""
    import zlib
    ds = read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in batch["text"].fillna(""):
            for tok in t.split():
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        return pd.DataFrame({
            "token": toks,
            "n": pd.Series(list(counts.values()), dtype="int64"),
            "bucket": pd.Series(
                [zlib.crc32(t.encode()) % 64 for t in toks],
                dtype="int32")})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["n"].sum()
        return s.sort_values(["n", "token"], ascending=[False, True]) \
            .head(20)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_topk,
                                      batch_format="pandas").to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values(["n", "token"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)


Q_TOP_TOKENS_SQL = r"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS token
  FROM documents) t
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def q_segment_order_stats(sf_dir: str) -> pd.DataFrame:
    """Left-join aggregation: per market segment, customers, orders and
    total order value (customers without orders still counted). The
    customer table scales with the corpus, so it is never read whole or
    broadcast: orders are pre-aggregated to one row per custkey (the
    aggregate-then-join pushdown of q_customer_order_counts), LEFT OUTER
    joined to customer natively, then folded per segment — the only
    driver-side rows are the five segment aggregates."""
    cust = read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    orders = read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            total_milli=np.floor(batch["o_totalprice"] * 1000)
            .astype("int64"))
        return batch.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_custkey", "size"),
            total_milli=("total_milli", "sum"))

    per_cust = orders.map_batches(partial, batch_format="pandas") \
        .groupby("o_custkey").aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_milli", alias_name="total_milli"))
    with light_shuffle_aggregators():
        joined = cust.join(per_cust, join_type="left_outer",
                           num_partitions=8,
                           on=("c_custkey",), right_on=("o_custkey",))

        def seg_partial(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.assign(
                n_orders=batch["n_orders"].fillna(0).astype("int64"),
                total_milli=batch["total_milli"].fillna(0)
                .astype("int64"))
            # customer is unique on c_custkey and per_cust has one row
            # per key, so row count per segment == customer count
            return batch.groupby("c_mktsegment", as_index=False).agg(
                n_customers=("c_custkey", "size"),
                n_orders=("n_orders", "sum"),
                total_milli=("total_milli", "sum"))

        out = joined.map_batches(seg_partial, batch_format="pandas") \
            .groupby("c_mktsegment").aggregate(
                Sum("n_customers", alias_name="n_customers"),
                Sum("n_orders", alias_name="n_orders"),
                Sum("total_milli", alias_name="total_milli")).to_pandas()
    for c in ("n_customers", "n_orders", "total_milli"):
        out[c] = out[c].astype("int64")
    return out[["c_mktsegment", "n_customers", "n_orders", "total_milli"]] \
        .sort_values("c_mktsegment").reset_index(drop=True)


Q_SEGMENT_SQL = """
SELECT c.c_mktsegment,
       count(DISTINCT c.c_custkey) AS n_customers,
       count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(floor(o.o_totalprice * 1000) AS BIGINT)), 0) AS BIGINT) AS total_milli
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------

def _query_vec(sf_dir: str) -> np.ndarray:
    # predicate-pushdown read of ONE row — the embeddings table IS the
    # corpus at scale; reading it whole for a query vector would be an
    # O(corpus) driver materialization
    import pyarrow.parquet as pq
    emb = pq.read_table(_t(sf_dir, "embeddings"), columns=["embedding"],
                        filters=[("vec_id", "=", 0)])
    return np.asarray(emb["embedding"][0].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = sim.cosine_topk(ds, _query_vec(sf_dir), k=10)
    out["cos_sim"] = out["cos_sim"].round(5)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


Q_ANN_SQL = """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             CAST(q.embedding AS DOUBLE[])), 5) AS cos_sim
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
"""


def q_embedding_neardup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact all-pairs cosine near-dup at threshold 0.45 — the exactness
    oracle for the LSH near-dup path (distributed batch×corpus matmul
    with the corpus matrix broadcast once)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = dd.exact_neardup_pairs(ds, threshold=0.45).to_pandas()
    out["cos_sim"] = out["cos_sim"].round(5)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


Q_EMB_EXACT_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 5) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
ORDER BY id_a, id_b
"""


def q_whois_host_metadata(sf_dir: str) -> pd.DataFrame:
    """S7 whois connector (reference whoisinfo.py:39-104): per-host
    registration metadata joined to per-host corpus stats. Whois fields
    are the deterministic md5 synthesis from sources/whois.py (network
    whois can't run in replay — SURVEY.md §2.1 S7); the join is the
    degenerate broadcast-small-side shape (pure function of the key)."""
    from .sources.whois import join_whois
    ds = read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"))
    out = join_whois(agg, host_col="source").to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    cols = ["source", "registrar", "created_year", "expires_year",
            "country", "n_docs", "total_chars"]
    return out[cols].sort_values("source").reset_index(drop=True)


Q_WHOIS_SQL = """
WITH w AS (
  SELECT source,
         CAST(('0x' || substr(md5(source), 1, 8)) AS UBIGINT) AS seed
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.source,
       'registrar-' || CAST(w.seed % 7 AS VARCHAR) AS registrar,
       CAST(2000 + w.seed % 20 AS BIGINT) AS created_year,
       CAST(2000 + w.seed % 20 + 2 + (w.seed // 20) % 10 AS BIGINT) AS expires_year,
       ['US','DE','FR','IT','ES'][CAST(w.seed % 5 AS INT) + 1] AS country,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN w ON d.source = w.source
GROUP BY 1, 2, 3, 4, 5
ORDER BY d.source
"""


def _langid_sql() -> str:
    """DuckDB oracle for the stopword-vote language id: replicates
    detect_language (extract/textstats.py:92-107) — strip ASCII
    punctuation, lowercase, whitespace-split, count stopword hits per
    language (with multiplicity), winner = max hits with candidate-order
    tie-break, NULL when no hits. The stopword VALUES list is generated
    from the same STOPWORDS tables the engine uses."""
    from .extract.textstats import STOPWORDS
    langs = ("it", "en", "es", "de", "fr")
    vals = ",".join(
        f"('{lang}',{pri},'{w}')"
        for pri, lang in enumerate(langs)
        for w in sorted(STOPWORDS[lang]))
    # string.punctuation == ASCII 33-47, 58-64, 91-96, 123-126
    punct = r"[!-/:-@\[-`{-~]"
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(lower(regexp_replace(text, '{punct}', '', 'g')), '\\s+'),
           x -> x <> '')) AS tok
  FROM documents
),
sw(lang, pri, tok) AS (VALUES {vals}),
hits AS (
  SELECT t.doc_id, s.lang, s.pri, count(*) AS n
  FROM toks t JOIN sw s ON s.tok = t.tok
  GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, pri ASC) AS rn
  FROM hits
)
SELECT d.doc_id, b.lang AS lang_pred
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""


def q_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Declared-vs-detected language confusion matrix — the standard
    label-quality audit before trusting a corpus's lang column; pure
    composition of the langid operator and a pair-count aggregate
    (per-batch partial counts, pairs-sized shuffle)."""
    from .extract.textstats import detect_language
    ds = read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pred = [detect_language(t or "") or "und"
                for t in batch["text"]]
        return pd.DataFrame({
            "lang": batch["lang"].to_numpy(),
            "lang_pred": pred, "n": 1}) \
            .groupby(["lang", "lang_pred"], as_index=False).sum()

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["lang", "lang_pred"]).sum("n").to_pandas()
    out = out.rename(columns={"sum(n)": "n"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def _lang_confusion_sql() -> str:
    """Confusion-matrix oracle: the generated langid SQL as a CTE,
    joined back to the declared column."""
    return f"""
WITH pred AS ({_langid_sql()})
SELECT d.lang AS lang, coalesce(p.lang_pred, 'und') AS lang_pred,
       count(*)::BIGINT AS n
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
GROUP BY 1, 2
ORDER BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# Rows-only operators (no SQL equivalent; driver records row counts)
# ---------------------------------------------------------------------------

def _sf_tag(sf_dir: str) -> tuple[str, dict]:
    base = os.path.basename(os.path.normpath(sf_dir))
    spec = {
        "sf0.001": dict(num_hosts=3, pages_per_host=24),
        "sf0.01": dict(num_hosts=4, pages_per_host=60),
        "sf0.1": dict(num_hosts=6, pages_per_host=200),
    }.get(base, dict(num_hosts=3, pages_per_host=24))
    return base, spec


def q_crawl_flagship(sf_dir: str):
    """Full crawl over the deterministic synthetic corpus scaled to the
    sf tier; returns the final pages table."""
    import shutil
    tag, _ = _sf_tag(sf_dir)
    # force a fresh crawl for the flagship itself (reports/har reuse it)
    shutil.rmtree(_flagship_out_dir(tag), ignore_errors=True)
    pages = _flagship_pages_ds(sf_dir).to_pandas()
    return pages.sort_values("url").reset_index(drop=True)


def q_crawl_bulk_extract(sf_dir: str):
    """Streaming bulk extraction over the corpus (headline pipeline)."""
    from .pipelines.bulk import extract_pipeline
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    return extract_pipeline(paths.pages_dir, concurrency=4).to_pandas() \
        .sort_values("url").reset_index(drop=True)


def q_crawl_pagerank(sf_dir: str) -> pd.DataFrame:
    """Host-graph PageRank over the corpus (frontier-prioritization
    signal): kernel outbound links → distinct host edges → 20 damped
    iterations, edge table streaming per pass (functions/linkgraph)."""
    from .functions.linkgraph import host_edges, host_pagerank
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    out = host_pagerank(host_edges(paths.pages_dir), iters=20)
    out["rank_micro"] = np.floor(
        out["rank"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    return out[["host", "rank_micro"]].sort_values("host") \
        .reset_index(drop=True)


def q_crawl_hits(sf_dir: str) -> pd.DataFrame:
    """Host-graph HITS hubs & authorities over the crawl corpus
    (linkgraph.host_hits — PageRank's discovery-side sibling; edge
    table streams per half-iteration, sparse partials, O(hosts) driver
    state). Pinned to the single-process Kleinberg reference in
    tests/test_functions.py; rows-only at the driver (iterative)."""
    from .functions.linkgraph import host_edges, host_hits
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    out = host_hits(host_edges(paths.pages_dir), iters=20)
    for c in ("authority", "hub"):
        out[c + "_micro"] = np.floor(
            out[c].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    return out[["host", "authority_micro", "hub_micro"]] \
        .sort_values("host").reset_index(drop=True)


def q_crawl_anchor_texts(sf_dir: str) -> pd.DataFrame:
    """Per-target-host top-3 anchor texts over the crawl corpus (the
    link-text corpus product; linkgraph.anchor_texts — html stays in
    the map stage, one row per distinct (host, anchor) crosses the
    fold). Conformance-pinned to the single-process Counter oracle in
    tests/test_linkgraph.py."""
    from .functions.linkgraph import anchor_texts
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    out = anchor_texts(paths.pages_dir).to_pandas()
    return out.sort_values(["dst_host", "rank"]).reset_index(drop=True)


def q_crawl_sitemap_discovery(sf_dir: str) -> pd.DataFrame:
    """Sitemap discovery end-to-end (sources/sitemap.py): a
    sidecar-augmented copy of the corpus — robots.txt advertising a
    sitemapindex whose urlset lists the feed-only article (reachable
    by NO link) — crawled by the ENGINE; returns the sitemap-sourced
    order rows (url, url_to_refer). Conformance incl. per-host order
    is pinned against the oracle in tests/test_sitemap.py."""
    import shutil

    import pyarrow.parquet as pq

    from .pipelines.crawl import CrawlConfig, CrawlEngine
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"sitemapq_{tag}", **spec,
                                      feed_only_article=True)
    root = os.path.join(
        "/tmp", f"ncr_sitemapq_{tag}_v{corpus_mod.CORPUS_VERSION}")
    if not os.path.isdir(root):
        # build under a temp name, rename into place last — a crash
        # mid-build must not leave a half-corpus behind the cache check
        tmp_root = root + ".build"
        shutil.rmtree(tmp_root, ignore_errors=True)
        shutil.copytree(paths.root, tmp_root)
        import pyarrow.dataset as pads
        urls = pads.dataset(os.path.join(tmp_root, "pages")) \
            .to_table(columns=["url"]).to_pandas()["url"]
        orphan = sorted(u for u in urls if "feed-only-story" in u)
        host = orphan[0].split("/")[0]
        urlset = ("<urlset>" + "".join(
            f"<url><loc>http://{u}</loc></url>" for u in orphan)
            + "</urlset>").encode()
        index = (f"<sitemapindex><sitemap>"
                 f"<loc>http://{host}/smap/pages.xml</loc></sitemap>"
                 f"</sitemapindex>").encode()
        pq.write_table(pa.table({
            "url": pa.array([f"http://{host}/sitemap.xml",
                             f"http://{host}/smap/pages.xml"]),
            "xml": pa.array([index, urlset], pa.binary())}),
            os.path.join(tmp_root, "sitemaps.parquet"))
        pq.write_table(pa.table({
            "host": pa.array([host]),
            "robots_txt": pa.array(
                [f"User-agent: *\nDisallow:\n"
                 f"Sitemap: http://{host}/sitemap.xml\n"])}),
            os.path.join(tmp_root, "robots.parquet"))
        os.rename(tmp_root, root)
    out_dir = f"/tmp/ncr_sitemapq_out_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    eng = CrawlEngine(CrawlConfig(corpus_root=root, out_dir=out_dir))
    eng.run()
    pages = eng.pages_dataset().to_pandas()
    eng.shutdown()
    # the feed-only articles are reachable by NO link: every returned
    # row exists ONLY because the sitemap chain admitted it (page rows
    # carry url_to_refer only for alias rows, reference semantics, so
    # reachability — not a referrer column — is the assertable signal)
    got = pages[pages["url"].str.contains("feed-only-story",
                                          regex=False)]
    return got[["url", "scraped", "http_response_code"]] \
        .sort_values("url").reset_index(drop=True)


def q_crawl_mirror_hosts(sf_dir: str) -> pd.DataFrame:
    """Mirror/alias host detection over the crawl corpus — Jaccard
    over each host's canonical URL-PATH set (linkgraph.mirror_hosts:
    the generic dedup.set_jaccard_pairs self-join fed path rows
    instead of shingles; df cap drops boilerplate paths shared by
    everyone). Conformance-pinned to the single-process set oracle in
    tests/test_linkgraph.py."""
    from .functions.linkgraph import mirror_hosts
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    return mirror_hosts(paths.pages_dir)


def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.minhash_lsh_pairs(ds, threshold=0.4).to_pandas()
    if len(out):
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        out["doc_a"] = out["doc_a"].astype("int64")
        out["doc_b"] = out["doc_b"].astype("int64")
    return out


def q_minhash_dedup_keep(sf_dir: str) -> pd.DataFrame:
    """End-to-end near-dup dedup: LSH pairs → DISTRIBUTED connected
    components (min-label propagation, dedup.dedup_groups_distributed)
    → surviving representative per cluster. The driver never sees the
    pair set or the id column: singleton survivors come from a native
    LEFT OUTER join of the id table against the converged labels
    (null label ⇒ own-cluster singleton), so the only corpus-sized
    materialization is the query's own per-doc RESULT table."""
    docs = read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.4)
    labels = dd.dedup_groups_distributed(pairs)
    ids = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    with light_shuffle_aggregators():
        out = ids.join(labels, join_type="left_outer", num_partitions=8,
                       on=("doc_id",)).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_rep"] = out["cluster_rep"].fillna(out["doc_id"]) \
        .astype("int64")
    out["keep"] = out["doc_id"] == out["cluster_rep"]
    return out[["doc_id", "cluster_rep", "keep"]] \
        .sort_values("doc_id").reset_index(drop=True)


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT d≤8 Hamming pairs via (d+1)-segment pigeonhole LSH — full
    recall, so it gets an exact all-pairs DuckDB oracle (the simhash
    itself is md5-token-hash based and reproducible in SQL)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.simhash_pairs(ds, max_hamming=8).to_pandas()
    if len(out):
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        out = out.astype({"doc_a": "int64", "doc_b": "int64",
                          "hamming": "int64"})
    return out


# exact SQL replica of SimHasher.fingerprint (md5 token hash → per-bit
# multiplicity-weighted sign sum) + brute-force all-pairs Hamming ≤ 8 —
# valid as an oracle for the LSH path because (d+1)-segment pigeonhole
# bucketing has provably full recall
Q_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS tok
  FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY doc_id, tok),
th AS (SELECT doc_id, ('0x'||substr(md5(tok),1,16))::UBIGINT AS h, cnt FROM tc),
bits AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM th, (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)::HUGEINT
                  ELSE 0 END) AS f
  FROM bits GROUP BY doc_id),
sh AS (
  SELECT d.doc_id, coalesce(fp.f, 0)::UBIGINT AS simhash
  FROM documents d LEFT JOIN fp USING (doc_id))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY doc_a, doc_b
"""


# --- exact SQL replica of MinHash + banded LSH (dedup.py:134–299) ------
#
# Reproducible because every hash in the chain is deterministic and
# SQL-expressible: md5 token hashes, positional-multiplier shingle mix
# (numpy uint64 WRAP-AROUND multiplies, replicated below via 32-bit-half
# decomposition in HUGEINT), and (a·x+b) mod 2^64 mod (2^61−1) signature
# permutations with the 128 (a,b) params embedded as literals. Bucket
# membership is segment EQUALITY (the engine's sha1 band hash is just an
# equality surrogate), so the sha1 itself need not be replicated.

_MERSENNE61 = (1 << 61) - 1
_U64 = "18446744073709551616"   # 2^64 as a HUGEINT literal


def _sql_mulmod64(a_expr: str, b_expr: str) -> str:
    """SQL expression for (a*b) mod 2^64 — numpy uint64 wraparound
    semantics — via 32-bit halves (each partial product stays under the
    UBIGINT overflow check; the final sum is done in HUGEINT)."""
    m = "4294967295"
    al = f"(({a_expr}) & {m})"
    ah = f"(({a_expr}) >> 32)"
    bl = f"(({b_expr}) & {m})"
    bh = f"(({b_expr}) >> 32)"
    cross = f"(((({al} * {bh}) & {m}) + (({ah} * {bl}) & {m})) & {m})"
    return (f"((({al} * {bl})::HUGEINT + {cross}::HUGEINT * 4294967296)"
            f" % {_U64})::UBIGINT")


def _minhash_ctes() -> str:
    """Shared CTE chain: documents → shingle set → 128-perm signatures →
    32-band segments → colliding candidate pairs (doc_a < doc_b)."""
    c1 = 0x9E3779B97F4A7C15
    c2 = 0xC2B2AE3D27D4EB4F + 2
    c3 = 0xC2B2AE3D27D4EB4F + 4
    a, b = dd._perm_params(128)
    perm_vals = ",\n    ".join(
        f"({j}, {int(a[j])}::UBIGINT, {int(b[j])}::UBIGINT)"
        for j in range(128))
    sh = (f"(xor(xor({_sql_mulmod64('h', str(c1))}, "
          f"{_sql_mulmod64('h1', str(c2))}), "
          f"{_sql_mulmod64('h2', str(c3))}) & {_MERSENNE61})")
    sig = (f"((({_sql_mulmod64('pp.a', 's.sh')})::HUGEINT + pp.b)"
           f" % {_U64} % {_MERSENNE61})::UBIGINT")
    return rf"""toklist AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS toks
  FROM documents),
tok_pos AS (
  SELECT doc_id, i.i AS i,
         ('0x'||substr(md5(toks[i.i + 1]),1,16))::UBIGINT AS h
  FROM toklist, LATERAL (SELECT unnest(range(len(toks))) AS i) i),
pos3 AS (
  SELECT doc_id, h,
         lead(h,1) OVER w AS h1, lead(h,2) OVER w AS h2
  FROM tok_pos WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
shingles AS (
  SELECT DISTINCT doc_id, {sh} AS sh
  FROM pos3 WHERE h2 IS NOT NULL),
perms(perm, a, b) AS (VALUES
    {perm_vals}),
sigs AS (
  SELECT d.doc_id, pp.perm,
         coalesce(min({sig}), {_MERSENNE61}::UBIGINT) AS sig
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN perms pp
  LEFT JOIN shingles s ON s.doc_id = d.doc_id
  GROUP BY d.doc_id, pp.perm),
sigl AS (
  SELECT doc_id, list(sig ORDER BY perm) AS sig
  FROM sigs GROUP BY doc_id),
bandseg AS (
  SELECT doc_id, b.b AS band, sig[b.b*4+1 : b.b*4+4] AS seg
  FROM sigl, (SELECT unnest(range(32)) AS b) b),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandseg x JOIN bandseg y
    ON x.band = y.band AND x.seg = y.seg AND x.doc_id < y.doc_id)"""


_MINHASH_PAIR_SELECT = """
SELECT c.doc_a, c.doc_b,
       length(list_filter(range(1,129), j -> sa.sig[j] = sb.sig[j])) / 128.0
         AS similarity
FROM cand c
JOIN sigl sa ON sa.doc_id = c.doc_a
JOIN sigl sb ON sb.doc_id = c.doc_b
WHERE length(list_filter(range(1,129), j -> sa.sig[j] = sb.sig[j])) / 128.0
        >= 0.4"""


def _minhash_sql() -> str:
    """Oracle for ``minhash_lsh_pairs``: the similarity (signature
    agreement fraction) is a dyadic rational (k/128), exact in float64
    on both engines — no rounding needed for the value-hash gate."""
    return ("WITH " + _minhash_ctes() + _MINHASH_PAIR_SELECT
            + "\nORDER BY doc_a, doc_b")


def _minhash_keep_sql() -> str:
    """Oracle for ``minhash_dedup_keep``: LSH pairs → connected
    components via recursive transitive closure (tiny pair graph) →
    min-id representative — the same cluster semantics as the engine's
    union-find (dedup.py:302–338, min-root merging)."""
    return ("WITH RECURSIVE " + _minhash_ctes() + ",\npairs AS ("
            + _MINHASH_PAIR_SELECT + """),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(doc, r) AS (
  SELECT doc_id, doc_id FROM (SELECT DISTINCT doc_id FROM documents)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc = e.v),
rep AS (SELECT doc, min(r) AS cluster_rep FROM reach GROUP BY doc)
SELECT d.doc_id, rep.cluster_rep, (rep.cluster_rep = d.doc_id) AS keep
FROM documents d JOIN rep ON rep.doc = d.doc_id
ORDER BY doc_id""")


def q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed cosine near-dup at the SAME threshold as the exact
    twin (0.45 — the corpus's planted near-dups live at 0.45-0.6;
    the old 0.9 setting returned zero rows at every test scale, i.e.
    tested nothing). Cos 0.45 is a wide angle, so recall needs short
    codes and more tables: 24 tables × 3 planes → P(miss) =
    (1 - 0.648³)²⁴ ≈ 5e-4; measured 14/14 of the exact twin's pairs
    at sf0.01 (tests pin the subset relation and recall)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = dd.embedding_neardup_pairs(ds, threshold=0.45,
                                     n_tables=24, n_planes=3).to_pandas()
    if len(out):
        out["cos_sim"] = out["cos_sim"].round(5)
        out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return out


def q_ivf_ann(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = sim.ivf_topk(ds, _query_vec(sf_dir), k=10)
    out["cos_sim"] = out["cos_sim"].round(5)
    return out


def q_kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd k-means over the embedding column (5 whole-
    corpus iterations, no shuffle — per-batch partial sums folded on the
    driver). Iterative, so no SQL oracle (driver records a rows-only
    check); determinism is pinned against a single-process numpy Lloyd
    in tests/test_functions.py."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    cents, counts, inertia = sim.distributed_kmeans(
        ds, n_clusters=8, iters=5)
    return pd.DataFrame({
        "cluster": pd.Series(range(len(counts)), dtype="int64"),
        "size": pd.Series(counts, dtype="int64"),
        "centroid_norm": np.round(np.linalg.norm(cents, axis=1), 6),
        "inertia_total": np.round(np.full(len(counts), inertia), 3)})


def q_langid(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return to.langid(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return to.fingerprints(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


# exact SQL replica of winnowing (Schleimer et al. 2003): md5 char-5-gram
# hashes masked to 61 bits, window-4 rightmost-minimum selection,
# consecutive-position dedup (selected positions are non-decreasing, so
# DISTINCT positions ≡ the sequential dedup in _winnow_fingerprints)
Q_FPS_SQL = r"""
WITH d AS (SELECT doc_id, lower(text) AS s FROM documents),
grams AS (
  SELECT doc_id, g.i AS i,
         ('0x'||substr(md5(substr(s, g.i, 5)),1,16))::UBIGINT
           & ((1::UBIGINT<<61)-1) AS h
  FROM d, LATERAL (SELECT unnest(range(1, length(s)-5+2)) AS i) g
  WHERE length(s) >= 5),
wins AS (
  SELECT doc_id, w.w AS w
  FROM d, LATERAL (
    SELECT unnest(range(0, greatest(1, length(s)-5+1-4+1))) AS w) w
  WHERE length(s) >= 5),
members AS (
  SELECT w.doc_id, w.w, g.i, g.h
  FROM wins w JOIN grams g ON g.doc_id = w.doc_id
   AND g.i - 1 BETWEEN w.w AND w.w + 3),
win_min AS (SELECT doc_id, w, min(h) AS mh FROM members GROUP BY doc_id, w),
sel AS (
  SELECT m.doc_id, m.w, max(m.i) AS sel_pos
  FROM members m JOIN win_min x
    ON x.doc_id = m.doc_id AND x.w = m.w AND m.h = x.mh
  GROUP BY m.doc_id, m.w),
fp_pos AS (SELECT DISTINCT doc_id, sel_pos FROM sel),
agg AS (
  SELECT f.doc_id, count(*) AS n_fingerprints, min(g.h) AS min_fp
  FROM fp_pos f JOIN grams g ON g.doc_id = f.doc_id AND g.i = f.sel_pos
  GROUP BY f.doc_id)
SELECT d0.doc_id,
       coalesce(a.n_fingerprints, 0)::BIGINT AS n_fingerprints,
       coalesce(a.min_fp, 0)::UBIGINT AS min_fp
FROM documents d0 LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
"""


def _flagship_out_dir(tag: str) -> str:
    # versioned so stale outputs from older engine/corpus versions are
    # never reused across runs
    return f"/tmp/ncr_flagship_{tag}_v{corpus_mod.CORPUS_VERSION}"


def _flagship_pages_ds(sf_dir: str):
    """Run (or reuse) the flagship crawl and return its pages Dataset."""
    import os

    from .pipelines.crawl import CrawlConfig, CrawlEngine
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    out_dir = _flagship_out_dir(tag)
    if not os.path.isdir(os.path.join(out_dir, "pages")):
        eng = CrawlEngine(CrawlConfig(corpus_root=paths.root,
                                      out_dir=out_dir,
                                      max_in_flight_override=16))
        eng.run()
        eng.shutdown()
    return read_parquet(os.path.join(out_dir, "pages"))


def q_har_ads(sf_dir: str) -> pd.DataFrame:
    """S4 + ST2: third-party request urls from the crawl, ad-classified
    by the compiled ruleset actor pool."""
    from .functions.adrules import har_tables
    har_urls, _ = har_tables(_flagship_pages_ds(sf_dir))
    return har_urls.to_pandas().sort_values("har_url").reset_index(drop=True)


def q_rss_entries(sf_dir: str) -> pd.DataFrame:
    """S8: RSS feeds → pre-populated frontier/page records."""
    from .sources.rss import rss_entries
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    out = rss_entries(read_parquet(paths.feeds)).to_pandas()
    return out.sort_values(["host", "url"]).reset_index(drop=True)


def q_crawl_stats(sf_dir: str) -> pd.DataFrame:
    """S10/A1-A4: per-host crawl stats over the flagship output."""
    from .pipelines.reports import per_host_stats
    return per_host_stats(_flagship_pages_ds(sf_dir))


def q_crawl_host_metadata(sf_dir: str) -> pd.DataFrame:
    """S7: per-host stats joined with the corpus whois sidecar."""
    from .pipelines.reports import host_metadata
    tag, spec = _sf_tag(sf_dir)
    paths = corpus_mod.default_corpus(f"flagship_{tag}", **spec)
    return host_metadata(_flagship_pages_ds(sf_dir), paths.whois)


def q_asof_purchase_view(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each purchase event, the most recent prior 'view'
    event time of the same user (custom operator — composition of
    groupby + per-group merge_asof; DuckDB native ASOF JOIN oracle)."""
    from .functions.joins import asof_join
    purchases = read_parquet(_t(sf_dir, "events"),
                                columns=["event_id", "user_id", "ts",
                                         "event_type"]) \
        .map_batches(lambda df: df[df.event_type == "purchase"]
                     .drop(columns=["event_type"]), batch_format="pandas")
    views = read_parquet(_t(sf_dir, "events"),
                            columns=["user_id", "ts", "event_type"]) \
        .map_batches(lambda df: df[df.event_type == "view"]
                     .drop(columns=["event_type"]), batch_format="pandas")
    out = asof_join(purchases, views, by="user_id", on="ts",
                    value_cols=[]).to_pandas()
    out = out.rename(columns={"ts_right": "prior_view_ts"})
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "user_id", "ts", "prior_view_ts"]] \
        .sort_values("event_id").reset_index(drop=True)


Q_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, v.ts AS prior_view_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


def q_train_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based train/val/test assignment + counts."""
    from .functions.splits import assign_split
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    out = assign_split(ds).groupby("split") \
        .aggregate(Count(alias_name="n")).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


Q_TRAIN_SPLIT_SQL = """
SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n
FROM (SELECT CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b
      FROM documents) t
GROUP BY 1 ORDER BY split
"""


def q_approx_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """Mergeable-sketch aggregation: HLL distinct-token estimate."""
    from .functions.sketches import approx_distinct_tokens
    ds = read_parquet(_t(sf_dir, "documents"), columns=["text"])
    est = approx_distinct_tokens(ds)
    return pd.DataFrame({"approx_distinct_tokens": [round(est)]})


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries frequent tokens (top 20 of a k=512 summary);
    approximate lower-bound counts — exact twin `q_top_tokens`."""
    from .functions.sketches import heavy_hitters
    ds = read_parquet(_t(sf_dir, "documents"), columns=["text"])
    return heavy_hitters(ds, k=512).head(20).reset_index(drop=True)


# Misra-Gries is EXACT whenever the true distinct-key count is ≤ k (no
# counter ever decrements), and the fixture vocabulary (31 tokens) is far
# below k=512 — so the sketch degenerates to exact counts here and a
# plain group-by oracle is valid. Tokenization matches heavy_hitters'
# str.split(): NO lowercasing, whitespace runs collapsed.
Q_HEAVY_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS item
  FROM documents WHERE text IS NOT NULL)
SELECT item, count(*)::BIGINT AS n_min
FROM toks GROUP BY item
ORDER BY n_min DESC, item
LIMIT 20
"""


def q_approx_quantiles(sf_dir: str) -> pd.DataFrame:
    """t-digest approximate quantiles of l_extendedprice — a CONTINUOUS
    high-cardinality column, where exact_quantiles' value-count histogram
    stops being small. One ~3 KB digest per batch crosses the wire; rank
    error is pinned vs the exact histogram in tests/test_sketches_modes.py
    (exact oracle-checked twin: q_quantity_quantiles)."""
    from .functions.sketches import approx_quantiles
    ds = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_extendedprice"])
    return approx_quantiles(ds, value_col="l_extendedprice",
                            qs=[0.25, 0.5, 0.75, 0.9, 0.99])


def q_seq_packing(sf_dir: str) -> pd.DataFrame:
    """Sequence packing offsets: running token total over doc_id order
    (distributed two-pass prefix sum, windows.prefix_sum) and the
    2048-token training-bin each document STARTS in (exclusive prefix //
    capacity). The scan is the Ray-native replacement for a global
    ``SUM OVER (ORDER BY ...)`` window — no global sort, partition
    offsets broadcast once."""
    capacity = 2048

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["text"].fillna("").str.count(r"\S+")
            .astype("int64")})

    ds = read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"]) \
        .map_batches(toks, batch_format="pandas")
    out = wn.prefix_sum(ds, key_col="doc_id", value_col="n_tokens",
                        part_size=256).to_pandas()
    out["bin"] = (out["running"] - out["n_tokens"]) // capacity
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SEQ_PACKING_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS running
  FROM t)
SELECT doc_id, n_tokens, running::BIGINT AS running,
       ((running - n_tokens) // 2048)::BIGINT AS bin
FROM s ORDER BY doc_id
"""


def q_mask_pii(sf_dir: str) -> pd.DataFrame:
    """PII redaction over a contact blurb derived deterministically from
    `customer` (the documents fixture contains no PII, which would make
    the gate vacuous): both engine and oracle synthesize the identical
    'Reach <name> via <email> or <phone>.' text, then mask. Exercises
    real replacement boundaries — greedy domain backtracking, the
    email-before-phone pass order, and count parity."""
    from .functions.textops import mask_pii

    def contact(batch: pd.DataFrame) -> pd.DataFrame:
        name = batch["c_name"]
        email = (name.str.replace("#", "", regex=False).str.lower()
                 + "@corp" + batch["c_nationkey"].astype(str)
                 + ".example.com")
        phone = ("+1-" + ((batch["c_custkey"] * 7) % 900 + 100).astype(str)
                 + "-555-"
                 + ((batch["c_custkey"] * 13) % 10000).astype(str)
                 .str.zfill(4))
        return pd.DataFrame({
            "c_custkey": batch["c_custkey"],
            "text": "Reach " + name + " via " + email + " or "
                    + phone + "."})

    ds = read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(contact, batch_format="pandas")
    out = mask_pii(ds, text_col="text", id_col="c_custkey").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_MASK_PII_SQL = r"""
WITH t AS (
  SELECT c_custkey,
         'Reach ' || c_name || ' via '
           || lower(replace(c_name, '#', ''))
           || '@corp' || c_nationkey || '.example.com or +1-'
           || ((c_custkey * 7) % 900 + 100) || '-555-'
           || lpad(((c_custkey * 13) % 10000)::VARCHAR, 4, '0')
           || '.' AS txt
  FROM customer),
m AS (
  SELECT c_custkey,
         length(regexp_extract_all(
           txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           AS n_email,
         regexp_replace(
           txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS t2
  FROM t)
SELECT c_custkey,
       regexp_replace(t2, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}',
                      '<PHONE>', 'g') AS masked,
       n_email::BIGINT AS n_email,
       length(regexp_extract_all(
         t2, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))::BIGINT
         AS n_phone
FROM m ORDER BY c_custkey
"""


def q_media_metadata(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return mm.media_metadata(ds).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)


def q_media_resize(sf_dir: str) -> pd.DataFrame:
    """Resize plumbing (binary→binary stage): summary columns only —
    the resized payload itself stays distributed; the driver sees its
    length and digest."""
    import hashlib as _hl
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    media = mm.media_dataset_from_documents(ds)
    resized = media.map_batches(mm.ResizeStage, batch_format="pyarrow",
                                batch_size=32, concurrency=2,
                                fn_constructor_kwargs={"target_w": 48,
                                                       "target_h": 32})

    def summarize(t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        return pa.table({
            "media_id": t["media_id"],
            "width": t["width"], "height": t["height"],
            "out_len": pa.array([len(p) for p in payloads], pa.int64()),
            "out_sha1": pa.array(
                [_hl.sha1(p).hexdigest()[:16] for p in payloads],
                pa.string())})

    out = resized.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Feature-extract plumbing: payload → deterministic unit embedding
    (list<float>) — the column layout the ANN operators consume."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    media = mm.media_dataset_from_documents(ds)
    out = media.map_batches(mm.FeatureExtractStage, batch_format="pyarrow",
                            batch_size=32, concurrency=2).to_pandas()
    out["embedding"] = out["embedding"].map(
        lambda v: ",".join(f"{x:.6f}" for x in v))
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_jpeg_decode(sf_dir: str) -> pd.DataFrame:
    """REAL baseline-JPEG decode through the media stage: deterministic
    jpeg payloads are synthesized per doc_id (encoded with the repo's
    own T.81 encoder — no external data), then MediaDecodeStage with
    ``real_decode=True`` Huffman-decodes, IDCTs and color-converts real
    pixels; ``pixel_sha1`` checksums the DECODED array, so a header-only
    parse cannot fake this. Subset (doc_id % 10 == 0) keeps the
    per-image Python entropy coder off the hot path at bench scale."""
    from .functions.jpeg import encode_jpeg

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 10 == 0]
        payloads = []
        for i in ids:
            h, w = 8 + (i // 10) % 3 * 8, 16 + i % 3 * 8
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(yy * 9 + i) % 256, (xx * 7 + i) % 256,
                           (yy + xx + i) % 256], axis=-1).astype(np.uint8)
            payloads.append(encode_jpeg(px, subsample=bool(i % 20),
                                        restart_interval=2))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "mime": pa.array(["image/jpeg"] * n, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.MediaDecodeStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2,
                     fn_constructor_kwargs={"real_decode": True}) \
        .to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_png_decode(sf_dir: str) -> pd.DataFrame:
    """REAL PNG decode through the media stage (stdlib-zlib codec in
    functions/png.py): deterministic PNG payloads synthesized per
    doc_id, decoded to actual pixel arrays (``pixel_sha1`` checksums
    the decoded array). PNG encode/decode is lossless and cheap, so no
    subsetting is needed."""
    from .functions.png import encode_png

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            h, w = 4 + i % 5, 6 + i % 7
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(yy * 31 + i) % 256, (xx * 17 + i) % 256,
                           (yy * xx + i) % 256], axis=-1).astype(np.uint8)
            payloads.append(encode_png(px))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "mime": pa.array(["image/png"] * n, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.MediaDecodeStage, batch_format="pyarrow",
                     batch_size=64, concurrency=2,
                     fn_constructor_kwargs={"real_decode": True}) \
        .to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_gif_frames(sf_dir: str) -> pd.DataFrame:
    """REAL animated-GIF frame sampling: deterministic multi-frame GIFs
    synthesized per doc_id (own LZW encoder), frame-extracted by
    FrameSampleStage's real path (per-frame LZW decode; frame_hash
    checksums the decoded index arrays)."""
    from .functions.gif import encode_gif

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 4 == 0]
        pal = np.stack([np.arange(16) * 7 % 256, np.arange(16) * 31 % 256,
                        np.arange(16) * 13 % 256], axis=-1).astype(np.uint8)
        payloads = []
        for i in ids:
            n_frames = 2 + i % 5
            frs = [((np.add.outer(np.arange(6) * 3, np.arange(8)) + i + f)
                    % 16).astype(np.uint8) for f in range(n_frames)]
            payloads.append(encode_gif(frs, pal))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "mime": pa.array(["image/gif"] * n, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.FrameSampleStage, batch_format="pyarrow",
                     batch_size=32, concurrency=2,
                     fn_constructor_kwargs={"every_k": 2,
                                            "real_decode": True}) \
        .to_pandas()
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_media_video_frames(sf_dir: str) -> pd.DataFrame:
    """REAL video frame sampling (functions/video.py + mp4.py):
    deterministic AVI (alternating MJPEG / raw-DIB streams), Y4M and
    MP4 (jpeg-sample-entry ISO BMFF) payloads are synthesized per
    doc_id, then FrameSampleStage's real path walks the container and
    decodes every sampled frame (MJPEG chunks through the T.81
    decoder, DIB as bottom-up BGR, Y4M as planar BT.601 YUV→RGB, MP4
    samples via the stsc/stco/stsz offset expansion); ``frame_hash``
    checksums the DECODED RGB arrays. Subset (doc_id % 8 == 0) keeps
    the per-frame Python entropy coder off the hot path at bench
    scale."""
    from .functions.mp4 import encode_mp4
    from .functions.video import encode_avi, encode_y4m, rgb_to_yuv420

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 8 == 0]
        payloads, mimes = [], []
        for i in ids:
            n_frames = 2 + i % 4
            h, w = 8 + (i // 8) % 2 * 8, 16
            yy, xx = np.mgrid[0:h, 0:w]
            frames = [np.stack([(yy * 5 + i + f) % 256,
                                (xx * 11 + i) % 256,
                                (yy + xx + f) % 256],
                               axis=-1).astype(np.uint8)
                      for f in range(n_frames)]
            kind = (i // 8) % 4
            if kind == 0:
                payloads.append(encode_avi(frames, codec="MJPG"))
                mimes.append("video/x-msvideo")
            elif kind == 1:
                payloads.append(encode_avi(frames, codec="DIB "))
                mimes.append("video/x-msvideo")
            elif kind == 2:
                payloads.append(encode_y4m(
                    [rgb_to_yuv420(f) for f in frames], w, h))
                mimes.append("video/x-yuv4mpeg")
            else:
                payloads.append(encode_mp4(frames))
                mimes.append("video/mp4")
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "mime": pa.array(mimes, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.FrameSampleStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2,
                     fn_constructor_kwargs={"every_k": 2,
                                            "real_decode": True}) \
        .to_pandas()
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_media_audio_stats(sf_dir: str) -> pd.DataFrame:
    """REAL audio analysis through the media stage: deterministic
    clips (sine + harmonic, amplitude/frequency/channel count keyed
    off doc_id) are synthesized per doc across four container/codec
    shapes — 16-bit PCM WAV, Sun AU µ-law (G.711-companded, so the
    stats reflect the REAL companding loss), 16-bit PCM AU, and AIFF
    — then AudioStatsStage sniffs each payload, decodes the actual
    sample arrays and computes peak / RMS / duration with vectorized
    numpy — the audio analogue of the image queries' decoded-pixel
    checksums."""
    from .functions.audio import encode_aiff, encode_au
    from .functions.multimodal import encode_wav

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 5 == 0]
        payloads, mimes = [], []
        for i in ids:
            sr = 8000
            n = 800 + (i % 5) * 400
            tt = np.arange(n, dtype=np.float64) / sr
            freq = 220.0 + (i % 16) * 55.0
            amp = 0.2 + (i % 4) * 0.2
            wave = amp * np.sin(2 * np.pi * freq * tt) \
                + 0.1 * np.sin(2 * np.pi * 3 * freq * tt)
            mono = np.clip(np.round(wave * 32767), -32768,
                           32767).astype(np.int16)
            ch = 1 + i % 2
            samples = np.stack([mono] * ch, axis=1) if ch > 1 \
                else mono[:, None]
            kind = (i // 5) % 4
            if kind == 0:
                payloads.append(encode_wav(samples, sr))
                mimes.append("audio/wav")
            elif kind == 1:
                payloads.append(encode_au(samples, sr, encoding="ulaw"))
                mimes.append("audio/basic")
            elif kind == 2:
                payloads.append(encode_au(samples, sr, encoding="pcm16"))
                mimes.append("audio/basic")
            else:
                payloads.append(encode_aiff(samples, sr))
                mimes.append("audio/aiff")
        n_rows = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio"] * n_rows, pa.string()),
            "mime": pa.array(mimes, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.AudioStatsStage, batch_format="pyarrow",
                     batch_size=32, concurrency=2) \
        .to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_frame_sample(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    media = mm.media_dataset_from_documents(ds)
    out = media.map_batches(mm.FrameSampleStage, batch_format="pyarrow",
                            batch_size=32, concurrency=2).to_pandas()
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Windowed / relational / sampling operators (functions/windows.py) and
# exact n-gram Jaccard — every one oracle-checked
# ---------------------------------------------------------------------------

def q_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """EXACT word-3-gram Jaccard pairs ≥ 2/5 with df≤64 hot-shingle cap —
    the precise operator MinHash-LSH approximates; fully distributed."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.ngram_jaccard_pairs(ds, k=3, thr_num=2, thr_den=5,
                                 max_df=64).to_pandas()
    out = out.astype({c: "int64" for c in out.columns})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


Q_NGRAM_JACCARD_SQL = r"""
WITH toklist AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         (('0x'||substr(md5(array_to_string(l[g.i:g.i+2], ' ')),1,16))::UBIGINT
           & ((1::UBIGINT<<61)-1))::BIGINT AS h
  FROM toklist, LATERAL (SELECT unnest(range(1, len(l)-3+2)) AS i) g
  WHERE len(l) >= 3),
df AS (SELECT h, count(*) AS df FROM grams GROUP BY h),
capped AS (SELECT g.doc_id, g.h FROM grams g JOIN df USING (h)
           WHERE df.df <= 64),
sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b,
       i.isz::BIGINT AS inter_sz,
       (sa.sz + sb.sz - i.isz)::BIGINT AS union_sz,
       (i.isz * 1000000) // (sa.sz + sb.sz - i.isz) AS jac_micro
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
             JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.isz * 5 >= (sa.sz + sb.sz - i.isz) * 2
ORDER BY doc_a, doc_b
"""


def q_rolling_events(sf_dir: str) -> pd.DataFrame:
    """Per-user sliding-window (4 rows) sum+count over event values —
    salted-bucket distributed windowing (functions/windows.py)."""
    ds = read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["value"])
        return t.append_column(
            "value_centi", pa.array(  # floor(+0.5) == oracle, not rint
                np.floor(v * 100 + 0.5).astype(np.int64)))

    out = wn.rolling_window_sum(
        ds.map_batches(to_centi, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value_centi", window=4).to_pandas()
    out = out[["event_id", "user_id", "win_sum", "win_n"]] \
        .rename(columns={"win_sum": "win_sum_centi"})
    return out.sort_values("event_id").reset_index(drop=True)


Q_ROLLING_SQL = """
SELECT event_id, user_id,
       CAST(sum(value_centi) OVER w AS BIGINT) AS win_sum_centi,
       CAST(count(*) OVER w AS BIGINT) AS win_n
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

def q_running_user_totals(sf_dir: str) -> pd.DataFrame:
    """Per-user running value totals (grouped prefix sum,
    windows.grouped_running_sum): SUM OVER (PARTITION BY user ORDER BY
    ts) without per-user groups — keys salted into buckets, one
    vectorized cumsum per bucket."""
    ds = read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["value"])
        return t.append_column(
            "value_centi", pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64)))

    out = wn.grouped_running_sum(
        ds.map_batches(to_centi, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value_centi").to_pandas()
    out = out[["event_id", "user_id", "running"]] \
        .rename(columns={"running": "run_centi"})
    return out.sort_values("event_id").reset_index(drop=True)


Q_RUNNING_USER_SQL = """
SELECT event_id, user_id,
       CAST(sum(value_centi) OVER w AS BIGINT) AS run_centi
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
"""


_BAND_EDGES = [900.0, 920.0, 940.0, 960.0, 980.0, 1000.0]
_BAND_LABELS = ["B0", "B1", "B2", "B3", "B4"]


def q_price_band_join(sf_dir: str) -> pd.DataFrame:
    """Range join of parts onto half-open price bands (broadcast small
    side, zero shuffle before the 5-row groupby)."""
    ds = read_parquet(_t(sf_dir, "part"),
                         columns=["p_retailprice"])
    out = wn.range_band_join(ds, value_col="p_retailprice",
                             edges=_BAND_EDGES, labels=_BAND_LABELS,
                             agg_col="p_retailprice").to_pandas()
    out = out.rename(columns={"n_rows": "n_parts",
                              "sum_milli": "sum_retail_milli"})
    out = out.astype({"n_parts": "int64", "sum_retail_milli": "int64"})
    return out.sort_values("band").reset_index(drop=True)


Q_BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (VALUES
  ('B0', 900.0, 920.0), ('B1', 920.0, 940.0), ('B2', 940.0, 960.0),
  ('B3', 960.0, 980.0), ('B4', 980.0, 1000.0))
SELECT b.band,
       count(*)::BIGINT AS n_parts,
       sum(CAST(floor(p.p_retailprice * 1000 + 0.5) AS BIGINT))::BIGINT
         AS sum_retail_milli
FROM part p JOIN bands b
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band ORDER BY b.band
"""


def q_quantity_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact rank quantiles of l_quantity via the distributed value-count
    histogram (one shuffle, one row per distinct value)."""
    ds = read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity"])
    return wn.exact_quantiles(ds, value_col="l_quantity",
                              qs=[0.25, 0.5, 0.75, 0.9, 0.99])


Q_QUANTILES_SQL = """
WITH o AS (SELECT l_quantity AS val,
                  row_number() OVER (ORDER BY l_quantity) - 1 AS rn
           FROM lineitem),
n AS (SELECT count(*) AS n FROM lineitem),
qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
SELECT qs.q AS q, o.val AS val
FROM qs, n
JOIN o ON o.rn = CAST(floor(qs.q * (n.n - 1)) AS BIGINT)
ORDER BY q
"""


def q_grouped_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag exact quantiles of l_quantity (grouped value-count
    histogram, one row per distinct (flag, qty) over the shuffle)."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity"])
    return wn.grouped_quantiles(ds, key_col="l_returnflag",
                                value_col="l_quantity",
                                qs=[0.25, 0.5, 0.9]) \
        .sort_values(["l_returnflag", "q"]).reset_index(drop=True)


Q_GROUPED_QUANTILES_SQL = """
WITH o AS (SELECT l_returnflag, l_quantity AS val,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_quantity) - 1 AS rn
           FROM lineitem),
n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag),
qs(q) AS (VALUES (0.25), (0.5), (0.9))
SELECT n.l_returnflag AS l_returnflag, qs.q AS q, o.val AS val
FROM qs, n
JOIN o ON o.l_returnflag = n.l_returnflag
      AND o.rn = CAST(floor(qs.q * (n.n - 1)) AS BIGINT)
ORDER BY n.l_returnflag, q
"""


def q_doc_hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic 10% md5-threshold sample of documents."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    out = wn.hash_sample(ds, id_col="doc_id", pct=10).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_HASH_SAMPLE_SQL = """
SELECT doc_id FROM documents
WHERE ('0x'||substr(md5(doc_id::VARCHAR),1,8))::UBIGINT % 100 < 10
ORDER BY doc_id
"""


def q_distinct_tokens_exact(sf_dir: str) -> pd.DataFrame:
    """Exact distinct-token count (oracle twin of approx_distinct_tokens;
    a test pins the HLL estimate's relative error against this)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["text"])
    n = wn.distinct_count(ds, col="text", tokenize=True)
    return pd.DataFrame({"n_distinct": pd.Series([n], dtype="int64")})


Q_DISTINCT_SQL = r"""
SELECT count(DISTINCT token)::BIGINT AS n_distinct FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS token
  FROM documents) t
"""


def q_repetition_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition signals per document (integer counts)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return to.repetition_stats(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


Q_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
uni AS (
  SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id, unnest(words) AS token FROM w) GROUP BY 1, 2),
us AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         max(c)::BIGINT AS top_token_n
  FROM uni GROUP BY 1),
bi AS (
  SELECT doc_id, words[i] || ' ' || words[i + 1] AS bg
  FROM (SELECT doc_id, words, unnest(range(1, len(words))) AS i FROM w)),
bs AS (
  SELECT doc_id, max(c)::BIGINT AS top_bigram_n
  FROM (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2) GROUP BY 1)
SELECT d.doc_id,
       coalesce(us.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(us.n_types, 0)::BIGINT AS n_types,
       coalesce(us.top_token_n, 0)::BIGINT AS top_token_n,
       coalesce(bs.top_bigram_n, 0)::BIGINT AS top_bigram_n
FROM documents d LEFT JOIN us USING (doc_id) LEFT JOIN bs USING (doc_id)
ORDER BY d.doc_id
"""


def q_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-3 tf-idf terms per document (integerized scores)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.tfidf_top_terms(ds, k=3).to_pandas()
    out["tfidf_micro"] = out["tfidf_micro"].astype("int64")
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


Q_TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
s AS (
  SELECT t.doc_id, t.token,
         CAST(floor(t.tf * ln((SELECT n FROM nd) / d.df) * 1000000 + 0.5)
              AS BIGINT) AS tfidf_micro
  FROM tf t JOIN df d USING (token)),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_micro DESC, token) AS rn
  FROM s)
SELECT doc_id, token, tfidf_micro FROM r WHERE rn <= 3
ORDER BY doc_id, token
"""


def q_common_ngrams(sf_dir: str) -> pd.DataFrame:
    """Corpus-boilerplate 3-grams: appear in ≥ max(2, n_docs/250) docs."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    thr = max(2, ds.count() // 250)
    out = to.common_ngrams(ds, n=3, min_docs=thr).to_pandas()
    if not len(out):
        out = pd.DataFrame({"ngram": pd.Series([], dtype="object"),
                            "n_docs": pd.Series([], dtype="int64")})
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("ngram").reset_index(drop=True)


Q_COMMON_NGRAMS_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS ngram
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 1)) AS i FROM w))
SELECT ngram, count(*)::BIGINT AS n_docs FROM g
GROUP BY ngram
HAVING count(*) >= greatest(2, (SELECT count(*) // 250 FROM documents))
ORDER BY ngram
"""


def q_eval_carve(sf_dir: str) -> pd.DataFrame:
    """Eval-set carving: exactly 20 deterministically-sampled docs per
    language (smallest md5 rank wins; salt-swappable)."""
    from .functions.splits import grouped_hash_sample_k
    ds = read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang"])
    out = grouped_hash_sample_k(ds, key_col="lang", k=20).to_pandas()
    return out[["doc_id", "lang"]].sort_values("doc_id") \
        .reset_index(drop=True)


Q_EVAL_CARVE_SQL = r"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY ('0x' || substr(md5('gsk-v1' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT,
             doc_id) <= 20
ORDER BY doc_id
"""


def q_token_budget_mix(sf_dir: str) -> pd.DataFrame:
    """Mixture sampling to a per-source token budget: admit each
    language's docs in deterministic md5 order until the cumulative
    token count reaches 3000 — the 'sample N tokens per source' step of
    assembling a training mixture, as token_counts ∘ seeded order ∘
    grouped_running_sum ∘ filter (pure composition, no new shuffle
    primitive)."""
    from .functions.windows import grouped_running_sum
    ds = read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])
    budget = 3000

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _h
        texts = batch["text"].fillna("")
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "lang": batch["lang"].to_numpy(),
            "n_tokens": texts.str.split().str.len()
                .astype("int64").to_numpy(),
            "h": np.fromiter(
                (int.from_bytes(
                    _h.md5(f"mix-v1{i}".encode()).digest()[:8],
                    "big") >> 4 for i in ids),
                dtype=np.int64, count=len(ids))})

    run = grouped_running_sum(
        ds.map_batches(prep, batch_format="pandas"),
        key_col="lang", order_cols=["h", "doc_id"],
        value_col="n_tokens")
    out = run.filter(expr=f"running <= {budget}").to_pandas()
    out["running"] = out["running"].astype("int64")
    return out[["doc_id", "lang", "n_tokens", "running"]] \
        .sort_values("doc_id").reset_index(drop=True)


Q_TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         length(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> ''))::BIGINT AS n_tokens,
         ('0x' || substr(md5('mix-v1' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT AS h
  FROM documents)
SELECT doc_id, lang, n_tokens,
       SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS running
FROM t
QUALIFY running <= 3000
ORDER BY doc_id
"""


def q_lineitem_corr(sf_dir: str) -> pd.DataFrame:
    """Numeric profiling: per-returnflag Pearson corr(quantity, price),
    six-moment combiner vs SQL corr() (integerized, tf-idf convention)."""
    from .functions.windows import grouped_pearson
    ds = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    out = grouped_pearson(ds, key_col="l_returnflag", x_col="l_quantity",
                          y_col="l_extendedprice").to_pandas()
    # grouped_pearson emits NaN for zero-variance groups where SQL
    # corr() emits NULL; NaN.astype(int64) is garbage (INT64_MIN-ish),
    # so both sides agree on an explicit sentinel instead.
    corr = out["corr"].to_numpy(dtype=np.float64)
    finite = np.isfinite(corr)
    micro = np.full(len(corr), _CORR_NULL_SENTINEL, dtype=np.int64)
    micro[finite] = np.floor(corr[finite] * 1_000_000 + 0.5) \
        .astype(np.int64)
    out["corr_micro"] = micro
    return out[["l_returnflag", "n", "corr_micro"]] \
        .sort_values("l_returnflag").reset_index(drop=True)


# NULL/NaN corr (zero-variance group) sentinel shared with the SQL twin
_CORR_NULL_SENTINEL = -(2 ** 62)

Q_LINEITEM_CORR_SQL = rf"""
SELECT l_returnflag, count(*)::BIGINT AS n,
       coalesce(floor(corr(l_quantity, l_extendedprice) * 1000000
                      + 0.5)::BIGINT, {_CORR_NULL_SENTINEL}) AS corr_micro
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_latest_events(sf_dir: str) -> pd.DataFrame:
    """Current-state-per-entity: each user's most recent event (the
    url/warc_ts latest-capture dedup shape, on the events table)."""
    from .functions.windows import latest_per_key
    ds = read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    out = latest_per_key(ds, key_col="user_id",
                         order_cols=["ts", "event_id"]).to_pandas()
    return out[["user_id", "event_id", "ts", "event_type"]] \
        .sort_values("user_id").reset_index(drop=True)


Q_LATEST_EVENTS_SQL = r"""
SELECT user_id, event_id, ts, event_type
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Nightly-refresh dedup: increment (upper half of doc ids) vs a
    frozen base (lower half) held in SeenShard membership actors."""
    from .functions.dedup import incremental_dedup
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    half = ds.count() // 2
    out = incremental_dedup(
        ds.filter(expr=f"doc_id < {half}"),
        ds.filter(expr=f"doc_id >= {half}")).to_pandas()
    if not len(out):
        out = pd.DataFrame({"text_hash": pd.Series([], dtype="object"),
                            "doc_id": pd.Series([], dtype="int64"),
                            "n_new": pd.Series([], dtype="int64")})
    out["n_new"] = out["n_new"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


Q_INCR_DEDUP_SQL = r"""
WITH half AS (SELECT count(*) // 2 AS h FROM documents),
base AS (SELECT md5(text) AS th FROM documents, half WHERE doc_id < h),
newr AS (SELECT doc_id, md5(text) AS th
         FROM documents, half WHERE doc_id >= h)
SELECT th AS text_hash, min(doc_id) AS doc_id, count(*)::BIGINT AS n_new
FROM newr WHERE th NOT IN (SELECT th FROM base)
GROUP BY th
ORDER BY text_hash
"""


def q_seeded_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic epoch-shuffle order: pos = rank of md5('shuf-v1'‖id)."""
    from .functions.splits import seeded_shuffle_positions
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    out = seeded_shuffle_positions(ds, seed="shuf-v1").to_pandas()
    out["pos"] = out["pos"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SEEDED_SHUFFLE_SQL = r"""
SELECT doc_id,
       (row_number() OVER (
          ORDER BY ('0x' || substr(md5('shuf-v1' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT,
                   doc_id) - 1)::BIGINT AS pos
FROM documents
ORDER BY doc_id
"""


def q_dup_substrings(sf_dir: str) -> pd.DataFrame:
    """Duplicated-substring exposure per doc (Lee'22 ExactSubstr signal,
    content-defined anchors; see textops.duplicated_substrings)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.duplicated_substrings(
        ds, window=30, anchor_mod=4, min_docs=2).to_pandas()
    if not len(out):
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "n_windows": pd.Series([], dtype="int64"),
                            "dup_windows": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


# anchor predicate = engine's _anchor_windows polynomial (base-257 over
# 4 codepoints, mod 4); window hash = engine's 60-bit md5 prefix. Both
# sides are pure integer arithmetic on codepoints, so parity is exact.
Q_DUP_SUBSTR_SQL = r"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - 30 + 2)) AS p
  FROM documents WHERE length(text) >= 30
), anch AS (
  SELECT doc_id, substr(text, p, 30) AS win FROM pos
  WHERE (unicode(substr(text, p, 1))::BIGINT * 16974593
       + unicode(substr(text, p + 1, 1))::BIGINT * 66049
       + unicode(substr(text, p + 2, 1))::BIGINT * 257
       + unicode(substr(text, p + 3, 1))::BIGINT) % 4 = 0
), perdoc AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(win), 1, 15))::BIGINT AS h
  FROM anch
), hcnt AS (
  SELECT h, count(*) AS n_docs FROM perdoc GROUP BY h
)
SELECT p.doc_id AS doc_id,
       count(*)::BIGINT AS n_windows,
       sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT
         AS dup_windows
FROM perdoc p JOIN hcnt c ON p.h = c.h
GROUP BY p.doc_id
HAVING sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) >= 1
ORDER BY doc_id
"""


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Language-rebalance sampling: en 10%, zh/de 25%, fr/es 50%."""
    from .functions.splits import stratified_sample
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = stratified_sample(
        ds, rates={"en": 10, "fr": 50, "es": 50, "zh": 25, "de": 25},
        default_pct=10).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


Q_STRATIFIED_SQL = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 <
      CASE lang WHEN 'fr' THEN 50 WHEN 'es' THEN 50
                WHEN 'zh' THEN 25 WHEN 'de' THEN 25 ELSE 10 END
ORDER BY doc_id
"""


def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """LLM context-window chunking: 64-token chunks at stride 48."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.chunk_documents(ds, chunk_size=64, stride=48).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


Q_DOC_CHUNKS_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
s AS (SELECT doc_id, words, unnest(range(0, len(words), 48)) AS i FROM w)
SELECT doc_id, (i // 48)::BIGINT AS chunk_idx,
       least(64, len(words) - i)::BIGINT AS n_tokens,
       array_to_string(words[i + 1 : i + 64], ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_idx
"""


def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: train docs (split != test under the
    standard md5 split) sharing ≥1 distinct 4-gram with the held-out
    test split, with the distinct-hit count."""
    from .functions.splits import assign_split
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    split = assign_split(ds)

    def keep(where: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b[(b["split"] == "test") == where]
        return f

    eval_grams = to.eval_ngram_set(
        split.map_batches(keep(True), batch_format="pandas"), n=4)
    train = split.map_batches(keep(False), batch_format="pandas")
    out = to.decontaminate(train, eval_grams, n=4).to_pandas()
    if not len(out):
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "n_hits": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


Q_DECONTAMINATE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 10 = 9 AS is_eval,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
g AS (
  SELECT DISTINCT doc_id, is_eval,
         words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]
                 || ' ' || words[i + 3] AS ngram
  FROM (SELECT doc_id, is_eval, words,
               unnest(range(1, len(words) - 2)) AS i FROM w)),
eg AS (SELECT DISTINCT ngram FROM g WHERE is_eval)
SELECT g.doc_id, count(DISTINCT g.ngram)::BIGINT AS n_hits
FROM g JOIN eg USING (ngram) WHERE NOT g.is_eval
GROUP BY g.doc_id ORDER BY g.doc_id
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (wide aggregation): events per day × event_type as
    columns. Conditional partial counts per batch → one groupby(day)
    over pre-aggregated rows; the pivot itself is free because the
    column set is the (small, known) type domain — the shuffle moves
    one row per (day, batch), never per event."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = batch["ts"].dt.floor("D")
        out = pd.DataFrame({"day": day.unique()}).set_index("day")
        for et in _EVENT_TYPES:
            out["n_" + et] = day[batch["event_type"] == et] \
                .value_counts().reindex(out.index).fillna(0).astype("int64")
        return out.reset_index()

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("day").aggregate(
            *[Sum("n_" + et, alias_name="n_" + et)
              for et in _EVENT_TYPES]).to_pandas()
    for et in _EVENT_TYPES:
        agg["n_" + et] = agg["n_" + et].astype("int64")
    return agg.sort_values("day").reset_index(drop=True)


Q_EVENTS_PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY 1 ORDER BY day
"""


def q_price_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width binned histogram of o_totalprice (bin = 25k):
    per-batch bincount partials → groupby(bin) sum. The classic
    distribution profile at 100 TB — one int row per (bin, batch)
    crosses the wire."""
    ds = read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])
    width = 25_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bins = (batch["o_totalprice"].to_numpy() // width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pd.DataFrame({"bin_lo": u * width,
                             "n": pd.Series(c, dtype="int64")})

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bin_lo").aggregate(Sum("n", alias_name="n")).to_pandas()
    out["bin_lo"] = out["bin_lo"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bin_lo").reset_index(drop=True)


Q_PRICE_HISTOGRAM_SQL = """
SELECT (CAST(floor(o_totalprice / 25000) AS BIGINT) * 25000) AS bin_lo,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY bin_lo
"""


def q_bloom_filtered_orders(sf_dir: str) -> pd.DataFrame:
    """Bloom-pruned join: order stats for high-balance customers. The
    rich-customer keys build a distributed Bloom filter (OR-merged
    partials, broadcast once) that prunes orders batches BEFORE the
    shuffle; survivors verify exactly via the native semi join, so
    false positives cost shuffle rows, never correctness — the result
    matches the plain SQL join. At 10^9 keys the bloom is ~1.2 GB
    broadcast where a key set would be tens of GB."""
    from .functions.sketches import BloomFilter, build_bloom
    cust = read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal"]) \
        .map_batches(lambda t: pa.table(
            {"c_custkey": t.filter(pc.greater(
                t["c_acctbal"], pa.scalar(7000.0)))["c_custkey"]}),
            batch_format="pyarrow").materialize()
    n_keys = max(cust.count(), 1)
    bloom_ref = ray.put(build_bloom(cust, key_col="c_custkey",
                                    m_bits=10 * n_keys))

    def prefilter(t: pa.Table) -> pa.Table:
        b: BloomFilter = cached_object(bloom_ref)
        keep = b.might_contain(t["o_custkey"].to_numpy())
        return t.filter(pa.array(keep))

    orders = read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderstatus", "o_totalprice"]) \
        .map_batches(prefilter, batch_format="pyarrow")
    with light_shuffle_aggregators():
        verified = orders.join(cust.repartition(8), join_type="left_semi",
                               num_partitions=8, on=("o_custkey",),
                               right_on=("c_custkey",)).materialize()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(total_milli=np.floor(
            batch["o_totalprice"] * 1000).astype("int64"))
        return batch.groupby("o_orderstatus", as_index=False).agg(
            n_orders=("total_milli", "size"),
            total_milli=("total_milli", "sum"))

    out = verified.repartition(8) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("o_orderstatus").aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_milli", alias_name="total_milli")).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_milli"] = out["total_milli"].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


Q_BLOOM_ORDERS_SQL = """
SELECT o.o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 1000) AS BIGINT)) AS BIGINT)
           AS total_milli
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 7000
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (multi-level aggregation): revenue at (returnflag,
    linestatus), per-returnflag subtotal, and grand total in one pass.
    One partial-aggregated shuffle at the FINEST level; the coarser
    levels fold from the finest grouped result (a few rows) — never a
    second scan of the fact table. NULL-marker columns use '(all)'
    (driver hashing needs non-null keys)."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        batch = batch.assign(
            revenue_milli=np.floor(rev * 1000).astype("int64"))
        return batch.groupby(["l_returnflag", "l_linestatus"],
                             as_index=False).agg(
            revenue_milli=("revenue_milli", "sum"),
            n=("revenue_milli", "size"))

    fine = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("revenue_milli", alias_name="revenue_milli"),
            Sum("n", alias_name="n")).to_pandas()
    sub = fine.groupby("l_returnflag", as_index=False).agg(
        revenue_milli=("revenue_milli", "sum"), n=("n", "sum"))
    sub["l_linestatus"] = "(all)"
    total = pd.DataFrame({
        "l_returnflag": ["(all)"], "l_linestatus": ["(all)"],
        "revenue_milli": [fine["revenue_milli"].sum()],
        "n": [fine["n"].sum()]})
    out = pd.concat([fine, sub, total], ignore_index=True)
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "revenue_milli", "n"]] \
        .sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


Q_REVENUE_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                     AS BIGINT)) AS BIGINT) AS revenue_milli,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_adaptive_quality(sf_dir: str) -> pd.DataFrame:
    """Adaptive (data-dependent) quality floor: corpus p10 of the
    token count becomes the keep threshold, then one broadcast-scalar
    filter pass. Two passes over an id-level (doc_id, n_tokens) table
    (materialized once — it is ids+ints, tiny next to the text); the
    quantile's only shuffle is the value-count histogram."""

    def tok(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": pd.Series(
                [len(t.split()) for t in batch["text"].fillna("")],
                dtype="int64")})

    counts = read_parquet(_t(sf_dir, "documents"),
                             columns=["doc_id", "text"]) \
        .map_batches(tok, batch_format="pandas").materialize()
    thr = float(wn.exact_quantiles(counts, value_col="n_tokens",
                                   qs=[0.1])["val"].iloc[0])
    out = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_tokens"],
                                      pa.scalar(int(thr)))),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_tokens": "int64"})


Q_ADAPTIVE_QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
o AS (SELECT n_tokens AS v, row_number() OVER (ORDER BY n_tokens) - 1 AS rn
      FROM t),
c AS (SELECT count(*) AS n FROM t),
thr AS (SELECT v FROM o, c WHERE rn = CAST(floor(0.1 * (n - 1)) AS BIGINT))
SELECT doc_id, n_tokens FROM t WHERE n_tokens > (SELECT v FROM thr)
ORDER BY doc_id
"""


def q_corpus_prep(sf_dir: str) -> pd.DataFrame:
    """Flagship training-corpus prep composition: quality gate → exact
    dedup → split → decontaminate → chunk, verified end-to-end by ONE
    SQL oracle (every stage is deterministic and exact)."""
    from .pipelines.corpus_prep import corpus_prep
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = corpus_prep(ds).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True) \
        .astype({"doc_id": "int64"})


Q_CORPUS_PREP_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
uni AS (
  SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id, unnest(words) AS token FROM w) GROUP BY 1, 2),
st AS (SELECT doc_id, sum(c) AS n, max(c) AS top FROM uni GROUP BY 1),
q AS (
  SELECT w.* FROM w JOIN st USING (doc_id)
  WHERE st.n >= 30 AND st.top * 10 <= st.n * 3),
d AS (
  SELECT * FROM q
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))),
s AS (
  SELECT d.*,
         CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 10 AS b
  FROM d),
g AS (
  SELECT DISTINCT doc_id, b = 9 AS is_eval,
         words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]
                 || ' ' || words[i + 3] AS ngram
  FROM (SELECT doc_id, b, words,
               unnest(range(1, len(words) - 2)) AS i FROM s)),
eg AS (SELECT DISTINCT ngram FROM g WHERE is_eval),
bad AS (SELECT DISTINCT g.doc_id FROM g JOIN eg USING (ngram)
        WHERE NOT g.is_eval),
f AS (SELECT * FROM s WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
c AS (SELECT doc_id, b, words, unnest(range(0, len(words), 48)) AS i FROM f)
SELECT doc_id,
       CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
            ELSE 'test' END AS split,
       (i // 48)::BIGINT AS chunk_idx,
       least(64, len(words) - i)::BIGINT AS n_tokens,
       array_to_string(words[i + 1 : i + 64], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_idx
"""


def q_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (ASIA revenue where customer and supplier share a
    nation), all corpus-scaled edges as NATIVE hash joins: date-filtered
    orders ⋈ customer (attaches the customer's nation), lineitem ⋈ that
    (the big⋈big edge), supplier-side revenue pre-aggregated per
    (suppkey, cust-nation) inside each batch then ⋈ supplier. Customer
    and supplier scale with the corpus, so neither is read whole on the
    driver or broadcast (the q3/segment-stats ruling). The ONLY
    broadcast-sized state is the ASIA nation-name map — nation×region
    is 25×5 FIXED rows, the one genuinely constant-size dim."""
    nat = pd.read_parquet(_t(sf_dir, "nation"))
    reg = pd.read_parquet(_t(sf_dir, "region"))
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia.r_name == "ASIA"]
    nname = dict(zip(asia.n_nationkey, asia.n_name))
    asia_keys = set(nname)

    from .rayutil import project_blocks

    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
    orders = read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi))

    def asia_cust(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"],
                        value_set=pa.array(sorted(asia_keys), pa.int32())
                        .cast(t["c_nationkey"].type))
        t = t.filter(keep)
        return pa.table({"c_custkey": t["c_custkey"],
                         "cust_nk": t["c_nationkey"].cast(pa.int64())})

    cust = read_parquet(_t(sf_dir, "customer"),
                        columns=["c_custkey", "c_nationkey"]) \
        .map_batches(asia_cust, batch_format="pyarrow")

    line = read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    with light_shuffle_aggregators():
        orders = orders.join(cust, join_type="inner", num_partitions=8,
                             on=("o_custkey",), right_on=("c_custkey",))
        orders = project_blocks(orders, ["o_orderkey", "cust_nk"])
        joined = line.join(orders, join_type="inner", num_partitions=8,
                           on=("l_orderkey",),
                           right_on=("o_orderkey",)).materialize()
    joined = joined.repartition(32)

    # pre-aggregate revenue per (suppkey, cust-nation) inside each batch
    # BEFORE the supplier join: the join side shrinks from one row per
    # lineitem to ≤ (suppliers × 5 nations) per batch
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        g = batch.assign(
            revenue_milli=np.floor(rev * 1000).astype("int64")) \
            .groupby(["l_suppkey", "cust_nk"], as_index=False) \
            .agg(revenue_milli=("revenue_milli", "sum"))
        return pd.DataFrame({
            "l_suppkey": pd.Series(g["l_suppkey"].to_numpy(),
                                   dtype="int64"),
            "cust_nk": pd.Series(g["cust_nk"].to_numpy(), dtype="int64"),
            "revenue_milli": pd.Series(g["revenue_milli"].to_numpy(),
                                       dtype="int64")})

    by_supp = joined.map_batches(partial, batch_format="pandas") \
        .groupby(["l_suppkey", "cust_nk"]) \
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"))
    by_supp = project_blocks(by_supp,
                             ["l_suppkey", "cust_nk", "revenue_milli"])
    sup = read_parquet(_t(sf_dir, "supplier"),
                       columns=["s_suppkey", "s_nationkey"])
    with light_shuffle_aggregators():
        j = by_supp.join(sup, join_type="inner", num_partitions=8,
                         on=("l_suppkey",),
                         right_on=("s_suppkey",)).materialize()

    # local supplier condition + FIXED-size nation-name lookup (arrow
    # output: a typed empty — pandas object-dtype empties trip Ray's
    # size estimator into log noise, the corpus_prep is_test pattern)
    def finish(t: pa.Table) -> pa.Table:
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = t["cust_nk"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = sn == cn
        cn = cn[keep]
        rev = t["revenue_milli"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({
            "n_name": pa.array([nname[int(k)] for k in cn], pa.string()),
            "revenue_milli": pa.array(rev, pa.int64())})

    out = j.map_batches(finish, batch_format="pyarrow") \
        .groupby("n_name") \
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli")) \
        .to_pandas()
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    return out.sort_values(["revenue_milli", "n_name"],
                           ascending=[False, True]).reset_index(drop=True)


Q_LOCAL_SUPPLIER_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000)
                     AS BIGINT)) AS BIGINT) AS revenue_milli
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue_milli DESC, n.n_name
"""


def q_customers_no_orders(sf_dir: str) -> pd.DataFrame:
    """Native distributed ANTI join: customers with no order on/after
    1997-06-01 (the date filter keeps the result non-trivial — every
    customer has SOME order in this corpus). The order-key side is
    filtered and deduped per batch before the shuffle, so the exchange
    moves one row per distinct recent custkey, not per order."""
    cust = read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    cutoff = pa.scalar(pd.Timestamp("1997-06-01"), pa.timestamp("us"))
    okeys = read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"],
                            # date predicate pushed into the scan
                            filter=pc.field("o_orderdate") >= cutoff) \
        .map_batches(lambda t: pa.table(
            {"o_custkey": pc.unique(t["o_custkey"])}),
            batch_format="pyarrow")
    with light_shuffle_aggregators():
        out = cust.join(okeys, join_type="left_anti", num_partitions=8,
                        on=("c_custkey",), right_on=("o_custkey",)) \
            .to_pandas()
    if not len(out):
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_mktsegment": pd.Series([], dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True) \
        .astype({"c_custkey": "int64"})


Q_NO_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-06-01')
ORDER BY c_custkey
"""


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """Native distributed LEFT OUTER join: every customer with its
    recent-order count, zero included. The orders side is pre-aggregated
    to one (custkey, n) row per key BEFORE the join, so the outer join's
    exchange moves aggregate rows, never raw orders — the standard
    aggregate-then-join pushdown."""
    cust = read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    cutoff = pa.scalar(pd.Timestamp("1997-06-01"), pa.timestamp("us"))
    counts = read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"],
                             # date predicate pushed into the scan
                             filter=pc.field("o_orderdate") >= cutoff) \
        .groupby("o_custkey").count()
    with light_shuffle_aggregators():
        out = cust.join(counts, join_type="left_outer", num_partitions=8,
                        on=("c_custkey",), right_on=("o_custkey",)) \
            .to_pandas()
    out["n_orders"] = out["count()"].fillna(0).astype("int64")
    return out[["c_custkey", "c_mktsegment", "n_orders"]] \
        .astype({"c_custkey": "int64"}) \
        .sort_values("c_custkey").reset_index(drop=True)


Q_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       coalesce(o.n, 0)::BIGINT AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-06-01'
           GROUP BY o_custkey) o
  ON o.o_custkey = c.c_custkey
ORDER BY c_custkey
"""


def q_union_distinct_nations(sf_dir: str) -> pd.DataFrame:
    """Dataset.union across two sources + distributed distinct: nation
    keys present in customer OR supplier. The distinct is a per-batch
    dedup THEN a key-only groupby — the exchange moves unique keys per
    batch, not rows."""
    c = read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"]) \
        .map_batches(lambda t: pa.table(
            {"nationkey": pc.unique(t["c_nationkey"])}),
            batch_format="pyarrow")
    s = read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey"]) \
        .map_batches(lambda t: pa.table(
            {"nationkey": pc.unique(t["s_nationkey"])}),
            batch_format="pyarrow")
    out = c.union(s).groupby("nationkey").count().to_pandas()
    return pd.DataFrame({"nationkey": out["nationkey"].astype("int64")}) \
        .sort_values("nationkey").reset_index(drop=True)


Q_UNION_NATIONS_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier)
ORDER BY nationkey
"""


def q_customers_big_orders(sf_dir: str) -> pd.DataFrame:
    """Native distributed SEMI join: customers with at least one order
    over 450k (filter + batch-dedup on the probe side before the
    shuffle, mirroring the anti-join shape)."""
    cust = read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    okeys = read_parquet(_t(sf_dir, "orders"),
                            columns=["o_custkey", "o_totalprice"]) \
        .map_batches(lambda t: pa.table(
            {"o_custkey": pc.unique(t.filter(pc.greater(
                t["o_totalprice"], pa.scalar(450000.0)))["o_custkey"])}),
            batch_format="pyarrow")
    with light_shuffle_aggregators():
        out = cust.join(okeys, join_type="left_semi", num_partitions=8,
                        on=("c_custkey",), right_on=("o_custkey",)) \
            .to_pandas()
    if not len(out):
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_mktsegment": pd.Series([], dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True) \
        .astype({"c_custkey": "int64"})


Q_BIG_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 450000.0)
ORDER BY c_custkey
"""


def q_top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (k=3 orders by value per market segment): a
    native hash join attaches each order's segment (customer SCALES
    with the corpus — joined, never read whole on the driver or
    broadcast), then per-batch partial top-k (each batch emits at most
    k rows per segment) → tiny groupby(segment) final top-k. After the
    join, the shuffle moves k·n_batches rows, never the order table."""
    cust = read_parquet(_t(sf_dir, "customer"),
                        columns=["c_custkey", "c_mktsegment"])
    ds = read_parquet(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_custkey", "o_totalprice"])
    from .rayutil import project_blocks
    with light_shuffle_aggregators():
        ds = ds.join(cust, join_type="inner", num_partitions=8,
                     on=("o_custkey",),
                     right_on=("c_custkey",)).materialize()
    ds = project_blocks(ds, ["o_orderkey", "o_totalprice",
                             "c_mktsegment"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True])
        return batch.groupby("c_mktsegment", as_index=False).head(3)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(3)
        return pd.DataFrame({
            "c_mktsegment": g["c_mktsegment"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(dtype=np.int64),
            "o_total_milli": np.floor(
                g["o_totalprice"].to_numpy() * 1000).astype(np.int64),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("c_mktsegment").map_groups(final, batch_format="pandas") \
        .to_pandas()
    return out.sort_values(["c_mktsegment", "rank"]).reset_index(drop=True)


Q_TOP_PER_SEGMENT_SQL = """
SELECT c_mktsegment, o_orderkey, o_total_milli, rank FROM (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(floor(o.o_totalprice * 1000) AS BIGINT) AS o_total_milli,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey)
           AS rank
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey) t
WHERE rank <= 3 ORDER BY c_mktsegment, rank
"""


def q_lineitem_top_by_price(sf_dir: str) -> pd.DataFrame:
    """Native distributed global sort (Ray's Sort AllToAll) + limit:
    top-20 lineitems by extended price with a full deterministic
    tie-break. The one API-surface op no other query exercised."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_extendedprice"])
    out = ds.sort(["l_extendedprice", "l_orderkey", "l_linenumber"],
                  descending=[True, False, False]).limit(20).to_pandas()
    out["price_milli"] = np.floor(
        out["l_extendedprice"] * 1000).astype("int64")
    return out[["l_orderkey", "l_linenumber", "price_milli"]] \
        .astype({"l_orderkey": "int64", "l_linenumber": "int64"})


Q_TOP_PRICE_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(floor(l_extendedprice * 1000) AS BIGINT) AS price_milli
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


def _source_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def _cached_export(out_dir: str, src_path: str, write) -> str:
    """Cache an exported copy of a source table, keyed by the SOURCE
    file's mtime+size (stored in a sibling .done marker) so a
    regenerated source invalidates the cache instead of silently
    serving stale rows. Marker lives OUTSIDE the dir (readers glob
    everything inside). Not safe against concurrent writers — the
    driver runs queries sequentially."""
    import shutil
    fp = _source_fingerprint(src_path)
    done = out_dir + ".done"
    if not (os.path.exists(done) and open(done).read() == fp):
        shutil.rmtree(out_dir, ignore_errors=True)
        write(out_dir)
        with open(done, "w") as f:
            f.write(fp)
    return out_dir


def _jsonl_documents(sf_dir: str) -> str:
    """Export documents.parquet to a cached JSONL directory (source-
    format coverage: the query below reads the SAME rows via
    ``read_json`` and must match the parquet-backed SQL oracle)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    return _cached_export(
        f"/tmp/ncr_jsonl_docs_{tag}", _t(sf_dir, "documents"),
        lambda d: read_parquet(_t(sf_dir, "documents"),
                                  columns=["doc_id", "text"]).write_json(d))


def q_token_stats_jsonl(sf_dir: str) -> pd.DataFrame:
    """Token stats computed from a JSONL export of the documents table
    (``Dataset.write_json`` → ``read_json`` round-trip) — checked
    against the SAME DuckDB oracle as the parquet-sourced q_token_stats,
    so the JSONL source path is oracle-gated end-to-end."""
    ds = rd.read_json(_jsonl_documents(sf_dir))
    return to.token_counts(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _csv_nation(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return _cached_export(
        f"/tmp/ncr_csv_nation_{tag}", _t(sf_dir, "nation"),
        lambda d: read_parquet(_t(sf_dir, "nation")).write_csv(d))


def q_nations_per_region_csv(sf_dir: str) -> pd.DataFrame:
    """Nations per region read from a CSV export of the nation table
    (``write_csv`` → ``read_csv``), joined to region via broadcast —
    CSV source coverage under the parquet-backed oracle."""
    reg = pd.read_parquet(_t(sf_dir, "region"),
                          columns=["r_regionkey", "r_name"])
    rmap = dict(zip(reg.r_regionkey, reg.r_name))
    ds = rd.read_csv(_csv_nation(sf_dir))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(r_name=batch["n_regionkey"].map(rmap))
        return batch.groupby("r_name", as_index=False).agg(
            n_nations=("n_nationkey", "size"))

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("r_name").aggregate(Sum("n_nations",
                                         alias_name="n_nations")) \
        .to_pandas()
    out["n_nations"] = out["n_nations"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


Q_NATIONS_CSV_SQL = """
SELECT r.r_name, count(*)::BIGINT AS n_nations
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name ORDER BY r.r_name
"""


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Round-3 additions: segment dedup, per-source gate, hopping windows,
# grouped distinct, argmin-per-group multi-join
# ---------------------------------------------------------------------------

def q_segment_dedup(sf_dir: str) -> pd.DataFrame:
    """C4-style segment-level dedup (dedup.segment_dedup): 10-token
    windows, global first occurrence wins, docs reassembled from the
    survivors."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = dd.segment_dedup(ds, tokens_per_seg=10).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SEGMENT_DEDUP_SQL = r"""
WITH words AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(ws[(i-1)*10+1:(i-1)*10+10], ' ') AS seg
  FROM words, UNNEST(generate_series(1, CAST(ceil(length(ws)/10.0) AS BIGINT))) AS t(i)
  WHERE length(ws) > 0),
ranked AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs)
SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
FROM ranked WHERE rn = 1
GROUP BY doc_id ORDER BY doc_id
"""


def q_source_quality_gate(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style per-source adaptive quality gate
    (textops.source_quality_gate): keep docs scoring at or above their
    own source's mean stopword ratio (µ-integerized, integer
    cross-multiply predicate — no float mean on either engine)."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    with light_shuffle_aggregators():
        out = to.source_quality_gate(ds).materialize().to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score_mu"] = out["score_mu"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SOURCE_GATE_SQL = rf"""
WITH s AS (
  SELECT doc_id, source,
         CAST(floor(CASE WHEN length(words) = 0 THEN 0
              ELSE length(list_filter(words, x -> list_contains([{_EN_STOPS_SQL}], lower(x))))
                   / CAST(length(words) AS DOUBLE) END * 1e6 + 0.5) AS BIGINT) AS score_mu
  FROM (SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
        FROM documents)),
m AS (SELECT source, count(*) AS n_src, sum(score_mu) AS sum_mu
      FROM s GROUP BY source)
SELECT s.doc_id, s.source, s.score_mu
FROM s JOIN m USING (source)
WHERE s.score_mu * m.n_src >= m.sum_mu
ORDER BY s.doc_id
"""


def q_hopping_window(sf_dir: str) -> pd.DataFrame:
    """15-minute windows hopping every 5 minutes over events
    (windows.hopping_window_agg): count + centi-sum per window start."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])
    out = wn.hopping_window_agg(ds, ts_col="ts", value_col="value",
                                width_s=900, hop_s=300).to_pandas()
    for c in ("wstart", "n_events", "sum_centi"):
        out[c] = out[c].astype("int64")
    return out.sort_values("wstart").reset_index(drop=True)


Q_HOPPING_SQL = """
WITH x AS (SELECT epoch_us(ts) AS us,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS centi
           FROM events),
w AS (SELECT (us - us % 300000000 - 300000000 * k) // 1000000 AS wstart,
             centi
      FROM x, UNNEST([0, 1, 2]) AS t(k))
SELECT wstart, count(*) AS n_events,
       CAST(sum(centi) AS BIGINT) AS sum_centi
FROM w GROUP BY wstart ORDER BY wstart
"""


def q_distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact grouped distinct count (windows.grouped_distinct_count):
    distinct users per event type, two-level groupby — the exact twin
    the grouped-HLL sketch is pinned against."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_type", "user_id"])
    out = wn.grouped_distinct_count(ds, key_col="event_type",
                                    value_col="user_id").to_pandas()
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


Q_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_user_mode_event(sf_dir: str) -> pd.DataFrame:
    """Each user's most frequent event type (windows.grouped_mode,
    smallest-value tie-break)."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["user_id", "event_type"])
    out = wn.grouped_mode(ds, key_col="user_id",
                          value_col="event_type").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


Q_USER_MODE_SQL = """
SELECT user_id, mode_value, n FROM (
  SELECT user_id, event_type AS mode_value, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1 ORDER BY user_id
"""


def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted sample without replacement
    (splits.weighted_sample_k, A-ES hash priorities): 50 docs weighted
    by length — longer docs proportionally likelier, selection
    identical on both engines because the uniform is hash-derived."""
    from .functions.splits import weighted_sample_k
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "n_chars"])
    return weighted_sample_k(ds, id_col="doc_id", weight_col="n_chars",
                             k=50)


Q_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow((('0x' || substr(md5('wsample-v1' || CAST(doc_id AS VARCHAR)),
                              1, 13))::UBIGINT + 1) / 4503599627370496.0,
             1.0 / n_chars) AS pri
  FROM documents WHERE n_chars > 0)
ORDER BY pri DESC, doc_id LIMIT 50
"""
# driver compare is order-insensitive, but match the Ray side's
# doc_id ordering for readability
Q_WEIGHTED_SAMPLE_SQL = (
    "SELECT doc_id, n_chars FROM (" + Q_WEIGHTED_SAMPLE_SQL
    + ") ORDER BY doc_id")


def q_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Corpus-LM quality scoring (textops.bigram_logprob_scores):
    add-one bigram log-probability per document, per-term µ-integerized
    before summing so the aggregate is an order-independent integer."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.bigram_logprob_scores(ds).to_pandas()
    for c in ("doc_id", "n_bigrams", "logprob_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q_BIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT unnest(ws) AS w FROM toks),
ucnt AS (SELECT w, count(*) AS cu FROM uni GROUP BY w),
vocab AS (SELECT count(*) AS v FROM ucnt),
big AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        FROM toks, UNNEST(generate_series(1, length(ws) - 1)) AS t(i)
        WHERE length(ws) >= 2),
terms AS (
  SELECT b.doc_id,
         CAST(floor(ln((c.cb + 1.0) / (u.cu + 1.0 * v.v)) * 1e6) AS BIGINT) AS term
  FROM big b
  JOIN (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2) c
    ON c.w1 = b.w1 AND c.w2 = b.w2
  JOIN ucnt u ON u.w = b.w1, vocab v)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(term) AS BIGINT) AS logprob_micro
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def q_approx_token_freq(sf_dir: str) -> pd.DataFrame:
    """Count-min-sketch token frequencies (sketches.approx_token_freq)
    for a fixed probe list — one-sided error pinned against exact
    counts in tests (rows-only driver check: approximate by design)."""
    from .functions.sketches import approx_token_freq
    ds = read_parquet(_t(sf_dir, "documents"), columns=["text"])
    return approx_token_freq(
        ds, ["key", "table", "row", "value", "spark"])


def q_interp_quantiles(sf_dir: str) -> pd.DataFrame:
    """SQL quantile_cont twin (windows.interpolated_quantiles): linear
    interpolation at h = q·(n-1) over the distributed value-count
    histogram."""
    ds = read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity"])
    out = wn.interpolated_quantiles(ds, value_col="l_quantity",
                                    qs=[0.1, 0.25, 0.5, 0.75, 0.9])
    out["val"] = out["val"].round(6)
    return out.reset_index(drop=True)


Q_INTERP_QUANTILES_SQL = """
SELECT q, round(val, 6) AS val FROM (
  SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS q,
         unnest(quantile_cont(l_quantity,
                              [0.1, 0.25, 0.5, 0.75, 0.9])) AS val
  FROM lineitem) ORDER BY q
"""


def q_pq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """PQ-compressed approximate top-k (similarity.pq_ann_topk, ADC
    scan over m-byte codes) — recall pinned against the exact
    cosine_topk twin in tests (rows-only driver check: approximate by
    design)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    return sim.pq_ann_topk(ds, _query_vec(sf_dir), k=10, m=8, n_codes=32)


def q_ivfpq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """IVF+PQ composed ANN (similarity.IvfPqIndex — the FAISS IVFPQ
    layout: cluster-partitioned parquet of m-byte PQ codes, nprobe
    physical pruning, ADC shortlist, exact refine over O(shortlist)
    full vectors). Recall pinned against cosine_topk in tests
    (rows-only driver check: approximate by design)."""
    import tempfile
    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    idx = sim.IvfPqIndex.build(
        ds, tempfile.mkdtemp(prefix="ncr_ivfpq_"),
        n_clusters=8, m=8, n_codes=32)
    out = idx.query(_query_vec(sf_dir), k=10, nprobe=4, refine=50,
                    full_ds=ds)
    out["cos_sim"] = out["cos_sim"].round(5)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.reset_index(drop=True)


def q_media_phash_dups(sf_dir: str) -> pd.DataFrame:
    """Perceptual-hash image dedup — dHash over REAL decoded pixels
    (multimodal.DHashStage) + the pigeonhole Hamming join
    (dedup.hamming_pairs, the simhash core): finds re-encoded and
    lightly-edited copies whose payload bytes all differ. The
    deterministic fixture plants groups of five PNGs per base image —
    an exact copy, a brightness-nudged corner, a stripe edit, and two
    unrelated textures — so the hash must CLUSTER the first three and
    SEPARATE the rest (pinned against the single-process brute-force
    reference in tests). Conformance rows-only: perceptual distance
    is not SQL-expressible."""
    from .functions.png import encode_png

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 2 == 0]
        payloads = []
        for i in ids:
            base_id, variant = i // 10, (i // 2) % 5
            rng = np.random.RandomState(1000 + base_id)
            px = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
            if variant == 1:           # near-dup: brightness nudge
                px = px.copy()
                px[:6, :8] = np.minimum(px[:6, :8].astype(np.int64)
                                        + 2, 255).astype(np.uint8)
            elif variant == 2:         # near-dup: small stripe edit
                px = px.copy()
                px[10:12, :] = 128
            elif variant in (3, 4):    # unrelated texture
                rng2 = np.random.RandomState(777_000 + i)
                px = rng2.randint(0, 256, (24, 32, 3)).astype(np.uint8)
            payloads.append(encode_png(px))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary())})

    codes = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.DHashStage, batch_format="pyarrow",
                     batch_size=32, concurrency=2)
    out = dd.hamming_pairs(codes, max_hamming=10, id_col="media_id",
                           code_col="dhash").to_pandas()
    if not len(out):
        return pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64")})
    return out.astype({"doc_a": "int64", "doc_b": "int64",
                       "hamming": "int64"}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_media_audio_dups(sf_dir: str) -> pd.DataFrame:
    """Audio fingerprint dedup — spectral dHash over REAL decoded PCM
    (multimodal.AudioDHashStage) + dedup.hamming_pairs: the same
    recording stored as WAV, G.711 µ-law AU (real companding loss)
    and gain-scaled AIFF must cluster; different broadband content
    must separate. Fixture plants groups of five: the three codec
    variants of one seeded broadband signal + two unrelated signals.
    Conformance rows-only (pinned vs the single-process brute-force
    reference in tests)."""
    from .functions import audio as aud

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 4 == 0]
        payloads = []
        for i in ids:
            base_id, variant = i // 20, (i // 4) % 5
            seed = 3000 + base_id if variant < 3 else 600_000 + i
            rng = np.random.RandomState(seed)
            # NON-stationary broadband content (a fresh spectral
            # envelope per time segment): a stationary signal repeats
            # one band ordering across all 8 frames, collapsing the
            # 64-bit fingerprint to ~8 effective bits — unrelated
            # signals then collide below the Hamming threshold
            n, m = 4096, 4096 // 8
            segs = []
            for _ in range(8):
                mag = np.interp(np.arange(m // 2 + 1),
                                np.linspace(0, m // 2, 10),
                                rng.uniform(0.2, 2.0, 10))
                spec = mag * np.exp(1j * rng.uniform(
                    0, 2 * np.pi, m // 2 + 1))
                segs.append(np.fft.irfft(spec, m))
            x = np.concatenate(segs)
            x = (x / np.abs(x).max() * 20000).astype(np.int16)
            if variant == 1:
                payloads.append(aud.encode_au(x, encoding="ulaw"))
            elif variant == 2:
                payloads.append(aud.encode_aiff(
                    (x * 0.6).astype(np.int16)))
            else:
                payloads.append(mm.encode_wav(x[:, None]))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary())})

    codes = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.AudioDHashStage, batch_format="pyarrow",
                     batch_size=32, concurrency=2)
    out = dd.hamming_pairs(codes, max_hamming=10, id_col="media_id",
                           code_col="dhash").to_pandas()
    if not len(out):
        return pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64")})
    return out.astype({"doc_a": "int64", "doc_b": "int64",
                       "hamming": "int64"}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_media_video_dups(sf_dir: str) -> pd.DataFrame:
    """Video near-dup detection by FRAME MATCHING: every sampled frame
    is block-mean-dHashed inside the decode actors
    (multimodal.VideoFrameHashStage, frame_key = video·1024 + idx),
    dedup.hamming_pairs joins FRAMES at Hamming ≤ 3 (tolerant of
    lossy re-encode — jpeg-in-MP4 shifts a frame hash ≤3 bits, far
    under unrelated-frame distances), and each video pair scores the
    Dice fraction of matched frames. The fixture plants per-base
    groups: the SAME frames as raw-DIB AVI and as jpeg-in-MP4, a
    3-of-5-frames partial re-cut, and two unrelated clips — so the
    operator must see through a lossy codec change AND a re-cut while
    separating unrelated content. The scoring tail is fully
    distributed (multimodal.score_video_pairs_ds: salted Dice fold +
    native count joins — no pair frame on the driver). Conformance
    rows-only (pinned vs the single-process brute-force reference in
    tests)."""
    from .functions import video as vd
    from .functions.mp4 import encode_mp4

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def frame(seed: int, k: int) -> np.ndarray:
        rng = np.random.RandomState(seed * 100 + k)
        yy, xx = np.mgrid[0:24, 0:32].astype(np.float64)
        chans = []
        for _ in range(3):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi)
            chans.append(128 + 100 * np.sin(
                2 * np.pi * (fx * xx / 32 + fy * yy / 24) + ph))
        return np.clip(np.stack(chans, -1), 0, 255).astype(np.uint8)

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 4 == 0]
        payloads = []
        for i in ids:
            base_id, variant = i // 20, (i // 4) % 5
            if variant in (0, 1):
                frames = [frame(base_id, k) for k in range(5)]
                payloads.append(
                    vd.encode_avi(frames, codec="DIB ") if variant == 0
                    else encode_mp4(frames))
            elif variant == 2:          # partial re-cut: 3 shared + 2 new
                frames = [frame(base_id, k) for k in range(3)] + \
                         [frame(900 + base_id, k) for k in range(2)]
                payloads.append(vd.encode_avi(frames, codec="DIB "))
            else:                       # unrelated clip
                frames = [frame(10_000 + i, k) for k in range(5)]
                payloads.append(vd.encode_avi(frames, codec="DIB "))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary())})

    rows = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.VideoFrameHashStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2).materialize()

    # fully distributed tail: per-video frame counts as a Dataset and
    # the Dice fold as a salted map_groups + native count joins — no
    # pair frame on the driver (mm.score_video_pairs stays as the
    # single-process form the conformance references pin against)
    counts = mm.video_frame_counts(rows)
    fpairs = dd.hamming_pairs(rows, max_hamming=3, id_col="frame_key",
                              code_col="dhash")
    out = mm.score_video_pairs_ds(fpairs, counts).to_pandas()
    cols = ["doc_a", "doc_b", "matched", "total", "dice_micro"]
    if not len(out):
        # a zero-row to_pandas() loses the arrow schema entirely
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    return out[cols].astype("int64") \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_grouped_hll_distinct(sf_dir: str) -> pd.DataFrame:
    """Approx distinct users per event type (sketches.
    grouped_hll_distinct) — pinned against the exact
    q_distinct_users_by_type twin in tests (rows-only driver check:
    HLL estimates are approximate by design)."""
    from .functions.sketches import grouped_hll_distinct
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_type", "user_id"])
    return grouped_hll_distinct(ds, key_col="event_type",
                                value_col="user_id")


def q_cheapest_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2-shaped argmin-per-group multi-join: each part's
    cheapest lineitem supplier (min extendedprice, supplier id as
    tie-break) joined to supplier + nation names.

    The argmin reuses ``windows.latest_per_key`` — the (price, suppkey)
    lexicographic MIN packs into one int64 whose NEGATION latest_per_key
    argmaxes; the combiner ships ≤1 row per (part, batch). Then two
    native hash joins (supplier scales with the corpus; nation rides
    the same path — 25 rows is not worth a second code shape)."""
    li = read_parquet(_t(sf_dir, "lineitem"),
                      columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        centi = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        return pd.DataFrame({
            "l_partkey": batch["l_partkey"].astype("int64"),
            "l_suppkey": batch["l_suppkey"].astype("int64"),
            "price_centi": centi,
            "ordv": -(centi * 1_000_000 + batch["l_suppkey"]
                      .to_numpy(dtype=np.int64))})

    best = wn.latest_per_key(li.map_batches(pack, batch_format="pandas"),
                             key_col="l_partkey", order_cols=["ordv"])
    from .rayutil import project_blocks
    best = project_blocks(best, ["l_partkey", "l_suppkey", "price_centi"])

    supp = read_parquet(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = read_parquet(_t(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    with light_shuffle_aggregators():
        joined = best.join(supp, join_type="inner", num_partitions=8,
                           on=("l_suppkey",), right_on=("s_suppkey",))
        joined = project_blocks(
            joined, ["l_partkey", "l_suppkey", "price_centi", "s_name",
                     "s_nationkey"])
        out = joined.join(nation, join_type="inner", num_partitions=8,
                          on=("s_nationkey",),
                          right_on=("n_nationkey",)).materialize() \
            .to_pandas()
    out = out[["l_partkey", "l_suppkey", "price_centi", "s_name",
               "n_name"]]
    for c in ("l_partkey", "l_suppkey", "price_centi"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)


Q_CHEAPEST_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_centi,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY floor(l_extendedprice * 100 + 0.5),
                                     l_suppkey) AS rn
  FROM lineitem)
SELECT r.l_partkey, r.l_suppkey, r.price_centi, s.s_name, n.n_name
FROM r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE r.rn = 1 ORDER BY r.l_partkey
"""


def q_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-user LAG: microseconds since the user's previous event
    (windows.grouped_lag — salted buckets, one vectorized groupby.shift
    per bucket; no per-user groups). First event per user is dropped,
    matching SQL's NULL elimination."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "ts", "user_id"])

    def to_us(t: pa.Table) -> pa.Table:
        ts_us = _ts_us(t)
        return t.drop_columns(["ts"]).append_column("ts_us", ts_us)

    lagged = wn.grouped_lag(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts_us", "event_id"],
        value_col="ts_us")

    def gaps(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["prev"].notna()]
        return pd.DataFrame({
            "event_id": batch["event_id"].astype("int64"),
            "user_id": batch["user_id"].astype("int64"),
            # prev is float64 but epoch-µs < 2^53, so the cast is exact
            "gap_us": (batch["ts_us"] - batch["prev"]).astype("int64")})

    out = lagged.map_batches(gaps, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


Q_EVENT_GAPS_SQL = """
SELECT event_id, user_id, ts_us - prev_us AS gap_us
FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events)
WHERE prev_us IS NOT NULL ORDER BY event_id
"""


def q_event_type_dense_rank(sf_dir: str) -> pd.DataFrame:
    """Rows whose value is among their event_type's top-3 DISTINCT
    values, with the dense rank — QUALIFY dense_rank() <= 3 with ties
    kept (windows.grouped_topk_dense: per-batch local top-k prune, then
    a salted re-rank; the shuffle moves ≤ k values' rows per
    (key, batch))."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "event_type", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["value"]).append_column(
            "value_centi",
            pa.array(np.floor(v * 100 + 0.5).astype(np.int64)))

    out = wn.grouped_topk_dense(
        ds.map_batches(to_centi, batch_format="pyarrow"),
        key_col="event_type", value_col="value_centi", k=3).to_pandas()
    out = out[["event_id", "event_type", "value_centi", "dense_rank"]] \
        .astype({"event_id": "int64", "value_centi": "int64"})
    return out.sort_values("event_id").reset_index(drop=True)


Q_EVENT_TYPE_DENSE_RANK_SQL = """
SELECT event_id, event_type, value_centi, CAST(dr AS BIGINT) AS dense_rank
FROM (SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi,
             dense_rank() OVER (PARTITION BY event_type
                                ORDER BY floor(value * 100 + 0.5) DESC)
               AS dr
      FROM events)
WHERE dr <= 3 ORDER BY event_id
"""


def q_extreme_events(sf_dir: str) -> pd.DataFrame:
    """The 100 lowest- and 100 highest-valued events with their exact
    global rank (windows.global_rank_by_value: value-range partitions,
    two-pass count/offset scan — no driver-side sort; the tail filter
    runs distributed against a broadcast row count)."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["value"]).append_column(
            "value_centi",
            pa.array(np.floor(v * 100 + 0.5).astype(np.int64)))

    centi = ds.map_batches(to_centi, batch_format="pyarrow")
    n = centi.count()
    ranks = wn.global_rank_by_value(centi, value_col="value_centi",
                                    id_col="event_id")

    def tails(t: pa.Table) -> pa.Table:
        r = t["rank"]
        keep = pc.or_(pc.less(r, 100), pc.greater_equal(r, n - 100))
        t = t.filter(keep)
        return t.rename_columns(
            ["value_rank" if c == "rank" else c for c in t.column_names])

    out = ranks.map_batches(tails, batch_format="pyarrow").to_pandas()
    out = out[["event_id", "value_centi", "value_rank"]]
    return out.sort_values("value_rank").reset_index(drop=True)


Q_EXTREME_EVENTS_SQL = """
WITH r AS (SELECT event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi,
                  row_number() OVER (ORDER BY floor(value * 100 + 0.5),
                                     event_id) - 1 AS rn
           FROM events),
n AS (SELECT count(*) AS n FROM events)
SELECT event_id, value_centi, CAST(rn AS BIGINT) AS value_rank
FROM r, n WHERE rn < 100 OR rn >= n.n - 100 ORDER BY value_rank
"""


def q_order_price_deciles(sf_dir: str) -> pd.DataFrame:
    """Per-decile order count + revenue, deciles cut by exact global
    price rank (global_rank_by_value), aggregated with per-batch
    partials so the final groupby moves ≤ 10 rows per batch."""
    ds = read_parquet(_t(sf_dir, "orders"),
                      columns=["o_orderkey", "o_totalprice"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["o_totalprice"]).append_column(
            "price_centi",
            pa.array(np.floor(v * 100 + 0.5).astype(np.int64)))

    centi = ds.map_batches(to_centi, batch_format="pyarrow")
    n = centi.count()
    ranks = wn.global_rank_by_value(centi, value_col="price_centi",
                                    id_col="o_orderkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "decile": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_price_centi": pd.Series([], dtype="int64")})
        dec = batch["rank"].to_numpy() * 10 // n
        g = batch.assign(decile=dec).groupby("decile").agg(
            n_orders=("rank", "size"),
            sum_price_centi=("price_centi", "sum")).reset_index()
        return g.astype({"decile": "int64", "n_orders": "int64",
                         "sum_price_centi": "int64"})

    out = ranks.map_batches(partial, batch_format="pandas") \
        .groupby("decile").sum(["n_orders", "sum_price_centi"]) \
        .to_pandas()
    out = out.rename(columns={"sum(n_orders)": "n_orders",
                              "sum(sum_price_centi)": "sum_price_centi"})
    out = out.astype({"decile": "int64", "n_orders": "int64",
                      "sum_price_centi": "int64"})
    return out.sort_values("decile").reset_index(drop=True)


Q_ORDER_PRICE_DECILES_SQL = """
WITH r AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    AS price_centi,
                  row_number() OVER (ORDER BY floor(o_totalprice * 100
                                              + 0.5), o_orderkey) - 1
                    AS rn
           FROM orders),
n AS (SELECT count(*) AS n FROM orders)
SELECT CAST((rn * 10) // n.n AS BIGINT) AS decile,
       count(*)::BIGINT AS n_orders,
       sum(price_centi)::BIGINT AS sum_price_centi
FROM r, n GROUP BY 1 ORDER BY decile
"""


def q_nation_coverage(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two grouped aggregates: nations with rich
    customers (acctbal > 9900) vs rich suppliers (> 8000), zero-filled
    on either missing side. Exercises the native full_outer hash join
    (key columns coalesce) over pre-aggregated (≤ 25-row) inputs — the
    aggregates shrink each side BEFORE the join shuffle."""
    cust = read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"],
                        filter=pc.field("c_acctbal") > 9900.0)
    supp = read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey"],
                        filter=pc.field("s_acctbal") > 8000.0)

    def as_key(src: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"nationkey": pc.cast(t[src], pa.int64())})
        return fn

    def name_count(out_col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [out_col if c == "count()" else c
                 for c in t.column_names])
        return fn

    from .rayutil import project_blocks
    # project_blocks (coalescing) also drops the zero-column empty
    # blocks the sort-aggregate emits for empty partitions at tiny
    # scale — they'd break the join's key resolution
    c_counts = project_blocks(
        cust.map_batches(as_key("c_nationkey"), batch_format="pyarrow")
        .groupby("nationkey").count()
        .map_batches(name_count("n_customers"), batch_format="pyarrow"),
        ["nationkey", "n_customers"])
    s_counts = project_blocks(
        supp.map_batches(as_key("s_nationkey"), batch_format="pyarrow")
        .groupby("nationkey").count()
        .map_batches(name_count("n_suppliers"), batch_format="pyarrow"),
        ["nationkey", "n_suppliers"])

    c_counts, s_counts = c_counts.materialize(), s_counts.materialize()
    if c_counts.count() == 0 or s_counts.count() == 0:
        # a fully-empty side has no schema for the native join to
        # resolve its key against; full_outer with an empty side is
        # just the other side zero-filled (both are ≤ nation-count
        # rows here by construction, so the pandas path is free)
        def typed(ds_small, col):
            df = ds_small.to_pandas()
            if "nationkey" not in df.columns:
                df = pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                                   col: pd.Series([], dtype="int64")})
            return df
        out = typed(c_counts, "n_customers").merge(
            typed(s_counts, "n_suppliers"), on="nationkey", how="outer")
    else:
        with light_shuffle_aggregators():
            out = c_counts.join(s_counts, join_type="full_outer",
                                num_partitions=4,
                                on=("nationkey",)).materialize().to_pandas()
    for c in ("n_customers", "n_suppliers"):
        out[c] = out[c].fillna(0).astype("int64")
    out["nationkey"] = out["nationkey"].astype("int64")
    out = out[["nationkey", "n_customers", "n_suppliers"]]
    return out.sort_values("nationkey").reset_index(drop=True)


Q_NATION_COVERAGE_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
           FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier WHERE s_acctbal > 8000 GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey)::BIGINT AS nationkey,
       COALESCE(c.n_customers, 0)::BIGINT AS n_customers,
       COALESCE(s.n_suppliers, 0)::BIGINT AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


def q_revenue_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE (all four grouping sets over two keys): revenue at
    (returnflag, linestatus), each single-key subtotal, and the grand
    total. Like q_revenue_rollup the fact table is scanned ONCE and
    partial-aggregated to the finest level; every coarser set folds
    from the finest grouped result (a few rows on the driver — the
    fold input is O(|keys product|), not O(rows))."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                      columns=["l_returnflag", "l_linestatus",
                               "l_extendedprice", "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["l_extendedprice"] * (1 - batch["l_discount"])
        batch = batch.assign(
            revenue_milli=np.floor(rev * 1000).astype("int64"))
        return batch.groupby(["l_returnflag", "l_linestatus"],
                             as_index=False).agg(
            revenue_milli=("revenue_milli", "sum"),
            n=("revenue_milli", "size"))

    fine = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("revenue_milli", alias_name="revenue_milli"),
            Sum("n", alias_name="n")).to_pandas()

    def fold(keys: list[str]) -> pd.DataFrame:
        if keys:
            g = fine.groupby(keys, as_index=False).agg(
                revenue_milli=("revenue_milli", "sum"), n=("n", "sum"))
        else:
            g = pd.DataFrame({"revenue_milli": [fine["revenue_milli"]
                                                .sum()],
                              "n": [fine["n"].sum()]})
        for c in ("l_returnflag", "l_linestatus"):
            if c not in keys:
                g[c] = "(all)"
        return g

    out = pd.concat(
        [fine, fold(["l_returnflag"]), fold(["l_linestatus"]), fold([])],
        ignore_index=True)
    out["revenue_milli"] = out["revenue_milli"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "revenue_milli", "n"]] \
        .sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


Q_REVENUE_CUBE_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                     AS BIGINT)) AS BIGINT) AS revenue_milli,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-source token-distribution Shannon entropy
    (textops.source_token_entropy — pair-bucketed counts, integer
    Σ c·ln(c) partials; diversity / template-collapse probe)."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["source", "text"])
    out = to.source_token_entropy(ds, group_col="source",
                                  text_col="text").to_pandas()
    return out.sort_values("source").reset_index(drop=True)


Q_SOURCE_ENTROPY_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
  FROM documents),
cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
per AS (SELECT source, sum(c) AS n_tokens,
               sum(CAST(floor(ln(CAST(c AS DOUBLE)) * c * 1e6)
                        AS BIGINT)) AS sum_clnc_micro
        FROM cnt GROUP BY source)
SELECT source, n_tokens::BIGINT AS n_tokens,
       sum_clnc_micro::BIGINT AS sum_clnc_micro,
       CAST(floor((ln(CAST(n_tokens AS DOUBLE))
                   - (sum_clnc_micro / 1e6) / n_tokens) * 1000)
            AS BIGINT) AS entropy_milli
FROM per ORDER BY source
"""


def q_unicode_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source unicode hygiene: doc counts, non-ASCII and non-NFC
    doc counts, codepoint and utf-8 byte totals — the normalization
    audit ahead of tokenizer training (un-normalized text splits one
    grapheme across several token ids).

    Distributed shape: a per-batch combiner emits one row per source
    per batch (ASCII-ness is the vectorized chars==bytes arrow check;
    the per-row NFC probe runs ONLY on non-ASCII rows — ASCII is NFC
    by definition — so the Python unicodedata call is off the hot
    path on mostly-ASCII corpora), then a native groupby-sum folds
    the ≤ sources×batches partial rows."""
    import unicodedata

    ds = read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        bts = pc.cast(pc.binary_length(t["text"]), pa.int64())
        ascii_mask = pc.equal(chars, bts).to_numpy(zero_copy_only=False)
        nonnfc = np.zeros(len(t), dtype=np.int64)
        idx = np.nonzero(~ascii_mask)[0]
        if len(idx):
            sub = t["text"].take(pa.array(idx)).to_pylist()
            for j, s in zip(idx, sub):
                if not unicodedata.is_normalized("NFC", s):
                    nonnfc[j] = 1
        df = pd.DataFrame({
            "source": t["source"].to_pylist(),
            "n_docs": np.ones(len(t), dtype=np.int64),
            "n_nonascii_docs": (~ascii_mask).astype(np.int64),
            "n_nonnfc_docs": nonnfc,
            "total_chars": chars.to_numpy(zero_copy_only=False),
            "total_bytes": bts.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False)

    cols = ["n_docs", "n_nonascii_docs", "n_nonnfc_docs",
            "total_chars", "total_bytes"]
    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("source") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols]) \
        .to_pandas()
    return out.sort_values("source").reset_index(drop=True)


Q_UNICODE_STATS_SQL = r"""
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN strlen(text) <> length(text)
                THEN 1 ELSE 0 END)::BIGINT AS n_nonascii_docs,
       sum(CASE WHEN nfc_normalize(text) <> text
                THEN 1 ELSE 0 END)::BIGINT AS n_nonnfc_docs,
       sum(length(text))::BIGINT AS total_chars,
       sum(strlen(text))::BIGINT AS total_bytes
FROM documents GROUP BY source ORDER BY source
"""


def q_user_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-user z-score of event values (windows.grouped_zscore:
    (n, Σv, Σv²) combiner → tiny groupby → native join back — the
    two-pass normalize-by-group feature-engineering primitive)."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "user_id", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["value"]).append_column(
            "value_centi",
            pa.array(np.floor(v * 100 + 0.5).astype(np.int64)))

    out = wn.grouped_zscore(
        ds.map_batches(to_centi, batch_format="pyarrow"),
        key_col="user_id", value_col="value_centi").to_pandas()
    out = out[["event_id", "user_id", "value_centi", "z_milli"]] \
        .astype({"event_id": "int64", "user_id": "int64",
                 "value_centi": "int64", "z_milli": "int64"})
    return out.sort_values("event_id").reset_index(drop=True)


Q_USER_ZSCORE_SQL = """
WITH t AS (SELECT event_id, user_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
           FROM events),
m AS (SELECT user_id, count(*) AS n, sum(value_centi) AS s,
             sum(value_centi * value_centi) AS s2
      FROM t GROUP BY user_id)
SELECT t.event_id, t.user_id, t.value_centi,
       CAST(floor((t.value_centi - s / n)
                  / sqrt((s2 - (s * s) / n) / (n - 1)) * 1000)
            AS BIGINT) AS z_milli
FROM t JOIN m USING (user_id)
WHERE n >= 2 AND (s2 - (s * s) / n) / (n - 1) > 0
ORDER BY event_id
"""


def q_lang_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Per-language top-5 frequent tokens via grouped Misra-Gries
    (sketches.grouped_heavy_hitters, k=512 — exact at the fixture's
    31-token vocabulary, same degeneracy the global twin documents;
    ≤ k rows per (lang, batch) cross the shuffle)."""
    from .functions.sketches import grouped_heavy_hitters
    ds = read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])
    out = grouped_heavy_hitters(ds, key_col="lang", text_col="text",
                                k=512, top_n=5).to_pandas()
    return out.sort_values(["lang", "n_min", "item"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


Q_LANG_HEAVY_SQL = r"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS item
  FROM documents WHERE text IS NOT NULL),
cnt AS (SELECT lang, item, count(*)::BIGINT AS n_min
        FROM toks GROUP BY lang, item),
rk AS (SELECT lang, item, n_min,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY n_min DESC, item) AS rn
       FROM cnt)
SELECT lang, item, n_min FROM rk WHERE rn <= 5
ORDER BY lang, n_min DESC, item
"""


def q_cross_source_dups(sf_dir: str) -> pd.DataFrame:
    """Cross-source duplicate-LEAD pair matrix: which source pairs
    share article openings (first 8 whitespace tokens) — the
    syndication / contamination-flow probe (dedup.dup_pair_matrix:
    md5-bucketed per-(lead, source) counts, pairwise products folded
    in-bucket). Full-text exact dups are the degenerate case (the
    fixture has none at sf0.01 — the lead key is what fires)."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["source", "text"])

    def lead(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": batch["source"].to_numpy(),
            "lead": pd.Series(
                [" ".join((t or "").split()[:8])
                 for t in batch["text"]], dtype="object")})

    return dd.dup_pair_matrix(
        ds.map_batches(lead, batch_format="pandas"),
        text_col="lead", group_col="source")


Q_CROSS_SOURCE_DUPS_SQL = r"""
WITH h AS (SELECT array_to_string(
                    list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')[1:8], ' ') AS h,
                  source
           FROM documents),
c AS (SELECT h, source, count(*) AS c FROM h GROUP BY h, source),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, a.c * b.c AS np
  FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
  UNION ALL
  SELECT source, source, c * (c - 1) // 2 FROM c WHERE c > 1)
SELECT src_a, src_b, sum(np)::BIGINT AS n_dup_pairs
FROM p GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


def q_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent documents-table checksum
    (audit.table_checksum — one (n, partial) row per batch, exact
    driver fold; the resumable-output equality proof)."""
    from .functions.audit import table_checksum
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "lang", "source", "text"])
    return table_checksum(ds, cols=["doc_id", "lang", "source", "text"])


Q_TABLE_CHECKSUM_SQL = """
SELECT count(*)::BIGINT AS n_rows,
       CAST(sum(CAST(concat('0x', substr(md5(
                concat_ws(chr(31), doc_id, lang, source, text)),
                1, 13)) AS BIGINT)) % 2305843009213693951 AS BIGINT)
         AS checksum
FROM documents
"""


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition matrix of the event stream: counts of
    (previous event_type → event_type) per-user step pairs — the
    behavioral-sequence profile behind session modeling.

    Distributed shape: windows.grouped_lag of the event_type STRING per
    user (salted buckets, one vectorized groupby.shift per bucket),
    then a per-batch value_counts combiner collapses each batch to
    ≤ n_types² partial rows before the tiny bucketed sum — the shuffle
    after the lag moves counts, never events."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "ts", "user_id", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        ts_us = _ts_us(t)
        return t.drop_columns(["ts"]).append_column("ts_us", ts_us)

    lagged = wn.grouped_lag(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts_us", "event_id"],
        value_col="event_type")

    def pair_counts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["prev"].notna()]
        if not len(b):
            return pd.DataFrame({"pair": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        vc = (b["prev"] + "\x1f" + b["event_type"]).value_counts()
        return pd.DataFrame({"pair": vc.index.to_numpy(),
                             "c": vc.to_numpy(dtype="int64")})

    from .rayutil import bucketed_group_sum as _bgs
    out = _bgs(lagged.map_batches(pair_counts, batch_format="pandas"),
               ["pair"], {"c": "n"}).to_pandas()
    prev_cur = out["pair"].str.split("\x1f", expand=True)
    out = pd.DataFrame({"prev_type": prev_cur[0],
                        "event_type": prev_cur[1],
                        "n": out["n"].astype("int64")})
    return out.sort_values(["prev_type", "event_type"]) \
        .reset_index(drop=True)


Q_EVENT_TRANSITIONS_SQL = """
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM (SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type ORDER BY prev_type, event_type
"""


def q_event_funnel(sf_dir: str) -> pd.DataFrame:
    """Conversion funnel: users whose first 'click' is followed by a
    'purchase' within one hour, with both timestamps — the A→B
    within-Δt sequence predicate SQL needs a windowed self-join for.

    Distributed shape: the scan keeps ONLY the two funnel stages
    (predicate pushed into the parquet read), rows co-locate per user
    by salted bucket, and one vectorized pandas pass per bucket does
    first-A / min-B-in-window. The shuffle moves just the two stages'
    rows; converting users appear once each."""
    ds = read_parquet(
        _t(sf_dir, "events"),
        columns=["ts", "user_id", "event_type"],
        filter=pc.field("event_type").isin(["click", "purchase"]))

    def prep(t: pa.Table) -> pa.Table:
        from .rayutil import salt_bucket
        ts_us = _ts_us(t)
        t = t.drop_columns(["ts"]).append_column("ts_us", ts_us)
        return t.append_column(
            "bucket", pa.array(salt_bucket(t["user_id"]), pa.int32()))

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "event_type" not in g.columns:
            # empty sort partition: map_groups hands the UDF a
            # zero-column frame — return the typed empty output
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "first_click_us": pd.Series([], dtype="int64"),
                 "first_purchase_us": pd.Series([], dtype="int64")})
        first_a = g[g["event_type"] == "click"] \
            .groupby("user_id")["ts_us"].min().rename("first_click_us")
        p = g[g["event_type"] == "purchase"][["user_id", "ts_us"]] \
            .merge(first_a, on="user_id")
        p = p[(p["ts_us"] >= p["first_click_us"])
              & (p["ts_us"] <= p["first_click_us"] + 3_600_000_000)]
        out = p.groupby(["user_id", "first_click_us"], as_index=False)[
            "ts_us"].min().rename(columns={"ts_us": "first_purchase_us"})
        return out.astype({"user_id": "int64", "first_click_us": "int64",
                           "first_purchase_us": "int64"})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("bucket").map_groups(funnel, batch_format="pandas") \
        .to_pandas()
    if not len(out):
        # zero conversions: to_pandas over all-empty blocks loses the
        # schema — return the typed empty frame
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "first_click_us": pd.Series([], dtype="int64"),
             "first_purchase_us": pd.Series([], dtype="int64")})
    return out.sort_values("user_id").reset_index(drop=True)


Q_EVENT_FUNNEL_SQL = """
WITH a AS (SELECT user_id, min(epoch_us(ts)) AS first_click_us
           FROM events WHERE event_type = 'click' GROUP BY user_id)
SELECT a.user_id, a.first_click_us,
       min(epoch_us(e.ts)) AS first_purchase_us
FROM a JOIN events e
  ON e.user_id = a.user_id AND e.event_type = 'purchase'
 AND epoch_us(e.ts) >= a.first_click_us
 AND epoch_us(e.ts) <= a.first_click_us + 3600000000
GROUP BY a.user_id, a.first_click_us ORDER BY a.user_id
"""


def q_gap_fill_hours(sf_dir: str) -> pd.DataFrame:
    """Densified hourly time series: event counts per (hour,
    event_type) over the corpus's full hour range with missing cells
    filled as zero — the gap-fill step ahead of any windowed trend
    model (a plain GROUP BY silently drops empty hours).

    Distributed shape: a per-batch value_counts combiner collapses
    each batch to ≤ hours_in_batch × n_types partial rows, a salted
    bucket fold sums them, and only then does the driver densify —
    the spine (hours × types) IS the query's output, so the only
    driver-side table is result-sized no matter the event count."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])
    hour_us = 3_600_000_000

    # arrow-side unit-robust µs cast (see _ts_us): pandas
    # `.astype("int64")` on a datetime64 column yields the column's
    # STORAGE unit — a ns-coerced batch would silently put every
    # bucket 1000× off
    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"ts_us": _ts_us(t),
                         "event_type": t["event_type"]})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"cell": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        h = (b["ts_us"] // hour_us) * hour_us
        vc = (h.astype(str) + "\x1f" + b["event_type"]).value_counts()
        return pd.DataFrame({"cell": vc.index.to_numpy(),
                             "c": vc.to_numpy(dtype="int64")})

    from .rayutil import bucketed_group_sum as _bgs
    counts = _bgs(ds.map_batches(prep, batch_format="pyarrow")
                  .map_batches(partial, batch_format="pandas"),
                  ["cell"], {"c": "n"}).to_pandas()
    cell = counts["cell"].str.split("\x1f", expand=True)
    counts = pd.DataFrame({"hour_us": cell[0].astype("int64"),
                           "event_type": cell[1],
                           "n": counts["n"].astype("int64")})
    lo, hi = counts["hour_us"].min(), counts["hour_us"].max()
    spine = pd.MultiIndex.from_product(
        [np.arange(lo, hi + hour_us, hour_us, dtype=np.int64),
         sorted(counts["event_type"].unique())],
        names=["hour_us", "event_type"]).to_frame(index=False)
    out = spine.merge(counts, on=["hour_us", "event_type"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out.sort_values(["hour_us", "event_type"]) \
        .reset_index(drop=True)


Q_GAP_FILL_HOURS_SQL = """
WITH b AS (SELECT min(epoch_us(ts)) // 3600000000 AS lo,
                  max(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
hours AS (SELECT unnest(generate_series(lo, hi)) * 3600000000 AS hour_us
          FROM b),
types AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
SELECT h.hour_us, t.event_type, coalesce(c.n, 0)::BIGINT AS n
FROM hours h CROSS JOIN types t
LEFT JOIN c ON c.hour_us = h.hour_us AND c.event_type = t.event_type
ORDER BY h.hour_us, t.event_type
"""


def q_rrf_orders(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-rank fusion of two order rankings — highest total
    price and earliest order date — into one top-50 leaderboard
    (the multi-signal result-merging primitive search stacks use,
    k = 60 per the standard RRF formulation).

    Distributed shape: each ranking is an exact global rank via
    windows.global_rank_by_value (value-range partitions, two-pass
    count/offset scan — no driver sort), the two rank tables join
    natively on orderkey, the fused score is pure integer arithmetic
    (exact vs the SQL twin), and the top-50 is a distributed
    sort+limit. Driver sees only the 50-row result."""
    orders = read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderkey", "o_totalprice",
                                   "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        neg_centi = -np.floor(p * 100 + 0.5).astype(np.int64)
        date_us = pc.cast(t["o_orderdate"], pa.int64())
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "neg_price_centi": pa.array(neg_centi),
            "date_us": date_us})

    # both rank passes scan this 3-int-column projection (and each
    # scans it multiple times internally); materialize ONCE so the
    # parquet read + integerize map never re-execute
    prepped = orders.map_batches(prep, batch_format="pyarrow") \
        .materialize()
    by_price = wn.global_rank_by_value(
        prepped, value_col="neg_price_centi", id_col="o_orderkey")
    by_date = wn.global_rank_by_value(
        prepped, value_col="date_us", id_col="o_orderkey")

    def keep_rank(name: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"o_orderkey": t["o_orderkey"],
                             name: t["rank"]})
        return f

    with light_shuffle_aggregators():
        j = by_price.map_batches(keep_rank("rp"), batch_format="pyarrow") \
            .join(by_date.map_batches(keep_rank("rd"),
                                      batch_format="pyarrow"),
                  join_type="inner", num_partitions=8,
                  on=("o_orderkey",))

        def fuse(t: pa.Table) -> pa.Table:
            rp = t["rp"].to_numpy(zero_copy_only=False)
            rd = t["rd"].to_numpy(zero_copy_only=False)
            score = (10 ** 15 // (60 + rp) + 10 ** 15 // (60 + rd))
            return pa.table({"o_orderkey": t["o_orderkey"],
                             "rrf_score": pa.array(score, pa.int64())})

        out = j.map_batches(fuse, batch_format="pyarrow") \
            .sort(key=["rrf_score", "o_orderkey"],
                  descending=[True, False]).limit(50).to_pandas()
    return out.reset_index(drop=True)


Q_RRF_ORDERS_SQL = """
WITH p AS (SELECT o_orderkey,
                  row_number() OVER (
                    ORDER BY -CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT), o_orderkey) - 1 AS rp
           FROM orders),
d AS (SELECT o_orderkey,
             row_number() OVER (ORDER BY epoch_us(o_orderdate),
                                o_orderkey) - 1 AS rd
      FROM orders)
SELECT p.o_orderkey AS o_orderkey,
       1000000000000000 // (60 + rp)
         + 1000000000000000 // (60 + rd) AS rrf_score
FROM p JOIN d USING (o_orderkey)
ORDER BY rrf_score DESC, o_orderkey LIMIT 50
"""


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroid, exact: (label, dimension) →
    vector count + integer-micro component sum — the class-prototype /
    cluster-seed primitive (kmeans init, nearest-class-mean) as a
    grouped aggregate over a list<float> column.

    Distributed shape: each batch flattens its list column zero-copy
    (pc.list_flatten → reshape), integerizes per element, and folds to
    ONE partial row per (label, dim) via np.add.at — the shuffle moves
    ≤ labels × dim rows per batch regardless of vector count; the
    native arrow groupby-sum then folds partials on its fast path
    (single fused int key, label·1024 + dim)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        flat = pc.list_flatten(t["embedding"]) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(t)
        if dim >= 1024:   # not assert: stripped under -O, and a key
            # collision here CORRUPTS adjacent labels silently
            raise ValueError(
                f"fused label*1024+idx key needs dim < 1024, got {dim}")
        micro = np.floor(flat.reshape(len(t), dim) * 1_000_000 + 0.5) \
            .astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = (np.repeat(uniq, dim) * 1024
             + np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq)))
        return pa.table({"k": pa.array(k),
                         "n": pa.array(np.repeat(counts, dim)),
                         "s": pa.array(sums.ravel())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").sum(["n", "s"]).to_pandas()
    k = agg["k"].to_numpy(dtype=np.int64)
    out = pd.DataFrame({"label": k // 1024, "idx": k % 1024,
                        "n_vecs": agg["sum(n)"].astype("int64"),
                        "sum_micro": agg["sum(s)"].astype("int64")})
    return out.sort_values(["label", "idx"]).reset_index(drop=True)


Q_LABEL_CENTROIDS_SQL = """
SELECT CAST(label AS BIGINT) AS label, CAST(idx AS BIGINT) AS idx,
       count(*)::BIGINT AS n_vecs,
       sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
         ::BIGINT AS sum_micro
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS idx
      FROM embeddings)
GROUP BY label, idx ORDER BY label, idx
"""


def q_token_pmi_pairs(sf_dir: str) -> pd.DataFrame:
    """Co-occurrence statistics for the top-50 document-frequency
    vocabulary: per unordered token pair, the number of documents
    containing BOTH, plus each side's df — the integer core of
    PMI / phrase-mining collocation scoring (the log-ratio is a
    driver-side arithmetic afterthought; keeping the output integral
    makes the oracle exact).

    Distributed shape: pass 1 computes document frequency with the
    q_top_tokens crc32-bucket discipline (per-batch distinct-per-doc
    combiner, per-bucket exact top-50 — the global top-50 is contained
    in the bucket winners' union); the 50-token vocabulary broadcasts
    once via ray.put; pass 2 folds each batch to one 50×50 upper-
    triangle count matrix (numpy, unique pairs per doc) and ships
    ≤ 1 225 partial rows per batch into a native arrow groupby-sum."""
    import zlib
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    topk = 50

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in batch["text"].fillna(""):
            for tok in set(t.split()):
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        return pd.DataFrame({
            "token": toks,
            "c": pd.Series(list(counts.values()), dtype="int64"),
            "bucket": pd.Series(
                [zlib.crc32(t.encode()) % 64 for t in toks],
                dtype="int32")})

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["c"].sum()
        return s.sort_values(["c", "token"],
                             ascending=[False, True]).head(topk)

    df_top = ds.map_batches(df_partial, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_top,
                                      batch_format="pandas").to_pandas()
    df_top = df_top.sort_values(["c", "token"],
                                ascending=[False, True]).head(topk)
    vocab = sorted(df_top["token"])          # lexicographic index
    df_of = dict(zip(df_top["token"], df_top["c"].astype(int)))
    vocab_ref = ray.put({t: i for i, t in enumerate(vocab)})

    def pair_partial(t: pa.Table) -> pa.Table:
        vidx = cached_object(vocab_ref)
        m = np.zeros((topk, topk), dtype=np.int64)
        for txt in t["text"].to_pylist():
            ids = sorted({vidx[w] for w in (txt or "").split()
                          if w in vidx})
            if len(ids) > 1:
                ids = np.asarray(ids, dtype=np.int64)
                ia, ib = np.triu_indices(len(ids), 1)
                m[ids[ia], ids[ib]] += 1   # unique per doc: no dup adds
        a, b = np.nonzero(m)
        return pa.table({"k": pa.array(a * topk + b, pa.int64()),
                         "c": pa.array(m[a, b])})

    agg = ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby("k").sum("c").to_pandas()
    k = agg["k"].to_numpy(dtype=np.int64)
    va = np.asarray(vocab, dtype=object)
    out = pd.DataFrame({"token_a": va[k // topk], "token_b": va[k % topk],
                        "n_ab": agg["sum(c)"].astype("int64")})
    out["df_a"] = out["token_a"].map(df_of).astype("int64")
    out["df_b"] = out["token_b"].map(df_of).astype("int64")
    return out.sort_values(["token_a", "token_b"]).reset_index(drop=True)


Q_TOKEN_PMI_PAIRS_SQL = r"""
WITH dt AS (SELECT DISTINCT doc_id, token
            FROM (SELECT doc_id,
                         unnest(list_filter(string_split_regex(text, '\s+'),
                                            x -> x <> '')) AS token
                  FROM documents)),
df AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
vocab AS (SELECT token, df FROM df ORDER BY df DESC, token LIMIT 50),
dv AS (SELECT dt.doc_id, dt.token FROM dt JOIN vocab USING (token)),
p AS (SELECT a.token AS token_a, b.token AS token_b, count(*) AS n_ab
      FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2)
SELECT token_a, token_b, n_ab::BIGINT AS n_ab,
       va.df::BIGINT AS df_a, vb.df::BIGINT AS df_b
FROM p JOIN vocab va ON va.token = p.token_a
       JOIN vocab vb ON vb.token = p.token_b
ORDER BY token_a, token_b
"""


def q_quantity_mad(sf_dir: str) -> pd.DataFrame:
    """Robust per-returnflag location/dispersion: exact median and
    median absolute deviation of order quantity (windows.grouped_mad —
    two (key, value)-histogram shuffles, lower-median rank rule, fully
    integral so the row_number-window SQL twin matches bit-for-bit).
    The |x−med| > k·MAD outlier gate this feeds survives heavy-tailed
    spam that mean/stddev quality gates don't."""
    ds = read_parquet(_t(sf_dir, "lineitem"),
                      columns=["l_returnflag", "l_quantity"])

    def to_int(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "qty": pa.array(np.floor(q + 0.5).astype(np.int64))})

    out = wn.grouped_mad(ds.map_batches(to_int, batch_format="pyarrow"),
                         key_col="l_returnflag", value_col="qty")
    out = out.astype({"med": "int64", "mad": "int64"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q_QUANTITY_MAD_SQL = """
WITH t AS (SELECT l_returnflag AS k,
                  CAST(floor(l_quantity + 0.5) AS BIGINT) AS v
           FROM lineitem),
r1 AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) - 1
                AS rn,
              count(*) OVER (PARTITION BY k) AS n FROM t),
med AS (SELECT k, v AS med FROM r1 WHERE rn = (n - 1) // 2),
d AS (SELECT t.k, abs(t.v - med.med) AS d FROM t JOIN med USING (k)),
r2 AS (SELECT k, d, row_number() OVER (PARTITION BY k ORDER BY d) - 1
                AS rn,
              count(*) OVER (PARTITION BY k) AS n FROM d),
mad AS (SELECT k, d AS mad FROM r2 WHERE rn = (n - 1) // 2)
SELECT med.k AS l_returnflag, med.med AS med, mad.mad AS mad
FROM med JOIN mad USING (k) ORDER BY l_returnflag
"""


def q_docs_all_terms(sf_dir: str) -> pd.DataFrame:
    """Conjunctive keyword search: documents containing ALL query
    terms, token-exact (the AND-of-postings primitive of an inverted
    index, run as a scan predicate). Embarrassingly parallel — a
    vectorized per-batch set-superset filter, no shuffle at all; the
    result is id-level rows only."""
    terms = {"batch", "scan", "join"}
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "text", "lang"])

    def match(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["text"].fillna("").map(
            lambda t: terms.issubset(t.split()))
        out = b.loc[keep, ["doc_id", "lang"]].copy()
        return out.astype({"doc_id": "int64"})

    out = ds.map_batches(match, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DOCS_ALL_TERMS_SQL = r"""
SELECT doc_id, lang FROM documents
WHERE list_has_all(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''),
                   ['batch', 'scan', 'join'])
ORDER BY doc_id
"""


def q_props_field_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` column,
    pull the numeric ``k`` field and aggregate per event type — the
    sidecar-metadata pattern (fetch headers, HAR annotations, model
    scores) where a string column carries JSON the schema doesn't.

    Distributed shape: json.loads per row INSIDE a per-batch combiner
    that immediately folds to one (type, n, sum, min, max) partial row
    per key per batch — the parse cost parallelizes across the actor
    pool and the shuffle moves partials only. Missing/null fields
    degrade to 0-count rows, matching SQL NULL elimination."""
    import json as _json
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_type", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64")})
        ks = []
        for p in b["props"]:
            try:
                v = _json.loads(p).get("k")
            except (TypeError, ValueError):
                v = None
            # non-integral k (2.5, "x") → NULL per row, mirroring the
            # SQL twin's TRY_CAST semantics — a raw pd.array(...,
            # "Int64") would raise "cannot safely cast" and kill the
            # whole query on one bad row (bool excluded: json true/
            # false is not an integer k)
            ks.append(v if isinstance(v, int)
                      and not isinstance(v, bool) else None)
        t = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "k": pd.array(ks, dtype="Int64")})
        t = t[t["k"].notna()]
        g = t.groupby("event_type")["k"] \
            .agg(n="count", s="sum", mn="min", mx="max").reset_index()
        return g.astype({"n": "int64", "s": "int64",
                         "mn": "int64", "mx": "int64"})

    from .rayutil import salt_bucket

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = salt_bucket(b["event_type"].to_numpy(), 16) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("s", "sum"),
            min_k=("mn", "min"), max_k=("mx", "max"))
        return out.astype({"n": "int64", "sum_k": "int64",
                           "min_k": "int64", "max_k": "int64"})

    out = ds.map_batches(partial, batch_format="pandas") \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


Q_PROPS_FIELD_STATS_SQL = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT))::BIGINT AS min_k,
       max(CAST(props->>'$.k' AS BIGINT))::BIGINT AS max_k
FROM events WHERE props->>'$.k' IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_orders_by_dow(sf_dir: str) -> pd.DataFrame:
    """Calendar-feature derivation without a calendar library: order
    count + revenue per day-of-week, the date-dimension join collapsed
    to pure epoch arithmetic (dow = (days_since_epoch + 4) mod 7,
    Sunday = 0 — exact against SQL's dayofweek()). Per-batch partials
    fold to ≤ 7 rows each; the final groupby moves nothing."""
    ds = read_parquet(_t(sf_dir, "orders"),
                      columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"dow": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        us = pc.cast(t["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 4) % 7
        centi = np.floor(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        uniq, inv = np.unique(dow, return_inverse=True)
        return pa.table({
            "dow": pa.array(uniq, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "rev": pa.array(np.bincount(inv, weights=centi)
                            .astype(np.int64))})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dow").sum(["n", "rev"]).to_pandas()
    out = out.rename(columns={"sum(n)": "n_orders",
                              "sum(rev)": "revenue_centi"}) \
        .astype({"dow": "int64", "n_orders": "int64",
                 "revenue_centi": "int64"})
    return out.sort_values("dow").reset_index(drop=True)


Q_ORDERS_BY_DOW_SQL = """
SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
         AS revenue_centi
FROM orders GROUP BY dow ORDER BY dow
"""


def q_user_dropoffs(sf_dir: str) -> pd.DataFrame:
    """Session drop-off points: events whose user has NO further event
    within 30 minutes (LEAD semantics — the churn/abandonment signal).
    Distributed shape: LEAD is grouped_lag over the REVERSED order
    (sort keys negated), so the same salted-bucket shift primitive
    serves both window directions; the filter is then per-batch."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = _ts_us(t)
        neg_ts = pc.negate_checked(ts_us)
        neg_id = pc.negate_checked(t["event_id"])
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ts_us": ts_us,
                         "neg_ts": neg_ts, "neg_id": neg_id})

    lagged = wn.grouped_lag(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", order_cols=["neg_ts", "neg_id"],
        value_col="ts_us")

    def dropoffs(b: pd.DataFrame) -> pd.DataFrame:
        nxt = b["prev"]   # reversed order: prev IS the next event's ts
        keep = nxt.isna() | (nxt - b["ts_us"] > 1_800_000_000)
        out = b.loc[keep, ["event_id", "user_id"]].copy()
        return out.astype({"event_id": "int64", "user_id": "int64"})

    out = lagged.map_batches(dropoffs, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


Q_USER_DROPOFFS_SQL = """
SELECT event_id, user_id FROM (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events)
WHERE nxt IS NULL OR nxt - us > 1800000000 ORDER BY event_id
"""


def q_active_users_7d(sf_dir: str) -> pd.DataFrame:
    """Sliding-window engagement: DISTINCT active users per 7-day
    window hopping daily — the rolling-MAU/WAU shape that needs
    dedup WITHIN each overlapping window (a plain hopping count
    over-counts repeat visitors).

    Distributed shape: arithmetic 7-way window fan-out per batch with
    IN-BATCH (window, user) dedup (np.unique on the pair), then
    windows.grouped_distinct_count — pair-hash-bucketed exact distinct,
    so no per-window user set ever materializes in one process."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "user_id"])
    day_us = 86_400_000_000

    def fanout(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"wstart_us": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        day = _ts_us(t) \
            .to_numpy(zero_copy_only=False) // day_us
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        w = ((day[:, None] - np.arange(7, dtype=np.int64)) * day_us) \
            .ravel()
        pairs = np.unique(
            np.stack([w, np.repeat(uid, 7)], axis=1), axis=0)
        return pa.table({"wstart_us": pa.array(pairs[:, 0], pa.int64()),
                         "user_id": pa.array(pairs[:, 1], pa.int64())})

    out = wn.grouped_distinct_count(
        ds.map_batches(fanout, batch_format="pyarrow"),
        key_col="wstart_us", value_col="user_id").to_pandas()
    out = out.rename(columns={"n_distinct": "active_users"}) \
        .astype({"wstart_us": "int64", "active_users": "int64"})
    return out.sort_values("wstart_us").reset_index(drop=True)


Q_ACTIVE_USERS_7D_SQL = """
SELECT wstart_us, count(DISTINCT user_id)::BIGINT AS active_users
FROM (SELECT (epoch_us(ts) // 86400000000 - j) * 86400000000
               AS wstart_us,
             user_id
      FROM events
      CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS j))
GROUP BY wstart_us ORDER BY wstart_us
"""


_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+"
_BPE_RE = __import__("re").compile(_BPE_PAT)


def q_bpe_token_stats(sf_dir: str) -> pd.DataFrame:
    """BPE-ish token counting (SURVEY task-brief bullet: whitespace +
    a BPE-ish regex): per document, the GPT-2-style pre-tokenizer
    match count (optional leading space + letter-run / digit-run /
    punctuation-run) alongside the whitespace count — the
    tokens-per-doc budget signal a real tokenizer would refine.
    The pattern uses only explicit ASCII classes so Python re and
    DuckDB's RE2 agree match-for-match (no \\s, no lookahead).
    Shuffle-free per-batch map; compiled once at module load."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].fillna("")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_ws": texts.str.split().str.len().astype("int64"),
            "n_bpe": pd.Series(
                [len(_BPE_RE.findall(t)) for t in texts],
                dtype="int64", index=b.index)})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_BPE_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CAST(length(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '')) AS BIGINT) AS n_ws,
       CAST(length(regexp_extract_all(text, '{_BPE_PAT}'))
            AS BIGINT) AS n_bpe
FROM documents ORDER BY doc_id
"""


def q_source_kl(sf_dir: str) -> pd.DataFrame:
    """Per-source KL divergence vs the corpus token distribution
    (textops.source_kl_divergence — token-hash buckets co-locate each
    token's per-source counts WITH its corpus total, so the cross-term
    needs no second vocab-wide exchange; integer per-term floors keep
    the nats exact against the SQL twin)."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["source", "text"])
    return to.source_kl_divergence(ds, group_col="source",
                                   text_col="text")


Q_SOURCE_KL_SQL = r"""
WITH tok AS (SELECT source,
                    unnest(list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '')) AS t
             FROM documents),
sc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
ct AS (SELECT t, sum(c) AS ct FROM sc GROUP BY t),
terms AS (SELECT sc.source, sc.c,
                 CAST(floor(ln(sc.c) * sc.c * 1000000) AS BIGINT) AS t1,
                 CAST(floor(ln(ct.ct) * sc.c * 1000000) AS BIGINT) AS t2
          FROM sc JOIN ct USING (t)),
agg AS (SELECT source, sum(c)::BIGINT AS n_tokens,
               sum(t1)::BIGINT AS s1, sum(t2)::BIGINT AS s2
        FROM terms GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS bign FROM agg)
SELECT source, n_tokens,
       CAST(floor(((s1 - s2) / 1000000.0 / n_tokens
                   + ln(bign) - ln(n_tokens)) * 1000) AS BIGINT)
         AS kl_milli
FROM agg, tot ORDER BY source
"""


def q_approx_grouped_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag t-digest quantiles of l_extendedprice — the
    grouped sketch path for continuous per-key distributions
    (sketches.grouped_approx_quantiles: one digest row per
    (key, batch), value-cardinality-independent shuffle; per-key rank
    error pinned vs the exact histogram in tests)."""
    from .functions.sketches import grouped_approx_quantiles
    ds = read_parquet(_t(sf_dir, "lineitem"),
                      columns=["l_returnflag", "l_extendedprice"])
    return grouped_approx_quantiles(
        ds, key_col="l_returnflag", value_col="l_extendedprice",
        qs=[0.25, 0.5, 0.75, 0.9])


def q_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort retention matrix: users grouped by their FIRST
    active week (the cohort), counted at each later week offset —
    the engagement-decay shape behind every training-data freshness /
    user-retention dashboard.

    Distributed shape: one user-bucketed shuffle does ALL the work —
    per-batch in-batch-unique (user, week) pairs co-locate by a salt
    of user_id, each bucket computes its users' cohort week (min) and
    emits per-(cohort, offset) partial counts (users partition across
    buckets disjointly, so summing cells across buckets is an EXACT
    distinct-user count); the final fold moves only cell-level rows
    (≤ cohorts × offsets), never user-level state."""
    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "user_id"])
    week_us = 604_800_000_000

    def pairs(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "wk": pa.array([], pa.int64())})
        wk = _ts_us(t) \
            .to_numpy(zero_copy_only=False) // week_us
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([uid, wk], axis=1), axis=0)
        return pa.table({"user_id": pa.array(uniq[:, 0], pa.int64()),
                         "wk": pa.array(uniq[:, 1], pa.int64())})

    from .rayutil import bucketed_group_sum, salt_bucket

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = salt_bucket(b["user_id"].to_numpy(), 64) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def cohort_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "wk"])
        cw = g.groupby("user_id")["wk"].transform("min")
        cells = pd.DataFrame({"cohort_week_us": cw * week_us,
                              "week_offset": g["wk"] - cw}) \
            .value_counts().reset_index(name="u")
        return cells.astype({"cohort_week_us": "int64",
                             "week_offset": "int64", "u": "int64"})

    cells = ds.map_batches(pairs, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(cohort_cells, batch_format="pandas")
    out = bucketed_group_sum(cells, ["cohort_week_us", "week_offset"],
                             {"u": "n_users"}).to_pandas()
    return out.sort_values(["cohort_week_us", "week_offset"]) \
        .reset_index(drop=True)


Q_RETENTION_COHORTS_SQL = """
WITH uw AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 604800000000 AS wk
            FROM events),
c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
SELECT (c.cw * 604800000000)::BIGINT AS cohort_week_us,
       (uw.wk - c.cw)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_paragraph_dedup(sf_dir: str) -> pd.DataFrame:
    """Paragraph-level exact dedup (the sub-document granularity of
    Lee et al.'22 §3 — boilerplate paragraphs repeat across documents
    even when no full document duplicates): explode docs into
    non-blank paragraphs, keep each paragraph's FIRST occurrence in
    (doc_id, para_idx) order, report per-doc kept/total counts.
    "Non-blank" means non-EMPTY (the split artifact of 3+ consecutive
    newlines) — a whitespace-only paragraph is real content here, so
    the engine and the SQL twin can share one exact rule (Python
    str.strip() and DuckDB trim()/RE2 \\s disagree on unicode
    whitespace).

    Distributed shape: paragraphs carry a 60-bit md5 prefix (int64 —
    string keys degrade Ray's sort-aggregate ~12×, BASELINE.md round-3
    rule) and a fused (doc_id, para_idx) order key; the winner per
    hash is a salted-bucket min fold (one row per DISTINCT paragraph
    crosses that shuffle), survivors come back via a native int-key
    join, and per-doc counts fold as cell partials — no full-text
    exchange after the explode."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        import hashlib as _h
        dids, idxs, hs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            for i, para in enumerate((text or "").split("\n\n")):
                if not para:
                    continue
                h = int(_h.md5(para.encode()).hexdigest()[:15], 16)
                dids.append(did)
                idxs.append(i)
                hs.append(h)
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "para_idx": pa.array(idxs, pa.int32()),
                         "h": pa.array(hs, pa.int64())})

    from .rayutil import project_blocks, salt_bucket

    # materialized: feeds TWO consumers (winner fold + survivor join);
    # project_blocks first so empty read blocks that skip the UDF can't
    # reach the join schemaless (dedup.py:471 rule)
    paras = project_blocks(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["doc_id", "para_idx", "h"]).materialize()

    # winner per paragraph hash = min fused (doc_id, para_idx) key;
    # per-batch partial min, then a 64-bucket fold (exact: each h
    # lives in one bucket)
    def partial_min(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "fused": pd.Series([], dtype="int64")})
        if (b["para_idx"] >= 1_000_000).any():
            raise ValueError("para_idx exceeds fused-key range")
        fused = b["doc_id"] * 1_000_000 + b["para_idx"]
        out = pd.DataFrame({"h": b["h"], "fused": fused}) \
            .groupby("h", as_index=False)["fused"].min()
        out["bucket"] = salt_bucket(out["h"].to_numpy(), 64)
        return out

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("h", as_index=False)["fused"].min() \
            .rename(columns={"fused": "min_fused"})

    # project_blocks around the join: map_groups emits zero-column
    # blocks for empty salt buckets and the hash join does the same
    # for empty partitions — both break the next stage's FieldRef /
    # key-column resolution (the dedup.py:471 rule)
    winners = project_blocks(
        paras.map_batches(partial_min, batch_format="pandas")
        .groupby("bucket").map_groups(fold_min, batch_format="pandas"),
        ["h", "min_fused"])
    joined = project_blocks(
        paras.join(winners, join_type="inner", num_partitions=8,
                   on=("h",), right_on=("h",)),
        ["doc_id", "para_idx", "min_fused"])

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_paras": pd.Series([], dtype="int64"),
                                 "n_kept": pd.Series([], dtype="int64")})
        fused = b["doc_id"] * 1_000_000 + b["para_idx"]
        b = pd.DataFrame({"doc_id": b["doc_id"],
                          "kept": (fused == b["min_fused"]).astype("int64")})
        g = b.groupby("doc_id", as_index=False) \
            .agg(n_paras=("kept", "size"), n_kept=("kept", "sum"))
        return g.astype({"n_paras": "int64", "n_kept": "int64"})

    from .rayutil import bucketed_group_sum
    out = bucketed_group_sum(
        joined.map_batches(doc_partial, batch_format="pandas"),
        ["doc_id"], {"n_paras": "n_paras", "n_kept": "n_kept"}).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_PARAGRAPH_DEDUP_SQL = r"""
WITH w AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
           FROM documents),
s AS (SELECT doc_id, unnest(range(0, len(ps))) AS i, ps FROM w),
p AS (SELECT doc_id, i AS para_idx,
             ('0x' || substr(md5(ps[i + 1]), 1, 15))::BIGINT AS h,
             doc_id * 1000000 + i AS fused
      FROM s WHERE ps[i + 1] <> ''),
r AS (SELECT doc_id, fused,
             min(fused) OVER (PARTITION BY h) AS min_fused
      FROM p)
SELECT doc_id, count(*)::BIGINT AS n_paras,
       sum(CASE WHEN fused = min_fused THEN 1 ELSE 0 END)::BIGINT
           AS n_kept
FROM r GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# IR / data-curation operators (round 4): BM25 retrieval, duplicate-family
# connected components, unigram-LM quality scoring (CCNet-style), DSIR
# importance weights — each with an exact integerized DuckDB twin.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 top-20 documents for a fixed 3-term query (Robertson
    et al.; the Lucene ``ln(1 + (N-df+.5)/(df+.5))`` idf form).

    Distributed shape: one pass compresses each document to a 5-int row
    (doc_id, dl, tf per query term) — corpus stats (N, Σdl, df per term)
    fold from per-batch partials, scoring is a vectorized second pass
    over the compact rows with the stats broadcast as plain scalars, and
    each batch prunes to a local top-20 before the driver's final
    nlargest over ≤ 20·n_batches candidate rows. Only query-term tf
    counts ever leave a batch; full text never re-crosses the wire.
    Per-term scores are floored to integer micro-units before the
    per-doc sum, so the ranking is bit-identical to the SQL twin."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    terms = _BM25_TERMS

    def per_doc(t: pa.Table) -> pa.Table:
        dids, dls = [], []
        tfs: list[list[int]] = [[] for _ in terms]
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            toks = (text or "").split()
            dids.append(did)
            dls.append(len(toks))
            for j, q in enumerate(terms):
                tfs[j].append(toks.count(q))
        cols = {"doc_id": pa.array(dids, pa.int64()),
                "dl": pa.array(dls, pa.int64())}
        for j in range(len(terms)):
            cols[f"tf{j}"] = pa.array(tfs[j], pa.int64())
        return pa.table(cols)

    compact = ds.map_batches(per_doc, batch_format="pyarrow").materialize()
    if compact.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score_micro": pd.Series([], dtype="int64")})

    def stat_partial(t: pa.Table) -> pa.Table:
        cols = {"n": pa.array([t.num_rows], pa.int64()),
                "sdl": pa.array([pc.sum(t["dl"]).as_py() or 0], pa.int64())}
        for j in range(len(terms)):
            cols[f"df{j}"] = pa.array(
                [pc.sum(pc.cast(pc.greater(t[f"tf{j}"], 0),
                                pa.int64())).as_py() or 0], pa.int64())
        return pa.table(cols)

    st = compact.map_batches(stat_partial,
                             batch_format="pyarrow").to_pandas().sum()
    n, avgdl = float(st["n"]), float(st["sdl"]) / float(st["n"])
    idf = [float(np.log((n - float(st[f"df{j}"]) + 0.5)
                        / (float(st[f"df{j}"]) + 0.5) + 1.0))
           for j in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom_norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        total = np.zeros(len(dl), dtype=np.int64)
        any_tf = np.zeros(len(dl), dtype=bool)
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            any_tf |= tf > 0
            total += np.floor(idf[j] * tf / (tf + denom_norm)
                              * 1_000_000).astype(np.int64)
        out = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "score_micro": total})[any_tf]
        # local top-k prune: only candidate rows cross to the driver
        return pa.Table.from_pandas(
            out.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True]).head(20),
            preserve_index=False)

    cand = compact.map_batches(score, batch_format="pyarrow").to_pandas()
    if cand.empty:   # no document matched any query term
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score_micro": pd.Series([], dtype="int64")})
    return cand.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True]) \
        .head(20).reset_index(drop=True)


def _bm25_sql() -> str:
    t0, t1, t2 = _BM25_TERMS
    k1, b = _BM25_K1, _BM25_B
    term = ("CAST(floor(ln((n - df{j} + 0.5) / (df{j} + 0.5) + 1.0) "
            "* tf{j} / (tf{j} + {k1} * (1.0 - {b} + {b} * dl / (sdl / n))) "
            "* 1000000) AS BIGINT)")
    terms_sql = " + ".join(term.format(j=j, k1=k1, b=b) for j in range(3))
    return f"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '') AS w
           FROM documents),
c AS (SELECT doc_id, len(w)::BIGINT AS dl,
             length(list_filter(w, x -> x = '{t0}'))::BIGINT AS tf0,
             length(list_filter(w, x -> x = '{t1}'))::BIGINT AS tf1,
             length(list_filter(w, x -> x = '{t2}'))::BIGINT AS tf2
      FROM d),
g AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sdl,
             sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2
      FROM c)
SELECT doc_id, ({terms_sql})::BIGINT AS score_micro
FROM c, g WHERE tf0 + tf1 + tf2 > 0
ORDER BY score_micro DESC, doc_id LIMIT 20
"""


def q_embedding_components(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style duplicate families (Abbas et al.'23): connected
    components over the exact cosine-similarity near-dup graph
    (threshold 0.45, the same pair rule q_embedding_neardup_exact
    pins), each vector labeled with its component's min vec_id — the
    cluster view a keep-one-per-family dedup acts on.

    Distributed shape: pairs come from the bucketed batch×corpus
    matmul (dedup.exact_neardup_pairs — corpus matrix broadcast once,
    no all-pairs shuffle), components resolve via
    dedup.dedup_groups_distributed (min-label propagation, one
    groupby-min shuffle per round, no driver pair state). Singletons
    join as themselves in the final per-vector frame (driver-bounded
    by definition: one row per vector)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    from .rayutil import project_blocks
    if ds.count() == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "component_id": pd.Series([], dtype="int64")})

    pairs = project_blocks(
        dd.exact_neardup_pairs(ds, threshold=0.45).map_batches(
            lambda t: pa.table({"doc_a": t["id_a"], "doc_b": t["id_b"]}),
            batch_format="pyarrow"),
        ["doc_a", "doc_b"])
    labels = dd.dedup_groups_distributed(pairs).to_pandas()
    if labels.empty:
        labels = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                               "cluster_rep": pd.Series([], dtype="int64")})
    labels = labels.rename(columns={"doc_id": "vec_id"})

    all_vecs = read_parquet(_t(sf_dir, "embeddings"),
                            columns=["vec_id"]).to_pandas()
    out = all_vecs.merge(labels, on="vec_id", how="left")
    out["component_id"] = out["cluster_rep"] \
        .fillna(out["vec_id"]).astype("int64")
    return out[["vec_id", "component_id"]] \
        .sort_values("vec_id").reset_index(drop=True)


Q_EMB_COMPONENTS_SQL = """
WITH RECURSIVE
e AS (SELECT a.vec_id AS u, b.vec_id AS v
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45),
sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u)
SELECT m.vec_id,
       least(m.vec_id, coalesce(min(r.v), m.vec_id))::BIGINT
         AS component_id
FROM embeddings m LEFT JOIN reach r ON r.u = m.vec_id
GROUP BY m.vec_id ORDER BY m.vec_id
"""


def _doc_token_hash_rows(t: pa.Table) -> pa.Table:
    """(doc_id, h, tf) rows: per-document counts of 60-bit md5 token
    hashes (whitespace tokens; hash rule shared with the SQL twin so
    collisions — if any — are identical on both sides)."""
    import hashlib as _h
    from collections import Counter
    dids, hs, tfs = [], [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        c = Counter(int(_h.md5(w.encode()).hexdigest()[:15], 16)
                    for w in (text or "").split())
        for h, tf in c.items():
            dids.append(did)
            hs.append(h)
            tfs.append(tf)
    return pa.table({"doc_id": pa.array(dids, pa.int64()),
                     "h": pa.array(hs, pa.int64()),
                     "tf": pa.array(tfs, pa.int64())})


def _lm_nll_dataset(sf_dir: str):
    """Distributed unigram-LM NLL scores as a Dataset of
    (doc_id, n_tokens, nll_milli) — the shared core of q_lm_quality
    (doc-level result) and q_ccnet_buckets (head/middle/tail split,
    which ranks these scores without ever collecting them). Returns
    None for an empty corpus.

    Distributed shape: documents compress to (doc_id, token_hash, tf)
    partials per batch; corpus token totals fold through salted buckets
    (one row per DISTINCT token crosses that shuffle); a native int-key
    join co-locates each doc-token row with its corpus count, per-term
    integer floors make the per-doc sums order-independent, and the
    final per-doc reduce moves one row per document. nll_milli =
    mean over tokens of -ln p(token) (milli-nats), where p = corpus
    unigram frequency."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    from .rayutil import bucketed_group_sum, project_blocks

    dt = project_blocks(
        ds.map_batches(_doc_token_hash_rows, batch_format="pyarrow"),
        ["doc_id", "h", "tf"]).materialize()
    if dt.count() == 0:
        return None

    counts = project_blocks(
        bucketed_group_sum(dt, ["h"], {"tf": "c"}), ["h", "c"]) \
        .materialize()
    total = float(counts.map_batches(
        lambda t: pa.table({"s": pa.array([pc.sum(t["c"]).as_py() or 0],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    joined = project_blocks(
        dt.join(counts, join_type="inner", num_partitions=8,
                on=("h",), right_on=("h",)),
        ["doc_id", "tf", "c"])

    def term_ints(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "tf": pd.Series([], dtype="int64"),
                                 "t1": pd.Series([], dtype="int64")})
        t1 = np.floor(np.log(b["c"].to_numpy().astype(np.float64))
                      * b["tf"].to_numpy() * 1_000_000).astype(np.int64)
        return pd.DataFrame({"doc_id": b["doc_id"], "tf": b["tf"],
                             "t1": t1})

    agg = bucketed_group_sum(
        joined.map_batches(term_ints, batch_format="pandas"),
        ["doc_id"], {"tf": "n_tokens", "t1": "s1"})
    ln_total = float(np.log(total))

    def final(b: pd.DataFrame) -> pd.DataFrame:
        nll = np.floor(
            (ln_total - b["s1"].to_numpy(dtype=np.float64) / 1_000_000.0
             / b["n_tokens"].to_numpy(dtype=np.float64))
            * 1000).astype(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_tokens": b["n_tokens"].astype("int64"),
            "nll_milli": pd.Series(nll, dtype="int64", index=b.index)})

    return project_blocks(agg.map_batches(final, batch_format="pandas"),
                          ["doc_id", "n_tokens", "nll_milli"])


def q_lm_quality(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM negative-log-likelihood per document — the CCNet-style
    quality signal (Wenzek et al.'20: LM perplexity ranks documents for
    training-data selection; a corpus-fit unigram model is its exact,
    oracle-checkable core). Doc-level view of _lm_nll_dataset: the
    RESULT is per-document, so the driver collect here is the output,
    not an intermediate."""
    scores = _lm_nll_dataset(sf_dir)
    if scores is None:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "nll_milli": pd.Series([], dtype="int64")})
    return scores.to_pandas()[["doc_id", "n_tokens", "nll_milli"]] \
        .sort_values("doc_id").reset_index(drop=True)


Q_LM_QUALITY_SQL = r"""
WITH tok AS (SELECT doc_id,
                    ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
             FROM (SELECT doc_id,
                          unnest(list_filter(
                              string_split_regex(text, '\s+'),
                              x -> x <> '')) AS t
                   FROM documents)),
dt AS (SELECT doc_id, h, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
ct AS (SELECT h, sum(tf)::BIGINT AS c FROM dt GROUP BY h),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM ct),
terms AS (SELECT dt.doc_id, dt.tf,
                 CAST(floor(ln(ct.c) * dt.tf * 1000000) AS BIGINT) AS t1
          FROM dt JOIN ct USING (h)),
agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
               sum(t1)::BIGINT AS s1
        FROM terms GROUP BY doc_id)
SELECT doc_id, n_tokens,
       CAST(floor((ln(total) - s1 / 1000000.0 / n_tokens) * 1000)
            AS BIGINT) AS nll_milli
FROM agg, tot ORDER BY doc_id
"""


def _doc_bigram_rows(t: pa.Table) -> pa.Table:
    """(doc_id, h, tf, tf_tgt) rows: per-document hashed word-bigram
    counts, with the count mirrored into tf_tgt for target-domain
    (lang='en') documents so one shuffle folds both distributions."""
    import hashlib as _h
    from collections import Counter
    dids, hs, tfs, tts = [], [], [], []
    for did, text, lang in zip(t["doc_id"].to_pylist(),
                               t["text"].to_pylist(),
                               t["lang"].to_pylist()):
        toks = (text or "").split()
        c = Counter(
            int(_h.md5((toks[i] + " " + toks[i + 1]).encode())
                .hexdigest()[:15], 16)
            for i in range(len(toks) - 1))
        is_tgt = lang == "en"
        for h, tf in c.items():
            dids.append(did)
            hs.append(h)
            tfs.append(tf)
            tts.append(tf if is_tgt else 0)
    return pa.table({"doc_id": pa.array(dids, pa.int64()),
                     "h": pa.array(hs, pa.int64()),
                     "tf": pa.array(tfs, pa.int64()),
                     "tf_tgt": pa.array(tts, pa.int64())})


def q_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR importance weights (Xie et al.'23): per-document
    log-likelihood ratio of a target-domain hashed-bigram model
    (target = lang='en' documents) vs the raw-corpus model, with
    add-one smoothing over the observed feature vocabulary — the
    data-selection score used to resample a raw corpus toward a
    target domain.

    Distributed shape: same join topology as q_lm_quality — hashed
    bigram partials per batch, ONE salted fold builds both the corpus
    and target counts (tf_tgt rides along), a native int-key join
    co-locates doc rows with counts, per-term integer floors make the
    per-doc log-ratio sums order-independent. w_milli > 0 reads
    "more target-like than the corpus average"."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "text", "lang"])
    from .rayutil import bucketed_group_sum, project_blocks

    dt = project_blocks(
        ds.map_batches(_doc_bigram_rows, batch_format="pyarrow"),
        ["doc_id", "h", "tf", "tf_tgt"]).materialize()
    if dt.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_bigrams": pd.Series([], dtype="int64"),
                             "w_milli": pd.Series([], dtype="int64")})

    counts = project_blocks(
        bucketed_group_sum(dt, ["h"], {"tf": "c_all",
                                       "tf_tgt": "c_tgt"}),
        ["h", "c_all", "c_tgt"]).materialize()
    st = counts.map_batches(
        lambda t: pa.table({
            "v": pa.array([t.num_rows], pa.int64()),
            "t_all": pa.array([pc.sum(t["c_all"]).as_py() or 0],
                              pa.int64()),
            "t_tgt": pa.array([pc.sum(t["c_tgt"]).as_py() or 0],
                              pa.int64())}),
        batch_format="pyarrow").to_pandas().sum()
    v, t_all, t_tgt = (float(st["v"]), float(st["t_all"]),
                       float(st["t_tgt"]))

    joined = project_blocks(
        dt.join(counts, join_type="inner", num_partitions=8,
                on=("h",), right_on=("h",)),
        ["doc_id", "tf", "c_all", "c_tgt"])

    def term_ints(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "tf": pd.Series([], dtype="int64"),
                                 "t1": pd.Series([], dtype="int64"),
                                 "t2": pd.Series([], dtype="int64")})
        tf = b["tf"].to_numpy()
        t1 = np.floor(np.log(b["c_tgt"].to_numpy().astype(np.float64)
                             + 1.0) * tf * 1_000_000).astype(np.int64)
        t2 = np.floor(np.log(b["c_all"].to_numpy().astype(np.float64)
                             + 1.0) * tf * 1_000_000).astype(np.int64)
        return pd.DataFrame({"doc_id": b["doc_id"], "tf": tf,
                             "t1": t1, "t2": t2})

    agg = bucketed_group_sum(
        joined.map_batches(term_ints, batch_format="pandas"),
        ["doc_id"], {"tf": "n_bigrams", "t1": "s1", "t2": "s2"}) \
        .to_pandas()
    agg["w_milli"] = np.floor(
        ((agg["s1"] - agg["s2"]) / 1_000_000.0
         + agg["n_bigrams"] * (np.log(t_all + v) - np.log(t_tgt + v)))
        * 1000).astype("int64")
    return agg[["doc_id", "n_bigrams", "w_milli"]] \
        .sort_values("doc_id").reset_index(drop=True)


Q_DSIR_SQL = r"""
WITH w AS (SELECT doc_id, lang,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '') AS toks
           FROM documents),
bg AS (SELECT doc_id, lang,
              ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1]), 1, 15))
                ::BIGINT AS h
       FROM (SELECT doc_id, lang, toks,
                    unnest(range(1, len(toks))) AS i FROM w)),
dt AS (SELECT doc_id, h, count(*)::BIGINT AS tf,
              (CASE WHEN lang = 'en' THEN count(*) ELSE 0 END)::BIGINT
                AS tf_tgt
       FROM bg GROUP BY doc_id, h, lang),
ct AS (SELECT h, sum(tf)::BIGINT AS c_all, sum(tf_tgt)::BIGINT AS c_tgt
       FROM dt GROUP BY h),
tot AS (SELECT count(*)::DOUBLE AS v, CAST(sum(c_all) AS DOUBLE) AS t_all,
               CAST(sum(c_tgt) AS DOUBLE) AS t_tgt
        FROM ct),
terms AS (SELECT dt.doc_id, dt.tf,
                 CAST(floor(ln(ct.c_tgt + 1.0) * dt.tf * 1000000)
                      AS BIGINT) AS t1,
                 CAST(floor(ln(ct.c_all + 1.0) * dt.tf * 1000000)
                      AS BIGINT) AS t2
          FROM dt JOIN ct USING (h)),
agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
               sum(t1)::BIGINT AS s1, sum(t2)::BIGINT AS s2
        FROM terms GROUP BY doc_id)
SELECT doc_id, n_bigrams,
       CAST(floor(((s1 - s2) / 1000000.0
                   + n_bigrams * (ln(t_all + v) - ln(t_tgt + v)))
                  * 1000) AS BIGINT) AS w_milli
FROM agg, tot ORDER BY doc_id
"""


def _doc_trigram_types(t: pa.Table) -> pa.Table:
    """(doc_id, h) rows: DISTINCT 60-bit md5 hashes of the document's
    word trigrams (type-level — duplicates within a doc collapse, so a
    downstream count(h) is an exact document frequency)."""
    import hashlib as _h
    dids, hs = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").split()
        seen = set()
        for i in range(len(toks) - 2):
            h = int(_h.md5((toks[i] + " " + toks[i + 1] + " "
                            + toks[i + 2]).encode()).hexdigest()[:15], 16)
            if h not in seen:
                seen.add(h)
                dids.append(did)
                hs.append(h)
    return pa.table({"doc_id": pa.array(dids, pa.int64()),
                     "h": pa.array(hs, pa.int64())})


def q_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-document n-gram novelty: how many of a doc's trigram TYPES
    appear in no other document (corpus df == 1) — the memorization /
    contamination-risk signal behind "fraction of novel n-grams"
    train-set audits (cf. Lee et al.'22 §5, McCoy et al. RAVEN).

    Distributed shape: type-level (doc, trigram-hash) rows per batch;
    document frequency folds through salted buckets (one row per
    DISTINCT trigram crosses the shuffle); a native int-key join brings
    each doc row its df; per-doc counts fold as integer partials."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    from .rayutil import bucketed_group_sum, project_blocks

    g = project_blocks(
        ds.map_batches(_doc_trigram_types, batch_format="pyarrow"),
        ["doc_id", "h"]).materialize()
    if g.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_types": pd.Series([], dtype="int64"),
                             "n_novel": pd.Series([], dtype="int64")})

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(
            np.ones(t.num_rows, dtype=np.int64)))

    df = project_blocks(
        bucketed_group_sum(g.map_batches(ones, batch_format="pyarrow"),
                           ["h"], {"one": "df"}),
        ["h", "df"])
    joined = project_blocks(
        g.join(df, join_type="inner", num_partitions=8,
               on=("h",), right_on=("h",)),
        ["doc_id", "df"])

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_types": pd.Series([], dtype="int64"),
                                 "n_novel": pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_types": np.ones(len(b), dtype=np.int64),
            "n_novel": (b["df"].to_numpy() == 1).astype(np.int64)})
        return out.groupby("doc_id", as_index=False).sum()

    out = bucketed_group_sum(
        joined.map_batches(doc_partial, batch_format="pandas"),
        ["doc_id"], {"n_types": "n_types", "n_novel": "n_novel"}) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_NGRAM_NOVELTY_SQL = r"""
WITH w AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '') AS toks
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' '
                                 || toks[i + 2]), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
            FROM w)),
df AS (SELECT h, count(*)::BIGINT AS df FROM g GROUP BY h)
SELECT doc_id, count(*)::BIGINT AS n_types,
       sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel
FROM g JOIN df USING (h) GROUP BY doc_id ORDER BY doc_id
"""


def q_embed_quant_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension int8 quantization parameters over the embedding
    table (min/max/scale — what an affine int8 ANN index or KV-cache
    quantizer calibrates from). min/max of floats involve no
    accumulation, so integerized outputs are exact against SQL.

    Distributed shape: each batch reduces its (rows × dim) matrix to
    one (dim, min, max) partial — the shuffle moves dim-count rows per
    batch regardless of corpus size; the final fold is a dim-sized
    groupby."""
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        emb = t["embedding"].combine_chunks()
        d = pc.list_value_length(emb)[0].as_py()
        m = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, d)
        return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                         "mn": pa.array(m.min(axis=0), pa.float64()),
                         "mx": pa.array(m.max(axis=0), pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                             "min_micro": pd.Series([], dtype="int64"),
                             "max_micro": pd.Series([], dtype="int64"),
                             "scale_nano": pd.Series([], dtype="int64")})
    agg = parts.groupby("dim", as_index=False).agg(mn=("mn", "min"),
                                                   mx=("mx", "max"))
    out = pd.DataFrame({
        "dim": agg["dim"].astype("int64"),
        "min_micro": np.floor(agg["mn"] * 1_000_000 + 0.5).astype("int64"),
        "max_micro": np.floor(agg["mx"] * 1_000_000 + 0.5).astype("int64"),
        "scale_nano": np.floor((agg["mx"] - agg["mn"]) / 255.0
                               * 1_000_000_000 + 0.5).astype("int64")})
    return out.sort_values("dim").reset_index(drop=True)


Q_EMBED_QUANT_SQL = """
SELECT CAST(idx AS BIGINT) AS dim,
       CAST(floor(min(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS min_micro,
       CAST(floor(max(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS max_micro,
       CAST(floor((max(CAST(v AS DOUBLE)) - min(CAST(v AS DOUBLE)))
                  / 255.0 * 1000000000 + 0.5) AS BIGINT) AS scale_nano
FROM (SELECT unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS idx
      FROM embeddings)
GROUP BY idx ORDER BY dim
"""


def q_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for contrastive training (the in-batch /
    cross-label negative selection step of a dense-retriever or
    embedding-model data pipeline): for each label's anchor vector
    (the min-vec_id member, deterministic), the top-5 most-similar
    vectors carrying a DIFFERENT label — the "hardest" negatives.

    Distributed shape: anchors are found with a per-batch
    (label -> min vec_id) partial fold (two int columns cross the
    shuffle, never embeddings), their vectors fetched by parquet
    row-filter pushdown; the anchor matrix (L x d, L = label count)
    is broadcast once via ray.put and every batch does ONE
    (rows x d) @ (d x L) matmul, emitting at most k rows per (batch,
    label) — the driver fold sees k * L * n_batches rows, never the
    corpus. Ordering is by 5-decimal-rounded similarity then vec_id
    (total order, shared with the SQL twin) so partial top-k cuts are
    exact."""
    k = 5
    ds_ids = read_parquet(_t(sf_dir, "embeddings"),
                          columns=["vec_id", "label"])

    def anchor_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"label": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64())})
        df = t.to_pandas().groupby("label", as_index=False)["vec_id"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    anchors = ds_ids.map_batches(anchor_partial, batch_format="pyarrow") \
        .to_pandas()
    empty = pd.DataFrame({"qlabel": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "cos_sim": pd.Series([], dtype="float64")})
    if anchors.empty:
        return empty
    anchors = anchors.groupby("label", as_index=False)["vec_id"].min() \
        .sort_values("label")

    import pyarrow.parquet as pq_mod
    qt = pq_mod.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "label", "embedding"],
        filters=[("vec_id", "in", anchors["vec_id"].tolist())])
    qdf = qt.to_pandas().sort_values("label")
    qmat = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    qmat = qmat / np.maximum(
        np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    qlabels = qdf["label"].to_numpy(dtype=np.int64)
    q_ref = ray.put((qmat, qlabels))

    def partial(t: pa.Table) -> pa.Table:
        out = {"qlabel": [], "vec_id": [], "cos_sim": []}
        if t.num_rows:
            qm, ql = ray.get(q_ref)
            mat = sim._normalize(sim._as_matrix(t["embedding"]))
            sims = np.round(mat @ qm.T, 5)          # rows x L
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            labels = t["label"].to_numpy(zero_copy_only=False)
            for j in range(len(ql)):
                mask = labels != ql[j]
                if not mask.any():
                    continue
                s, v = sims[mask, j], ids[mask]
                order = np.lexsort((v, -s))[:k]
                out["qlabel"].extend([int(ql[j])] * len(order))
                out["vec_id"].extend(v[order].tolist())
                out["cos_sim"].extend(s[order].tolist())
        return pa.table({"qlabel": pa.array(out["qlabel"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "cos_sim": pa.array(out["cos_sim"], pa.float64())})

    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "label", "embedding"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    parts = parts.sort_values(["qlabel", "cos_sim", "vec_id"],
                              ascending=[True, False, True])
    parts = parts.groupby("qlabel", as_index=False).head(k)
    parts["rank"] = parts.groupby("qlabel").cumcount() + 1
    return parts[["qlabel", "rank", "vec_id", "cos_sim"]] \
        .astype({"qlabel": "int64", "rank": "int64", "vec_id": "int64"}) \
        .reset_index(drop=True)


Q_HARD_NEG_SQL = """
WITH anchors AS (
  SELECT label AS qlabel, min(vec_id) AS qvec FROM embeddings GROUP BY label
), q AS (
  SELECT a.qlabel, e.embedding AS qemb
  FROM anchors a JOIN embeddings e ON e.vec_id = a.qvec
), sims AS (
  SELECT q.qlabel, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qemb AS DOUBLE[])), 5) AS cos_sim
  FROM embeddings e JOIN q ON e.label <> q.qlabel
), ranked AS (
  SELECT qlabel, vec_id, cos_sim,
         row_number() OVER (PARTITION BY qlabel
                            ORDER BY cos_sim DESC, vec_id) AS rank
  FROM sims
)
SELECT qlabel, rank, vec_id, cos_sim FROM ranked
WHERE rank <= 5 ORDER BY qlabel, rank
"""


def q_source_temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled source sampling weights (the alpha-sampling
    rule multilingual LM pipelines use to up-weight low-resource
    sources, alpha = 0.7): p_i proportional to share_i^alpha where
    share_i is source i's fraction of total corpus chars.

    Distributed shape: per-batch (source -> n_docs, chars) partials,
    one tiny source-count-sized groupby; the power/normalize step runs
    on the driver over <= n_sources rows."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), chars=("n_chars", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "share_micro": pd.Series([], dtype="int64"),
                             "p_micro": pd.Series([], dtype="int64")})
    agg = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), chars=("chars", "sum")).sort_values("source")
    share = agg["chars"].to_numpy(dtype=np.float64) / float(agg["chars"].sum())
    w = share ** 0.7
    p = w / w.sum()
    return pd.DataFrame({
        "source": agg["source"].to_numpy(),
        "n_docs": agg["n_docs"].astype("int64").to_numpy(),
        "share_micro": np.floor(share * 1_000_000 + 0.5).astype("int64"),
        "p_micro": np.floor(p * 1_000_000 + 0.5).astype("int64")}) \
        .reset_index(drop=True)


Q_SOURCE_TEMP_SQL = """
WITH s AS (
  SELECT source, count(*) AS n_docs, sum(n_chars) AS chars
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs,
         CAST(chars AS DOUBLE) / (SELECT sum(chars) FROM s) AS share,
         POWER(CAST(chars AS DOUBLE) / (SELECT sum(chars) FROM s), 0.7) AS wgt
  FROM s
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(share * 1000000 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor(wgt / (SELECT sum(wgt) FROM w) * 1000000 + 0.5) AS BIGINT)
         AS p_micro
FROM w ORDER BY source
"""


def q_dedup_cascade(sf_dir: str) -> pd.DataFrame:
    """Staged dedup accounting — the multi-pass removal ledger a corpus
    card reports: stage 1 exact text hash, stage 2 whitespace-normalized
    hash over stage-1 survivors, stage 3 first-8-token lead hash over
    stage-2 survivors; each stage keeps the min doc_id per group.
    Output: one row per stage with n_in / n_removed / n_out.

    Distributed shape: ONE kernel pass computes all three 52-bit md5
    keys per document (text never leaves the map stage); each stage is
    a native groupby-min over (key, doc_id) int64 pairs plus an inner
    join of survivors against the winners — per stage, only two-int64
    rows cross the shuffle, and the survivor set shrinks monotonically.
    Keys are the md5-prefix int52 both engines share (q_table_checksum's
    convention); 52-bit collisions under-count removals with probability
    ~n²/2⁵³ — negligible at any corpus size this ledger is read at."""
    import hashlib as _hl
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    from .rayutil import light_shuffle_aggregators, project_blocks

    def _h52(s: str) -> int:
        return int(_hl.md5(s.encode("utf-8")).hexdigest()[:13], 16)

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [t or "" for t in batch["text"]]
        toks = [t.split() for t in texts]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
            "h1": np.fromiter((_h52(t) for t in texts), np.int64,
                              len(texts)),
            "h2": np.fromiter((_h52(" ".join(tk)) for tk in toks),
                              np.int64, len(texts)),
            "h3": np.fromiter((_h52(" ".join(tk[:8])) for tk in toks),
                              np.int64, len(texts))})

    surv = project_blocks(
        ds.map_batches(keys, batch_format="pandas"),
        ["doc_id", "h1", "h2", "h3"]).materialize()
    rows = []
    for stage, col in ((1, "h1"), (2, "h2"), (3, "h3")):
        n_in = surv.count()
        if n_in == 0:
            break
        winners = project_blocks(
            surv.groupby(col).min("doc_id"), [col, "min(doc_id)"])
        with light_shuffle_aggregators():
            surv = project_blocks(
                surv.join(winners.rename_columns(
                    {"min(doc_id)": "doc_id"}),
                    join_type="inner", num_partitions=8,
                    on=(col, "doc_id")),
                ["doc_id", "h1", "h2", "h3"]).materialize()
        n_out = surv.count()
        rows.append({"stage": stage, "n_in": n_in,
                     "n_removed": n_in - n_out, "n_out": n_out})
    return pd.DataFrame(rows, columns=["stage", "n_in", "n_removed",
                                       "n_out"]).astype("int64", errors="ignore")


Q_DEDUP_CASCADE_SQL = r"""
WITH k AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 13)) AS BIGINT) AS h1,
         CAST(concat('0x', substr(md5(array_to_string(
           list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
           ' ')), 1, 13)) AS BIGINT) AS h2,
         CAST(concat('0x', substr(md5(array_to_string(
           list_filter(string_split_regex(text, '\s+'),
                       x -> x <> '')[1:8], ' ')), 1, 13)) AS BIGINT) AS h3
  FROM documents),
s1 AS (SELECT * FROM k
       QUALIFY doc_id = min(doc_id) OVER (PARTITION BY h1)),
s2 AS (SELECT * FROM s1
       QUALIFY doc_id = min(doc_id) OVER (PARTITION BY h2)),
s3 AS (SELECT * FROM s2
       QUALIFY doc_id = min(doc_id) OVER (PARTITION BY h3))
SELECT * FROM (
  SELECT 1 AS stage, (SELECT count(*) FROM k) AS n_in,
         (SELECT count(*) FROM k) - (SELECT count(*) FROM s1) AS n_removed,
         (SELECT count(*) FROM s1) AS n_out
  UNION ALL
  SELECT 2, (SELECT count(*) FROM s1),
         (SELECT count(*) FROM s1) - (SELECT count(*) FROM s2),
         (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, (SELECT count(*) FROM s2),
         (SELECT count(*) FROM s2) - (SELECT count(*) FROM s3),
         (SELECT count(*) FROM s3))
WHERE (SELECT count(*) FROM k) > 0
ORDER BY stage
"""


def q_embedding_norm_outliers(sf_dir: str) -> pd.DataFrame:
    """Embedding-hygiene gate: vectors whose L2 norm sits more than 2
    sample standard deviations from the corpus mean — the cheap
    broken-row detector (truncated writes, wrong-scale encoders) run
    before any cosine math that assumes comparable norms.

    Precision story: unit-normalized corpora (this fixture) spread
    their norms over ~1e-8, so norms integerize at NANO and the
    moments run over MIN-CENTERED values — z is translation-invariant,
    and centering keeps Σv² small enough to stay exact in int64 /
    plain doubles on both engines (raw nano-norms squared would need
    HUGEINT and then cancel catastrophically in the variance).

    Distributed shape: pass 1 maps each batch to (vec_id, norm_nano)
    int64 pairs, materialized once (two int columns); pass 2 folds a
    per-batch min; pass 3 folds centered (n, Σ, Σ²) — one row per
    batch reaches the driver each time; pass 4 re-filters the pairs
    against the broadcast μ/σ. Every pass streams block-parallel."""
    ds = read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id",
                                                         "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "norm_nano": pa.array([], pa.int64())})
        m = sim._as_matrix(t["embedding"])
        nm = np.floor(np.sqrt((m * m).sum(axis=1)) * 1_000_000_000 + 0.5) \
            .astype(np.int64)
        return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()),
                         "norm_nano": pa.array(nm, pa.int64())})

    pairs = ds.map_batches(norms, batch_format="pyarrow").materialize()
    empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "norm_nano": pd.Series([], dtype="int64"),
                          "z_milli": pd.Series([], dtype="int64")})

    def min_partial(t: pa.Table) -> pa.Table:
        v = t["norm_nano"].to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array(
            [int(v.min())] if len(v) else [], pa.int64())})

    mins = pairs.map_batches(min_partial, batch_format="pyarrow") \
        .to_pandas()
    if mins.empty:
        return empty
    base = int(mins["mn"].min())

    def moment_partial(t: pa.Table) -> pa.Table:
        v = t["norm_nano"].to_numpy(zero_copy_only=False) - base
        # centered values span the norm SPREAD (not the norm scale), so
        # Σv² fits int64 for any unit-ish corpus; the object-dtype
        # square makes a pathological spread RAISE at pa.array instead
        # of wrapping silently in numpy int64
        s2 = int((v.astype(object) * v.astype(object)).sum()) \
            if len(v) else 0
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "s": pa.array([int(v.sum()) if len(v) else 0],
                                       pa.int64()),
                         "s2": pa.array([s2], pa.int64())})

    mom = pairs.map_batches(moment_partial, batch_format="pyarrow") \
        .to_pandas()
    cnt = int(mom["n"].sum())
    if cnt < 2:
        return empty
    s = int(mom["s"].sum())
    s2 = int(mom["s2"].sum())
    var = (float(s2) - float(s) * float(s) / cnt) / (cnt - 1)
    if var <= 0:
        return empty
    mu, sd = s / cnt, float(np.sqrt(var))

    def flag(t: pa.Table) -> pa.Table:
        v = t["norm_nano"].to_numpy(zero_copy_only=False)
        z = ((v - base) - mu) / sd
        keep = np.abs(z) > 2.0
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()).filter(
                pa.array(keep)),
            "norm_nano": pa.array(v[keep], pa.int64()),
            "z_milli": pa.array(np.floor(z[keep] * 1000).astype(np.int64),
                                pa.int64())})

    out = pairs.map_batches(flag, batch_format="pyarrow").to_pandas()
    if not len(out):
        return empty
    return out.astype("int64").sort_values("vec_id").reset_index(drop=True)


Q_NORM_OUTLIERS_SQL = """
WITH sq AS (
  SELECT vec_id, sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS ss
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
  GROUP BY vec_id),
n AS (SELECT vec_id,
             CAST(floor(sqrt(ss) * 1000000000 + 0.5) AS BIGINT)
               AS norm_nano
      FROM sq),
c AS (SELECT vec_id, norm_nano,
             norm_nano - (SELECT min(norm_nano) FROM n) AS v FROM n),
m AS (SELECT count(*) AS cnt, sum(v) AS s, sum(v * v) AS s2 FROM c)
SELECT vec_id, norm_nano,
       CAST(floor((v - s / cnt)
                  / sqrt((CAST(s2 AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt)
                         / (cnt - 1)) * 1000)
            AS BIGINT) AS z_milli
FROM c, m
WHERE cnt >= 2
  AND (CAST(s2 AS DOUBLE)
       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1) > 0
  AND abs((v - s / cnt)
          / sqrt((CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt)
                 / (cnt - 1))) > 2
ORDER BY vec_id
"""


def q_quality_curriculum(sf_dir: str) -> pd.DataFrame:
    """Curriculum-learning stage assignment: documents bucket into 4
    quality quartiles by exact global rank of a blended quality score
    (0.7·stopword_ratio + 0.3·(1 − punct_ratio), milli-integerized) —
    the easy-to-hard data-ordering step of a curriculum training run.
    Output: per stage, doc count and the score band it spans.

    Distributed shape: the text-derived score leaves the kernel as one
    (doc_id, score_milli) int64 pair per document; global quartiles
    come from windows.global_rank_by_value (value-range partitions,
    no driver sort — q_order_price_deciles' machinery); the final
    per-stage fold sees ≤ 4 rows per batch. Blend runs on UNROUNDED
    ratios with the identical double expression in both engines."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    q = to.quality_scores(ds)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        s = 0.7 * b["stopword_ratio"].to_numpy(dtype=np.float64) \
            + 0.3 * (1.0 - b["punct_ratio"].to_numpy(dtype=np.float64))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
            "score_milli": np.floor(s * 1000 + 0.5).astype(np.int64)})

    scored = q.map_batches(score, batch_format="pandas")
    n = scored.count()
    empty = pd.DataFrame({"stage": pd.Series([], dtype="int64"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "min_score_milli": pd.Series([], dtype="int64"),
                          "max_score_milli": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    ranks = wn.global_rank_by_value(scored, value_col="score_milli",
                                    id_col="doc_id")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "stage": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64")})
        st = batch["rank"].to_numpy() * 4 // n
        g = batch.assign(stage=st).groupby("stage").agg(
            n_docs=("rank", "size"), mn=("score_milli", "min"),
            mx=("score_milli", "max")).reset_index()
        return g.astype("int64")

    parts = ranks.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("stage", as_index=False).agg(
        n_docs=("n_docs", "sum"), min_score_milli=("mn", "min"),
        max_score_milli=("mx", "max"))
    return out.astype("int64").sort_values("stage").reset_index(drop=True)


Q_QUALITY_CURRICULUM_SQL = rf"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
q AS (
  SELECT doc_id,
         CASE WHEN length(words) = 0 THEN 0
              ELSE length(list_filter(words,
                     x -> list_contains([{_EN_STOPS_SQL}], lower(x))))
                   / CAST(length(words) AS DOUBLE) END AS sr,
         CASE WHEN length(text) = 0 THEN 0
              ELSE (length(text)
                    - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) END AS pr
  FROM w),
s AS (SELECT doc_id,
             CAST(floor((0.7 * sr + 0.3 * (1 - pr)) * 1000 + 0.5)
                  AS BIGINT) AS score_milli
      FROM q),
r AS (SELECT score_milli,
             row_number() OVER (ORDER BY score_milli, doc_id) - 1 AS rn
      FROM s),
n AS (SELECT count(*) AS n FROM s)
SELECT CAST((rn * 4) // n.n AS BIGINT) AS stage,
       count(*)::BIGINT AS n_docs,
       min(score_milli)::BIGINT AS min_score_milli,
       max(score_milli)::BIGINT AS max_score_milli
FROM r, n GROUP BY 1 ORDER BY stage
"""


def q_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-rules composite quality filter (textops.gopher_quality —
    Rae et al. 2021's published heuristic set as 7 integer flags +
    pass_all; pure per-batch map, every ratio an integer
    cross-multiplication shared with the SQL twin)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.gopher_quality(ds).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "n_words", "r_wordcount",
                                       "r_meanlen", "r_symbol", "r_bullet",
                                       "r_ellipsis", "r_alpha", "r_stop",
                                       "pass_all")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_GOPHER_QUALITY_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '')
             AS words,
         string_split(text, chr(10)) AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         coalesce(list_aggregate(list_transform(words,
                      x -> length(x)), 'sum'), 0) AS total_chars,
         len(list_filter(words,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have',
                          'with'],
                 s -> list_contains(list_transform(words,
                          x -> lower(x)), s))) AS n_stop,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
           + (length(text) - length(replace(text, chr(8230), '')))
             AS n_sym,
         len(lines) AS n_lines,
         len(list_filter(lines,
                 l -> l LIKE chr(8226) || '%' OR l LIKE '-%'
                      OR l LIKE '*%')) AS n_bullet,
         len(list_filter(lines,
                 l -> l LIKE '%...' OR l LIKE '%' || chr(8230)))
             AS n_ell
  FROM w)
SELECT doc_id, n_words::BIGINT AS n_words,
       CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS r_wordcount,
       CAST(n_words > 0 AND 3 * n_words <= total_chars
            AND total_chars <= 10 * n_words AS BIGINT) AS r_meanlen,
       CAST(10 * n_sym <= n_words AS BIGINT) AS r_symbol,
       CAST(10 * n_bullet <= 9 * n_lines AS BIGINT) AS r_bullet,
       CAST(10 * n_ell <= 3 * n_lines AS BIGINT) AS r_ellipsis,
       CAST(5 * n_alpha >= 4 * n_words AS BIGINT) AS r_alpha,
       CAST(n_stop >= 2 AS BIGINT) AS r_stop,
       CAST((n_words BETWEEN 50 AND 100000)
            AND (n_words > 0 AND 3 * n_words <= total_chars
                 AND total_chars <= 10 * n_words)
            AND 10 * n_sym <= n_words
            AND 10 * n_bullet <= 9 * n_lines
            AND 10 * n_ell <= 3 * n_lines
            AND 5 * n_alpha >= 4 * n_words
            AND n_stop >= 2 AS BIGINT) AS pass_all
FROM m ORDER BY doc_id
"""


def q_codepoint_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document codepoint Shannon entropy
    (textops.codepoint_entropy — np.unique over the UTF-32 view; the
    tokenizer-free gibberish/base64 probe)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.codepoint_entropy(ds).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "n_chars",
                                       "sum_clnc_micro", "entropy_milli")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_CODEPOINT_ENTROPY_SQL = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
  FROM documents WHERE length(text) > 0),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
per AS (SELECT doc_id, sum(c) AS n_chars,
               sum(CAST(floor(ln(CAST(c AS DOUBLE)) * c * 1e6)
                        AS BIGINT)) AS sum_clnc_micro
        FROM cnt GROUP BY doc_id)
SELECT doc_id, n_chars::BIGINT AS n_chars,
       sum_clnc_micro::BIGINT AS sum_clnc_micro,
       CAST(floor((ln(CAST(n_chars AS DOUBLE))
                   - (sum_clnc_micro / 1e6) / n_chars) * 1000)
            AS BIGINT) AS entropy_milli
FROM per ORDER BY doc_id
"""


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Per-source Zipf slope over the top-100 tokens
    (textops.source_zipf_slope — pair-bucketed final counts,
    per-bucket top-K prune, integer least-squares partials)."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["source", "text"])
    out = to.source_zipf_slope(ds, group_col="source",
                               text_col="text").to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_top": pd.Series([], dtype="int64"),
            "slope_milli": pd.Series([], dtype="int64")})
    return out.sort_values("source").reset_index(drop=True)


Q_ZIPF_SLOPE_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
  FROM documents),
cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
ranked AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, w ASC) AS rn
  FROM cnt),
xy AS (
  SELECT source,
         CAST(floor(ln(CAST(rn AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM ranked WHERE rn <= 100),
agg AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY source HAVING count(*) >= 2)
SELECT source, n::BIGINT AS n_top,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * 1000)
            AS BIGINT) AS slope_milli
FROM agg ORDER BY source
"""


def q_line_dup_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition rules, line/paragraph half
    (textops.line_dup_stats — Rae'21 §A1.2 duplicate-line/paragraph
    fractions as integer counts + the four threshold flags)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.line_dup_stats(ds).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "n_lines", "line_chars",
                                       "dup_lines", "dup_line_chars",
                                       "n_paras", "para_chars",
                                       "dup_paras", "dup_para_chars",
                                       "f_dup_line", "f_dup_para",
                                       "f_dup_line_chars",
                                       "f_dup_para_chars")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_LINE_DUP_SQL = r"""
WITH u AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS v,
         'line' AS gran FROM documents
  UNION ALL
  SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS v,
         'para' AS gran FROM documents),
cnt AS (SELECT doc_id, gran, v, count(*) AS c, length(v) AS lv
        FROM u GROUP BY doc_id, gran, v),
per AS (
  SELECT doc_id, gran,
         sum(c)::BIGINT AS n_units,
         sum(c * lv)::BIGINT AS unit_chars,
         sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::BIGINT AS dup,
         sum(CASE WHEN c > 1 THEN (c - 1) * lv ELSE 0 END)::BIGINT
             AS dup_chars
  FROM cnt GROUP BY doc_id, gran)
SELECT l.doc_id,
       l.n_units AS n_lines, l.unit_chars AS line_chars,
       l.dup AS dup_lines, l.dup_chars AS dup_line_chars,
       p.n_units AS n_paras, p.unit_chars AS para_chars,
       p.dup AS dup_paras, p.dup_chars AS dup_para_chars,
       CAST(10 * l.dup <= 3 * l.n_units AS BIGINT) AS f_dup_line,
       CAST(10 * p.dup <= 3 * p.n_units AS BIGINT) AS f_dup_para,
       CAST(5 * l.dup_chars <= l.unit_chars AS BIGINT)
           AS f_dup_line_chars,
       CAST(5 * p.dup_chars <= p.unit_chars AS BIGINT)
           AS f_dup_para_chars
FROM (SELECT * FROM per WHERE gran = 'line') l
JOIN (SELECT * FROM per WHERE gran = 'para') p USING (doc_id)
ORDER BY doc_id
"""


def q_c4_line_filter(sf_dir: str) -> pd.DataFrame:
    """C4 cleaning rules (textops.c4_line_filter — Raffel'20 §2.2:
    terminal-punct + ≥5-word + no-javascript line keep, then the
    ≥3-sentence / lorem-ipsum / curly-brace page gate)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.c4_line_filter(ds).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "n_lines",
                                       "n_kept_lines", "kept_chars",
                                       "n_sentences", "f_lorem",
                                       "f_brace", "pass_all")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_C4_LINE_SQL = r"""
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
  FROM documents),
k AS (
  SELECT doc_id, ln FROM l
  WHERE (ln LIKE '%.' OR ln LIKE '%!' OR ln LIKE '%?'
         OR ln LIKE '%"')
    AND len(list_filter(string_split_regex(ln, '\s+'),
                        x -> x <> '')) >= 5
    AND lower(ln) NOT LIKE '%javascript%'),
ks AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept_lines,
         sum(length(ln))::BIGINT AS kept_chars,
         sum(length(ln) - length(replace(ln, '.', ''))
             + length(ln) - length(replace(ln, '!', ''))
             + length(ln) - length(replace(ln, '?', '')))::BIGINT
             AS n_sentences
  FROM k GROUP BY doc_id),
ls AS (SELECT doc_id, count(*)::BIGINT AS n_lines
       FROM l GROUP BY doc_id),
pg AS (
  SELECT doc_id,
         CAST(lower(text) NOT LIKE '%lorem ipsum%' AS BIGINT)
             AS f_lorem,
         CAST(text NOT LIKE '%{%' AS BIGINT) AS f_brace
  FROM documents)
SELECT d.doc_id, ls.n_lines,
       coalesce(ks.n_kept_lines, 0) AS n_kept_lines,
       coalesce(ks.kept_chars, 0) AS kept_chars,
       coalesce(ks.n_sentences, 0) AS n_sentences,
       pg.f_lorem, pg.f_brace,
       CAST(coalesce(ks.n_sentences, 0) >= 3 AND pg.f_lorem = 1
            AND pg.f_brace = 1 AS BIGINT) AS pass_all
FROM documents d
JOIN ls USING (doc_id) JOIN pg USING (doc_id)
LEFT JOIN ks USING (doc_id)
ORDER BY doc_id
"""


def q_ngram_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition rules, n-gram half
    (textops.ngram_repetition_stats — Rae'21 §A1.2 top-2/3/4-gram
    char-fraction + all-dup-5..10-gram char-fraction signals with the
    published threshold flags)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.ngram_repetition_stats(ds).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        cols = (["doc_id", "norm_chars"]
                + [f"top{n}_c" for n in (2, 3, 4)]
                + [f"top{n}_chars" for n in (2, 3, 4)]
                + [f"dup{n}_chars" for n in range(5, 11)]
                + [f"f_top{n}" for n in (2, 3, 4)]
                + [f"f_dup{n}" for n in range(5, 11)])
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_NGRAM_REP_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents),
exp AS (
  SELECT doc_id, ws, unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS n FROM d),
pos AS (
  SELECT doc_id, ws, n,
         unnest(range(1, greatest(len(ws) - n + 2, 1))) AS i
  FROM exp),
g AS (
  SELECT doc_id, n,
         array_to_string(list_slice(ws, i, i + n - 1), ' ') AS gram
  FROM pos),
cnt AS (
  SELECT doc_id, n, gram, count(*) AS c, length(gram) AS lg
  FROM g GROUP BY doc_id, n, gram),
top AS (
  SELECT doc_id, n, c AS top_c, c * lg AS top_chars
  FROM (SELECT doc_id, n, c, lg,
               row_number() OVER (PARTITION BY doc_id, n
                                  ORDER BY c DESC, gram ASC) AS rn
        FROM cnt) WHERE rn = 1 AND n <= 4),
dup AS (
  SELECT doc_id, n,
         sum(CASE WHEN c > 1 THEN c * lg ELSE 0 END)::BIGINT AS dc
  FROM cnt WHERE n >= 5 GROUP BY doc_id, n),
tw AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN top_c END) AS top2_c,
         max(CASE WHEN n = 3 THEN top_c END) AS top3_c,
         max(CASE WHEN n = 4 THEN top_c END) AS top4_c,
         max(CASE WHEN n = 2 THEN top_chars END) AS top2_chars,
         max(CASE WHEN n = 3 THEN top_chars END) AS top3_chars,
         max(CASE WHEN n = 4 THEN top_chars END) AS top4_chars
  FROM top GROUP BY doc_id),
dw AS (
  SELECT doc_id,
         max(CASE WHEN n = 5 THEN dc END) AS dup5_chars,
         max(CASE WHEN n = 6 THEN dc END) AS dup6_chars,
         max(CASE WHEN n = 7 THEN dc END) AS dup7_chars,
         max(CASE WHEN n = 8 THEN dc END) AS dup8_chars,
         max(CASE WHEN n = 9 THEN dc END) AS dup9_chars,
         max(CASE WHEN n = 10 THEN dc END) AS dup10_chars
  FROM dup GROUP BY doc_id),
base AS (
  SELECT doc_id,
         coalesce(length(array_to_string(ws, ' ')), 0)::BIGINT
             AS norm_chars
  FROM d),
fin AS (
  SELECT b.doc_id, b.norm_chars,
         coalesce(tw.top2_c, 0)::BIGINT AS top2_c,
         coalesce(tw.top3_c, 0)::BIGINT AS top3_c,
         coalesce(tw.top4_c, 0)::BIGINT AS top4_c,
         coalesce(tw.top2_chars, 0)::BIGINT AS top2_chars,
         coalesce(tw.top3_chars, 0)::BIGINT AS top3_chars,
         coalesce(tw.top4_chars, 0)::BIGINT AS top4_chars,
         coalesce(dw.dup5_chars, 0)::BIGINT AS dup5_chars,
         coalesce(dw.dup6_chars, 0)::BIGINT AS dup6_chars,
         coalesce(dw.dup7_chars, 0)::BIGINT AS dup7_chars,
         coalesce(dw.dup8_chars, 0)::BIGINT AS dup8_chars,
         coalesce(dw.dup9_chars, 0)::BIGINT AS dup9_chars,
         coalesce(dw.dup10_chars, 0)::BIGINT AS dup10_chars
  FROM base b LEFT JOIN tw USING (doc_id) LEFT JOIN dw USING (doc_id))
SELECT *,
       CAST(100 * top2_chars <= 20 * norm_chars AS BIGINT) AS f_top2,
       CAST(100 * top3_chars <= 18 * norm_chars AS BIGINT) AS f_top3,
       CAST(100 * top4_chars <= 16 * norm_chars AS BIGINT) AS f_top4,
       CAST(100 * dup5_chars <= 15 * norm_chars AS BIGINT) AS f_dup5,
       CAST(100 * dup6_chars <= 14 * norm_chars AS BIGINT) AS f_dup6,
       CAST(100 * dup7_chars <= 13 * norm_chars AS BIGINT) AS f_dup7,
       CAST(100 * dup8_chars <= 12 * norm_chars AS BIGINT) AS f_dup8,
       CAST(100 * dup9_chars <= 11 * norm_chars AS BIGINT) AS f_dup9,
       CAST(100 * dup10_chars <= 10 * norm_chars AS BIGINT) AS f_dup10
FROM fin ORDER BY doc_id
"""


def q_semdedup(sf_dir: str) -> pd.DataFrame:
    """Semantic dedup (dedup.semdedup — SemDeDup-shaped seeded
    cluster assignment + within-cluster greedy keep-first cosine
    prune at 0.45; only cluster members ever meet pairwise)."""
    ds = read_parquet(_t(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    out = dd.semdedup(ds, n_seeds=8, threshold=0.45).to_pandas()
    if not len(out):        # zero-block empty loses its columns
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "cluster": pd.Series([], dtype="int64"),
            "seed_sim": pd.Series([], dtype="float64"),
            "kept": pd.Series([], dtype="int64")})
    return out.sort_values("vec_id").reset_index(drop=True)


Q_SEMDEDUP_SQL = """
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS semb
  FROM embeddings ORDER BY vec_id LIMIT 8),
sim AS (
  SELECT e.vec_id, s.sid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(s.semb AS DOUBLE[])), 5) AS cs
  FROM embeddings e CROSS JOIN seeds s),
a AS (
  SELECT vec_id, sid AS cluster, cs AS seed_sim
  FROM (SELECT vec_id, sid, cs,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, sid ASC) AS rn
        FROM sim)
  WHERE rn = 1),
dup AS (
  SELECT v.vec_id
  FROM a v
  JOIN a u ON u.cluster = v.cluster AND u.vec_id < v.vec_id
  JOIN embeddings ev ON ev.vec_id = v.vec_id
  JOIN embeddings eu ON eu.vec_id = u.vec_id
  WHERE round(list_cosine_similarity(CAST(eu.embedding AS DOUBLE[]),
                                     CAST(ev.embedding AS DOUBLE[])), 5)
        >= 0.45
  GROUP BY v.vec_id)
SELECT a.vec_id, a.cluster, a.seed_sim,
       CAST(dup.vec_id IS NULL AS BIGINT) AS kept
FROM a LEFT JOIN dup USING (vec_id)
ORDER BY vec_id
"""


def q_tokenizer_fertility(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility audit — UTF-8 bytes per BPE-ish token, per
    source (the compression-rate signal that decides which domains eat
    a token budget; multilingual corpora routinely differ 2-4× here).
    Per-batch (source, n_docs, n_bytes, n_bpe) combiner — one row per
    (source, batch) crosses the shuffle — then a salted fold and one
    integer floor division shared with the twin (``(bytes·1e6)//tokens``
    — no float mean, no rounding seam)."""
    from .rayutil import bucketed_group_sum
    ds = read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "one": pd.Series([], dtype="int64"),
                "nb": pd.Series([], dtype="int64"),
                "nt": pd.Series([], dtype="int64")})
        texts = b["text"].fillna("")
        nb = np.fromiter((len(t.encode("utf-8")) for t in texts),
                         dtype=np.int64, count=len(texts))
        nt = np.fromiter((len(_BPE_RE.findall(t)) for t in texts),
                         dtype=np.int64, count=len(texts))
        g = pd.DataFrame({
            "source": pd.Series(b["source"].to_numpy(), dtype="object"),
            "one": np.ones(len(b), dtype=np.int64),
            "nb": nb, "nt": nt}) \
            .groupby("source", as_index=False).sum()
        return g.astype({"one": "int64", "nb": "int64", "nt": "int64"})

    agg = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], {"one": "n_docs", "nb": "n_bytes", "nt": "n_bpe"}) \
        .to_pandas()
    if not len(agg):
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_bytes": pd.Series([], dtype="int64"),
            "n_bpe": pd.Series([], dtype="int64"),
            "bytes_per_token_micro": pd.Series([], dtype="int64")})
    nb = agg["n_bytes"].to_numpy(dtype=np.int64)
    nt = agg["n_bpe"].to_numpy(dtype=np.int64)
    agg["bytes_per_token_micro"] = np.where(
        nt > 0, (nb * 1_000_000) // np.maximum(nt, 1), 0).astype(np.int64)
    return agg[["source", "n_docs", "n_bytes", "n_bpe",
                "bytes_per_token_micro"]] \
        .sort_values("source").reset_index(drop=True)


Q_TOKENIZER_FERTILITY_SQL = rf"""
WITH d AS (
  SELECT source,
         strlen(coalesce(text, '')) AS nb,
         length(regexp_extract_all(coalesce(text, ''), '{_BPE_PAT}')) AS nt
  FROM documents)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(nb)::BIGINT AS n_bytes,
       sum(nt)::BIGINT AS n_bpe,
       (CASE WHEN sum(nt) = 0 THEN 0
             ELSE (sum(nb) * 1000000) // sum(nt) END)::BIGINT
           AS bytes_per_token_micro
FROM d GROUP BY source ORDER BY source
"""


def q_mask_pii_extended(sf_dir: str) -> pd.DataFrame:
    """Four-category PII redaction (email → phone → IPv4 → SSN) over a
    contact blurb derived deterministically from `customer` (same
    synthesis rationale as q_mask_pii: the documents fixture contains
    no PII). Exercises the pass-ORDER semantics — a masked phone's
    digits must never be re-claimed as an SSN — with the oracle nesting
    its regexp_replace calls identically."""
    from .functions.textops import mask_pii_extended

    def contact(batch: pd.DataFrame) -> pd.DataFrame:
        name = batch["c_name"]
        key = batch["c_custkey"]
        email = (name.str.replace("#", "", regex=False).str.lower()
                 + "@corp" + batch["c_nationkey"].astype(str)
                 + ".example.com")
        phone = ("+1-" + ((key * 7) % 900 + 100).astype(str) + "-555-"
                 + ((key * 13) % 10000).astype(str).str.zfill(4))
        ip = ("10." + (key % 256).astype(str) + "."
              + ((key * 3) % 256).astype(str) + "."
              + ((key * 7) % 256).astype(str))
        ssn = (((key * 37) % 1000).astype(str).str.zfill(3) + "-"
               + ((key * 11) % 100).astype(str).str.zfill(2) + "-"
               + ((key * 13) % 10000).astype(str).str.zfill(4))
        return pd.DataFrame({
            "c_custkey": key,
            "text": "Reach " + name + " (ssn " + ssn + ") via " + email
                    + " or " + phone + " from " + ip + "."})

    ds = read_parquet(_t(sf_dir, "customer"),
                      columns=["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(contact, batch_format="pandas")
    out = mask_pii_extended(ds, text_col="text", id_col="c_custkey") \
        .to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_MASK_PII_EXT_SQL = r"""
WITH t AS (
  SELECT c_custkey,
         'Reach ' || c_name || ' (ssn '
           || lpad(((c_custkey * 37) % 1000)::VARCHAR, 3, '0') || '-'
           || lpad(((c_custkey * 11) % 100)::VARCHAR, 2, '0') || '-'
           || lpad(((c_custkey * 13) % 10000)::VARCHAR, 4, '0')
           || ') via ' || lower(replace(c_name, '#', ''))
           || '@corp' || c_nationkey || '.example.com or +1-'
           || ((c_custkey * 7) % 900 + 100) || '-555-'
           || lpad(((c_custkey * 13) % 10000)::VARCHAR, 4, '0')
           || ' from 10.' || (c_custkey % 256) || '.'
           || ((c_custkey * 3) % 256) || '.'
           || ((c_custkey * 7) % 256) || '.' AS txt
  FROM customer),
p1 AS (
  SELECT c_custkey,
         length(regexp_extract_all(
           txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
           AS n_email,
         regexp_replace(
           txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS t1
  FROM t),
p2 AS (
  SELECT c_custkey, n_email,
         length(regexp_extract_all(
           t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))::BIGINT
           AS n_phone,
         regexp_replace(t1, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}',
                        '<PHONE>', 'g') AS t2
  FROM p1),
p3 AS (
  SELECT c_custkey, n_email, n_phone,
         length(regexp_extract_all(
           t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
           ::BIGINT AS n_ip,
         regexp_replace(
           t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
           '<IP>', 'g') AS t3
  FROM p2)
SELECT c_custkey, n_email, n_phone, n_ip,
       length(regexp_extract_all(
         t3, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))::BIGINT AS n_ssn,
       regexp_replace(t3, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b',
                      '<SSN>', 'g') AS masked
FROM p3 ORDER BY c_custkey
"""


def q_contamination_rate(sf_dir: str) -> pd.DataFrame:
    """Graded benchmark decontamination (Brown et al. 2020 §C judge a
    document "dirty" by its eval-overlap FRACTION, not a binary hit):
    for every train doc with ≥1 distinct 4-gram, its distinct-gram
    count, eval-hit count and the integer cross-multiplied dirty flag
    (``n_hits·20 ≥ n_grams`` — ≥5 %). textops.contamination_stats:
    eval set ray.put once, probed per batch, zero shuffle."""
    from .functions.splits import assign_split
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    split = assign_split(ds)

    def keep(where: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b[(b["split"] == "test") == where]
        return f

    eval_grams = to.eval_ngram_set(
        split.map_batches(keep(True), batch_format="pandas"), n=4)
    train = split.map_batches(keep(False), batch_format="pandas")
    out = to.contamination_stats(train, eval_grams, n=4).to_pandas()
    if not len(out):
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ("doc_id", "n_grams", "n_hits",
                                      "is_dirty")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_CONTAMINATION_RATE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 10 = 9 AS is_eval,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents),
g AS (
  SELECT DISTINCT doc_id, is_eval,
         words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]
                 || ' ' || words[i + 3] AS ngram
  FROM (SELECT doc_id, is_eval, words,
               unnest(range(1, len(words) - 2)) AS i FROM w)),
eg AS (SELECT DISTINCT ngram FROM g WHERE is_eval),
t AS (SELECT g.doc_id,
             count(*)::BIGINT AS n_grams,
             count(eg.ngram)::BIGINT AS n_hits
      FROM g LEFT JOIN eg USING (ngram)
      WHERE NOT g.is_eval GROUP BY g.doc_id)
SELECT doc_id, n_grams, n_hits,
       CAST(n_hits * 20 >= n_grams AS BIGINT) AS is_dirty
FROM t ORDER BY doc_id
"""


def q_ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet head/middle/tail split (Wenzek et al.'20 §4.3: documents
    tercile-bucketed by LM perplexity; "head" trains, "tail" is
    dropped). Composes _lm_nll_dataset (the oracle-pinned unigram-LM
    scorer) with windows.global_rank_by_value — value-range partitions,
    no driver sort — so the scores are ranked WITHOUT ever collecting
    them; the final per-bucket fold sees ≤3 rows per batch."""
    scores = _lm_nll_dataset(sf_dir)
    empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                          for c in ("bucket", "n_docs", "min_nll_milli",
                                    "max_nll_milli")})
    if scores is None:
        return empty
    scores = scores.materialize()
    n = scores.count()
    if n == 0:
        return empty
    ranks = wn.global_rank_by_value(scores, value_col="nll_milli",
                                    id_col="doc_id")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64")})
        bk = batch["rank"].to_numpy() * 3 // n
        g = batch.assign(bucket=bk).groupby("bucket").agg(
            n_docs=("rank", "size"), mn=("nll_milli", "min"),
            mx=("nll_milli", "max")).reset_index()
        return g.astype("int64")

    parts = ranks.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bucket", as_index=False).agg(
        n_docs=("n_docs", "sum"), min_nll_milli=("mn", "min"),
        max_nll_milli=("mx", "max"))
    return out.astype("int64").sort_values("bucket").reset_index(drop=True)


Q_CCNET_BUCKETS_SQL = r"""
WITH tok AS (SELECT doc_id,
                    ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
             FROM (SELECT doc_id,
                          unnest(list_filter(
                              string_split_regex(text, '\s+'),
                              x -> x <> '')) AS t
                   FROM documents)),
dt AS (SELECT doc_id, h, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
ct AS (SELECT h, sum(tf)::BIGINT AS c FROM dt GROUP BY h),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM ct),
terms AS (SELECT dt.doc_id, dt.tf,
                 CAST(floor(ln(ct.c) * dt.tf * 1000000) AS BIGINT) AS t1
          FROM dt JOIN ct USING (h)),
agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
               sum(t1)::BIGINT AS s1
        FROM terms GROUP BY doc_id),
s AS (SELECT doc_id,
             CAST(floor((ln(total) - s1 / 1000000.0 / n_tokens) * 1000)
                  AS BIGINT) AS nll_milli
      FROM agg, tot),
r AS (SELECT nll_milli,
             row_number() OVER (ORDER BY nll_milli, doc_id) - 1 AS rn
      FROM s),
n AS (SELECT count(*) AS n FROM s)
SELECT CAST((rn * 3) // n.n AS BIGINT) AS bucket,
       count(*)::BIGINT AS n_docs,
       min(nll_milli)::BIGINT AS min_nll_milli,
       max(nll_milli)::BIGINT AS max_nll_milli
FROM r, n GROUP BY 1 ORDER BY bucket
"""


def q_dup_span_coverage(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr span-removal budget (Lee'22 CUTS duplicated spans;
    this measures the per-doc character count that cut would remove):
    interval-UNION length of all cross-doc duplicated anchor windows —
    overlapping windows counted once (textops.dup_span_coverage;
    duplicated vocabulary filtered BEFORE the join, per-doc union via
    one vectorized groupby.cummax pass per salt bucket)."""
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to.dup_span_coverage(ds).to_pandas()
    if not len(out):
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ("doc_id", "n_chars",
                                      "covered_chars", "covered_milli")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DUP_SPAN_COVERAGE_SQL = r"""
WITH pos AS (
  SELECT doc_id, text, length(text) AS n_chars,
         unnest(range(1, length(text) - 30 + 2)) AS p
  FROM documents WHERE length(text) >= 30
), anch AS (
  SELECT doc_id, n_chars, p,
         ('0x' || substr(md5(substr(text, p, 30)), 1, 15))::BIGINT AS h
  FROM pos
  WHERE (unicode(substr(text, p, 1))::BIGINT * 16974593
       + unicode(substr(text, p + 1, 1))::BIGINT * 66049
       + unicode(substr(text, p + 2, 1))::BIGINT * 257
       + unicode(substr(text, p + 3, 1))::BIGINT) % 4 = 0
), hcnt AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM anch GROUP BY h
), dup AS (
  SELECT a.doc_id, a.n_chars, a.p
  FROM anch a JOIN hcnt c ON a.h = c.h WHERE c.n_docs >= 2
), seg AS (
  SELECT doc_id, n_chars, p,
         max(p + 30) OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM dup
), cov AS (
  SELECT doc_id, any_value(n_chars) AS n_chars,
         sum(greatest(0, p + 30 - greatest(p, coalesce(pmax, 0))))
           AS covered
  FROM seg GROUP BY doc_id
)
SELECT doc_id, n_chars::BIGINT AS n_chars,
       covered::BIGINT AS covered_chars,
       ((covered * 1000) // n_chars)::BIGINT AS covered_milli
FROM cov ORDER BY doc_id
"""


def q_prep_funnel(sf_dir: str) -> pd.DataFrame:
    """Per-source admission funnel over the published-rule suite
    (pipelines.corpus_prep.prep_funnel): train docs → Gopher rules →
    C4 page gate → decontamination → exact-dedup survivor, one count
    per stage per source. The SQL twin is ASSEMBLED verbatim from the
    stage operators' own verified twins — composition checked, not
    trusted."""
    from .pipelines.corpus_prep import prep_funnel
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    return prep_funnel(ds)


# assembled by CONCATENATION (not f-string: the C4 twin contains
# literal '{' in its LIKE pattern) from the verified per-stage twins —
# any drift in a stage's semantics breaks this composite's oracle too
Q_PREP_FUNNEL_SQL = (
    "WITH gq AS (SELECT doc_id, (r_wordcount * r_meanlen * r_symbol"
    " * r_bullet * r_ellipsis * r_alpha) AS g FROM ("
    + Q_GOPHER_QUALITY_SQL + ")),\n"
    "cq AS (SELECT doc_id, pass_all AS c4 FROM ("
    + Q_C4_LINE_SQL + ")),\n"
    "dec AS (SELECT doc_id FROM (" + Q_DECONTAMINATE_SQL + ")),\n"
    + r"""
base AS (
  SELECT d.doc_id, d.source, gq.g, cq.c4,
         CASE WHEN dec.doc_id IS NULL THEN 1 ELSE 0 END AS clean,
         ('0x' || substr(md5(d.text), 1, 13))::BIGINT AS th
  FROM documents d
  JOIN gq USING (doc_id) JOIN cq USING (doc_id)
  LEFT JOIN dec USING (doc_id)
  WHERE CAST(('0x' || substr(md5('split-v1' || CAST(d.doc_id AS VARCHAR)),
                             1, 8)) AS BIGINT) % 10 <> 9),
surv AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rn
    FROM base WHERE g = 1 AND clean = 1)
  WHERE rn = 1)
SELECT source, count(*)::BIGINT AS n_in,
       sum(g)::BIGINT AS n_gopher,
       sum(g * clean)::BIGINT AS n_clean,
       sum(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_unique,
       sum(CASE WHEN s.doc_id IS NOT NULL AND base.c4 = 1
                THEN 1 ELSE 0 END)::BIGINT AS n_c4
FROM base LEFT JOIN surv s USING (doc_id)
GROUP BY source ORDER BY source
""")


def q_edit_distance_pairs(sf_dir: str) -> pd.DataFrame:
    """Edit-distance-1 fuzzy self-join over customer names
    (dedup.edit_distance_pairs — symmetric-delete candidate
    generation, recall exactly 1 by construction, two-pointer ≤1
    verify; the oracle is the brute-force all-pairs levenshtein())."""
    ds = read_parquet(_t(sf_dir, "customer"),
                      columns=["c_custkey", "c_name"])
    out = dd.edit_distance_pairs(ds, text_col="c_name",
                                 id_col="c_custkey").to_pandas()
    if not len(out):
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


Q_EDIT_DISTANCE_SQL = r"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


def q_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Crawl snapshot diff — the nightly-refresh accounting step: given
    an OLD and a NEW corpus snapshot, classify every doc as added /
    removed / changed / unchanged and count per source. Both engines
    derive the two snapshots deterministically from `documents` (old =
    doc_id % 7 ≠ 0; new = doc_id % 5 ≠ 0, with text perturbed where
    doc_id % 3 = 0), so the diff logic — not fixture plumbing — is
    what's oracle-checked.

    Scale shape: each side compresses to (doc_id, source, 52-bit text
    hash) inside the scan (per-batch map; the only full-text pass);
    the diff is ONE native full-outer hash join of id-level rows, the
    per-(source, status) counts fold from per-batch combiner rows.
    At 100 TB neither snapshot is ever materialized as text twice."""
    import hashlib

    from .rayutil import bucketed_group_sum, project_blocks

    def hashes(which: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            ids = b["doc_id"].to_numpy()
            if which == "old":
                m = ids % 7 != 0
            else:
                m = ids % 5 != 0
            b = b[m]
            ids = b["doc_id"].to_numpy()
            texts = b["text"].fillna("")
            if which == "new":
                texts = texts.where(
                    pd.Series(ids % 3 != 0, index=b.index),
                    texts + " [updated]")
            th = [int(hashlib.md5(t.encode()).hexdigest()[:13], 16)
                  for t in texts]
            return pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "source": pd.Series(b["source"].to_numpy(),
                                    dtype="object"),
                "th": pd.Series(th, dtype="int64")})
        return f

    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    old = project_blocks(
        ds.map_batches(hashes("old"), batch_format="pandas"),
        ["doc_id", "source", "th"]).materialize()
    new = project_blocks(
        ds.map_batches(hashes("new"), batch_format="pandas"),
        ["doc_id", "source", "th"]) \
        .rename_columns({"source": "source_n", "th": "th_n"}) \
        .materialize()

    typed_empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                                "status": pd.Series([], dtype="object"),
                                "n": pd.Series([], dtype="int64")})
    n_old, n_new = old.count(), new.count()
    if n_old == 0 and n_new == 0:
        return typed_empty
    if n_old == 0 or n_new == 0:
        # one snapshot empty: everything is added/removed — no join
        # possible against a schema-less zero-block side
        side = (new.to_pandas().rename(columns={"source_n": "source"})
                if n_old == 0 else old.to_pandas())
        status = "added" if n_old == 0 else "removed"
        g = side.groupby("source", as_index=False).size()
        return pd.DataFrame({
            "source": pd.Series(g["source"].to_numpy(), dtype="object"),
            "status": pd.Series([status] * len(g), dtype="object"),
            "n": pd.Series(g["size"].to_numpy(), dtype="int64")}) \
            .sort_values(["source", "status"]).reset_index(drop=True)

    with light_shuffle_aggregators():
        joined = old.join(new, join_type="full_outer", num_partitions=8,
                          on=("doc_id",), right_on=("doc_id",))
    joined = project_blocks(joined, ["source", "th", "source_n", "th_n"])

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "status": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        old_present = b["th"].notna()
        new_present = b["th_n"].notna()
        status = np.where(
            ~old_present, "added",
            np.where(~new_present, "removed",
                     np.where(b["th"].to_numpy() == b["th_n"].to_numpy(),
                              "unchanged", "changed")))
        src = b["source"].where(old_present, b["source_n"])
        g = pd.DataFrame({"source": src.to_numpy(),
                          "status": status}) \
            .groupby(["source", "status"], as_index=False).size()
        return pd.DataFrame({
            "source": pd.Series(g["source"].to_numpy(), dtype="object"),
            "status": pd.Series(g["status"].to_numpy(), dtype="object"),
            "n": pd.Series(g["size"].to_numpy(), dtype="int64")})

    out = bucketed_group_sum(
        joined.map_batches(classify, batch_format="pandas"),
        ["source", "status"], {"n": "n"}).to_pandas()
    if not len(out):
        return pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "status": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    return out[["source", "status", "n"]] \
        .sort_values(["source", "status"]).reset_index(drop=True)


Q_SNAPSHOT_DIFF_SQL = r"""
WITH old AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(text), 1, 13))::BIGINT AS th
  FROM documents WHERE doc_id % 7 <> 0),
new AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CASE WHEN doc_id % 3 = 0
                                  THEN text || ' [updated]'
                                  ELSE text END), 1, 13))::BIGINT AS th
  FROM documents WHERE doc_id % 5 <> 0),
d AS (
  SELECT coalesce(o.source, n.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.th = n.th THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN new n USING (doc_id))
SELECT source, status, count(*)::BIGINT AS n
FROM d GROUP BY source, status ORDER BY source, status
"""


def q_change_rate(sf_dir: str) -> pd.DataFrame:
    """Per-source page-change-rate estimate — the recrawl-scheduling
    signal behind q_snapshot_diff: given a series of corpus snapshots,
    estimate each source's Poisson change rate with the bias-corrected
    Cho & Garcia-Molina estimator (TOIT'03 "Estimating Frequency of
    Change" §4.2): lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) for X
    observed changes in n snapshot-to-snapshot comparisons. The
    frontier uses this to set per-host revisit intervals.

    Both engines derive FOUR deterministic snapshots from `documents`
    (doc revision r(s) advances at step e iff (doc_id·37 + e·101) % 5
    = 0; snapshot text = text ∥ ' [rev r]') and detect changes the
    honest way — comparing consecutive snapshot md5s — so the hashing
    + estimator math is what's oracle-checked, not the fixture.

    Scale shape: each doc's 4 hashes never leave the scan batch; one
    (source, n_obs, n_changed) combiner row per source per batch
    crosses the shuffle, and the ln runs driver-side over ≤|sources|
    rows. lambda_micro is the shared floor(·1e6) double expression."""
    import hashlib

    from .rayutil import bucketed_group_sum

    def obs(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "n_obs_part": pd.Series([], dtype="int64"),
                "n_changed_part": pd.Series([], dtype="int64")})
        changed = np.zeros(len(b), np.int64)
        for i, (did, txt) in enumerate(zip(
                b["doc_id"].to_numpy(), b["text"].fillna(""))):
            prev = hashlib.md5(txt.encode()).hexdigest()
            r = x = 0
            for e in (1, 2, 3):
                if (did * 37 + e * 101) % 5 == 0:
                    r += 1
                cur = hashlib.md5(
                    (txt if r == 0 else f"{txt} [rev{r}]").encode()
                ).hexdigest()
                if cur != prev:
                    x += 1
                prev = cur
            changed[i] = x
        g = pd.DataFrame({"source": b["source"].to_numpy(),
                          "x": changed}) \
            .groupby("source", as_index=False) \
            .agg(n_docs=("x", "size"), n_changed_part=("x", "sum"))
        return pd.DataFrame({
            "source": pd.Series(g["source"].to_numpy(), dtype="object"),
            "n_obs_part": pd.Series(3 * g["n_docs"].to_numpy(),
                                    dtype="int64"),
            "n_changed_part": pd.Series(g["n_changed_part"].to_numpy(),
                                        dtype="int64")})

    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "source", "text"])
    out = bucketed_group_sum(
        ds.map_batches(obs, batch_format="pandas"),
        ["source"], {"n_obs_part": "n_obs",
                     "n_changed_part": "n_changed"}).to_pandas()
    if not len(out):
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_obs": pd.Series([], dtype="int64"),
            "n_changed": pd.Series([], dtype="int64"),
            "lambda_micro": pd.Series([], dtype="int64")})
    n = out["n_obs"].to_numpy().astype(np.float64)
    x = out["n_changed"].to_numpy().astype(np.float64)
    out["lambda_micro"] = np.floor(
        -np.log((n - x + 0.5) / (n + 0.5)) * 1e6).astype(np.int64)
    return out[["source", "n_obs", "n_changed", "lambda_micro"]] \
        .sort_values("source").reset_index(drop=True)


Q_CHANGE_RATE_SQL = r"""
WITH rev AS (
  SELECT d.doc_id, d.source, d.text, e.s,
         (CASE WHEN e.s >= 1 AND (d.doc_id * 37 + 101) % 5 = 0
               THEN 1 ELSE 0 END
        + CASE WHEN e.s >= 2 AND (d.doc_id * 37 + 202) % 5 = 0
               THEN 1 ELSE 0 END
        + CASE WHEN e.s >= 3 AND (d.doc_id * 37 + 303) % 5 = 0
               THEN 1 ELSE 0 END) AS r
  FROM documents d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS s) e),
snap AS (
  SELECT doc_id, source, s,
         md5(CASE WHEN r = 0 THEN text
                  ELSE text || ' [rev' || CAST(r AS VARCHAR) || ']'
             END) AS h
  FROM rev),
agg AS (
  SELECT a.source, count(*)::BIGINT AS n_obs,
         sum(CASE WHEN a.h <> b.h THEN 1 ELSE 0 END)::BIGINT
           AS n_changed
  FROM snap a JOIN snap b
    ON a.doc_id = b.doc_id AND b.s = a.s - 1
  WHERE a.s >= 1
  GROUP BY a.source)
SELECT source, n_obs, n_changed,
       CAST(floor(-ln((n_obs - n_changed + 0.5) / (n_obs + 0.5))
                  * 1e6) AS BIGINT) AS lambda_micro
FROM agg ORDER BY source
"""


def q_decayed_freshness(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially-decayed activity score (half-life 7
    days, anchored at the corpus max timestamp) — the recency
    weighting a frontier uses to rank sources for revisit: an event
    today counts 1.0, one a week old 0.5, one a month old ~0.06.

    Exactness rule: each event's decay factor is floored to micro
    units BEFORE summing (floor(exp(·)·1e6) per term, integer sum),
    so the result is independent of batch/summation order and
    bit-identical to the SQL twin. Scale shape: pass 1 folds a
    per-batch max(ts) to the driver (one int per block); pass 2 emits
    one (user, n, Σmicro) combiner row per user per batch."""
    from .rayutil import bucketed_group_sum

    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "user_id"])

    def ts_max(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"m": pa.array([], pa.int64())})
        v = pc.cast(t["ts"], pa.int64())
        return pa.table({"m": pa.array(
            [pc.max(v).as_py()], pa.int64())})

    parts = ds.map_batches(ts_max, batch_format="pyarrow").take_all()
    if not parts:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "freshness_micro": pd.Series([], dtype="int64")})
    tmax = max(p["m"] for p in parts)

    def to_us(t: pa.Table) -> pa.Table:
        # arrow-side unit-explicit cast (timestamp[us] → µs int64);
        # a pandas .astype("int64") would silently read ns on a
        # version that coerces the unit
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64())})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_part": pd.Series([], dtype="int64"),
                "f_part": pd.Series([], dtype="int64")})
        ts_us = b["ts_us"].to_numpy()
        micro = np.floor(np.exp(
            -np.log(2.0) * ((tmax - ts_us) / 86400000000.0) / 7.0
        ) * 1e6).astype(np.int64)
        g = pd.DataFrame({"user_id": b["user_id"].to_numpy(),
                          "f": micro}) \
            .groupby("user_id", as_index=False) \
            .agg(n_part=("f", "size"), f_part=("f", "sum"))
        return g.astype({"user_id": "int64", "n_part": "int64",
                         "f_part": "int64"})

    out = bucketed_group_sum(
        ds.map_batches(to_us, batch_format="pyarrow")
          .map_batches(partial, batch_format="pandas"),
        ["user_id"], {"n_part": "n_events",
                      "f_part": "freshness_micro"}).to_pandas()
    return out[["user_id", "n_events", "freshness_micro"]] \
        .astype({"user_id": "int64", "n_events": "int64",
                 "freshness_micro": "int64"}) \
        .sort_values("user_id").reset_index(drop=True)


Q_DECAYED_FRESHNESS_SQL = r"""
WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(CAST(floor(exp(-ln(2) * ((t.tmax - epoch_us(ts))
                                    / 86400000000.0) / 7.0)
                      * 1e6) AS BIGINT))::BIGINT AS freshness_micro
FROM events, t
GROUP BY user_id ORDER BY user_id
"""


def q_degree_powerlaw(sf_dir: str) -> pd.DataFrame:
    """Per-segment power-law fit of the customer activity distribution
    — the Hill maximum-likelihood tail-index estimator (Hill'75; with
    d_min = 1: alpha_hat = 1 + n / Σ ln(d)) that web-graph analysis
    runs on degree distributions to verify the scale-free shape (and
    that a crawler runs on per-host page counts to size frontier skew
    salting). Degrees here are per-customer order counts.

    Exactness: per-customer floor(ln(d)·1e6) terms sum as int64, and
    alpha is BIGINT arithmetic (1e6 + n·1e12 // S) on both sides.
    Shape: per-batch (custkey, n) combiner → bucketed fold → native
    inner join to customer (aggregate-then-join pushdown, no customer
    broadcast) → one (segment, n, S) row per batch."""
    from .rayutil import bucketed_group_sum, project_blocks

    cust = read_parquet(_t(sf_dir, "customer"),
                        columns=["c_custkey", "c_mktsegment"])
    orders = read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False) \
            .agg(d=("o_custkey", "size"))
        return g.astype({"o_custkey": "int64", "d": "int64"})

    # bucketed fold, not groupby().aggregate(Sum): the native
    # sort-aggregate degrades ~12x on pandas partial blocks (the
    # bucketed_group_sum rule — this line was 23 s at sf0.1 as a
    # native aggregate, <2 s folded); repartition before the join per
    # the empty-sort-partition rule
    deg = project_blocks(
        bucketed_group_sum(
            orders.map_batches(cnt_partial, batch_format="pandas"),
            ["o_custkey"], {"d": "d"}),
        ["o_custkey", "d"]).repartition(4)
    with light_shuffle_aggregators():
        joined = cust.join(deg, join_type="inner", num_partitions=8,
                           on=("c_custkey",), right_on=("o_custkey",))

    def seg_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "segment": pd.Series([], dtype="object"),
                "n_part": pd.Series([], dtype="int64"),
                "s_part": pd.Series([], dtype="int64")})
        d = b["d"].to_numpy(dtype=np.float64)
        ln_micro = np.floor(np.log(d) * 1e6).astype(np.int64)
        g = pd.DataFrame({"segment": b["c_mktsegment"].to_numpy(),
                          "s": ln_micro}) \
            .groupby("segment", as_index=False) \
            .agg(n_part=("s", "size"), s_part=("s", "sum"))
        return pd.DataFrame({
            "segment": pd.Series(g["segment"].to_numpy(),
                                 dtype="object"),
            "n_part": pd.Series(g["n_part"].to_numpy(), dtype="int64"),
            "s_part": pd.Series(g["s_part"].to_numpy(), dtype="int64")})

    out = bucketed_group_sum(
        joined.map_batches(seg_partial, batch_format="pandas"),
        ["segment"], {"n_part": "n_customers", "s_part": "s_micro"}) \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({
            "segment": pd.Series([], dtype="object"),
            "n_customers": pd.Series([], dtype="int64"),
            "s_micro": pd.Series([], dtype="int64"),
            "alpha_micro": pd.Series([], dtype="float64")})
    n = out["n_customers"].to_numpy()
    s = out["s_micro"].to_numpy()
    alpha = np.where(s > 0, 1_000_000 + n * 1_000_000_000_000
                     // np.maximum(s, 1), np.nan)
    out["alpha_micro"] = alpha
    return out[["segment", "n_customers", "s_micro", "alpha_micro"]] \
        .sort_values("segment").reset_index(drop=True)


Q_DEGREE_POWERLAW_SQL = r"""
WITH deg AS (
  SELECT o_custkey, count(*)::BIGINT AS d FROM orders GROUP BY 1),
j AS (
  SELECT c.c_mktsegment AS segment, deg.d
  FROM deg JOIN customer c ON c.c_custkey = deg.o_custkey),
agg AS (
  SELECT segment, count(*)::BIGINT AS n_customers,
         sum(CAST(floor(ln(d) * 1e6) AS BIGINT))::BIGINT AS s_micro
  FROM j GROUP BY 1)
SELECT segment, n_customers, s_micro,
       CASE WHEN s_micro > 0
            THEN CAST(1000000 + n_customers * 1000000000000 // s_micro
                      AS DOUBLE)
            ELSE NULL END AS alpha_micro
FROM agg ORDER BY segment
"""


def q_tfidf_cosine_pairs(sf_dir: str) -> pd.DataFrame:
    """Tf-idf weighted cosine document pairs (cos ≥ 0.5) — the
    weighted lexical-similarity join (dedup.tfidf_cosine_pairs):
    rare-term-dominated same-story/near-dup detection between the
    unweighted q_ngram_jaccard and the embedding-space q_semdedup.
    dot and both norms are exact int64; the one double expression is
    shared verbatim with the twin."""
    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    out = dd.tfidf_cosine_pairs(ds).to_pandas()
    if not len(out):
        return pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "dot": pd.Series([], dtype="int64"),
            "cos_micro": pd.Series([], dtype="int64")})
    return out.astype({"doc_a": "int64", "doc_b": "int64",
                       "dot": "int64", "cos_micro": "int64"}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# the df cap's absolute ceiling is shared with the engine via
# dedup.TFIDF_MAX_DF_CAP (both sides: min(max(64, n//8), CAP))
Q_TFIDF_COSINE_SQL = rf"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
       FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
w AS (
  SELECT t.doc_id,
         (('0x' || substr(md5(t.token), 1, 16))::UBIGINT
          & ((1::UBIGINT << 61) - 1))::BIGINT AS h,
         CAST(floor(t.tf * ln((SELECT n FROM nd) / d.df) * 1000 + 0.5)
              AS BIGINT) AS w
  FROM tf t JOIN df d USING (token)
  WHERE d.df <= least(greatest(64, (SELECT count(*) FROM documents) // 8),
                      {dd.TFIDF_MAX_DF_CAP})),
norm AS (SELECT doc_id, sum(w * w)::BIGINT AS n2 FROM w GROUP BY 1),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.w * b.w)::BIGINT AS dot
  FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT doc_a, doc_b, dot,
         CAST(floor(dot * 1e6 / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE))
              AS BIGINT) AS cos_micro
  FROM dots
  JOIN norm na ON na.doc_id = dots.doc_a
  JOIN norm nb ON nb.doc_id = dots.doc_b
  WHERE na.n2 > 0 AND nb.n2 > 0)
SELECT doc_a, doc_b, dot, cos_micro FROM scored
WHERE cos_micro >= 500000 ORDER BY doc_a, doc_b
"""


def q_watermark_lateness(sf_dir: str) -> pd.DataFrame:
    """Event-time WATERMARK / allowed-lateness accounting (the §2.9
    streaming semantic, exact): replaying the events table in arrival
    order (event_id — the stream's ingest sequence), the watermark at
    each row is the max event time seen so far; a row whose event time
    trails the watermark by more than the 1-hour allowed lateness
    would be DISCARDED by a streaming window. Reports per (event-hour,
    type) admitted/discarded counts — the "how much data would my
    lateness bound drop" audit run before picking a watermark policy.

    The fixture stream is perfectly time-ordered (generator artifact),
    so both engines derive the same deterministic out-of-orderness —
    event time delayed by ``(event_id % 7) · 17 min`` (a network-delay
    model, up to 102 min > the 60-min bound) — which makes ~24% of
    rows late; the WATERMARK/lateness machinery, not the fixture's
    ordering, is what gets oracle-checked.

    Shape: windows.prefix_max two-pass scan (per-partition max rows →
    driver cummax over one int per partition → local cummax; the
    event_type column rides pass 2, no join back), then a per-batch
    (hour, type) combiner fold."""
    from .rayutil import bucketed_group_sum

    late_us = 3_600_000_000

    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) - (eid % 7) * 1_020_000_000
        return pa.table({"event_id": t["event_id"],
                         "ts_us": pa.array(ts_us),
                         "event_type": t["event_type"]})

    wm = wn.prefix_max(ds.map_batches(to_us, batch_format="pyarrow"),
                       key_col="event_id", value_col="ts_us",
                       extra_cols=["event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "hour_us": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype="object"),
                "adm_part": pd.Series([], dtype="int64"),
                "dis_part": pd.Series([], dtype="int64")})
        ts = b["ts_us"].to_numpy()
        late = (b["running"].to_numpy() - ts) > late_us
        g = pd.DataFrame({
            "hour_us": (ts // late_us) * late_us,
            "event_type": b["event_type"].to_numpy(),
            "adm": (~late).astype(np.int64),
            "dis": late.astype(np.int64)}) \
            .groupby(["hour_us", "event_type"], as_index=False) \
            .agg(adm_part=("adm", "sum"), dis_part=("dis", "sum"))
        return g.astype({"hour_us": "int64", "adm_part": "int64",
                         "dis_part": "int64"})

    out = bucketed_group_sum(
        wm.map_batches(partial, batch_format="pandas"),
        ["hour_us", "event_type"],
        {"adm_part": "n_admitted", "dis_part": "n_discarded"}) \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({
            "hour_us": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "n_admitted": pd.Series([], dtype="int64"),
            "n_discarded": pd.Series([], dtype="int64")})
    return out[["hour_us", "event_type", "n_admitted", "n_discarded"]] \
        .sort_values(["hour_us", "event_type"]).reset_index(drop=True)


Q_WATERMARK_LATENESS_SQL = r"""
WITH w AS (
  SELECT event_id, event_type,
         epoch_us(ts) - (event_id % 7) * 1020000000 AS ts_us,
         max(epoch_us(ts) - (event_id % 7) * 1020000000)
             OVER (ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING) AS wm
  FROM events)
SELECT (ts_us // 3600000000) * 3600000000 AS hour_us, event_type,
       sum(CASE WHEN wm - ts_us <= 3600000000
                THEN 1 ELSE 0 END)::BIGINT AS n_admitted,
       sum(CASE WHEN wm - ts_us > 3600000000
                THEN 1 ELSE 0 END)::BIGINT AS n_discarded
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Per-user PERCENT_RANK of each event's value
    (windows.grouped_percent_rank — one salted-bucket shuffle, full
    per-key rank): the per-key feature-scaling window, integer-exact
    (RANK tie semantics, (rnk-1)·1e6 // (n-1))."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "user_id", "value"])
    out = wn.grouped_percent_rank(
        ds, key_col="user_id", order_col="value",
        id_cols=["event_id"]).to_pandas()
    if not len(out):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("event_id", "user_id", "rnk",
                                       "n_key", "pr_micro")})
    return out[["event_id", "user_id", "rnk", "n_key", "pr_micro"]] \
        .astype("int64").sort_values("event_id").reset_index(drop=True)


Q_USER_PERCENT_RANK_SQL = r"""
SELECT event_id, user_id,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(count(*) OVER p AS BIGINT) AS n_key,
       CASE WHEN count(*) OVER p > 1
            THEN (CAST(rank() OVER w AS BIGINT) - 1) * 1000000
                 // (CAST(count(*) OVER p AS BIGINT) - 1)
            ELSE 0 END AS pr_micro
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value),
       p AS (PARTITION BY user_id)
ORDER BY event_id
"""


def q_leakage_free_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-free train/val/test split — the eval-contamination
    guard a per-document hash split DOESN'T give you: a near-duplicate
    of a train document must not land in test, so the split key is the
    near-dup CLUSTER REPRESENTATIVE (Lee'21 "Deduplicating Training
    Data Makes Language Models Better" §6 reports exactly this
    train/test leakage). Whole clusters move together by construction.

    Composition of three oracle-pinned pieces: minhash_lsh_pairs →
    dedup_groups_distributed (min-label CC, no driver pair state) →
    the assign_split md5 rule applied to the representative. Counts
    fold distributively (one (split, n) row per batch; distinct
    clusters via a (split, rep)-keyed fold). The twin re-derives the
    clusters with the recursive-CTE closure and applies the identical
    md5 expression to the representative."""
    from .functions.splits import split_label
    from .rayutil import bucketed_group_sum, project_blocks

    docs = read_parquet(_t(sf_dir, "documents"),
                        columns=["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.4)
    labels = dd.dedup_groups_distributed(pairs)
    ids = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    with light_shuffle_aggregators():
        j = ids.join(labels, join_type="left_outer", num_partitions=8,
                     on=("doc_id",))
    j = project_blocks(j, ["doc_id", "cluster_rep"])

    def to_split(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "split": pd.Series([], dtype="object"),
                "rep": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64")})
        rep = b["cluster_rep"].fillna(b["doc_id"]).astype("int64")
        return pd.DataFrame({
            "split": [split_label(r) for r in rep],
            "rep": rep.to_numpy(),
            "c": np.ones(len(b), np.int64)})

    assigned = j.map_batches(to_split, batch_format="pandas")
    # docs per split: one combiner row per (split, batch)
    doc_counts = bucketed_group_sum(assigned, ["split"],
                                    {"c": "n_docs"}).to_pandas()
    # clusters per split: distinct (split, rep) fold, then count
    distinct_reps = project_blocks(
        bucketed_group_sum(assigned, ["split", "rep"], {"c": "n"}),
        ["split", "rep"])

    def cl_part(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b) or "split" not in b.columns:
            return pd.DataFrame({
                "split": pd.Series([], dtype="object"),
                "cc": pd.Series([], dtype="int64")})
        g = b.groupby("split", as_index=False).size()
        return pd.DataFrame({
            "split": pd.Series(g["split"].to_numpy(), dtype="object"),
            "cc": pd.Series(g["size"].to_numpy(), dtype="int64")})

    cl_counts = bucketed_group_sum(
        distinct_reps.map_batches(cl_part, batch_format="pandas"),
        ["split"], {"cc": "n_clusters"}).to_pandas()
    if not len(doc_counts):
        return pd.DataFrame({
            "split": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_clusters": pd.Series([], dtype="int64")})
    out = doc_counts.merge(cl_counts, on="split", how="left")
    out["n_clusters"] = out["n_clusters"].fillna(0).astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out[["split", "n_docs", "n_clusters"]] \
        .sort_values("split").reset_index(drop=True)


def _leakage_free_split_sql() -> str:
    return ("WITH RECURSIVE " + _minhash_ctes() + ",\npairs AS ("
            + _MINHASH_PAIR_SELECT + """),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(doc, r) AS (
  SELECT doc_id, doc_id FROM (SELECT DISTINCT doc_id FROM documents)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.doc = e.v),
rep AS (SELECT doc, min(r) AS rep FROM reach GROUP BY doc),
s AS (
  SELECT d.doc_id, rep.rep,
         CAST(('0x' || substr(md5('split-v1'
                                  || CAST(rep.rep AS VARCHAR)), 1, 8))
              AS BIGINT) % 10 AS b
  FROM documents d JOIN rep ON rep.doc = d.doc_id)
SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT rep)::BIGINT AS n_clusters
FROM s GROUP BY 1 ORDER BY split""")


def q_winsorized_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source winsorized mean of document length — the robust
    profiling step that stops a few giant (or empty) pages from
    skewing per-source budgets: clamp every n_chars into the global
    [p05, p95] band (quantile_cont semantics via the oracle-pinned
    windows.interpolated_quantiles histogram fold), then average the
    clamped values per source.

    Exactness: clamped values are floored to micro units per doc
    (int64 sum), and the mean is BIGINT floor-division of that sum by
    the count on both sides — no double accumulation anywhere. Scale
    shape: pass 1 is the one-row-per-DISTINCT-length histogram
    shuffle; pass 2 emits one (source, n, Σmicro) row per batch."""
    from .rayutil import bucketed_group_sum

    ds = read_parquet(_t(sf_dir, "documents"),
                      columns=["source", "n_chars"])
    qs = wn.interpolated_quantiles(ds, value_col="n_chars",
                                   qs=[0.05, 0.95])
    if not len(qs):
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "win_mean_micro": pd.Series([], dtype="int64")})
    lo, hi = qs["val"].to_numpy()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "n_part": pd.Series([], dtype="int64"),
                "s_part": pd.Series([], dtype="int64")})
        v = b["n_chars"].to_numpy(dtype=np.float64)
        micro = np.floor(np.minimum(np.maximum(v, lo), hi) * 1e6) \
            .astype(np.int64)
        g = pd.DataFrame({"source": b["source"].to_numpy(),
                          "m": micro}) \
            .groupby("source", as_index=False) \
            .agg(n_part=("m", "size"), s_part=("m", "sum"))
        return pd.DataFrame({
            "source": pd.Series(g["source"].to_numpy(), dtype="object"),
            "n_part": pd.Series(g["n_part"].to_numpy(), dtype="int64"),
            "s_part": pd.Series(g["s_part"].to_numpy(), dtype="int64")})

    out = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], {"n_part": "n_docs", "s_part": "s_micro"}) \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "win_mean_micro": pd.Series([], dtype="int64")})
    out["win_mean_micro"] = (out["s_micro"].to_numpy()
                             // out["n_docs"].to_numpy()).astype("int64")
    return out[["source", "n_docs", "win_mean_micro"]] \
        .sort_values("source").reset_index(drop=True)


Q_WINSORIZED_STATS_SQL = r"""
WITH b AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CAST(floor(least(greatest(n_chars::DOUBLE, b.lo), b.hi)
                      * 1e6) AS BIGINT))::BIGINT
         // count(*)::BIGINT AS win_mean_micro
FROM documents, b
GROUP BY source ORDER BY source
"""


def q_rolling_median(sf_dir: str) -> pd.DataFrame:
    """Per-user sliding-window (4 rows) MEDIAN over event values — the
    robust (outlier-immune) profile windows.rolling_window_median;
    output is 2·median as int64 so even-window midpoints stay
    integer-exact against the DuckDB twin."""
    ds = read_parquet(_t(sf_dir, "events"),
                      columns=["event_id", "ts", "user_id", "value"])

    def to_centi(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["value"])
        return t.append_column(
            "value_centi", pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64)))

    out = wn.rolling_window_median(
        ds.map_batches(to_centi, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value_centi", window=4).to_pandas()
    out = out[["event_id", "user_id", "win_median_x2"]]
    return out.sort_values("event_id").reset_index(drop=True)


Q_ROLLING_MEDIAN_SQL = """
SELECT event_id, user_id,
       CAST(2 * median(value_centi) OVER w AS BIGINT) AS win_median_x2
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_normalize_text(sf_dir: str) -> pd.DataFrame:
    """Text canonicalization TRANSFORM (the fix-before-tokenize pass
    q_unicode_stats audits): NFC-normalize, collapse explicit-class
    whitespace runs ([ \\t\\n\\r\\f]+ — the RE2∩re-safe class; Python's
    \\s is unicode-wider, a documented divergence) to single spaces,
    strip. Emits the normalized text plus changed flag and codepoint
    count; pure per-batch map, zero shuffle. NFC parity between
    unicodedata and DuckDB's utf8proc is cross-validated on the
    unicode-variant corpus sweep."""
    import re as _re
    import unicodedata as _ud

    ws = _re.compile(r"[ \t\n\r\f]+")
    # DuckDB's trim() strips exactly the Unicode Zs (space-separator)
    # category, NOT Python str.strip()'s wider isspace() set (probed:
    # NBSP/en-space/thin-space/ideographic-space stripped; tab, LF,
    # NEL, LS/PS control whitespace NOT) - strip the identical set
    zs = "".join(chr(c) for c in range(0x10000)
                 if _ud.category(chr(c)) == "Zs")
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        norm, changed, nchars = [], [], []
        for t in b["text"].fillna(""):
            n = ws.sub(" ", _ud.normalize("NFC", t)).strip(zs)
            norm.append(n)
            changed.append(int(n != t))
            nchars.append(len(n))
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "norm_text": pd.Series(norm, dtype="object", index=b.index),
            "changed": pd.Series(changed, dtype="int64", index=b.index),
            "norm_chars": pd.Series(nchars, dtype="int64",
                                    index=b.index)})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    if not len(out):
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "norm_text": pd.Series([], dtype="object"),
            "changed": pd.Series([], dtype="int64"),
            "norm_chars": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(text),
                           '[ ' || chr(9) || chr(10) || chr(13)
                               || chr(12) || ']+',
                           ' ', 'g')) AS norm_text,
       CAST(trim(regexp_replace(nfc_normalize(text),
                                '[ ' || chr(9) || chr(10) || chr(13)
                                    || chr(12) || ']+',
                                ' ', 'g')) <> text AS BIGINT) AS changed,
       length(trim(regexp_replace(nfc_normalize(text),
                                  '[ ' || chr(9) || chr(10) || chr(13)
                                      || chr(12) || ']+',
                                  ' ', 'g')))::BIGINT AS norm_chars
FROM documents ORDER BY doc_id
"""


def q_media_thumbnail(sf_dir: str) -> pd.DataFrame:
    """Entropy-crop thumbnail (M26's algorithm completed — reference
    newspaperlite/images.py:43-79 run for real over the repo's own
    decoders; only the network fetch stays excluded per replay
    scope): deterministic TALL BMP images with a structured upper
    region and a flat lower band, so the entropy decision genuinely
    picks a side; the stage squares, shrinks into 90×90, and reports
    the trimmed-row decision trace. Payload digest keys the DECODED
    thumbnail, so a header-only fake cannot pass."""
    import hashlib as _hl

    from .functions.multimodal import encode_bmp

    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 10 == 0]
        payloads = []
        for i in ids:
            w = 24 + (i % 3) * 8
            h = w + 14 + (i % 5) * 10          # always taller than wide
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(yy * 9 + i) % 256, (xx * 7 + i) % 256,
                           (yy + xx + i) % 256], axis=-1).astype(np.uint8)
            flat = 10 + (i % 4) * 6            # low-entropy bottom band
            px[h - flat:, :, :] = (i * 31) % 256
            payloads.append(encode_bmp(px))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "mime": pa.array(["image/bmp"] * n, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(mm.ThumbnailStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2)

    def digest(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "width": t["width"], "height": t["height"],
            "trimmed_rows": t["trimmed_rows"],
            "thumb_sha1": pa.array(
                [_hl.sha1(p).hexdigest()[:16]
                 for p in t["payload"].to_pylist()], pa.string())})

    return out.map_batches(digest, batch_format="pyarrow").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)


def q_docs_all_terms_indexed(sf_dir: str) -> pd.DataFrame:
    """Conjunctive search THROUGH the inverted index (functions/
    index.py): build the token-bucket-partitioned parquet layout, then
    answer the same AND-of-postings query as q_docs_all_terms by
    reading ONLY the terms' bucket partitions — identical oracle, index
    path (the IvfIndex pattern for text). The matched ids fetch their
    lang via a row-filtered documents read."""
    import shutil
    import tempfile

    from .functions.index import build_inverted_index, query_all_terms
    terms = ["batch", "scan", "join"]
    ds = read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    idx_dir = tempfile.mkdtemp(prefix="ncr_invidx_")
    try:
        build_inverted_index(ds, idx_dir)
        ids = query_all_terms(idx_dir, terms).to_pandas()
        if not len(ids):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "lang": pd.Series([], dtype="object")})
        id_list = sorted(int(i) for i in ids["doc_id"])
        out = read_parquet(
            _t(sf_dir, "documents"), columns=["doc_id", "lang"],
            filter=pc.field("doc_id").isin(id_list)).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True) \
            .astype({"doc_id": "int64"})
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def q_repeat_buyers(sf_dir: str) -> pd.DataFrame:
    """INTERSECT shape: customers with orders in BOTH 1995 and 1996,
    with per-year counts — the set-intersection sibling of the ANTI
    (q_customers_no_orders) and SEMI (q_customers_big_orders) joins.
    Per-batch (custkey, n95, n96) conditional combiner — one row per
    (custkey, batch) crosses the shuffle — then a salted fold and a
    vectorized both-positive filter; no join at all."""
    from .rayutil import bucketed_group_sum
    ds = read_parquet(_t(sf_dir, "orders"),
                      columns=["o_custkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        yr = pd.to_datetime(b["o_orderdate"]).dt.year
        g = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(),
            "n95": (yr == 1995).to_numpy().astype(np.int64),
            "n96": (yr == 1996).to_numpy().astype(np.int64)}) \
            .groupby("o_custkey", as_index=False).sum()
        return g.astype({"o_custkey": "int64", "n95": "int64",
                         "n96": "int64"})

    agg = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], {"n95": "n_1995", "n96": "n_1996"}).to_pandas()
    if not len(agg):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("o_custkey", "n_1995", "n_1996")})
    out = agg[(agg["n_1995"] > 0) & (agg["n_1996"] > 0)]
    return out[["o_custkey", "n_1995", "n_1996"]] \
        .sort_values("o_custkey").reset_index(drop=True)


Q_REPEAT_BUYERS_SQL = """
SELECT o_custkey,
       sum(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
         ::BIGINT AS n_1995,
       sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
         ::BIGINT AS n_1996
FROM orders GROUP BY o_custkey
HAVING n_1995 > 0 AND n_1996 > 0
ORDER BY o_custkey
"""


def q_interval_overlap(sf_dir: str) -> pd.DataFrame:
    """Interval-overlap join against a periodic calendar: per-user-day
    event sessions [min ts, max ts] × 30-minute maintenance windows
    opening at every 7th hour — how many windows each session touched.
    The ENGINE does the shuffle-free arithmetic form (for a PERIODIC
    window set, the overlapping window indices are a closed-form count
    per row — no window table, no join, no broadcast); the twin runs
    the LITERAL generate_series interval join, so the arithmetic is
    verified against a real interval-join evaluation. Overlap contract:
    closed session [st, en] vs half-open window [ws, ws+30min).

    Scale shape: sessions fold from per-batch (user, day, min, max)
    combiner rows (min rides the same MAX fold as max via negation);
    the overlap count is pure vectorized int64 arithmetic per session —
    the engine never even needs the calendar's global extent (only the
    twin's generate_series does)."""
    HOUR = 3_600_000_000
    HALF = 1_800_000_000

    ds = read_parquet(_t(sf_dir, "events"), columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        us = _ts_us(t)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "day": pc.cast(pc.floor(pc.divide(
                pc.cast(us, pa.float64()), 86_400_000_000.0)),
                pa.int64()),
            "us": us})

    rows = ds.map_batches(prep, batch_format="pyarrow")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "day"], as_index=False) \
            .agg(st=("us", "min"), en=("us", "max"))
        # min rides the same MAX fold as max: min(st) = -max(-st)
        g["neg_st"] = -g["st"].to_numpy(dtype=np.int64)
        return g[["user_id", "day", "neg_st", "en"]] \
            .astype({"user_id": "int64", "day": "int64",
                     "neg_st": "int64", "en": "int64"})

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from .rayutil import salt_bucket
        b = b.copy()
        b["bucket"] = salt_bucket(b["user_id"].to_numpy(), 32) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns):
            return g
        s = g.groupby(["user_id", "day"], as_index=False) \
            .agg(neg_st=("neg_st", "max"), en=("en", "max"))
        st = -s["neg_st"].to_numpy(dtype=np.int64)
        en = s["en"].to_numpy(dtype=np.int64)
        # windows: hour index h (h % 7 == 0), [h·HOUR, h·HOUR + HALF).
        # overlap iff h·HOUR ≤ en AND h·HOUR + HALF > st:
        #   h_hi = floor(en / HOUR); h_lo = floor((st - HALF) / HOUR) + 1
        # count multiples of 7 in [h_lo, h_hi] (empty if h_lo > h_hi)
        h_hi = en // HOUR
        h_lo = (st - HALF) // HOUR + 1
        n = np.maximum(0, h_hi // 7 - (h_lo - 1) // 7)
        out = pd.DataFrame({
            "user_id": s["user_id"].to_numpy(dtype=np.int64),
            "day": s["day"].to_numpy(dtype=np.int64),
            "n_windows": n.astype(np.int64)})
        return out[out["n_windows"] > 0]

    out = rows.map_batches(partial, batch_format="pandas") \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("user_id", "day", "n_windows")})
    return out[["user_id", "day", "n_windows"]] \
        .sort_values(["user_id", "day"]).reset_index(drop=True)


Q_INTERVAL_OVERLAP_SQL = """
WITH s AS (
  SELECT user_id,
         (epoch_us(ts) // 86400000000) AS day,
         min(epoch_us(ts)) AS st, max(epoch_us(ts)) AS en
  FROM events GROUP BY 1, 2),
bounds AS (SELECT min(st) AS lo, max(en) AS hi FROM s),
w AS (
  SELECT h * 3600000000 AS ws, h * 3600000000 + 1800000000 AS we
  FROM (SELECT unnest(range(lo // 3600000000 - 1,
                            hi // 3600000000 + 2)) AS h FROM bounds)
  WHERE h % 7 = 0)
SELECT s.user_id, s.day::BIGINT AS day, count(*)::BIGINT AS n_windows
FROM s JOIN w ON w.ws <= s.en AND w.we > s.st
GROUP BY s.user_id, s.day
ORDER BY s.user_id, s.day
"""


QUERIES = {
    # oracle-checked
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q_nation_revenue": q_nation_revenue,
    "q_orders_priority": q_orders_priority,
    "q_events_hourly": q_events_hourly,
    "q_events_sessions": q_events_sessions,
    "q_dedup_exact": q_dedup_exact,
    "q_near_dup_groups": q_near_dup_groups,
    "q_token_stats": q_token_stats,
    "q_quality": q_quality,
    "q_lang_counts": q_lang_counts,
    "q_ann_topk": q_ann_topk,
    "q_top_tokens": q_top_tokens,
    "q_segment_order_stats": q_segment_order_stats,
    "q_status_revenue": q_status_revenue,
    "q_train_split": q_train_split,
    "q_asof_purchase_view": q_asof_purchase_view,
    "q_embedding_neardup_exact": q_embedding_neardup_exact,
    "q_whois_host_metadata": q_whois_host_metadata,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_rolling_events": q_rolling_events,
    "q_price_band_join": q_price_band_join,
    "q_quantity_quantiles": q_quantity_quantiles,
    "q_doc_hash_sample": q_doc_hash_sample,
    "q_distinct_tokens_exact": q_distinct_tokens_exact,
    "q_customers_no_orders": q_customers_no_orders,
    "q_customers_big_orders": q_customers_big_orders,
    "q_top_orders_per_segment": q_top_orders_per_segment,
    "q_grouped_quantiles": q_grouped_quantiles,
    "q_lineitem_top_by_price": q_lineitem_top_by_price,
    "q_token_stats_jsonl": q_token_stats_jsonl,
    "q_nations_per_region_csv": q_nations_per_region_csv,
    "q_repetition_quality": q_repetition_quality,
    "q_tfidf_top_terms": q_tfidf_top_terms,
    "q_common_ngrams": q_common_ngrams,
    "q_dup_substrings": q_dup_substrings,
    "q_seeded_shuffle": q_seeded_shuffle,
    "q_incremental_dedup": q_incremental_dedup,
    "q_latest_events": q_latest_events,
    "q_eval_carve": q_eval_carve,
    "q_token_budget_mix": q_token_budget_mix,
    "q_lineitem_corr": q_lineitem_corr,
    "q_lang_confusion": q_lang_confusion,
    "q_stratified_sample": q_stratified_sample,
    "q_doc_chunks": q_doc_chunks,
    "q_local_supplier_volume": q_local_supplier_volume,
    "q_decontaminate": q_decontaminate,
    "q_corpus_prep": q_corpus_prep,
    "q_adaptive_quality": q_adaptive_quality,
    "q_events_pivot": q_events_pivot,
    "q_price_histogram": q_price_histogram,
    "q_revenue_rollup": q_revenue_rollup,
    "q_bloom_filtered_orders": q_bloom_filtered_orders,
    "q_segment_dedup": q_segment_dedup,
    "q_source_quality_gate": q_source_quality_gate,
    "q_hopping_window": q_hopping_window,
    "q_distinct_users_by_type": q_distinct_users_by_type,
    "q_cheapest_supplier": q_cheapest_supplier,
    "q_interp_quantiles": q_interp_quantiles,
    "q_bigram_logprob": q_bigram_logprob,
    "q_weighted_sample": q_weighted_sample,
    "q_user_mode_event": q_user_mode_event,
    "q_event_gaps": q_event_gaps,
    "q_event_type_dense_rank": q_event_type_dense_rank,
    "q_extreme_events": q_extreme_events,
    "q_order_price_deciles": q_order_price_deciles,
    "q_nation_coverage": q_nation_coverage,
    "q_revenue_cube": q_revenue_cube,
    "q_source_entropy": q_source_entropy,
    "q_unicode_stats": q_unicode_stats,
    "q_user_zscore": q_user_zscore,
    "q_lang_heavy_hitters": q_lang_heavy_hitters,
    "q_cross_source_dups": q_cross_source_dups,
    "q_table_checksum": q_table_checksum,
    "q_event_transitions": q_event_transitions,
    "q_event_funnel": q_event_funnel,
    "q_gap_fill_hours": q_gap_fill_hours,
    "q_rrf_orders": q_rrf_orders,
    "q_label_centroids": q_label_centroids,
    "q_token_pmi_pairs": q_token_pmi_pairs,
    "q_quantity_mad": q_quantity_mad,
    "q_docs_all_terms": q_docs_all_terms,
    "q_props_field_stats": q_props_field_stats,
    "q_orders_by_dow": q_orders_by_dow,
    "q_user_dropoffs": q_user_dropoffs,
    "q_active_users_7d": q_active_users_7d,
    "q_bpe_token_stats": q_bpe_token_stats,
    "q_source_kl": q_source_kl,
    # rows-only
    "crawl_flagship": q_crawl_flagship,
    "crawl_bulk_extract": q_crawl_bulk_extract,
    "minhash_lsh_pairs": q_minhash_pairs,
    "minhash_dedup_keep": q_minhash_dedup_keep,
    "simhash_pairs": q_simhash_pairs,
    "embedding_neardup": q_embedding_neardup,
    "ivf_ann_topk": q_ivf_ann,
    "pq_ann_topk": q_pq_ann_topk,
    "ivfpq_ann_topk": q_ivfpq_ann_topk,
    "media_phash_dups": q_media_phash_dups,
    "media_audio_dups": q_media_audio_dups,
    "media_video_dups": q_media_video_dups,
    "doc_langid": q_langid,
    "doc_fingerprints": q_fingerprints,
    "crawl_har_ads": q_har_ads,
    "rss_feed_entries": q_rss_entries,
    "crawl_host_stats": q_crawl_stats,
    "crawl_host_metadata": q_crawl_host_metadata,
    "approx_distinct_tokens": q_approx_distinct_tokens,
    "approx_grouped_distinct": q_grouped_hll_distinct,
    "approx_heavy_hitters": q_heavy_hitters,
    "approx_token_freq": q_approx_token_freq,
    "approx_price_quantiles": q_approx_quantiles,
    "approx_grouped_quantiles": q_approx_grouped_quantiles,
    "q_mask_pii": q_mask_pii,
    "q_seq_packing": q_seq_packing,
    "q_customer_order_counts": q_customer_order_counts,
    "q_union_distinct_nations": q_union_distinct_nations,
    "q_running_user_totals": q_running_user_totals,
    "q_retention_cohorts": q_retention_cohorts,
    "q_paragraph_dedup": q_paragraph_dedup,
    "q_bm25_topk": q_bm25_topk,
    "q_embedding_components": q_embedding_components,
    "q_lm_quality": q_lm_quality,
    "q_dsir_weights": q_dsir_weights,
    "q_ngram_novelty": q_ngram_novelty,
    "q_embed_quant_stats": q_embed_quant_stats,
    "q_hard_negatives": q_hard_negatives,
    "q_source_temperature_mix": q_source_temperature_mix,
    "q_dedup_cascade": q_dedup_cascade,
    "q_embedding_norm_outliers": q_embedding_norm_outliers,
    "q_quality_curriculum": q_quality_curriculum,
    "q_gopher_quality": q_gopher_quality,
    "q_codepoint_entropy": q_codepoint_entropy,
    "q_zipf_slope": q_zipf_slope,
    "q_line_dup_stats": q_line_dup_stats,
    "q_c4_line_filter": q_c4_line_filter,
    "q_ngram_repetition": q_ngram_repetition,
    "q_semdedup": q_semdedup,
    "kmeans_clusters": q_kmeans_clusters,
    "crawl_pagerank": q_crawl_pagerank,
    "crawl_hits": q_crawl_hits,
    "crawl_anchor_texts": q_crawl_anchor_texts,
    "crawl_mirror_hosts": q_crawl_mirror_hosts,
    "crawl_sitemap_discovery": q_crawl_sitemap_discovery,
    "media_metadata": q_media_metadata,
    "media_jpeg_decode": q_media_jpeg_decode,
    "media_png_decode": q_media_png_decode,
    "media_gif_frames": q_media_gif_frames,
    "media_video_frames": q_media_video_frames,
    "media_audio_stats": q_media_audio_stats,
    "media_frame_sample": q_frame_sample,
    "media_resize": q_media_resize,
    "media_features": q_media_features,
    "media_thumbnail": q_media_thumbnail,
    "q_tokenizer_fertility": q_tokenizer_fertility,
    "q_mask_pii_extended": q_mask_pii_extended,
    "q_contamination_rate": q_contamination_rate,
    "q_ccnet_buckets": q_ccnet_buckets,
    "q_dup_span_coverage": q_dup_span_coverage,
    "q_prep_funnel": q_prep_funnel,
    "q_edit_distance_pairs": q_edit_distance_pairs,
    "q_snapshot_diff": q_snapshot_diff,
    "q_change_rate": q_change_rate,
    "q_decayed_freshness": q_decayed_freshness,
    "q_winsorized_stats": q_winsorized_stats,
    "q_tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "q_degree_powerlaw": q_degree_powerlaw,
    "q_watermark_lateness": q_watermark_lateness,
    "q_user_percent_rank": q_user_percent_rank,
    "q_leakage_free_split": q_leakage_free_split,
    "q_rolling_median": q_rolling_median,
    "q_normalize_text": q_normalize_text,
    "q_docs_all_terms_indexed": q_docs_all_terms_indexed,
    "q_repeat_buyers": q_repeat_buyers,
    "q_interval_overlap": q_interval_overlap,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q_nation_revenue": Q_NATION_SQL,
    "q_orders_priority": Q_PRIORITY_SQL,
    "q_events_hourly": Q_EVENTS_SQL,
    "q_events_sessions": Q_SESSIONS_SQL,
    "q_dedup_exact": Q_DEDUP_EXACT_SQL,
    "q_near_dup_groups": Q_NEAR_DUP_SQL,
    "q_token_stats": Q_TOKEN_SQL,
    "q_quality": Q_QUALITY_SQL,
    "q_lang_counts": Q_LANG_SQL,
    "q_ann_topk": Q_ANN_SQL,
    "q_top_tokens": Q_TOP_TOKENS_SQL,
    "q_segment_order_stats": Q_SEGMENT_SQL,
    "q_status_revenue": Q_STATUS_REVENUE_SQL,
    "q_train_split": Q_TRAIN_SPLIT_SQL,
    "q_asof_purchase_view": Q_ASOF_SQL,
    "q_embedding_neardup_exact": Q_EMB_EXACT_SQL,
    "q_whois_host_metadata": Q_WHOIS_SQL,
    "doc_langid": _langid_sql(),
    "simhash_pairs": Q_SIMHASH_SQL,
    "minhash_lsh_pairs": _minhash_sql(),
    "minhash_dedup_keep": _minhash_keep_sql(),
    "approx_heavy_hitters": Q_HEAVY_SQL,
    "q_mask_pii": Q_MASK_PII_SQL,
    "q_seq_packing": Q_SEQ_PACKING_SQL,
    "q_customer_order_counts": Q_ORDER_COUNTS_SQL,
    "q_union_distinct_nations": Q_UNION_NATIONS_SQL,
    "q_running_user_totals": Q_RUNNING_USER_SQL,
    "doc_fingerprints": Q_FPS_SQL,
    "q_ngram_jaccard": Q_NGRAM_JACCARD_SQL,
    "q_rolling_events": Q_ROLLING_SQL,
    "q_price_band_join": Q_BAND_JOIN_SQL,
    "q_quantity_quantiles": Q_QUANTILES_SQL,
    "q_doc_hash_sample": Q_HASH_SAMPLE_SQL,
    "q_distinct_tokens_exact": Q_DISTINCT_SQL,
    "q_customers_no_orders": Q_NO_ORDERS_SQL,
    "q_customers_big_orders": Q_BIG_ORDERS_SQL,
    "q_top_orders_per_segment": Q_TOP_PER_SEGMENT_SQL,
    "q_grouped_quantiles": Q_GROUPED_QUANTILES_SQL,
    "q_lineitem_top_by_price": Q_TOP_PRICE_SQL,
    "q_token_stats_jsonl": Q_TOKEN_SQL,
    "q_nations_per_region_csv": Q_NATIONS_CSV_SQL,
    "q_repetition_quality": Q_REPETITION_SQL,
    "q_tfidf_top_terms": Q_TFIDF_SQL,
    "q_common_ngrams": Q_COMMON_NGRAMS_SQL,
    "q_dup_substrings": Q_DUP_SUBSTR_SQL,
    "q_seeded_shuffle": Q_SEEDED_SHUFFLE_SQL,
    "q_incremental_dedup": Q_INCR_DEDUP_SQL,
    "q_latest_events": Q_LATEST_EVENTS_SQL,
    "q_eval_carve": Q_EVAL_CARVE_SQL,
    "q_token_budget_mix": Q_TOKEN_BUDGET_SQL,
    "q_lineitem_corr": Q_LINEITEM_CORR_SQL,
    "q_lang_confusion": _lang_confusion_sql(),
    "q_stratified_sample": Q_STRATIFIED_SQL,
    "q_doc_chunks": Q_DOC_CHUNKS_SQL,
    "q_local_supplier_volume": Q_LOCAL_SUPPLIER_SQL,
    "q_decontaminate": Q_DECONTAMINATE_SQL,
    "q_corpus_prep": Q_CORPUS_PREP_SQL,
    "q_adaptive_quality": Q_ADAPTIVE_QUALITY_SQL,
    "q_events_pivot": Q_EVENTS_PIVOT_SQL,
    "q_price_histogram": Q_PRICE_HISTOGRAM_SQL,
    "q_revenue_rollup": Q_REVENUE_ROLLUP_SQL,
    "q_bloom_filtered_orders": Q_BLOOM_ORDERS_SQL,
    "q_segment_dedup": Q_SEGMENT_DEDUP_SQL,
    "q_source_quality_gate": Q_SOURCE_GATE_SQL,
    "q_hopping_window": Q_HOPPING_SQL,
    "q_distinct_users_by_type": Q_DISTINCT_USERS_SQL,
    "q_cheapest_supplier": Q_CHEAPEST_SUPPLIER_SQL,
    "q_interp_quantiles": Q_INTERP_QUANTILES_SQL,
    "q_bigram_logprob": Q_BIGRAM_LOGPROB_SQL,
    "q_weighted_sample": Q_WEIGHTED_SAMPLE_SQL,
    "q_user_mode_event": Q_USER_MODE_SQL,
    "q_event_gaps": Q_EVENT_GAPS_SQL,
    "q_event_type_dense_rank": Q_EVENT_TYPE_DENSE_RANK_SQL,
    "q_extreme_events": Q_EXTREME_EVENTS_SQL,
    "q_order_price_deciles": Q_ORDER_PRICE_DECILES_SQL,
    "q_nation_coverage": Q_NATION_COVERAGE_SQL,
    "q_revenue_cube": Q_REVENUE_CUBE_SQL,
    "q_source_entropy": Q_SOURCE_ENTROPY_SQL,
    "q_unicode_stats": Q_UNICODE_STATS_SQL,
    "q_user_zscore": Q_USER_ZSCORE_SQL,
    "q_lang_heavy_hitters": Q_LANG_HEAVY_SQL,
    "q_cross_source_dups": Q_CROSS_SOURCE_DUPS_SQL,
    "q_table_checksum": Q_TABLE_CHECKSUM_SQL,
    "q_event_transitions": Q_EVENT_TRANSITIONS_SQL,
    "q_event_funnel": Q_EVENT_FUNNEL_SQL,
    "q_gap_fill_hours": Q_GAP_FILL_HOURS_SQL,
    "q_rrf_orders": Q_RRF_ORDERS_SQL,
    "q_label_centroids": Q_LABEL_CENTROIDS_SQL,
    "q_token_pmi_pairs": Q_TOKEN_PMI_PAIRS_SQL,
    "q_quantity_mad": Q_QUANTITY_MAD_SQL,
    "q_docs_all_terms": Q_DOCS_ALL_TERMS_SQL,
    "q_props_field_stats": Q_PROPS_FIELD_STATS_SQL,
    "q_orders_by_dow": Q_ORDERS_BY_DOW_SQL,
    "q_user_dropoffs": Q_USER_DROPOFFS_SQL,
    "q_active_users_7d": Q_ACTIVE_USERS_7D_SQL,
    "q_bpe_token_stats": Q_BPE_TOKEN_STATS_SQL,
    "q_source_kl": Q_SOURCE_KL_SQL,
    "q_retention_cohorts": Q_RETENTION_COHORTS_SQL,
    "q_paragraph_dedup": Q_PARAGRAPH_DEDUP_SQL,
    "q_bm25_topk": _bm25_sql(),
    "q_embedding_components": Q_EMB_COMPONENTS_SQL,
    "q_lm_quality": Q_LM_QUALITY_SQL,
    "q_dsir_weights": Q_DSIR_SQL,
    "q_ngram_novelty": Q_NGRAM_NOVELTY_SQL,
    "q_embed_quant_stats": Q_EMBED_QUANT_SQL,
    "q_hard_negatives": Q_HARD_NEG_SQL,
    "q_source_temperature_mix": Q_SOURCE_TEMP_SQL,
    "q_dedup_cascade": Q_DEDUP_CASCADE_SQL,
    "q_embedding_norm_outliers": Q_NORM_OUTLIERS_SQL,
    "q_quality_curriculum": Q_QUALITY_CURRICULUM_SQL,
    "q_gopher_quality": Q_GOPHER_QUALITY_SQL,
    "q_codepoint_entropy": Q_CODEPOINT_ENTROPY_SQL,
    "q_zipf_slope": Q_ZIPF_SLOPE_SQL,
    "q_line_dup_stats": Q_LINE_DUP_SQL,
    "q_c4_line_filter": Q_C4_LINE_SQL,
    "q_ngram_repetition": Q_NGRAM_REP_SQL,
    "q_semdedup": Q_SEMDEDUP_SQL,
    "q_tokenizer_fertility": Q_TOKENIZER_FERTILITY_SQL,
    "q_mask_pii_extended": Q_MASK_PII_EXT_SQL,
    "q_contamination_rate": Q_CONTAMINATION_RATE_SQL,
    "q_ccnet_buckets": Q_CCNET_BUCKETS_SQL,
    "q_dup_span_coverage": Q_DUP_SPAN_COVERAGE_SQL,
    "q_prep_funnel": Q_PREP_FUNNEL_SQL,
    "q_edit_distance_pairs": Q_EDIT_DISTANCE_SQL,
    "q_snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
    "q_change_rate": Q_CHANGE_RATE_SQL,
    "q_decayed_freshness": Q_DECAYED_FRESHNESS_SQL,
    "q_winsorized_stats": Q_WINSORIZED_STATS_SQL,
    "q_tfidf_cosine_pairs": Q_TFIDF_COSINE_SQL,
    "q_degree_powerlaw": Q_DEGREE_POWERLAW_SQL,
    "q_watermark_lateness": Q_WATERMARK_LATENESS_SQL,
    "q_user_percent_rank": Q_USER_PERCENT_RANK_SQL,
    "q_leakage_free_split": _leakage_free_split_sql(),
    "q_rolling_median": Q_ROLLING_MEDIAN_SQL,
    "q_normalize_text": Q_NORMALIZE_TEXT_SQL,
    # same twin as the scan path — the index must reproduce it exactly
    "q_docs_all_terms_indexed": Q_DOCS_ALL_TERMS_SQL,
    "q_repeat_buyers": Q_REPEAT_BUYERS_SQL,
    "q_interval_overlap": Q_INTERVAL_OVERLAP_SQL,
}
