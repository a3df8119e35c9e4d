"""Regression tests for the empty-sort-partition regime (tiny data ×
high parallelism): Ray's sort-based groupby hands map_groups UDFs
ZERO-COLUMN pandas frames for empty partitions, and emits zero-column
empty blocks that break a downstream native join's key resolution
(Acero FieldRef error). Found by running the registry at sf0.001 with
num_cpus=32 — the driver gate (sf0.01) and tests (4 CPUs) never hit it.

The repro here forces the regime portably: repartition a tiny input to
many more blocks than rows before the grouped fold."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from news_crawler_ray.rayutil import bucketed_group_sum, \
    light_shuffle_aggregators
from news_crawler_ray.queries import QUERIES


def test_bucketed_group_sum_tiny_input_feeds_join(ray_session):
    """3 rows spread over 16 blocks: most sort partitions are empty.
    The fold must still produce schema-clean blocks a native join can
    key on."""
    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 2], "v": [10, 20, 30]})).repartition(16)
    summed = bucketed_group_sum(left, ["k"], {"v": "v_sum"})
    base = rd.from_pandas(pd.DataFrame({"k": [1, 2], "tag": ["a", "b"]}))
    with light_shuffle_aggregators():
        out = base.join(summed, join_type="inner", num_partitions=4,
                        on=("k",)).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2]
    assert list(out["v_sum"]) == [10, 50]


def test_grouped_zscore_tiny_input(ray_session):
    """grouped_zscore's moments feed a native join; with 4 rows over
    16 blocks the moments fold must not leak zero-column blocks."""
    from news_crawler_ray.functions.windows import grouped_zscore
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 8, 8], pa.int64()),
        "value_centi": pa.array([100, 300, 50, 150], pa.int64()),
    })).repartition(16)
    out = grouped_zscore(ds, key_col="user_id",
                         value_col="value_centi").to_pandas()
    assert len(out) == 4
    # symmetric two-point groups: z = ±0.707 → ⌊±707.1⌋
    got = out.sort_values("event_id")["z_milli"].tolist()
    assert got == [-708, 707, -708, 707]


def _write_tables(d: str, rich_suppliers: bool) -> None:
    cust = pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [3, 4],
                         "c_acctbal": [9950.0, 9990.0]})
    bal = 9000.0 if rich_suppliers else 10.0
    supp = pd.DataFrame({"s_suppkey": [1], "s_nationkey": [3],
                         "s_acctbal": [bal]})
    pq.write_table(pa.Table.from_pandas(cust, preserve_index=False),
                   os.path.join(d, "customer.parquet"))
    pq.write_table(pa.Table.from_pandas(supp, preserve_index=False),
                   os.path.join(d, "supplier.parquet"))


def test_nation_coverage_empty_side(ray_session, tmp_path):
    """FULL OUTER with one side filtered to zero rows: the empty side
    has no schema for the native join — the query must fall back and
    zero-fill."""
    d = str(tmp_path)
    _write_tables(d, rich_suppliers=False)
    out = QUERIES["q_nation_coverage"](d).set_index("nationkey")
    assert list(out.index) == [3, 4]
    assert out["n_suppliers"].tolist() == [0, 0]
    assert out["n_customers"].tolist() == [1, 1]


def test_nation_coverage_both_sides(ray_session, tmp_path):
    d = str(tmp_path)
    _write_tables(d, rich_suppliers=True)
    out = QUERIES["q_nation_coverage"](d).set_index("nationkey")
    assert out.loc[3, "n_suppliers"] == 1
    assert out.loc[4, "n_suppliers"] == 0


def test_event_funnel_zero_conversions(ray_session, tmp_path):
    """No purchase follows any click: the funnel result is an empty
    frame that must keep its typed schema."""
    d = str(tmp_path)
    ev = pd.DataFrame({
        "event_id": [0, 1],
        "user_id": [5, 5],
        "event_type": ["click", "view"],
        "ts": pd.to_datetime(["2024-01-01T00:00:00",
                              "2024-01-01T00:30:00"]).astype(
                                  "datetime64[us]"),
        "value": [1.0, 2.0],
        "props": ["{}", "{}"]})
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(d, "events.parquet"))
    out = QUERIES["q_event_funnel"](d)
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "first_click_us",
                                 "first_purchase_us"]
