"""Custom join operators Ray Data lacks natively (task brief: as-of /
range joins), built as groupby-bucket compositions per the documented
partitioning assumption: both sides hash-partition on the equality key,
and each group is small enough to sort in memory (true for per-user /
per-entity event streams; salt the key if a single entity's history
outgrows a worker).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def asof_join(left: "rd.Dataset", right: "rd.Dataset", *, by: str,
              on: str, value_cols: list[str],
              suffix: str = "_right") -> "rd.Dataset":
    """For each left row, attach the right row with the greatest
    ``on`` ≤ left's ``on`` within the same ``by`` group (classic as-of
    join, e.g. most recent prior marker event). Implemented as
    union-with-side-tag → salt ``by`` into buckets → ``groupby(bucket)``
    (the single shuffle) → ONE vectorized ``pd.merge_asof(..., by=)``
    per bucket. Bucketing (not grouping by the raw key) matters at
    scale: one map_groups group per entity costs ~1 ms of Python each,
    while merge_asof's ``by=`` argument handles every entity in a
    bucket in a single pass."""
    from ..rayutil import salt_bucket

    lt = left.map_batches(lambda df: df.assign(_side=0), batch_format="pandas")
    rt = right.map_batches(lambda df: df.assign(_side=1), batch_format="pandas")
    both = lt.union(rt).map_batches(
        lambda df: df.assign(_bucket=salt_bucket(df[by])),
        batch_format="pandas")

    left_cols = [c for c in left.schema().names]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][left_cols].sort_values(on, kind="stable")
        rg = g[g["_side"] == 1][[by, on] + value_cols] \
            .sort_values(on, kind="stable") \
            .rename(columns={on: on + suffix})
        if not len(lg):
            # keep the full output schema (on+suffix AND value_cols) so
            # empty buckets emit schema-consistent zero-row blocks
            return lg.assign(**{on + suffix: pd.NaT},
                             **{c: pd.Series([], dtype="float64")
                                for c in value_cols})
        out = pd.merge_asof(lg, rg, left_on=on, right_on=on + suffix,
                            by=by, direction="backward")
        return out

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pandas")
