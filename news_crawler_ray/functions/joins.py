"""Custom join operators Ray Data lacks natively (task brief: as-of /
range joins), built as groupby-bucket compositions per the documented
partitioning assumption: both sides hash-partition on the equality key,
and each group is small enough to sort in memory (true for per-user /
per-entity event streams; salt the key if a single entity's history
outgrows a worker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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


def salted_join(big: "rd.Dataset", small: "rd.Dataset", *, on: str,
                salt: int = 8, num_partitions: int = 8,
                id_col: str | None = None) -> "rd.Dataset":
    """Skew-safe inner join: a HOT key (one key holding a large
    fraction of the big side) makes a plain hash join serialize on one
    partition — the aggregator holding that key receives everything.
    Salting splits each key's big-side rows across ``salt`` sub-keys
    (deterministic: hash of the row id, or a per-batch row counter) and
    replicates each small-side row once per sub-key, so the hot key's
    rows spread over ``salt`` partitions; result rows are identical to
    the unsalted join (pinned in tests).

    Cost model: small side inflates ``salt``×, big side doesn't move
    more than before — the right trade exactly when small ≪ big, which
    is the only regime where a broadcast ISN'T already the answer (too
    big to ship to every task, small enough that salt× replication is
    noise next to the big side)."""
    import zlib

    from ..rayutil import project_blocks

    big_cols = [c for c in big.schema().names]
    small_cols = [c for c in small.schema().names]

    def add_salt_big(t: pa.Table) -> pa.Table:
        n = len(t)
        if id_col is not None and id_col in t.column_names:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            s = (ids % salt).astype(np.int32)
        else:
            s = (np.arange(n) % salt).astype(np.int32)
        return t.append_column("_salt", pa.array(s, pa.int32()))

    def replicate_small(t: pa.Table) -> pa.Table:
        n = len(t)
        idx = np.repeat(np.arange(n), salt)
        rep = t.take(pa.array(idx))
        s = np.tile(np.arange(salt, dtype=np.int32), n)
        return rep.append_column("_salt", pa.array(s, pa.int32()))

    joined = project_blocks(big.map_batches(add_salt_big,
                                            batch_format="pyarrow"),
                            big_cols + ["_salt"]) \
        .join(project_blocks(small.map_batches(replicate_small,
                                               batch_format="pyarrow"),
                             small_cols + ["_salt"]),
              join_type="inner", num_partitions=num_partitions,
              on=(on, "_salt"))
    out_cols = big_cols + [c for c in small_cols if c != on]
    return project_blocks(joined, out_cols)
