"""Output-audit operators: order-independent corpus checksums for
validating resumable / partitioned pipeline output (did the re-run
produce the same table, bit-for-bit, regardless of row order and
partitioning?). At 100 TB a full-table diff is a shuffle; a mergeable
checksum is one map pass + a scalar fold.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

# Mersenne prime 2^61 - 1: the modulus keeps per-batch partials well
# inside int64 while DuckDB's HUGEINT sum reduces with the same value.
CHECKSUM_MOD = (1 << 61) - 1


def table_checksum(ds: "rd.Dataset", *, cols: list[str]) -> pd.DataFrame:
    """Order- and partitioning-independent checksum of a table
    projection: per row, the 52-bit integer lead of
    ``md5(col1 ␟ col2 ␟ …)`` (unit-separator joined, stringified
    columns — NULLs are the caller's problem, match the SQL twin's
    concat_ws); summed mod 2^61−1 with the row count.

    Scale shape: one map pass emitting a single (n, partial) row per
    batch; the driver folds one tiny row per batch with exact Python
    ints (no int64 overflow at any batch count). Two runs that produce
    the same multiset of rows produce the same (n_rows, checksum) —
    the cheap equality proof for resumable re-runs and replication.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        total = 0
        for tup in zip(*(batch[c] for c in cols)):
            s = "\x1f".join(str(v) for v in tup)
            total += int(hashlib.md5(s.encode("utf-8"))
                         .hexdigest()[:13], 16)
        return pd.DataFrame({"n": pd.Series([len(batch)], dtype="int64"),
                             "s": pd.Series([total % CHECKSUM_MOD],
                                            dtype="int64")})

    parts = ds.select_columns(list(cols)) \
        .map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    checksum = int(sum(int(x) for x in parts["s"]) % CHECKSUM_MOD) \
        if len(parts) else 0
    return pd.DataFrame({"n_rows": pd.Series([n], dtype="int64"),
                         "checksum": pd.Series([checksum],
                                               dtype="int64")})
