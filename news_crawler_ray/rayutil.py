"""Shared Ray-execution utilities."""

from __future__ import annotations

import logging
from contextlib import contextmanager

import ray.data as rd


class _KnownCosmeticFilter(logging.Filter):
    """Drops exactly two KNOWN-COSMETIC Ray Data warnings (and nothing
    else — real schema divergences still warn):

    1. ``Failed to hash the schemas (for deduplication): unhashable
       type: 'dict'`` (arrow_ops/transform_pyarrow.py): Ray's
       schema-dedup fast path tries ``set(schemas)``, but a
       ``pyarrow.Schema`` carrying parquet PANDAS METADATA is
       unhashable (``hash(pq.read_schema(f))`` → TypeError for any
       pandas-written file, including the driver's testdata). Ray falls
       back to the full unify — correctness unaffected, and the
       metadata is in the input files, not ours to strip.

    2. ``Operator produced a RefBundle with a different schema … new
       schema: PandasBlockSchema(names=[], types=[])``
       (streaming_executor_state.py): a ``map_groups`` wrapper yields
       NO batch for an empty sort partition, so Ray emits an untyped
       empty block — our UDF is never called and cannot type it (every
       repo UDF already types its own empty outputs, the f61a2e2
       pattern). Downstream unify treats empty schemas as wildcards;
       benign by construction.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if (msg.startswith("Failed to hash the schemas")
                and "unhashable type" in msg):
            return False
        if (msg.startswith("Operator produced a RefBundle with a "
                           "different schema")
                and ("new schema: PandasBlockSchema(names=[], types=[])"
                     in msg
                     # empty ARROW schema variant (str(pa.schema([])) is
                     # ""): same untyped-empty-block cause
                     or "new schema: . This may lead" in msg)):
            return False
        return True


def _strip_schema_metadata(t):
    """Drop schema-level metadata from a block (metadata-only op — the
    column buffers are untouched)."""
    return t.replace_schema_metadata(None)


def read_parquet(path, **kwargs):
    """``rd.read_parquet`` + per-block schema-metadata strip, fused into
    the read stage.

    Parquet files written by pandas carry a ``pandas`` schema-metadata
    dict that makes ``pyarrow.Schema`` UNHASHABLE (``hash(schema)`` →
    ``TypeError: unhashable type: 'dict'``); every Ray Data schema-dedup
    fast path that tries ``set(schemas)`` — read-split unify,
    hash-shuffle/join aggregator actors — then logs ``Failed to hash
    the schemas`` once per block batch and falls back to the slow
    unify. Two layers: (1) a STRIPPED ``schema=`` override makes the
    read tasks themselves emit metadata-free blocks (the read-split
    unify runs inside the ReadParquet task, BEFORE any map of ours can
    strip — the only place the fix can live is the datasource schema);
    (2) the explicit strip map keeps the guarantee even when the
    override can't be derived (directory inputs, caller-supplied
    schema). The override must be pre-projected to ``columns`` —
    Ray's parquet datasource rebuilds each batch against the given
    schema verbatim, and a full-width schema with projected batches is
    an ArrowInvalid."""
    if "schema" not in kwargs and not (
            "filter" in kwargs and kwargs.get("columns") is not None):
        # columns+filter together are excluded: Ray projects batches to
        # `columns` but binds the filter against the GIVEN schema, so a
        # filter on a non-projected column (q1's l_shipdate) fails to
        # resolve — those reads keep the strip-map-only path
        try:
            first = path[0] if isinstance(path, (list, tuple)) else path
            sch = _pq().read_schema(first).remove_metadata()
            cols = kwargs.get("columns")
            if cols is not None:
                sch = _pa().schema([sch.field(c) for c in cols])
            kwargs["schema"] = sch
        except Exception:
            pass   # directories / odd layouts: the strip map still runs
    return rd.read_parquet(path, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow")


def _pa():
    import pyarrow
    return pyarrow


def _pq():
    import pyarrow.parquet
    return pyarrow.parquet


# NOTE: a worker_process_setup_hook variant of the installs below was
# tried and reverted: any non-default runtime_env makes the raylet
# re-resolve the env on every worker launch (~1 s churn per worker,
# continuous). The stripped schema= override in read_parquet plus the
# package-import installs cover every block our pipelines produce.


def project_blocks(ds, cols: list[str]):
    """Column projection + schema-metadata strip as ONE map stage.

    Used on hash-join outputs that feed ANOTHER shuffle (join → join /
    join → sort chains): the join aggregator actors rebuild blocks via
    pandas (re-attaching the unhashable pandas schema metadata — they
    run no user code, so the package-import patch can't reach them),
    and the native Project operator passes EMPTY join partitions
    through unprojected, so their schema diverges from the non-empty
    blocks'. One explicit ``pyarrow`` map normalizes both: every block
    — empty included — leaves with exactly ``cols`` and no metadata."""
    import pyarrow as _pa

    def proj(t: "_pa.Table") -> "_pa.Table":
        return t.select(cols).replace_schema_metadata(None)

    # explicit batch_size: the batch bundler COALESCES blocks, which
    # drops zero-column empty pass-through blocks (with batch_size=None
    # an empty block skips the UDF entirely and would reach the next
    # join/shuffle with no key columns — an Acero FieldRef error)
    return ds.map_batches(proj, batch_format="pyarrow", batch_size=4096)


def install_cosmetic_log_filters() -> None:
    """Attach :class:`_KnownCosmeticFilter` to the two Ray Data loggers
    that emit the known-cosmetic warnings (idempotent)."""
    for name in ("ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.execution.streaming_executor_state"):
        lg = logging.getLogger(name)
        if not any(isinstance(f, _KnownCosmeticFilter) for f in lg.filters):
            lg.addFilter(_KnownCosmeticFilter())


# Ray versions on which the PandasBlockAccessor.to_arrow re-wrap below
# has been verified (suite green, aggregator warnings gone). Prefix
# match so patch releases of a vetted minor pass.
_VETTED_RAY = ("2.49.",)


def install_pandas_block_metadata_strip() -> None:
    """Make Ray's pandas→arrow BLOCK conversion emit metadata-free
    schemas (idempotent; guarded re-wrap of
    ``PandasBlockAccessor.to_arrow``).

    Why: every ``batch_format="pandas"`` stage that feeds a hash
    shuffle (``groupby().aggregate``, ``Dataset.join``) has its output
    blocks converted via ``pa.Table.from_pandas``, which attaches the
    ``pandas`` schema-metadata dict — making the schema UNHASHABLE, so
    every HashShuffleAggregator actor logs ``Failed to hash the
    schemas`` per bundle and falls back to the slow unify path. The
    aggregator actors never import user code, so neither a logging
    filter nor a per-site strip can reach them; stripping at the
    conversion (which runs in OUR fused map tasks, where this package
    is imported) fixes producer and consumer alike. Metadata-only:
    column buffers untouched, and nothing downstream reads the pandas
    metadata (plain columns, range index throughout the engine).

    VERSION-COUPLED to Ray internals: re-wraps a private accessor
    method, so it refuses to install on an unvetted Ray rather than
    silently patching changed internals. Extend ``_VETTED_RAY`` only
    after re-running the suite (test_robustness pins both the apply
    path and the loud-failure path)."""
    import ray

    if not any(ray.__version__.startswith(v) for v in _VETTED_RAY):
        raise RuntimeError(
            "install_pandas_block_metadata_strip: Ray "
            f"{ray.__version__} is not a vetted version {_VETTED_RAY}; "
            "this patch re-wraps ray.data._internal.pandas_block."
            "PandasBlockAccessor.to_arrow and must be re-verified "
            "against the new Ray before being enabled (then add the "
            "version to _VETTED_RAY in rayutil.py).")
    from ray.data._internal.pandas_block import PandasBlockAccessor

    if not callable(getattr(PandasBlockAccessor, "to_arrow", None)):
        raise RuntimeError(
            "install_pandas_block_metadata_strip: PandasBlockAccessor."
            "to_arrow is missing on this Ray build — the internals this "
            "patch relies on have changed; re-verify and update "
            "rayutil.py.")
    if getattr(PandasBlockAccessor.to_arrow, "_ncr_nometa", False):
        return
    orig = PandasBlockAccessor.to_arrow

    def to_arrow(self):
        t = orig(self)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    to_arrow._ncr_nometa = True
    PandasBlockAccessor.to_arrow = to_arrow


@contextmanager
def light_shuffle_aggregators(cpus_per_partition: float = 0.1):
    """Scoped CPU sizing for join/shuffle aggregator actors. Ray's
    default reserves ``min(1, CPUs/2/num_partitions)`` per partition, so
    two CONCURRENT joins on a small CPU budget (e.g. the 4-CPU test
    session) reserve every core for aggregators and starve the map tasks
    feeding them — a structural deadlock. 0.1 CPU/partition keeps
    multi-join DAGs schedulable; aggregators are concat/IO-bound so the
    oversubscription is harmless.

    Use around the ``.materialize()`` that executes a multi-join DAG
    (the override is read at execution time, not plan-build time)."""
    ctx = rd.DataContext.get_current()
    prev_j = ctx.join_operator_actor_num_cpus_per_partition_override
    prev_s = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    ctx.join_operator_actor_num_cpus_per_partition_override = \
        cpus_per_partition
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
        cpus_per_partition
    try:
        yield
    finally:
        ctx.join_operator_actor_num_cpus_per_partition_override = prev_j
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            prev_s


def shuffle_partitions(per_cpu: float = 1.0, *, lo: int = 4,
                       hi: int = 512) -> int:
    """Shuffle/partition width derived from the CLUSTER's CPU count
    instead of a constant tuned to one box. ``per_cpu`` is the
    partitions-per-CPU ratio measured good at 32 CPUs — e.g. the
    hamming_pairs verify repartition used a measured 32 (1.0/CPU) and
    its join 8 (0.25/CPU); those ratios now hold on a 1024-CPU
    cluster instead of silently capping task parallelism at the
    sandbox constants. Clamped to [lo, hi]: ``lo`` keeps tiny test
    sessions (4 CPUs) at the block counts the empty-partition suite
    exercises; ``hi`` bounds hash-shuffle aggregator overhead, which
    grows with partition count (the measured reason the join width
    stays BELOW the map width)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return int(min(hi, max(lo, round((cpus or 8) * per_cpu))))


_OBJ_CACHE: dict[str, object] = {}


def cached_object(ref):
    """``ray.get`` with a per-worker-process deserialization cache.
    Plasma memory-maps the serialized bytes zero-copy, but non-Arrow
    payloads (dicts, frozensets) are UNPICKLED on every ``ray.get`` —
    a per-batch cost when a broadcast ref is probed inside a
    ``map_batches`` UDF. Keyed by ref hex; entries live for the worker
    process's lifetime (broadcast sides are few and small relative to
    the worker heap)."""
    import ray

    key = ref.hex()
    if key not in _OBJ_CACHE:
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def salt_bucket(values, n: int = 64):
    """Deterministic bucket ids for key-salted grouping (the
    many-keys-per-group pattern: shuffle on ~n buckets, then one
    vectorized pandas pass per bucket, instead of one map_groups group
    per key at ~1 ms of Python each).

    Accepts a numpy array / pandas Series / pyarrow array of integer,
    string or binary keys and returns an int32 numpy array: integers
    bucket by ``value % n`` (cheap, uniform for id-like keys), strings
    and bytes by ``crc32 % n``. One shared implementation so salting
    sites cannot drift into key-type bugs (an int-only cast on a string
    key was exactly the class of bug this replaces)."""
    import zlib

    import numpy as np
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type):
            v = values.to_numpy(zero_copy_only=False).astype(np.int64)
            return (v % n).astype(np.int32)
        values = values.to_pylist()
    else:
        arr = np.asarray(values)
        if np.issubdtype(arr.dtype, np.integer):
            return (arr.astype(np.int64) % n).astype(np.int32)
        if np.issubdtype(arr.dtype, np.floating):
            raise TypeError("salt_bucket: float keys are not groupable "
                            "keys; cast or hash explicitly")
        values = list(values)
    out = np.empty(len(values), dtype=np.int32)
    for i, v in enumerate(values):
        if isinstance(v, int):
            out[i] = v % n
        elif isinstance(v, bytes):
            out[i] = zlib.crc32(v) % n
        else:
            out[i] = zlib.crc32(str(v).encode()) % n
    return out


def bucketed_group_sum(ds, key_cols: list[str], sum_cols: dict[str, str],
                       num_buckets: int = 64):
    """Exact ``SELECT key…, sum(col)… GROUP BY key…`` as a salted-bucket
    map_groups fold — the replacement for ``groupby(key).aggregate(Sum)``
    when the aggregate's input is PANDAS blocks with more than a few
    thousand rows: Ray's sort-aggregate reduce degrades ~12× on pandas
    blocks (measured: 62 k partial rows → 8-12 s vs 0.5 s for identical
    data in arrow blocks), while the bucket fold shuffles the same rows
    but reduces them in one vectorized pandas groupby per bucket (~2 s).
    If the upstream map can cheaply emit arrow instead, prefer that +
    the native aggregate; use this when the partial-building map is
    pandas-idiomatic (multi-column named aggs).

    ``sum_cols`` maps input column → output column name. Keys co-locate
    by a salt of the FIRST key column (identical key tuples share it by
    definition). Returns a Dataset of one row per distinct key tuple."""
    import pandas as pd

    def add_bucket(batch: "pd.DataFrame") -> "pd.DataFrame":
        batch = batch.copy()
        batch["bucket"] = salt_bucket(batch[key_cols[0]].to_numpy(),
                                      num_buckets) if len(batch) \
            else pd.Series([], dtype="int32")
        return batch

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        if not len(g.columns):
            # empty sort partition: Ray hands map_groups a ZERO-COLUMN
            # frame (no schema); pass it through — project_blocks below
            # coalesces it away before any consumer sees it
            return g
        out = g.groupby(key_cols, as_index=False)[list(sum_cols)].sum()
        out = out.rename(columns=sum_cols)
        return out.astype({c: "int64" for c in sum_cols.values()})

    folded = ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")
    # normalize: zero-column empty blocks from empty sort partitions
    # would break a downstream native join (Acero FieldRef error on the
    # key); the coalescing projection drops them and strips metadata
    return project_blocks(folded, key_cols + list(sum_cols.values()))
