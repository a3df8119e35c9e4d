"""Shared Ray-execution utilities."""

from __future__ import annotations

from contextlib import contextmanager

import ray.data as rd


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
