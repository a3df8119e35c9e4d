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
