"""Per-host politeness frontier, sharded across Ray actors.

Rebuilds the reference's frontier semantics — in-memory dict + SQLite
candidates query (crawler.py:26, 305-393; datacollector.py:171-205) — as
the north_rule design: hosts are hash-partitioned across shard actors
(urlnorm.host_shard); each shard keeps, per host,

- two FIFO tiers: webnews first, then other (the reference's candidates
  query dequeues ``is_webnews=1`` first, insertion order —
  datacollector.py:171-177, _datacollector_statements.py:32-36);
- a politeness budget: ``max_in_flight`` per host (reference analogue:
  6 browser workers per domain, main.py:19) and ``min_interval_ms``
  between fetch starts (north_rule addition);
- robots disallow prefixes (north_rule addition; the reference has no
  robots handling) applied at enqueue;
- an attempt budget (max 2, crawler.py:342): failed work re-enters its
  tier at its original position until exhausted.

Determinism: every enqueued item carries a lineage sort key
``(round_added, seq64)`` derived from (referrer dequeue position, link
position) — pipelines/crawl.py — and tiers are kept sorted by it, so the
dequeue order is a pure function of the discovery graph, independent of
RPC arrival interleaving (SURVEY.md §7.4 item 2: per-host order parity).

The dequeue log (host, host_seq, url, priority_tier) is the
``golden_crawl_order`` conformance artifact (FIXTURES.md §4.2).

Skew: a hot host's dequeue rate is bounded by its politeness budget — by
design (SURVEY.md §7.4 item 4); other hosts on the same shard are not
blocked since dequeue rounds sweep all hosts.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.parquet as pq

import ray

_EMPTY_BATCH = {
    "url": [], "host": [], "attempts": [], "is_webnews": [],
    "url_to_refer": [], "host_seq": [], "tier": [],
    "round_added": [], "seq64": [],
}


class _HostState:
    __slots__ = ("tiers", "heads", "dirty", "in_flight", "host_seq",
                 "next_allowed_ms", "max_in_flight", "min_interval_ms",
                 "max_attempts", "robots_disallow")

    def __init__(self, max_in_flight=6, min_interval_ms=0, max_attempts=2,
                 robots_disallow=()):
        self.tiers: list[list] = [[], []]  # [webnews, other]; items =
        # (round_added, seq64, url, attempts, url_to_refer)
        self.heads = [0, 0]    # consumed prefix (O(1) dequeue, no pop(0))
        self.dirty = [False, False]
        self.in_flight = 0
        self.host_seq = 0
        self.next_allowed_ms = 0.0
        self.max_in_flight = max_in_flight
        self.min_interval_ms = min_interval_ms
        self.max_attempts = max_attempts
        self.robots_disallow = tuple(robots_disallow or ())

    def pending(self, tier: int) -> int:
        return len(self.tiers[tier]) - self.heads[tier]

    def compact_sort(self, tier: int) -> None:
        """Drop the consumed prefix and re-sort the remainder by lineage
        key. Called only when new items arrived since the last sort."""
        q = self.tiers[tier][self.heads[tier]:]
        q.sort(key=lambda it: (it[0], it[1], it[2]))
        self.tiers[tier] = q
        self.heads[tier] = 0
        self.dirty[tier] = False


class Frontier:
    """Single-shard frontier core (plain object; actor + oracle reuse)."""

    def __init__(self, shard_id: int = 0, default_max_attempts: int = 2):
        self.shard_id = shard_id
        self.default_max_attempts = default_max_attempts
        self.hosts: dict[str, _HostState] = {}
        self.order_log: list[tuple] = []
        self.robots_rejected = 0
        self.enqueued_total = 0
        # per-round completion idempotency guard: dataset-mode rounds
        # complete() from retryable Ray Data tasks, so a replayed task
        # must not double-decrement in_flight or double-requeue — but it
        # must still receive the same verdict (exhausted or not) for its
        # rows. Cleared at each dequeue (= round barrier for this shard).
        self._completed: dict[tuple, str] = {}

    # -- config --------------------------------------------------------
    def configure_hosts(self, rows: dict) -> None:
        """Apply politeness table rows (FIXTURES.md §3) for hosts this
        shard owns."""
        n = len(rows.get("host", []))
        for i in range(n):
            hs = self._host(rows["host"][i])
            if "max_in_flight" in rows and rows["max_in_flight"][i] is not None:
                hs.max_in_flight = int(rows["max_in_flight"][i])
            if "min_interval_ms" in rows and rows["min_interval_ms"][i] is not None:
                hs.min_interval_ms = int(rows["min_interval_ms"][i])
            if "max_attempts" in rows and rows["max_attempts"][i] is not None:
                hs.max_attempts = int(rows["max_attempts"][i])
            if "robots_disallow" in rows and rows["robots_disallow"][i]:
                hs.robots_disallow = tuple(rows["robots_disallow"][i])

    def _host(self, host: str) -> _HostState:
        hs = self.hosts.get(host)
        if hs is None:
            hs = self.hosts[host] = _HostState(
                max_attempts=self.default_max_attempts)
        return hs

    # -- enqueue -------------------------------------------------------
    def enqueue(self, records: dict) -> int:
        """records: dict of equal-length lists with keys url, host,
        is_webnews, round_added, seq64, url_to_refer. Returns admitted
        count. Caller has already canonicalized, filtered and
        seen-checked."""
        n = len(records["url"])
        admitted = 0
        for i in range(n):
            host = records["host"][i]
            hs = self._host(host)
            url = records["url"][i]
            if hs.robots_disallow:
                path = urlparse("http://" + url if "://" not in url else url).path
                if any(path.startswith(p) for p in hs.robots_disallow):
                    self.robots_rejected += 1
                    continue
            tier = 0 if records["is_webnews"][i] else 1
            hs.tiers[tier].append((records["round_added"][i],
                                   records["seq64"][i], url, 0,
                                   records["url_to_refer"][i]))
            hs.dirty[tier] = True
            admitted += 1
        self.enqueued_total += admitted
        return admitted

    # -- dequeue -------------------------------------------------------
    def dequeue(self, now_ms: float, max_items: int = 200) -> dict:
        """Politeness-bounded dequeue sweep over this shard's hosts
        (reference batch: 200, crawler.py:387). Hosts swept in sorted
        order for determinism."""
        out = {k: list(v) for k, v in _EMPTY_BATCH.items()}
        self._completed.clear()
        total = 0
        for host in sorted(self.hosts):
            hs = self.hosts[host]
            while (total < max_items and hs.in_flight < hs.max_in_flight
                   and hs.next_allowed_ms <= now_ms):
                item = None
                tier_taken = None
                for tier in (0, 1):
                    if hs.pending(tier):
                        if hs.dirty[tier]:
                            hs.compact_sort(tier)
                        item = hs.tiers[tier][hs.heads[tier]]
                        hs.heads[tier] += 1
                        tier_taken = tier
                        break
                if item is None:
                    break
                rnd_added, seq64, url, attempts, url_to_refer = item
                out["round_added"].append(rnd_added)
                out["seq64"].append(seq64)
                out["url"].append(url)
                out["host"].append(host)
                out["attempts"].append(attempts)
                out["is_webnews"].append(tier_taken == 0)
                out["url_to_refer"].append(url_to_refer)
                out["host_seq"].append(hs.host_seq)
                out["tier"].append(tier_taken)
                self.order_log.append((host, hs.host_seq, url, tier_taken))
                hs.host_seq += 1
                hs.in_flight += 1
                hs.next_allowed_ms = now_ms + hs.min_interval_ms
                total += 1
        return out

    # -- completion ----------------------------------------------------
    def complete(self, records: dict) -> dict:
        """records: url/host/ok/round_added/seq64/attempts/is_webnews/
        url_to_refer lists. Failed items requeue at their original lineage
        position until the attempt budget (reference: in-memory retry with
        failed_attempts+1, crawler.py:356-364; budget crawler.py:342).
        Returns {"requeued": n, "exhausted": [urls]}."""
        requeued, exhausted = 0, []
        for i in range(len(records["url"])):
            host = records["host"][i]
            url = records["url"][i]
            ck = (url, records["seq64"][i], records["attempts"][i])
            prior = self._completed.get(ck)
            if prior is not None:
                if prior == "exhausted":   # replay the verdict, no effects
                    exhausted.append(url)
                continue
            hs = self._host(host)
            hs.in_flight = max(0, hs.in_flight - 1)
            if records["ok"][i]:
                self._completed[ck] = "ok"
                continue
            attempts = records["attempts"][i] + 1
            if attempts < hs.max_attempts:
                tier = 0 if records["is_webnews"][i] else 1
                hs.tiers[tier].append((records["round_added"][i],
                                       records["seq64"][i],
                                       url, attempts,
                                       records["url_to_refer"][i]))
                hs.dirty[tier] = True
                requeued += 1
                self._completed[ck] = "requeued"
            else:
                exhausted.append(url)
                self._completed[ck] = "exhausted"
        return {"requeued": requeued, "exhausted": exhausted}

    # -- introspection -------------------------------------------------
    def pending_count(self) -> int:
        return sum(hs.pending(0) + hs.pending(1)
                   for hs in self.hosts.values())

    def in_flight_count(self) -> int:
        return sum(hs.in_flight for hs in self.hosts.values())

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "hosts": len(self.hosts),
            "pending": self.pending_count(),
            "in_flight": self.in_flight_count(),
            "enqueued_total": self.enqueued_total,
            "robots_rejected": self.robots_rejected,
            "dequeued_total": len(self.order_log),
        }

    def drain_order_log(self) -> dict:
        log = self.order_log
        self.order_log = []
        return {
            "host": [x[0] for x in log],
            "host_seq": [x[1] for x in log],
            "url": [x[2] for x in log],
            "priority_tier": [x[3] for x in log],
        }

    # -- checkpoint (north_rule resumability) --------------------------
    def snapshot(self, path: str) -> int:
        """Parquet snapshot of pending items + a JSON sidecar of per-host
        counters/config. Call only at a round barrier (in_flight == 0) —
        asserted, making the checkpoint contract crisper than the
        reference's lossy crash behavior (SURVEY.md §2.9)."""
        assert self.in_flight_count() == 0, "snapshot mid-round"
        rows = {k: [] for k in ("host", "tier", "round_added", "seq64",
                                "url", "attempts", "url_to_refer")}
        meta = {}
        for host, hs in self.hosts.items():
            meta[host] = {
                "host_seq": hs.host_seq,
                "max_in_flight": hs.max_in_flight,
                "min_interval_ms": hs.min_interval_ms,
                "max_attempts": hs.max_attempts,
                "robots_disallow": list(hs.robots_disallow),
            }
            for tier in (0, 1):
                for (rnd, seq64, url, attempts, ref) in \
                        hs.tiers[tier][hs.heads[tier]:]:
                    rows["host"].append(host)
                    rows["tier"].append(tier)
                    rows["round_added"].append(rnd)
                    rows["seq64"].append(seq64)
                    rows["url"].append(url)
                    rows["attempts"].append(attempts)
                    rows["url_to_refer"].append(ref)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "host": pa.array(rows["host"], pa.string()),
            "tier": pa.array(rows["tier"], pa.int8()),
            "round_added": pa.array(rows["round_added"], pa.int64()),
            "seq64": pa.array(rows["seq64"], pa.int64()),
            "url": pa.array(rows["url"], pa.string()),
            "attempts": pa.array(rows["attempts"], pa.int32()),
            "url_to_refer": pa.array(rows["url_to_refer"], pa.string()),
        }), tmp)
        os.replace(tmp, path)
        with open(path + ".hosts.json.tmp", "w") as f:
            json.dump(meta, f)
        os.replace(path + ".hosts.json.tmp", path + ".hosts.json")
        return len(rows["url"])

    def restore(self, path: str) -> int:
        with open(path + ".hosts.json") as f:
            meta = json.load(f)
        self.hosts = {}
        for host, m in meta.items():
            hs = self._host(host)
            hs.host_seq = m["host_seq"]
            hs.max_in_flight = m["max_in_flight"]
            hs.min_interval_ms = m["min_interval_ms"]
            hs.max_attempts = m["max_attempts"]
            hs.robots_disallow = tuple(m["robots_disallow"])
        t = pq.read_table(path).to_pydict()
        for i in range(len(t["url"])):
            hs = self._host(t["host"][i])
            hs.tiers[t["tier"][i]].append(
                (t["round_added"][i], t["seq64"][i], t["url"][i],
                 t["attempts"][i], t["url_to_refer"][i]))
            hs.dirty[t["tier"][i]] = True
        return len(t["url"])


@ray.remote(num_cpus=0.25)
class FrontierShard(Frontier):
    """Named long-lived actor: one per host-hash shard (SURVEY.md §7.2)."""
    pass
