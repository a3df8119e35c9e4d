"""S7: whois / per-host registration metadata.

The reference's whois connector (extraction_tools/whoisinfo.py:39-104)
queries the network per host and stores registrar / creation date /
country into the collector DB (storage_tools/datacollector.py:47-75).
Network whois cannot run in a replay corpus, so this module implements
the documented stand-in (SURVEY.md §2.1 S7): a *deterministic* whois
synthesizer — every field is a pure function of the host string via
md5, reproducible bit-for-bit in DuckDB SQL (`('0x' || substr(md5(h),
1, 8))::UBIGINT`), which is what makes the per-host metadata join
oracle-checkable.

Scale shape: whois metadata is per-HOST (millions of rows at worst,
not per-page billions), so the table is a broadcast small side —
`ray.put` the host→record dict once, look it up inside ``map_batches``.
A real whois connector would be an actor-pool stage with a rate limit;
the join shape below is unchanged by that swap.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

_REGISTRAR_MOD = 7
_YEAR_MOD = 20
_COUNTRIES = ("US", "DE", "FR", "IT", "ES")


def _host_seed(host: str) -> int:
    """First 8 hex chars of md5(host) as an int — the single source of
    randomness for every synthesized field (SQL parity:
    ``('0x' || substr(md5(host), 1, 8))::UBIGINT``)."""
    return int(hashlib.md5(host.encode("utf-8")).hexdigest()[:8], 16)


def whois_record(host: str) -> dict:
    """Deterministic whois fields for one host (reference parity:
    whoisinfo.py:39-104 extracts registrar, creation_date, country)."""
    seed = _host_seed(host)
    created = 2000 + seed % _YEAR_MOD
    return {
        "host": host,
        "registrar": f"registrar-{seed % _REGISTRAR_MOD}",
        "created_year": created,
        "expires_year": created + 2 + (seed // _YEAR_MOD) % 10,
        "country": _COUNTRIES[seed % len(_COUNTRIES)],
    }


def whois_frame(hosts) -> pd.DataFrame:
    """Whois table for a host list (sorted, deduped)."""
    recs = [whois_record(h) for h in sorted(set(hosts))]
    df = pd.DataFrame(recs, columns=["host", "registrar", "created_year",
                                     "expires_year", "country"])
    df["created_year"] = df["created_year"].astype("int64")
    df["expires_year"] = df["expires_year"].astype("int64")
    return df


def join_whois(ds: "rd.Dataset", host_col: str = "host") -> "rd.Dataset":
    """Annotate a per-host Dataset with whois columns.

    Broadcast-join shape: whois is computed on the fly from the host
    string inside each batch (a pure function needs no lookup table at
    all — the degenerate, maximally scale-friendly case of the
    broadcast-small-side join; a networked whois source would swap in a
    ``ray.put`` host→record dict here)."""

    def annotate(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[host_col].map(whois_record)
        batch = batch.copy()
        batch["registrar"] = w.map(lambda r: r["registrar"])
        batch["created_year"] = w.map(
            lambda r: r["created_year"]).astype("int64")
        batch["expires_year"] = w.map(
            lambda r: r["expires_year"]).astype("int64")
        batch["country"] = w.map(lambda r: r["country"])
        return batch

    return ds.map_batches(annotate, batch_format="pandas")
