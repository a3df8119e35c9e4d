"""Host-level link-graph analytics over the crawl corpus: distributed
edge extraction from page HTML and an iterative PageRank.

The reference schedules per-host FIFO with a webnews priority tier
(crawling_tools/crawler.py:387-420 dequeue discipline); rank-weighted
frontier prioritization is the standard upgrade for a crawler at
Common-Crawl scale, and PageRank is the canonical iterative algorithm
of the domain. Shape mirrors ``similarity.distributed_kmeans``: the
EDGE table (corpus-sized) only ever streams through ``map_batches``;
per-iteration cross-node traffic is sparse (dst, contribution)
partials, and the driver folds a hosts-sized vector.

Scale contract: driver/broadcast state is O(hosts), not O(edges) — a
host-level web graph is ~10^8 nodes (≈ 1.6 GB of rank+degree arrays),
which fits one machine while the 10^11-edge table does not. For a
URL-level graph, swap the broadcast for the documented join form:
rank dataset ⋈ edges on src (hash join), groupby(dst).sum, one shuffle
per iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .. import urlnorm
from ..rayutil import cached_object, read_parquet


# link_products cache: (abspath, fingerprint) → materialized Dataset.
# The link-graph corpus products (edges for pagerank/HITS, anchor
# texts) all need one pass over the pages' HTML; caching the combined
# pass means q_crawl_pagerank, q_crawl_hits and q_crawl_anchor_texts
# in one driver/bench process share a single kernel sweep instead of
# re-reading and re-parsing the corpus each. Keyed by a cheap content
# fingerprint so a rewritten corpus at the same path invalidates;
# bounded at 2 entries (materialized rows are edge/anchor-sized, html
# never enters the cache).
_LINK_PRODUCTS_CACHE: "dict[tuple, rd.Dataset]" = {}


def _dir_fingerprint(path: str) -> tuple:
    import os
    entries = []
    if os.path.isfile(path):
        st = os.stat(path)
        return ((path, st.st_size, st.st_mtime_ns),)
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            st = os.stat(os.path.join(root, f))
            entries.append((f, st.st_size, st.st_mtime_ns))
    return tuple(entries)


def link_products(pages_dir: str, *,
                  batch_size: int = 64) -> "rd.Dataset":
    """ONE kernel pass over the corpus emitting every link-graph
    product row (VERDICT r4 item 6): per page, the M13 outbound-link
    walk (``ExtractKernel.extract_links`` — article parse skipped)
    AND the anchor-text walk, combined into one narrow table:

    - ``kind=0`` edge rows: (src_host, dst_host), one per distinct
      cross-host link per page;
    - ``kind=1`` anchor rows: (dst_host, anchor, n) pre-counted per
      batch (the anchor_texts partial).

    html is read and decoded once and never leaves the map stage;
    the materialized output is edge/anchor-sized. At 100-TB scale
    write this table to parquet once and feed pagerank / HITS /
    anchors from the file (the in-process cache here is the bench /
    driver-sweep equivalent)."""
    import os

    key = (os.path.abspath(pages_dir), _dir_fingerprint(pages_dir))
    hit = _LINK_PRODUCTS_CACHE.get(key)
    if hit is not None:
        return hit

    from ..pipelines.bulk import _BULK_KERNEL, _BulkExtract
    from ..htmldom import parse_html

    def emit(batch: pa.Table) -> pa.Table:
        stage = _BULK_KERNEL.get(False)
        if stage is None:
            stage = _BULK_KERNEL[False] = _BulkExtract()
        kinds: list[int] = []
        srcs: list[str | None] = []
        dsts: list[str] = []
        anchors: list[str | None] = []
        ns: list[int] = []
        anchor_cnt: dict[tuple[str, str], int] = {}
        for u, h in zip(batch["url"].to_pylist(),
                        batch["html"].to_pylist()):
            html = (h or b"").decode("utf-8", "replace")
            # edge product: kernel M13 walk, links-only fast path
            src = urlnorm.host_of(u)
            for link in {urlnorm.host_of(l)
                         for l in stage.kernel.extract_links(u, html)}:
                if link and link != src:
                    kinds.append(0)
                    srcs.append(src)
                    dsts.append(link)
                    anchors.append(None)
                    ns.append(1)
            # anchor product: raw-parse walk (anchor_texts semantics,
            # unchanged — reference-pinned)
            principal = urlnorm.get_principal_domain(
                u if "://" in u else "http://" + u) or ""
            tree = parse_html(html)
            for n in tree.iter("a"):
                href = n.get("href")
                if not href or (principal and principal in href):
                    continue
                if not urlnorm.is_valid_url(href):
                    continue
                dst = urlnorm.host_of(urlnorm.clean_url(href))
                if not dst:
                    continue
                text = " ".join("".join(n.itertext()).split())
                if not text:
                    continue
                anchor_cnt[(dst, text)] = anchor_cnt.get((dst, text),
                                                         0) + 1
        for (dst, text), c in anchor_cnt.items():
            kinds.append(1)
            srcs.append(None)
            dsts.append(dst)
            anchors.append(text)
            ns.append(c)
        return pa.table({
            "kind": pa.array(kinds, pa.int8()),
            "src_host": pa.array(srcs, pa.string()),
            "dst_host": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "n": pa.array(ns, pa.int64())})

    out = read_parquet(pages_dir, columns=["url", "html"]) \
        .map_batches(emit, batch_format="pyarrow",
                     batch_size=batch_size).materialize()
    while len(_LINK_PRODUCTS_CACHE) >= 2:
        _LINK_PRODUCTS_CACHE.pop(next(iter(_LINK_PRODUCTS_CACHE)))
    _LINK_PRODUCTS_CACHE[key] = out
    return out


def host_edges(pages_dir: str, *, batch_size: int = 64) -> "rd.Dataset":
    """Distinct (src_host, dst_host, n_pages) cross-host edges off the
    shared :func:`link_products` pass (kernel M13 links; html never
    leaves the map stage) → groupby count. Only (host, host) string
    pairs cross the shuffle."""
    from ray.data.aggregate import Count

    def edge_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0))
        return pa.table({"src_host": t["src_host"],
                         "dst_host": t["dst_host"]})

    return link_products(pages_dir, batch_size=batch_size) \
        .map_batches(edge_rows, batch_format="pyarrow") \
        .groupby(["src_host", "dst_host"]) \
        .aggregate(Count(alias_name="n_pages"))


def anchor_texts(pages_dir: str, *, top_n: int = 3,
                 batch_size: int = 64) -> "rd.Dataset":
    """Per-target-host top anchor texts over the crawl corpus — the
    link-text corpus product (anchor-text datasets for retrieval and
    entity-linking training). Same off-principal-domain href rule as
    the kernel's M13 outbound-link walk (reference
    extractor.py:284-295), but keeps each anchor's whitespace-normalized
    TEXT and counts every occurrence.

    Distributed shape: html never leaves the shared
    :func:`link_products` kernel pass — its ``kind=1`` rows are the
    pre-counted (dst_host, anchor, n) partials; a salted-bucket fold
    sums them (one row per distinct pair crosses the shuffle) and the
    per-host top-n runs as map_groups over the folded counts (groups
    are distinct-anchor-sized, not page-sized). Ordering is the total
    (n desc, anchor asc), so the cut is exact."""
    from ..rayutil import bucketed_group_sum

    def anchor_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 1))
        return pa.table({"dst_host": t["dst_host"],
                         "anchor": t["anchor"],
                         "n_part": t["n"]})

    counts = bucketed_group_sum(
        link_products(pages_dir, batch_size=batch_size)
        .map_batches(anchor_rows, batch_format="pyarrow"),
        ["dst_host", "anchor"], {"n_part": "n"})

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "dst_host" not in g.columns:
            return pd.DataFrame({
                "dst_host": pd.Series([], dtype="object"),
                "rank": pd.Series([], dtype="int64"),
                "anchor": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        g = g.sort_values(["n", "anchor"],
                          ascending=[False, True]).head(top_n)
        return pd.DataFrame({
            "dst_host": g["dst_host"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "anchor": g["anchor"].to_numpy(),
            "n": g["n"].to_numpy(dtype=np.int64)})

    return counts.groupby("dst_host").map_groups(topn,
                                                 batch_format="pandas")


def anchor_texts_reference(pages: pd.DataFrame, *,
                           top_n: int = 3) -> pd.DataFrame:
    """Single-process oracle for :func:`anchor_texts` (tests pin the
    distributed fold to this): same walk, plain Counter."""
    from collections import Counter

    from ..htmldom import parse_html
    cnt: Counter = Counter()
    for u, h in zip(pages["url"], pages["html"]):
        principal = urlnorm.get_principal_domain(
            u if "://" in u else "http://" + u) or ""
        tree = parse_html((h or b"").decode("utf-8", "replace"))
        for n in tree.iter("a"):
            href = n.get("href")
            if not href or (principal and principal in href):
                continue
            if not urlnorm.is_valid_url(href):
                continue
            dst = urlnorm.host_of(urlnorm.clean_url(href))
            if not dst:
                continue
            text = " ".join("".join(n.itertext()).split())
            if text:
                cnt[(dst, text)] += 1
    rows = [{"dst_host": d, "anchor": a, "n": c}
            for (d, a), c in cnt.items()]
    if not rows:
        return pd.DataFrame({"dst_host": pd.Series([], dtype="object"),
                             "rank": pd.Series([], dtype="int64"),
                             "anchor": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    df = pd.DataFrame(rows).sort_values(
        ["dst_host", "n", "anchor"], ascending=[True, False, True])
    df["rank"] = df.groupby("dst_host").cumcount() + 1
    df = df[df["rank"] <= top_n]
    return df[["dst_host", "rank", "anchor", "n"]].reset_index(drop=True)


def _edge_blocks(edges_ds: "rd.Dataset",
                 rows_per_block: int = 1_000_000) -> int:
    """Block count for an iteration-reused edge table: per-iteration
    fixed cost is one task per block, so tiny graphs must not inherit
    the corpus's file-per-block layout; big graphs keep one block per
    ~1M edges for parallelism."""
    return max(1, min(edges_ds.num_blocks(),
                      edges_ds.count() // rows_per_block + 1))


def _pagerank_reference(edges: pd.DataFrame, *, damping: float,
                        iters: int) -> pd.DataFrame:
    """Single-process oracle (tests pin the distributed fold to this):
    same formula, same iteration count, plain numpy."""
    hosts = np.unique(
        np.concatenate([edges["src_host"].to_numpy(dtype=object),
                        edges["dst_host"].to_numpy(dtype=object)]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    src = np.array([idx[h] for h in edges["src_host"]], dtype=np.int64)
    dst = np.array([idx[h] for h in edges["dst_host"]], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        w = rank[src] / outdeg[src]
        np.add.at(contrib, dst, w)
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return pd.DataFrame({"host": hosts, "rank": rank})


def host_pagerank(edges_ds: "rd.Dataset", *, damping: float = 0.85,
                  iters: int = 20) -> pd.DataFrame:
    """Distributed PageRank over a (src_host, dst_host) edge dataset.

    Each iteration is ONE streaming pass: every edge batch looks up its
    src ranks/out-degrees in the broadcast arrays (``ray.put`` once per
    iteration, read per node via the object store) and emits SPARSE
    (dst_idx, contribution) partial sums — cross-node traffic is
    O(distinct dst per batch), never O(hosts). The driver folds the
    partials, applies damping + dangling mass, re-broadcasts. No
    shuffle at all once the edge table is materialized.

    Returns (host, rank) for every host in the graph, rank a float64
    probability (sums to 1).
    """
    edges = edges_ds.select_columns(["src_host", "dst_host"]) \
        .materialize()
    # coalesce the upstream file-per-block layout BEFORE anything that
    # scans the table (two groupby passes + one pass per iteration):
    # every pass costs one task per block, and extraction leaves one
    # near-empty block per corpus file (231 blocks / 23 rows measured
    # at bench scale — 10 iterations cost 12.1 s vs 1.0 s coalesced)
    tb = _edge_blocks(edges)
    if edges.num_blocks() > 4 * tb:
        edges = edges.repartition(tb).materialize()

    # hosts + out-degrees: one aggregation pass each over the edge
    # table; both results are hosts-sized (the documented small side)
    src_deg = edges.groupby("src_host").count().to_pandas()
    dst_hosts = edges.groupby("dst_host").count().to_pandas()
    hosts = np.unique(np.concatenate(
        [src_deg["src_host"].to_numpy(dtype=object),
         dst_hosts["dst_host"].to_numpy(dtype=object)]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "rank": pd.Series([], dtype="float64")})
    outdeg = np.zeros(n, dtype=np.float64)
    pos = np.searchsorted(hosts, src_deg["src_host"].to_numpy(dtype=object))
    outdeg[pos] = src_deg["count()"].to_numpy(dtype=np.float64)
    hosts_ref = ray.put(hosts)

    def index_edges(t: pa.Table) -> pa.Table:
        hs = cached_object(hosts_ref)
        s = np.searchsorted(hs, t["src_host"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_host"].to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    # integer-indexed edges, materialized once (already coalesced
    # above); iterations reuse them
    iedges = edges.map_batches(index_edges,
                               batch_format="pyarrow").materialize()

    rank = np.full(n, 1.0 / n)
    state_outdeg_ref = ray.put(outdeg)

    def partials(t: pa.Table, *, rank_ref) -> pa.Table:
        r = cached_object(rank_ref)
        od = cached_object(state_outdeg_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = r[src] / od[src]           # every src has outdeg >= 1
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=w)
        return pa.table({"dst": pa.array(uniq, pa.int64()),
                         "contrib": pa.array(sums, pa.float64())})

    for _ in range(iters):
        rank_ref = ray.put(rank)
        parts = iedges.map_batches(
            partials, fn_kwargs={"rank_ref": rank_ref},
            batch_format="pyarrow").to_pandas()
        contrib = np.zeros(n)
        np.add.at(contrib, parts["dst"].to_numpy(dtype=np.int64),
                  parts["contrib"].to_numpy(dtype=np.float64))
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return pd.DataFrame({"host": hosts, "rank": rank})


def pagerank_join_form(edges_ds: "rd.Dataset", *, damping: float = 0.85,
                       iters: int = 10,
                       num_partitions: int = 8) -> pd.DataFrame:
    """PageRank with NO node-sized driver or broadcast state — the
    URL-level-graph form :func:`host_pagerank` documents: the rank
    vector lives as a Dataset, each iteration is

        rank ⋈ edges on src (distributed hash join)
        → groupby(dst).sum of rank/outdeg      (the second shuffle)
        → damping + dangling fold into the new rank Dataset

    Driver state per iteration is TWO scalars (dangling mass and a row
    count); everything node- or edge-sized stays in the object store.
    Costs 2 shuffles × iters, which is exactly the price of exceeding
    one machine's memory — use host_pagerank whenever the node set
    fits (its per-iteration traffic is batches × sparse partials).

    Iteration shape (round-4 rework, ~2× less fixed cost than the
    3-hash-op original): ONE inner join + ONE groupby-sum per
    iteration. The old left_outer fold join and the separate
    dangling-mass pass are replaced by a UNION: the rank dataset
    re-enters the aggregation as zero-contribution rows carrying each
    host's out-degree (so sinks survive and outdeg rides the shuffle),
    plus one sentinel row per block whose ``c`` is the block's dangling
    rank mass — the same groupby that folds contributions sums the
    dangling scalar, which the driver reads back as a single row.

    Returns (host, rank) like host_pagerank; tests pin the two forms to
    each other (same formula ⇒ same values to float-fold noise).
    """
    from ray.data.aggregate import Count, Sum

    def _rename(ds_in: "rd.Dataset", mapping: dict) -> "rd.Dataset":
        # Dataset.rename_columns delegates to block.rename_columns,
        # which pandas-backed blocks (aggregate outputs) don't have —
        # rename through an Arrow map instead
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names])
        # explicit batch_size: coalesces away the ZERO-COLUMN empty
        # blocks aggregate/join outputs carry for empty partitions,
        # which the next join's FieldRef resolution would reject
        return ds_in.map_batches(f, batch_format="pyarrow",
                                 batch_size=4096)

    # project_blocks, not select_columns: edges_ds is typically an
    # aggregate output (host_edges) whose empty partitions are
    # zero-column blocks that the joins below would reject
    from ..rayutil import project_blocks
    edges = project_blocks(edges_ds, ["src_host", "dst_host"]) \
        .materialize()
    # every iteration re-scans this table into the join — coalesce the
    # upstream file-per-block layout once so the per-iteration map-side
    # task count tracks data size, not corpus file count (same finding
    # as host_pagerank's _edge_blocks: 231 near-empty blocks at bench
    # scale)
    target_blocks = _edge_blocks(edges)
    if edges.num_blocks() > 4 * target_blocks:
        edges = edges.repartition(target_blocks).materialize()
    # partition autoscale: `num_partitions` is the caller's CEILING
    # (sized for the cluster); below ~64k edge rows per partition each
    # extra hash-shuffle aggregator costs more in actor spin-up per
    # iteration than it saves in parallelism, so small graphs clamp
    # down (the 13-host bench graph runs 2 partitions, a 10^11-edge
    # URL graph keeps the caller's value)
    num_partitions = max(2, min(num_partitions,
                                edges.count() // 65536 + 1))
    with _light_aggs():
        outdeg = edges.groupby("src_host") \
            .aggregate(Count(alias_name="outdeg")).materialize()

        # node set = src ∪ dst (unioned id-level rows, distributed
        # distinct), seeded with rank 1/N
        def pick(col):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({"host": t[col]})
            return f
        nodes = edges.map_batches(pick("src_host"), batch_format="pyarrow") \
            .union(edges.map_batches(pick("dst_host"),
                                     batch_format="pyarrow")) \
            .groupby("host").aggregate(Count(alias_name="_c")) \
            .drop_columns(["_c"]).materialize()
        n = nodes.count()
        if n == 0:
            return pd.DataFrame({"host": pd.Series([], dtype="object"),
                                 "rank": pd.Series([], dtype="float64")})

        def seed(t: pa.Table) -> pa.Table:
            return t.append_column(
                "rank", pa.array(np.full(len(t), 1.0 / n), pa.float64()))
        # rank ⋈ outdeg once up front: rows WITH outdeg carry it along
        # every iteration (rank_ds schema: host, rank, outdeg; 0 = sink)
        rank_ds = nodes.map_batches(seed, batch_format="pyarrow",
                                    batch_size=4096).join(
            _rename(outdeg, {"src_host": "host"})
            .repartition(num_partitions),
            join_type="left_outer", num_partitions=num_partitions,
            on=("host",)).materialize()

        def fix_deg(t: pa.Table) -> pa.Table:
            deg = t["outdeg"].to_numpy(zero_copy_only=False)
            deg = np.where(np.isnan(deg.astype(np.float64)), 0, deg)
            return pa.table({"host": t["host"], "rank": t["rank"],
                             "outdeg": pa.array(deg.astype(np.int64))})
        # LAZY map over the materialized join output — like the
        # per-iteration fold below, re-running this node-sized map once
        # per consumer is cheaper than a dedicated materialize pass
        rank_ds = rank_ds.map_batches(fix_deg, batch_format="pyarrow",
                                      batch_size=4096)

        # sentinel host for the per-block dangling-mass rows;
        # "~" is not a valid hostname character, so no collision
        _DANG = "~dangling~"

        def weight(t: pa.Table) -> pa.Table:
            d = t["outdeg"].to_numpy(zero_copy_only=False)
            r = t["rank"].to_numpy(zero_copy_only=False)
            keep = d > 0
            return pa.table({
                "src_host": t["host"].to_numpy(
                    zero_copy_only=False)[keep],
                "w": pa.array(r[keep] / d[keep], pa.float64())})

        def as_contrib(t: pa.Table) -> pa.Table:
            # joined (edges ⋈ weight) rows → (host=dst, c=w, deg=0)
            return pa.table({
                "host": t["dst_host"],
                "c": t["w"],
                "deg": pa.array(np.zeros(len(t), np.int64))})

        def zero_rows(t: pa.Table) -> pa.Table:
            # every node re-enters with c=0 carrying its outdeg (sinks
            # survive the fold; outdeg rides the shuffle instead of a
            # second join), plus ONE sentinel row per block whose c is
            # the block's dangling rank mass — the groupby sums these
            # into the global dangling scalar
            r = t["rank"].to_numpy(zero_copy_only=False)
            d = t["outdeg"].to_numpy(zero_copy_only=False)
            hs = t["host"].to_numpy(zero_copy_only=False)
            return pa.table({
                "host": pa.array(np.append(hs, _DANG)),
                "c": pa.array(np.append(np.zeros(len(t)),
                                        float(r[d == 0].sum())),
                              pa.float64()),
                "deg": pa.array(np.append(d.astype(np.int64), 0))})

        for _ in range(iters):
            folded = edges.join(
                rank_ds.map_batches(weight, batch_format="pyarrow",
                                    batch_size=4096)
                       .repartition(num_partitions),
                join_type="inner", num_partitions=num_partitions,
                on=("src_host",)) \
                .map_batches(as_contrib, batch_format="pyarrow",
                             batch_size=4096) \
                .union(rank_ds.map_batches(zero_rows,
                                           batch_format="pyarrow",
                                           batch_size=4096)) \
                .groupby("host").aggregate(
                    Sum("c", alias_name="c"),
                    Sum("deg", alias_name="outdeg")).materialize()

            dang_df = folded.filter(
                expr=f"host == {_DANG!r}").to_pandas()
            dangling = float(dang_df["c"].sum())
            base = (1 - damping) / n + damping * dangling / n

            # base is bound per-iteration via the default arg (the fold
            # stays LAZY: it composes into the next iteration's big
            # execution instead of costing a materialize pass of its
            # own — re-running a node-sized map once per consumer is
            # cheaper than a dedicated driver round-trip)
            def fold(t: pa.Table, _base=base) -> pa.Table:
                keep = t["host"].to_numpy(zero_copy_only=False) != _DANG
                c = t["c"].to_numpy(
                    zero_copy_only=False).astype(np.float64)[keep]
                c = np.where(np.isnan(c), 0.0, c)
                return pa.table({
                    "host": pa.array(t["host"].to_numpy(
                        zero_copy_only=False)[keep]),
                    "rank": pa.array(_base + damping * c, pa.float64()),
                    "outdeg": t["outdeg"].to_numpy(
                        zero_copy_only=False)[keep]})
            rank_ds = folded.map_batches(fold, batch_format="pyarrow",
                                         batch_size=4096)

    out = rank_ds.select_columns(["host", "rank"]).to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def _light_aggs():
    from ..rayutil import light_shuffle_aggregators
    return light_shuffle_aggregators()


def _hits_reference(edges: pd.DataFrame, *, iters: int) -> pd.DataFrame:
    """Single-process HITS oracle (Kleinberg'99 hubs & authorities,
    L2-normalized power iteration) — tests pin the distributed fold to
    this, same formula and iteration count in plain numpy."""
    hosts = np.unique(
        np.concatenate([edges["src_host"].to_numpy(dtype=object),
                        edges["dst_host"].to_numpy(dtype=object)]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    src = np.array([idx[h] for h in edges["src_host"]], dtype=np.int64)
    dst = np.array([idx[h] for h in edges["dst_host"]], dtype=np.int64)
    h = np.full(n, 1.0 / np.sqrt(n)) if n else np.zeros(0)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, dst, h[src])
        na = np.linalg.norm(a)
        a = a / na if na > 0 else a
        h = np.zeros(n)
        np.add.at(h, src, a[dst])
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h
    return pd.DataFrame({"host": hosts, "authority": a, "hub": h})


def host_hits(edges_ds: "rd.Dataset", *, iters: int = 20) -> pd.DataFrame:
    """Distributed HITS (hubs & authorities) over a (src_host,
    dst_host) edge dataset — PageRank's link-analysis sibling: an
    authority is pointed at by good hubs, a hub points at good
    authorities; the frontier can prioritize hub hosts for DISCOVERY
    where PageRank prioritizes authority hosts for importance.

    Same scale shape as :func:`host_pagerank`: integer-indexed edges
    materialized once; each half-iteration is one streaming pass where
    every edge batch reads the current score vector from the object
    store (``ray.put`` once per pass) and emits SPARSE (index, partial
    sum) rows — cross-node traffic is O(distinct endpoints per batch),
    never O(hosts); the driver folds partials and L2-normalizes. Two
    passes per iteration (authority from hubs, then hubs from the NEW
    authorities — the Kleinberg update order, matching the
    reference)."""
    edges = edges_ds.select_columns(["src_host", "dst_host"]) \
        .materialize()
    # same coalesce-before-scanning rule as host_pagerank (see there)
    tb = _edge_blocks(edges)
    if edges.num_blocks() > 4 * tb:
        edges = edges.repartition(tb).materialize()
    src_deg = edges.groupby("src_host").count().to_pandas()
    dst_deg = edges.groupby("dst_host").count().to_pandas()
    hosts = np.unique(np.concatenate(
        [src_deg["src_host"].to_numpy(dtype=object),
         dst_deg["dst_host"].to_numpy(dtype=object)]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype="object"),
                             "authority": pd.Series([], dtype="float64"),
                             "hub": pd.Series([], dtype="float64")})
    hosts_ref = ray.put(hosts)

    def index_edges(t: pa.Table) -> pa.Table:
        hs = cached_object(hosts_ref)
        s = np.searchsorted(hs, t["src_host"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_host"].to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    iedges = edges.map_batches(index_edges,
                               batch_format="pyarrow").materialize()

    def partial(t: pa.Table, *, vec_ref, from_col, to_col) -> pa.Table:
        v = cached_object(vec_ref)
        f = t[from_col].to_numpy(zero_copy_only=False)
        to = t[to_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(to, return_inverse=True)
        sums = np.bincount(inv, weights=v[f])
        return pa.table({"i": pa.array(uniq, pa.int64()),
                         "val": pa.array(sums, pa.float64())})

    def edge_fold(vec: np.ndarray, from_col: str,
                  to_col: str) -> np.ndarray:
        parts = iedges.map_batches(
            partial, fn_kwargs={"vec_ref": ray.put(vec),
                                "from_col": from_col, "to_col": to_col},
            batch_format="pyarrow").to_pandas()
        out = np.zeros(n)
        np.add.at(out, parts["i"].to_numpy(dtype=np.int64),
                  parts["val"].to_numpy(dtype=np.float64))
        return out

    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = edge_fold(h, "src", "dst")
        na = np.linalg.norm(a)
        a = a / na if na > 0 else a
        h = edge_fold(a, "dst", "src")
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h
    return pd.DataFrame({"host": hosts, "authority": a, "hub": h})


# ---------------------------------------------------------------------------
# Mirror-host detection (URL-path set similarity)
# ---------------------------------------------------------------------------

def _path_of(url: str) -> str:
    """Canonical path component used as the mirror-comparison element:
    scheme-stripped canonical form minus its netloc ('' → '/'). Uses
    the engine-wide canonical key so http/https and trailing-slash
    variants of the same resource collapse to one element."""
    canon = urlnorm.canonical_url(url)
    slash = canon.find("/")
    return canon[slash:] if slash >= 0 else "/"


_MIRROR_MASK = (1 << 61) - 1


def _path_rows(batch: pa.Table) -> pa.Table:
    """Per batch: distinct (host-hash, path-hash, host-name) membership
    rows. 61-bit md5 keys survive the shuffle's pandas blocks as int64
    (same identity as _gram_rows); the name column rides along so no
    second corpus scan is needed for the O(hosts) name table. Host
    resolution (principal-domain walk + md5) is cached per NETLOC —
    a corpus batch holds few distinct hosts but many urls."""
    import hashlib

    seen: set[tuple[int, int]] = set()
    names: dict[int, str] = {}
    by_netloc: dict[str, tuple[int, str] | None] = {}
    for u in batch["url"].to_pylist():
        body = u.split("://", 1)[-1]
        netloc = body.split("/", 1)[0]
        cached = by_netloc.get(netloc, 0)
        if cached == 0:
            host = urlnorm.host_of(u)
            if host:
                hh = int.from_bytes(
                    hashlib.md5(host.encode()).digest()[:8],
                    "big") & _MIRROR_MASK
                cached = (hh, host)
            else:
                cached = None
            by_netloc[netloc] = cached
        if cached is None:
            continue
        hh, host = cached
        ph = int.from_bytes(
            hashlib.md5(_path_of(u).encode()).digest()[:8],
            "big") & _MIRROR_MASK
        seen.add((hh, ph))
        names[hh] = host
    hh_a = np.fromiter((p[0] for p in seen), np.int64, len(seen))
    ph_a = np.fromiter((p[1] for p in seen), np.int64, len(seen))
    return pa.table({"doc_id": pa.array(hh_a), "h": pa.array(ph_a),
                     "host": pa.array([names[x] for x in hh_a],
                                      pa.string())})


def mirror_hosts(pages_dir: str, *, thr_num: int = 0, thr_den: int = 1,
                 max_df: int = 64, top_n: int | None = 10,
                 batch_size: int = 1024) -> pd.DataFrame:
    """Mirror/alias host detection over the crawl corpus: Jaccard
    similarity between hosts' URL-PATH sets. Mirrored sites (CDN
    aliases, www/non-www splits brought in by differing seeds,
    syndicated archives) expose near-identical path trees, and a
    frontier that knows two hosts mirror each other crawls one and
    maps the other — at Common-Crawl scale this is a standard corpus
    hygiene pass next to document-level dedup.

    Composition: pages → distinct (host-hash, path-hash) membership
    rows (canonical path via the engine-wide URL key, so scheme and
    trailing-slash variants collapse) → the generic exact
    :func:`dedup.set_jaccard_pairs` self-join (df-capped: a path
    present on more than ``max_df`` hosts — '/', '/rss.xml' — is
    boilerplate, not mirror evidence, exactly the hot-shingle rule) →
    host names re-attached from an O(hosts) name table. Returns
    (host_a, host_b, inter_sz, union_sz, jac_micro) for CANDIDATE
    pairs (≥1 shared under-cap path) with Jaccard ≥ thr_num/thr_den,
    host_a < host_b lexicographically, sorted jac_micro desc then
    names, cut to the ``top_n`` most similar (None = all): the
    operator is a similarity RANKING — true mirrors surface at
    jac_micro ≈ 10^6, and the default thr 0 keeps it informative on
    corpora with no planted mirrors. Conformance-pinned to
    :func:`mirror_hosts_reference`."""
    from .dedup import set_jaccard_pairs

    ds = read_parquet(pages_dir, columns=["url"])
    rows = ds.map_batches(_path_rows, batch_format="pyarrow",
                          batch_size=batch_size)
    # global (host, path) dedup: a path reachable from several pages
    # of one host must count once in sizes/df. Id-level rows only;
    # the host NAME is functionally dependent on the host hash, so
    # keying the fold on all three keeps one row per (host, path)
    # while the name rides the same shuffle (no second corpus scan).
    from ..rayutil import bucketed_group_sum, project_blocks

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "c", pa.array(np.ones(t.num_rows, np.int64)))

    # repartition is load-bearing: the bucketed fold's empty sort
    # partitions emit zero-column blocks that short-circuit past map
    # UDFs and would reach set_jaccard_pairs' hash join without the
    # key column (surfaced at 32 CPUs, where empty partitions are
    # common; the ngram_jaccard_pairs rule)
    from ..rayutil import salt_bucket, shuffle_partitions
    distinct = project_blocks(
        bucketed_group_sum(rows.map_batches(one, batch_format="pyarrow"),
                           ["doc_id", "h", "host"], {"c": "n"}),
        ["doc_id", "h", "host"]) \
        .repartition(shuffle_partitions(0.25)).materialize()

    # O(hosts) name DATASET: per-batch unique (hash → host) pairs off
    # the already-materialized membership rows, folded to one row per
    # host hash (any name per hash is THE name — functionally
    # dependent). Stays distributed: pair↔name attachment below is a
    # native join, so no host table ever lands on the driver.
    def uniq_names(t: pa.Table) -> pa.Table:
        hh = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.unique(hh, return_index=True)[1]
        return pa.table({
            "hh": pa.array(hh[idx].astype(np.int64)),
            "host": pc.take(t["host"].combine_chunks(),
                            pa.array(idx))})

    def first_name(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns):
            return g
        out = g.drop_duplicates("hh")
        return pd.DataFrame({"hh": out["hh"].astype("int64"),
                             "host": out["host"].astype("object")})

    names = project_blocks(
        distinct.map_batches(uniq_names, batch_format="pyarrow")
        .map_batches(lambda b: b.assign(
            bucket=salt_bucket(b["hh"].to_numpy())) if len(b)
            else b.assign(bucket=pd.Series([], dtype="int32")),
            batch_format="pandas")
        .groupby("bucket").map_groups(first_name,
                                      batch_format="pandas"),
        ["hh", "host"]).repartition(4).materialize()

    members = project_blocks(distinct, ["doc_id", "h"]).materialize()
    # repartition before the native name joins: map_groups' empty sort
    # partitions ship zero-column blocks whose missing key column fails
    # Acero FieldRef resolution (the engine-wide empty-block rule)
    pairs = project_blocks(
        set_jaccard_pairs(members, thr_num=thr_num,
                          thr_den=thr_den, max_df=max_df),
        ["doc_a", "doc_b", "inter_sz", "union_sz", "jac_micro"]) \
        .repartition(shuffle_partitions(0.25)).materialize()
    empty = pd.DataFrame({
        "host_a": pd.Series([], dtype="object"),
        "host_b": pd.Series([], dtype="object"),
        "inter_sz": pd.Series([], dtype="int64"),
        "union_sz": pd.Series([], dtype="int64"),
        "jac_micro": pd.Series([], dtype="int64")})
    if pairs.count() == 0 or names.count() == 0:
        return empty

    def order_names(t: pa.Table) -> pa.Table:
        na = t["na"].to_pylist()
        nb = t["nb"].to_pylist()
        lo = [a if a <= b else b for a, b in zip(na, nb)]
        hi = [b if a <= b else a for a, b in zip(na, nb)]
        return pa.table({
            "host_a": pa.array(lo, pa.string()),
            "host_b": pa.array(hi, pa.string()),
            "inter_sz": pc.cast(t["inter_sz"], pa.int64()),
            "union_sz": pc.cast(t["union_sz"], pa.int64()),
            "jac_micro": pc.cast(t["jac_micro"], pa.int64())})

    na_side = names.map_batches(
        lambda t: pa.table({"doc_a": t["hh"], "na": t["host"]}),
        batch_format="pyarrow")
    nb_side = names.map_batches(
        lambda t: pa.table({"doc_b": t["hh"], "nb": t["host"]}),
        batch_format="pyarrow")
    with _light_aggs():
        scored = pairs.join(na_side, join_type="inner",
                            num_partitions=shuffle_partitions(0.25),
                            on=("doc_a",)) \
            .join(nb_side, join_type="inner",
                  num_partitions=shuffle_partitions(0.25),
                  on=("doc_b",)) \
            .map_batches(order_names, batch_format="pyarrow") \
            .materialize()
    # ranking tail: distributed sort; only the top_n rows (or the
    # thresholded survivors) reach the driver
    scored = scored.sort(["jac_micro", "host_a", "host_b"],
                         descending=[True, False, False])
    if top_n is not None:
        scored = scored.limit(top_n)
    out = scored.to_pandas()
    if not len(out):
        return empty
    return out.astype({"inter_sz": "int64", "union_sz": "int64",
                       "jac_micro": "int64"}).reset_index(drop=True)


def mirror_hosts_reference(pages: pd.DataFrame, *, thr_num: int = 0,
                           thr_den: int = 1, max_df: int = 64,
                           top_n: int | None = 10) -> pd.DataFrame:
    """Single-process oracle for :func:`mirror_hosts`: plain dict of
    path sets per host, identical df cap, candidate rule (≥1 shared
    under-cap path) and integer threshold."""
    from collections import Counter
    from itertools import combinations

    sets: dict[str, set[str]] = {}
    for u in pages["url"]:
        host = urlnorm.host_of(u)
        if host:
            sets.setdefault(host, set()).add(_path_of(u))
    df: Counter = Counter()
    for paths in sets.values():
        df.update(paths)
    capped = {h: {p for p in ps if df[p] <= max_df}
              for h, ps in sets.items()}
    rows = []
    for a, b in combinations(sorted(capped), 2):
        inter = len(capped[a] & capped[b])
        union = len(capped[a] | capped[b])
        if inter >= 1 and inter * thr_den >= union * thr_num:
            rows.append((a, b, inter, union,
                         inter * 1_000_000 // union))
    out = pd.DataFrame(
        rows, columns=["host_a", "host_b", "inter_sz", "union_sz",
                       "jac_micro"])
    if not len(out):
        return pd.DataFrame({
            "host_a": pd.Series([], dtype="object"),
            "host_b": pd.Series([], dtype="object"),
            "inter_sz": pd.Series([], dtype="int64"),
            "union_sz": pd.Series([], dtype="int64"),
            "jac_micro": pd.Series([], dtype="int64")})
    out = out.astype({"inter_sz": "int64", "union_sz": "int64",
                      "jac_micro": "int64"}) \
        .sort_values(["jac_micro", "host_a", "host_b"],
                     ascending=[False, True, True]) \
        .reset_index(drop=True)
    return out.head(top_n).reset_index(drop=True) \
        if top_n is not None else out
