"""Windowed/relational operators (functions/windows.py) and exact
n-gram Jaccard: each pinned against an independent in-process
brute-force reference (the driver additionally gates them against
DuckDB oracles at sf0.01)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from news_crawler_ray.functions import dedup as dd
from news_crawler_ray.functions import windows as wn


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 25, size=n).astype(np.int64),
        "ts": np.cumsum(rng.randint(1, 9, size=n)).astype(np.int64),
        "value_centi": rng.randint(-500, 5000, size=n).astype(np.int64),
    })


class TestRollingWindow:
    def test_matches_pandas_per_key(self, ray_session, events_df):
        out = wn.rolling_window_sum(
            rd.from_pandas(events_df), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            window=4, num_buckets=8).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        ref = events_df.sort_values(["user_id", "ts", "event_id"]).copy()
        grp = ref.groupby("user_id")["value_centi"]
        ref["win_sum"] = grp.rolling(4, min_periods=1).sum() \
            .reset_index(level=0, drop=True).astype("int64")
        ref["win_n"] = grp.rolling(4, min_periods=1).count() \
            .reset_index(level=0, drop=True).astype("int64")
        ref = ref.sort_values("event_id").reset_index(drop=True)
        for c in ("win_sum", "win_n"):
            assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_window_never_crosses_keys(self, ray_session):
        df = pd.DataFrame({"event_id": [0, 1, 2, 3],
                           "user_id": [1, 1, 2, 2],
                           "ts": [10, 20, 10, 20],
                           "value_centi": [100, 100, 7, 7]})
        out = wn.rolling_window_sum(
            rd.from_pandas(df), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            window=4, num_buckets=2).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["win_sum"].tolist() == [100, 200, 7, 14]

    def test_rolling_median_matches_pandas(self, ray_session, events_df):
        out = wn.rolling_window_median(
            rd.from_pandas(events_df), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            window=4, num_buckets=8).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        ref = events_df.sort_values(["user_id", "ts", "event_id"]).copy()
        ref["win_median_x2"] = (
            ref.groupby("user_id")["value_centi"]
            .rolling(4, min_periods=1).median() * 2) \
            .reset_index(level=0, drop=True).astype("int64")
        ref = ref.sort_values("event_id").reset_index(drop=True)
        assert (out["win_median_x2"].to_numpy()
                == ref["win_median_x2"].to_numpy()).all()

    def test_rolling_median_even_window_midpoint(self, ray_session):
        # window [3, 8] → median 5.5 → x2 = 11 (exact, no float seam)
        df = pd.DataFrame({"event_id": [0, 1], "user_id": [1, 1],
                           "ts": [10, 20], "value_centi": [3, 8]})
        out = wn.rolling_window_median(
            rd.from_pandas(df), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            window=4, num_buckets=2).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["win_median_x2"].tolist() == [6, 11]


class TestRangeBandJoin:
    def test_band_edges_half_open(self, ray_session):
        # values exactly on edges: lo inclusive, hi exclusive; outside dropped
        df = pd.DataFrame({"v": [899.99, 900.0, 919.99, 920.0, 999.9, 1000.0]})
        out = wn.range_band_join(
            rd.from_pandas(df), value_col="v",
            edges=[900.0, 920.0, 940.0, 960.0, 980.0, 1000.0],
            labels=["B0", "B1", "B2", "B3", "B4"],
            agg_col="v").to_pandas().sort_values("band")
        got = dict(zip(out["band"], out["n_rows"]))
        assert got == {"B0": 2, "B1": 1, "B4": 1}

    def test_sum_is_milli_exact(self, ray_session):
        df = pd.DataFrame({"v": [910.5, 911.25]})
        out = wn.range_band_join(
            rd.from_pandas(df), value_col="v", edges=[900.0, 1000.0],
            labels=["all"], agg_col="v").to_pandas()
        assert out["sum_milli"].iloc[0] == 910500 + 911250


class TestExactQuantiles:
    def test_matches_numpy_rank_definition(self, ray_session):
        rng = np.random.RandomState(3)
        vals = rng.randint(1, 51, size=5000).astype(np.float64)
        ds = rd.from_pandas(pd.DataFrame({"x": vals}))
        qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        out = wn.exact_quantiles(ds, value_col="x", qs=qs)
        srt = np.sort(vals)
        for q, got in zip(out["q"], out["val"]):
            assert got == srt[int(np.floor(q * (len(vals) - 1)))]


class TestHashSample:
    def test_deterministic_and_matches_predicate(self, ray_session):
        ids = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
        out1 = wn.hash_sample(rd.from_pandas(ids), id_col="doc_id",
                              pct=10).to_pandas()
        out2 = wn.hash_sample(rd.from_pandas(ids), id_col="doc_id",
                              pct=10).to_pandas()
        assert out1["doc_id"].tolist() == out2["doc_id"].tolist()
        expect = [i for i in range(1000)
                  if int.from_bytes(hashlib.md5(str(i).encode())
                                    .digest()[:4], "big") % 100 < 10]
        assert sorted(out1["doc_id"]) == expect
        # ~10% with hash-uniform slack
        assert 60 <= len(out1) <= 140


class TestDistinctCount:
    def test_exact_over_tokenized_text(self, ray_session):
        texts = ["a b c", "b c d", "", "d e"]
        ds = rd.from_pandas(pd.DataFrame({"text": texts}))
        assert wn.distinct_count(ds, col="text", tokenize=True) == 5

    def test_hll_estimate_within_error(self, ray_session):
        """The HLL sketch (approx_distinct_tokens) must sit within its
        p=12 error envelope of this exact count."""
        from news_crawler_ray.functions.sketches import approx_distinct_tokens
        rng = np.random.RandomState(5)
        texts = [" ".join(f"tok{rng.randint(0, 4000)}" for _ in range(40))
                 for _ in range(300)]
        ds = rd.from_pandas(pd.DataFrame({"text": texts}))
        exact = wn.distinct_count(ds, col="text", tokenize=True)
        est = approx_distinct_tokens(ds)
        assert abs(est - exact) / exact < 0.05   # 3σ for p=12 is ~4.9%


def _brute_jaccard_pairs(texts, *, k=3, thr=(2, 5), max_df=64):
    """Brute-force df-capped k-gram Jaccard over raw shingle STRINGS
    (no hashing at all) — independent of the md5 identity the
    distributed path uses."""
    shingles = []
    for t in texts:
        toks = (t or "").lower().split()
        shingles.append({" ".join(toks[i:i + k])
                         for i in range(len(toks) - k + 1)}
                        if len(toks) >= k else set())
    df: dict[str, int] = {}
    for s in shingles:
        for g in s:
            df[g] = df.get(g, 0) + 1
    capped = [{g for g in s if df[g] <= max_df} for s in shingles]
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(capped[a] & capped[b])
            union = len(capped[a] | capped[b])
            if union and inter * thr[1] >= union * thr[0]:
                out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


class TestNgramJaccard:
    def test_matches_bruteforce(self, ray_session):
        rng = np.random.RandomState(13)
        vocab = [f"w{i}" for i in range(150)]
        texts = []
        for _ in range(15):
            base = " ".join(rng.choice(vocab, size=40))
            texts.append(base)
            toks = base.split()
            for j in rng.choice(len(toks), size=4, replace=False):
                toks[j] = str(rng.choice(vocab))
            texts.append(" ".join(toks))          # near dup
            texts.append(" ".join(rng.choice(vocab, size=40)))  # filler
        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}))
        out = dd.ngram_jaccard_pairs(ds, k=3, thr_num=2, thr_den=5,
                                     max_df=64).to_pandas()
        got = {(int(r.doc_a), int(r.doc_b)):
               (int(r.inter_sz), int(r.union_sz), int(r.jac_micro))
               for r in out.itertuples()}
        assert got == _brute_jaccard_pairs(texts)
        assert len(got) >= 10   # the planted near-dups collide


class TestRelationalOps:
    """Anti join + grouped top-k driven at the query surface against
    pandas brute force on sf0.001."""

    SF = "/root/testdata/sf0.001"
    # anti-join runs at sf0.01: at sf0.001 EVERY customer has a recent
    # order and the comparison would be two empty lists (vacuous)
    SF_ANTI = "/root/testdata/sf0.01"

    def test_anti_join_matches_pandas(self, ray_session):
        from news_crawler_ray.queries import q_customers_no_orders
        got = q_customers_no_orders(self.SF_ANTI)
        cust = pd.read_parquet(f"{self.SF_ANTI}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        orders = pd.read_parquet(f"{self.SF_ANTI}/orders.parquet",
                                 columns=["o_custkey", "o_orderdate"])
        recent = set(orders.loc[
            orders.o_orderdate >= pd.Timestamp("1997-06-01"), "o_custkey"])
        ref = cust[~cust.c_custkey.isin(recent)] \
            .sort_values("c_custkey").reset_index(drop=True)
        assert len(ref) > 0, "fixture regressed to a vacuous comparison"
        assert got["c_custkey"].tolist() == ref["c_custkey"].tolist()
        assert got["c_mktsegment"].tolist() == ref["c_mktsegment"].tolist()

    def test_grouped_topk_matches_pandas(self, ray_session):
        from news_crawler_ray.queries import q_top_orders_per_segment
        got = q_top_orders_per_segment(self.SF)
        cust = pd.read_parquet(f"{self.SF}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        orders = pd.read_parquet(f"{self.SF}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])
        m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        m = m.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        top = m.groupby("c_mktsegment").head(3)
        ref = []
        for seg, g in top.groupby("c_mktsegment"):
            for rank, r in enumerate(g.itertuples(), start=1):
                ref.append((seg, int(r.o_orderkey),
                            int(np.floor(r.o_totalprice * 1000)), rank))
        gotl = list(map(tuple, got[["c_mktsegment", "o_orderkey",
                                    "o_total_milli", "rank"]].values))
        assert gotl == ref


class TestDistributedComponents:
    """dedup_groups_distributed (min-label propagation) must equal the
    driver union-find on arbitrary pair graphs."""

    def _check(self, ray_session, pairs):
        pdf = pd.DataFrame({"doc_a": [a for a, _ in pairs],
                            "doc_b": [b for _, b in pairs]})
        ref = dd.dedup_groups(pdf)
        ref = ref[ref.doc_id.isin(
            set(pdf.doc_a) | set(pdf.doc_b))]  # only docs in pairs
        got = dd.dedup_groups_distributed(
            rd.from_pandas(pdf.astype("int64"))).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        ref = ref.sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["cluster_rep"].tolist() == ref["cluster_rep"].tolist()

    def test_random_graph_matches_union_find(self, ray_session):
        # dense-ish graph: shallow components, converges in 2-3 rounds
        rng = np.random.RandomState(21)
        pairs = set()
        for _ in range(60):
            a, b = rng.randint(0, 40, size=2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        self._check(ray_session, sorted(pairs))

    def test_chain(self, ray_session):
        # path graph: diameter = length; exercises multi-round
        # propagation (label must walk the whole chain)
        chain = [(i, i + 1) for i in range(3)]
        self._check(ray_session, chain)

    def test_empty_pairs(self, ray_session):
        empty = rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")}))
        out = dd.dedup_groups_distributed(empty).to_pandas()
        assert len(out) == 0


class TestGroupedQuantiles:
    def test_matches_numpy_per_key(self, ray_session):
        rng = np.random.RandomState(9)
        df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], size=3000),
                           "v": rng.randint(1, 40, size=3000)
                           .astype(np.float64)})
        qs = [0.25, 0.5, 0.9]
        out = wn.grouped_quantiles(rd.from_pandas(df), key_col="k",
                                   value_col="v", qs=qs)
        for key, g in df.groupby("k"):
            srt = np.sort(g["v"].to_numpy())
            for q in qs:
                want = srt[int(np.floor(q * (len(srt) - 1)))]
                got = out[(out.k == key) & (out.q == q)]["val"].iloc[0]
                assert got == want, (key, q)


class TestPrefixSum:
    def test_matches_pandas_cumsum(self, ray_session):
        rng = np.random.RandomState(17)
        n = 5000
        keys = rng.permutation(n).astype(np.int64)       # shuffled order
        vals = rng.randint(0, 100, size=n).astype(np.int64)
        df = pd.DataFrame({"k": keys, "v": vals})
        out = wn.prefix_sum(rd.from_pandas(df).repartition(8),
                            key_col="k", value_col="v",
                            part_size=64).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        want = df.sort_values("k").reset_index(drop=True)
        assert (out["k"].to_numpy() == want["k"].to_numpy()).all()
        assert (out["running"].to_numpy()
                == want["v"].cumsum().to_numpy()).all()

    def test_sparse_keys_with_gaps(self, ray_session):
        # entire partitions missing: offsets dict must skip them
        df = pd.DataFrame({"k": np.array([5, 3000, 9000, 9001],
                                         dtype=np.int64),
                           "v": np.array([10, 20, 30, 40],
                                         dtype=np.int64)})
        out = wn.prefix_sum(rd.from_pandas(df), key_col="k",
                            value_col="v", part_size=100).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert out["running"].tolist() == [10, 30, 60, 100]


class TestPrefixMax:
    def test_matches_pandas_cummax(self, ray_session):
        rng = np.random.RandomState(19)
        n = 5000
        keys = rng.permutation(n).astype(np.int64)
        vals = rng.randint(-1000, 1000, size=n).astype(np.int64)
        df = pd.DataFrame({"k": keys, "v": vals})
        out = wn.prefix_max(rd.from_pandas(df).repartition(8),
                            key_col="k", value_col="v",
                            part_size=64).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        want = df.sort_values("k").reset_index(drop=True)
        assert (out["k"].to_numpy() == want["k"].to_numpy()).all()
        assert (out["running"].to_numpy()
                == want["v"].cummax().to_numpy()).all()

    def test_extra_cols_ride_pass_two(self, ray_session):
        df = pd.DataFrame({
            "k": np.array([2, 0, 1, 3], dtype=np.int64),
            "v": np.array([5, 9, 1, 4], dtype=np.int64),
            "tag": ["c", "a", "b", "d"]})
        out = wn.prefix_max(rd.from_pandas(df), key_col="k",
                            value_col="v", extra_cols=["tag"],
                            part_size=2).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert out["tag"].tolist() == ["a", "b", "c", "d"]
        assert out["running"].tolist() == [9, 9, 9, 9]

    def test_sparse_keys_with_gaps(self, ray_session):
        df = pd.DataFrame({"k": np.array([5, 3000, 9000, 9001],
                                         dtype=np.int64),
                           "v": np.array([40, 20, 30, 10],
                                         dtype=np.int64)})
        out = wn.prefix_max(rd.from_pandas(df), key_col="k",
                            value_col="v", part_size=100).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert out["running"].tolist() == [40, 40, 40, 40]

    def test_negative_values_floor(self, ray_session):
        # all-negative values: the INT64_MIN exclusive floor must not
        # leak into results
        df = pd.DataFrame({"k": np.arange(6, dtype=np.int64),
                           "v": np.array([-5, -9, -1, -7, -2, -8],
                                         dtype=np.int64)})
        out = wn.prefix_max(rd.from_pandas(df), key_col="k",
                            value_col="v", part_size=2).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert out["running"].tolist() == [-5, -5, -1, -1, -1, -1]

    def test_empty_typed(self, ray_session):
        df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        out = wn.prefix_max(rd.from_pandas(df), key_col="k",
                            value_col="v")
        # the DATASET stays typed (Ray's to_pandas drops schema on
        # all-empty blocks, a known quirk shared with prefix_sum)
        assert out.schema().names == ["k", "v", "running"]
        assert out.count() == 0


class TestGroupedRunningSum:
    def test_matches_pandas_groupby_cumsum(self, ray_session):
        rng = np.random.RandomState(23)
        n = 4000
        df = pd.DataFrame({
            "user": rng.randint(0, 97, size=n).astype(np.int64),
            "seq": rng.permutation(n).astype(np.int64),
            "v": rng.randint(-5, 50, size=n).astype(np.int64)})
        out = wn.grouped_running_sum(
            rd.from_pandas(df).repartition(8), key_col="user",
            order_cols=["seq"], value_col="v", num_buckets=8) \
            .to_pandas().sort_values(["user", "seq"]) \
            .reset_index(drop=True)
        want = df.sort_values(["user", "seq"]).reset_index(drop=True)
        want["running"] = want.groupby("user")["v"].cumsum()
        assert (out["running"].to_numpy()
                == want["running"].to_numpy()).all()


class TestLatestPerKey:
    def test_matches_pandas_argmax(self, ray_session):
        import ray.data as rd
        rng = np.random.RandomState(11)
        n = 4000
        df = pd.DataFrame({
            "k": rng.randint(0, 131, size=n).astype(np.int64),
            "o": rng.randint(0, 40, size=n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "payload": [f"p{i}" for i in range(n)]})
        out = wn.latest_per_key(
            rd.from_pandas(df).repartition(16), key_col="k",
            order_cols=["o", "id"], num_buckets=8) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        want = df.sort_values(["k", "o", "id"],
                              ascending=[True, False, False]) \
            .drop_duplicates("k", keep="first") \
            .sort_values("k").reset_index(drop=True)
        assert out[["k", "o", "id", "payload"]].equals(
            want[["k", "o", "id", "payload"]])


class TestGroupedPearson:
    def test_matches_numpy_corrcoef(self, ray_session):
        import ray.data as rd
        rng = np.random.RandomState(5)
        n = 6000
        df = pd.DataFrame({
            "k": rng.randint(0, 7, n).astype(np.int64),
            "x": rng.normal(10, 3, n),
            "y": rng.normal(100, 20, n)})
        df["y"] += 0.5 * df["x"] * (df["k"] % 3)   # varying coupling
        out = wn.grouped_pearson(
            rd.from_pandas(df).repartition(12), key_col="k",
            x_col="x", y_col="y", num_buckets=4).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        for _, r in out.iterrows():
            g = df[df.k == r["k"]]
            want = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(r["corr"] - want) < 1e-9
            assert r["n"] == len(g)

    def test_zero_variance_is_nan(self, ray_session):
        import ray.data as rd
        df = pd.DataFrame({"k": [0, 0, 0], "x": [1.0, 1.0, 1.0],
                           "y": [1.0, 2.0, 3.0]})
        out = wn.grouped_pearson(rd.from_pandas(df), key_col="k",
                                 x_col="x", y_col="y").to_pandas()
        assert len(out) == 1 and np.isnan(out.iloc[0]["corr"])


class TestGroupedLag:
    def test_matches_pandas_shift(self, ray_session, events_df):
        out = wn.grouped_lag(
            rd.from_pandas(events_df).repartition(8), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            num_buckets=8).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        ref = events_df.sort_values(["user_id", "ts", "event_id"]).copy()
        ref["prev"] = ref.groupby("user_id")["value_centi"].shift(1) \
            .astype("float64")
        ref = ref.sort_values("event_id").reset_index(drop=True)
        got, want = out["prev"].to_numpy(), ref["prev"].to_numpy()
        same = (got == want) | (np.isnan(got) & np.isnan(want))
        assert same.all()

    def test_lag_never_crosses_keys(self, ray_session):
        df = pd.DataFrame({"event_id": [0, 1, 2, 3],
                           "user_id": [1, 1, 2, 2],
                           "ts": [10, 20, 10, 20],
                           "value_centi": [100, 200, 7, 8]})
        out = wn.grouped_lag(
            rd.from_pandas(df), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="value_centi",
            num_buckets=2).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        prev = out["prev"].tolist()
        assert np.isnan(prev[0]) and prev[1] == 100.0
        assert np.isnan(prev[2]) and prev[3] == 7.0

    def test_string_values_keep_dtype(self, ray_session):
        # lagging a STRING column (event-type transitions) must not
        # float-cast: first row per key is None, others the prior label
        df = pd.DataFrame({"event_id": [0, 1, 2, 3, 4],
                           "user_id": [1, 1, 1, 2, 2],
                           "ts": [10, 20, 30, 10, 20],
                           "event_type": ["a", "b", "a", "c", "a"]})
        out = wn.grouped_lag(
            rd.from_pandas(df).repartition(3), key_col="user_id",
            order_cols=["ts", "event_id"], value_col="event_type",
            num_buckets=2).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        got = out["prev"].tolist()
        assert pd.isna(got[0]) and pd.isna(got[3])
        assert [got[1], got[2], got[4]] == ["a", "b", "c"]


class TestGroupedMad:
    def test_matches_numpy_lower_median(self, ray_session):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({"k": rng.integers(0, 3, 500),
                           "v": rng.integers(0, 40, 500)})
        out = wn.grouped_mad(rd.from_pandas(df).repartition(6),
                             key_col="k", value_col="v") \
            .sort_values("k").reset_index(drop=True)

        def lower_med(a):
            a = np.sort(a)
            return int(a[(len(a) - 1) // 2])

        for _, row in out.iterrows():
            vals = df[df["k"] == row["k"]]["v"].to_numpy()
            med = lower_med(vals)
            assert row["med"] == med
            assert row["mad"] == lower_med(np.abs(vals - med))

    def test_empty_input(self, ray_session):
        empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="int64")})
        out = wn.grouped_mad(rd.from_pandas(empty),
                             key_col="k", value_col="v")
        assert len(out) == 0 and list(out.columns) == ["k", "med", "mad"]


class TestGroupedTopkDense:
    def test_matches_pandas_dense_rank(self, ray_session, events_df):
        out = wn.grouped_topk_dense(
            rd.from_pandas(events_df).repartition(8), key_col="user_id",
            value_col="value_centi", k=3, num_buckets=8).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        dr = events_df.groupby("user_id")["value_centi"] \
            .rank(method="dense", ascending=False)
        want = events_df[dr <= 3].copy()
        want["dense_rank"] = dr[dr <= 3].astype("int64")
        want = want.sort_values("event_id").reset_index(drop=True)
        assert len(out) == len(want)
        for c in ("event_id", "user_id", "value_centi", "dense_rank"):
            assert (out[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_ties_all_kept(self, ray_session):
        # two rows share the top value: both rank 1, k=1 keeps both
        df = pd.DataFrame({"id": [0, 1, 2, 3],
                           "k": [7, 7, 7, 7],
                           "v": [50, 50, 10, 5]})
        out = wn.grouped_topk_dense(
            rd.from_pandas(df).repartition(4), key_col="k",
            value_col="v", k=1, num_buckets=2).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert out["id"].tolist() == [0, 1]
        assert out["dense_rank"].tolist() == [1, 1]


class TestGlobalRankByValue:
    def test_matches_argsort(self, ray_session, events_df):
        out = wn.global_rank_by_value(
            rd.from_pandas(events_df).repartition(8),
            value_col="value_centi", id_col="event_id",
            num_parts=16).to_pandas() \
            .sort_values("rank").reset_index(drop=True)
        want = events_df.sort_values(["value_centi", "event_id"]) \
            .reset_index(drop=True)
        assert (out["event_id"].to_numpy()
                == want["event_id"].to_numpy()).all()
        assert (out["rank"].to_numpy()
                == np.arange(len(want), dtype=np.int64)).all()

    def test_value_ties_break_by_id(self, ray_session):
        # heavy ties: equal values land in ONE partition, id breaks ties
        df = pd.DataFrame({"id": np.arange(100, dtype=np.int64)[::-1],
                           "v": np.repeat([5, 5, 9, 9], 25)
                          .astype(np.int64)[:100]})
        out = wn.global_rank_by_value(
            rd.from_pandas(df).repartition(6), value_col="v",
            id_col="id", num_parts=8).to_pandas() \
            .sort_values("rank").reset_index(drop=True)
        want = df.sort_values(["v", "id"]).reset_index(drop=True)
        assert (out["id"].to_numpy() == want["id"].to_numpy()).all()

    def test_empty_input_typed(self, ray_session):
        df = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                           "v": pd.Series([], dtype="int64")})
        out = wn.global_rank_by_value(
            rd.from_pandas(df), value_col="v", id_col="id")
        # dataset-level schema stays fully typed (to_pandas on an empty
        # Dataset drops columns — a Ray quirk, not an operator contract)
        assert out.count() == 0
        assert set(out.schema().names) == {"id", "v", "rank"}


class TestGroupedPercentRank:
    def test_matches_pandas_rank(self, ray_session):
        rng = np.random.RandomState(31)
        n = 3000
        df = pd.DataFrame({
            "eid": np.arange(n, dtype=np.int64),
            "user": rng.randint(0, 40, size=n).astype(np.int64),
            "v": rng.randint(0, 50, size=n).astype(np.float64)})
        out = wn.grouped_percent_rank(
            rd.from_pandas(df).repartition(8), key_col="user",
            order_col="v", id_cols=["eid"]).to_pandas() \
            .sort_values("eid").reset_index(drop=True)
        want = df.sort_values("eid").reset_index(drop=True)
        rnk = want.groupby("user")["v"].rank(method="min") \
            .astype("int64")
        nk = want.groupby("user")["v"].transform("size").astype("int64")
        pr = np.where(nk > 1, (rnk - 1) * 1_000_000
                      // np.maximum(nk - 1, 1), 0)
        assert (out["rnk"].to_numpy() == rnk.to_numpy()).all()
        assert (out["n_key"].to_numpy() == nk.to_numpy()).all()
        assert (out["pr_micro"].to_numpy() == pr).all()

    def test_singleton_key_zero(self, ray_session):
        df = pd.DataFrame({"eid": [0], "user": [7], "v": [3.5]})
        out = wn.grouped_percent_rank(
            rd.from_pandas(df), key_col="user", order_col="v",
            id_cols=["eid"]).to_pandas()
        assert out["pr_micro"].tolist() == [0]
        assert out["rnk"].tolist() == [1] and out["n_key"].tolist() == [1]


class TestGroupedZscore:
    def test_matches_pandas_two_pass(self, ray_session, events_df):
        out = wn.grouped_zscore(
            rd.from_pandas(events_df).repartition(8), key_col="user_id",
            value_col="value_centi").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        df = events_df
        rows = []
        for uid, g in df.groupby("user_id"):
            v = g["value_centi"].to_numpy(dtype=np.int64)
            n, s, s2 = len(v), int(v.sum()), int((v * v).sum())
            var = (s2 - (s * s) / n) / (n - 1)
            if n < 2 or var <= 0:
                continue
            z = np.floor((v.astype(np.float64) - s / n)
                         / np.sqrt(var) * 1000).astype(np.int64)
            for eid, zz in zip(g["event_id"], z):
                rows.append((int(eid), int(zz)))
        want = pd.DataFrame(rows, columns=["event_id", "z_milli"]) \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == len(want)
        assert (out["event_id"].to_numpy()
                == want["event_id"].to_numpy()).all()
        assert (out["z_milli"].to_numpy()
                == want["z_milli"].to_numpy()).all()

    def test_degenerate_keys_dropped(self, ray_session):
        # n=1 key and zero-variance key produce no rows; normal key does
        df = pd.DataFrame({"k": [1, 2, 2, 3, 3, 3],
                           "v": [5, 7, 7, 1, 2, 9]})
        out = wn.grouped_zscore(rd.from_pandas(df), key_col="k",
                                value_col="v").to_pandas()
        assert set(out["k"]) == {3} and len(out) == 3
