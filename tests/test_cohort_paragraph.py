"""Ray-vs-DuckDB parity for q_retention_cohorts and q_paragraph_dedup
on PURPOSE-BUILT inputs: the driver fixture's documents are
single-paragraph (no ``\\n\\n``) and its events span few weeks, so
these tests run both sides on synthetic tables that actually exercise
the semantics — shared boilerplate paragraphs across docs, empty-split
artifacts, whitespace-only and unicode paragraphs, multi-week user
timelines with gaps."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.queries import (
    Q_PARAGRAPH_DEDUP_SQL,
    Q_RETENTION_COHORTS_SQL,
    q_paragraph_dedup,
    q_retention_cohorts,
)

BOILER = "subscribe to our newsletter for updates"
BOILER2 = "© example corp — all rights reserved"


def _write(tmp_path, name: str, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _oracle(sf_dir: str, table: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{table}.parquet')")
    return con.execute(sql).df()


class TestTsUsHelper:
    def test_unit_robust(self):
        from news_crawler_ray.queries import _ts_us
        us_vals = [1_700_000_000_000_000, 1_700_000_123_456_789]
        t_us = pa.table({"ts": pa.array(us_vals, pa.timestamp("us"))})
        t_ns = pa.table({"ts": pa.array([v * 1000 for v in us_vals],
                                        pa.timestamp("ns"))})
        t_s = pa.table({"ts": pa.array([v // 1_000_000 for v in us_vals],
                                       pa.timestamp("s"))})
        assert _ts_us(t_us).to_pylist() == us_vals
        assert _ts_us(t_ns).to_pylist() == us_vals
        assert _ts_us(t_s).to_pylist() == [v // 1_000_000 * 1_000_000
                                           for v in us_vals]


class TestParagraphDedupParity:
    def test_multi_paragraph_corpus(self, ray_session, tmp_path):
        docs = [
            f"intro zero\n\n{BOILER}\n\nbody zero",
            f"{BOILER}\n\nbody one\n\n{BOILER2}",
            # empty-split artifact (4 newlines → '' element) + repeat
            f"body two\n\n\n\n{BOILER}",
            # whitespace-only paragraph is real content (kept, dedupable)
            " \t \n\nbody three\n\n \t ",
            f"{BOILER2}\n\nbody zero",          # cross-doc repeated body
            "üñíçødé ¶αράγραφος\n\nüñíçødé ¶αράγραφος",  # in-doc repeat
            "",                                  # empty doc → zero paras
        ]
        df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                           "text": docs,
                           "lang": ["en"] * len(docs),
                           "source": ["s"] * len(docs),
                           "n_chars": [len(t) for t in docs]})
        sf = _write(tmp_path, "documents", df)
        got = q_paragraph_dedup(sf)
        want = _oracle(sf, "documents", Q_PARAGRAPH_DEDUP_SQL)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype(got.dtypes.to_dict()).reset_index(drop=True))
        # semantic spot checks, independent of the oracle
        by_id = got.set_index("doc_id")
        assert by_id.loc[0, "n_paras"] == 3 and by_id.loc[0, "n_kept"] == 3
        assert by_id.loc[1, "n_kept"] == 2     # BOILER already seen in doc 0
        assert by_id.loc[2, "n_paras"] == 2    # '' artifact dropped
        assert by_id.loc[2, "n_kept"] == 1     # BOILER dup again
        assert by_id.loc[4, "n_kept"] == 0     # both paras seen before
        assert by_id.loc[5, "n_kept"] == 1     # in-doc repeat: first kept
        assert 6 not in by_id.index            # empty doc emits no row

    def test_whitespace_paragraph_matches_sql(self, ray_session, tmp_path):
        # '\t' paragraph: Python strip() vs DuckDB trim() disagree —
        # the shared rule (skip only EMPTY) must hold on both sides
        docs = ["a\n\n\t\n\nb", "\t\n\nc"]
        df = pd.DataFrame({"doc_id": [0, 1], "text": docs,
                           "lang": ["en"] * 2, "source": ["s"] * 2,
                           "n_chars": [len(t) for t in docs]})
        sf = _write(tmp_path, "documents", df)
        got = q_paragraph_dedup(sf)
        want = _oracle(sf, "documents", Q_PARAGRAPH_DEDUP_SQL)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype(got.dtypes.to_dict()).reset_index(drop=True))
        by_id = got.set_index("doc_id")
        # doc 0 keeps all three paras ('a', '\t', 'b'); doc 1's '\t'
        # is a dup of doc 0's, so only 'c' survives — which is exactly
        # what a strip()-based skip rule would have silently changed
        assert by_id.loc[0, "n_kept"] == 3
        assert by_id.loc[1, "n_paras"] == 2 and by_id.loc[1, "n_kept"] == 1


class TestRetentionCohortsParity:
    def test_multi_week_gaps(self, ray_session, tmp_path):
        week_us = 604_800_000_000
        rows = []
        # cohort A (week 0): u1 active weeks 0,1,3; u2 weeks 0,3
        # cohort B (week 1): u3 active weeks 1,2
        # u1 twice in week 0 (distinctness), odd intra-week offsets
        for uid, wk in [(1, 0), (1, 0), (1, 1), (1, 3), (2, 0), (2, 3),
                        (3, 1), (3, 2)]:
            rows.append((len(rows), wk * week_us + uid * 3_600_000_000,
                         uid, "view", 1.0, "{}"))
        df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                         "event_type", "value", "props"])
        df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
        df = df[["event_id", "ts", "user_id", "event_type", "value",
                 "props"]]
        sf = _write(tmp_path, "events", df)
        got = q_retention_cohorts(sf)
        want = _oracle(sf, "events", Q_RETENTION_COHORTS_SQL)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype(got.dtypes.to_dict()).reset_index(drop=True))
        cells = {(r.cohort_week_us // week_us, r.week_offset): r.n_users
                 for r in got.itertuples()}
        assert cells[(0, 0)] == 2 and cells[(0, 3)] == 2
        assert cells[(0, 1)] == 1 and (0, 2) not in cells
        assert cells[(1, 0)] == 1 and cells[(1, 1)] == 1
