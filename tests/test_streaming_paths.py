"""Streaming session paths (streaming/paths.py) and rolling actives
(streaming/actives.py): the batch-boundary straddle pin, watermark
retirement of closed sessions (state boundedness), redelivery
idempotence, replay no-op, config pin, and fold ≡ one-shot parity."""

import datetime
import os

from pyspark.sql import functions as F

from library_beam_spark.operators.sessions import sessionize
from library_beam_spark.streaming.actives import (
    rolling_active_result,
    rolling_active_stream_batches,
)
from library_beam_spark.streaming.paths import (
    _trigram_counts,
    session_paths_result,
    session_paths_stream_batches,
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(m), e, t) for u, m, e, t in rows],
        "user_id long, ts timestamp_ntz, event_id long, event_type string",
    )


def _counts(df):
    return {
        (r.step1, r.step2, r.step3): r.n for r in df.collect()
    }


def _oneshot(spark, rows, gap=1800):
    return _counts(
        _trigram_counts(sessionize(_batch(spark, rows), gap_seconds=gap))
    )


class TestSessionPaths:
    def test_boundary_straddle_equals_oneshot(self, spark, tmp_path):
        """THE boundary case: user 1's session has events in BOTH
        batches with gaps < 30 min across the cut — its trigrams must
        match the one-shot run (the open prefix rides state into the
        batch-1 union and re-stitches)."""
        rows = [
            (1, 0, 1, "view"), (1, 10, 2, "click"), (1, 20, 3, "view"),
            # --- batch cut at minute 25 ---
            (1, 30, 4, "click"), (1, 40, 5, "purchase"),
            (2, 35, 6, "view"), (2, 45, 7, "view"), (2, 50, 8, "click"),
        ]
        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed)
        step(_batch(spark, [r for r in rows if r[1] < 25]), 0)
        step(_batch(spark, [r for r in rows if r[1] >= 25]), 1)
        got = _counts(session_paths_result(spark, idx, closed))
        assert got == _oneshot(spark, rows)
        # the straddling session's cross-cut trigram is present
        assert got[("click", "view", "click")] == 1

    def test_gap_split_sessions_not_stitched(self, spark, tmp_path):
        """Events separated by > gap across the batch cut must stay
        two sessions (no trigram bridges them)."""
        rows = [
            (1, 0, 1, "view"), (1, 5, 2, "click"), (1, 10, 3, "view"),
            (1, 100, 4, "click"), (1, 105, 5, "view"), (1, 110, 6, "click"),
        ]
        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed)
        step(_batch(spark, rows[:3]), 0)
        step(_batch(spark, rows[3:]), 1)
        got = _counts(session_paths_result(spark, idx, closed))
        assert got == _oneshot(spark, rows)
        assert ("view", "click", "view") in got  # within session 1
        assert ("view", "click", "click") not in got  # never bridged

    def test_watermark_retires_closed_sessions(self, spark, tmp_path):
        """Sessions whose gap has definitively elapsed leave state in
        the batch that closes them — their counts land in closed_dir
        and their events are dropped (the boundedness property)."""
        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed)
        step(
            _batch(spark, [
                (1, 0, 1, "view"), (1, 5, 2, "click"), (1, 10, 3, "view"),
                (1, 100, 4, "click"),  # watermark: closes the first run
            ]),
            0,
        )
        state = spark.read.parquet(os.path.join(idx, "batch=0"))
        assert state.count() == 1  # only the open session's event
        assert state.collect()[0].event_id == 4
        emitted = _counts(
            spark.read.parquet(os.path.join(closed, "batch=0"))
        )
        assert emitted == {("view", "click", "view"): 1}

    def test_redelivery_and_replay_idempotent(self, spark, tmp_path):
        rows0 = [(1, 0, 1, "view"), (1, 5, 2, "click"), (1, 9, 3, "view")]
        rows1 = [(1, 9, 3, "view"), (1, 12, 4, "click")]  # redelivered
        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed)
        step(_batch(spark, rows0), 0)
        step(_batch(spark, rows1), 1)
        step(_batch(spark, rows1), 1)  # replay: committed -> no-op
        got = _counts(session_paths_result(spark, idx, closed))
        assert got == _oneshot(
            spark, rows0 + [(1, 12, 4, "click")]
        )

    def test_config_pin(self, spark, tmp_path):
        import pytest

        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed, gap_seconds=1800)
        step(_batch(spark, [(1, 0, 1, "view")]), 0)
        other = session_paths_stream_batches(idx, closed, gap_seconds=60)
        with pytest.raises(ValueError, match="config"):
            other(_batch(spark, [(1, 1, 2, "view")]), 1)

    def test_result_flush_gap_pinned(self, spark, tmp_path):
        """r11 ADVICE: the flush must use the gap the STREAM segmented
        with — session_paths_result reads it from the committed
        pointer's pinned config, accepts a matching explicit value as
        an assertion, and refuses a mismatching one (which would
        silently re-segment the open sessions)."""
        import pytest

        rows = [(1, 0, 1, "view"), (1, 10, 2, "click"),
                (1, 20, 3, "view"), (1, 30, 4, "purchase")]
        idx, closed = str(tmp_path / "i"), str(tmp_path / "c")
        step = session_paths_stream_batches(idx, closed, gap_seconds=900)
        step(_batch(spark, rows), 0)
        want = _oneshot(spark, rows, gap=900)
        # default: gap read from the pinned config (900, NOT 1800)
        assert _counts(session_paths_result(spark, idx, closed)) == want
        # explicit matching value: allowed as an assertion
        assert _counts(
            session_paths_result(spark, idx, closed, gap_seconds=900)
        ) == want
        with pytest.raises(ValueError, match="pinned"):
            session_paths_result(spark, idx, closed, gap_seconds=1800)


class TestRollingActives:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [(u, _ts(m)) for u, m in rows],
            "user_id long, ts timestamp_ntz",
        )

    def _oneshot(self, spark, rows):
        ud = self._ev(spark, rows).select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).cast("bigint").alias("d"),
        ).distinct()
        mx = ud.agg(F.max("d").alias("md"))
        cov = ud.select(
            "user_id",
            F.explode(F.sequence("d", F.col("d") + F.lit(6))).alias("day"),
        )
        return {
            r.day: r.n
            for r in cov.join(F.broadcast(mx))
            .filter(F.col("day") <= F.col("md"))
            .groupBy("day")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }

    def test_fold_equals_oneshot_any_split(self, spark, tmp_path):
        rows = [
            (u, 1440 * d + 30 * u)
            for u in range(5)
            for d in range(0, 10, u % 3 + 1)
        ]
        idx = str(tmp_path / "i")
        step = rolling_active_stream_batches(idx)
        # NO arrival contract: split interleaved, not time-ordered
        step(self._ev(spark, rows[::2]), 0)
        step(self._ev(spark, rows[1::2]), 1)
        got = {
            r.day: r.n_users_7d
            for r in rolling_active_result(spark, idx).collect()
        }
        assert got == self._oneshot(spark, rows)

    def test_append_only_novelty(self, spark, tmp_path):
        """Batch 1 redelivers batch 0's pairs — its state partition
        must contain ONLY the novel (user, day) pairs."""
        idx = str(tmp_path / "i")
        step = rolling_active_stream_batches(idx)
        step(self._ev(spark, [(1, 0), (1, 10), (2, 0)]), 0)
        assert spark.read.parquet(f"{idx}/batch=0").count() == 2
        step(self._ev(spark, [(1, 5), (2, 1440), (3, 0)]), 1)
        novel = spark.read.parquet(f"{idx}/batch=1")
        assert {(r.user_id, r.d) for r in novel.collect()} == {
            (2, 1), (3, 0)
        }
        # replay of a committed batch is a no-op
        step(self._ev(spark, [(9, 0)]), 1)
        assert {(r.user_id, r.d) for r in novel.collect()} == {
            (2, 1), (3, 0)
        }


class TestCohortFromActivesState:
    def test_cohort_view_equals_batch(self, spark, tmp_path):
        """The cohort matrix read from the streaming (user, day) state
        must equal the batch computation — one state, two views."""
        from library_beam_spark.streaming.actives import (
            cohort_retention_result,
        )

        rows = [
            (u, 1440 * d + 7 * u)
            for u in range(4)
            for d in range(u, 8, u % 2 + 1)
        ]
        ev = spark.createDataFrame(
            [(u, _ts(m)) for u, m in rows],
            "user_id long, ts timestamp_ntz",
        )
        idx = str(tmp_path / "i")
        step = rolling_active_stream_batches(idx)
        step(ev.limit(0).union(ev.where(F.col("user_id") < 2)), 0)
        step(ev.where(F.col("user_id") >= 2), 1)
        got = {
            (r.cohort, r.offset_d): r.n_users
            for r in cohort_retention_result(spark, idx).collect()
        }
        day = F.datediff(
            F.to_date("ts"), F.lit("2024-01-01").cast("date")
        ).cast("bigint")
        firsts = (
            ev.select("user_id", day.alias("d"))
            .groupBy("user_id").agg(F.min("d").alias("c"))
        )
        expect = {
            (r.c, r.o): r.n
            for r in ev.select("user_id", day.alias("d"))
            .join(firsts, "user_id")
            .select("user_id", "c", (F.col("d") - F.col("c")).alias("o"))
            .distinct()
            .groupBy("c", "o")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == expect


class TestStreamingCC:
    def _e(self, spark, pairs):
        return spark.createDataFrame(pairs, "u long, v long")

    def test_cross_batch_component_merge(self, spark, tmp_path):
        """THE incremental case: batch 0 builds two separate
        components {1,2,3} and {7,8}; a single batch-1 edge (3,7)
        must merge them — only possible if the state stars preserve
        prefix connectivity."""
        from library_beam_spark.streaming.cc import cc_stream_batches

        idx = str(tmp_path / "i")
        step = cc_stream_batches(idx)
        step(self._e(spark, [(1, 2), (2, 3), (7, 8)]), 0)
        s0 = {
            r.node: r.component
            for r in spark.read.parquet(f"{idx}/batch=0").collect()
        }
        assert s0 == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
        step(self._e(spark, [(3, 7), (20, 21)]), 1)
        s1 = {
            r.node: r.component
            for r in spark.read.parquet(f"{idx}/batch=1").collect()
        }
        assert s1 == {1: 1, 2: 1, 3: 1, 7: 1, 8: 1, 20: 20, 21: 20}

    def test_fold_equals_oneshot_any_split_with_redelivery(
        self, spark, tmp_path
    ):
        from library_beam_spark.operators.clustering import (
            connected_components,
        )
        from library_beam_spark.streaming.cc import cc_stream_batches

        edges = [
            (a, b)
            for a in range(0, 40, 3)
            for b in (a + 3, a + 60)
            if (a + b) % 4
        ]
        idx = str(tmp_path / "i")
        step = cc_stream_batches(idx)
        step(self._e(spark, edges[1::2]), 0)   # arbitrary interleave
        step(self._e(spark, edges[::2] + edges[:5]), 1)  # + redelivery
        got = {
            r.node: r.component
            for r in spark.read.parquet(f"{idx}/batch=1").collect()
        }
        one = {
            r.node: r.component
            for r in connected_components(
                self._e(spark, edges), "u", "v"
            ).collect()
        }
        assert got == one


class TestStreamingOHLC:
    def test_fold_equals_oneshot_any_split(self, spark, tmp_path):
        """Interleaved split with bars straddling the cut: the merged
        state must equal the one-shot bars — open from one batch,
        close/high from the other."""
        import decimal

        from library_beam_spark.streaming.ohlc import (
            _batch_bars,
            ohlc_result,
            ohlc_stream_batches,
        )

        rows = [
            ("a", _ts(m), m, decimal.Decimal(m % 17) / 4)
            for m in range(0, 300, 7)
        ] + [
            ("b", _ts(m), 1000 + m, decimal.Decimal((m * 3) % 23))
            for m in range(0, 300, 11)
        ]
        df = lambda rs: spark.createDataFrame(  # noqa: E731
            rs,
            "event_type string, ts timestamp_ntz, event_id long,"
            " value decimal(12,2)",
        )
        idx = str(tmp_path / "i")
        step = ohlc_stream_batches(idx)
        step(df(rows[::2]), 0)     # interleaved: no time ordering
        step(df(rows[1::2]), 1)
        step(df(rows[:3]), 1)      # committed replay: no-op
        got = {
            (r.event_type, r.bucket_ts): (
                r.open_v, r.high_v, r.low_v, r.close_v, r.n_events,
                r.volume,
            )
            for r in ohlc_result(spark, idx).collect()
        }
        one = {
            (r.event_type, r.bucket_ts): (
                r.open_s.value, r.high_v, r.low_v, r.close_s.value,
                r.n_events, r.volume,
            )
            for r in _batch_bars(df(rows)).collect()
        }
        assert got == one
        # at least one bucket genuinely straddles the interleave
        assert len(got) >= 5
