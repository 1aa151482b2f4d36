"""Semantics tests for asof_join and sessionize on tiny hand-built
frames — the edge cases the sf0.01 oracle parity run can't isolate:
unmatched left rows, equal-timestamp matches, single-event sessions,
and exact gap boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from syncflux_spark.operators.downsample import asof_join, sessionize

UTC = dt.timezone.utc


def _t(s):
    return dt.datetime.fromisoformat(s).replace(tzinfo=UTC)


def test_asof_backward_match_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), "a"),
         (1, _t("2024-01-01 12:00:00"), "b"),
         (2, _t("2024-01-01 09:00:00"), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 09:30:00"), 10.0),
         (1, _t("2024-01-01 11:00:00"), 20.0),
         (2, _t("2024-01-01 09:30:00"), 99.0)],  # after left → no match
        "user_id long, ts timestamp, v double",
    )
    out = {
        (r.user_id, r.tag): (r.v_asof, r.ts_asof)
        for r in asof_join(left, right, ["user_id"], "ts", ["v"]).collect()
    }
    assert out[(1, "a")][0] == 10.0
    assert out[(1, "b")][0] == 20.0  # latest prior, not first
    assert out[(2, "c")] == (None, None)  # backward-only: no future match


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), 7.0)],
        "user_id long, ts timestamp, v double",
    )
    [row] = asof_join(left, right, ["user_id"], "ts", ["v"]).collect()
    assert row.v_asof == 7.0  # t_right <= t_left, not <


def test_sessionize_gap_boundary(spark):
    base = _t("2024-01-01 00:00:00")
    rows = [
        (1, base, 1),
        (1, base + dt.timedelta(seconds=1800), 2),   # == gap → same session
        (1, base + dt.timedelta(seconds=3601), 3),   # > gap → new session
        (2, base, 4),                                # other key independent
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {
        r.event_id: r.session_id
        for r in sessionize(df, ["user_id"], 1800, "ts", "event_id").collect()
    }
    assert out[1] == 1
    assert out[2] == 1  # gap exactly == 1800s does NOT split
    assert out[3] == 2
    assert out[4] == 1


def test_sessionize_equal_ts_tiebreak(spark):
    base = _t("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(1, base, 2), (1, base, 1)],
        "user_id long, ts timestamp, event_id long",
    )
    out = sessionize(df, ["user_id"], 60, "ts", "event_id")
    assert [r.session_id for r in out.orderBy("event_id").collect()] == [1, 1]


def test_salted_join_matches_plain_join(spark):
    from syncflux_spark.utils import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k long, v long"
    )  # key 1 is hot
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, s string")
    got = salted_join(left, right, ["k"], n_salts=4)
    plain = left.join(right, "k")
    assert got.count() == plain.count() == 101
    assert sorted(r.s for r in got.select("s").distinct().collect()) == ["a", "b"]


class TestLangConsistency:
    def test_mixed_doc_flagged(self, spark):
        from syncflux_spark.operators.textops import lang_consistency

        en = "the cat and the dog of the house " * 8  # ~64 tokens
        es = "el gato la casa los perros el sol " * 8
        rows = [
            ("pure", en * 2),
            ("mixed", en + es),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        out = {r.doc_id: r for r in lang_consistency(df).collect()}
        assert out["pure"].majority_lang == "en"
        assert out["pure"].mix_ratio == 0.0 and out["pure"].n_langs == 1
        assert out["mixed"].n_langs == 2
        assert 0.3 < out["mixed"].mix_ratio < 0.7
