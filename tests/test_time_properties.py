"""Property-based tests (hypothesis) for the window/chunk math — the
planning logic every copy/sync run depends on (C1 sync.go:118-146, X4
client.go:24-38). The properties encode the invariants the reference
gets wrong (SURVEY §4 quirks): full coverage of [start, end) with no
boundary loss and no overlap."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from syncflux_spark.functions.time import (
    chunk_windows,
    copy_window,
    parse_duration,
)

EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)

spans = st.integers(min_value=1, max_value=90 * 24 * 3600)  # ≤ 90 days, s
chunks = st.integers(min_value=1, max_value=14 * 24 * 3600)
offsets = st.integers(min_value=0, max_value=10**6)


@settings(max_examples=50, deadline=None)
@given(span=spans, chunk=chunks, off=offsets)
def test_chunks_cover_window_exactly(span, chunk, off):
    start = EPOCH + timedelta(seconds=off)
    end = start + timedelta(seconds=span)
    wins = chunk_windows(start, end, timedelta(seconds=chunk))
    # newest-first
    assert all(wins[i][1] > wins[i + 1][1] for i in range(len(wins) - 1))
    # exact tiling: sorted windows are contiguous, cover [start, end)
    s_sorted = sorted(wins)
    assert s_sorted[0][0] == start
    assert s_sorted[-1][1] == end
    for (s1, e1), (s2, e2) in zip(s_sorted, s_sorted[1:]):
        assert e1 == s2  # no gap, no overlap — no boundary-second loss
    # every window non-empty and ≤ chunk wide
    for s, e in wins:
        assert timedelta(0) < e - s <= timedelta(seconds=chunk)


@settings(max_examples=50, deadline=None)
@given(span=spans, chunk=chunks, maxret=st.integers(1, 30 * 24 * 3600))
def test_chunk_clamp_never_exceeds_retention_plus_one(span, chunk, maxret):
    start = EPOCH
    end = start + timedelta(seconds=span)
    wins = chunk_windows(
        start, end, timedelta(seconds=chunk), timedelta(seconds=maxret)
    )
    # sync.go:122-126: at most maxret/chunk + 1 chunks
    assert len(wins) <= int(timedelta(seconds=maxret) / timedelta(seconds=chunk)) + 1
    if wins:  # clamped windows still end at `end` (newest data first)
        assert wins[0][1] == end


@settings(max_examples=50, deadline=None)
@given(
    dur=st.one_of(st.none(), st.integers(0, 10**6).map(lambda s: timedelta(seconds=s))),
    maxret=st.integers(1, 10**6).map(lambda s: timedelta(seconds=s)),
)
def test_copy_window_clamp(dur, maxret):
    now = EPOCH
    start, end = copy_window(dur, maxret, now)
    assert end == now
    span = end - start
    assert span <= maxret
    # infinite (None/0) or over-long RPs clamp to maxret, else exact
    if dur is None or dur <= timedelta(0) or dur > maxret:
        assert span == maxret
    else:
        assert span == dur


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(0, 10**6),
    unit=st.sampled_from(["s", "m", "h"]),
)
def test_parse_duration_units(n, unit):
    mult = {"s": 1, "m": 60, "h": 3600}[unit]
    assert parse_duration(f"{n}{unit}") == timedelta(seconds=n * mult)


class TestGlobalRankProperties:
    def test_random_orders_match_single_partition(self, spark):
        """global_rank == ROW_NUMBER over a total order, for arbitrary
        key distributions (duplicates, skew, negatives) and any
        range-partition count."""
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from syncflux_spark.utils import global_rank

        rng = random.Random(42)
        for trial in range(3):
            n = rng.randint(1, 400)
            n_ranges = rng.choice([1, 2, 7, 64])
            rows = [
                (rng.choice([-5, 0, 3, rng.randint(-100, 100)]), i)
                for i in range(n)
            ]
            df = spark.createDataFrame(rows, "k long, id long")
            got = {
                (r.k, r.id): r._rank
                for r in global_rank(
                    df, ["k", "id"], n_ranges=n_ranges
                ).collect()
            }
            want = {
                (r.k, r.id): r.rn
                for r in df.withColumn(
                    "rn", F.row_number().over(Window.orderBy("k", "id"))
                ).collect()
            }
            assert got == want, (trial, n, n_ranges)


class TestParserRobustness:
    """The InfluxQL parser fronts the /query endpoint — arbitrary
    client bytes. It may REJECT input only via InfluxQLError; any
    other exception type is a crash a client can trigger remotely."""

    @settings(max_examples=300, deadline=None)
    @given(q=st.text(max_size=120))
    def test_garbage_never_crashes(self, q):
        from syncflux_spark.influxql import InfluxQLError, parse

        try:
            parse(q)
        except InfluxQLError:
            pass

    @settings(max_examples=300, deadline=None)
    @given(
        frag=st.lists(
            st.sampled_from(
                [
                    "select", "from", "where", "group", "by", "time",
                    "(", ")", ",", "*", "'", '"', "1d", "mean", "value",
                    "events", "and", "or", ">", "<", "=", "now()", "-",
                    "fill", "limit", "order", "desc", ";", "0", "1.5",
                ]
            ),
            max_size=14,
        )
    )
    def test_token_soup_never_crashes(self, frag):
        from syncflux_spark.influxql import InfluxQLError, parse

        try:
            parse(" ".join(frag))
        except InfluxQLError:
            pass

    _STMT = (
        "SELECT mean(value) FROM events WHERE time >= '2024-01-01' "
        "GROUP BY time(1d), event_type fill(0) ORDER BY time DESC "
        "LIMIT 5 OFFSET 2 SLIMIT 3 SOFFSET 1 tz('UTC')"
    )

    @settings(max_examples=200, deadline=None)
    @given(
        i=st.integers(0, len(_STMT)),
        tail=st.sampled_from(["", "(", ",", "'", '"', "9", ".", "*"]),
    )
    def test_truncated_statement_never_crashes(self, i, tail):
        """Prefix truncation + a junk tail is the classic EOF-crash
        class (found int()/float()/peek().text crashes on first run)."""
        from syncflux_spark.influxql import InfluxQLError, parse

        try:
            parse(self._STMT[:i] + tail)
        except InfluxQLError:
            pass
