"""Line-protocol codec tests: spec escaping, sparse fields, typed
parse (the reference's wire format — pkg/agent/client.go:471-477 write
path, client.go:430-466 typed decode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.sources.line_protocol import (
    parse_line_protocol,
    to_line_protocol,
)

TAGS = ["host", "dc"]
FIELDS = {
    "n": "integer",
    "temp": "float",
    "ok": "boolean",
    "note": "string",
}


def _roundtrip(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, dc string, n long, temp double, ok boolean, "
        "note string, ts_ns long"
    )
    lines = to_line_protocol(df, "m", TAGS, FIELDS)
    return df, parse_line_protocol(lines, TAGS, FIELDS)


class TestRoundtrip:
    def test_plain_values(self, spark):
        rows = [("h1", "east", 42, 1.5, True, "fine", 1_000_000_001)]
        df, back = _roundtrip(spark, rows)
        r = back.collect()[0]
        assert r.measurement == "m"
        assert (r.host, r.dc, r.n, r.temp, r.ok, r.note, r.ts_ns) == rows[0]

    def test_evil_escaping(self, spark):
        # tag with comma/space/equals; string field with quotes,
        # backslashes, commas, equals, spaces — all spec escapes at once
        rows = [
            (
                "us west,zone=1",
                "a\\b",
                -7,
                -0.25,
                False,
                'say "hi", x=y 5\\n',
                7_000_000_000_000,
            )
        ]
        df, back = _roundtrip(spark, rows)
        r = back.collect()[0]
        assert r.host == "us west,zone=1"
        assert r.dc == "a\\b"
        assert r.n == -7 and r.temp == -0.25 and r.ok is False
        assert r.note == 'say "hi", x=y 5\\n'
        assert r.ts_ns == 7_000_000_000_000

    def test_sparse_fields_omitted_and_null_on_read(self, spark):
        rows = [("h", "d", None, 2.0, None, None, 5)]
        df, back = _roundtrip(spark, rows)
        line = to_line_protocol(df, "m", TAGS, FIELDS).collect()[0].line
        assert "n=" not in line and "ok=" not in line and "note=" not in line
        r = back.collect()[0]
        assert r.n is None and r.ok is None and r.note is None
        assert r.temp == 2.0

    def test_string_field_containing_field_syntax(self, spark):
        # a quoted value that LOOKS like more fields must not split
        rows = [("h", "d", 1, 1.0, True, 'temp=99,n=0i "x" 123', 9)]
        _, back = _roundtrip(spark, rows)
        r = back.collect()[0]
        assert r.note == 'temp=99,n=0i "x" 123'
        assert r.n == 1 and r.temp == 1.0  # real fields unharmed

    def test_float_roundtrip_exact(self, spark):
        vals = [0.1, 1e-300, 6.02214076e23, 3.141592653589793, -0.0]
        rows = [("h", "d", None, v, None, None, i) for i, v in enumerate(vals)]
        _, back = _roundtrip(spark, rows)
        got = {r.ts_ns: r.temp for r in back.collect()}
        for i, v in enumerate(vals):
            assert got[i] == v  # Java shortest-repr string survives cast

    def test_undeclared_ignored_missing_null(self, spark):
        lines = spark.createDataFrame(
            [('weather,host=h1,extra=z temp=1.5,ghost="g" 42',)], ["line"]
        )
        out = parse_line_protocol(lines, TAGS, FIELDS).collect()[0]
        assert out.measurement == "weather"
        assert out.host == "h1" and out.dc is None  # declared-absent → null
        assert out.temp == 1.5 and out.note is None
        assert out.ts_ns == 42

    def test_escaped_measurement(self, spark):
        df = spark.createDataFrame(
            [("h", "d", 1, 1.0, True, "x", 1)],
            "host string, dc string, n long, temp double, ok boolean, "
            "note string, ts_ns long",
        )
        lines = to_line_protocol(df, "my meas,1", TAGS, FIELDS)
        assert lines.collect()[0].line.startswith(r"my\ meas\,1,host=h")
        out = parse_line_protocol(lines, TAGS, FIELDS).collect()[0]
        assert out.measurement == "my meas,1"

    def test_no_python_udf_in_plan(self, spark):
        df = spark.createDataFrame(
            [("h", "d", 1, 1.0, True, "x", 1)],
            "host string, dc string, n long, temp double, ok boolean, "
            "note string, ts_ns long",
        )
        plan = parse_line_protocol(
            to_line_protocol(df, "m", TAGS, FIELDS), TAGS, FIELDS
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestFieldTypeConflicts:
    """InfluxDB 1.x rejects a write whose value syntax conflicts with
    the field's declared type (HTTP 400 'field type conflict') — it
    must never surface as an executor-side cast exception."""

    @pytest.fixture()
    def sink(self, spark, tmp_path):
        from syncflux_spark.sources.line_protocol import LineProtocolSink

        return LineProtocolSink(
            spark, str(tmp_path),
            {"m": (["h"], {"n": "integer", "s": "string",
                           "f": "float", "b": "boolean"})},
        )

    @pytest.mark.parametrize(
        "line",
        [
            "m,h=a n=1.5 1700000000000000000",      # float into integer
            "m,h=a n=5 1700000000000000000",        # missing i suffix
            'm,h=a s=12 1700000000000000000',       # number into string
            "m,h=a f=12i 1700000000000000000",      # integer into float
            "m,h=a b=maybe 1700000000000000000",    # junk into boolean
        ],
    )
    def test_conflicts_rejected_as_value_error(self, sink, line):
        with pytest.raises(ValueError, match="field type conflict"):
            sink.write(line)

    def test_valid_types_still_land(self, sink, spark):
        n = sink.write(
            'm,h=a n=5i,s="ok",f=1.5,b=true 1700000000000000000'
        )
        assert n == 1
        row = sink.read_measurement("m").collect()[0]
        assert (row.n, row.s, row.f, row.b) == (5, "ok", 1.5, True)

    def test_http_write_maps_conflict_to_400(self, spark, tmp_path):
        import urllib.error
        import urllib.request

        from syncflux_spark.sources.line_protocol import LineProtocolSink
        from syncflux_spark.streaming.monitor import HAMonitor
        from syncflux_spark.webui.api import StatusServer

        sink = LineProtocolSink(
            spark, str(tmp_path), {"m": (["h"], {"n": "integer"})}
        )
        mon = HAMonitor(master_probe=lambda: True, slave_probe=lambda: True)
        mon.check_once()
        srv = StatusServer(mon, port=0, write_sink=sink)
        port = srv.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/write",
                data=b"m,h=a n=1.5 1700000000000000000",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
            assert "conflict" in ei.value.read().decode()
        finally:
            srv.stop()
