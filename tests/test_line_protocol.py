"""Line-protocol source (sources/line_protocol.py) — parser semantics:
escape-aware tag splitting, field typing (float / int-suffix / bool),
timestamp precisions, the malformed-line quarantine contract, and the
exact round trip against the sink encoder (streaming/influx.py).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from timing_explorer_spark.sources.line_protocol import (
    from_line_protocol,
    read_line_protocol,
)
from timing_explorer_spark.streaming.influx import to_line_protocol


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    return from_line_protocol(df, **kw).collect()


def test_full_grammar_line(spark):
    (r,) = _parse(
        spark,
        ["cpu,host=web\\ 01,dc=us\\,east usage=0.64,cores=8i,up=true 1704067200000"],
    )
    assert r["valid"]
    assert r["measurement"] == "cpu"
    assert r["tags"] == {"host": "web 01", "dc": "us,east"}
    assert r["fields"] == {"usage": 0.64, "cores": 8.0, "up": 1.0}
    assert r["ts"] == datetime.datetime(2024, 1, 1, 0, 0)


def test_no_tags_no_timestamp(spark):
    (r,) = _parse(spark, ["mem free=1.5e3"])
    assert r["valid"] and r["measurement"] == "mem"
    assert r["tags"] == {}
    assert r["fields"] == {"free": 1500.0}
    assert r["ts"] is None


def test_precisions(spark):
    ns = _parse(spark, ["m v=1 1704067200000000000"], precision="ns")[0]
    s = _parse(spark, ["m v=1 1704067200"], precision="s")[0]
    ms = _parse(spark, ["m v=1 1704067200000"], precision="ms")[0]
    want = datetime.datetime(2024, 1, 1, 0, 0)
    assert ns["ts"] == s["ts"] == ms["ts"] == want


def test_malformed_lines_quarantined(spark):
    rows = _parse(
        spark,
        [
            "",                      # empty
            "justmeasurement",       # no fields section
            "m v=abc",               # non-numeric field
            'm s="str" 1',           # string field: out of scope
            "m v=1 notatimestamp",   # bad ts
            "m,k= v=1",              # empty tag value
            "m =5 123",              # empty FIELD key (ADVICE r5)
            "m v=2 5 extra",         # 4 sections
        ],
    )
    assert all(not r["valid"] for r in rows)
    assert all(
        r["measurement"] is None and r["fields"] is None and r["ts"] is None
        for r in rows
    )
    # the raw line is preserved for quarantine routing
    assert rows[2]["line"] == "m v=abc"


def test_roundtrip_with_sink_encoder(spark):
    src = spark.createDataFrame(
        [
            ("sensor 1", "2024-01-01 00:00:00.123", 3.25),
            ("a,b=c", "2024-01-01 00:00:01.000", -0.5),
        ],
        ["key", "ts", "value"],
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "value")
    lines = src.select(to_line_protocol("sineWave").alias("value"))
    out = {r["tags"]["key"]: r for r in from_line_protocol(lines).collect()}
    assert set(out) == {"sensor 1", "a,b=c"}
    r = out["sensor 1"]
    assert r["valid"] and r["measurement"] == "sineWave"
    assert r["fields"] == {"value": 3.25}
    assert r["ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)
    assert out["a,b=c"]["fields"] == {"value": -0.5}


def test_read_text_files_batch_and_stream_schema(spark, tmp_path):
    p = str(tmp_path / "lines")
    spark.createDataFrame(
        [("m,k=a v=1.0 1000",), ("bad line here",)], "value string"
    ).coalesce(1).write.text(p)
    got = read_line_protocol(spark, p).collect()
    assert sorted(r["valid"] for r in got) == [False, True]
    stream_df = read_line_protocol(spark, p, streaming=True)
    assert stream_df.isStreaming
    assert [f.name for f in stream_df.schema.fields] == [
        "line", "measurement", "tags", "fields", "ts", "valid",
    ]


def test_fuzz_roundtrip_generated_lines(spark):
    """Property: any point built from the grammar's alphabet — tags with
    spaces/commas/equals needing escapes, float/int/bool fields, optional
    ms timestamp — encodes (reference encoder below, independent of the
    JVM one) and parses back exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=8
    )
    tagval = st.text(
        alphabet="abc XY,=z-", min_size=1, max_size=10
    ).filter(lambda s: not s.startswith(" ") and not s.endswith("\\"))
    fieldval = st.one_of(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.integers(min_value=-10**12, max_value=10**12),
        st.booleans(),
    )

    def esc(s: str) -> str:
        return s.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")

    @settings(max_examples=25, deadline=None)
    @given(
        measurement=name,
        tags=st.dictionaries(name, tagval, max_size=3),
        fields=st.dictionaries(name, fieldval, min_size=1, max_size=3),
        ts=st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
    )
    def prop(measurement, tags, fields, ts):
        parts = [
            esc(measurement)
            + "".join(f",{esc(k)}={esc(v)}" for k, v in sorted(tags.items()))
        ]
        fstrs, want_fields = [], {}
        for k, v in sorted(fields.items()):
            if isinstance(v, bool):
                fstrs.append(f"{k}={'true' if v else 'false'}")
                want_fields[k] = 1.0 if v else 0.0
            elif isinstance(v, int):
                fstrs.append(f"{k}={v}i")
                want_fields[k] = float(v)
            else:
                fstrs.append(f"{k}={v!r}")
                want_fields[k] = float(v)
        parts.append(",".join(fstrs))
        if ts is not None:
            parts.append(str(ts))
        (r,) = _parse(spark, [" ".join(parts)])
        assert r["valid"], r["line"]
        assert r["measurement"] == measurement
        assert r["tags"] == tags
        assert r["fields"] == want_fields
        if ts is None:
            assert r["ts"] is None
        else:
            # exact integer ms — float timestamp()*1000 truncates one ulp
            # short on some millisecond values (hypothesis found 528766379)
            got = r["ts"].replace(tzinfo=datetime.timezone.utc)
            got_ms = int(got.timestamp()) * 1000 + got.microsecond // 1000
            assert got_ms == ts

    prop()


def test_ingest_topology_fanout(spark, tmp_path):
    import time as _t

    indir = str(tmp_path / "in")
    good1 = ["cpu,host=a usage=0.5 1704067200000", "cpu,host=b usage=0.7 1704067201000"]
    bad1 = ["totally broken", "cpu usage=NaNish 5"]
    spark.createDataFrame([(s,) for s in good1 + bad1], "value string").coalesce(
        1
    ).write.mode("append").text(indir)
    _t.sleep(1.1)
    good2 = ["mem free=12i 1704067202000"]
    spark.createDataFrame([(s,) for s in good2], "value string").coalesce(1).write.mode(
        "append"
    ).text(indir)

    from timing_explorer_spark.sources.line_protocol import line_protocol_ingest

    q = line_protocol_ingest(
        spark,
        indir,
        str(tmp_path / "points"),
        str(tmp_path / "quarantine"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    points = spark.read.parquet(str(tmp_path / "points")).collect()
    assert len(points) == 3  # conservation: every valid line landed
    by_m = {}
    for r in points:
        by_m.setdefault(r["measurement"], []).append(r)
    assert len(by_m["cpu"]) == 2 and len(by_m["mem"]) == 1
    assert by_m["mem"][0]["fields"] == {"free": 12.0}

    bad = {r["value"] for r in spark.read.text(str(tmp_path / "quarantine")).collect()}
    assert bad == set(bad1)  # raw lines preserved for replay after a fix
