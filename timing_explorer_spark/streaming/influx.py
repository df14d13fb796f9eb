"""InfluxDB sink parity: line-protocol formatting + measurement-table sinks.

The reference sink (sinks/InfluxDBSink.java:31-77) writes one point per
event: measurement name from the ctor, tag ``key`` (only for keyed points,
:67-69), field ``value`` (:35,70-72), millisecond timestamps (:64), into db
``sineWave``. We reproduce the byte format as a column expression, so the
line building runs JVM-side at full scan speed; delivery is a foreachBatch
text sink (files an InfluxDB importer/telegraf can replay) or the optional
HTTP poster below.

Line protocol (ms precision):  <measurement>[,key=<key>] value=<v> <ts_ms>

Exactly-once: the reference sink is at-least-once (client batching, no 2PC —
SURVEY §4.2). Here each micro-batch writes to a batch-id-named file, so
replays overwrite the same file: idempotent, effectively exactly-once — the
upgrade the survey prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_tag(c: Column) -> Column:
    # Line-protocol tag values escape commas, spaces and equals.
    out = F.replace(c, F.lit(","), F.lit("\\,"))
    out = F.replace(out, F.lit(" "), F.lit("\\ "))
    return F.replace(out, F.lit("="), F.lit("\\="))


def to_line_protocol(
    measurement: str,
    ts: Column | str = "ts",
    value: Column | str = "value",
    key: Column | str | None = "key",
) -> Column:
    """One line-protocol string per row, ms timestamps (InfluxDBSink.java:64's
    TimeUnit.MILLISECONDS). ``key=None`` for unkeyed points (the sink only
    tags keyed ones, :67-69)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    value = F.col(value) if isinstance(value, str) else value
    head = F.lit(measurement)
    if key is not None:
        key = F.col(key) if isinstance(key, str) else key
        head = F.concat(head, F.lit(",key="), _escape_tag(key))
    return F.concat(
        head,
        F.lit(" value="),
        value.cast("string"),
        F.lit(" "),
        F.unix_millis(ts).cast("string"),
    )


def line_protocol_batch_writer(out_dir: str, measurement: str):
    """foreachBatch function: format the batch as line protocol and write one
    text file per (batch, partition) under ``out_dir`` — idempotent on
    replay (same batch id → same path, overwrite)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(to_line_protocol(measurement).alias("value"))
            .write.mode("overwrite")
            .text(f"{out_dir}/batch_id={batch_id}")
        )

    return fn


def post_lines_http(lines: list[str], url: str = "http://localhost:8086", db: str = "sineWave") -> bool:
    """Real-InfluxDB delivery of pre-formatted lines (db ``sineWave``, ms
    precision — InfluxDBSink.java:34,64) over the v1 /write API. Gated:
    returns False when no server is reachable; never raises. Wire format
    verified against a live local HTTP server in tests/test_influx_sink.py."""
    import urllib.error
    import urllib.request

    try:
        req = urllib.request.Request(
            f"{url}/write?db={db}&precision=ms",
            data="\n".join(lines).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=5) as resp:  # noqa: S310
            return 200 <= resp.status < 300
    except (urllib.error.URLError, OSError):
        return False


def http_batch_writer(
    url: str,
    measurement: str,
    db: str = "sineWave",
    chunk_size: int = 5000,
):
    """foreachBatch function delivering line protocol to a live InfluxDB.

    Distribution shape: the line strings are built JVM-side
    (to_line_protocol), then each PARTITION posts its own chunked requests
    from the executor (`foreachPartition`) — the driver never materializes
    the batch, and delivery parallelism scales with the executor count, the
    same topology as the reference's per-subtask sink instances
    (InfluxDBSink.java:46-54 opens one client per parallel instance).

    Semantics: at-least-once, exactly like the reference sink (client-side
    batching, no 2PC — SURVEY §4.2): a failed/replayed micro-batch re-posts
    its points, and InfluxDB upserts on (measurement, tags, timestamp).
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        lines_df = batch_df.select(to_line_protocol(measurement).alias("line"))

        def post_partition(rows) -> None:
            buf: list[str] = []
            for row in rows:
                buf.append(row.line)
                if len(buf) >= chunk_size:
                    post_lines_http(buf, url, db)
                    buf.clear()
            if buf:
                post_lines_http(buf, url, db)

        lines_df.foreachPartition(post_partition)

    return fn
