"""InfluxDB line-protocol SOURCE — the read-side complement of
streaming/influx.py's sink (sinks/InfluxDBSink.java writes this format; a
replay/ingest path must parse it back). Everything is JVM dataflow: regex
section splitting with escape-aware lookbehinds + HOF transforms into maps —
no Python in the scan, so parsing is a map-only full-codegen pass at any
scale, batch or readStream.text.

Grammar handled (the numeric-point subset the ecosystem's writers emit):

    <measurement>[,<tag>=<v>...] <field>=<num>[,<field>=<num>...] [<ts>]

- Escapes ``\\,`` ``\\ `` ``\\=`` in measurement names, tag keys and tag
  values are honored (split on lookbehind-guarded delimiters, then
  unescaped).
- Field values: floats, integers (trailing ``i``), booleans (t/T/true/TRUE →
  1.0, f/F/false/FALSE → 0.0) — all surfaced as double. Quoted STRING field
  values are out of scope (rejected as malformed) — the sink never emits
  them and mixing types per field column is not a relational shape.
- Timestamps at a fixed precision (default ms, matching the sink); lines
  without a timestamp get a null ``ts``.
- Malformed lines surface as ``valid = false`` with everything else null —
  the quarantine contract (same policy as multimodal decode's
  ``on_error='skip'``): at 100 TB you count and route bad lines, you don't
  throw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# split points NOT preceded by a backslash
_SP = r"(?<!\\) "
_COMMA = r"(?<!\\),"
_EQ = r"(?<!\\)="

_NUM = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?i?$"
_BOOL = r"^(t|T|true|True|TRUE|f|F|false|False|FALSE)$"


def _unescape(c: Column) -> Column:
    out = F.replace(c, F.lit("\\,"), F.lit(","))
    out = F.replace(out, F.lit("\\ "), F.lit(" "))
    return F.replace(out, F.lit("\\="), F.lit("="))


def from_line_protocol(
    lines: DataFrame, line_col: str = "value", precision: str = "ms"
) -> DataFrame:
    """Parse a column of line-protocol strings. Output columns:
    (measurement string, tags map<string,string>, fields map<string,double>,
    ts timestamp, valid boolean). Input column is preserved as ``line``."""
    factor = {"ns": 1_000_000, "us": 1_000, "ms": 1, "s": 0.001}
    if precision not in factor:
        raise ValueError(f"from_line_protocol: bad precision {precision!r}")

    line = F.col(line_col)
    sections = F.split(line, _SP)
    head = F.element_at(sections, 1)
    head_parts = F.split(head, _COMMA)

    measurement = _unescape(F.element_at(head_parts, 1))
    tag_parts = F.slice(head_parts, 2, F.greatest(F.size(head_parts) - 1, F.lit(0)))
    tags = F.map_from_entries(
        F.transform(
            tag_parts,
            lambda kv: F.struct(
                _unescape(F.element_at(F.split(kv, _EQ), 1)).alias("key"),
                _unescape(F.element_at(F.split(kv, _EQ), 2)).alias("value"),
            ),
        )
    )

    field_section = F.element_at(sections, 2)
    field_parts = F.split(field_section, _COMMA)
    fields = F.map_from_entries(
        F.transform(
            field_parts,
            lambda kv: F.struct(
                _unescape(F.element_at(F.split(kv, _EQ), 1)).alias("key"),
                _field_value(F.element_at(F.split(kv, _EQ), 2)).alias("value"),
            ),
        )
    )

    # try_cast: null (never a throw) on malformed input, independent of the
    # session's spark.sql.ansi.enabled
    ts_str = F.when(F.size(sections) >= 3, F.element_at(sections, 3))
    if precision == "s":
        ts_ms = (ts_str.try_cast("decimal(25,0)") * 1000).try_cast("long")
    else:
        ts_ms = F.floor(
            ts_str.try_cast("decimal(25,0)") / F.lit(factor[precision])
        ).try_cast("long")
    ts = F.timestamp_millis(ts_ms)

    # validity: 2-3 sections, a non-empty measurement, every tag pair has
    # exactly key=value, every field value parses as number/bool, ts (if
    # present) is all digits
    tags_ok = F.forall(
        tag_parts, lambda kv: F.size(F.split(kv, _EQ)) == 2
    ) & F.forall(
        tag_parts,
        lambda kv: (F.length(F.element_at(F.split(kv, _EQ), 1)) > 0)
        & (F.length(F.element_at(F.split(kv, _EQ), 2)) > 0),
    )
    fields_ok = (F.size(field_parts) >= 1) & F.forall(
        field_parts,
        lambda kv: (F.size(F.split(kv, _EQ)) == 2)
        # non-empty key, mirroring tags_ok — 'm =5 123' must quarantine, not
        # parse with an empty-string field key
        & (F.length(F.element_at(F.split(kv, _EQ), 1)) > 0)
        & (
            F.element_at(F.split(kv, _EQ), 2).rlike(_NUM)
            | F.element_at(F.split(kv, _EQ), 2).rlike(_BOOL)
        ),
    )
    ts_ok = F.when(F.size(sections) >= 3, F.element_at(sections, 3).rlike(r"^-?[0-9]+$")).otherwise(
        F.lit(True)
    )
    valid = (
        (F.size(sections) >= 2)
        & (F.size(sections) <= 3)
        & (F.length(measurement) > 0)
        & tags_ok
        & fields_ok
        & ts_ok
    )
    out = lines.select(
        line.alias("line"),
        F.when(valid, measurement).alias("measurement"),
        F.when(valid, tags).alias("tags"),
        F.when(valid, fields).alias("fields"),
        F.when(valid & (F.size(sections) >= 3), ts).alias("ts"),
        valid.alias("valid"),
    )
    return out


def _field_value(v: Column) -> Column:
    """Numeric/integer-suffixed/boolean field value → double (null if bad)."""
    return (
        F.when(v.rlike(_NUM), F.regexp_replace(v, "i$", "").try_cast("double"))
        .when(v.rlike(r"^(t|T|true|True|TRUE)$"), F.lit(1.0))
        .when(v.rlike(r"^(f|F|false|False|FALSE)$"), F.lit(0.0))
    )


def read_line_protocol(
    spark, path: str, precision: str = "ms", streaming: bool = False
) -> DataFrame:
    """Read line-protocol text files (e.g. the sink's own output) as parsed
    points. ``streaming=True`` returns a readStream for ingest topologies."""
    src = spark.readStream if streaming else spark.read
    return from_line_protocol(src.text(path), "value", precision=precision)


def line_protocol_ingest(
    spark,
    in_dir: str,
    points_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    precision: str = "ms",
    max_files_per_trigger: int | None = 1,
):
    """End-to-end ingest topology: readStream.text over line-protocol files →
    parse → fan out VALID points (flattened: measurement, tags, fields, ts)
    to ``points_dir`` and malformed raw lines to ``quarantine_dir`` — the
    count-and-route policy at scale, in ONE foreachBatch so a micro-batch's
    two writes land together and replays stay idempotent (batch-id paths,
    overwrite). Returns the started StreamingQuery (AvailableNow trigger)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    parsed = from_line_protocol(reader.load(in_dir), "value", precision=precision)

    def fn(batch_df, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            (
                batch_df.where("valid")
                .select("measurement", "tags", "fields", "ts")
                .write.mode("overwrite")
                .parquet(f"{points_dir}/batch_id={batch_id}")
            )
            bad = batch_df.where(~F.col("valid")).select("line")
            if bad.limit(1).count():
                bad.write.mode("overwrite").text(
                    f"{quarantine_dir}/batch_id={batch_id}"
                )
        finally:
            batch_df.unpersist()

    return (
        parsed.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
