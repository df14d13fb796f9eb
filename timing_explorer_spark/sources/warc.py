"""WARC (Web ARChive, ISO 28500) record source.

Completes the raw-crawl front-end (round-6 verdict task #3: "HTML/WARC"):
real 100 TB pipelines start from WARC containers (Common Crawl ships them),
each file a concatenation of records:

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:uuid:...>\r\n
    WARC-Date: 2024-01-01T00:00:00Z\r\n
    WARC-Target-URI: http://...\r\n
    Content-Length: N\r\n
    \r\n
    <exactly N payload bytes>\r\n\r\n

Parsing MUST walk Content-Length — payloads may contain the header
terminator bytes "\r\n\r\n", so delimiter splitting silently corrupts
records (pinned in tests). The walk is sequential per blob, so it runs as
an Arrow-batched mapInPandas over the payload bytes — the multimodal
family's decode-where-bytes-live shape (multimodal/binary_ops.py). At
100 TB parallelism comes from the FILES (Common Crawl segments are ~1 GB:
one task per file via ``spark.read.format("binaryFile")``), and everything
downstream of the record table is ordinary JVM dataflow (the HTML
front-end: operators/html_extract.py).

Malformed input follows the line-protocol quarantine contract
(sources/line_protocol.py): a blob that stops parsing cleanly emits one
``valid=false`` row carrying the unconsumed byte count — never a throw.

Gzipped WARC (``.warc.gz``) is what Common Crawl actually ships: each
record is an INDIVIDUAL gzip member and the members are concatenated, so
a range request can decompress one record without its neighbors
(the "record-at-time compression" recommendation of ISO 28500 annex D).
``parse_warc_blob`` detects the gzip magic and walks the member chain with
``zlib.decompressobj(wbits=31)`` / ``unused_data`` — stdlib only — then
runs the identical Content-Length record walk over the decompressed
stream, so plain and gzipped files share one parser and one quarantine
contract (a truncated/corrupt member quarantines its compressed tail).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "blob_id long, rec_idx int, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_length long, "
    "payload binary, valid boolean, leftover_bytes long"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(blob: bytes) -> tuple[bytes, bytes]:
    """Decompress a chain of concatenated gzip members (the .warc.gz
    layout: one member per record). Returns (decompressed bytes of all
    COMPLETE members, leftover compressed bytes) — a truncated or corrupt
    member contributes nothing to the decompressed stream; its compressed
    bytes (and everything after) come back as leftover for quarantine."""
    good = bytearray()
    rest = blob
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest)
        except zlib.error:
            break
        if not d.eof:
            # member truncated mid-stream: discard the torn partial output
            break
        good += chunk
        rest = d.unused_data
    return bytes(good), rest


def parse_warc_blob(blob: bytes) -> list[dict]:
    """Walk one WARC blob into records (pure function — unit-testable and
    the single implementation both the column parser and the file source
    use). Returns dicts matching RECORD_SCHEMA minus blob_id. Gzipped
    blobs (Common Crawl .warc.gz member chains) are detected by magic and
    decompressed member-by-member first; the record walk itself is
    identical, and compressed garbage/truncation quarantines its byte
    count like any other unparseable tail."""
    if blob[:2] == _GZIP_MAGIC:
        text, comp_left = _gunzip_members(blob)
        out = parse_warc_blob(text)
        if comp_left and not comp_left.strip(b"\r\n"):
            # CRLF-only bytes after the member chain are padding, same as
            # the plain walk's inter-record rule — not quarantinable
            # garbage (a real truncated member always starts \x1f\x8b).
            # Pre-r12 this path quarantined e.g. a single trailing \r
            # (found by the roundtrip fuzz); the plain path already
            # skipped it.
            comp_left = b""
        if comp_left:
            if out and not out[-1]["valid"]:
                # decompressed tail already quarantined: fold the
                # compressed remainder into the same row
                out[-1]["leftover_bytes"] += len(comp_left)
            else:
                out.append(
                    {
                        "rec_idx": (out[-1]["rec_idx"] + 1) if out else 0,
                        "warc_type": None,
                        "record_id": None,
                        "warc_date": None,
                        "target_uri": None,
                        "content_length": None,
                        "payload": None,
                        "valid": False,
                        "leftover_bytes": len(comp_left),
                    }
                )
        return out
    out: list[dict] = []
    pos, n = 0, len(blob)
    idx = 0
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(b"\r\n\r\n", pos)
        version_ok = blob.startswith(b"WARC/", pos)
        headers: dict[str, str] = {}
        length = None
        if head_end != -1 and version_ok:
            for line in blob[pos:head_end].split(b"\r\n")[1:]:
                k, sep, v = line.partition(b":")
                if sep:
                    headers[k.strip().decode("ascii", "replace").lower()] = (
                        v.strip().decode("utf-8", "replace")
                    )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                length = None
        if (
            head_end == -1
            or not version_ok
            or length is None
            or head_end + 4 + length > n
        ):
            if not blob[pos:].strip(b"\r\n"):
                # tail is CRLF bytes only — padding (the pair-skip above
                # consumes \r\n pairs; an odd lone \r or \n is still
                # padding, not quarantinable garbage — pre-r12 this
                # produced a spurious quarantine row, found by the
                # roundtrip fuzz)
                break
            # cannot parse further: ONE quarantine row for the tail
            out.append(
                {
                    "rec_idx": idx,
                    "warc_type": None,
                    "record_id": None,
                    "warc_date": None,
                    "target_uri": None,
                    "content_length": None,
                    "payload": None,
                    "valid": False,
                    "leftover_bytes": n - pos,
                }
            )
            break
        body_start = head_end + 4
        out.append(
            {
                "rec_idx": idx,
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "warc_date": headers.get("warc-date"),
                "target_uri": headers.get("warc-target-uri"),
                "content_length": length,
                "payload": blob[body_start : body_start + length],
                "valid": True,
                "leftover_bytes": 0,
            }
        )
        idx += 1
        pos = body_start + length
    return out


def warc_records(
    blobs: DataFrame,
    id_col: str = "blob_id",
    payload_col: str = "payload",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(blob_id, payload binary) -> one row per WARC record (RECORD_SCHEMA).
    Arrow-batched mapInPandas; the Content-Length walk happens where the
    bytes live, one blob at a time. ``carry`` names extra blob columns to
    replicate onto every record row (e.g. the file's modificationTime as the
    ingest event time for a streaming pipeline) — their types come from the
    input schema."""

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            rows: list[dict] = []
            for i in range(len(b)):
                blob_id = b[id_col].iloc[i]
                extras = {c: b[c].iloc[i] for c in carry}
                for rec in parse_warc_blob(bytes(b[payload_col].iloc[i])):
                    rows.append({"blob_id": blob_id, **rec, **extras})
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id", "rec_idx", "warc_type", "record_id", "warc_date",
                    "target_uri", "content_length", "payload", "valid",
                    "leftover_bytes", *carry,
                ],
            )

    carry_ddl = "".join(
        f", {c} {blobs.schema[c].dataType.simpleString()}" for c in carry
    )
    return blobs.select(
        blobs[id_col].alias(id_col),
        blobs[payload_col].alias(payload_col),
        *[blobs[c] for c in carry],
    ).mapInPandas(parse, schema=RECORD_SCHEMA + carry_ddl)


_WARC_GLOB = "*.{warc,warc.gz}"


def read_warc(spark, path: str) -> DataFrame:
    """Read *.warc and *.warc.gz files under ``path`` as records (mixed
    directories are fine — compression is detected per blob by magic, so
    one reader covers both the plain and the Common Crawl gzipped layout).
    One task per file (binaryFile source) — the Common Crawl deployment
    shape; blob_id is a hash of the file path."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", _WARC_GLOB)
        .load(path)
        .select(F.xxhash64("path").alias("blob_id"), F.col("content").alias("payload"))
    )
    return warc_records(files)


def read_warc_stream(
    spark,
    path: str,
    with_ingest_ts: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: new *.warc / *.warc.gz files landing under
    ``path`` become
    record rows continuously (binaryFile file-stream source with its fixed
    schema declared — the streaming side requires it). Same record schema
    and quarantine contract as the batch reader; pair with
    streaming/lsh_dedup.py for dedup-at-ingest straight off the crawler.
    ``with_ingest_ts=True`` carries the file's modificationTime onto every
    record as ``ingest_ts`` — the event-time column downstream watermarked
    stages need. ``max_files_per_trigger`` throttles micro-batch width; it
    is a SOURCE option (setting it on the sink is silently ignored — found
    the hard way), and Trigger.AvailableNow honors it, so replay tests get
    real multi-batch arrival order instead of one giant batch."""
    from pyspark.sql import functions as F

    reader = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", _WARC_GLOB)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = (
        reader.load(path)
        .select(
            F.xxhash64("path").alias("blob_id"),
            F.col("content").alias("payload"),
            F.col("modificationTime").alias("ingest_ts"),
        )
    )
    return warc_records(files, carry=("ingest_ts",) if with_ingest_ts else ())


def encode_warc_record(
    payload: bytes,
    target_uri: str,
    record_id: str,
    warc_date: str = "2024-01-01T00:00:00Z",
    warc_type: str = "response",
) -> bytes:
    """One spec-conforming WARC record (the fixture encoder; also the sink
    side of the round-trip oracle — parse(encode(x)) == x is the tested
    contract, like the line-protocol pair)."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + b"\r\n\r\n"


def gzip_warc_record(record: bytes) -> bytes:
    """One gzip MEMBER per record — the Common Crawl .warc.gz layout
    (record-at-time compression, ISO 28500 annex D). wbits=31 writes a
    plain gzip header with zero mtime, so output is deterministic. Level 1:
    these members exist to exercise the decompressor, not to save bytes —
    the fixed level keeps output deterministic, and level 9 spent ~5x the
    CPU of level 1 on every synthesis pass for ratio nothing reads (r12,
    guide §4: shrink the per-row Python work that must stay Python)."""
    co = zlib.compressobj(1, zlib.DEFLATED, 31)
    return co.compress(record) + co.flush()


def synthetic_warc_blobs(
    docs: DataFrame, n_blobs: int = 37, gz: bool = False
) -> DataFrame:
    """Deterministic multi-record WARC blobs from ``documents``: doc d's
    record (payload = its text bytes, uri = http://example.com/doc/<id>)
    lands in blob ``doc_id % n_blobs``, concatenated in doc_id order —
    every blob exercises the sequential record walk. ``gz=True`` wraps
    each record in its own gzip member before concatenation (the Common
    Crawl .warc.gz layout), exercising the member-chain decompressor."""
    from collections.abc import Iterator as _It

    def enc(batches: _It) -> _It:
        import pandas as pd

        for b in batches:
            rows = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                i = int(doc_id)
                rec = encode_warc_record(
                    str(text).encode("utf-8"),
                    target_uri=f"http://example.com/doc/{i}",
                    record_id=f"<urn:uuid:{i:032d}>",
                )
                rows.append(
                    {
                        "blob_id": i % n_blobs,
                        "doc_id": i,
                        "rec": gzip_warc_record(rec) if gz else rec,
                    }
                )
            yield pd.DataFrame(rows, columns=["blob_id", "doc_id", "rec"])

    recs = docs.select("doc_id", "text").mapInPandas(
        enc, schema="blob_id long, doc_id long, rec binary"
    )

    def concat(pdf):
        import pandas as pdl

        pdf = pdf.sort_values("doc_id")
        return pdl.DataFrame(
            {
                "blob_id": [pdf["blob_id"].iloc[0]],
                "payload": [b"".join(bytes(x) for x in pdf["rec"])],
            }
        )

    # applyInPandas guarantees each blob arrives WHOLE (mapInPandas could
    # split a group across Arrow batches and emit partial blobs)
    return recs.groupBy("blob_id").applyInPandas(
        concat, schema="blob_id long, payload binary"
    )
