"""WARC source (sources/warc.py): the Content-Length record walk (incl. the
payload-contains-CRLFCRLF case that breaks delimiter splitting), quarantine
contract for malformed blobs, multi-record blobs, and the file source."""

from __future__ import annotations

from pyspark.sql import functions as F

from timing_explorer_spark.sources.warc import (
    encode_warc_record,
    parse_warc_blob,
    read_warc,
    synthetic_warc_blobs,
    warc_records,
)


def test_roundtrip_single_record():
    payload = b"hello warc world"
    blob = encode_warc_record(payload, "http://x/1", "<urn:uuid:1>")
    recs = parse_warc_blob(blob)
    assert len(recs) == 1
    r = recs[0]
    assert r["valid"] is True
    assert r["payload"] == payload
    assert r["target_uri"] == "http://x/1"
    assert r["record_id"] == "<urn:uuid:1>"
    assert r["content_length"] == len(payload)
    assert r["warc_type"] == "response"


def test_payload_containing_header_terminator():
    """THE case that forces Content-Length walking: the payload embeds
    b'\\r\\n\\r\\n' AND a fake record header — a delimiter splitter would
    shear the record here."""
    payload = b"part one\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nfake part two"
    blob = (
        encode_warc_record(payload, "http://x/tricky", "<urn:uuid:2>")
        + encode_warc_record(b"after", "http://x/after", "<urn:uuid:3>")
    )
    recs = parse_warc_blob(blob)
    assert [r["valid"] for r in recs] == [True, True]
    assert recs[0]["payload"] == payload
    assert recs[1]["payload"] == b"after"
    assert recs[1]["target_uri"] == "http://x/after"


def test_truncated_blob_quarantines_tail():
    good = encode_warc_record(b"ok", "http://x/ok", "<urn:uuid:4>")
    bad = encode_warc_record(b"x" * 100, "http://x/cut", "<urn:uuid:5>")[:-60]
    recs = parse_warc_blob(good + bad)
    assert recs[0]["valid"] is True and recs[0]["payload"] == b"ok"
    assert recs[1]["valid"] is False
    assert recs[1]["leftover_bytes"] == len(bad)


def test_garbage_and_missing_length_quarantine():
    assert parse_warc_blob(b"not a warc at all\r\n\r\n")[0]["valid"] is False
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    assert parse_warc_blob(no_len)[0]["valid"] is False
    assert parse_warc_blob(b"") == []


def test_spark_roundtrip_matches_documents(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} body text with some words") for i in range(100)],
        "doc_id long, text string",
    )
    recs = warc_records(synthetic_warc_blobs(docs, n_blobs=7))
    got = (
        recs.where("valid")
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
            F.decode("payload", "UTF-8").alias("text"),
            "rec_idx",
            "blob_id",
        )
        .collect()
    )
    assert len(got) == 100
    by_id = {r["doc_id"]: r for r in got}
    for i in range(100):
        assert by_id[i]["text"] == f"document number {i} body text with some words"
        assert by_id[i]["blob_id"] == i % 7
    # records inside each blob walk in doc order
    for r in got:
        assert r["rec_idx"] == r["doc_id"] // 7


def test_read_warc_files(spark, tmp_path):
    p = tmp_path / "seg-00000.warc"
    p.write_bytes(
        encode_warc_record(b"alpha", "http://x/a", "<urn:uuid:10>")
        + encode_warc_record(b"beta", "http://x/b", "<urn:uuid:11>")
    )
    rows = read_warc(spark, str(tmp_path)).orderBy("rec_idx").collect()
    assert [bytes(r["payload"]) for r in rows] == [b"alpha", b"beta"]
    assert all(r["valid"] for r in rows)


def test_read_warc_stream(spark, tmp_path):
    """Streaming ingest: files landing in the directory become record rows;
    quarantine rows flow on the same stream."""
    indir, outdir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    import os

    os.makedirs(indir)
    (tmp_path / "in" / "a.warc").write_bytes(
        encode_warc_record(b"first", "http://x/1", "<urn:uuid:20>")
    )
    (tmp_path / "in" / "b.warc").write_bytes(
        encode_warc_record(b"second", "http://x/2", "<urn:uuid:21>")
        + b"GARBAGE TRAILING BYTES"
    )
    from timing_explorer_spark.sources.warc import read_warc_stream

    q = (
        read_warc_stream(spark, indir)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(outdir).collect()
    valid = {r["target_uri"]: bytes(r["payload"]) for r in rows if r["valid"]}
    assert valid == {"http://x/1": b"first", "http://x/2": b"second"}
    quarantined = [r for r in rows if not r["valid"]]
    assert len(quarantined) == 1 and quarantined[0]["leftover_bytes"] == len(
        b"GARBAGE TRAILING BYTES"
    )


def test_gz_member_chain_roundtrip():
    """Common Crawl layout: one gzip member per record, members
    concatenated. The decompressed stream must parse identically to the
    plain concatenation — including the CRLFCRLF-in-payload trap."""
    from timing_explorer_spark.sources.warc import gzip_warc_record

    tricky = b"part one\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nfake"
    r1 = encode_warc_record(tricky, "http://x/t", "<urn:uuid:30>")
    r2 = encode_warc_record(b"after gz", "http://x/a", "<urn:uuid:31>")
    plain = parse_warc_blob(r1 + r2)
    gz = parse_warc_blob(gzip_warc_record(r1) + gzip_warc_record(r2))
    assert gz == plain
    assert gz[0]["payload"] == tricky and gz[1]["payload"] == b"after gz"
    # determinism of the member encoder (mtime-free gzip header)
    assert gzip_warc_record(r1) == gzip_warc_record(r1)
    # a member holding MULTIPLE records (non-Common-Crawl alignment) still
    # parses: decompression and the record walk are independent layers
    assert parse_warc_blob(gzip_warc_record(r1 + r2)) == plain


def test_gz_truncated_member_quarantines_compressed_tail():
    from timing_explorer_spark.sources.warc import gzip_warc_record

    good = gzip_warc_record(
        encode_warc_record(b"ok", "http://x/ok", "<urn:uuid:32>")
    )
    cut = gzip_warc_record(
        encode_warc_record(b"y" * 200, "http://x/cut", "<urn:uuid:33>")
    )[:-20]
    recs = parse_warc_blob(good + cut)
    assert recs[0]["valid"] is True and recs[0]["payload"] == b"ok"
    assert recs[1]["valid"] is False
    assert recs[1]["leftover_bytes"] == len(cut)
    # corrupt (non-gzip) bytes after valid members quarantine the same way
    recs2 = parse_warc_blob(good + b"NOT GZIP DATA")
    assert recs2[0]["valid"] is True
    assert recs2[1]["valid"] is False
    assert recs2[1]["leftover_bytes"] == len(b"NOT GZIP DATA")


def test_read_warc_mixed_plain_and_gz_dir(spark, tmp_path):
    """One directory holding both layouts: compression detected per blob
    by magic, non-WARC files ignored by the glob."""
    from timing_explorer_spark.sources.warc import gzip_warc_record

    (tmp_path / "a.warc").write_bytes(
        encode_warc_record(b"plain rec", "http://x/p", "<urn:uuid:40>")
    )
    (tmp_path / "b.warc.gz").write_bytes(
        gzip_warc_record(
            encode_warc_record(b"gz rec one", "http://x/g1", "<urn:uuid:41>")
        )
        + gzip_warc_record(
            encode_warc_record(b"gz rec two", "http://x/g2", "<urn:uuid:42>")
        )
    )
    (tmp_path / "ignore.txt").write_bytes(b"not warc")
    rows = read_warc(spark, str(tmp_path)).collect()
    got = {r["target_uri"]: bytes(r["payload"]) for r in rows if r["valid"]}
    assert got == {
        "http://x/p": b"plain rec",
        "http://x/g1": b"gz rec one",
        "http://x/g2": b"gz rec two",
    }
    assert all(r["valid"] for r in rows)


def test_read_warc_stream_gz(spark, tmp_path):
    """Streaming ingest of .warc.gz files — same record schema, same
    quarantine contract as plain."""
    from timing_explorer_spark.sources.warc import gzip_warc_record, read_warc_stream

    indir, outdir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    import os

    os.makedirs(indir)
    (tmp_path / "in" / "a.warc.gz").write_bytes(
        gzip_warc_record(
            encode_warc_record(b"stream gz", "http://x/s", "<urn:uuid:50>")
        )
    )
    q = (
        read_warc_stream(spark, indir)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(outdir).collect()
    assert len(rows) == 1 and rows[0]["valid"]
    assert bytes(rows[0]["payload"]) == b"stream gz"


def test_gz_fuzz_parity_with_plain():
    """Property: for ANY record set, gz-member-per-record parses to the
    same records as the plain concatenation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from timing_explorer_spark.sources.warc import gzip_warc_record

    @settings(max_examples=30, deadline=None)
    @given(
        payloads=st.lists(st.binary(min_size=0, max_size=150), min_size=1, max_size=5)
    )
    def prop(payloads):
        recs = [
            encode_warc_record(p, f"http://x/{i}", f"<urn:uuid:{i}>")
            for i, p in enumerate(payloads)
        ]
        assert parse_warc_blob(b"".join(gzip_warc_record(r) for r in recs)) == (
            parse_warc_blob(b"".join(recs))
        )

    prop()


def test_fuzz_roundtrip_random_blobs():
    """Property: ANY payload bytes (including CRLF runs, fake WARC headers,
    empty) concatenated as N records parse back exactly — ids, URIs,
    lengths, and payload bytes all survive; appending garbage quarantines
    exactly the garbage tail."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=6
    )
    garbage = st.one_of(
        st.just(b""),
        st.binary(min_size=1, max_size=40).filter(
            lambda b: not b.startswith(b"\r\nWARC/") and not b.startswith(b"WARC/")
        ),
    )

    @settings(max_examples=50, deadline=None)
    @given(payloads=payloads, tail=garbage)
    def prop(payloads, tail):
        blob = b"".join(
            encode_warc_record(p, f"http://x/{i}", f"<urn:uuid:{i}>")
            for i, p in enumerate(payloads)
        )
        recs = parse_warc_blob(blob + tail)
        valid = [r for r in recs if r["valid"]]
        assert len(valid) == len(payloads)
        for i, (r, p) in enumerate(zip(valid, payloads)):
            assert r["payload"] == p
            assert r["target_uri"] == f"http://x/{i}"
            assert r["content_length"] == len(p)
        bad = [r for r in recs if not r["valid"]]
        # inter-record padding (\r\n pairs) is legitimately skipped, so a
        # garbage tail of only CRLFs parses as padding, not quarantine
        if tail and tail.strip(b"\r\n"):
            assert len(bad) == 1
        else:
            assert bad == []

    prop()


def test_gz_whole_file_single_member():
    # some writers gzip the WHOLE file as one member (not per-record
    # chains): a 1-member chain whose decompressed stream holds many
    # records — the same walk must yield them all
    import gzip

    from timing_explorer_spark.sources.warc import encode_warc_record, parse_warc_blob

    recs = [
        encode_warc_record(f"payload {i}".encode(), f"http://ex.com/{i}", f"<urn:uuid:{i}>")
        for i in range(5)
    ]
    blob = gzip.compress(b"".join(recs))
    rows = parse_warc_blob(blob)
    good = [r for r in rows if r["valid"]]
    assert len(good) == 5
    assert [r["payload"] for r in good] == [f"payload {i}".encode() for i in range(5)]
