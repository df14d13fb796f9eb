"""Streaming MinHash-LSH near-duplicate suppression on the ingest path.

Round-6 verdict task #6: the batch near-dup family (operators/dedup.py::
minhash_lsh_pairs) assumes the corpus is at rest; an LLM ingest pipeline
wants to suppress near-duplicates AS DOCUMENTS LAND, with state that does
not grow with stream length. This operator is the streaming counterpart:

  1. Per-document MinHash signature computed ROW-LOCALLY (one nested HOF
     expression — sequence x transform x array_min — so no aggregation is
     needed before the stateful step; a streaming query stays in append
     mode). Same hash family as the batch path: slot i = min over shingles
     of xxhash64(shingle, seed + i).
  2. LSH banding: band j's key = xxhash64 of signature slots [j*r, (j+1)*r)
     — one row per (doc, band) via posexplode.
  3. ``dropDuplicatesWithinWatermark`` on (band_idx, band_hash): a band
     bucket's fingerprint is held only within the watermark horizon, so
     state is bounded by ingest rate x horizon (the exact-dedup contract of
     pipeline.py::dedup_stream, pinned in tests/test_streaming_dedup.py).
  4. A document is NEAR-DUPLICATE iff ANY of its bands collided with an
     earlier document -> it survives iff ALL ``bands`` band-rows survive
     step 3. That count is a watermarked event-time aggregation, so verdicts
     emit when the watermark seals them (append mode).

Semantics vs batch: this is FIRST-ARRIVAL-WINS over the LSH CANDIDATE
relation (what a dedup-at-ingest must do — it cannot re-rank history).
Two precision levels (round-7 verdict task #3):

``verify=None`` (default, all-JVM): candidates are NOT re-verified — a
band collision from a merely-similar document strips that band. Within
one micro-batch ``dropDuplicatesWithinWatermark`` keeps an ARBITRARY
survivor per band key, so two near/exact duplicates landing in the SAME
batch can mutually strip each other's bands (both emit is_unique=false,
or neither emits a verdict). Consumers of this mode must therefore route
is_unique=false rows to the batch precision layer
(operators/dedup.py::minhash_lsh_pairs exact-verify) rather than drop
them — pinned by tests/test_streaming_lsh_dedup.py::
test_same_batch_duplicates_default_mode.

``verify=<threshold>``: a transformWithStateInPandas layer keyed by
(band_idx, band_hash) holds the full MinHash signatures of recent
bucket occupants (within the watermark horizon) and a colliding band is
stripped ONLY when estimated Jaccard (matching-slot fraction) against
some occupant reaches the threshold. This both removes the
false-positive data loss AND makes same-batch behavior deterministic:
rows are processed in (ts, doc) order, so the earliest document always
wins every contested band. Measured FP/recall at several (bands, rows)
operating points: scripts/lsh_operating_points.py -> BENCH_lsh_fp.json.
Requires the RocksDB state store (streaming/state.py::rocksdb_state_conf)
like every TWS operator here.

At 100 TB/day: everything before the stateful step is map-only; the
stateful operators hold (rate x horizon) band keys — plus, in verify
mode, one num_perm x 8-byte signature per surviving occupant per band
(bands x num_perm x 8 ≈ 8 KB/doc at the defaults) — and doc counters;
state stays rate x horizon bounded in both modes (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

_SEED = 42  # matches operators/dedup.py::minhash_signatures


def row_local_signature(text: Column, num_perm: int = 64, n: int = 3) -> Column:
    """array<bigint>[num_perm] MinHash signature as ONE row-local expression
    (no aggregation): slot i = min over the doc's distinct word n-gram
    shingles of xxhash64(shingle, seed+i). Interpreted-HOF cost is
    O(num_perm x |shingles|) per row — fine on an ingest path, where the
    per-row budget is set by arrival rate, not corpus size. Null when the
    doc has no shingles (< n tokens)."""
    from ..functions.text import let, word_shingles

    def build(sh: Column) -> Column:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.array_min(
                F.transform(sh, lambda s: F.xxhash64(s, i + F.lit(_SEED)))
            ),
        )
        return F.when(F.size(sh) > 0, sig)

    # let-bind the shingle set: without it each of the num_perm outer slots
    # re-evaluates the whole shingle expression (split + n-gram build) —
    # measured 6.5 -> 815 docs/s/core at the defaults (r7)
    return let(word_shingles(text, n), build)


def band_keys_from_sig(sig: Column, num_perm: int, bands: int) -> Column:
    """array<bigint>[bands] of LSH band hashes from an existing signature
    column — band j = xxhash64(slice of r = num_perm/bands slots, j)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(F.slice(sig, j * r + 1, r), j),
    )


def band_keys(
    text: Column, num_perm: int = 64, bands: int = 16, n: int = 3
) -> Column:
    """array<bigint>[bands]: LSH band hashes of the row-local signature —
    band j = xxhash64(slice of r = num_perm/bands slots, j). Shared by the
    streaming operator and its batch replay-parity test."""
    return band_keys_from_sig(row_local_signature(text, num_perm, n), num_perm, bands)


def _duration_ms(s: str) -> int:
    """'10 minutes' / '2 seconds' / '500 milliseconds' -> ms (the subset of
    Spark's interval grammar the streaming operators here use)."""
    n, unit = s.strip().split()
    unit = unit.rstrip("s")
    factor = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000}[unit]
    return int(float(n) * factor)


class _BandVerifyProcessor(StatefulProcessor):
    """transformWithStateInPandas processor keyed by (band_idx, band_hash):
    the precision layer of verify-mode streaming dedup. State per band key =
    ListState of (doc, ts_ms, signature) for occupants within the watermark
    horizon; an incoming row is stripped only when its estimated Jaccard
    (matching-slot fraction of the full MinHash signature — the standard
    unbiased estimator) against some occupant reaches ``threshold``.
    Rows are processed in (ts, doc) order -> deterministic first-arrival-
    wins even within one micro-batch (the default mode's same-batch hazard).
    Eviction: one event-time timer per batch at the earliest occupant
    expiry; expired occupants are dropped when it fires, so idle keys shrink
    to nothing — rate x horizon bounded state."""

    def __init__(self, threshold: float, horizon_ms: int) -> None:
        self.threshold = threshold
        self.horizon_ms = horizon_ms

    def init(self, handle) -> None:
        self.handle = handle
        self.entries = handle.getListState(
            "entries", "doc long, ts_ms long, sig array<bigint>"
        )

    def _live_entries(self, wm_ms: int) -> list[tuple]:
        return [
            (int(e[0]), int(e[1]), list(e[2]) if e[2] is not None else None)
            for e in self.entries.get()
            if int(e[1]) + self.horizon_ms >= wm_ms
        ]

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ev_ts", "doc"])
        wm = timerValues.getCurrentWatermarkInMs()
        stored = self._live_entries(wm)
        sigs = [
            np.asarray(s, dtype=np.int64) if s is not None else None
            for _, _, s in stored
        ]
        out_doc: list[int] = []
        out_ts: list = []
        for i in range(len(pdf)):
            doc = int(pdf["doc"].iloc[i])
            ts = pdf["ev_ts"].iloc[i]
            raw_sig = pdf["sig"].iloc[i]
            sig = (
                np.asarray(raw_sig, dtype=np.int64)
                if raw_sig is not None and len(raw_sig) > 0
                else None
            )
            dup = any(
                s2 is not None
                and sig is not None
                and len(s2) == len(sig)
                and float((sig == s2).mean()) >= self.threshold
                for s2 in sigs
            )
            if not dup:
                out_doc.append(doc)
                out_ts.append(ts)
                ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
                stored.append((doc, ts_ms, sig.tolist() if sig is not None else None))
                sigs.append(sig)
        self.entries.clear()
        if stored:
            self.entries.put(stored)
            self.handle.registerTimer(min(t for _, t, _ in stored) + self.horizon_ms)
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc": out_doc,
                    "ev_ts": out_ts,
                    "band_idx": [int(key[0])] * len(out_doc),
                    "band_hash": [int(key[1])] * len(out_doc),
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        live = self._live_entries(expiredTimerInfo.getExpiryTimeInMs())
        self.entries.clear()
        if live:
            self.entries.put(live)
            self.handle.registerTimer(min(t for _, t, _ in live) + self.horizon_ms)
        return iter(())

    def close(self) -> None:
        pass


def minhash_dedup_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    seal_window: str = "1 second",
    verify: float | None = None,
) -> DataFrame:
    """Near-dup verdict stream: one row per document (id, window, n_bands,
    is_unique) where ``is_unique`` means NO LSH band collided with any
    earlier document inside the watermark horizon. Documents without
    shingles (< n tokens) pass through as unique=true with n_bands=0 (they
    cannot be near-duplicates under shingle Jaccard — same convention as
    batch minhash_signatures).

    ``verify``: None (default) = raw band collisions strip bands (all-JVM
    fast path; see module docstring for the same-batch caveat and the
    required routing of is_unique=false rows). A float in (0, 1] = the
    estimated-Jaccard verification threshold: a collision only strips a
    band when the full-signature matching-slot fraction against a stored
    occupant reaches it (TWS precision layer; deterministic first-wins).

    Emission: verdicts seal when the watermark passes the doc's
    ``seal_window`` bucket (the count of surviving band-rows is an
    event-time aggregation). A document ALL of whose bands collide (e.g. an
    exact duplicate) loses every band-row to the dedup and emits NO verdict
    row at all — consumers keep docs with is_unique (absence = hard
    duplicate)."""
    wm = docs.withWatermark(ts_col, watermark)
    sig = row_local_signature(F.col(text_col), num_perm, n)
    with_sig = wm.select(
        F.col(id_col).alias("doc"),
        F.col(ts_col).alias("ev_ts"),
        sig.alias("sig"),
    )
    banded = with_sig.select(
        "doc",
        "ev_ts",
        "sig",
        F.posexplode_outer(band_keys_from_sig(F.col("sig"), num_perm, bands)).alias(
            "band_idx", "band_hash"
        ),
    )
    # shingle-less docs (null band array) must NOT collide with each other on
    # a shared (null, null) key: give each a doc-unique sentinel band
    banded = banded.select(
        "doc",
        "ev_ts",
        "sig",
        F.coalesce("band_idx", F.lit(-1)).alias("band_idx"),
        F.coalesce("band_hash", F.xxhash64(F.col("doc"), F.lit(-1))).alias("band_hash"),
    )
    if verify is None:
        fresh = banded.drop("sig").dropDuplicatesWithinWatermark(
            ["band_idx", "band_hash"]
        )
    else:
        from ..compat import ensure_protobuf

        ensure_protobuf()
        fresh = banded.groupBy("band_idx", "band_hash").transformWithStateInPandas(
            _BandVerifyProcessor(float(verify), _duration_ms(watermark)),
            outputStructType="doc long, ev_ts timestamp, band_idx int, band_hash long",
            outputMode="append",
            timeMode="eventTime",
            eventTimeColumnName="ev_ts",
        )
    return (
        fresh.groupBy(F.window("ev_ts", seal_window).alias("w"), F.col("doc"))
        .agg(F.sum(F.when(F.col("band_idx") >= 0, 1).otherwise(0)).alias("n_bands"))
        .select(
            "doc",
            F.col("w.start").alias("window_start"),
            "n_bands",
            ((F.col("n_bands") == bands) | (F.col("n_bands") == 0)).alias("is_unique"),
        )
    )
