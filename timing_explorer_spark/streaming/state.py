"""State inspection & backend configuration — ChangeBackend parity.

The reference's second job (/root/reference/src/main/java/com/ververica/jobs/
ChangeBackend.java:156-212) reads a savepoint's operator/keyed state and
rewrites it under a different state backend. In Spark both halves dissolve
(SURVEY.md §2 rows 11-15):

 - *Reading* state: source progress lives as JSON under <ckpt>/offsets (the
   analog of the source's checkpointed clock, TimestampSource.java:44-65);
   keyed window state is readable with the built-in ``statestore`` batch
   source (the analog of PseudoWindowReaderFunction, ChangeBackend.java:48-69).
 - *Switching backends* (heap -> RocksDB, ChangeBackend.java:164-208) is a
   per-query config, not a data migration: set the RocksDB provider and
   restart on the same checkpoint. No bootstrap job required.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def rocksdb_state_conf() -> dict[str, str]:
    """Session confs ≙ the reference's ``--rocksdb`` flag
    (TimingExplorer.java:55,66-72)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def read_offsets(checkpoint_dir: str) -> list[dict]:
    """Parse every offset log entry under a checkpoint — the recoverable
    'source clock' (what ChangeBackend.readListState dug out of the
    savepoint, ChangeBackend.java:175-178)."""
    out: list[dict] = []
    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    if not os.path.isdir(offsets_dir):
        return out
    for name in sorted(os.listdir(offsets_dir), key=lambda s: int(s) if s.isdigit() else -1):
        path = os.path.join(offsets_dir, name)
        if not name.isdigit():
            continue
        with open(path) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        entry: dict = {"batchId": int(name), "raw": lines}
        for ln in lines:
            if ln.startswith("{"):
                try:
                    entry.setdefault("parsed", []).append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
        out.append(entry)
    return out


def read_window_state(spark: SparkSession, checkpoint_dir: str, **options: str) -> DataFrame:
    """Batch-read a streaming query's keyed state via the built-in state
    reader (Spark 4) — full PseudoWindowReaderFunction parity."""
    reader = spark.read.format("statestore")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(checkpoint_dir)
