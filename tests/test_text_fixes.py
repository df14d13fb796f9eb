"""Encoding repair (fix_mojibake) and C4 blocklist filter tests.

Real mojibake samples (the strings a cp1252 round-trip actually produces),
idempotence of the repair fold, artifact counting, and word-grain blocklist
semantics (no substring matches).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from timing_explorer_spark.functions.text import MOJIBAKE_TABLE, fix_mojibake


def _fix_py(s: str) -> str:
    for src, dst in MOJIBAKE_TABLE:
        s = s.replace(src, dst)
    return s


def _spark_fix(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.fixed for r in df.select(fix_mojibake(F.col("text")).alias("fixed")).collect()]


def test_real_mojibake_samples(spark):
    # each sample is the literal result of encoding the clean string as
    # UTF-8 and decoding as cp1252 — verified inline, then repaired
    cleans = [
        "Café au lait",
        "don’t — ever…",
        "“quoted here: “open",
        "mañana über señor façade naïve",
        "élève crèche ángelón único",
    ]
    garbled = []
    for c in cleans:
        g = c.encode("utf-8").decode("cp1252", errors="strict")
        # strict decode succeeds for every char in these samples; the table
        # subset we repair must cover all artifacts present
        garbled.append(g)
    fixed = _spark_fix(spark, garbled)
    for c, g, f in zip(cleans, garbled, fixed):
        # the right-double-quote artifact (0x9D, unprintable) is excluded
        # from the table by design; samples avoid '”'
        assert f == c, (c, g, f)


def test_clean_ascii_untouched(spark):
    texts = ["plain ascii text", "with   spaces", ""]
    assert _spark_fix(spark, texts) == texts


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=sorted(
            set("".join(s + d for s, d in MOJIBAKE_TABLE)) | set(" abcÃâ€™")
        ),
        max_size=24,
    )
)
def test_fix_idempotent(s):
    # fold reaches a fixpoint in one pass: any source a replacement can
    # create (â€“ out of â€œ's destination) sits LATER in the table
    once = _fix_py(s)
    assert _fix_py(once) == once


def test_spark_matches_python_fold(spark):
    # adversarial adjacencies: source-creating overlaps and split artifacts
    texts = [
        "â€â€œ",  # repairing â€œ creates â€“, fixed in the same pass
        "Ã©Ã©Ã©",
        "âÃ©€",
        "CafÃ© â€“ donâ€™t",
        "ÃÃ©",  # leading stray Ã survives, é repaired
    ]
    assert _spark_fix(spark, texts) == [_fix_py(t) for t in texts]


def test_artifact_count_is_length_delta(spark):
    g = "CafÃ© â€œx donâ€™t"  # 3 artifacts: Ã©(2->1), â€œ(3->1), â€™(3->1)
    df = spark.createDataFrame([(g,)], "text string")
    row = df.select(
        (F.length("text") - F.length(fix_mojibake(F.col("text")))).alias("d")
    ).collect()[0]
    assert row.d == (2 - 1) + (3 - 1) + (3 - 1)


def test_blocklist_word_grain_and_phrases(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "slowest merger big tables"),  # substrings only: keep
        (2, "slow scan"),  # word hit
        (3, "a big table and a big table"),  # 2 phrase hits
        (4, "fast key merge"),  # 1 phrase + 1 word hit
        (5, "clean row"),  # keep
    ]
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from timing_explorer_spark.plans.registry import all_queries

    out = {
        r.doc_id: r
        for r in all_queries()["q_blocklist_filter"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert out[1].n_word_hits == 0 and out[1].n_phrase_hits == 0 and out[1].keep
    assert out[2].n_word_hits == 1 and not out[2].keep
    assert out[3].n_phrase_hits == 2 and not out[3].keep
    assert out[4].n_word_hits == 1 and out[4].n_phrase_hits == 1 and not out[4].keep
    assert out[5].keep


def test_paragraph_dedup_first_occurrence_wins(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "alpha beta"),  # + footer: keeps own text AND both footer paras
        (2, "gamma delta"),  # later doc: sheds the shared footer
        (3, "alpha beta"),  # full-document duplicate of doc 1 body
        (4, "same para | same para"),  # within-doc repeat collapses
    ]
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from timing_explorer_spark.plans.registry import all_queries

    out = {
        r.doc_id: r
        for r in all_queries()["q_paragraph_dedup"]
        .build(spark, str(tmp_path))
        .collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1: body + both footer paragraphs survive (first occurrence)
    assert out[1].n_paras == 3 and out[1].kept_paras == 3
    assert out[1].cleaned_md5 == md5(
        "alpha beta | subscribe to our newsletter today | special offer click now"
    )
    # doc 2: unique body survives, shared footer shed
    assert out[2].kept_paras == 1 and out[2].cleaned_md5 == md5("gamma delta")
    # doc 3: body duplicates doc 1's -> sheds EVERYTHING
    assert out[3].kept_paras == 0 and out[3].cleaned_md5 == md5("")
    # doc 4: within-doc repeat keeps one copy
    assert out[4].n_paras == 4 and out[4].kept_paras == 1
    assert out[4].cleaned_md5 == md5("same para")
