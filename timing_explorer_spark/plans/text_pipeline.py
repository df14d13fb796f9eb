"""Text-analysis query inventory over the ``documents`` table (SURVEY §7 P4).

Language-ID heuristic, quality scoring, token counting, fingerprinting, word
frequencies — each a JVM-side column-expression pipeline with a DuckDB oracle
implementing the identical formula. Note DuckDB regexp_replace needs the 'g'
flag to match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    fingerprint,
    lang_scores,
    mean_token_length,
    stopword_ratio,
    token_count,
    tokens,
)
from ..sources.tables import load
from .registry import register


@register(
    "q_token_stats",
    oracle="""
        SELECT doc_id,
               LEN(string_split(text, ' '))  AS n_tokens,
               LENGTH(text)                  AS n_chars_measured,
               CAST(LENGTH(text) - (LEN(string_split(text, ' ')) - 1) AS DOUBLE)
                   / LEN(string_split(text, ' ')) AS mean_token_len
        FROM documents
    """,
    doc="Token counting (whitespace tokenizer) + derived mean token length.",
    tags=("text",),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        mean_token_length(F.col("text")).alias("mean_token_len"),
    )


@register(
    "q_text_quality",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   LENGTH(text) AS n_chars
            FROM documents
        )
        SELECT doc_id,
               CAST(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
                   / LEN(toks)                                   AS stopword_ratio,
               LEN(toks)                                         AS n_tokens,
               CAST(LEN(toks) BETWEEN 20 AND 400 AS INT)         AS length_ok,
               CAST(n_chars AS DOUBLE) / LEN(toks)               AS chars_per_token
        FROM t
    """,
    doc=(
        "Quality-scoring signals: stopword ratio (en lexicon), length gate, "
        "chars/token. Heuristics from LLM-corpus filtering practice (C4-style)."
    ),
    tags=("text", "quality"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_toks = token_count(F.col("text"))
    return d.select(
        "doc_id",
        stopword_ratio(F.col("text"), STOPWORDS["en"]).alias("stopword_ratio"),
        n_toks.alias("n_tokens"),
        n_toks.between(20, 400).cast("int").alias("length_ok"),
        (F.length("text").cast("double") / n_toks).alias("chars_per_token"),
    )


@register(
    "q_lang_profile",
    oracle="""
        SELECT lang,
               COUNT(*)                 AS n_docs,
               AVG(CAST(n_chars AS DOUBLE)) AS avg_chars,
               AVG(CAST(LEN(string_split(text, ' ')) AS DOUBLE)) AS avg_tokens,
               MIN(n_chars)             AS min_chars,
               MAX(n_chars)             AS max_chars
        FROM documents
        GROUP BY lang
    """,
    doc="Corpus profile per declared language.",
    tags=("text", "agg"),
)
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.avg(token_count(F.col("text")).cast("double")).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q_doc_fingerprint",
    oracle="""
        SELECT doc_id,
               MD5(LOWER(regexp_replace(TRIM(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
    doc="Content fingerprint: md5 over whitespace-normalized lowercased text.",
    tags=("text", "dedup"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "q_word_frequencies",
    oracle="""
        SELECT word, COUNT(*) AS freq
        FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT 50
    """,
    doc="Corpus word frequencies: explode + count + deterministic top-k.",
    tags=("text", "agg", "topk"),
)
def q_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(50)
    )


@register(
    "q_lang_id_heuristic",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang,
                   string_split(text, ' ') AS toks
            FROM documents
        ), scored AS (
            SELECT doc_id, lang,
                   LEN(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS score_en,
                   LEN(list_filter(toks, x -> x IN ('der','die','das','und','ein'))) AS score_de,
                   LEN(list_filter(toks, x -> x IN ('le','la','les','et','un'))) AS score_fr,
                   LEN(list_filter(toks, x -> x IN ('el','la','los','y','un'))) AS score_es
            FROM s
        )
        SELECT doc_id, lang AS declared_lang, score_en, score_de, score_fr, score_es,
               CASE
                   WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                   WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                   WHEN score_fr >= score_es THEN 'fr'
                   ELSE 'es'
               END AS predicted_lang
        FROM scored
    """,
    doc=(
        "Heuristic language ID: stopword-lexicon hit counts, argmax with a "
        "fixed tie-break order. (The synthetic corpus shares one vocabulary, "
        "so prediction accuracy vs the lang column is not meaningful — the "
        "scoring machinery is what's exercised.)"
    ),
    tags=("text", "langid"),
)
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", F.col("lang").alias("declared_lang"), *lang_scores(F.col("text")))
    s = {lang: F.col(f"score_{lang}") for lang in ("en", "de", "fr", "es")}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return scored.select("*", predicted.alias("predicted_lang"))


@register(
    "q_doc_chunks",
    oracle="""
        SELECT doc_id,
               CAST(i AS BIGINT)                 AS chunk_idx,
               SUBSTR(text, i * 192 + 1, 256)    AS chunk,
               LENGTH(SUBSTR(text, i * 192 + 1, 256)) AS chunk_len
        FROM documents,
             UNNEST(range(CAST(
                 greatest(ceil((LENGTH(text) - 64) / 192.0), 1) AS BIGINT))) AS t(i)
    """,
    doc=(
        "Document chunking for context-window splitting: 256-char chunks "
        "with 64-char overlap (stride 192), computed distributively as "
        "sequence+explode+substring — one narrow pass, no UDF, rows scale "
        "with total text volume / stride. The standard pre-tokenization "
        "shard step of an LLM data pipeline."
    ),
    tags=("text", "chunking", "llm-pipeline"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    size, overlap = 256, 64
    stride = size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length("text") - overlap) / F.lit(float(stride))), F.lit(1)
    ).cast("long")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.col("text"), (F.col("chunk_idx") * stride + 1).cast("int"), size
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


@register(
    "q_deterministic_sample",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        WHERE CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
              % 100 < 10
    """,
    doc=(
        "Deterministic content-hash sampling (10%): keep rows whose "
        "md5(doc_id) prefix mod 100 < 10. Reproducible across engines, "
        "cluster sizes and runs — the correct way to sample training data "
        "(rand()-based sampling changes membership on every retry/replay). "
        "Oracle-checkable because md5 is md5 everywhere."
    ),
    tags=("sampling", "llm-pipeline"),
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return d.where(bucket < 10).select("doc_id", "lang", "source")


@register(
    "q_source_mixture",
    oracle="""
        WITH rates AS (
            SELECT * FROM (VALUES ('src0', 100), ('src1', 50), ('src2', 25),
                                  ('src3', 10)) AS r(src, pct)
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r ON d.source = r.src
        WHERE CAST(('0x' || SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
              % 100 < r.pct
    """,
    doc=(
        "Training-mixture sampling: per-source keep rates (down-weight web, "
        "keep books/wiki, subsample code) applied with the same deterministic "
        "hash — the data-mixing step of corpus assembly, as a broadcast join "
        "against a rate table + one filter pass."
    ),
    tags=("sampling", "mixture", "llm-pipeline"),
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rates = d.sparkSession.createDataFrame(
        [("src0", 100), ("src1", 50), ("src2", 25), ("src3", 10)], "src string, pct int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return (
        d.join(F.broadcast(rates), d.source == rates.src)
        .where(bucket < F.col("pct"))
        .select("doc_id", "source")
    )


@register(
    "q_word_logfreq_score",
    oracle="""
        WITH tok AS (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        freq AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w)
        SELECT t.doc_id,
               CAST(SUM(CAST(LN(f.n) AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*)
                   AS mean_log_freq,
               COUNT(*) AS n_tokens
        FROM tok t JOIN freq f ON t.w = f.w
        GROUP BY t.doc_id
    """,
    doc=(
        "Corpus-statistics quality score (CCNet-style LM-lite proxy): mean "
        "log global word frequency per document — rare-word-heavy docs score "
        "low. Two distributive passes: global token counts, then a token-"
        "keyed join back (both shuffles on the token — the frequency table "
        "stays distributed; no driver-side vocab). Decimal-exact mean keeps "
        "the float reproducible."
    ),
    tags=("text", "quality", "llm-pipeline"),
)
def q_word_logfreq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(freq, "w")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.log(F.col("n")).cast("decimal(27,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_log_freq"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


@register(
    "q_pii_scrub",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b', '<PHONE>', 'g')
                   AS scrubbed,
               (LENGTH(text) <> LENGTH(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b', '<PHONE>', 'g')))
                   AS had_pii
        FROM documents
    """,
    doc=(
        "PII scrubbing pass (emails, phone-shaped numbers -> placeholder "
        "tokens) + a had-PII flag — the redaction step of a training-data "
        "pipeline, as pure JVM regexp_replace (DuckDB needs the 'g' flag to "
        "match Spark's replace-all default)."
    ),
    tags=("text", "pii", "llm-pipeline"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.length("text") != F.length(scrubbed)).alias("had_pii"),
    )


@register(
    "q_corpus_prep_pipeline",
    oracle="""
        WITH sampled AS (
            SELECT doc_id, text FROM documents
            WHERE CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                  % 100 < 60
        ),
        scrubbed AS (
            SELECT doc_id,
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS text
            FROM sampled
        ),
        quality AS (
            SELECT * FROM scrubbed
            WHERE LENGTH(text) >= 80
              AND LEN(string_split(text, ' ')) >= 12
        ),
        deduped AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                          ORDER BY doc_id) AS rn
                FROM quality)
            WHERE rn = 1
        )
        SELECT doc_id,
               CAST(i AS BIGINT)              AS chunk_idx,
               SUBSTR(text, i * 192 + 1, 256) AS chunk
        FROM deduped,
             UNNEST(range(CAST(
                 greatest(ceil((LENGTH(text) - 64) / 192.0), 1) AS BIGINT))) AS t(i)
    """,
    doc=(
        "End-to-end corpus preparation as ONE composed plan — the LLM "
        "training-data flow: deterministic 60% hash sample -> PII scrub -> "
        "quality gate (length + token floor) -> exact dedup keeping the "
        "lowest doc_id per content hash -> 256/64 chunking. Narrow ops fuse "
        "into the scan stage; the only shuffle is the dedup window on the "
        "content hash. At 100 TB each stage stays partition-parallel and "
        "the whole flow is replayable bit-for-bit (hash sample + exact "
        "dedup, no rand())."
    ),
    tags=("text", "llm-pipeline", "composed", "flagship"),
)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    from pyspark.sql import Window as W

    scrubbed = (
        d.where(bucket < 60)
        .select("doc_id", F.regexp_replace(F.col("text"), email, "<EMAIL>").alias("text"))
        .where(
            (F.length("text") >= 80)
            & (F.size(F.split(F.col("text"), " ")) >= 12)
        )
    )
    w = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = (
        scrubbed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    size, overlap = 256, 64
    stride = size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length("text") - overlap) / F.lit(float(stride))), F.lit(1)
    ).cast("long")
    return (
        deduped.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.col("text"), (F.col("chunk_idx") * stride + 1).cast("int"), size
            ).alias("chunk"),
        )
    )


@register(
    "q_fuzzy_name_match",
    oracle="""
        SELECT p_partkey, p_name,
               levenshtein(p_name, 'large widget') AS edit_dist
        FROM part
        WHERE levenshtein(p_name, 'large widget') <= 4
    """,
    doc=(
        "Fuzzy string matching (edit distance): parts whose name is within "
        "Levenshtein distance 4 of a probe string — the scalar building "
        "block of fuzzy dedup/entity matching. Row-local JVM expression "
        "(no join); at scale, pair generation would go through the blocking "
        "strategies the dedup family already implements (shingle inverted "
        "index / LSH), with edit distance as the verifier."
    ),
    tags=("text", "fuzzy", "scalar"),
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("large widget"))
    return (
        p.select("p_partkey", "p_name", dist.alias("edit_dist"))
        .where(F.col("edit_dist") <= 4)
    )


@register(
    "q_sequence_packing",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   md5(CAST(doc_id AS VARCHAR))   AS shuffle_key,
                   LEN(string_split(text, ' '))   AS n_tokens
            FROM documents
        ), o AS (
            SELECT *,
                   SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS cum_before
            FROM t
        )
        SELECT CAST(cum_before // 512 AS BIGINT)        AS seq_id,
               COUNT(*)                                 AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT)            AS total_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / 512.0    AS fill_ratio
        FROM o
        GROUP BY cum_before // 512
    """,
    doc=(
        "Training-sequence packing: documents are put in a deterministic "
        "pseudo-random training order (md5 of doc_id — reproducible across "
        "engines and replays, unlike rand()), then greedily packed into "
        "contiguous sequences of a 512-token budget: a doc belongs to the "
        "sequence where its running-token offset falls (spillover docs "
        "continue into the next sequence, the pack-then-split convention). "
        "The running offset is the DISTRIBUTED two-phase prefix scan "
        "(operators/prefix.py::running_total) — a global ORDER BY window "
        "would be one task holding the corpus at 100 TB."
    ),
    tags=("text", "training-prep", "prefix-scan"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import running_total

    budget = 512
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    # bucket_expr (r13): the md5 key is fixed-length lowercase hex, so its
    # first 15 digits read as a base-16 number are a monotone numeric image
    # — enables the single-exchange bucketed scan (operators/prefix.py)
    running = running_total(
        d, ["shuffle_key", "doc_id"], "n_tokens", alias="cum",
        bucket_expr=F.conv(F.substring("shuffle_key", 1, 15), 16, 10).cast("bigint"),
    )
    return (
        running.withColumn("cum_before", F.col("cum") - F.col("n_tokens"))
        .groupBy(F.expr(f"cum_before DIV {budget}").alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.lit(float(budget))).alias("fill_ratio"),
        )
    )


@register(
    "q_vocab_heavy_hitters",
    oracle="""
        WITH w AS (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
        tot AS (SELECT COUNT(*) AS n FROM w)
        SELECT word, COUNT(*) AS freq
        FROM w
        GROUP BY word
        HAVING COUNT(*) >= (SELECT CEIL(0.005 * n) FROM tot)
    """,
    doc=(
        "Exact corpus-vocabulary heavy hitters (freq >= 0.5% of all tokens) "
        "via per-partition Misra-Gries candidate generation + exact recount "
        "of candidates only (operators/heavy_hitters.py). The Zipf tail — "
        "the overwhelming bulk of a 100 TB vocabulary — is filtered map-side "
        "against the broadcast candidate set and never shuffles; output is "
        "exact, so a plain GROUP BY/HAVING is the oracle."
    ),
    tags=("text", "heavy-hitters", "sketch", "llm-pipeline"),
)
def q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import heavy_hitters

    d = load(spark, sf_dir, "documents")
    # Spread the COMPACT doc rows across cores, then tokenize/explode inside
    # each partition: the MG pass parallelizes without ever shuffling the
    # exploded token stream (repartitioning post-explode would move the
    # whole corpus — the exact cost this operator exists to avoid). Width
    # is data-proportional below the core cap (operators/width.py, r12):
    # each MG partition costs a Python worker + k counters, so idle width
    # on a small corpus is pure overhead.
    from ..operators.width import adaptive_width

    words = d.repartition(adaptive_width(d)).select(
        F.explode(tokens(F.col("text"))).alias("word")
    )
    return heavy_hitters(words, phi=0.005, key_col="word")


@register(
    "q_bigram_surprisal",
    oracle="""
        WITH words AS (
            SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        ),
        flat AS (
            SELECT doc_id, s.w1 AS w1, s.bg AS bg
            FROM (SELECT doc_id,
                         UNNEST(list_transform(range(greatest(len(w) - 1, 0)),
                                i -> {'w1': w[i+1], 'bg': w[i+1] || ' ' || w[i+2]})) AS s
                  FROM words)
        ),
        pc AS (SELECT w1, COUNT(*) AS n1 FROM flat GROUP BY w1),
        bc AS (SELECT bg, COUNT(*) AS n2 FROM flat GROUP BY bg)
        SELECT f.doc_id,
               CAST(SUM(CAST(LN(pc.n1) AS DECIMAL(27,8))
                      - CAST(LN(bc.n2) AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*)
                   AS mean_surprisal,
               COUNT(*) AS n_bigrams
        FROM flat f JOIN pc ON f.w1 = pc.w1 JOIN bc ON f.bg = bc.bg
        GROUP BY f.doc_id
    """,
    doc=(
        "Bigram LM surprisal (KenLM-lite fluency proxy): per doc, mean "
        "-ln P(w2|w1) under corpus bigram MLE counts — repetitive/templated "
        "text scores near 0, incoherent token soup scores high. The count "
        "tables stay DISTRIBUTED (token-keyed shuffle joins; at 100 TB a "
        "bigram vocabulary cannot broadcast); per-term decimal-rounded logs "
        "make the mean reproducible (same trick as q_word_logfreq_score)."
    ),
    tags=("text", "lm", "quality", "llm-pipeline"),
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split(F.lower("text"), " ").alias("w")).where(F.size("w") >= 2)
    flat = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w)-2),"
                " i -> named_struct('w1', w[i], 'bg', concat(w[i], ' ', w[i+1])))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.w1").alias("w1"), F.col("s.bg").alias("bg"))
    pc = flat.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    bc = flat.groupBy("bg").agg(F.count(F.lit(1)).alias("n2"))
    return (
        flat.join(pc, "w1")
        .join(bc, "bg")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.log(F.col("n1")).cast("decimal(27,8)")
                    - F.log(F.col("n2")).cast("decimal(27,8)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_surprisal"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@register(
    "q_cms_word_freq",
    oracle=None,  # xxhash64-bucketed sketch — no DuckDB analog; bounds in pytest
    doc=(
        "Count-min sketch frequency estimates for the corpus's heavy-hitter "
        "words: the 4x2048-cell bounded-memory summary answers point "
        "frequencies with est >= true and bounded overestimate "
        "(tests/test_sketches.py pins both plus cell-wise mergeability). "
        "Composes with q_vocab_heavy_hitters: MG finds WHICH words are "
        "heavy, CMS serves approximate counts for ANY probe without "
        "rescanning. Rows-only driver check."
    ),
    tags=("text", "sketch", "cms", "approx", "llm-pipeline"),
)
def q_cms_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import heavy_hitters
    from ..operators.sketches import cms_build, cms_estimate

    d = load(spark, sf_dir, "documents")
    from ..operators.width import adaptive_width

    words = d.repartition(adaptive_width(d)).select(
        F.explode(tokens(F.col("text"))).alias("word")
    )
    sketch = cms_build(words, "word")
    probes = heavy_hitters(words, phi=0.005, key_col="word").select("word")
    return cms_estimate(sketch, probes, "word")


@register(
    "q_bpe_top_pairs",
    oracle="""
        WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        pairs AS (
            SELECT UNNEST(list_transform(range(greatest(len(w) - 1, 0)),
                          i -> {'a': w[i+1], 'b': w[i+2]})) AS p
            FROM toks
        )
        SELECT p.a AS a, p.b AS b, COUNT(*) AS cnt
        FROM pairs
        GROUP BY p.a, p.b
        ORDER BY cnt DESC, a, b
        LIMIT 20
    """,
    doc=(
        "The BPE-training inner query: adjacent-token-pair counts with the "
        "deterministic (cnt DESC, a, b) ranking whose head is the next "
        "merge. One explode + one groupBy — the word-count shuffle shape, "
        "map-side combinable at any corpus size (operators/bpe.py)."
    ),
    tags=("text", "bpe", "tokenizer", "llm-pipeline"),
)
def q_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import adjacent_pair_counts

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), r"\s+").alias("toks"))
    return adjacent_pair_counts(toks).orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(20)


@register(
    "q_bpe_merge_table",
    oracle=None,  # iterative merge loop — no closed-form SQL; determinism in pytest
    doc=(
        "Distributed BPE-style vocabulary training (Sennrich 2016), 6 merge "
        "rounds: per round, count adjacent pairs (one shuffle), take the "
        "deterministic argmax, fuse every occurrence with a linear HOF pass "
        "(no shuffle), repeat on the merged corpus. Output is the ranked "
        "merge table a tokenizer ships. Rows-only driver check; pytest pins "
        "exact scan semantics, corpus compression, and bit-identical merges "
        "under repartitioning."
    ),
    tags=("text", "bpe", "tokenizer", "iterative", "llm-pipeline"),
)
def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    merges, _ = bpe_train(load(spark, sf_dir, "documents"), n_merges=6)
    return spark.createDataFrame(merges, ["rank", "a", "b", "cnt"])


@register(
    "q_bigram_pmi",
    oracle="""
        WITH words AS (
            SELECT string_split(lower(text), ' ') AS w FROM documents
        ),
        flat AS (
            SELECT s.w1 AS w1, s.w2 AS w2
            FROM (SELECT UNNEST(list_transform(range(greatest(len(w) - 1, 0)),
                                i -> {'w1': w[i+1], 'w2': w[i+2]})) AS s
                  FROM words)
        ),
        bc AS (SELECT w1, w2, COUNT(*) AS n12 FROM flat GROUP BY w1, w2),
        uc1 AS (SELECT w1, COUNT(*) AS n1 FROM flat GROUP BY w1),
        uc2 AS (SELECT w2, COUNT(*) AS n2 FROM flat GROUP BY w2),
        tot AS (SELECT COUNT(*) AS n FROM flat),
        top AS (
            SELECT bc.w1, bc.w2, bc.n12, uc1.n1, uc2.n2
            FROM bc JOIN uc1 ON bc.w1 = uc1.w1 JOIN uc2 ON bc.w2 = uc2.w2
            ORDER BY bc.n12 DESC, bc.w1, bc.w2 LIMIT 50
        )
        SELECT w1, w2, n12, n1, n2,
               CAST(CAST(LN(n12) AS DECIMAL(27,8)) + CAST(LN((SELECT n FROM tot)) AS DECIMAL(27,8))
                    - CAST(LN(n1) AS DECIMAL(27,8)) - CAST(LN(n2) AS DECIMAL(27,8))
                    AS DOUBLE) AS pmi
        FROM top
    """,
    doc=(
        "Collocation detection via pointwise mutual information: for the 50 "
        "most frequent adjacent word pairs, PMI = ln(N·c(ab)/(c(a)·c(b))) — "
        "high-PMI pairs are multi-word expressions a tokenizer or phrase "
        "miner should treat as units (Church & Hanks 1990). Count tables "
        "stay distributed (token-keyed shuffle joins, the q_bigram_surprisal "
        "shape); the four logs are decimal-rounded per term so the PMI is "
        "bit-identical across engines; the deterministic (count DESC, "
        "lexicographic) top-50 caps the output via TakeOrderedAndProject. "
        "Positional convention: c(a) counts a as LEFT member, c(b) as "
        "RIGHT — the bigram-model conditional marginals."
    ),
    tags=("text", "pmi", "collocation", "llm-pipeline"),
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select(F.split(F.lower("text"), " ").alias("w")).where(F.size("w") >= 2)
    flat = w.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w)-2),"
                " i -> named_struct('w1', w[i], 'w2', w[i+1]))"
            )
        ).alias("s")
    ).select(F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
    bc = flat.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    uc1 = flat.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    uc2 = flat.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    tot = flat.agg(F.count(F.lit(1)).alias("n"))
    top = (
        bc.join(uc1, "w1")
        .join(uc2, "w2")
        .orderBy(F.desc("n12"), "w1", "w2")
        .limit(50)
    )
    dec = "decimal(27,8)"
    return top.crossJoin(F.broadcast(tot)).select(
        "w1",
        "w2",
        "n12",
        "n1",
        "n2",
        (
            F.log("n12").cast(dec)
            + F.log("n").cast(dec)
            - F.log("n1").cast(dec)
            - F.log("n2").cast(dec)
        )
        .cast("double")
        .alias("pmi"),
    )


@register(
    "q_word_burstiness",
    oracle="""
        WITH w AS (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        st AS (
            SELECT word,
                   COUNT(*) AS cf,
                   COUNT(DISTINCT doc_id) AS df
            FROM w GROUP BY word
        )
        SELECT word, cf, df,
               CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
        FROM st
        WHERE df >= 5
        ORDER BY CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) DESC, word
        LIMIT 50
    """,
    doc=(
        "Term burstiness (Church-Gale): collection frequency over document "
        "frequency — the mean within-document repetition of each term. "
        "Function words sit near cf/df ≈ uniform; topical/template terms "
        "burst (appear many times in few docs), which is the signal "
        "TF-IDF's IDF misses and repetition-quality filters key on. One "
        "(word, doc) shuffle for the two counts (COUNT DISTINCT doc_id "
        "planned as the standard two-level expand), deterministic "
        "(ratio DESC, word) top-50 via TakeOrderedAndProject; the ratio "
        "of exact integers is one mirrored double division."
    ),
    tags=("text", "burstiness", "ir", "llm-pipeline"),
)
def q_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
    st = w.groupBy("word").agg(
        F.count(F.lit(1)).alias("cf"),
        F.count_distinct("doc_id").alias("df"),
    )
    ratio = F.col("cf").cast("double") / F.col("df").cast("double")
    return (
        st.where(F.col("df") >= 5)
        .select("word", "cf", "df", ratio.alias("burstiness"))
        .orderBy(F.desc("burstiness"), "word")
        .limit(50)
    )


@register(
    "q_unigram_lm_vocab",
    oracle=None,  # iterative EM — no closed-form SQL; math + determinism in pytest
    doc=(
        "SentencePiece-style unigram-LM tokenizer training (Kudo 2018, "
        "Viterbi hard-EM variant): seed candidate substrings by weighted "
        "frequency, alternate Viterbi segmentation / probability "
        "re-estimation / pruning toward the target vocab. Every stage runs "
        "on the bounded distinct-word HISTOGRAM, never raw documents — the "
        "only Python is an Arrow-batched per-word DP over that grain with "
        "the O(V) piece table in the closure, so training cost at 100 TB is "
        "one word-count shuffle plus dictionary-sized work. Output is the "
        "ranked (piece, logprob) model artifact. Rows-only driver check; "
        "pytest pins objective monotonicity, round-trip segmentation, and "
        "bit-identical vocabularies under repartitioning."
    ),
    tags=("text", "tokenizer", "unigram", "llm-pipeline"),
)
def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_train

    vocab, _ = unigram_train(
        load(spark, sf_dir, "documents"),
        vocab_size=256,
        max_piece_len=4,
        n_iters=2,
        seed_size=1024,
    )
    rows = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(i, p, lp, len(p)) for i, (p, lp) in enumerate(rows)],
        "rank int, piece string, logprob double, piece_len int",
    )


@register(
    "q_ccnet_perplexity_buckets",
    oracle=None,  # LM is EM-trained — rows-only; formula + bucketing pinned in pytest
    doc=(
        "CCNet-style perplexity filtering (Wenzek et al. 2020): train the "
        "unigram LM on a high-quality REFERENCE slice (sources src0-src3 "
        "stand in for CCNet's Wikipedia), score EVERY document's perplexity "
        "under it via dictionary encoding (each distinct word segmented "
        "once, logp broadcast-joined back onto occurrences), then split "
        "each language into equal-frequency head/middle/tail buckets — the "
        "standard LLM-corpus quality gate. Reports per (lang, bucket): doc "
        "count, token count, and the perplexity band [min, max]. Scale "
        "shape: one explode + one doc_id shuffle + a per-lang split; the "
        "only Python is the bounded dictionary DP."
    ),
    tags=("text", "quality", "perplexity", "llm-pipeline"),
)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import ccnet_buckets, unigram_train

    docs = load(spark, sf_dir, "documents")
    reference = docs.where(F.col("source").isin("src0", "src1", "src2", "src3"))
    vocab, _ = unigram_train(
        reference, vocab_size=256, max_piece_len=4, n_iters=2, seed_size=1024
    )
    scored = ccnet_buckets(docs, vocab, max_piece_len=4, n_buckets=3)
    return (
        scored.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("ppl").alias("ppl_min"),
            F.max("ppl").alias("ppl_max"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "q_unigram_tokenize_stats",
    oracle=None,  # depends on the EM-trained vocab — rows-only; see pytest
    doc=(
        "Tokenizer INFERENCE via dictionary encoding: train the unigram LM, "
        "then segment each DISTINCT word of the corpus exactly once and "
        "broadcast-join the per-word piece counts back onto word "
        "occurrences — a word occurring a million times costs one DP. "
        "Reports per-source token counts and chars-per-token (the "
        "compression-rate signal a tokenizer eval tracks). The join side is "
        "the O(dictionary) segmented-word table; the corpus side is one "
        "explode + groupBy — map-side combinable, no skew (word dictionary "
        "is broadcast, occurrences never shuffle on word)."
    ),
    tags=("text", "tokenizer", "unigram", "llm-pipeline"),
)
def q_unigram_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_encode_stats, unigram_train

    docs = load(spark, sf_dir, "documents")
    vocab, _ = unigram_train(
        docs, vocab_size=256, max_piece_len=4, n_iters=2, seed_size=1024
    )
    return unigram_encode_stats(docs, vocab, max_piece_len=4).orderBy("source")


@register(
    "q_kn_ngram_counts",
    oracle="""
        WITH toks AS (
            SELECT ['<s>','<s>','<s>','<s>'] || string_split(text, ' ')
                   || ['</s>'] AS arr
            FROM documents
        ),
        pos AS (SELECT unnest(range(5, len(arr) + 1)) AS p, arr FROM toks),
        grams AS (
            SELECT array_to_string(arr[p-4:p], chr(31)) AS gram FROM pos
        )
        SELECT gram, COUNT(*) AS cnt
        FROM grams
        GROUP BY gram
        ORDER BY cnt DESC, gram ASC
        LIMIT 40
    """,
    doc=(
        "The Kneser-Ney counting stage, oracle-checked: 5-gram counts over "
        "the [<s>]*4 + words + [</s>] padded corpus, one gram per PREDICTION "
        "event (spans ending at each real token and </s> — so counting "
        "equals the scoring-event grain and <s> is never a predicted type). "
        "One explode + one map-side-combinable groupBy; Zipf-head gram keys "
        "partial-aggregate away before the shuffle. Top-40 by (count, gram) "
        "for a deterministic hash comparison."
    ),
    tags=("text", "ngram", "kneser-ney", "llm-pipeline"),
)
def q_kn_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kneser_ney import ngram_counts

    return (
        ngram_counts(load(spark, sf_dir, "documents"), k=5, order=5)
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(40)
    )


@register(
    "q_kneser_ney_lm",
    oracle=None,  # smoothed model — discount math + normalization pinned in pytest
    doc=(
        "Distributed modified Kneser-Ney 5-gram LM training (Chen & Goodman "
        "1998 §2.7 — the KenLM model family CCNet actually uses, Wenzek "
        "2020): raw counts at order 5, continuation counts below (raw for "
        "<s>-anchored grams — the KenLM sentence-boundary rule, r7), three "
        "count-of-counts discounts per order, part/gamma tables as one "
        "groupBy per order — ALL JVM dataflow, zero Python anywhere. The "
        "driver sees only the 15-number discount matrix and two scalars. "
        "Output: the per-order model summary (type/context counts + "
        "discounts). pytest pins the tables against an independent "
        "dict-based reference implementation, proves sum_w p(w|ctx) = 1 per "
        "seen context, and bit-identical tables under repartitioning."
    ),
    tags=("text", "ngram", "kneser-ney", "lm-training", "llm-pipeline"),
)
def q_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kneser_ney import kn_train

    model = kn_train(load(spark, sf_dir, "documents"), order=5)
    # One fused union collect for the 2*order table counts (r13, guide §5):
    # the former per-order parts[k].count()/gammas[k].count() pairs cost ten
    # driver job launches; a union of ten 1-row aggregates is ONE job over
    # the same cached tables — identical counts.
    counts = None
    for k in range(1, model.order + 1):
        piece = model.parts[k].agg(F.count(F.lit(1)).alias("n_types")).select(
            F.lit(k).alias("ord"), "n_types"
        ).crossJoin(model.gammas[k].agg(F.count(F.lit(1)).alias("n_contexts")))
        counts = piece if counts is None else counts.unionByName(piece)
    by_k = {int(r["ord"]): r for r in counts.collect()}
    rows = []
    for k in range(1, model.order + 1):
        d1, d2, d3 = model.discounts[k]
        rows.append(
            (
                k,
                int(by_k[k]["n_types"]),
                int(by_k[k]["n_contexts"]),
                round(d1, 9),
                round(d2, 9),
                round(d3, 9),
            )
        )
    out = spark.createDataFrame(
        rows, "ord int, n_types bigint, n_contexts bigint, d1 double, d2 double, d3 double"
    )
    return out.orderBy("ord")


@register(
    "q_ccnet_ppl_kn",
    oracle=None,  # KN-smoothed ppl — model pinned in pytest; bucketing shared w/ unigram
    doc=(
        "CCNet perplexity filtering under the TRUE LM family (Wenzek 2020 "
        "uses a 5-gram Kneser-Ney KenLM): train modified-KN order 5 on the "
        "high-quality reference slice (src0-src3 standing in for CCNet's "
        "Wikipedia), score every document via the dictionary-encoded KN "
        "scorer (each distinct padded 5-gram query scored once, k+1 hash "
        "joins, broadcast back onto events), then the SAME per-language "
        "equal-frequency head/middle/tail split as the unigram path "
        "(ccnet_buckets model= flag — one bucketing implementation, two LM "
        "families). Reports per (lang, bucket) doc/token counts and the "
        "perplexity band."
    ),
    tags=("text", "quality", "perplexity", "kneser-ney", "llm-pipeline"),
)
def q_ccnet_ppl_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kneser_ney import kn_train
    from ..operators.unigram import ccnet_buckets

    docs = load(spark, sf_dir, "documents")
    reference = docs.where(F.col("source").isin("src0", "src1", "src2", "src3"))
    model = kn_train(reference, order=5)
    scored = ccnet_buckets(docs, n_buckets=3, model=model)
    return (
        scored.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("ppl").alias("ppl_min"),
            F.max("ppl").alias("ppl_max"),
        )
        .orderBy("lang", "bucket")
    )


# The synthesized-crawl HTML expression, reproduced VERBATIM in DuckDB SQL so
# the strip stage is oracle-checked end to end (operators/html_extract.py::
# synthesize_html is the Spark side).
_HTML_SYNTH_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><script>var x = 1 &lt; 2;</script>"
    "<style>.nav{color:red}</style></head><body>"
    '<div class="nav"><a href="/">Home</a> <a href="/all">All &amp; more</a></div>'
    "<h1>Entry ' || CAST(doc_id AS VARCHAR) || "
    "'</h1><!-- comment --><p>' || text || "
    "'</p><div class=\"footer\">&copy; 2024 <a href=\"/tos\">Terms</a></div>"
    "</body></html>'"
)


# the quote-aware tag body (html_extract._TAG_BODY, incl. the r8
# unterminated-quote tolerance: quoted runs may not span a tag-opening '<')
# with single quotes doubled for SQL string literals — RE2 runs the
# identical alternation (r10: incl. the consumed tag-like-context units that
# keep unspaced comparisons inside terminated quotes — see _DQ_RUN)
_TAG_BODY_SQL = (
    "(?:[^>\"'']"
    "|\"(?:[^\"<]|<[a-zA-Z]+[^a-zA-Z\\s/><\"]|<[a-zA-Z]+\\s*/?>"
    "|<[^a-zA-Z/\"])*\""
    "|''(?:[^''<]|<[a-zA-Z]+[^a-zA-Z\\s/><'']|<[a-zA-Z]+\\s*/?>"
    "|<[^a-zA-Z/''])*''"
    ")*(?:\"[^\">]*|''[^''>]*)?"
)


def _strip_sql(inner: str) -> str:
    """The DuckDB mirror of operators/html_extract.py::strip_html, wrapped
    around any SQL string expression — shared by q_html_extract and the
    WARC end-to-end pipeline oracle. Kept in lockstep with the Spark chain
    (incl. the r7 quote-aware tag grammar)."""
    return f"""trim(regexp_replace(
        replace(replace(replace(replace(replace(replace(replace(
            regexp_replace(
                regexp_replace(
                    regexp_replace(
                        regexp_replace(
                            regexp_replace({inner},
                                '(?is)<script\\b{_TAG_BODY_SQL}>.*?</script>', ' ', 'g'),
                            '(?is)<style\\b{_TAG_BODY_SQL}>.*?</style>', ' ', 'g'),
                        '(?is)<noscript\\b{_TAG_BODY_SQL}>.*?</noscript>', ' ', 'g'),
                    '(?s)<!--.*?-->', ' ', 'g'),
                '<{_TAG_BODY_SQL}>', ' ', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', ''''), '&copy;', '©'),
            '&amp;', '&'),
        '\\s+', ' ', 'g'))"""


@register(
    "q_html_extract",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents
        ),
        stripped AS (
            SELECT doc_id, {_strip_sql("html")} AS clean_text
            FROM raw
        )
        SELECT doc_id, clean_text, LENGTH(clean_text) AS n_chars
        FROM stripped
    """,
    doc=(
        "Raw-crawl front-end, strip stage (round-6 task #3): visible text of "
        "an HTML page via a fixed JVM regexp_replace chain — drop script/"
        "style/noscript/comment subtrees, strip remaining tags, decode "
        "common entities, collapse whitespace (operators/html_extract.py). "
        "The fixture synthesizes a deterministic boilerplate-sandwich page "
        "around each document's text (no HTML column in the test data); the "
        "oracle reproduces BOTH the synthesis and the identical strip chain "
        "in DuckDB, so the stage is hash-checked end to end. Map-only at any "
        "scale — no shuffle, no Python."
    ),
    tags=("text", "html", "crawl", "llm-pipeline"),
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import strip_html, synthesize_html

    d = load(spark, sf_dir, "documents")
    clean = strip_html(synthesize_html(F.col("text"), F.col("doc_id")))
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).alias("n_chars"),
    )


@register(
    "q_html_boilerplate",
    oracle=None,  # classifier thresholds — precision/recall pinned in pytest
    doc=(
        "Raw-crawl front-end, boilerplate stage (jusText-style, Pomikalek "
        "2011): split the synthesized page into block-level segments "
        "(posexplode on block-open tags), score per-block link density / "
        "stopword density / length IN the explode projection, classify "
        "good/bad/short, then one neighbor-smoothing pass over the per-doc "
        "block window (bounded by blocks-per-document). Output per doc: "
        "content/boilerplate block counts and how much of the original text "
        "the content blocks recover — nav/footer/link-bar blocks must drop, "
        "the body paragraph must survive. Map-only + ONE doc_id shuffle; "
        "precision/recall vs a hand-labeled fixture pinned in pytest."
    ),
    tags=("text", "html", "crawl", "boilerplate", "llm-pipeline"),
)
def q_html_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import extract_main_text, synthesize_html

    d = load(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.length("text").alias("orig_chars"),
        synthesize_html(F.col("text"), F.col("doc_id")).alias("html"),
    )
    out = extract_main_text(pages, html_col="html", id_col="doc_id")
    return (
        out.join(pages.select("doc_id", "orig_chars"), on="doc_id")
        .select(
            "doc_id",
            "n_content_blocks",
            "n_boilerplate_blocks",
            F.length("main_text").alias("recovered_chars"),
            (
                F.length("main_text").cast("double")
                / F.greatest(F.col("orig_chars"), F.lit(1)).cast("double")
            ).alias("recovery_ratio"),
        )
    )


@register(
    "q_warc_extract",
    oracle="""
        SELECT doc_id,
               'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
               CAST(LENGTH(text) AS BIGINT) AS content_length,
               substr(text, 1, 40) AS payload_head
        FROM documents
    """,
    doc=(
        "WARC container round trip, oracle-checked (ISO 28500 — the Common "
        "Crawl shipping format; sources/warc.py): every document is encoded "
        "as a spec-conforming record, records concatenate into multi-record "
        "blobs (doc_id % 37), and the Content-Length-walking parser must "
        "recover every record exactly — URI, declared length, and payload "
        "bytes hash-match the documents table. Parse runs where the bytes "
        "live (Arrow-batched, one blob at a time); at 100 TB parallelism is "
        "per WARC FILE (binaryFile source, read_warc). Delimiter-splitting "
        "corruption (payloads containing CRLFCRLF) is pinned in pytest."
    ),
    tags=("source", "warc", "crawl", "llm-pipeline"),
)
def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warc import synthetic_warc_blobs, warc_records

    blobs = synthetic_warc_blobs(load(spark, sf_dir, "documents"))
    recs = warc_records(blobs)
    return recs.where(F.col("valid")).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "target_uri",
        "content_length",
        F.substring(F.decode("payload", "UTF-8"), 1, 40).alias("payload_head"),
    )


@register(
    "q_warc_gz_extract",
    oracle="""
        SELECT doc_id,
               'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
               CAST(LENGTH(text) AS BIGINT) AS content_length,
               substr(text, 1, 40) AS payload_head
        FROM documents
    """,
    doc=(
        "Gzipped WARC (.warc.gz) round trip, oracle-checked — the layout "
        "Common Crawl ACTUALLY ships: one gzip MEMBER per record, members "
        "concatenated (record-at-time compression, ISO 28500 annex D). "
        "The member-chain decompressor (stdlib zlib, "
        "sources/warc.py:_gunzip_members) feeds the identical "
        "Content-Length walk, so the same oracle as q_warc_extract proves "
        "the compressed leg lossless: URI, declared length, payload bytes "
        "all hash-match the documents table through gzip+container. "
        "Truncated/corrupt members quarantine their compressed tail "
        "(pinned in pytest, tests/test_warc.py)."
    ),
    tags=("source", "warc", "gzip", "crawl", "llm-pipeline"),
)
def q_warc_gz_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warc import synthetic_warc_blobs, warc_records

    blobs = synthetic_warc_blobs(load(spark, sf_dir, "documents"), gz=True)
    recs = warc_records(blobs)
    return recs.where(F.col("valid")).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "target_uri",
        "content_length",
        F.substring(F.decode("payload", "UTF-8"), 1, 40).alias("payload_head"),
    )


@register(
    "q_warc_html_pipeline",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents
        )
        SELECT doc_id, {_strip_sql("html")} AS clean_text
        FROM raw
    """,
    doc=(
        "The FULL crawl entry chain, oracle-checked end to end: documents "
        "-> synthesized HTML pages -> WARC records -> per-record gzip "
        "members (the Common Crawl .warc.gz layout, round 7) -> "
        "member-chain decompression -> Content-Length record walk -> "
        "visible-text strip. The oracle "
        "recomputes only synthesis+strip directly on the documents table, "
        "so a hash match proves the WARC encode/parse leg is lossless AND "
        "the strip chain is byte-identical through the container round "
        "trip. This is the 'from crawl' entry stage feeding the existing "
        "corpus-prep pipeline (q_corpus_prep_pipeline)."
    ),
    tags=("source", "warc", "html", "crawl", "llm-pipeline"),
)
def q_warc_html_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import strip_html, synthesize_html
    from ..sources.warc import synthetic_warc_blobs, warc_records

    pages = load(spark, sf_dir, "documents").select(
        "doc_id", synthesize_html(F.col("text"), F.col("doc_id")).alias("text")
    )
    blobs = synthetic_warc_blobs(pages, gz=True)
    recs = warc_records(blobs)
    return recs.where(F.col("valid")).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        strip_html(F.decode("payload", "UTF-8")).alias("clean_text"),
    )


@register(
    "q_url_canonicalize",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   'HTTP://Example.COM:80/Doc/' || CAST(doc_id AS VARCHAR)
                   || '?utm_source=news&b=' || CAST(n_chars AS VARCHAR)
                   || '&a=' || CAST(doc_id AS VARCHAR) || '&fbclid=xyz#frag'
                       AS url
            FROM documents
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1))  AS hostport,
                   regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)   AS path,
                   regexp_extract(url, '\\?([^#]*)', 1)                 AS query
            FROM raw
        ),
        canon AS (
            SELECT doc_id, url, scheme,
                   CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END AS host,
                   CASE WHEN LENGTH(path) = 0 THEN '/' ELSE path END AS path2,
                   list_sort(list_filter(string_split(query, '&'),
                       p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)=')))
                       AS params
            FROM parts
        )
        SELECT doc_id, url,
               scheme || '://' || host || path2
               || CASE WHEN len(params) > 0
                       THEN '?' || array_to_string(params, '&')
                       ELSE '' END AS canonical_url
        FROM canon
    """,
    doc=(
        "URL canonicalization — the crawl-dedup KEY (two fetches of one "
        "page routinely differ only in tracking params / fragment / case / "
        "default port): lowercase scheme+host, strip default port, drop "
        "fragment and tracking params (utm_*, fbclid, gclid, msclkid, ref, "
        "mc_eid), sort surviving query params "
        "(operators/html_extract.py::canonicalize_url). Map-only regexp + "
        "HOF expression; the DuckDB oracle mirrors every step on the same "
        "synthesized messy URLs, so the whole normalization is hash-checked."
    ),
    tags=("text", "url", "crawl", "dedup", "llm-pipeline"),
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import canonicalize_url

    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://Example.COM:80/Doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=news&b="),
        F.col("n_chars").cast("string"),
        F.lit("&a="),
        F.col("doc_id").cast("string"),
        F.lit("&fbclid=xyz#frag"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        canonicalize_url(url).alias("canonical_url"),
    )


# BM25 constants (Robertson et al.; Lucene defaults) + the fixed benchmark
# query the registry entry ranks against — words present in the fixture
# vocabulary so the ranking is non-degenerate.
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_QUERY = ("table", "join", "query", "window")


@register(
    "q_bm25_search",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
            FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   (SELECT AVG(CAST(len AS DOUBLE)) FROM dl) AS avgdl
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS f
            FROM toks
            WHERE term IN ('table', 'join', 'query', 'window')
            GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        scored AS (
            -- the ln is quantized to 8 decimals FIRST (libm 1-ulp skew
            -- vanishes), the product runs in IEEE double (deterministic
            -- across engines), and the per-term score quantizes once more
            -- so the per-doc SUM is order-independent
            SELECT tf.doc_id,
                   CAST(
                       CAST(CAST(LN((stats.n_docs - df.df + 0.5) / (df.df + 0.5)
                                    + 1.0) AS DECIMAL(27,8)) AS DOUBLE)
                       * ((CAST(f AS DOUBLE) * ({_BM25_K1} + 1.0))
                          / (CAST(f AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B}
                             + {_BM25_B} * CAST(dl.len AS DOUBLE) / stats.avgdl)))
                       AS DECIMAL(27,8)) AS s
            FROM tf
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats
        )
        SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25
        FROM scored
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 20
    """,
    doc=(
        "BM25 ranked retrieval (Robertson/Lucene-form IDF, k1=1.2, b=0.75) "
        "— the corpus-search primitive a curation team uses to pull topical "
        "slices: term frequencies computed ONLY for the (broadcast) query "
        "terms, document-frequency and avgdl as tiny aggregates, per-term "
        "partial scores DECIMAL(27,8)-quantized before the per-doc sum so "
        "the float total is order-independent (the q_bigram_surprisal "
        "pattern) — bit-stable under any partitioning and hash-matched "
        "against the operation-for-operation DuckDB oracle. Scale: one "
        "(doc,term) shuffle on the query-filtered explode (map-side "
        "combined), two scalar broadcasts; top-20 is a "
        "TakeOrderedAndProject."
    ),
    tags=("text", "search", "bm25", "llm-pipeline"),
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # ONE corpus explode + ONE doc-grain aggregate computes the document
    # length AND the per-query-term frequencies together (the query terms
    # are a fixed 4-term set, so they pivot into counters); the former
    # shape re-exploded the corpus for tf and AGAIN for df, and shuffled
    # a (doc, term) ⋈ (doc, len) join that is now column access on the
    # same row (r12, guide §2.2). All counts are integers — tf/df/len are
    # value-identical, so every downstream double is unchanged.
    from ..operators.dedup import track_cache

    # per_doc is the narrow (doc_id + 5 ints) base both tf and df derive
    # from; the boundary stops the df leg re-deriving the corpus explode
    # (differently-pruned legs defeat exchange reuse) — the q_crawl
    # narrow-projection precedent (r12, guide §5.3).
    per_doc = track_cache(
        toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("len"),
            *[
                F.count(F.when(F.col("term") == t, 1)).alias(f"__f_{i}")
                for i, t in enumerate(_BM25_QUERY)
            ],
        )
    )
    dl = per_doc.select("doc_id", "len")
    # The two driver scalars (corpus count, average doc length) ride ONE
    # union-of-aggregates collect instead of two jobs (guide §5, the
    # trainer-fusion pattern). The legs aggregate different frames (d vs the
    # tracked per_doc cache, which this job materializes), so nothing races;
    # count-as-double is exact below 2^53 and avg is the identical
    # expression, so n_docs/avgdl — and every literal they feed — are
    # bit-identical.
    srow = (
        d.agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select("v", F.lit(False).alias("is_avg"))
        .unionByName(
            dl.agg(F.avg(F.col("len").cast("double")).alias("v")).select(
                "v", F.lit(True).alias("is_avg")
            )
        )
        .collect()
    )
    n_docs = int(next(r["v"] for r in srow if not r["is_avg"]))
    avgdl = next(r["v"] for r in srow if r["is_avg"])
    stack_args = ", ".join(
        f"'{t}', __f_{i}" for i, t in enumerate(_BM25_QUERY)
    )
    tf = (
        per_doc.select(
            "doc_id",
            "len",
            F.expr(f"stack({len(_BM25_QUERY)}, {stack_args}) AS (term, f)"),
        )
        .where(F.col("f") > 0)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        .cast("decimal(27,8)")  # quantize the ln (1-ulp libm skew vanishes)
        .cast("double")
    )
    tf_part = (F.col("f").cast("double") * (_BM25_K1 + 1.0)) / (
        F.col("f").cast("double")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("len").cast("double") / F.lit(avgdl))
    )
    # len rides the tf row (same doc-grain aggregate) — the former dl join
    # is gone; only the tiny per-term df broadcast join remains. (df as a
    # window over partitionBy(term) was considered and rejected: 4 distinct
    # terms would concentrate every matched doc onto <= 4 tasks at scale,
    # while the aggregate keeps the fact rows map-side-combined.)
    scored = (
        tf.join(F.broadcast(df), on="term")
        .select("doc_id", (idf * tf_part).cast("decimal(27,8)").alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "q_langid_nb",
    oracle="""
        WITH tris AS (
            SELECT doc_id, lang,
                   UNNEST(list_transform(range(LENGTH(text) - 2),
                          i -> substr(text, CAST(i + 1 AS INT), 3))) AS tri
            FROM documents
        ),
        model AS (
            SELECT lang AS mlang, tri, COUNT(*) AS c
            FROM tris GROUP BY lang, tri
        ),
        tot AS (SELECT mlang, SUM(c) AS t FROM model GROUP BY mlang),
        vocab AS (SELECT COUNT(DISTINCT tri) AS v FROM tris),
        nl AS (SELECT lang AS plang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        nall AS (SELECT COUNT(*) AS n FROM documents),
        doctri AS (
            SELECT doc_id, tri, COUNT(*) AS n FROM tris GROUP BY doc_id, tri
        ),
        langs AS (SELECT DISTINCT lang AS slang FROM documents),
        scored AS (
            SELECT d.doc_id, l.slang,
                   SUM(CAST(d.n AS DECIMAL(10,0)) * (CAST(LN(COALESCE(m.c, 0) + 1) AS DECIMAL(27,8))
                              - CAST(LN(t.t + v.v) AS DECIMAL(27,8)))) AS s
            FROM doctri d
            CROSS JOIN langs l
            LEFT JOIN model m ON m.mlang = l.slang AND m.tri = d.tri
            JOIN tot t ON t.mlang = l.slang
            CROSS JOIN vocab v
            GROUP BY d.doc_id, l.slang
        ),
        total AS (
            SELECT s.doc_id, s.slang,
                   s.s + CAST(LN(nl.n_docs) AS DECIMAL(27,8))
                       - CAST(LN(nall.n) AS DECIMAL(27,8)) AS score
            FROM scored s
            JOIN nl ON nl.plang = s.slang
            CROSS JOIN nall
        ),
        ranked AS (
            SELECT doc_id, slang, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, slang ASC) AS rn
            FROM total
        )
        SELECT doc_id, slang AS predicted_lang, CAST(score AS DOUBLE) AS score
        FROM ranked WHERE rn = 1
    """,
    doc=(
        "TRAINED language identification — multinomial Naive Bayes over "
        "char TRIGRAMS with Laplace smoothing (the relational cousin of "
        "CCNet's fastText langid; companion to the lexicon heuristic "
        "q_lang_id_heuristic): per-(lang, trigram) counts + per-lang totals "
        "+ priors are all RELATIONAL (no driver collect anywhere — the "
        "model is a DataFrame the scorer joins), per-term logs "
        "DECIMAL(27,8)-quantized so the per-doc score sums are exact and "
        "order-independent — the whole trained classifier hash-matches the "
        "DuckDB oracle. (On this shared-vocabulary synthetic corpus the "
        "PREDICTIONS are near-uniform by construction — q_lang_id_heuristic "
        "documents the same caveat; accuracy is DEMONSTRATED in pytest: "
        "separable-lexicon 30/30 and the r7 real-prose en/de/fr/es corpus "
        ">=0.95 NB / >=0.85 heuristic, tests/test_langid_realism.py.) "
        "Scale: two map-side-combined trigram shuffles, one "
        "(tri, lang) equi-join fanned by |langs|, one doc argmax window "
        "bounded by |langs| rows per doc."
    ),
    tags=("text", "langid", "nb", "trained", "llm-pipeline"),
)
def q_langid_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.width import cache_if_bounded

    d = load(spark, sf_dir, "documents")
    tri = F.explode(
        F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
    ).alias("tri")
    tris = d.select("doc_id", "lang", tri)
    # ONE corpus-wide trigram explode, aggregated to (doc, lang, tri, n) —
    # model counts and the scoring probe both derive from this table (r12;
    # before, each leg re-ran the full explode: 3x corpus scans + Generates
    # per execution, guide §5.3). lang rides the groupBy key (functionally
    # dependent on doc_id) so the model needs no join back to documents;
    # sum(n) == the trigram count.
    # The persist is SCALE-ADAPTIVE (r13, verdict #4 audit): doctri is
    # doc-grain — corpus-sized at 100 TB, where a MEMORY_AND_DISK cache
    # would spill the whole corpus to disk to save one recompute. Under the
    # cap (any bench SF) it pins exactly as before; above it, the two
    # consumers recompute the single-aggregate plan instead.
    doctri = cache_if_bounded(
        tris.groupBy("doc_id", "lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    )
    model = doctri.groupBy(
        F.col("lang").alias("mlang"), F.col("tri").alias("mtri")
    ).agg(F.sum("n").alias("c"))
    tot = model.groupBy(F.col("mlang").alias("tlang")).agg(F.sum("c").alias("t"))
    # vocabulary size from the MODEL grain (lang x tri — Heaps-bounded), not
    # the doc-grain table: distinct tri is identical over both (model is a
    # groupBy of doctri that keeps every tri), and reading it here drops one
    # consumer of the corpus-grain table (r13).
    vocab = model.agg(F.count_distinct("mtri").alias("v"))
    nl = d.groupBy(F.col("lang").alias("plang")).agg(F.count(F.lit(1)).alias("n_docs"))
    nall = d.agg(F.count(F.lit(1)).alias("n"))
    langs = d.select(F.col("lang").alias("slang")).distinct()
    dlog = lambda c: F.log(c).cast("decimal(27,8)")  # noqa: E731
    scored = (
        doctri.crossJoin(F.broadcast(langs))
        .join(
            model,
            (F.col("mlang") == F.col("slang")) & (F.col("mtri") == F.col("tri")),
            "left",
        )
        .join(F.broadcast(tot), F.col("tlang") == F.col("slang"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "slang")
        .agg(
            F.sum(
                # decimal(10,0) x decimal(27,8) stays within precision 38 —
                # a raw bigint would overflow it and Spark drops the scale
                # to 6 (the BM25 lesson; per-doc trigram counts fit 10,0)
                F.col("n").cast("decimal(10,0)")
                * (dlog(F.coalesce(F.col("c"), F.lit(0)) + 1) - dlog(F.col("t") + F.col("v"))).cast(
                    "decimal(27,8)"  # the (27,8)-(27,8) diff is (28,8); un-widen so the product keeps scale 8
                )
            ).alias("s")
        )
    )
    total = (
        scored.join(F.broadcast(nl), F.col("plang") == F.col("slang"))
        .crossJoin(F.broadcast(nall))
        .select(
            "doc_id",
            "slang",
            # bound s to decimal(20,8) before adding the prior: the sum's
            # (38,8) + (27,8) would overflow precision 38 and drop scale
            (
                F.col("s").cast("decimal(20,8)")
                + dlog(F.col("n_docs"))
                - dlog(F.col("n"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("slang"))
    return (
        total.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("slang").alias("predicted_lang"),
            F.col("score").cast("double").alias("score"),
        )
    )


# the squeeze_repeats sliding-drop rule, mirrored as a DuckDB lambda chain
# (n is inlined; list slices are 1-based inclusive on both engines)
def _squeeze_sql(w: str, n: int) -> str:
    return f"""array_to_string(
        list_transform(
            list_filter(range(1, len({w}) + 1),
                j -> len(list_filter(range(j, least(j + {n} - 1, len({w})) + 1),
                         i -> i >= {2 * n}
                              AND {w}[i - {n} + 1 : i] = {w}[i - {2 * n} + 1 : i - {n}]
                     )) = 0),
            j -> {w}[j]),
        ' ')"""


@register(
    "q_squeeze_repeats",
    oracle=f"""
        WITH doctored AS (
            SELECT doc_id,
                   string_split(
                       text || ' spam spam spam stop click here click here click here',
                       ' ') AS w
            FROM documents
        )
        SELECT doc_id,
               {_squeeze_sql('w', 1)} AS squeezed_1,
               {_squeeze_sql('w', 2)} AS squeezed_2
        FROM doctored
    """,
    doc=(
        "Within-document repetition REMOVAL (the transform counterpart of "
        "the Gopher dup-word/dup-bigram metrics — q_repetition_quality "
        "measures the disease, this is the C4/Gopher cleanup step): every "
        "word n-gram that exactly repeats the n-gram ending n positions "
        "earlier is dropped, collapsing 'spam spam spam' and 'click here "
        "click here click here' to one copy in a single declarative pass "
        "(functions/text.py::squeeze_repeats — pure HOF, map-only, no "
        "shuffle at all). The fixture injects period-1 and period-2 spam "
        "tails into every document; the oracle reproduces both the "
        "doctoring and the sliding drop rule as DuckDB list lambdas, so "
        "the full transform is hash-checked."
    ),
    tags=("text", "quality", "repetition", "transform", "llm-pipeline"),
)
def q_squeeze_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import squeeze_repeats

    d = load(spark, sf_dir, "documents")
    doctored = F.concat(
        F.col("text"),
        F.lit(" spam spam spam stop click here click here click here"),
    )
    return d.select(
        "doc_id",
        squeeze_repeats(doctored, 1).alias("squeezed_1"),
        squeeze_repeats(doctored, 2).alias("squeezed_2"),
    )


# cp1252-mojibake repair as a DuckDB replace() fold — mirrors
# functions.text.MOJIBAKE_TABLE verbatim, in the same order
def _mojibake_sql(col: str) -> str:
    from ..functions.text import MOJIBAKE_TABLE

    expr = col
    for src, dst in MOJIBAKE_TABLE:
        expr = f"replace({expr}, '{src}', '{dst}')"
    return expr


@register(
    "q_fix_mojibake",
    oracle=f"""
        WITH doctored AS (
            SELECT doc_id,
                   text || ' CafÃ© â€œquotedâ€¦ donâ€™t â€“ maÃ±ana Ã¼ber'
                       AS garbled
            FROM documents
        )
        SELECT doc_id,
               {_mojibake_sql('garbled')} AS fixed,
               LENGTH(garbled) - LENGTH({_mojibake_sql('garbled')})
                   AS chars_removed,
               LENGTH(garbled) <> LENGTH({_mojibake_sql('garbled')})
                   AS had_mojibake
        FROM doctored
    """,
    doc=(
        "Encoding repair (ftfy-style): fix UTF-8-decoded-as-cp1252 mojibake "
        "('CafÃ©' -> 'Café', 'donâ€™t' -> 'don’t') — the cleanup pass every "
        "web-crawl pipeline runs before tokenization. The synthetic corpus "
        "is clean ASCII, so the fixture GARBLES each document with a fixed "
        "mojibake tail (the q_squeeze_repeats doctoring pattern) and both "
        "engines repair it with the identical substitution fold "
        "(functions/text.py::fix_mojibake / MOJIBAKE_TABLE) — the full "
        "repaired text is hash-checked, plus an artifact-count metric "
        "(every table entry shrinks 1 char per hit). Pure JVM replace "
        "chain, map-only, whole-stage codegen; idempotence and real-sample "
        "repairs pinned in tests/test_text_fixes.py."
    ),
    tags=("text", "quality", "encoding", "transform", "llm-pipeline"),
)
def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fix_mojibake

    d = load(spark, sf_dir, "documents")
    garbled = F.concat(
        F.col("text"),
        F.lit(" CafÃ© â€œquotedâ€¦ donâ€™t â€“ maÃ±ana Ã¼ber"),
    )
    fixed = fix_mojibake(garbled)
    return d.select(
        "doc_id",
        fixed.alias("fixed"),
        (F.length(garbled) - F.length(fixed)).alias("chars_removed"),
        (F.length(garbled) != F.length(fixed)).alias("had_mojibake"),
    )


# The blocklist a real pipeline loads is the public LDNOOBW word list (the
# C4 cleanup recipe, Raffel et al. 2020 §2.2 "Dirty, Naughty, Obscene");
# this placeholder uses corpus-vocabulary terms so hits are nonzero and the
# machinery is exercised end to end.
_BLOCK_WORDS = ("slow", "merge")
_BLOCK_PHRASES = ("big table", "fast key")


@register(
    "q_blocklist_filter",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks
            FROM documents
        )
        SELECT doc_id,
               LEN(list_filter(toks, x -> x IN {_BLOCK_WORDS!r})) AS n_word_hits,
               LEN(regexp_extract_all(text, '\\bbig table\\b'))
               + LEN(regexp_extract_all(text, '\\bfast key\\b')) AS n_phrase_hits,
               LEN(list_filter(toks, x -> x IN {_BLOCK_WORDS!r})) = 0
               AND LEN(regexp_extract_all(text, '\\bbig table\\b')) = 0
               AND LEN(regexp_extract_all(text, '\\bfast key\\b')) = 0 AS keep
        FROM t
    """,
    doc=(
        "C4-style blocklist document filter (Raffel et al. 2020: drop any "
        "page containing a blocklisted word): exact word-grain hits via a "
        "token-array HOF filter (token grain, so 'slowest' never matches "
        "'slow') plus multi-word PHRASE hits via word-boundary-anchored "
        "regexp_count ('big tables' never matches 'big table' — real "
        "blocklists are phrase-heavy), and the keep verdict a pipeline "
        "filters on. Map-only column "
        "expressions, no shuffle, whole-stage codegen. At 100 TB with a "
        "large lexicon the word leg becomes an explode + broadcast "
        "semi-join against the blocklist table; the HOF IN-list form used "
        "here is the small-lexicon fast path."
    ),
    tags=("text", "quality", "filter", "llm-pipeline"),
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_word_hits = F.size(F.filter(toks, lambda x: x.isin(*_BLOCK_WORDS)))
    phrase_hits = None
    for p in _BLOCK_PHRASES:
        h = F.regexp_count(F.col("text"), F.lit(rf"\b{p}\b"))
        phrase_hits = h if phrase_hits is None else phrase_hits + h
    return d.select(
        "doc_id",
        n_word_hits.alias("n_word_hits"),
        phrase_hits.alias("n_phrase_hits"),
        ((n_word_hits == 0) & (phrase_hits == 0)).alias("keep"),
    )


_PARA_FOOTER = " | subscribe to our newsletter today | special offer click now"


@register(
    "q_paragraph_dedup",
    oracle=f"""
        WITH doctored AS (
            SELECT doc_id,
                   string_split(text || '{_PARA_FOOTER}', ' | ') AS parts
            FROM documents
        ),
        paras AS (
            SELECT doc_id, i AS para_idx, parts[i] AS para
            FROM doctored, UNNEST(range(1, LEN(parts) + 1)) AS r(i)
        ),
        ranked AS (
            SELECT doc_id, para_idx, para,
                   ROW_NUMBER() OVER (PARTITION BY md5(para)
                                      ORDER BY doc_id, para_idx) AS rn
            FROM paras
        ),
        agg AS (
            SELECT doc_id,
                   COUNT(*) AS kept_paras,
                   md5(string_agg(para, ' | ' ORDER BY para_idx)) AS cleaned_md5
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        )
        SELECT d.doc_id,
               LEN(d.parts)                       AS n_paras,
               COALESCE(a.kept_paras, 0)          AS kept_paras,
               COALESCE(a.cleaned_md5, md5(''))   AS cleaned_md5
        FROM doctored d LEFT JOIN agg a USING (doc_id)
    """,
    doc=(
        "Paragraph-grain exact dedup — CCNet's actual dedup step (Wenzek "
        "et al. 2020 §3.1 dedups SHA1-hashed PARAGRAPHS across the whole "
        "crawl dump, not documents): split each document on the paragraph "
        "separator, keep only the corpus-wide FIRST occurrence of every "
        "paragraph hash (total order (doc_id, para_idx) — deterministic, "
        "dedups within-doc repeats too), reassemble the surviving text in "
        "order and hash-verify it. The synthetic corpus is newline-free, so "
        "the fixture injects a shared two-paragraph boilerplate footer "
        "behind a ' | ' separator (the q_squeeze_repeats doctoring "
        "pattern; in deployment the separator is '\\n') — the lowest "
        "doc_id keeps the footer, every other document sheds it, and on "
        "tiled corpora (scripts/make_sf1.py, x10 verbatim copies) later "
        "full-document copies keep ZERO paragraphs. One shuffle on the "
        "paragraph hash (the window), one doc_id shuffle for reassembly; "
        "per-group width bounded by paragraph duplication count, and the "
        "rn=1 window compiles to a two-sided WindowGroupLimit (duplicates "
        "pruned map-side before the shuffle) — the hash-groupBy shape that "
        "survives 100 TB, never pairwise."
    ),
    tags=("text", "dedup", "paragraph", "ccnet", "llm-pipeline"),
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    doctored = d.select(
        "doc_id",
        F.split(F.concat(F.col("text"), F.lit(_PARA_FOOTER)), r" \| ").alias("parts"),
    )
    paras = doctored.select(
        "doc_id", F.posexplode("parts").alias("pos0", "para")
    ).select("doc_id", (F.col("pos0") + 1).alias("para_idx"), "para")
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "para_idx")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_paras"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s.para,
                ),
                " | ",
            )
        ).alias("cleaned_md5"),
    )
    return (
        doctored.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.size("parts").alias("n_paras"),
            F.coalesce("kept_paras", F.lit(0)).alias("kept_paras"),
            F.coalesce("cleaned_md5", F.md5(F.lit(""))).alias("cleaned_md5"),
        )
    )


_V2_TAIL = " CafÃ© donâ€™t spam spam spam | subscribe to our newsletter today"


@register(
    "q_corpus_prep_v2",
    oracle=f"""
        WITH doctored AS (
            SELECT doc_id, text || '{_V2_TAIL}' AS g FROM documents
        ),
        fixed AS (
            SELECT doc_id, {_mojibake_sql('g')} AS f FROM doctored
        ),
        sq AS (SELECT doc_id, string_split(f, ' ') AS w FROM fixed),
        squeezed AS (SELECT doc_id, {_squeeze_sql('w', 1)} AS s FROM sq),
        parted AS (
            SELECT doc_id, string_split(s, ' | ') AS parts FROM squeezed
        ),
        paras AS (
            SELECT doc_id, LEN(parts) AS n_paras, i AS para_idx, parts[i] AS para
            FROM parted, UNNEST(range(1, LEN(parts) + 1)) AS r(i)
        ),
        ranked AS (
            SELECT doc_id, n_paras, para_idx, para,
                   ROW_NUMBER() OVER (PARTITION BY md5(para)
                                      ORDER BY doc_id, para_idx) AS rn
            FROM paras
        ),
        clean AS (
            SELECT doc_id, n_paras,
                   COUNT(*) AS kept_paras,
                   string_agg(para, ' | ' ORDER BY para_idx) AS t
            FROM ranked WHERE rn = 1 GROUP BY doc_id, n_paras
        ),
        gated AS (
            SELECT * FROM clean
            WHERE LEN(regexp_extract_all(t, '\\bfast key\\b')) = 0
              AND LENGTH(t) >= 80
        ),
        deduped AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(t)
                                         ORDER BY doc_id) AS rn2
            FROM gated
        )
        SELECT doc_id, n_paras, kept_paras,
               LENGTH(t) AS n_chars_clean, md5(t) AS text_md5
        FROM deduped WHERE rn2 = 1
    """,
    doc=(
        "The FULL modern cleanup recipe as ONE composed declarative plan — "
        "the CCNet/C4/Gopher stack end to end: mojibake repair -> "
        "within-doc repetition squeeze -> paragraph-grain corpus dedup "
        "(first-occurrence-wins + ordered reassembly) -> blocklist phrase "
        "filter -> length quality gate -> exact document dedup (min doc_id "
        "per content hash). The fixture tail exercises every stage (a "
        "mojibake'd prefix, a period-1 spam run, a corpus-shared footer "
        "paragraph); survivors' full cleaned text is hash-verified against "
        "DuckDB running the identical composition. THREE shuffles total at "
        "any scale (paragraph-hash window, doc_id reassembly, content-hash "
        "window) — everything else fuses map-side into the scan, and the "
        "rn=1 windows compile to WindowGroupLimit on BOTH exchange sides, "
        "so duplicated paragraphs are pruned map-side BEFORE they shuffle "
        "(plan-verified); compare "
        "q_corpus_prep_pipeline for the v1 (sample/PII/chunk) composition."
    ),
    tags=("text", "llm-pipeline", "composed", "flagship"),
)
def q_corpus_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import fix_mojibake, squeeze_repeats

    d = load(spark, sf_dir, "documents")
    cleaned = squeeze_repeats(
        fix_mojibake(F.concat(F.col("text"), F.lit(_V2_TAIL))), 1
    )
    parted = d.select("doc_id", F.split(cleaned, r" \| ").alias("parts"))
    paras = parted.select(
        "doc_id",
        F.size("parts").alias("n_paras"),
        F.posexplode("parts").alias("pos0", "para"),
    ).select("doc_id", "n_paras", (F.col("pos0") + 1).alias("para_idx"), "para")
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "para_idx")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    clean = kept.groupBy("doc_id", "n_paras").agg(
        F.count(F.lit(1)).alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s.para,
            ),
            " | ",
        ).alias("t"),
    )
    gated = clean.where(
        (F.regexp_count(F.col("t"), F.lit(r"\bfast key\b")) == 0)
        & (F.length("t") >= 80)
    )
    w2 = Window.partitionBy(F.md5("t")).orderBy("doc_id")
    return (
        gated.withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") == 1)
        .select(
            "doc_id",
            "n_paras",
            "kept_paras",
            F.length("t").alias("n_chars_clean"),
            F.md5("t").alias("text_md5"),
        )
    )


# The crawl-to-corpus doctoring tail: a mojibake'd phrase (exercises the
# encoding repair) plus a corpus-shared footer paragraph (exercises
# paragraph-grain dedup) — appended INSIDE the synthesized page body.
_CRAWL_TAIL = " CafÃ© donâ€™t forget | subscribe to our newsletter today"


def _crawl_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared batch crawl-to-corpus cleanup chain (r8 verdict task #7):

      documents -> doctored text -> synthesized HTML page -> WARC record ->
      per-record gzip member (.warc.gz, the Common Crawl layout) ->
      member-chain gunzip -> Content-Length record walk -> visible-text
      strip -> mojibake repair -> paragraph-grain corpus dedup
      (first-occurrence-wins, ordered reassembly) -> blocklist phrase gate
      -> length gate -> exact content dedup.

    Returns one row per surviving document: (doc_id, source, n_paras,
    kept_paras, t) with t the full cleaned text. Exchanges: the paragraph-
    hash window, the doc_id reassembly, the content-hash window, plus one
    doc_id join back to documents for `source` — everything upstream fuses
    map-side into the WARC scan. Feeds q_crawl_to_corpus (oracle-matched
    end to end) and q_crawl_to_corpus_ppl (KN perplexity bucketing)."""
    from pyspark.sql import Window

    from ..functions.text import fix_mojibake
    from ..operators.html_extract import strip_html, synthesize_html
    from ..sources.warc import synthetic_warc_blobs, warc_records

    d = load(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        synthesize_html(
            F.concat(F.col("text"), F.lit(_CRAWL_TAIL)), F.col("doc_id")
        ).alias("text"),
    )
    recs = warc_records(synthetic_warc_blobs(pages, gz=True)).where(F.col("valid"))
    extracted = recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        fix_mojibake(strip_html(F.decode("payload", "UTF-8"))).alias("clean"),
    )
    parted = extracted.select(
        "doc_id", F.split(F.col("clean"), r" \| ").alias("parts")
    )
    paras = parted.select(
        "doc_id",
        F.size("parts").alias("n_paras"),
        F.posexplode("parts").alias("pos0", "para"),
    ).select("doc_id", "n_paras", (F.col("pos0") + 1).alias("para_idx"), "para")
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "para_idx")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    clean = kept.groupBy("doc_id", "n_paras").agg(
        F.count(F.lit(1)).alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s.para,
            ),
            " | ",
        ).alias("t"),
    )
    gated = clean.where(
        (F.regexp_count(F.col("t"), F.lit(r"\bfast key\b")) == 0)
        & (F.length("t") >= 120)
    )
    w2 = Window.partitionBy(F.md5("t")).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") == 1)
        .drop("rn2")
    )
    return deduped.join(d.select("doc_id", "source"), "doc_id")


@register(
    "q_crawl_to_corpus",
    oracle=f"""
        WITH doctored AS (
            SELECT doc_id, source, text || '{_CRAWL_TAIL}' AS text
            FROM documents
        ),
        raw AS (
            SELECT doc_id, source, {_HTML_SYNTH_SQL} AS html FROM doctored
        ),
        fixed AS (
            SELECT doc_id, source,
                   {_mojibake_sql(_strip_sql("html"))} AS clean
            FROM raw
        ),
        parted AS (
            SELECT doc_id, source, string_split(clean, ' | ') AS parts
            FROM fixed
        ),
        paras AS (
            SELECT doc_id, source, LEN(parts) AS n_paras,
                   i AS para_idx, parts[i] AS para
            FROM parted, UNNEST(range(1, LEN(parts) + 1)) AS r(i)
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(para)
                                         ORDER BY doc_id, para_idx) AS rn
            FROM paras
        ),
        clean AS (
            SELECT doc_id, source, n_paras,
                   COUNT(*) AS kept_paras,
                   string_agg(para, ' | ' ORDER BY para_idx) AS t
            FROM ranked WHERE rn = 1 GROUP BY doc_id, source, n_paras
        ),
        gated AS (
            SELECT * FROM clean
            WHERE LEN(regexp_extract_all(t, '\\bfast key\\b')) = 0
              AND LENGTH(t) >= 120
        ),
        deduped AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(t)
                                         ORDER BY doc_id) AS rn2
            FROM gated
        ),
        docs_clean AS (
            SELECT doc_id, source, n_paras, kept_paras,
                   LEN(string_split(t, ' ')) AS n_tokens,
                   md5(t) AS text_md5
            FROM deduped WHERE rn2 = 1
        ),
        rates AS (
            SELECT source,
                   LEAST(1.0, (100000.0 / COUNT(*) OVER ())
                         / SUM(n_tokens)) AS src_sample_rate
            FROM docs_clean GROUP BY source
        )
        SELECT d.doc_id, d.source, d.n_paras, d.kept_paras, d.n_tokens,
               d.text_md5, r.src_sample_rate
        FROM docs_clean d JOIN rates r USING (source)
    """,
    doc=(
        "THE crawl-to-corpus FLAGSHIP (r8): every front-end piece composed "
        "as ONE declarative plan and hash-verified end to end — documents "
        "-> doctored page text (mojibake phrase + corpus-shared footer "
        "paragraph) -> synthesized HTML -> WARC records -> per-record gzip "
        "members (the Common Crawl .warc.gz layout) -> member-chain gunzip "
        "-> Content-Length record walk -> visible-text strip (quote-aware "
        "r8 grammar) -> mojibake repair -> paragraph-grain corpus dedup "
        "with ordered reassembly -> blocklist phrase gate -> length gate "
        "-> exact content dedup -> per-source mixture sampling rates "
        "toward a 100k-token budget. The DuckDB oracle recomputes "
        "synthesis+cleanup directly on the documents table, so a hash "
        "match proves BOTH the container round trip lossless (through "
        "gzip + WARC + non-ASCII payloads) AND the whole cleanup "
        "composition byte-identical. Scale shape: map-fused through the "
        "WARC scan; three content exchanges (paragraph-hash window with "
        "two-sided WindowGroupLimit, doc_id reassembly, content-hash "
        "window) + one doc_id join + a |sources|-row mixture aggregate. "
        "See also q_crawl_to_corpus_ppl (the KN quality-bucketing leg) "
        "and USER_GUIDE 'From crawl to training corpus'."
    ),
    tags=("text", "warc", "crawl", "llm-pipeline", "composed", "flagship"),
)
def q_crawl_to_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import track_cache

    # docs_clean feeds the per-source rates aggregate AND the final join
    # probe side; un-persisted, the broadcast-rates leg re-executes the
    # whole WARC chain a second time (guide §5.3). The cached projection
    # is narrow — text is already reduced to md5/n_tokens.
    docs_clean = track_cache(_crawl_cleaned(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_paras",
        "kept_paras",
        F.size(F.split(F.col("t"), " ")).alias("n_tokens"),
        F.md5("t").alias("text_md5"),
    ))
    per_src = docs_clean.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    w = Window.partitionBy()
    rate = F.least(
        F.lit(1.0),
        (F.lit(100000.0) / F.count(F.lit(1)).over(w)) / F.col("src_tokens"),
    )
    rates = per_src.select("source", rate.alias("src_sample_rate"))
    return docs_clean.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        "n_paras",
        "kept_paras",
        "n_tokens",
        "text_md5",
        "src_sample_rate",
    )


@register(
    "q_crawl_to_corpus_ppl",
    oracle=None,  # KN LM is iteratively trained — rows-only; chain + bucketing pinned elsewhere
    doc=(
        "The quality-bucketing leg of the crawl flagship: the SAME cleaned "
        "corpus as q_crawl_to_corpus (shared _crawl_cleaned chain, itself "
        "oracle-matched), then CCNet perplexity gating under the true LM "
        "family — a 5-gram modified-Kneser-Ney model trained on the "
        "high-quality reference slice (src0-src3) OF THE CLEANED TEXT, "
        "every surviving document scored via the dictionary-encoded KN "
        "scorer, per-language head/middle/tail equal-frequency buckets. "
        "Output per (source, bucket): docs, tokens, perplexity band — the "
        "table a data-mixture owner reads to set per-bucket sampling "
        "weights. Rows-only by declared design (EM/iterative LM); the "
        "cleanup chain is hash-verified in q_crawl_to_corpus and the KN "
        "scorer/bucketing carry their own pytest pins."
    ),
    tags=("text", "warc", "crawl", "perplexity", "kneser-ney", "llm-pipeline", "composed"),
)
def q_crawl_to_corpus_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import track_cache
    from ..operators.kneser_ney import kn_train
    from ..operators.unigram import ccnet_buckets

    cleaned = _crawl_cleaned(spark, sf_dir)
    # The cleaned corpus feeds kn_train (several training actions), the KN
    # scoring leg, and the final source join — without a persist boundary
    # every one of those re-executes the full WARC->gunzip->strip->dedup
    # chain (observed: 282 Exchange nodes in the un-persisted plan; guide
    # §5.3). Materialized once, read back by every leg.
    docs = track_cache(
        cleaned.join(
            load(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id"
        ).select("doc_id", "source", "lang", F.col("t").alias("text"))
    )
    reference = docs.where(F.col("source").isin("src0", "src1", "src2", "src3"))
    model = kn_train(reference, order=5)
    scored = ccnet_buckets(docs, n_buckets=3, model=model)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("ppl").alias("ppl_min"),
            F.max("ppl").alias("ppl_max"),
        )
        .orderBy("source", "bucket")
    )


@register(
    "q_blocklist_semijoin",
    oracle=f"""
        WITH lex(word) AS (VALUES ('slow'), ('merge'), ('spam'), ('stop')),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits,
                   COUNT(DISTINCT tok)  AS n_distinct_hits
            FROM (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents
            ) t
            SEMI JOIN lex ON t.tok = lex.word
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_hits, 0)          AS n_hits,
               COALESCE(h.n_distinct_hits, 0) AS n_distinct_hits,
               h.doc_id IS NULL               AS keep
        FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    doc=(
        "The LARGE-lexicon form of the C4 blocklist filter (the "
        "q_blocklist_filter docstring's deployment note made real): when "
        "the word list is too big for an IN-expression (LDNOOBW x100 "
        "languages, phrase tables), the filter becomes explode + BROADCAST "
        "semi-join against a lexicon TABLE — one map-side-combined "
        "(doc, hit) aggregate, lexicon shipped once per executor, fact "
        "table never shuffled on the lexicon. Left join back restores "
        "clean docs with keep=true. The lexicon here is an inline 4-word "
        "table so the oracle mirrors it as VALUES; in deployment it's any "
        "DataFrame (broadcast() below pins the build side)."
    ),
    tags=("text", "quality", "filter", "join", "llm-pipeline"),
)
def q_blocklist_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = spark.createDataFrame(
        [("slow",), ("merge",), ("spam",), ("stop",)], "word string"
    )
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    hits = (
        toks.join(F.broadcast(lex), toks.tok == lex.word, "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("tok").alias("n_distinct_hits"),
        )
    )
    return d.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.coalesce("n_distinct_hits", F.lit(0)).alias("n_distinct_hits"),
        F.col("n_hits").isNull().alias("keep"),
    )


from ..operators.graph import pagerank_oracle_sql  # noqa: E402

# ------------------------------------------------------------------ r8: links
# The synthesized link markup: two deterministic intra-corpus anchors (a
# messy-cased tracking-parameter one and a single-quoted fragment one), one
# external asset link, and (r10 verdict task #5) one anchor whose inner text
# carries NESTED MARKUP (<b>) — the case the r9 [^<]* grammar silently
# dropped — all reproduced VERBATIM in the DuckDB oracles. The nested anchor
# targets a non-/doc/ URL so the intra-corpus EDGE set (and with it the
# whole PageRank/HITS/BFS family) is unchanged.
_LINK_HTML_SQL = (
    "'<html><body><p>see also</p>"
    "<a class=\"nav\" href=\"HTTP://Example.COM:80/doc/' "
    "|| CAST(doc_id // 2 AS VARCHAR) || "
    "'?utm_source=crawl&x=' || CAST(doc_id AS VARCHAR) || '\">half</a> "
    "<a href=''https://example.com/doc/' || CAST(doc_id // 3 AS VARCHAR) || "
    "'#frag''>third</a> "
    "<a href=\"https://CDN.other.net:443/asset?gclid=zz&v=1\">ext</a> "
    "<a href=\"https://docs.other.net/guide?v=2\">read the <b>full guide</b> now</a>"
    "</body></html>'"
)

_DQ_HREF = r'(?i)<a\s[^>]*href\s*=\s*"([^"]*)"'
_SQ_HREF = r"(?i)<a\s[^>]*href\s*=\s*'([^']*)'"


def _link_pages(d: DataFrame) -> DataFrame:
    half = F.floor(F.col("doc_id") / 2).cast("long").cast("string")
    third = F.floor(F.col("doc_id") / 3).cast("long").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><p>see also</p><a class="nav" href="HTTP://Example.COM:80/doc/'),
            half,
            F.lit('?utm_source=crawl&x='),
            F.col("doc_id").cast("string"),
            F.lit('">half</a> <a href=\'https://example.com/doc/'),
            third,
            F.lit("#frag'>third</a> "),
            F.lit('<a href="https://CDN.other.net:443/asset?gclid=zz&v=1">ext</a> '),
            F.lit(
                '<a href="https://docs.other.net/guide?v=2">read the '
                "<b>full guide</b> now</a>"
            ),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@register(
    "q_link_graph",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_HREF}', 1),
                       regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   ) AS hrefs
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, i AS link_idx, hrefs[i] AS url
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        parts AS (
            SELECT doc_id, link_idx, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1))  AS hostport,
                   regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)   AS path,
                   regexp_extract(url, '\\?([^#]*)', 1)                 AS query
            FROM exploded
        ),
        canon AS (
            SELECT doc_id, link_idx, scheme,
                   CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END AS host,
                   CASE WHEN LENGTH(path) = 0 THEN '/' ELSE path END AS path2,
                   list_sort(list_filter(string_split(query, '&'),
                       p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)=')))
                       AS params
            FROM parts
        ),
        edges AS (
            SELECT doc_id, link_idx,
                   scheme || '://' || host || path2
                   || CASE WHEN len(params) > 0
                           THEN '?' || array_to_string(params, '&')
                           ELSE '' END AS dst_url
            FROM canon
        )
        SELECT doc_id, link_idx, dst_url,
               CAST(NULLIF(regexp_extract(dst_url, '/doc/(\\d+)$', 1), '') AS BIGINT)
                   AS dst_doc,
               regexp_matches(dst_url, '/doc/(\\d+)$') AS is_internal
        FROM edges
    """,
    doc=(
        "Crawl link-graph extraction, oracle-checked end to end: anchor "
        "hrefs (double- AND single-quoted) pulled from the synthesized "
        "page markup with the same positional explode both engines use, "
        "every target URL CANONICALIZED (case, default ports, tracking "
        "params, fragments — the canonicalize_url contract), internal "
        "targets resolved back to doc ids. The edge list every link-based "
        "quality signal starts from (in/out-degree, anchor spam, "
        "PageRank). Map-only: regexp extraction + HOF canonicalization "
        "fused into the scan; no shuffle at all."
    ),
    tags=("text", "html", "crawl", "links", "llm-pipeline"),
)
def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import canonicalize_url

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    exploded = pages.select(
        "doc_id", F.posexplode(hrefs).alias("idx0", "url")
    ).select("doc_id", (F.col("idx0") + 1).alias("link_idx"), "url")
    canon = exploded.select(
        "doc_id", "link_idx", canonicalize_url(F.col("url")).alias("dst_url")
    )
    internal = F.nullif(
        F.regexp_extract("dst_url", r"/doc/(\d+)$", 1), F.lit("")
    )
    return canon.select(
        "doc_id",
        "link_idx",
        "dst_url",
        internal.cast("long").alias("dst_doc"),
        internal.isNotNull().alias("is_internal"),
    )


@register(
    "q_link_host_rollup",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_HREF}', 1),
                       regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   ) AS hrefs
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, hrefs[i] AS url
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1))  AS hostport,
                   regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)   AS path,
                   regexp_extract(url, '\\?([^#]*)', 1)                 AS query
            FROM exploded
        ),
        canon AS (
            SELECT doc_id, scheme,
                   CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END AS host,
                   CASE WHEN LENGTH(path) = 0 THEN '/' ELSE path END AS path2,
                   list_sort(list_filter(string_split(query, '&'),
                       p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)=')))
                       AS params
            FROM parts
        ),
        edges AS (
            SELECT doc_id, host,
                   scheme || '://' || host || path2
                   || CASE WHEN len(params) > 0
                           THEN '?' || array_to_string(params, '&')
                           ELSE '' END AS dst_url
            FROM canon
        )
        SELECT host,
               COUNT(*) AS n_links,
               COUNT(DISTINCT doc_id) AS n_src_docs,
               COUNT(DISTINCT dst_url) AS n_distinct_targets,
               CAST(SUM(CASE WHEN regexp_matches(dst_url, '/doc/(\\d+)$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_internal
        FROM edges
        GROUP BY host
    """,
    doc=(
        "Per-HOST link rollup (r10, unsolicited): the domain-grain "
        "aggregate every crawl pipeline maintains — total links into the "
        "host, distinct linking pages (the spam discriminator: many links "
        "from FEW sources is the farm shape), distinct canonical targets, "
        "and how many resolve intra-corpus. Domain-level stats are what "
        "feed blocklists and per-domain sampling caps in CC-style "
        "pipelines (a registered-domain rollup at 100 TB is exactly this "
        "aggregate keyed by eTLD+1 — the host key here, since the fixture "
        "has no public-suffix list). Map-only extraction + canonicalize "
        "fused into the scan, one (host)-keyed aggregate; both "
        "count_distincts go through Spark's expand-based partial "
        "aggregation, so a hub host spreads over the distinct keys before "
        "the final merge."
    ),
    tags=("text", "html", "links", "crawl", "domains", "quality", "llm-pipeline"),
)
def q_link_host_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import canonicalize_url

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    canon = pages.select(
        "doc_id", F.explode(hrefs).alias("url")
    ).select("doc_id", canonicalize_url(F.col("url")).alias("dst_url"))
    edges = canon.select(
        "doc_id",
        "dst_url",
        F.regexp_extract("dst_url", r"^[^:]+://([^/?#]*)", 1).alias("host"),
    )
    return edges.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct("doc_id").alias("n_src_docs"),
        F.count_distinct("dst_url").alias("n_distinct_targets"),
        F.sum(
            F.when(F.col("dst_url").rlike(r"/doc/(\d+)$"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_internal"),
    )


_PSL_IN_SQL = (
    "('co.uk','org.uk','ac.uk','gov.uk','me.uk','com.au','net.au','org.au',"
    "'co.jp','ne.jp','or.jp','ac.jp','com.br','com.cn','com.mx','com.ar',"
    "'com.tr','com.sg','co.in','co.nz','co.za','co.kr')"
)


@register(
    "q_link_domain_rollup",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_HREF}', 1),
                       regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   ) AS hrefs
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, hrefs[i] AS url
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1))  AS hostport,
                   regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)   AS path,
                   regexp_extract(url, '\\?([^#]*)', 1)                 AS query
            FROM exploded
        ),
        canon AS (
            SELECT doc_id, scheme,
                   CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END AS host,
                   CASE WHEN LENGTH(path) = 0 THEN '/' ELSE path END AS path2,
                   list_sort(list_filter(string_split(query, '&'),
                       p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)=')))
                       AS params
            FROM parts
        ),
        edges AS (
            SELECT doc_id, host,
                   scheme || '://' || host || path2
                   || CASE WHEN len(params) > 0
                           THEN '?' || array_to_string(params, '&')
                           ELSE '' END AS dst_url
            FROM canon
        ),
        dom AS (
            SELECT doc_id, host, dst_url,
                   array_to_string(
                       l[GREATEST(LEN(l) - tk + 1, 1):LEN(l)], '.'
                   ) AS domain
            FROM (
                SELECT doc_id, host, dst_url, l,
                       LEAST(LEN(l),
                             CASE WHEN LEN(l) >= 2
                                       AND array_to_string(
                                           l[GREATEST(LEN(l)-1,1):LEN(l)], '.'
                                       ) IN {_PSL_IN_SQL}
                                  THEN 2 ELSE 1 END + 1) AS tk
                FROM (
                    SELECT doc_id, host, dst_url,
                           string_split(
                               regexp_replace(host, ':[0-9]+$', ''), '.'
                           ) AS l
                    FROM edges
                )
            )
        )
        SELECT domain,
               COUNT(*) AS n_links,
               COUNT(DISTINCT host)   AS n_hosts,
               COUNT(DISTINCT doc_id) AS n_src_docs,
               COUNT(DISTINCT dst_url) AS n_distinct_targets,
               CAST(SUM(CASE WHEN regexp_matches(dst_url, '/doc/(\\d+)$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_internal
        FROM dom
        GROUP BY domain
    """,
    doc=(
        "Per-REGISTRABLE-DOMAIN link rollup (r11, unsolicited — closes "
        "q_link_host_rollup's documented gap 'the host key here, since "
        "the fixture has no public-suffix list'): the eTLD+1 grain that "
        "blocklists and anti-domination caps actually key on in CC/C4 "
        "pipelines — per-HOST stats split one site across cdn./docs./www. "
        "subdomains (this fixture's cdn.other.net + docs.other.net fold "
        "to other.net), per-domain stats do not. registrable_domain "
        "(operators/html_extract.py) does longest-suffix match against an "
        "embedded publicsuffix.org SUBSET as a pure map-only column "
        "expression — lowercase, port strip, split, classify the last two "
        "labels against the multi-label suffix literals (co.uk-style), "
        "keep suffix + one label; no join, no UDF; production broadcasts "
        "the full PSL file instead of the literal subset. Output per "
        "domain adds n_hosts (how many subdomains the rollup folded) to "
        "the host-rollup columns. One (domain)-keyed aggregate; the three "
        "count_distincts go through Spark's expand-based partial "
        "aggregation, so a hub domain spreads before the final merge."
    ),
    tags=("text", "html", "links", "crawl", "domains", "quality", "llm-pipeline"),
)
def q_link_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html_extract import canonicalize_url, registrable_domain

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    canon = pages.select(
        "doc_id", F.explode(hrefs).alias("url")
    ).select("doc_id", canonicalize_url(F.col("url")).alias("dst_url"))
    edges = canon.select(
        "doc_id",
        "dst_url",
        F.regexp_extract("dst_url", r"^[^:]+://([^/?#]*)", 1).alias("host"),
    )
    return edges.select(
        "doc_id",
        "dst_url",
        "host",
        registrable_domain(F.col("host")).alias("domain"),
    ).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct("host").alias("n_hosts"),
        F.count_distinct("doc_id").alias("n_src_docs"),
        F.count_distinct("dst_url").alias("n_distinct_targets"),
        F.sum(
            F.when(F.col("dst_url").rlike(r"/doc/(\d+)$"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_internal"),
    )


@register(
    "q_host_capped_sample",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_HREF}', 1),
                       regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   ) AS hrefs
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, hrefs[i] AS url
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        hosts AS (
            SELECT DISTINCT doc_id,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport
            FROM exploded
        ),
        keyed AS (
            SELECT doc_id, hostport,
                   (doc_id * 2654435761) % 4294967296 AS hkey
            FROM hosts
        ),
        ranked AS (
            SELECT doc_id, hostport,
                   ROW_NUMBER() OVER (
                       PARTITION BY hostport ORDER BY hkey, doc_id
                   ) AS rn
            FROM keyed
        )
        SELECT hostport AS host, doc_id, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= 40
    """,
    doc=(
        "Per-domain sampling CAP (r10, unsolicited — the standard "
        "anti-domination rule in crawl corpus assembly: no single host "
        "may contribute more than K documents, CC/C4-style): for each "
        "(doc, linked-host) membership, keep at most K=40 docs per host, "
        "chosen by the SAME deterministic 32-bit multiplicative hash as "
        "q_budget_sampled_corpus (reproducible on any engine/partitioning "
        "— and oracle-hashable, which a random sample is not), ties by "
        "doc id. Scale shape: the window is PARTITIONED BY host — "
        "hash-partitioned, fully parallel, the anti-pattern is only the "
        "UNpartitioned NTILE this family already documents; per-host "
        "state is a single counter scan, and a power-law host (the hub "
        "probe's regime) concentrates one partition but the sort is "
        "bounded by that host's doc count, the same bounded-concentration "
        "argument as the adjacency build. At true 100 TB you'd pre-"
        "aggregate (host, doc) pairs — which this plan's DISTINCT does — "
        "then cap."
    ),
    tags=("text", "links", "crawl", "domains", "sampling", "llm-pipeline"),
)
def q_host_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    hosts = (
        pages.select("doc_id", F.explode(hrefs).alias("url"))
        .select(
            "doc_id",
            F.lower(
                F.regexp_extract("url", r"^[^:]+://([^/?#]*)", 1)
            ).alias("hostport"),
        )
        .distinct()
    )
    keyed = hosts.select(
        "doc_id",
        "hostport",
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).alias(
            "hkey"
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("hostport").orderBy("hkey", "doc_id")
    )
    return (
        keyed.select(
            F.col("hostport").alias("host"), "doc_id", rn.alias("rn")
        )
        .where(F.col("rn") <= 40)
        .select("host", "doc_id", F.col("rn").cast("bigint").alias("rn"))
    )


@register(
    "q_domain_capped_sample",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_HREF}', 1),
                       regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   ) AS hrefs
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, hrefs[i] AS url
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        hosts AS (
            SELECT DISTINCT doc_id,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport
            FROM exploded
        ),
        doms AS (
            SELECT DISTINCT doc_id,
                   array_to_string(
                       l[GREATEST(LEN(l) - tk + 1, 1):LEN(l)], '.'
                   ) AS domain
            FROM (
                SELECT doc_id, l,
                       LEAST(LEN(l),
                             CASE WHEN LEN(l) >= 2
                                       AND array_to_string(
                                           l[GREATEST(LEN(l)-1,1):LEN(l)], '.'
                                       ) IN {_PSL_IN_SQL}
                                  THEN 2 ELSE 1 END + 1) AS tk
                FROM (
                    SELECT doc_id,
                           string_split(
                               regexp_replace(hostport, ':[0-9]+$', ''), '.'
                           ) AS l
                    FROM hosts
                )
            )
        ),
        ranked AS (
            SELECT doc_id, domain,
                   ROW_NUMBER() OVER (
                       PARTITION BY domain
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                   ) AS rn
            FROM doms
        )
        SELECT domain, doc_id, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= 40
    """,
    doc=(
        "Per-REGISTRABLE-DOMAIN sampling cap (r11, unsolicited — the key "
        "C4/CC pipelines actually cap on: a site spread over cdn./docs./"
        "www. subdomains must not multiply its quota, which a per-HOST cap "
        "lets it do): same deterministic-hash partitioned-window shape as "
        "q_host_capped_sample, keyed by registrable_domain (eTLD+1 via the "
        "embedded PSL subset) and DISTINCT at (doc, domain) so multi-host "
        "links to one domain count once. Scale shape identical to the "
        "host cap — measured there at 1.02x max/median task read under a "
        "1.5M-member hub (WindowGroupLimit runs the rank filter in PARTIAL "
        "mode pre-shuffle), and the domain key only COARSENS the grouping "
        "(fewer, larger partitions of the same bounded top-K work)."
    ),
    tags=("text", "links", "crawl", "domains", "sampling", "llm-pipeline"),
)
def q_domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.html_extract import registrable_domain

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    doms = (
        pages.select("doc_id", F.explode(hrefs).alias("url"))
        .select(
            "doc_id",
            registrable_domain(
                F.lower(F.regexp_extract("url", r"^[^:]+://([^/?#]*)", 1))
            ).alias("domain"),
        )
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy("domain").orderBy(
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)),
            "doc_id",
        )
    )
    return (
        doms.withColumn("rn", rn)
        .where(F.col("rn") <= 40)
        .select("domain", "doc_id", F.col("rn").cast("bigint").alias("rn"))
    )


# the intra-corpus link edges as (doc_a, doc_b) pairs — DISTINCT, no self
# loops — shared by the Spark plan and the PageRank recurrence oracle
_LINK_PAIRS_SQL = f"""
    SELECT DISTINCT doc_id AS doc_a,
           CAST(u AS BIGINT) AS doc_b
    FROM (
        SELECT doc_id,
               NULLIF(regexp_extract(x, '/doc/(\\d+)', 1), '') AS u
        FROM (
            SELECT doc_id,
                   UNNEST(list_concat(
                       regexp_extract_all({_LINK_HTML_SQL}, '{_DQ_HREF}', 1),
                       regexp_extract_all({_LINK_HTML_SQL},
                           '(?i)<a\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                   )) AS x
            FROM documents
        )
    )
    WHERE u IS NOT NULL AND CAST(u AS BIGINT) <> doc_id
"""


@register(
    "q_link_pagerank",
    oracle=pagerank_oracle_sql(_LINK_PAIRS_SQL, iterations=5),
    doc=(
        "Link-graph centrality: damped PageRank (5 fixed rounds, the "
        "fixed-point-integer recurrence of operators/graph.py — "
        "bit-deterministic on any cluster) over the DISTINCT intra-corpus "
        "link edges extracted from page markup — the Common Crawl-style "
        "quality-weighting signal a mixture owner feeds into sampling "
        "weights. Undirected-pair form (the pagerank_fixed contract — a "
        "co-citation-style centrality; the directed variant is the same "
        "recurrence without the edge symmetrization). Oracle = the "
        "identical recurrence unrolled into chained CTEs over the same "
        "edge extraction. One co-partitioned join + one agg per round; "
        "the edge list persists across rounds."
    ),
    tags=("graph", "pagerank", "links", "crawl", "llm-pipeline"),
)
def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fixed

    pages = _link_pages(load(spark, sf_dir, "documents"))
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    target = F.nullif(F.regexp_extract("url", r"/doc/(\d+)", 1), F.lit(""))
    pairs = (
        pages.select("doc_id", F.explode(hrefs).alias("url"))
        .select("doc_id", target.cast("long").alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("doc_id")))
        .select(F.col("doc_id").alias("doc_a"), F.col("dst").alias("doc_b"))
        .distinct()
    )
    return pagerank_fixed(pairs, iterations=5)


from ..operators.graph import pagerank_directed_oracle_sql  # noqa: E402

_LINK_EDGES_SQL = _LINK_PAIRS_SQL.replace("doc_id AS doc_a", "doc_id AS src").replace(
    "CAST(u AS BIGINT) AS doc_b", "CAST(u AS BIGINT) AS dst"
)


def _link_edges(pages: DataFrame) -> DataFrame:
    """DISTINCT intra-corpus (src, dst) link edges from the synthesized page
    markup — the shared front end of the directed link-graph family
    (PageRank, convergence, components, rank-weighted budget)."""
    hrefs = F.concat(
        F.regexp_extract_all("html", F.lit(_DQ_HREF), F.lit(1)),
        F.regexp_extract_all("html", F.lit(_SQ_HREF), F.lit(1)),
    )
    target = F.nullif(F.regexp_extract("url", r"/doc/(\d+)", 1), F.lit(""))
    return (
        pages.select("doc_id", F.explode(hrefs).alias("url"))
        .select("doc_id", target.cast("long").alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("doc_id")))
        .select(F.col("doc_id").alias("src"), "dst")
        .distinct()
    )


@register(
    "q_link_pagerank_directed",
    oracle=pagerank_directed_oracle_sql(_LINK_EDGES_SQL, iterations=5),
    doc=(
        "TRUE directed link-graph PageRank (r8): mass flows along link "
        "direction only, out-degree divides each contribution, and DANGLING "
        "nodes — linked-to pages with no outlinks, ubiquitous in any crawl "
        "frontier — redistribute their damped mass uniformly per round "
        "(integer-division share: deterministic, sub-normalized by "
        "< n_nodes units/round, mirrored exactly). Same fixed-point "
        "arithmetic as the undirected q_link_pagerank — the two queries "
        "differ ONLY in edge symmetrization, which is the documented "
        "contrast. Per round: one co-partitioned edges-ranks join + agg, "
        "plus a 1-row dangling-mass broadcast (never fact-sized)."
    ),
    tags=("graph", "pagerank", "links", "crawl", "directed", "llm-pipeline"),
)
def q_link_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_directed

    return pagerank_directed(
        _link_edges(_link_pages(load(spark, sf_dir, "documents"))), iterations=5
    )


from ..operators.graph import (  # noqa: E402
    pagerank_directed_convergence_oracle_sql,
)


@register(
    "q_link_pagerank_convergence",
    oracle=pagerank_directed_convergence_oracle_sql(_LINK_EDGES_SQL, iterations=5),
    doc=(
        "Convergence diagnostic for the directed link PageRank (r9 verdict "
        "task #6): per iteration, the L1 and L-infinity deltas of the "
        "fixed-point integer rank vector against the previous round — the "
        "number a user reads to judge whether 5 fixed rounds suffice on "
        "THEIR graph (power iteration is geometric, so deltas shrinking by "
        "~the damping factor per round is the healthy signature; a flat "
        "tail says add rounds). Exact-integer deltas, so the oracle is the "
        "same it0..it5 CTE chain plus one join+aggregate per consecutive "
        "pair. Per round this adds one co-partitioned join and a 1-row "
        "aggregate to the rank loop; rank tables persist across rounds."
    ),
    tags=("graph", "pagerank", "links", "convergence", "llm-pipeline"),
)
def q_link_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_directed_convergence

    return pagerank_directed_convergence(
        _link_edges(_link_pages(load(spark, sf_dir, "documents"))), iterations=5
    )


@register(
    "q_link_components",
    oracle=f"""
        WITH RECURSIVE pairs AS ({_LINK_EDGES_SQL}),
        edges AS (
            SELECT src, dst FROM pairs
            UNION
            SELECT dst, src FROM pairs
        ),
        reach(doc, rep) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.rep FROM reach r JOIN edges e ON e.src = r.doc
        )
        SELECT doc, MIN(rep) AS rep FROM reach GROUP BY doc
    """,
    doc=(
        "WEAKLY connected components over the directed link graph (r9 "
        "verdict task #4): edge direction dropped, rep = min doc id per "
        "component — the crawl-frontier signal that separates the connected "
        "web core from isolated islands (and the precondition for "
        "per-component stats like island size). Spark side reuses "
        "resolve_components (operators/dedup.py): min-label propagation to "
        "fixpoint, one co-partitioned join + agg per round, rounds bounded "
        "by component diameter. Oracle = recursive-CTE reachability "
        "closure, exactly the q_neardup_components pattern."
    ),
    tags=("graph", "components", "links", "crawl", "iterative", "llm-pipeline"),
)
def q_link_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_components

    edges = _link_edges(_link_pages(load(spark, sf_dir, "documents")))
    # max_iters: min-label propagation needs O(component diameter) rounds.
    # Near-dup clusters are 2-3 deep (the default cap of 20 is a runaway
    # guard there), but the link graph's halving-chain diameter grows like
    # log2(n_docs) (~13 at sf0.1, ~20 at sf10) — raise the cap; the loop
    # still exits at fixpoint, so converged runs pay nothing extra.
    return resolve_components(
        edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
        max_iters=60,
    )


# anchor-capturing variants of the href patterns: group 1 = url, group 2 =
# the anchor's inner HTML up to the nearest close tag. r10 verdict task #5:
# the r9 grammar ([^<]*) silently DROPPED anchors whose inner text carries
# nested markup (<a href=u>use <b>bold</b></a>); group 2 is now a lazy
# (?s:.)*? run — HTML forbids nested <a>, so the nearest </a> is the right
# boundary — and the captured fragment is routed through the html_extract
# strip chain (tags -> space, entity decode, whitespace collapse) before
# tokenization, in BOTH engines.
#
# MALFORMED-INPUT TRADE (ADVICE r10, documented + pinned): an UNCLOSED
# <a> swallows everything up to the NEXT </a> — subsequent anchors' (href,
# term) pairs are dropped and their text is attributed to the unclosed
# anchor's URL (test_anchor_unclosed_swallows pins the exact behavior).
# The r9 [^<]* grammar failed only the malformed anchor itself, but missed
# every well-formed nested-markup anchor — far more common in real crawls
# than unclosed <a>. Bounding the inner capture with a negative-lookahead
# run ((?:(?!<a[\s>]).)*?) would stop the swallow at the next anchor OPEN,
# but RE2 (the DuckDB oracle engine) has no lookahead, and forking engine
# vs oracle grammars is off the table by round-4 adjudication — so the
# lazy run is the shared grammar and the swallow is the accepted bounded
# trade on malformed input (it ends at the first </a>, never corpus-wide).
_DQ_A = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
_SQ_A = r"(?is)<a\s[^>]*href\s*=\s*'([^']*)'[^>]*>(.*?)</a>"

# DuckDB-side mirrors (single quotes doubled for the SQL literal)
_DQ_A_SQL = '(?is)<a\\s[^>]*href\\s*=\\s*"([^"]*)"[^>]*>(.*?)</a>'
_SQ_A_SQL = "(?is)<a\\s[^>]*href\\s*=\\s*''([^'']*)''[^>]*>(.*?)</a>"


def anchor_term_counts(pages: DataFrame) -> DataFrame:
    """The q_anchor_terms dataflow over any (doc_id, html) frame — factored
    out so the nested-markup grammar is unit-pinnable on crafted inputs
    (tests/test_round3_ops.py) as well as oracle-checked on the fixture."""
    from ..operators.html_extract import canonicalize_url, strip_html

    pairs = pages.select(
        "doc_id",
        F.explode(
            F.concat(
                F.arrays_zip(
                    F.regexp_extract_all("html", F.lit(_DQ_A), F.lit(1)).alias("url"),
                    F.regexp_extract_all("html", F.lit(_DQ_A), F.lit(2)).alias(
                        "anchor"
                    ),
                ),
                F.arrays_zip(
                    F.regexp_extract_all("html", F.lit(_SQ_A), F.lit(1)).alias("url"),
                    F.regexp_extract_all("html", F.lit(_SQ_A), F.lit(2)).alias(
                        "anchor"
                    ),
                ),
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.url").alias("url"), F.col("e.anchor").alias("anchor"))
    terms = (
        pairs.select(
            "doc_id",
            canonicalize_url(F.col("url")).alias("dst_url"),
            # r10: the captured inner HTML goes through the strip chain
            # (nested tags -> space, entities, whitespace collapse) so
            # nested-markup anchors tokenize instead of being dropped
            F.explode(
                F.split(F.lower(strip_html(F.col("anchor"))), r"\s+")
            ).alias("term"),
        )
        .where(F.length("term") > 0)
    )
    return terms.groupBy("dst_url", "term").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.count_distinct("doc_id").alias("n_src_docs"),
    )


@register(
    "q_anchor_terms",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_LINK_HTML_SQL} AS html FROM documents
        ),
        arrs AS (
            SELECT doc_id,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_A_SQL}', 1),
                       regexp_extract_all(html, '{_SQ_A_SQL}', 1)
                   ) AS hrefs,
                   list_concat(
                       regexp_extract_all(html, '{_DQ_A_SQL}', 2),
                       regexp_extract_all(html, '{_SQ_A_SQL}', 2)
                   ) AS anchors
            FROM raw
        ),
        exploded AS (
            SELECT doc_id, hrefs[i] AS url, anchors[i] AS anchor
            FROM arrs, UNNEST(range(1, LEN(hrefs) + 1)) AS r(i)
        ),
        parts AS (
            SELECT doc_id, anchor, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1))  AS hostport,
                   regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)   AS path,
                   regexp_extract(url, '\\?([^#]*)', 1)                 AS query
            FROM exploded
        ),
        canon AS (
            SELECT doc_id, anchor, scheme,
                   CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END AS host,
                   CASE WHEN LENGTH(path) = 0 THEN '/' ELSE path END AS path2,
                   list_sort(list_filter(string_split(query, '&'),
                       p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid)=')))
                       AS params
            FROM parts
        ),
        edges AS (
            SELECT doc_id, anchor,
                   scheme || '://' || host || path2
                   || CASE WHEN len(params) > 0
                           THEN '?' || array_to_string(params, '&')
                           ELSE '' END AS dst_url
            FROM canon
        ),
        terms AS (
            SELECT doc_id, dst_url, t AS term
            FROM (
                SELECT doc_id, dst_url,
                       UNNEST(string_split_regex(
                           lower({_strip_sql("anchor")}), '\\s+')) AS t
                FROM edges
            )
            WHERE LENGTH(t) > 0
        )
        SELECT dst_url, term,
               COUNT(*) AS n_mentions,
               COUNT(DISTINCT doc_id) AS n_src_docs
        FROM terms
        GROUP BY dst_url, term
    """,
    doc=(
        "Anchor-text term frequency per link TARGET (r9 verdict task #5) — "
        "the classic link-spam / target-description signal: what the WEB "
        "calls a page, aggregated over every page linking to it. The "
        "anchor-capturing grammar extracts (href, inner HTML) pairs "
        "positionally (same two-group regex, group 1 vs 2, zipped by "
        "position in BOTH engines; r10 — the inner capture is a lazy "
        "(?s:.)*? so anchors with NESTED markup are kept, then routed "
        "through the html_extract strip chain), target URLs go through "
        "the full canonicalize_url chain so mentions of the same page "
        "under tracking-param/case/port variants aggregate together, "
        "anchor text is lowercased and whitespace-tokenized. Output per (dst_url, "
        "term): n_mentions (total) and n_src_docs (distinct linking pages "
        "— the spam discriminator: high mentions from FEW sources is the "
        "spam shape). Map-only until one (dst_url, term) aggregate; "
        "count_distinct is map-side partial. At 100 TB this is the "
        "standard anchor-corpus build (a second, much smaller corpus keyed "
        "by target page)."
    ),
    tags=("text", "html", "links", "crawl", "quality", "llm-pipeline"),
)
def q_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anchor_term_counts(_link_pages(load(spark, sf_dir, "documents")))


# the directed-PageRank CTE chain as a subquery (nested WITH — both engines
# support WITH inside a FROM-subquery)
_PR_SUBQUERY = pagerank_directed_oracle_sql(_LINK_EDGES_SQL, iterations=5)


def _budget_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, rank, n_tokens, bucket) — directed PageRank joined with token
    counts and NTILE(3)-bucketed (rank DESC, doc ASC). Shared by the exact
    budget query and the r10 budget-driven sampler."""
    from pyspark.sql import Window

    from ..operators.graph import pagerank_directed

    docs = load(spark, sf_dir, "documents")
    ranks = pagerank_directed(_link_edges(_link_pages(docs)), iterations=5)
    return ranks.join(
        docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
        ),
        ranks.doc == F.col("doc_id"),
    ).select(
        "doc",
        "rank",
        "n_tokens",
        F.ntile(3)
        .over(Window.orderBy(F.desc("rank"), F.asc("doc")))
        .alias("bucket"),
    )


def _budget_rates(scored: DataFrame) -> DataFrame:
    """(bucket, n_docs, n_tokens, weight, sample_rate) from a bucketed
    scored table — the 4/2/1-weighted 100k-token budget arithmetic."""
    from pyspark.sql import Window

    agg = (
        scored.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "weight",
            F.when(F.col("bucket") == 1, 4)
            .when(F.col("bucket") == 2, 2)
            .otherwise(1)
            .cast("bigint"),
        )
    )
    total_w = F.sum("weight").over(Window.partitionBy())
    return agg.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "weight",
        F.least(
            F.lit(1.0),
            F.lit(100000.0) * F.col("weight") / total_w / F.col("n_tokens"),
        ).alias("sample_rate"),
    )


@register(
    "q_pagerank_token_budget",
    oracle=f"""
        WITH scored AS (
            SELECT pr.doc, pr.rank,
                   LEN(string_split(d.text, ' ')) AS n_tokens,
                   NTILE(3) OVER (ORDER BY pr.rank DESC, pr.doc) AS bucket
            FROM ( {_PR_SUBQUERY} ) pr
            JOIN documents d ON d.doc_id = pr.doc
        ),
        agg AS (
            SELECT bucket,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(CASE bucket WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
                        AS BIGINT) AS weight
            FROM scored GROUP BY bucket
        ),
        rates AS (
            SELECT bucket, n_docs, n_tokens, weight,
                   LEAST(1.0,
                         100000.0 * weight
                         / CAST(SUM(weight) OVER () AS BIGINT)
                         / n_tokens) AS sample_rate
            FROM agg
        )
        SELECT bucket, n_docs, n_tokens, weight, sample_rate,
               sample_rate * n_tokens AS expected_tokens
        FROM rates
    """,
    doc=(
        "THE composed crawl-quality loop (r9 verdict task #3, the Common "
        "Crawl pattern the q_link_pagerank docstring names): directed "
        "link-graph PageRank feeds the mixture/sampling-weights plan as "
        "ONE oracle-matched composition. Pages are NTILE(3)-bucketed by "
        "rank (ties broken by doc id — total order, so the bucketing is "
        "deterministic in both engines), each bucket gets a quality weight "
        "(4/2/1 head/mid/tail), and a 100k-token global budget is split "
        "across buckets proportional to weight — per-bucket sample_rate = "
        "min(1, share/tokens), the table a mixture owner feeds into the "
        "sampler (higher-centrality pages oversampled, exactly the "
        "CCNet/CC-style quality tiering but with a LINK signal instead of "
        "an LM). Scale shape: the PageRank loop is the Pregel-shaped "
        "co-partitioned join+agg per round; the NTILE runs over the "
        "doc-grain RANK table (orders smaller than the token corpus) but "
        "is a SINGLE-PARTITION global sort — the exactness trade that "
        "makes this variant oracle-hashable. At true 100 TB run "
        "q_pagerank_token_budget_approx instead: the same composition "
        "with approx-percentile rank thresholds (fully parallel, no "
        "global sort), property-pinned against this variant in "
        "tests/test_round3_ops.py. The budget math is a 3-row "
        "aggregate. Oracle composes the identical recurrence CTE chain "
        "with the identical bucket/budget arithmetic."
    ),
    tags=("graph", "pagerank", "links", "sampling", "mixture", "composed", "llm-pipeline"),
)
def q_pagerank_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _budget_rates(_budget_scored(spark, sf_dir))
    return rates.select(
        "*", (F.col("sample_rate") * F.col("n_tokens")).alias("expected_tokens")
    )


def approx_ntile3_buckets(ranks: DataFrame, doc_tokens: DataFrame) -> DataFrame:
    """(doc, rank, n_tokens, bucket) — the fully-parallel NTILE(3) stand-in
    shared by q_pagerank_token_budget_approx, the r11 scale-safe sampler
    (q_budget_sampled_corpus_approx), and the hub skew probe. ``ranks`` is
    any (doc, rank) frame, ``doc_tokens`` any (doc_id, n_tokens) frame;
    buckets come from approx-percentile rank thresholds with NTILE-faithful
    boundary-tie splitting (see q_pagerank_token_budget_approx's doc).
    Three parallel 1-row sketch aggregates + two scalar collects — zero
    Windows, no single-partition operator anywhere."""
    # pass 1: rank thresholds at the 1/3 and 2/3 quantiles + total count —
    # one 1-row aggregate (sketches merge map-side), never a global sort
    acc = 10000
    r0 = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("rank", [2.0 / 3.0, 1.0 / 3.0], acc).alias("t"),
    ).collect()[0]
    n = int(r0["n"])
    t1, t2 = float(r0["t"][0]), float(r0["t"][1])
    # NTILE(3) bucket sizes over n rows: the first (n mod 3) buckets get the
    # extra row — reproduce them so boundary splits land where NTILE's do
    size1 = n // 3 + (1 if n % 3 >= 1 else 0)
    size12 = size1 + n // 3 + (1 if n % 3 >= 2 else 0)
    # pass 2: how much of each boundary TIE group (rank == threshold) must
    # go to the upper bucket to hit the NTILE sizes (NTILE order is rank
    # DESC, doc ASC — so within a tie group, SMALLEST doc ids go up)
    r1 = ranks.agg(
        F.sum((F.col("rank") > t1).cast("long")).alias("above1"),
        F.sum((F.col("rank") == t1).cast("long")).alias("tie1"),
        F.sum((F.col("rank") > t2).cast("long")).alias("above2"),
        F.sum((F.col("rank") == t2).cast("long")).alias("tie2"),
    ).collect()[0]
    need1 = min(max(size1 - int(r1["above1"]), 0), int(r1["tie1"]))
    need2 = min(max(size12 - int(r1["above2"]), 0), int(r1["tie2"]))
    # pass 3: doc-id quantile WITHIN each boundary tie group at the needed
    # fraction — conditional sketch aggregates (nulls ignored), still one
    # 1-row parallel pass. need == 0 -> no doc from that tie goes up.
    d_aggs = []
    if need1 > 0:
        d_aggs.append(
            F.percentile_approx(
                F.when(F.col("rank") == t1, F.col("doc")),
                need1 / int(r1["tie1"]),
                acc,
            ).alias("d1")
        )
    if need2 > 0:
        d_aggs.append(
            F.percentile_approx(
                F.when(F.col("rank") == t2, F.col("doc")),
                need2 / int(r1["tie2"]),
                acc,
            ).alias("d2")
        )
    drow = ranks.agg(*d_aggs).collect()[0] if d_aggs else {}
    up1 = (F.col("rank") > t1) | (
        (F.col("rank") == t1) & (F.col("doc") <= int(drow["d1"]))
        if need1 > 0
        else F.lit(False)
    )
    up2 = (F.col("rank") > t2) | (
        (F.col("rank") == t2) & (F.col("doc") <= int(drow["d2"]))
        if need2 > 0
        else F.lit(False)
    )
    return ranks.join(
        doc_tokens, ranks.doc == doc_tokens.doc_id
    ).select(
        "doc",
        "rank",
        "n_tokens",
        # bucket 1 = head, 2 = mid, 3 = tail — the NTILE(3) ORDER BY rank
        # DESC, doc ASC orientation of the exact variant
        F.when(up1, 1).when(up2, 2).otherwise(3).alias("bucket"),
    )


def _budget_scored_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx twin of _budget_scored: directed PageRank over the link
    graph, bucketed by approx_ntile3_buckets instead of a global NTILE."""
    from ..operators.graph import pagerank_directed

    docs = load(spark, sf_dir, "documents")
    ranks = pagerank_directed(
        _link_edges(_link_pages(docs)), iterations=5
    ).localCheckpoint(eager=False)  # 3 aggregate passes + downstream read it
    return approx_ntile3_buckets(
        ranks,
        docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
        ),
    )


def _budget_rates_parallel(scored: DataFrame) -> DataFrame:
    """(bucket, n_docs, n_tokens, weight, sample_rate) like _budget_rates,
    but the total weight is a 1-row aggregate crossJoin-broadcast instead
    of an unpartitioned Window — the zero-single-partition contract of the
    approx budget family."""
    agg = (
        scored.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "weight",
            F.when(F.col("bucket") == 1, 4)
            .when(F.col("bucket") == 2, 2)
            .otherwise(1)
            .cast("bigint"),
        )
    )
    # total weight via a 1-row aggregate broadcast, NOT an unpartitioned
    # Window (the exact variant's total_w window is harmless on 3 rows but
    # this plan's contract is zero single-partition operators)
    tot = agg.agg(F.sum("weight").alias("total_w"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_docs",
        "n_tokens",
        "weight",
        F.least(
            F.lit(1.0),
            F.lit(100000.0) * F.col("weight") / F.col("total_w") / F.col("n_tokens"),
        ).alias("sample_rate"),
    )


@register(
    "q_pagerank_token_budget_approx",
    oracle=None,  # approx-percentile thresholds are implementation-specific;
    # property-pinned against the exact NTILE variant (bucket shares within
    # quantile tolerance) in tests/test_round3_ops.py
    doc=(
        "The 100 TB form of q_pagerank_token_budget (r10 verdict task #2): "
        "the SAME PageRank -> quality-bucket -> token-budget composition, "
        "but buckets come from APPROX-PERCENTILE rank thresholds "
        "(percentile_approx at accuracy 10000, i.e. rank-error <= 1e-4 of "
        "the doc count) instead of a global NTILE — the exact variant's "
        "Window.orderBy is a single-partition sort, the one scale-killer "
        "in the r9 plan audit. Here the thresholds are a 1-row aggregate "
        "(two-phase, map-side partial sketches) broadcast back onto the "
        "doc-grain rank table, so every stage is fully parallel. Rank TIE "
        "groups straddling a boundary (large on this fixture's regular "
        "graph — a bare threshold would empty a bucket) are split the way "
        "NTILE's (rank DESC, doc ASC) order does: a doc-id quantile WITHIN "
        "the boundary tie group, again a parallel sketch aggregate. Three "
        "passes over the doc-grain rank table, two 1-row collects to "
        "parametrize the next pass's literals — never a global sort. "
        "Bucket sizes match the exact variant to within the sketch's rank "
        "error (property-pinned at tight tolerance). Total weight is a "
        "1-row aggregate crossJoin-broadcast (no unpartitioned Window "
        "anywhere in this plan — verified in the PLANS.md WANT review)."
    ),
    tags=(
        "graph",
        "pagerank",
        "links",
        "sampling",
        "mixture",
        "composed",
        "approx",
        "llm-pipeline",
    ),
)
def q_pagerank_token_budget_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _budget_rates_parallel(_budget_scored_approx(spark, sf_dir))
    return rates.select(
        "*", (F.col("sample_rate") * F.col("n_tokens")).alias("expected_tokens")
    )


@register(
    "q_budget_sampled_corpus",
    oracle=f"""
        WITH scored AS (
            SELECT pr.doc, pr.rank,
                   LEN(string_split(d.text, ' ')) AS n_tokens,
                   NTILE(3) OVER (ORDER BY pr.rank DESC, pr.doc) AS bucket
            FROM ( {_PR_SUBQUERY} ) pr
            JOIN documents d ON d.doc_id = pr.doc
        ),
        agg AS (
            SELECT bucket,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(CASE bucket WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
                        AS BIGINT) AS weight
            FROM scored GROUP BY bucket
        ),
        rates AS (
            SELECT bucket,
                   LEAST(1.0,
                         100000.0 * weight
                         / CAST(SUM(weight) OVER () AS BIGINT)
                         / n_tokens) AS sample_rate
            FROM agg
        )
        SELECT s.doc, s.bucket, CAST(s.n_tokens AS BIGINT) AS n_tokens,
               r.sample_rate
        FROM scored s JOIN rates r ON r.bucket = s.bucket
        WHERE CAST((s.doc * 2654435761) % 4294967296 AS DOUBLE)
              < r.sample_rate * 4294967296.0
    """,
    doc=(
        "The budget loop CLOSED to actual rows (r10, unsolicited): given "
        "the per-bucket sample rates of q_pagerank_token_budget, emit the "
        "SAMPLED corpus — keep a doc iff its deterministic 32-bit "
        "multiplicative hash (Knuth: (doc * 2654435761) mod 2^32, integer "
        "arithmetic both engines share bit-for-bit, which is what makes "
        "the SAMPLER itself oracle-hashable — production would use "
        "xxhash64 on content) falls under rate * 2^32. Deterministic "
        "hash-threshold sampling is the standard reproducible sampler: "
        "the same doc set is kept on every run, any partitioning, any "
        "engine, and the kept fraction per bucket concentrates at "
        "sample_rate. Scale shape: the rates table is 3 rows "
        "(broadcast-joined), the keep predicate is map-only; the NTILE "
        "upstream is the exact variant's documented single-partition "
        "trade, kept HERE because it is what makes the sampler "
        "oracle-hashable — at true 100 TB run "
        "q_budget_sampled_corpus_approx (r11), the registered twin that "
        "swaps in the fully-parallel approx-percentile buckets."
    ),
    tags=(
        "graph",
        "pagerank",
        "sampling",
        "mixture",
        "composed",
        "llm-pipeline",
    ),
)
def q_budget_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy localCheckpoint: scored is consumed twice (rates aggregate +
    # the keep-side join) — uncut, the PageRank-join-NTILE subtree would
    # run once per consumer
    scored = _budget_scored(spark, sf_dir).localCheckpoint(eager=False)
    rates = _budget_rates(scored).select("bucket", "sample_rate")
    return _hash_threshold_sample(scored, rates)


def _hash_threshold_sample(scored: DataFrame, rates: DataFrame) -> DataFrame:
    """The shared sampler tail: keep a (doc, bucket, n_tokens) row iff its
    deterministic 32-bit multiplicative hash falls under its bucket's
    rate * 2^32. rates is a 3-row (bucket, sample_rate) frame — broadcast;
    the keep predicate is map-only."""
    keep = F.pmod(
        F.col("doc") * F.lit(2654435761), F.lit(4294967296)
    ).cast("double") < F.col("sample_rate") * F.lit(4294967296.0)
    return (
        scored.join(F.broadcast(rates), "bucket")
        .where(keep)
        .select(
            "doc",
            "bucket",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "sample_rate",
        )
    )


@register(
    "q_budget_sampled_corpus_approx",
    oracle=None,  # the approx-percentile buckets are implementation-specific
    # (sketch internals), so the row set is not oracle-reproducible;
    # property-pinned against the EXACT sampler in tests/test_round3_ops.py
    # (identical keep rule given bucket => kept-set symmetric difference
    # bounded by the bucket-assignment drift, which is itself pinned to the
    # sketch's rank error; deterministic across reruns).
    doc=(
        "The 100 TB form of q_budget_sampled_corpus (r11 verdict task #1): "
        "the ROW-EMITTING budget sampler — the query a user actually runs "
        "to materialize the sampled corpus — with the exact variant's "
        "global NTILE replaced by q_pagerank_token_budget_approx's "
        "fully-parallel approx-percentile bucket assignment "
        "(approx_ntile3_buckets: three 1-row sketch aggregates + "
        "NTILE-faithful boundary-tie splitting, zero Windows). The keep "
        "rule is byte-identical to the exact sampler (deterministic Knuth "
        "multiplicative hash under the bucket's rate threshold), so the "
        "kept set differs from the exact sampler ONLY where the sketch "
        "assigns a doc a different bucket — bounded by the sketch's 1e-4 "
        "rank error and property-pinned. This closes the last "
        "single-partition operator on any user-facing 100 TB path (r10 "
        "verdict 'What's wrong'): every stage — PageRank loop, threshold "
        "sketches, rate aggregate, broadcast join, keep filter — is "
        "partition-parallel with map-side partials."
    ),
    tags=(
        "graph",
        "pagerank",
        "sampling",
        "mixture",
        "composed",
        "approx",
        "llm-pipeline",
    ),
)
def q_budget_sampled_corpus_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy localCheckpoint: scored feeds the rates aggregate AND the
    # keep-side join (plus the threshold collects upstream already cut the
    # PageRank lineage at `ranks`)
    scored = _budget_scored_approx(spark, sf_dir).localCheckpoint(eager=False)
    rates = _budget_rates_parallel(scored).select("bucket", "sample_rate")
    return _hash_threshold_sample(scored, rates)


_E2E_SOURCE_CAP = 15  # max docs per source (the fixture's host analog)


def corpus_assembly_stages(
    spark: SparkSession, sf_dir: str
) -> "dict[str, DataFrame]":
    """The full corpus-assembly composition, stage by stage (r11 verdict
    task #4) — returned as named frames so the registered query's output
    (the packed sequences) and the pytest reconciliation pins (per-stage
    row counts) read the SAME plan objects:

      cleaned    — _crawl_cleaned: WARC round trip -> visible-text strip ->
                   mojibake repair -> paragraph dedup -> blocklist/length
                   gates -> exact content dedup  (doc_id, source, t)
      neardeduped— MinHash-LSH near-dup pairs -> connected components ->
                   keep the min-doc representative per cluster
      capped     — per-source anti-domination cap (source ≡ host in this
                   fixture — documents carry no URL column; at 100 TB the
                   key is the WARC target host): deterministic-hash
                   ROW_NUMBER <= _E2E_SOURCE_CAP, host-PARTITIONED window
      scored     — directed PageRank over the link graph, bucketed by the
                   fully-parallel approx-percentile thresholds
                   (approx_ntile3_buckets — zero Windows; the link fixture
                   ranks every page, so the inner join drops nothing:
                   reconciled in the pin test)
      sampled    — per-bucket token-budget rates over the SURVIVING corpus
                   + the deterministic hash-threshold keep rule
      packed     — training sequences via the distributed two-phase prefix
                   scan (operators/prefix.py), 512-token budget
    """
    from pyspark.sql import Window

    from ..operators.dedup import minhash_lsh_pairs, resolve_components
    from ..operators.graph import pagerank_directed
    from ..operators.prefix import running_total

    docs = load(spark, sf_dir, "documents")
    # lazy localCheckpoint: the cleaned corpus feeds BOTH the near-dup pair
    # generation and the survivor anti-join — uncut, the whole WARC+strip
    # chain would run once per consumer
    cleaned = (
        _crawl_cleaned(spark, sf_dir)
        .select("doc_id", "source", "t")
        .localCheckpoint(eager=False)
    )
    pairs = minhash_lsh_pairs(cleaned, threshold=0.8, text_col="t")
    comps = resolve_components(pairs)
    neardeduped = cleaned.join(
        comps.where(F.col("doc") != F.col("rep")).select(
            F.col("doc").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("hkey", "doc_id")
    )
    capped = (
        neardeduped.withColumn(
            "hkey",
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)),
        )
        .withColumn("rn", rn)
        .where(F.col("rn") <= _E2E_SOURCE_CAP)
        .drop("hkey", "rn")
    )
    ranks = pagerank_directed(
        _link_edges(_link_pages(docs)), iterations=5
    ).localCheckpoint(eager=False)
    scored = approx_ntile3_buckets(
        ranks,
        capped.select(
            "doc_id", F.size(F.split(F.col("t"), " ")).alias("n_tokens")
        ),
    ).localCheckpoint(eager=False)  # feeds rates AND the keep-side join
    rates = _budget_rates_parallel(scored).select("bucket", "sample_rate")
    sampled = _hash_threshold_sample(scored, rates)
    shuffled = sampled.select(
        "doc",
        "bucket",
        "n_tokens",
        F.md5(F.col("doc").cast("string")).alias("shuffle_key"),
    )
    running = running_total(
        shuffled, ["shuffle_key", "doc"], "n_tokens", alias="cum",
        # monotone numeric image of the fixed-length hex key (r13) — takes
        # the single-exchange bucketed-scan path in operators/prefix.py
        bucket_expr=F.conv(F.substring("shuffle_key", 1, 15), 16, 10).cast("bigint"),
    )
    budget = 512
    packed = (
        running.withColumn("cum_before", F.col("cum") - F.col("n_tokens"))
        .groupBy(F.expr(f"cum_before DIV {budget}").alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.lit(float(budget))).alias(
                "fill_ratio"
            ),
        )
    )
    return {
        "cleaned": cleaned,
        "neardeduped": neardeduped,
        "capped": capped,
        "scored": scored,
        "sampled": sampled,
        "packed": packed,
    }


@register(
    "q_corpus_assembly_e2e",
    oracle=None,  # the chain composes two declared rows-only components
    # (approx-percentile buckets; MinHash-LSH cluster representatives are
    # oracle-expressible but the composed 6-stage CTE would exceed DuckDB's
    # recursive-CTE budget) — per-stage reconciliation pinned in
    # tests/test_round3_ops.py; every COMPONENT is individually
    # oracle-matched or property-pinned by its own registered query.
    doc=(
        "THE end-to-end corpus-assembly flagship (r11 verdict task #4) — "
        "the single query that demonstrates the engine's reason to exist: "
        "raw synthesized .warc.gz crawl -> record walk -> visible-text "
        "strip -> mojibake repair -> paragraph + exact dedup -> blocklist/"
        "length quality gates (q_crawl_to_corpus's oracle-matched chain) "
        "-> MinHash-LSH near-dup clusters with min-doc representatives "
        "(q_minhash_lsh_neardup + q_neardup_components' operators) -> "
        "per-source anti-domination cap (q_host_capped_sample's "
        "partitioned-window shape) -> PageRank-quality token-budget "
        "sampling with fully-parallel approx buckets "
        "(q_budget_sampled_corpus_approx) -> training-sequence packing "
        "via the distributed prefix scan (q_sequence_packing). Output: "
        "one row per packed 512-token sequence (seq_id, n_docs, "
        "total_tokens, fill_ratio). Scale audit (benched at sf1, "
        "BENCH_sf1.json corpus_assembly_e2e): no new shuffles beyond the "
        "components' own — the stages join on doc_id or broadcast 3-row "
        "rate tables; no data-grain single-partition operator anywhere "
        "(the cap window is source-partitioned, buckets are sketch "
        "thresholds, and packing is the two-phase prefix scan whose only "
        "global window is the O(n_partitions)-row offsets table — the "
        "sanctioned class-(c) shape)."
    ),
    tags=(
        "text",
        "warc",
        "crawl",
        "dedup",
        "sampling",
        "graph",
        "training-prep",
        "composed",
        "flagship",
        "llm-pipeline",
    ),
)
def q_corpus_assembly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_assembly_stages(spark, sf_dir)["packed"]


from ..operators.graph import hits_oracle_sql  # noqa: E402


@register(
    "q_link_hits",
    oracle=hits_oracle_sql(_LINK_EDGES_SQL, iterations=5),
    doc=(
        "Kleinberg HITS over the directed link graph (r9): per-page "
        "authority (how much good hubs point AT you) and hub (how well you "
        "point at good authorities) — the classic complement to PageRank "
        "for crawl-quality weighting (a link farm scores high hub / low "
        "authority, the spam shape PageRank alone can miss). Fixed-point "
        "integer recurrence with per-round MAX-normalization (integer "
        "division — same fixpoint direction as the usual L2 norm but "
        "bit-deterministic on any engine/partitioning), 5 rounds, oracle = "
        "the recurrence unrolled into CTEs. Scale shape: both message "
        "passes ride loop-invariant per-node adjacency lists (one by src, "
        "one by dst) so every join is one-row-per-key — skew-proof like "
        "the r9 PageRank — with two 1-row max broadcasts per round."
    ),
    tags=("graph", "hits", "links", "crawl", "llm-pipeline"),
)
def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits_fixed

    return hits_fixed(
        _link_edges(_link_pages(load(spark, sf_dir, "documents"))), iterations=5
    )


@register(
    "q_link_degree_stats",
    oracle=f"""
        WITH pairs AS ({_LINK_EDGES_SQL}),
        degs AS (
            SELECT 'out' AS direction, src AS doc, COUNT(*) AS deg
            FROM pairs GROUP BY src
            UNION ALL
            SELECT 'in' AS direction, dst AS doc, COUNT(*) AS deg
            FROM pairs GROUP BY dst
        )
        SELECT direction,
               CAST(LENGTH(bin(deg)) - 1 AS BIGINT) AS degree_bucket,
               COUNT(*) AS n_nodes,
               CAST(MIN(deg) AS BIGINT) AS min_deg,
               CAST(MAX(deg) AS BIGINT) AS max_deg
        FROM degs
        GROUP BY direction, degree_bucket
    """,
    doc=(
        "Link-graph degree distribution (r9): per direction, node counts "
        "in power-of-two degree buckets plus each bucket's min/max — the "
        "first thing a graph-pipeline owner reads to size partitioning and "
        "spot power-law hubs (a populated high bucket = hub mass; the "
        "bench_linkgraph_skew probe is the operational response). Bucket = "
        "LENGTH(bin(deg))-1, i.e. floor(log2) computed in INTEGER space — "
        "a float log2 floors differently across engines at power-of-two "
        "boundaries (Spark computes log2 as ln(x)/ln(2)). Two degree "
        "aggregates + one |buckets|-row aggregate; map-side partials "
        "absorb hub in-degree."
    ),
    tags=("graph", "links", "stats", "crawl", "llm-pipeline"),
)
def q_link_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _link_edges(_link_pages(load(spark, sf_dir, "documents")))
    degs = (
        edges.groupBy(F.col("src").alias("doc"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.lit("out").alias("direction"), "doc", "deg")
        .unionAll(
            edges.groupBy(F.col("dst").alias("doc"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .select(F.lit("in").alias("direction"), "doc", "deg")
        )
    )
    return degs.groupBy(
        "direction",
        (F.length(F.bin(F.col("deg"))) - 1).cast("bigint").alias("degree_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("deg").cast("bigint").alias("min_deg"),
        F.max("deg").cast("bigint").alias("max_deg"),
    )


from ..operators.graph import bfs_depth_oracle_sql  # noqa: E402

_SEEDS_SQL = "SELECT doc_id AS doc FROM documents WHERE doc_id < 10"


@register(
    "q_link_crawl_depth",
    oracle=bfs_depth_oracle_sql(_LINK_EDGES_SQL, _SEEDS_SQL, max_hops=30),
    doc=(
        "Crawl depth (r9): minimum hop distance from the seed set (docs "
        "0-9, the 'homepage' analog) along DIRECTED link edges — the third "
        "link-quality signal after PageRank (popularity) and HITS "
        "(hub/authority role); pages deep in the graph are the classic "
        "low-quality tail a mixture owner down-weights, and depth is also "
        "the crawl scheduler's frontier priority. Min-plus propagation to "
        "fixpoint over the skew-proof adjacency layout (one co-partitioned "
        "join + min-aggregation per round, early exit, max_hops=30 runaway "
        "cap), lineage cut per round. Oracle = recursive-CTE reachability "
        "with the SAME hop bound (the bound is what terminates the "
        "recursion on cyclic graphs), MIN(d) per doc. Unreached docs are "
        "absent in both engines."
    ),
    tags=("graph", "links", "crawl", "bfs", "iterative", "llm-pipeline"),
)
def q_link_crawl_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_depth

    docs = load(spark, sf_dir, "documents")
    edges = _link_edges(_link_pages(docs))
    seeds = docs.where(F.col("doc_id") < 10).select(F.col("doc_id").alias("doc"))
    return bfs_depth(edges, seeds, max_hops=30)
