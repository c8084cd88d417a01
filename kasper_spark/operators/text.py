"""Text analysis operators for training-data pipelines.

The reference's only text processing is strings.Split tokenization
(/root/reference/examples/word_count_example.go:32) and Sprintf formatting
(/root/reference/examples/producer_example.go:37); these operators extend
that to the language-ID / quality-scoring / token-counting / fingerprinting
suite a 100 TB corpus pipeline needs.

All operators are pure JVM-side expressions (split/filter/transform/regex) —
no Python in the hot path; each scales linearly with one parquet scan and no
shuffle except final aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.thresholds import corpus_relative_thr
from kasper_spark.lineage import cut_lineage
from kasper_spark.registry import register_query

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Real pipelines plug in fastText/CLD3; the heuristic keeps the
# operator self-contained and oracle-checkable.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}


def _tokens(col):
    return F.filter(F.split(col, " "), lambda w: w != "")


def _marker_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return (
        f"len(list_filter(list_filter(string_split(text, ' '), w -> w <> ''), "
        f"w -> list_contains([{words}], lower(w))))"
    )


def _marker_hits(col, lang: str):
    markers = list(_LANG_MARKERS[lang])
    return F.size(
        F.filter(_tokens(col), lambda w: F.lower(w).isin(markers))
    )


@register_query(
    "text_stats",
    oracle="""
    SELECT
        doc_id,
        length(text) AS n_chars_calc,
        len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
        len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_distinct_words,
        CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS DOUBLE)
            / len(list_filter(string_split(text, ' '), w -> w <> '')) AS ttr
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: char count, word count, vocabulary
    size, type-token ratio. int/int division -> engine-exact doubles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (n_distinct.cast("double") / n_words).alias("ttr"),
    )


@register_query(
    "token_count_regex",
    oracle=r"""
    SELECT
        doc_id,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_tokens,
        len(regexp_extract_all(text, '[0-9]+')) AS n_numeric
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (alpha runs + digit runs). The pattern
    uses only portable regex constructs so Java (Spark) and RE2 (DuckDB)
    agree."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+"), 0)).alias(
            "n_tokens"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0)).alias(
            "n_numeric"
        ),
    )


@register_query(
    "lang_id_heuristic",
    oracle=f"""
    SELECT
        doc_id,
        lang AS labeled_lang,
        CASE
            WHEN {_marker_hits_sql('en')} >= {_marker_hits_sql('es')}
             AND {_marker_hits_sql('en')} >= {_marker_hits_sql('fr')}
             AND {_marker_hits_sql('en')} >= {_marker_hits_sql('de')}
             AND {_marker_hits_sql('en')} > 0 THEN 'en'
            WHEN {_marker_hits_sql('es')} >= {_marker_hits_sql('fr')}
             AND {_marker_hits_sql('es')} >= {_marker_hits_sql('de')}
             AND {_marker_hits_sql('es')} > 0 THEN 'es'
            WHEN {_marker_hits_sql('fr')} >= {_marker_hits_sql('de')}
             AND {_marker_hits_sql('fr')} > 0 THEN 'fr'
            WHEN {_marker_hits_sql('de')} > 0 THEN 'de'
            ELSE 'und'
        END AS predicted_lang
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: count marker-lexicon hits per language,
    argmax with a fixed precedence order (en > es > fr > de), 'und' when no
    markers hit. Deterministic by construction."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    hits = {lang: _marker_hits(text, lang) for lang in _LANG_MARKERS}
    pred = (
        F.when(
            (hits["en"] >= hits["es"])
            & (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["de"])
            & (hits["en"] > 0),
            "en",
        )
        .when((hits["es"] >= hits["fr"]) & (hits["es"] >= hits["de"]) & (hits["es"] > 0), "es")
        .when((hits["fr"] >= hits["de"]) & (hits["fr"] > 0), "fr")
        .when(hits["de"] > 0, "de")
        .otherwise("und")
    )
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


@register_query(
    "quality_score",
    oracle="""
    SELECT
        doc_id,
        n_words,
        mean_word_len,
        CAST(
            0.5 * (CASE WHEN n_words >= 20 THEN 1.0 ELSE n_words / 20.0 END)
          + 0.5 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
        AS DOUBLE) AS quality
    FROM (
        SELECT
            doc_id,
            len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
            CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / len(list_filter(string_split(text, ' '), w -> w <> '')) AS mean_word_len
        FROM documents
    )
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length component + mean-word-length sanity
    band, combined 50/50. All pointwise arithmetic -> engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    length_component = F.when(n_words >= 20, F.lit(1.0)).otherwise(n_words / F.lit(20.0))
    wl_component = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        (0.5 * length_component + 0.5 * wl_component).cast("double").alias("quality"),
    )


@register_query(
    "doc_fingerprint",
    oracle="""
    SELECT
        doc_id,
        md5(text) AS fingerprint,
        substr(md5(text), 1, 2) AS bucket
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting via md5 (portable across engines; the
    rolling-hash winnowing variant lives in minhash_lsh_candidates'
    shingling). The 2-hex-char bucket is the shard key a 100 TB dedup
    pipeline would partition on (256-way, uniform)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 2).alias("bucket")
    )


@register_query(
    "training_data_pipeline",
    oracle="""
    WITH scored AS (
        SELECT
            doc_id, lang, source, text,
            len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
            CAST(
                0.5 * (CASE WHEN len(list_filter(string_split(text, ' '), w -> w <> '')) >= 20
                       THEN 1.0
                       ELSE len(list_filter(string_split(text, ' '), w -> w <> '')) / 20.0 END)
              + 0.5 * (CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                                / len(list_filter(string_split(text, ' '), w -> w <> ''))
                            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
            AS DOUBLE) AS quality
        FROM documents
        WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) > 0
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.75),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(lower(trim(text))) ORDER BY doc_id
            ) AS rn
            FROM kept
        ) WHERE rn = 1
    )
    SELECT
        lang,
        source,
        COUNT(*) AS n_docs,
        CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        CAST(SUM(CAST(quality AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*) AS avg_quality
    FROM deduped
    GROUP BY lang, source
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-training-data pipeline, end to end in ONE logical
    plan: quality scoring -> threshold filter -> exact dedup (deterministic
    keeper per normalized-content digest) -> per-(lang, source) corpus
    stats. Every stage is the operator declared elsewhere (quality_score,
    dedup_exact, token counting) composed declaratively, so Catalyst
    optimizes ACROSS stages — the quality filter prunes before the dedup
    shuffle, the scan reads only (doc_id, lang, source, text).

    At 100 TB: one scan, one shuffle on the 16-byte digest, one shuffle for
    the final small aggregate. The near-dup (MinHash) stage chains after
    this as a candidate-pair join (rows-only — see minhash_lsh_candidates).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    quality = (
        0.5 * F.when(n_words >= 20, F.lit(1.0)).otherwise(n_words / F.lit(20.0))
        + 0.5
        * F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    ).cast("double")

    scored = docs.filter(n_words > 0).select(
        "doc_id", "lang", "source", "text", n_words.alias("n_words"), quality.alias("quality")
    )
    kept = scored.filter(F.col("quality") >= 0.75)

    from pyspark.sql.window import Window

    w = Window.partitionBy(
        F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    ).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        (F.sum(F.col("quality").cast("decimal(10,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_quality"
        ),
    )


@register_query(
    "deterministic_split",
    oracle="""
    WITH h AS (
        SELECT
            doc_id, lang,
            CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '/split-seed-1'), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT
        CASE WHEN bucket < 80 THEN 'train'
             WHEN bucket < 90 THEN 'val'
             ELSE 'test' END AS split,
        COUNT(*) AS n_docs,
        COUNT(DISTINCT lang) AS n_langs
    FROM h
    GROUP BY 1
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (80/10/10) by hashing the
    stable document key — NO RNG, so the split is identical across engines,
    runs, cluster sizes, and repartitions (Spark's sample()/randomSplit()
    are none of those). The md5-prefix construction is portable SQL: both
    engines hash the same string and take the same 32-bit prefix.

    At 100 TB this is a map-only stage: no shuffle to assign, and the
    assignment can be recomputed anywhere from the key alone — the property
    that makes splits auditable long after the pipeline ran."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/split-seed-1"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register_query(
    "ngram_bigram_counts",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (
        SELECT UNNEST(list_transform(
                   range(1, len(words)),
                   i -> words[i] || ' ' || words[i + 1])) AS bigram
        FROM (
            SELECT list_filter(string_split(text, ' '), w -> w <> '') AS words
            FROM documents
        )
    )
    GROUP BY bigram
    HAVING COUNT(*) >= 3
    """,
)
def ngram_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (n-gram language-model counts).

    The bigram list is built per document with map-side array expressions
    (transform over sequence) — NO per-token window/shuffle, so the only
    shuffle is the final partially-aggregated groupBy on the bigram key.
    At 100 TB that matters: a lead()-window formulation would shuffle every
    token; this shuffles one row per distinct bigram per task. The >= 3
    floor is the standard LM count-pruning knob (and keeps output bounded
    by the true high-frequency vocabulary, not corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1), F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )


@register_query(
    "corpus_mix_sample",
    oracle="""
    WITH h AS (
        SELECT
            lang, n_chars,
            CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '/mix-seed-1'), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM h
    WHERE bucket < (CASE WHEN lang = 'en' THEN 40 ELSE 100 END)
    GROUP BY lang
    """,
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: downsample the over-represented
    language (en, ~44% of the corpus) to a 40% keep-rate while keeping the
    rest whole — the rebalancing step every LLM training-data pipeline runs
    before tokenization. Same portable md5-prefix hash as
    deterministic_split (different seed string, so the two decisions are
    independent): NO RNG, map-only assignment, reproducible on any engine,
    partitioning, or rerun — sample()/randomSplit() are none of those.
    At 100 TB the filter drops rows before anything shuffles; the only
    shuffle carries per-language partial aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/mix-seed-1"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(40)).otherwise(F.lit(100))
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("chars_kept"))
    )


@register_query(
    "gopher_quality_filters",
    oracle="""
    WITH words AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        FROM documents
    ),
    wf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM words GROUP BY doc_id, w
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS top_cnt,
               CAST(SUM(c * length(w)) AS BIGINT) AS total_chars
        FROM wf GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_distinct,
           total_chars / n_words AS mean_word_len,
           top_cnt / n_words AS top_word_share,
           1.0 - (n_distinct / n_words) AS dup_word_frac,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND (total_chars / n_words) BETWEEN 3.0 AND 8.0
                      AND (top_cnt / n_words) <= 0.12
                      AND (1.0 - (n_distinct / n_words)) <= 0.95
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM per_doc
    """,
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/length quality gates (the rule family from
    the Gopher/MassiveText and RefinedWeb cleaning pipelines, adapted to
    the testdata's single-line documents): word-count bounds, mean word
    length band, top-word share cap (catches "word word word ..." spam),
    and duplicate-word fraction cap. All four metrics derive from integer
    counts, and every ratio is one bigint/bigint IEEE division — so the
    keep/drop decision is bit-deterministic on any engine or partitioning,
    which is what lets a 100 TB cleaning run be resumed/re-sharded safely.

    One explode + two partial-aggregating shuffles (doc x word, then doc);
    the word-frequency table is the same intermediate the tfidf operator
    uses — in a combined pipeline Catalyst computes it once."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    wf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = wf.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_cnt"),
        F.sum(F.col("c") * F.length("w")).alias("total_chars"),
    )
    mean_wl = F.col("total_chars") / F.col("n_words")
    top_share = F.col("top_cnt") / F.col("n_words")
    dup_frac = F.lit(1.0) - (F.col("n_distinct") / F.col("n_words"))
    keep = (
        F.col("n_words").between(50, 100000)
        & mean_wl.between(3.0, 8.0)
        & (top_share <= 0.12)
        & (dup_frac <= 0.95)
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_distinct",
        mean_wl.alias("mean_word_len"),
        top_share.alias("top_word_share"),
        dup_frac.alias("dup_word_frac"),
        keep.cast("int").alias("keep"),
    )


@register_query(
    "tfidf_top_terms",
    oracle="""
    WITH words AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        FROM documents
    ),
    wf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM words GROUP BY doc_id, w
    ),
    df AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM wf GROUP BY w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id, term, score, rank FROM (
        SELECT wf.doc_id AS doc_id, wf.w AS term,
               (wf.c * (n.n_docs + 1)) / (df.df + 1) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY wf.doc_id
                   ORDER BY (wf.c * (n.n_docs + 1)) / (df.df + 1) DESC, wf.w
               ) AS rank
        FROM wf JOIN df ON wf.w = df.w CROSS JOIN n
    )
    WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a rational tf-idf score
    (tf x (N+1)/(df+1) — the log-free form, monotone in the classic idf for
    a fixed term, and exactly computable: integer multiply then ONE double
    division, so ranking ties break identically on every engine; ln() would
    differ in the last ulp between libm implementations).

    Plan shape at 100 TB: the doc-term frequency table shuffles on
    (doc_id, w); document frequency is a second partial-aggregated shuffle
    on w only; N is a 1-row broadcast (the scalar-subquery form); the final
    rank-limit window runs per doc_id partition with no global sort. The
    df side joins BROADCAST when the vocabulary is small, shuffle-hash when
    it is not — AQE decides from runtime sizes."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    wf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    df = wf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("c") * (F.col("n_docs") + F.lit(1))) / (F.col("df") + F.lit(1))
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc(score), F.asc("w"))
    return (
        wf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            score.alias("score"),
            F.row_number().over(w_rank).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@register_query(
    "text_normalize",
    oracle="""
    SELECT
        doc_id,
        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                ' +', ' ', 'g'))) AS canon_digest,
        length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS canon_len
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization pass before dedup: lowercase -> non-alnum to
    space -> collapse runs -> trim, fingerprinted. This is the
    normalization that decides what 'duplicate' MEANS for every dedup
    operator downstream (exact digest, MinHash shingles, SimHash) — kept
    as its own operator so pipelines share one definition instead of
    drifting. Pure map-side expression work; only the digest (16 B/doc)
    flows onward, never the normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(canon.cast("binary")).alias("canon_digest"),
        F.length(canon).alias("canon_len"),
    )


@register_query(
    "udtf_sentence_split",
    oracle=r"""
    SELECT doc_id,
           CAST(UNNEST(generate_series(1, len(parts))) - 1 AS INTEGER) AS pos,
           UNNEST(parts) AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents)
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) splitting each document into positioned
    sentences via a LATERAL join — the 0..N-outputs-per-input shape of
    kasper's Process() callback (/root/reference/topic_processor.go:101-109
    emits any number of messages per input; SURVEY.md §2.C 'UDTF surface').

    This is the API-surface demo of Spark 4's @udtf; the SCALE path for
    this exact job is the JVM split+posexplode (lateral_posexplode
    operator) — a Python UDTF runs row-at-a-time in a Python worker, so
    reach for it only when the per-row logic genuinely needs Python."""
    import uuid as _uuid

    from pyspark.sql.functions import lit, udtf

    # nested class so cloudpickle ships it by value to foreign-cwd workers
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                yield i, s

    fn = udtf(SentenceSplit, returnType="pos int, sentence string")
    tag = _uuid.uuid4().hex[:10]
    spark.udtf.register(f"sentence_split_{tag}", fn)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView(f"docs_{tag}")
    return spark.sql(
        f"""
        SELECT t.doc_id, s.pos, s.sentence
        FROM docs_{tag} t, LATERAL sentence_split_{tag}(t.text) s
        """
    )


@register_query(
    "stratified_topn_md5",
    oracle="""
    SELECT lang, doc_id, rk
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    WHERE rk <= 3
    ORDER BY lang, rk
    """,
)
def stratified_topn_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-3 documents per language by
    MD5 of the key — a PORTABLE pseudo-random order (md5 hex strings
    compare identically everywhere), so the sampled set is reproducible
    across engines, runs, and cluster layouts. This is how a training-data
    pipeline pins an audit sample per stratum without engine-specific
    rand(seed) semantics (Spark's sampleBy is seed-stable only within
    Spark — no oracle could check it).

    Scale: one shuffle on lang; rank truncation happens inside the window
    so only 3 rows per stratum survive the exchange. For heavy skew (one
    lang = 90% of docs) pre-aggregate with a per-partition top-3 first —
    here row_number is already partial-pushed by Spark's WindowGroupLimit."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("lang", "rk")
    )


@register_query(
    "ngram_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                      i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS shingle
        FROM toks WHERE len(t) >= 4
    ),
    ev AS (
        SELECT shingle, MIN(doc_id) AS eval_doc_id
        FROM sh WHERE doc_id % 41 = 0 GROUP BY shingle
    ),
    tr AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 41 <> 0)
    SELECT t.doc_id,
           COUNT(*) AS n_shared_shingles,
           MIN(e.eval_doc_id) AS min_eval_doc_id
    FROM tr t JOIN ev e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share a word
    n-gram with the evaluation set — the standard guard against test-set
    leakage in LLM training corpora (the operation the reference's engine
    has no analog for; declared under the LLM-pipeline additions). The
    "benchmark" here is the deterministic doc_id % 41 == 0 slice of
    `documents`, standing in for a real eval suite. n=4 is sized to the
    synthetic testdata's vocabulary; production pipelines use 8-13-gram
    windows — the plan shape is identical, only the `n` constant changes.

    Output: one row per contaminated training doc with the count of
    distinct shared shingles and the smallest offending eval doc id.

    Scale shape (the part that matters at 100 TB): the eval side is tiny
    by construction (benchmark suites are KBs-to-MBs vs a 100 TB corpus),
    so it is deduped per shingle and BROADCAST; the training corpus's
    shingles then stream map-side through the broadcast hash join with no
    shuffle of the corpus. Deliberately NO pre-distinct on the training
    shingles — that would shuffle every (doc, shingle) pair; instead the
    join prunes ~everything first and the one real shuffle (groupBy
    doc_id + count distinct) carries only the contaminated survivors.
    The explode stays JVM-side (sequence/transform/slice/concat_ws)."""
    n = 4
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    sh = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)),
                )
            ).alias("shingle"),
        )
    )
    ev = (
        sh.filter(F.col("doc_id") % 41 == 0)
        .groupBy("shingle")
        .agg(F.min("doc_id").alias("eval_doc_id"))
    )
    tr = sh.filter(F.col("doc_id") % 41 != 0)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_shingles"),
            F.min("eval_doc_id").alias("min_eval_doc_id"),
        )
    )


@register_query(
    "dup_ngram_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    g2 AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
                       i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
        FROM toks WHERE len(t) >= 2
    ),
    c2 AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(length(g) AS BIGINT) AS L
        FROM g2 GROUP BY doc_id, g
    ),
    a2 AS (
        SELECT doc_id,
               CAST(SUM(c * L) AS BIGINT) AS occ,
               CAST(SUM(CASE WHEN c > 1 THEN c * L ELSE 0 END) AS BIGINT) AS dup,
               CAST(MAX(c * L) AS BIGINT) AS topm
        FROM c2 GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                       i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
        FROM toks WHERE len(t) >= 3
    ),
    c3 AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(length(g) AS BIGINT) AS L
        FROM g3 GROUP BY doc_id, g
    ),
    a3 AS (
        SELECT doc_id,
               CAST(SUM(c * L) AS BIGINT) AS occ,
               CAST(SUM(CASE WHEN c > 1 THEN c * L ELSE 0 END) AS BIGINT) AS dup,
               CAST(MAX(c * L) AS BIGINT) AS topm
        FROM c3 GROUP BY doc_id
    )
    SELECT a2.doc_id,
           a2.dup / a2.occ AS dup_2gram_char_frac,
           a2.topm / a2.occ AS top_2gram_char_frac,
           COALESCE(a3.dup / a3.occ, 0.0) AS dup_3gram_char_frac,
           COALESCE(a3.topm / a3.occ, 0.0) AS top_3gram_char_frac,
           CAST(CASE WHEN a2.dup / a2.occ <= 0.20
                      AND a2.topm / a2.occ <= 0.15
                      AND COALESCE(a3.dup / a3.occ, 0.0) <= 0.10
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM a2 LEFT JOIN a3 USING (doc_id)
    """,
)
def dup_ngram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram repetition quality signals (the FineWeb/RefinedWeb
    dup_ngram_frac family, complementing gopher_quality_filters' word-level
    gates): per document, the fraction of 2-/3-gram occurrence characters
    that belong to REPEATED n-grams, and the character share of the single
    heaviest n-gram — catching "foo bar foo bar foo bar" template spam that
    word-level duplicate fractions under-count. Char mass (count x n-gram
    length) rather than raw counts, so long repeated phrases weigh more, as
    in FineWeb's char-fraction variants; "heaviest by char mass" replaces
    "most frequent" to keep the metric arg-max-free and therefore
    tie-deterministic on every engine.

    All ratios are bigint/bigint IEEE divisions -> bit-stable keep/drop on
    any engine or partitioning (same resume/re-shard argument as the
    gopher filters).

    Scale: per n-gram size, one explode + two shuffles that partial-
    aggregate map-side ((doc, gram) then doc); the two per-doc aggregates
    join on doc_id where AQE reuses the co-partitioned exchanges. Nothing
    leaves the JVM."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def gram_stats(n: int):
        g = (
            docs.select("doc_id", toks.alias("t"))
            .filter(F.size("t") >= n)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)),
                    )
                ).alias("g"),
            )
        )
        c = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        mass = F.col("c") * F.length("g").cast("long")
        return c.groupBy("doc_id").agg(
            F.sum(mass).alias("occ"),
            F.sum(F.when(F.col("c") > 1, mass).otherwise(F.lit(0))).alias("dup"),
            F.max(mass).alias("topm"),
        )

    a2 = gram_stats(2)
    a3 = gram_stats(3).withColumnsRenamed(
        {"occ": "occ3", "dup": "dup3", "topm": "topm3"}
    )
    joined = a2.join(a3, "doc_id", "left")
    dup2 = F.col("dup") / F.col("occ")
    top2 = F.col("topm") / F.col("occ")
    dup3 = F.coalesce(F.col("dup3") / F.col("occ3"), F.lit(0.0))
    top3 = F.coalesce(F.col("topm3") / F.col("occ3"), F.lit(0.0))
    keep = (dup2 <= 0.20) & (top2 <= 0.15) & (dup3 <= 0.10)
    return joined.select(
        "doc_id",
        dup2.alias("dup_2gram_char_frac"),
        top2.alias("top_2gram_char_frac"),
        dup3.alias("dup_3gram_char_frac"),
        top3.alias("top_3gram_char_frac"),
        keep.cast("int").alias("keep"),
    )


@register_query(
    "vocab_coverage",
    oracle="""
    WITH counts AS (
        SELECT word, COUNT(*) AS cnt
        FROM (
            SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    ),
    ranked AS (
        SELECT
            word,
            cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank,
            CAST(SUM(cnt) OVER (
                ORDER BY cnt DESC, word
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS cum_cnt,
            CAST(SUM(cnt) OVER () AS BIGINT) AS total
        FROM counts
    )
    SELECT
        rank, word, cnt, cum_cnt,
        (cum_cnt * 10000) // total AS coverage_bp
    FROM ranked
    ORDER BY rank
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary rank/frequency coverage table — the tokenizer-design
    question "how many types cover 95% of tokens?" answered in one pass.

    Scale shape: the corpus-sized work is the exploded word count, which is
    partial-aggregated map-side so the shuffle carries only the vocabulary.
    The ranking window is deliberately UNPARTITIONED — that is safe exactly
    because its input is the post-aggregation vocabulary (types, not
    tokens): for natural-language corpora the type count grows ~O(corpus^k)
    with k~0.5 (Heaps' law), so even a 100 TB corpus yields a vocab that
    fits one task. Coverage is reported in integer basis points via exact
    bigint arithmetic (cum*10000 div total), so the hash gate never touches
    a float. (No reference counterpart — corpus analytics beyond word_count
    are engine extensions; SURVEY.md §2.C.)"""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql.window import Window

    order = Window.orderBy(F.desc("cnt"), "word")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = Window.partitionBy()
    ranked = counts.select(
        F.row_number().over(order).alias("rank"),
        "word",
        "cnt",
        F.sum("cnt").over(cum).alias("cum_cnt"),
        F.sum("cnt").over(total).alias("total"),
    )
    return ranked.select(
        "rank",
        "word",
        "cnt",
        "cum_cnt",
        # integer division on BOTH engines (Spark DIV / DuckDB //) — plain
        # `/` would divide in double and the engines round the cast back to
        # integer differently (Spark truncates, DuckDB rounds)
        F.expr("cum_cnt * 10000 DIV total").alias("coverage_bp"),
    ).orderBy("rank")


@register_query(
    "substring_dup_spans",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS start,
               array_to_string(t[i : i + 7], ' ') AS gram
        FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS s(i)
        WHERE len(t) >= 8
    ),
    dup AS (
        SELECT doc_id, start
        FROM grams
        QUALIFY COUNT(*) OVER (PARTITION BY gram) > 1
    ),
    isl AS (
        SELECT doc_id, start,
               CAST(SUM(CASE WHEN prev IS NULL OR start - prev > 8
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS island
        FROM (
            SELECT doc_id, start,
                   LAG(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
            FROM dup
        )
    )
    SELECT
        doc_id,
        CAST(MIN(start) AS BIGINT) AS span_start,
        CAST(MAX(start) + 7 AS BIGINT) AS span_end,
        CAST(MAX(start) + 7 - MIN(start) + 1 AS BIGINT) AS n_tokens
    FROM isl
    GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring SPANS: token positions whose 8-word shingle
    occurs more than once anywhere in the corpus, merged into maximal
    contiguous regions per document — the primitive behind suffix-array
    substring dedup of training corpora (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"), re-expressed as shingle
    counting + gaps-and-islands instead of a suffix array (which is
    inherently sequential and cannot shard across executors).

    Scale shape: everything until the final island merge is JVM
    expressions — split/slice/concat_ws build the shingles map-side, the
    duplicate test is one count-per-gram shuffle (partial-aggregated), and
    island merging re-shuffles only the surviving duplicate positions by
    doc_id. At 100 TB the gram strings would be xxhash64'd to 8 bytes
    before the exchange (collision odds ~n^2/2^64 are acceptable for span
    FLAGGING; the strings are kept here so the DuckDB oracle can replay the
    exact grouping). The reference has no corpus operators at all
    (SURVEY.md §2.C)."""
    k = 8
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("t"),
    ).filter(F.size("t") >= k)
    grams = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t") - k + 1)).alias("start"),
        "t",
    ).select(
        "doc_id",
        "start",
        F.concat_ws(" ", F.slice("t", F.col("start"), k)).alias("gram"),
    )
    from pyspark.sql.window import Window

    dup = grams.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    ).filter(F.col("n") > 1)
    by_doc = Window.partitionBy("doc_id").orderBy("start")
    run = by_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = dup.withColumn("prev", F.lag("start").over(by_doc)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("start") - F.col("prev") > k),
                1,
            ).otherwise(0)
        ).over(run),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("bigint").alias("span_start"),
            (F.max("start") + k - 1).cast("bigint").alias("span_end"),
            (F.max("start") + k - 1 - F.min("start") + 1)
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select("doc_id", "span_start", "span_end", "n_tokens")
        .orderBy("doc_id", "span_start")
    )


@register_query(
    "unigram_rarity_quality",
    oracle="""
    WITH words AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        FROM documents
    ),
    cf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM words GROUP BY w
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM words)
    SELECT
        words.doc_id AS doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(cf.cf) AS BIGINT) AS sum_cf,
        CAST(SUM(cf.cf) AS DOUBLE) / (COUNT(*) * ANY_VALUE(total.t)) AS mean_token_prob
    FROM words JOIN cf ON words.w = cf.w CROSS JOIN total
    GROUP BY words.doc_id
    """,
)
def unigram_rarity_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram probability under the corpus's own
    unigram distribution — the rare-token-soup detector: OCR garbage,
    boilerplate code dumps, and non-prose documents score near the corpus
    floor, while fluent text sits near the token-frequency mean. The
    standard curation form is a unigram-LM cross-entropy; this is the
    log-free rational equivalent (same tfidf_top_terms reasoning: ln()
    differs in the last ulp between libm implementations, while an integer
    sum + ONE double division is engine-exact and
    partitioning-independent).

    mean_token_prob(d) = (1/|d|) * sum over token instances of cf(w)/T
                       = sum_cf / (n_words * T)

    Scale shape: tokens partial-aggregate into per-(doc, word) counts, the
    corpus frequency table cf is a second partial-aggregated shuffle on w
    (vocabulary-sized), and T is a 1-row broadcast. The tokens-to-cf join
    broadcasts when the vocabulary is small and shuffle-hashes otherwise
    (AQE decides) — identical topology to tfidf_top_terms, whose
    intermediates Catalyst shares in a combined pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    wf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    cf = wf.groupBy("w").agg(F.sum("c").alias("cf"))
    total = wf.agg(F.sum("c").alias("t"))
    per_doc = (
        wf.join(cf, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("cf")).alias("sum_cf"),
        )
    )
    return per_doc.crossJoin(total).select(
        "doc_id",
        "n_words",
        "sum_cf",
        (F.col("sum_cf").cast("double") / (F.col("n_words") * F.col("t"))).alias(
            "mean_token_prob"
        ),
    )


_PACK_BUDGET = 512  # tokens per training sequence (demo budget)


@register_query(
    "pack_sequences_by_source",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tok
        FROM toks
    ),
    assigned AS (
        SELECT source, (cum_tok - n_tok) // {_PACK_BUDGET} AS seq_id, n_tok
        FROM cum
    )
    SELECT
        source,
        CAST(seq_id AS BIGINT) AS seq_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        CAST(SUM(n_tok) AS DOUBLE) / {_PACK_BUDGET} AS fill_ratio
    FROM assigned
    GROUP BY source, seq_id
    ORDER BY source, seq_id
    """,
)
def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training-batch preparation: concatenate
    documents (in stable doc_id order, within their source shard) into
    fixed-token-budget training sequences, reporting per-sequence doc
    count, token count and fill ratio — the step that turns a cleaned
    corpus into dense fixed-length training rows without RNG.

    Assignment rule: a doc starts in the sequence its cumulative-token
    PREFIX falls into — seq_id = (cum_tok - n_tok) div budget. This is the
    streaming/greedy concatenation rule (docs can straddle a boundary;
    fill_ratio ~1 except each shard's tail), and it is a pure function of
    (source, doc_id, n_tok): deterministic across partitionings and
    engines, no RNG, re-runnable for exact reproduction of a training run.

    Scale: the window is PARTITION BY source — each shard's running sum is
    independent, so the plan is one hash-partition by source + an in-order
    scan per shard (WindowExec, no global ordering, no single-partition
    bottleneck; at 100 TB sources are further split into shard keys and
    sequences numbered (shard, seq_id)). Everything is JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tok")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = toks.select(
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _PACK_BUDGET).alias(
            "seq_id"
        ),
    )
    return (
        assigned.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.sum("n_tok").cast("double") / _PACK_BUDGET).alias("fill_ratio"),
        )
        .select(
            "source",
            F.col("seq_id").cast("bigint").alias("seq_id"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_tokens",
            "fill_ratio",
        )
        .orderBy("source", "seq_id")
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (round 8)
# ---------------------------------------------------------------------------

_BOILER_N = 4  # shingle width
_BOILER_DF = 3  # a shingle in >= this many distinct docs is boilerplate


@register_query(
    "boilerplate_shingle_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - {_BOILER_N - 2}),
                      i -> array_to_string(list_slice(t, i, i + {_BOILER_N - 1}), ' ')))
                   AS shingle
        FROM toks WHERE len(t) >= {_BOILER_N}
    ),
    df AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
        FROM sh GROUP BY shingle
    ),
    per_doc AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
               CAST(COUNT(*) FILTER (WHERE df.df >= {_BOILER_DF}) AS BIGINT)
                   AS n_boiler_shingles
        FROM sh s JOIN df USING (shingle)
        GROUP BY s.doc_id
    )
    SELECT doc_id, n_distinct_shingles, n_boiler_shingles,
           CAST(n_boiler_shingles AS DOUBLE)
               / CAST(n_distinct_shingles AS DOUBLE) AS boiler_ratio,
           (CAST(n_boiler_shingles AS DOUBLE)
               / CAST(n_distinct_shingles AS DOUBLE)) < 0.5 AS kept
    FROM per_doc
    """,
)
def boilerplate_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document boilerplate detection — the C4-style cleaning signal
    that catches headers/footers/navigation text repeated across a crawl:
    a 4-gram shingle occurring in >= 3 DISTINCT documents is boilerplate;
    each document reports how much of its distinct-shingle mass is
    boilerplate and whether it survives a 50% gate. Complements
    dup_ngram_quality (INTRA-doc repetition) — together they are the two
    repetition axes a corpus cleaner filters on.

    Cross-engine exactness: counts are integers; the ratio is one
    exact-int double division (both counts < 2^53), bit-identical.

    Scale: this is the one round-8 operator whose shuffle grows with total
    shingle volume — (doc, shingle) distinct + groupBy(shingle) + a
    shingle-keyed self join. That is the honest cost of exact global DF;
    at 100 TB the standard cheapening is a count-min prefilter (see
    countmin_heavy_hitters) so only candidate-heavy shingles take the
    exact path — same two-stage discipline as ngram_decontaminate_bloom.
    Per-doc re-aggregation shuffles on doc_id once."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    sh = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _BOILER_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (_BOILER_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _BOILER_N)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        sh.join(df_t, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_shingles"),
            F.sum(F.when(F.col("df") >= _BOILER_DF, 1).otherwise(0))
            .cast("long")
            .alias("n_boiler_shingles"),
        )
    )
    ratio = F.col("n_boiler_shingles").cast("double") / F.col(
        "n_distinct_shingles"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "n_distinct_shingles",
        "n_boiler_shingles",
        ratio.alias("boiler_ratio"),
        (ratio < 0.5).alias("kept"),
    )


_BOILER_CMS_D = 4  # count-min depth (independent hash rows)
_BOILER_CMS_W = 1 << 16  # count-min width (buckets per row)


@register_query(
    "boilerplate_shingle_stats_cms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - {_BOILER_N - 2}),
                      i -> array_to_string(list_slice(t, i, i + {_BOILER_N - 1}), ' ')))
                   AS shingle
        FROM toks WHERE len(t) >= {_BOILER_N}
    ),
    nd AS (
        SELECT GREATEST(CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) // 1000)
            AS thr
        FROM documents
    ),
    df AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
        FROM sh GROUP BY shingle
    ),
    per_doc AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
               CAST(COUNT(*) FILTER (WHERE df.df >= (SELECT thr FROM nd))
                    AS BIGINT) AS n_boiler_shingles
        FROM sh s JOIN df USING (shingle)
        GROUP BY s.doc_id
    )
    SELECT doc_id, n_distinct_shingles, n_boiler_shingles,
           CAST(n_boiler_shingles AS DOUBLE)
               / CAST(n_distinct_shingles AS DOUBLE) AS boiler_ratio,
           (CAST(n_boiler_shingles AS DOUBLE)
               / CAST(n_distinct_shingles AS DOUBLE)) < 0.5 AS kept
    FROM per_doc
    """,
)
def boilerplate_shingle_stats_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """boilerplate_shingle_stats' 100 TB path: a COUNT-MIN PREFILTER in
    front of the exact global document-frequency pass — the round-8
    verdict's named cheapening (the bloom-decontaminate discipline of
    curation.py: a sketch prunes, an exact pass decides, output provably
    exact).

    Why it is exact: count-min NEVER underestimates (Cormode &
    Muthukrishnan 2005), so {{shingles with est >= thr}} is a SUPERSET of
    the true boilerplate set, and est is a pure function of the shingle —
    the filter keeps either ALL rows of a shingle or none. The exact
    GROUP BY over the survivors therefore sees every occurrence of every
    candidate and computes its TRUE df; false positives die there. The
    oracle is the NAIVE spec — exact df over all shingles — and the hash
    match certifies the rewrite end to end.

    Gate: thr = max(3, n_docs/1000) — corpus-RELATIVE, the C4-style rule
    (at the driver's 500-doc scale this equals boilerplate_shingle_stats'
    absolute df>=3 gate, so the two ops are output-identical there). A
    fixed absolute df gate stops meaning "cross-crawl boilerplate" the
    moment the corpus grows; relative df also keeps the prefilter's
    selectivity scale-stable.

    Plan shape (vs the exact op's full-volume shingle shuffle):
    - sh dedups per-doc shingles MAP-SIDE (array_distinct before explode;
      the exact op's global .distinct() shuffle is unnecessary — duplicate
      (doc, shingle) pairs only arise within one document);
    - the sketch is built like countmin_heavy_hitters: per-task partial
      aggregation over (depth, cell) IS the local sketch; at most D*W =
      256k counter rows cross the wire regardless of corpus size, built
      once (cut_lineage) and broadcast as D bounded hash-join sides;
    - est = least(D broadcast-hash-join lookups) is ROW-LOCAL — the
      corpus-volume shingle stream is never shuffled unless it survives
      the gate;
    - only survivors (the df tail above thr's neighborhood; ~0.5-3% of
      distinct shingles on this corpus) pay the exact GROUP BY, and the
      final heavy set is broadcast back for the per-doc counts.
    Shuffles that scale with corpus size: the per-doc groupBy(doc_id)
    only. Everything else is bounded by W or by the true boilerplate
    volume."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    shingles_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (_BOILER_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _BOILER_N)),
        )
    )
    # materialized once (round-15 opt): THREE subtrees consume the
    # shingle stream (the sketch build, the probe pass, the per-doc
    # counts) — each re-ran the scan+tokenize+explode before the cut
    sh = cut_lineage(
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _BOILER_N)
        .select("doc_id", F.explode(shingles_arr).alias("shingle"))
    )

    def cell(d: int):  # bucket of `shingle` under hash row d
        return F.pmod(
            F.xxhash64(F.lit(d), F.col("shingle")), F.lit(_BOILER_CMS_W)
        ).cast("long")

    # Build the sketch ONCE and materialize it (cut_lineage): the counter
    # table is bounded at D*W rows by construction, and the 4 per-depth
    # broadcast sides below would otherwise each re-run the full
    # scan+explode+aggregate build. NOT a single-row map: Spark's MapData
    # is array-backed, so element_at on a 262k-entry map is a LINEAR scan
    # per lookup — measured 80 s at sf0.1 for what these hash joins do in
    # ~2 s. BroadcastHashJoin gives the O(1) probe a CM sketch needs.
    cells = cut_lineage(
        sh.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.lit(d * _BOILER_CMS_W) + cell(d)).alias("k")
                        )
                        for d in range(_BOILER_CMS_D)
                    ]
                )
            ).alias("dc")
        )
        .groupBy("dc.k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # corpus-relative boilerplate floor (this operator pioneered the
    # rule; since round 12 it flows through the shared helper so every
    # adopter computes GREATEST(floor, N // div) identically)
    thr_row = corpus_relative_thr(docs, 3, 1000)

    # est = least over the D depth-row counters, computed ROW-LOCALLY via
    # D broadcast HASH joins (inner joins are safe: every probed bucket
    # holds at least the row's own contribution).
    probed = sh.select(
        "doc_id",
        "shingle",
        *[(F.lit(d * _BOILER_CMS_W) + cell(d)).alias(f"k{d}") for d in range(_BOILER_CMS_D)],
    )
    for d in range(_BOILER_CMS_D):
        side = cells.filter(
            (F.col("k") >= d * _BOILER_CMS_W) & (F.col("k") < (d + 1) * _BOILER_CMS_W)
        ).select(F.col("k").alias(f"k{d}"), F.col("cnt").alias(f"n{d}"))
        probed = probed.join(F.broadcast(side), f"k{d}")
    est = F.least(*[F.col(f"n{d}") for d in range(_BOILER_CMS_D)])
    cand = (
        probed.crossJoin(F.broadcast(thr_row))
        .filter(est >= F.col("thr"))
        .select("doc_id", "shingle", "thr")
    )
    heavy = (
        cand.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"), F.first("thr").alias("thr"))
        .filter(F.col("df") >= F.col("thr"))
        .select("shingle", F.lit(1).alias("is_boiler"))
    )
    per_doc = (
        sh.join(F.broadcast(heavy), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_shingles"),
            F.count("is_boiler").cast("long").alias("n_boiler_shingles"),
        )
    )
    ratio = F.col("n_boiler_shingles").cast("double") / F.col(
        "n_distinct_shingles"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "n_distinct_shingles",
        "n_boiler_shingles",
        ratio.alias("boiler_ratio"),
        (ratio < 0.5).alias("kept"),
    )


_CHI2_V = 256  # top-V vocabulary: the bounded multinomial the test runs over


@register_query(
    "chi2_source_divergence",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT source, u.w AS word
        FROM (
            SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS ws
            FROM documents
        ), UNNEST(ws) AS u(w)
    ),
    counts AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cw
        FROM toks GROUP BY word
    ),
    topv AS MATERIALIZED (
        SELECT word, cw FROM counts
        ORDER BY cw DESC, word LIMIT {_CHI2_V}
    ),
    big_n AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM topv),
    obs AS MATERIALIZED (
        SELECT t.source, t.word, CAST(COUNT(*) AS BIGINT) AS o
        FROM toks t JOIN topv v ON v.word = t.word
        GROUP BY t.source, t.word
    ),
    src AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS ns FROM obs GROUP BY source
    ),
    grid AS (
        SELECT s.source, s.ns, v.word, v.cw, COALESCE(ob.o, 0) AS o
        FROM src s
        CROSS JOIN topv v
        LEFT JOIN obs ob ON ob.source = s.source AND ob.word = v.word
    ),
    terms AS (
        -- (o*N - ns*cw)^2 / (ns*cw*N): the numerator difference is exact
        -- int64 (<= ~1e12 here; widen to DECIMAL past ~sf100), the square
        -- and denominator run in IEEE doubles with identical association
        -- on both engines, and each term is quantized once to
        -- DECIMAL(38,12) so the per-source sum is order-independent
        SELECT g.source, g.ns,
               CAST(
                   (CAST(g.o * b.n - g.ns * g.cw AS DOUBLE)
                    * CAST(g.o * b.n - g.ns * g.cw AS DOUBLE))
                   / (CAST(g.ns AS DOUBLE) * CAST(g.cw AS DOUBLE)
                      * CAST(b.n AS DOUBLE))
               AS DECIMAL(38,12)) AS term
        FROM grid g, big_n b
    )
    SELECT source, ns AS n_topv_tokens,
           CAST(CAST(SUM(term) AS DECIMAL(38,12)) AS DOUBLE) AS chi2
    FROM terms
    GROUP BY source, ns
    """,
)
def chi2_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-drift test: chi-square divergence between each
    source's unigram distribution and the whole-corpus distribution over
    the top-{_CHI2_V} vocabulary — the statistic a data-mixing pipeline
    watches to catch a feed whose language suddenly shifts (scraper
    breakage, template flood, domain drift). KL needs ln (not bit-portable
    across libm builds — see quality_classifier_logit); Pearson chi-square
    is the standard drift test that stays in +,*,/ — every term is
    (o*N - ns*cw)^2/(ns*cw*N) with an EXACT integer numerator difference,
    identical IEEE double association on both engines, and a one-time
    DECIMAL(38,12) quantization so the sum is partition-order-independent.
    Overflow bound: the BIGINT difference needs ns*cw < 2^63 — holds to
    ~3e9 top-V token occurrences; shard by time window past that (the
    drift test is windowed in production anyway).

    Scale: tokenize is map-side; two word-keyed groupBys (corpus counts,
    per-source counts) are the only corpus-sized shuffles — both partial-
    aggregated. The top-V vocabulary is a TakeOrdered (map-side top-k, no
    global sort), and the S x V expected-frequency grid (sources x 256) is
    assembled from broadcasts — constant-sized no matter the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("word")
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cw"))
    topv = counts.orderBy(F.desc("cw"), F.asc("word")).limit(_CHI2_V)
    big_n = topv.agg(F.sum("cw").alias("n"))
    obs = (
        toks.join(F.broadcast(topv.select("word")), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    src = obs.groupBy("source").agg(F.sum("o").alias("ns"))
    grid = (
        src.crossJoin(F.broadcast(topv))
        .join(obs, ["source", "word"], "left")
        .select(
            "source",
            "ns",
            "word",
            "cw",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
        .crossJoin(F.broadcast(big_n))
    )
    diff = (F.col("o") * F.col("n") - F.col("ns") * F.col("cw")).cast("double")
    term = (
        (diff * diff)
        / (
            F.col("ns").cast("double")
            * F.col("cw").cast("double")
            * F.col("n").cast("double")
        )
    ).cast("decimal(38,12)")
    return (
        grid.select("source", "ns", term.alias("term"))
        .groupBy("source", "ns")
        .agg(F.sum("term").cast("decimal(38,12)").cast("double").alias("chi2"))
        .select(
            "source", F.col("ns").alias("n_topv_tokens"), "chi2"
        )
    )


from kasper_spark.registry import ORACLES as _ORACLES  # noqa: E402


@register_query(
    "lang_id_confusion",
    oracle=None,  # bound below: reuses the heuristic's own oracle as a CTE
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-lexicon language ID against the gold
    `lang` labels: per (labeled, predicted) cell, the count, the gold
    class size, and the cell's share of its gold class (the diagonal
    share IS per-class recall). The model-evaluation audit every
    lang-filtered corpus build runs before trusting the filter.

    Exactness: counts are integers; shares are exact-int double divisions.
    Scale: one pass over the corpus computes predictions map-side (the
    heuristic is pure string expressions), then a partial-agg groupBy
    collapses to a |langs|^2 grid; the share window runs on the grid."""
    from pyspark.sql.window import Window

    pred = lang_id_heuristic(spark, sf_dir)
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n",
        F.sum("n").over(w).cast("long").alias("n_labeled"),
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "class_share"
        ),
    )


assert "lang_id_heuristic" in _ORACLES, "lang-ID oracle missing"
_ORACLES["lang_id_confusion"] = f"""
    WITH pred AS ({_ORACLES["lang_id_heuristic"]}),
    cells AS (
        SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY labeled_lang, predicted_lang
    )
    SELECT labeled_lang, predicted_lang, n,
           CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT) AS n_labeled,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS DOUBLE)
               AS class_share
    FROM cells
"""


_KS_QUALITY_BODY = """
    q AS (
        SELECT doc_id, source,
               0.5 * (CASE WHEN n_words >= 20 THEN 1.0 ELSE n_words / 20.0 END)
             + 0.5 * (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
                 AS quality
        FROM (
            SELECT doc_id, source,
                   len(list_filter(string_split(text, ' '), w -> w <> ''))
                       AS n_words,
                   CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / len(list_filter(string_split(text, ' '), w -> w <> ''))
                       AS mwl
            FROM documents
        )
    ),
    counts AS (
        SELECT source, quality, CAST(COUNT(*) AS BIGINT) AS c
        FROM q GROUP BY source, quality
    ),
    grid AS (
        SELECT s.source, v.quality, COALESCE(c.c, 0) AS c
        FROM (SELECT DISTINCT source FROM q) s
        CROSS JOIN (SELECT DISTINCT quality FROM q) v
        LEFT JOIN counts c ON c.source = s.source AND c.quality = v.quality
    ),
    cums AS (
        SELECT source, quality,
               CAST(SUM(c) OVER (PARTITION BY source ORDER BY quality
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_s,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_s,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM grid
    ),
    diffs AS (
        -- cum over ALL sources at this quality = one window per (quality)
        -- boundary; recompute it cleanly from a per-quality aggregate
        SELECT g.source, g.quality, g.cum_s, g.n_s, a.cum_all, g.n,
               abs(g.cum_s * (g.n - g.n_s)
                   - (a.cum_all - g.cum_s) * g.n_s) AS d_int
        FROM cums g
        JOIN (
            SELECT quality,
                   CAST(SUM(cum_s) AS BIGINT) AS cum_all
            FROM cums GROUP BY quality
        ) a ON a.quality = g.quality
    )
    SELECT source, n_docs, ks_stat, ks_at_quality FROM (
        SELECT source,
               n_s AS n_docs,
               CAST(d_int AS DOUBLE) / CAST(n_s * (n - n_s) AS DOUBLE)
                   AS ks_stat,
               quality AS ks_at_quality,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY d_int DESC, quality ASC
               ) AS rn
        FROM diffs
    ) WHERE rn = 1
"""


@register_query(
    "ks_quality_drift_by_source",
    oracle=f"""
    WITH {_KS_QUALITY_BODY}
    """,
)
def ks_quality_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test per source: each
    source's quality-score distribution vs the REST of the corpus —
    KS = max_t |F_source(t) - F_rest(t)| — the distribution-shape
    complement to the chi-square vocabulary test (chi2_source_divergence
    sees token drift; this sees quality-profile drift even when the
    vocabulary is stable). Output: per source, its KS statistic and the
    quality value where the gap peaks (where to look).

    Exactness trick: the CDF comparison never touches floats —
    |F1 - F2| = |cum_s*(N - N_s) - cum_rest*N_s| / (N_s*(N - N_s)), and
    the numerator is PURE BIGINT, so the max is an integer comparison and
    only the final reported statistic is one exact-int double division.
    Overflow bound: cum*(N - N_s) < 2^63 needs N < ~3e9 docs; shard the
    drift test by time window past that (the production shape anyway).

    Scale: per-(source, value) counts partial-aggregate map-side; the
    zero-filled grid is |sources| x |distinct quality values| (both
    bounded by construction — quality is a banded score, not raw data),
    so the cumulative windows and argmax run on a grid, not on documents."""
    from pyspark.sql.window import Window

    # quality inline (the quality_score expressions verbatim) with source
    # carried from the SAME scan — joining the certified query back on
    # doc_id would replay a 33-exchange doc_id join per reuse of qs
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    length_component = F.when(n_words >= 20, F.lit(1.0)).otherwise(
        n_words / F.lit(20.0)
    )
    wl_component = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    qs = docs.select(
        "source",
        (0.5 * length_component + 0.5 * wl_component).cast("double").alias("quality"),
    )
    # all three derivations below re-scan qs map-side; materialize the tiny
    # (source, quality) count grid once instead of thrice
    counts = (
        qs.groupBy("source", "quality")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(cut_lineage)
    )
    sources = counts.select("source").distinct()
    values = counts.select("quality").distinct()
    grid = (
        sources.crossJoin(F.broadcast(values))
        .join(counts, ["source", "quality"], "left")
        .select(
            "source", "quality", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
        )
    )
    w_run = Window.partitionBy("source").orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_src = Window.partitionBy("source")
    cums = grid.select(
        "source",
        "quality",
        F.sum("c").over(w_run).cast("long").alias("cum_s"),
        F.sum("c").over(w_src).cast("long").alias("n_s"),
    )
    n_all = (
        grid.groupBy()
        .agg(F.sum("c").cast("long").alias("n"))
    )
    cum_all = cums.groupBy("quality").agg(
        F.sum("cum_s").cast("long").alias("cum_all")
    )
    diffs = (
        cums.join(F.broadcast(cum_all), "quality")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "quality",
            "n_s",
            "n",
            F.abs(
                F.col("cum_s") * (F.col("n") - F.col("n_s"))
                - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
            ).alias("d_int"),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("d_int"), F.asc("quality")
    )
    return (
        diffs.select(
            "source",
            F.col("n_s").alias("n_docs"),
            (
                F.col("d_int").cast("double")
                / (F.col("n_s") * (F.col("n") - F.col("n_s"))).cast("double")
            ).alias("ks_stat"),
            F.col("quality").alias("ks_at_quality"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register_query(
    "source_ngram_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               unnest(list_transform(range(1, len(t) - {_BOILER_N - 2}),
                      i -> array_to_string(list_slice(t, i, i + {_BOILER_N - 1}), ' ')))
                   AS shingle
        FROM toks WHERE len(t) >= {_BOILER_N}
    ),
    sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles
        FROM sh GROUP BY source
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_shared,
           sa.n_shingles AS n_a, sb.n_shingles AS n_b,
           CAST(i.n_shared AS DOUBLE)
               / CAST(sa.n_shingles + sb.n_shingles - i.n_shared AS DOUBLE)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source x source content overlap at the 4-GRAM grain — the finer
    sibling of cross_source_dup_matrix (digest grain): two crawls that
    share boilerplate, templates, or partially-copied articles overlap in
    shingles long before whole documents collapse to one digest. Reports
    shared distinct shingles and the exact shingle-set Jaccard per source
    pair — the "how redundant are these two feeds really" number behind a
    drop-one-source decision.

    Cross-engine exactness: set sizes and intersections are exact BIGINTs
    from DISTINCT counts; Jaccard = inter / (|A| + |B| - inter) is one
    exact-int double division.

    Scale: per-doc shingle dedup is map-side (array_distinct before
    explode); the (shingle, source) DISTINCT is the one honest
    shingle-volume shuffle; the self-join then carries ONE row per
    (shingle, source) — a shingle in s sources costs s(s-1)/2 pair rows
    with s bounded by the source count, never document-pair blowup. At
    100 TB the count-min prefilter of boilerplate_shingle_stats_cms
    composes in front unchanged (only multi-source shingles matter, and
    CM over-counts never drop one)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    shingles_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (_BOILER_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _BOILER_N)),
        )
    )
    sh = (
        docs.select("source", toks.alias("t"))
        .filter(F.size("t") >= _BOILER_N)
        .select("source", F.explode(shingles_arr).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM surprisal (whole-bit perplexity proxy)
# ---------------------------------------------------------------------------

_SURPRISAL_TOPK = 20


@register_query(
    "bigram_lm_surprisal",
    oracle=f"""
    WITH bg AS MATERIALIZED (
        SELECT doc_id, u.b AS bigram, string_split(u.b, ' ')[1] AS prefix
        FROM (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1]
                   ) AS bgs
            FROM (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), w -> w <> '') AS toks
                FROM documents
            )
        ), UNNEST(bgs) AS u(b)
    ),
    model AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY bigram
    ),
    prefixes AS (
        SELECT prefix, CAST(COUNT(*) AS BIGINT) AS c_a
        FROM bg GROUP BY prefix
    ),
    scored AS (
        SELECT m.bigram,
               CAST(length(bin(p.c_a // m.c_ab)) - 1 AS BIGINT) AS bits
        FROM model m JOIN prefixes p ON p.prefix = string_split(m.bigram, ' ')[1]
    ),
    per_doc AS (
        SELECT bg.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(s.bits) AS BIGINT) AS total_bits
        FROM bg JOIN scored s ON s.bigram = bg.bigram
        GROUP BY bg.doc_id
    )
    SELECT doc_id, n_bigrams, total_bits,
           CAST(total_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_bits
    FROM per_doc
    ORDER BY avg_bits DESC, doc_id
    LIMIT {_SURPRISAL_TOPK}
    """,
)
def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprisal scoring — the perplexity-proxy
    quality filter (CCNet/KenLM discipline: rank documents by how
    surprised a corpus-trained LM is; gibberish, boilerplate-free noise
    and OCR junk float to the top). The LM is the corpus's own bigram
    table; a bigram's surprisal is the WHOLE-BIT information content
    floor(log2(c(a.)/c(ab))) = length(bin(c_a div c_ab)) - 1 — computed
    entirely in integer arithmetic (bin() renders the same bits on both
    engines), because float log2 is a libm call whose last ulp is not
    bit-portable. Emits the {_SURPRISAL_TOPK} most-surprising documents
    (total/avg bits per bigram).

    Scale shape: bigrams are a scan-stage array transform (no
    posexplode-join); the model is two partial-aggregated groupBys
    (bigram counts, prefix counts) joined model-side so per-bigram bits
    are computed ONCE per distinct bigram; docs then join the model on
    the bigram key — one shuffle each side, key-partitioned, the
    standard distributed LM-scoring plan. Top-k via
    TakeOrderedAndProject, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    bg = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            )
        ).alias("bigram"),
    ).select(
        "doc_id",
        "bigram",
        F.element_at(F.split(F.col("bigram"), " "), 1).alias("prefix"),
    )
    model = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    prefixes = bg.groupBy("prefix").agg(
        F.count(F.lit(1)).cast("long").alias("c_a")
    )
    scored = model.select(
        "bigram",
        F.element_at(F.split(F.col("bigram"), " "), 1).alias("prefix"),
        "c_ab",
    ).join(prefixes, "prefix").select(
        "bigram",
        (
            F.length(F.bin(F.expr("c_a div c_ab"))) - 1
        ).cast("long").alias("bits"),
    )
    per_doc = (
        bg.join(scored, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_bigrams",
            "total_bits",
            (
                F.col("total_bits").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_bits"),
        )
        .orderBy(F.desc("avg_bits"), F.asc("doc_id"))
        .limit(_SURPRISAL_TOPK)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility audit (round 10)
# ---------------------------------------------------------------------------

# Disjoint-class alternation ONLY: [letters]+ | [digits]+ | [other]+ never
# overlap, so leftmost-first (Java regex) and RE2 (DuckDB) tokenize
# identically — parity verified; an overlapping alternation (e.g. GPT-2's
# contraction rules) would hinge on engine-specific alternation semantics.
_BPEISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@register_query(
    "tokenizer_fertility_stats",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> '')))
                AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPEISH_RE}')))
                AS BIGINT) AS re_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPEISH_RE}'))) AS DOUBLE)
               / CAST(SUM(len(list_filter(string_split(text, ' '),
                                          w -> w <> ''))) AS DOUBLE)
               AS fertility,
           CAST(SUM(n_chars) AS DOUBLE)
               / CAST(SUM(len(regexp_extract_all(text, '{_BPEISH_RE}')))
                      AS DOUBLE) AS chars_per_token
    FROM documents
    GROUP BY source
    """,
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source — the budgeting metric every
    training run needs BEFORE tokenizing 100 TB: how many model tokens a
    corpus slice will cost. Two token counts per document, both
    scan-stage: whitespace words and a BPE-ish regex tokenization
    (disjoint letter/digit/punctuation runs — the pre-tokenization pass
    real BPE applies before merges). fertility = regex tokens per word
    (punctuation-heavy or code-like sources read high); chars_per_token
    is the compression proxy tokenizer reports quote. Both ratios are one
    double division of exact BIGINT sums.

    Scale: pure map + one per-source partial aggregate — no shuffle of
    document text, only of per-source counters."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
    re_toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPEISH_RE), 0))
    return (
        docs.select(
            "source",
            ws.cast("long").alias("ws"),
            re_toks.cast("long").alias("re"),
            F.col("n_chars").cast("long").alias("nc"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("re").cast("long").alias("re_tokens"),
            (F.sum("re").cast("double") / F.sum("ws").cast("double")).alias(
                "fertility"
            ),
            (F.sum("nc").cast("double") / F.sum("re").cast("double")).alias(
                "chars_per_token"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robust-scaler parameters (round 10)
# ---------------------------------------------------------------------------


@register_query(
    "length_robust_scaler_params",
    oracle="""
    WITH hist AS (
        SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ),
    cum AS (
        SELECT source, n_chars,
               CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM hist
    ),
    qs AS (
        SELECT * FROM (VALUES (25, 1, 4), (50, 1, 2), (75, 3, 4))
            AS t(pct, num, den)
    ),
    picked AS (
        SELECT c.source, q.pct, c.n, MIN(c.n_chars) AS v
        FROM cum c JOIN qs q ON c.cum >= (c.n * q.num + q.den - 1) // q.den
        GROUP BY c.source, q.pct, c.n
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN pct = 25 THEN v END) AS BIGINT) AS p25,
           CAST(MIN(CASE WHEN pct = 50 THEN v END) AS BIGINT) AS median,
           CAST(MIN(CASE WHEN pct = 75 THEN v END) AS BIGINT) AS p75,
           CAST(MIN(CASE WHEN pct = 75 THEN v END)
                - MIN(CASE WHEN pct = 25 THEN v END) AS BIGINT) AS iqr
    FROM picked GROUP BY source
    """,
)
def length_robust_scaler_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust-scaler parameters (median + IQR of document
    length) — the normalization constants a feature pipeline fits BEFORE
    scaling ((x - median) / IQR is the outlier-immune standardization;
    mean/std would be dragged by the long-document tail). EXACT discrete
    lower quartiles via the sort-free value-histogram ceil-rank method
    (rank r = (n*num + den - 1) div den), grouped by source — pure
    BIGINTs end to end, no floating point anywhere in the query.

    Scale: the histogram collapses to (source, distinct length) in one
    partial-aggregated groupBy; the cumulative windows and the 3-row
    rank lookup run on the length domain, never on documents."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_run = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_src = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "n_chars",
        F.sum("c").over(w_run).cast("long").alias("cum"),
        F.sum("c").over(w_src).cast("long").alias("n"),
    )
    qs = spark.createDataFrame(
        [(25, 1, 4), (50, 1, 2), (75, 3, 4)], "pct long, num long, den long"
    )
    picked = (
        cum.join(
            F.broadcast(qs),
            F.col("cum") >= F.expr("(n * num + den - 1) div den"),
        )
        .groupBy("source", "pct", "n")
        .agg(F.min("n_chars").alias("v"))
    )
    return picked.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.min(F.when(F.col("pct") == 25, F.col("v"))).cast("long").alias("p25"),
        F.min(F.when(F.col("pct") == 50, F.col("v"))).cast("long").alias("median"),
        F.min(F.when(F.col("pct") == 75, F.col("v"))).cast("long").alias("p75"),
        (
            F.min(F.when(F.col("pct") == 75, F.col("v")))
            - F.min(F.when(F.col("pct") == 25, F.col("v")))
        )
        .cast("long")
        .alias("iqr"),
    )


@register_query(
    "ngram_novelty_rate",
    oracle=f"""
    WITH toks AS (
        SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               unnest(list_transform(range(1, len(t) - {_BOILER_N - 2}),
                      i -> array_to_string(list_slice(t, i, i + {_BOILER_N - 1}), ' ')))
                   AS shingle
        FROM toks WHERE len(t) >= {_BOILER_N}
    ),
    spread AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM sh GROUP BY shingle
    )
    SELECT sh.source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
    FROM sh JOIN spread ON spread.shingle = sh.shingle
    GROUP BY sh.source
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source shingle NOVELTY — the fraction of a source's distinct
    {_BOILER_N}-gram shingles that appear in NO other source: the "unique
    contribution" readout a mixture designer reads next to the pairwise
    overlap matrix (source_ngram_overlap says who copies whom; this says
    what each source adds that nothing else supplies — the argument for
    keeping a small source at a high mixture weight). Same shingle grain
    as source_ngram_overlap, so the two reports cross-reference exactly.
    One double division of exact BIGINT counts per source.

    Scale: one (shingle, source) DISTINCT shuffle (the
    source_ngram_overlap grain) + a shingle-keyed source-spread count
    joined back shingle-partitioned — never doc x doc, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    shingles_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (_BOILER_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _BOILER_N)),
        )
    )
    sh = (
        docs.select("source", toks.alias("t"))
        .filter(F.size("t") >= _BOILER_N)
        .select("source", F.explode(shingles_arr).alias("shingle"))
        .distinct()
    )
    spread = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources")
    )
    return (
        sh.join(spread, "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("n_sources") == 1).cast("long"))
            .cast("long")
            .alias("n_unique"),
            (
                F.sum((F.col("n_sources") == 1).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf tail index per source (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "zipf_tail_index_by_source",
    oracle="""
    WITH wf AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (
            SELECT source,
                   UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
            FROM documents
        ) GROUP BY source, w
    ),
    pts AS (
        SELECT source, f,
               CAST(length(bin(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY f DESC, w
               ))) - 1 AS BIGINT) AS x,
               CAST(length(bin(f)) - 1 AS BIGINT) AS y
        FROM wf
    ),
    ols AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY source
    )
    SELECT source, n_types, n_tokens,
           CAST(n_types * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_types * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n_types * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n_types * sxy - sx * sy AS DOUBLE)
                     / CAST(n_types * sxx - sx * sx AS DOUBLE)
           END AS zipf_slope
    FROM ols
    """,
)
def zipf_tail_index_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf tail index per source — the rank-frequency power-law slope a
    corpus linguist (and a data-mixture designer) reads to spot degenerate
    sources: natural text sits near slope -1 on log f vs log rank;
    boilerplate farms and template spam flatten or cliff the tail, so a
    per-source slope shift is a cheap full-corpus health probe next to
    the Gopher gates. Zero libm: both axes are WHOLE-BIT logs
    (floor(log2) = length(bin(n)) - 1, integer-exact on both engines —
    the bigram_lm_surprisal trick), the OLS slope numerator/denominator
    are pure-BIGINT sums exposed as exact integers, and the slope itself
    is ONE exact-int double division (NULL when the denominator
    degenerates — fewer than two distinct rank octaves).

    Overflow bound: x,y <= 63 (bit positions), so n*Sxy <= 63^2 * n_types^2
    needs n_types < ~7e7 per source — beyond any real vocabulary; shard by
    (source, first-letter) past that (overflow-ledger discipline).

    Scale: one (source, word) shuffle for the frequency table, one
    per-source rank window over TYPES (vocabulary-sized, never
    token-sized), then a 6-sum partial aggregate — sources, not tokens,
    cross the final exchange."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return zipf_report_from_wf(wf)


def zipf_report_from_wf(wf: DataFrame) -> DataFrame:
    """Rank/whole-bit-log/OLS projection over a (source, w, f) frequency
    table — factored because the frequency table is a mergeable count
    partial: streaming_zipf_twin merges per-micro-batch (source, word)
    partials and calls this same function, so the live corpus-health
    probe is bit-identical to the batch one."""
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("f"), F.asc("w"))
    )
    pts = wf.select(
        "source",
        "f",
        (F.length(F.bin(rk)) - 1).cast("long").alias("x"),
        (F.length(F.bin(F.col("f"))) - 1).cast("long").alias("y"),
    )
    ols = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    return ols.select(
        "source",
        "n_types",
        "n_tokens",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# URL host stats (round 11): crawl-frontier hygiene report
# ---------------------------------------------------------------------------


@register_query(
    "url_host_stats",
    oracle="""
    WITH urls AS (
        SELECT doc_id, lang, source, n_chars,
               'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.'
                   || CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                      WHEN 2 THEN 'net' ELSE 'io' END
                   || '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id, lang, n_chars,
               regexp_extract(url, '^https://([^/]+)/', 1) AS host,
               regexp_extract(regexp_extract(url, '^https://([^/]+)/', 1),
                   '\\.([a-z]+)$', 1) AS tld
        FROM urls
    )
    SELECT host, tld,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM parsed
    GROUP BY host, tld
    """,
)
def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level crawl-frontier report — the per-domain aggregate every
    web-corpus pipeline maintains (politeness budgets, domain mixing
    caps, spam-host blocklists all key on it): parse the host and TLD
    out of each document's URL, then aggregate docs/languages/volume per
    host. The driver corpus carries no URL column, so deterministic URLs
    are synthesized from (source, doc_id, lang) first — identical string
    arithmetic on both engines, the pii_redact injection precedent — and
    the PARSING + AGGREGATION are what the oracle certifies: the regex
    host/TLD extraction is the exact code a real crawl frontier would
    run on its url column (RE2-compatible patterns, single capture
    groups — the regexp_extract parity rules).

    Scale: map-side synthesis + two regexp_extracts inside one codegen'd
    projection, then a partial-aggregated groupBy on (host, tld) —
    hosts, never documents, cross the shuffle. COUNT(DISTINCT lang) is
    the only expand; its domain is bounded (languages)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 4 == 0, F.lit("com"))
        .when(F.col("doc_id") % 4 == 1, F.lit("org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("net"))
        .otherwise(F.lit("io")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    host = F.regexp_extract(url, r"^https://([^/]+)/", 1)
    parsed = docs.select(
        "lang",
        "n_chars",
        host.alias("host"),
        F.regexp_extract(host, r"\.([a-z]+)$", 1).alias("tld"),
    )
    return parsed.groupBy("host", "tld").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
    )


# ---------------------------------------------------------------------------
# BPE merge learning (round 11)
# ---------------------------------------------------------------------------

_BPE_SEP = "\x1f"  # unit separator: never appears in the space-split tokens
_BPE_MIN_F = 5
_BPE_MERGES = 3

# One iteration of the pair-count CTE, shared by the 3 chained oracle steps.
_BPE_PAIR_SQL = """
    SELECT pr[1] AS sa, pr[2] AS sb, CAST(SUM(f) AS BIGINT) AS cnt
    FROM (
        SELECT f, unnest(list_zip(syms[:len(syms)-1], syms[2:])) AS pr
        FROM (SELECT f, list_filter(string_split(s, chr(31)), x -> x <> '')
                  AS syms FROM {src})
    ) t(f, pr)
    GROUP BY 1, 2
"""

_BPE_CHAIN_SQL = f"""
    WITH wt AS (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY w
        HAVING COUNT(*) >= {_BPE_MIN_F} AND length(w) BETWEEN 2 AND 20
    ),
    r0 AS (
        SELECT chr(31) || array_to_string(string_split(word, ''), chr(31))
                 || chr(31) AS s, f
        FROM wt
    ),
    p1 AS ({_BPE_PAIR_SQL.format(src="r0")}),
    w1 AS (SELECT sa, sb, cnt FROM p1 ORDER BY cnt DESC, sa, sb LIMIT 1),
    r1 AS (
        SELECT replace(s, chr(31) || w1.sa || chr(31) || w1.sb || chr(31),
                       chr(31) || w1.sa || w1.sb || chr(31)) AS s, f
        FROM r0 CROSS JOIN w1
    ),
    p2 AS ({_BPE_PAIR_SQL.format(src="r1")}),
    w2 AS (SELECT sa, sb, cnt FROM p2 ORDER BY cnt DESC, sa, sb LIMIT 1),
    r2 AS (
        SELECT replace(s, chr(31) || w2.sa || chr(31) || w2.sb || chr(31),
                       chr(31) || w2.sa || w2.sb || chr(31)) AS s, f
        FROM r1 CROSS JOIN w2
    ),
    p3 AS ({_BPE_PAIR_SQL.format(src="r2")}),
    w3 AS (SELECT sa, sb, cnt FROM p3 ORDER BY cnt DESC, sa, sb LIMIT 1)"""

_BPE_ORACLE = _BPE_CHAIN_SQL + """
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS merge_rank, sa AS sym_a, sb AS sym_b,
               sa || sb AS merged, cnt AS pair_count FROM w1
        UNION ALL
        SELECT CAST(2 AS BIGINT), sa, sb, sa || sb, cnt FROM w2
        UNION ALL
        SELECT CAST(3 AS BIGINT), sa, sb, sa || sb, cnt FROM w3
    ) ORDER BY merge_rank
"""


def _bpe_pair_counts(repr_df: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts (weighted by word-type frequency) over
    the separator-string representation — one map-side explode + one
    partial-aggregated groupBy per iteration."""
    syms = F.filter(F.split(F.col("s"), _BPE_SEP), lambda x: x != "")
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("a"), F.slice(syms, 2, n - 1).alias("b")
    )
    return (
        repr_df.select(F.col("f"), F.explode(pairs).alias("pr"))
        .groupBy(
            F.col("pr.a").alias("sa"), F.col("pr.b").alias("sb")
        )
        .agg(F.sum("f").cast("long").alias("cnt"))
    )


def _bpe_winner(pair_df: DataFrame) -> DataFrame:
    return pair_df.orderBy(F.desc("cnt"), "sa", "sb").limit(1)


def _bpe_apply(repr_df: DataFrame, winner: DataFrame) -> DataFrame:
    """Greedy left-to-right merge of the winning pair: string replace over
    the separator representation is non-overlapping left-to-right in both
    engines, which IS the BPE merge rule (the consumed trailing separator
    stops a merged symbol from re-merging within the pass)."""
    sep = F.lit(_BPE_SEP)
    pat = F.concat(sep, F.col("sa"), sep, F.col("sb"), sep)
    rep = F.concat(sep, F.col("sa"), F.col("sb"), sep)
    return repr_df.crossJoin(F.broadcast(winner)).select(
        F.replace(F.col("s"), pat, rep).alias("s"), "f"
    )


@register_query("bpe_learn_merges", oracle=_BPE_ORACLE)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge learning (Sennrich et al., ACL'16) — the
    first 3 merge rules of the tokenizer-training loop every LLM pipeline
    runs before anything else touches the corpus. BPE trains on the WORD-
    TYPE table (distinct words with corpus frequencies), not corpus
    tokens: each word is a separator-joined symbol string (initially
    characters); each round counts adjacent symbol pairs weighted by word
    frequency, picks the most frequent pair (ties break lexicographically
    for cross-engine determinism), and greedily merges it everywhere.

    Scale (how SentencePiece/HF-tokenizers distribute the same loop): the
    training state is VOCABULARY-sized — word types with counts, not the
    100 TB corpus; the corpus is touched exactly once (the word-count
    groupBy). Each merge round is one map-side pair explode + a partial-
    aggregated groupBy over the type table, and the winner is a 1-row
    broadcast applied map-side — no row ever moves for the merge itself.
    The merge count is model-sized (k ~ 30k rounds in production; 3 here
    to keep the oracle a finite CTE chain), and rounds are inherently
    sequential (each changes the pair distribution the next one counts).

    Greedy-merge equivalence: `replace` is non-overlapping left-to-right
    in both engines, and the consumed trailing separator prevents the
    merged token from immediately re-merging — exactly the BPE pass rule
    ("aaa" + merge(a,a) -> ["aa","a"], never ["aa","aa"])."""
    docs = load_table(spark, sf_dir, "documents")
    wt = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .filter(
            (F.col("f") >= _BPE_MIN_F)
            & (F.length("word") >= 2)
            & (F.length("word") <= 20)
        )
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    repr_df = wt.select(
        F.concat(
            F.lit(_BPE_SEP),
            F.array_join(chars, _BPE_SEP),
            F.lit(_BPE_SEP),
        ).alias("s"),
        "f",
    )
    winners = []
    for rank in range(1, _BPE_MERGES + 1):
        w = _bpe_winner(_bpe_pair_counts(repr_df))
        winners.append(
            w.select(
                F.lit(rank).cast("long").alias("merge_rank"),
                F.col("sa").alias("sym_a"),
                F.col("sb").alias("sym_b"),
                F.concat("sa", "sb").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        if rank < _BPE_MERGES:
            repr_df = _bpe_apply(repr_df, w)
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out.orderBy("merge_rank")


# ---------------------------------------------------------------------------
# Readability + lexical diversity (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "readability_flesch_by_source",
    oracle="""
    WITH per_word AS (
        SELECT doc_id, source, w,
               CAST(len(regexp_extract_all(w, '[aeiou]+')) AS BIGINT) AS syl
        FROM (SELECT doc_id, source,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
    ),
    per_doc AS (
        SELECT doc_id, source,
               CAST(COUNT(*) AS BIGINT) AS words,
               CAST(SUM(syl) AS BIGINT) AS syllables,
               CAST((COUNT(*) + 14) // 15 AS BIGINT) AS sentences
        FROM per_word GROUP BY doc_id, source
    ),
    scored AS (
        SELECT source, words, syllables, sentences,
               206.835
                 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                 - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
                   AS score
        FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(syllables) AS BIGINT) AS total_syllables,
           206.835
             - 1.015 * (CAST(SUM(words) AS DOUBLE)
                        / CAST(SUM(sentences) AS DOUBLE))
             - 84.6 * (CAST(SUM(syllables) AS DOUBLE)
                       / CAST(SUM(words) AS DOUBLE)) AS flesch_aggregate,
           MIN(score) AS min_doc_score,
           MAX(score) AS max_doc_score,
           CAST(SUM(CASE WHEN score < 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_very_difficult
    FROM scored GROUP BY source ORDER BY source
    """,
)
def readability_flesch_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease audit per source — the readability gate a
    curation pipeline runs alongside the Gopher filters (C4 used similar
    surface heuristics): score = 206.835 - 1.015*ASL - 84.6*ASW, with
    syllables approximated by vowel-group counts (the standard
    dictionary-free heuristic) and, because this corpus has no sentence
    punctuation, a fixed 15-word sentence proxy (documented bias, same in
    both engines: sentences = ceil(words/15)).

    Determinism: per-source scores are computed from INTEGER sufficient
    statistics (sum of words/syllables/sentences — BIGINTs that merge
    across any partitioning), never by averaging per-doc doubles (a
    float sum's value depends on reduction order; an integer sum's does
    not). Per-doc scores feed only MIN/MAX/threshold-count — selection
    and comparison of bit-identical doubles, not summation.

    Scale: explode -> two partial-aggregated groupBys (doc, then source);
    no joins, no windows; state is per-doc then per-source counts."""
    docs = load_table(spark, sf_dir, "documents")
    per_word = docs.select(
        "doc_id",
        "source",
        F.explode(_tokens(F.col("text"))).alias("w"),
    ).select(
        "doc_id",
        "source",
        F.regexp_count(F.col("w"), F.lit("[aeiou]+")).cast("long").alias("syl"),
    )
    per_doc = per_word.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("words"),
        F.sum("syl").cast("long").alias("syllables"),
        ((F.count(F.lit(1)) + 14) / 15)
        .cast("long")
        .alias("sentences"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("syllables").cast("double") / F.col("words").cast("double"))
    )
    scored = per_doc.select("source", "words", "syllables", "sentences", score.alias("score"))
    agg_score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (
            F.sum("words").cast("long").cast("double")
            / F.sum("sentences").cast("long").cast("double")
        )
        - F.lit(84.6)
        * (
            F.sum("syllables").cast("long").cast("double")
            / F.sum("words").cast("long").cast("double")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("syllables").cast("long").alias("total_syllables"),
            agg_score.alias("flesch_aggregate"),
            F.min("score").alias("min_doc_score"),
            F.max("score").alias("max_doc_score"),
            F.sum(F.when(F.col("score") < 30, 1).otherwise(0))
            .cast("long")
            .alias("n_very_difficult"),
        )
        .orderBy("source")
    )


@register_query(
    "lexical_diversity_ttr",
    oracle="""
    WITH wc AS (
        SELECT doc_id, source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, source,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY doc_id, source, w
    ),
    per_doc AS (
        SELECT doc_id, source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM wc GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_types) AS BIGINT) AS total_types,
           CAST(SUM(n_hapax) AS BIGINT) AS total_hapax,
           CAST(SUM(n_types) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
               AS ttr,
           CAST(SUM(n_hapax) AS DOUBLE) / CAST(SUM(n_types) AS DOUBLE)
               AS hapax_rate,
           CAST(SUM(CASE WHEN CAST(n_types AS DOUBLE)
                              / CAST(n_tokens AS DOUBLE) < 0.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def lexical_diversity_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio / hapax-rate audit per source — the lexical-
    diversity quality gate (low TTR = repetitive, template, or spam text;
    complementary to dup_ngram_quality's n-gram view because TTR sees
    GLOBAL within-doc repetition, not adjacency). Emits macro TTR from
    summed integer counts, hapax share of the vocabulary, and the count
    of low-diversity docs (per-doc TTR < 0.5).

    Determinism: the integer-sufficient-statistic discipline (see
    readability_flesch_by_source); the per-doc threshold compares a
    single-division double that both engines compute identically.

    Scale: explode -> (doc, word) partial-agg (the only real shuffle,
    keyed wide) -> per-doc -> per-source; no joins; the (doc, word)
    intermediate is the corpus's per-doc vocabulary, the same scale
    class every dedup shingle pass already handles."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", "source", F.explode(_tokens(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_doc = wc.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    doc_ttr = F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_types").cast("long").alias("total_types"),
            F.sum("n_hapax").cast("long").alias("total_hapax"),
            (
                F.sum("n_types").cast("long").cast("double")
                / F.sum("n_tokens").cast("long").cast("double")
            ).alias("ttr"),
            (
                F.sum("n_hapax").cast("long").cast("double")
                / F.sum("n_types").cast("long").cast("double")
            ).alias("hapax_rate"),
            F.sum(F.when(doc_ttr < 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_low_diversity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Negative-sampling distribution (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "negative_sampling_table",
    oracle="""
    WITH wf AS (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total_tokens FROM wf),
    top AS (
        SELECT word, f FROM wf ORDER BY f DESC, word LIMIT 500
    ),
    weighted AS (
        SELECT word, f,
               sqrt(sqrt(CAST(f AS DOUBLE) * CAST(f AS DOUBLE)
                         * CAST(f AS DOUBLE))) AS weight
        FROM top
    )
    SELECT w.word, w.f,
           CAST(w.f AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
               AS token_share,
           w.weight,
           w.weight / MAX(w.weight) OVER () AS rel_weight,
           CAST(ROW_NUMBER() OVER (ORDER BY w.f DESC, w.word) AS BIGINT)
               AS sample_rank
    FROM weighted w CROSS JOIN tot t
    ORDER BY sample_rank
    """,
)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling distribution (Mikolov et al.,
    NeurIPS'13): sampling weight proportional to f^(3/4) over the top-500
    vocabulary — the table every skip-gram / contrastive trainer draws
    negatives from.

    Bit-portability of the 3/4 power WITHOUT libm pow (pow is not
    correctly rounded and differs across libms): f^0.75 = sqrt(sqrt(f^3)),
    and IEEE-754 sqrt IS correctly rounded on every conforming engine —
    so c*c*c (one fixed multiply order) followed by two sqrts is
    bit-identical on Spark and DuckDB. The normalizing constant is
    deliberately NOT emitted (a float sum's value depends on reduction
    order); rel_weight normalizes by the MAX weight instead (selection,
    not summation) — a sampler rescales in one driver-side pass.

    Scale: one word-count groupBy (partial-aggregated), a top-500
    selection, map-side weights, a 500-row window, and a 1-row
    total-tokens broadcast (the unigram_rarity_quality shape)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    tot = wf.agg(F.sum("f").cast("long").alias("total_tokens"))
    top = wf.orderBy(F.desc("f"), "word").limit(500)
    c = F.col("f").cast("double")
    weighted = top.select("word", "f", F.sqrt(F.sqrt(c * c * c)).alias("weight"))
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("f"), "word")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "word",
            "f",
            (F.col("f").cast("double") / F.col("total_tokens").cast("double"))
            .alias("token_share"),
            "weight",
            (F.col("weight") / F.max("weight").over(w_all)).alias("rel_weight"),
            F.row_number().over(w_rank).cast("long").alias("sample_rank"),
        )
        .orderBy("sample_rank")
    )


# ---------------------------------------------------------------------------
# Source-fair quality calibration (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "quality_percentile_calibration",
    oracle="""
    WITH med AS (
        SELECT n_chars AS global_median FROM (
            SELECT n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
                   COUNT(*) OVER () AS n
            FROM documents
        ) WHERE rk = (n + 1) // 2
    ),
    scored AS (
        SELECT source, doc_id, n_chars,
               PERCENT_RANK() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS pctl
        FROM documents
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.n_chars > m.global_median
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_raw_median,
           CAST(SUM(CASE WHEN s.n_chars > m.global_median
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS share_above_raw_median,
           CAST(SUM(CASE WHEN s.pctl >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above_within_pctl,
           CAST(SUM(CASE WHEN s.pctl >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS share_above_within_pctl
    FROM scored s CROSS JOIN med m
    GROUP BY s.source ORDER BY s.source
    """,
)
def quality_percentile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-fair quality thresholding — the calibration step a mixture
    pipeline runs before filtering a multi-source corpus with one global
    cutoff: a RAW threshold (the global median document length here, as
    the stand-in quality score) keeps a source-dependent share of each
    source (long-form sources dominate), while a WITHIN-SOURCE percentile
    threshold keeps ~50% of every source by construction. The report
    shows both shares side by side per source — the evidence for choosing
    percentile-calibrated gates (the quality-weighted-mixture rationale).

    Determinism: the global median is an exact order statistic via the
    ROW_NUMBER rank (lower median, ties broken on doc_id — both engines
    pick the identical row; no interpolation); PERCENT_RANK is rank
    arithmetic over the same total order; threshold counts are exact ints.

    Scale: one per-source window (percent_rank), one global-median
    selection (at 100 TB: the value-histogram rank lookup from
    exact_quantiles_histogram replaces the global ROW_NUMBER), a 1-row
    median broadcast, and a per-source aggregate."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w_rank = Window.orderBy("n_chars", "doc_id")
    med = (
        docs.select(
            "n_chars",
            F.row_number().over(w_rank).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.col("rk") == F.floor((F.col("n") + 1) / 2).cast("long"))
        .select(F.col("n_chars").alias("global_median"))
    )
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    scored = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.percent_rank().over(w_src).alias("pctl"),
    )
    return (
        scored.crossJoin(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") > F.col("global_median"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_raw_median"),
            (
                F.sum(
                    F.when(F.col("n_chars") > F.col("global_median"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("share_above_raw_median"),
            F.sum(F.when(F.col("pctl") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_above_within_pctl"),
            (
                F.sum(F.when(F.col("pctl") >= 0.5, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("share_above_within_pctl"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Heaps'-law exponent per source (round 11)
# ---------------------------------------------------------------------------


@register_query(
    "heaps_law_by_source",
    oracle="""
    WITH tok AS (
        SELECT source, doc_id,
               UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        FROM documents
    ),
    doc_tokens AS (
        SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY source, doc_id
    ),
    first_occ AS (
        SELECT source, MIN(doc_id) AS first_doc
        FROM tok GROUP BY source, w
    ),
    new_types AS (
        SELECT source, first_doc AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_new
        FROM first_occ GROUP BY source, first_doc
    ),
    growth AS (
        SELECT d.source, d.doc_id,
               CAST(SUM(d.n_tok) OVER (
                   PARTITION BY d.source ORDER BY d.doc_id
               ) AS BIGINT) AS n_cum,
               CAST(SUM(COALESCE(nt.n_new, 0)) OVER (
                   PARTITION BY d.source ORDER BY d.doc_id
               ) AS BIGINT) AS v_cum
        FROM doc_tokens d
        LEFT JOIN new_types nt
          ON d.source = nt.source AND d.doc_id = nt.doc_id
    ),
    pts AS (
        SELECT source,
               CAST(length(bin(n_cum)) - 1 AS BIGINT) AS x,
               CAST(length(bin(v_cum)) - 1 AS BIGINT) AS y,
               n_cum, v_cum
        FROM growth
    ),
    ols AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(n_cum) AS BIGINT) AS total_tokens,
               CAST(MAX(v_cum) AS BIGINT) AS total_types,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY source
    )
    SELECT source, n_docs, total_tokens, total_types,
           CAST(n_docs * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_docs * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n_docs * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n_docs * sxy - sx * sy AS DOUBLE)
                     / CAST(n_docs * sxx - sx * sx AS DOUBLE)
           END AS heaps_beta
    FROM ols ORDER BY source
    """,
)
def heaps_law_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent per source — the vocabulary-GROWTH twin of the
    Zipf tail index: V(N) ~ k * N^beta, so beta is the OLS slope of
    log V against log N along the corpus's own ingestion order. Natural
    text sits around beta ~ 0.5; a source whose beta collapses toward 0
    has stopped contributing new vocabulary (template/boilerplate farm),
    and beta ~ 1 is a unique-token generator (serial numbers, hashes) —
    both are mixture red flags the Zipf slope alone can miss because it
    sees the final frequency table, not the growth path.

    Zero libm (the zipf_tail_index discipline): both axes are WHOLE-BIT
    logs (length(bin(n)) - 1), the OLS numerator/denominator are exact
    BIGINT sums (bound: bit positions <= 63, so n_docs < ~7e7 per source
    before the ledger's shard recipe applies), and the slope is one
    exact-int double division.

    Scale: one (source, word) shuffle each for doc token counts and
    first occurrences (the explode is shared lineage), one per-source
    cumulative window over DOCS (corpus-document-sized, never
    token-sized), then a 6-sum partial aggregate."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id", F.explode(_tokens(F.col("text"))).alias("w")
    )
    doc_tokens = tok.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    new_types = (
        tok.groupBy("source", "w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    w_cum = Window.partitionBy("source").orderBy("doc_id")
    growth = (
        doc_tokens.join(new_types, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            F.sum("n_tok").over(w_cum).cast("long").alias("n_cum"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("v_cum"),
        )
    )
    pts = growth.select(
        "source",
        "n_cum",
        "v_cum",
        (F.length(F.bin(F.col("n_cum"))) - 1).cast("long").alias("x"),
        (F.length(F.bin(F.col("v_cum"))) - 1).cast("long").alias("y"),
    )
    ols = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_cum").cast("long").alias("total_tokens"),
        F.max("v_cum").cast("long").alias("total_types"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n_docs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")
    return ols.select(
        "source",
        "n_docs",
        "total_tokens",
        "total_types",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("heaps_beta"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# BPE encode + compression report (round 12): the tokenizer's APPLY side
# ---------------------------------------------------------------------------


@register_query(
    "bpe_encode_compression",
    oracle=_BPE_CHAIN_SQL
    + """,
    corpus AS (
        SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT source,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY source, w
    ),
    e0 AS (
        SELECT source, f, CAST(length(word) AS BIGINT) AS n_chars,
               chr(31) || array_to_string(string_split(word, ''), chr(31))
                 || chr(31) AS s
        FROM corpus
    ),
    e1 AS (
        SELECT source, f, n_chars,
               replace(s, chr(31) || w1.sa || chr(31) || w1.sb || chr(31),
                       chr(31) || w1.sa || w1.sb || chr(31)) AS s
        FROM e0 CROSS JOIN w1
    ),
    e2 AS (
        SELECT source, f, n_chars,
               replace(s, chr(31) || w2.sa || chr(31) || w2.sb || chr(31),
                       chr(31) || w2.sa || w2.sb || chr(31)) AS s
        FROM e1 CROSS JOIN w2
    ),
    e3 AS (
        SELECT source, f, n_chars,
               replace(s, chr(31) || w3.sa || chr(31) || w3.sb || chr(31),
                       chr(31) || w3.sa || w3.sb || chr(31)) AS s
        FROM e2 CROSS JOIN w3
    ),
    counted AS (
        SELECT source, f, n_chars,
               CAST(len(list_filter(string_split(s, chr(31)),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM e3
    )
    SELECT source,
           CAST(SUM(f) AS BIGINT) AS n_words,
           CAST(SUM(f * n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(f * n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(f * n_tokens) AS DOUBLE) / CAST(SUM(f) AS DOUBLE)
               AS tokens_per_word,
           CAST(SUM(f * n_chars) AS DOUBLE) / CAST(SUM(f * n_tokens) AS DOUBLE)
               AS compression_ratio
    FROM counted GROUP BY source ORDER BY source
    """,
)
def bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer lifecycle's APPLY side: encode the WHOLE corpus with
    the merges bpe_learn_merges learned and report per-source token
    economics — tokens-per-word and chars-per-token compression, the
    numbers that decide context-window budgets and per-source training
    cost. Encoding runs on the (source, word-type) table weighted by
    corpus frequency (every word, including the rare/long types the
    TRAINING gate excluded — training is sampled, encoding is total,
    exactly as production tokenizers behave), applying the learned pair
    merges IN RANK ORDER via ONE non-overlapping left-to-right replace
    per merge. Adjacent-repeat caveat (same as bpe_learn_merges'
    separator-consumption rule): a single pass under-merges runs of the
    same pair — "a a a a" with merge (a,a) encodes as [aa, a, a], not
    [aa, aa], because the match consumes the trailing separator. A true
    BPE encoder iterates each merge to a fixed point; both engines apply
    the identical single-pass rule here, so hashes agree and
    tokens_total is slightly INFLATED vs a fixed-point encoder (an
    upper bound on token cost, never an undercount).

    Scale: learning state is vocabulary-sized (see bpe_learn_merges);
    encoding is map-side over the type table with three 1-row winner
    broadcasts — the corpus is touched once for the (source, word)
    count, and no row moves for any merge. All counts are exact BIGINTs;
    the two ratios are final double divisions."""
    docs = load_table(spark, sf_dir, "documents")
    # --- learn (same loop as bpe_learn_merges) ---
    wt = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .filter(
            (F.col("f") >= _BPE_MIN_F)
            & (F.length("word") >= 2)
            & (F.length("word") <= 20)
        )
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    repr_df = wt.select(
        F.concat(
            F.lit(_BPE_SEP), F.array_join(chars, _BPE_SEP), F.lit(_BPE_SEP)
        ).alias("s"),
        "f",
    )
    winners = []
    for _rank in range(1, _BPE_MERGES + 1):
        w = _bpe_winner(_bpe_pair_counts(repr_df))
        winners.append(w)
        if _rank < _BPE_MERGES:
            repr_df = _bpe_apply(repr_df, w)
    # --- encode (all word types, frequency-weighted, per source) ---
    corpus = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    enc = corpus.select(
        "source",
        "f",
        F.length("word").cast("long").alias("n_chars"),
        F.concat(
            F.lit(_BPE_SEP), F.array_join(chars, _BPE_SEP), F.lit(_BPE_SEP)
        ).alias("s"),
    )
    sep = F.lit(_BPE_SEP)
    for w in winners:
        pat = F.concat(sep, F.col("sa"), sep, F.col("sb"), sep)
        rep = F.concat(sep, F.col("sa"), F.col("sb"), sep)
        enc = enc.crossJoin(F.broadcast(w)).select(
            "source",
            "f",
            "n_chars",
            F.replace(F.col("s"), pat, rep).alias("s"),
        )
    counted = enc.select(
        "source",
        "f",
        "n_chars",
        F.size(F.filter(F.split(F.col("s"), _BPE_SEP), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        counted.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_words"),
            F.sum(F.col("f") * F.col("n_chars")).cast("long").alias("chars_total"),
            F.sum(F.col("f") * F.col("n_tokens")).cast("long").alias("tokens_total"),
            (
                F.sum(F.col("f") * F.col("n_tokens")).cast("double")
                / F.sum("f").cast("double")
            ).alias("tokens_per_word"),
            (
                F.sum(F.col("f") * F.col("n_chars")).cast("double")
                / F.sum(F.col("f") * F.col("n_tokens")).cast("double")
            ).alias("compression_ratio"),
        )
        .orderBy("source")
    )
