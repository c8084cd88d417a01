"""Training-corpus curation extras (round 8): Bloom-prefiltered
decontamination, context-window chunking, contrastive pair mining,
temperature-based corpus mixing (weights + quota-applied sampling),
model-based quality scoring, and CDC snapshot diff.

These extend the LLM-data-pipeline families (SURVEY.md §2.E additions)
beyond the reference's own surface — the reference engine
(/root/reference/topic_processor.go) has no analog for any of them; they
are the operations a 100 TB pretraining pipeline layers on top of the
core dataflow, declared Spark-first so Catalyst keeps pushdown/pruning.

Every query here is oracle-certified (DuckDB twin) — including the Bloom
variant, whose bloom stage is a pure PREFILTER: false positives are
removed by an exact join, so the result is bit-identical to the exact
operator and shares its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.lineage import cut_lineage
from kasper_spark.operators import text as _text  # noqa: F401 -- registers the exact decon oracle
from kasper_spark.registry import ORACLES, register_query

# ---------------------------------------------------------------------------
# Bloom-prefiltered n-gram decontamination
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20  # m: 1 Mi bits = 16 Ki packed 64-bit words
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (0x9E3779B9, 0x85EBCA77, 0xC2B2AE3D)  # k=3 probe hashes


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) pairs of word n-grams — same extraction as
    text.ngram_decontaminate (whitespace tokens, JVM-side explode)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    return (
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


def _bloom_positions(shingle: Column) -> list[Column]:
    """k bit positions in [0, m) for a shingle. Engine-local (Spark-only)
    hashes are fine: the bloom never reaches the output — the exact
    verify join removes its false positives."""
    return [
        F.pmod(F.xxhash64(F.lit(seed), shingle), F.lit(_BLOOM_BITS))
        for seed in _BLOOM_SEEDS
    ]


@register_query(
    "ngram_decontaminate_bloom",
    # bit-identical to the exact operator by construction -> same oracle
    # (this module imports after operators.text in __init__, so the exact
    # oracle is registered by now; a rename there fails loudly here)
    oracle=ORACLES["ngram_decontaminate"],
)
def ngram_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with a BLOOM-FILTER prefilter on the
    corpus side — the shape for when the eval suite outgrows a broadcast
    hash set (multi-benchmark suites at 8-13-gram windows reach GBs of
    distinct shingles; a 1 Mi-bit bloom is 128 KiB regardless).

    Plan shape, and why it scales where the plain broadcast join stops:

    1. eval shingles -> k=3 hashed bit positions -> packed 64-bit words
       via ``bit_or(shiftleft(1, pos % 64))`` grouped by ``pos / 64``:
       AT MOST m/64 = 16 Ki rows no matter how large the eval set grows
       (the plain operator's broadcast grows with |eval shingles|).
    2. the corpus's shingles probe the bloom through three BROADCAST
       joins on the word index — map-side, zero corpus shuffle; a
       shingle survives only if all k probed bits are set.
    3. survivors (true matches + ~0.01% false positives at these
       parameters) go through the EXACT join against the eval shingles,
       so the bloom never changes the answer — only the bytes broadcast
       and the rows that reach the exact join.

    Same output contract as text.ngram_decontaminate; shares its oracle.
    This is the manual, arbitrary-cardinality twin of Catalyst's
    InjectRuntimeFilter (pinned by tests/test_plans.py::
    test_runtime_bloom_filter_injectable), which only fires on shuffle
    joins past size thresholds."""
    n = 4
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs, n)
    # The eval shingle set feeds FOUR consumers (the bloom build + three
    # probe-join broadcasts + the exact verify); without a cut, each
    # broadcast replans and re-executes the whole eval pipeline (measured:
    # 9 exchanges, the eval shingle shuffle run 4x — AQE does not
    # canonicalize the disambiguated self-join subtrees into one reused
    # exchange). cut_lineage materializes it once; at cluster scale the
    # same call is a reliable checkpoint (see lineage.py).
    ev = cut_lineage(
        sh.filter(F.col("doc_id") % 41 == 0)
        .groupBy("shingle")
        .agg(F.min("doc_id").alias("eval_doc_id"))
    )

    # --- bloom build: eval shingles -> (word_idx, packed 64-bit word) ---
    pos = F.explode(F.array(*_bloom_positions(F.col("shingle")))).alias("pos")
    words = (
        ev.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    # same rationale: one materialized 16 Ki-row bloom, three broadcasts of it
    words = cut_lineage(words)

    # --- corpus probe: 3 broadcast joins on word index, all map-side ---
    # Each probe broadcasts the checkpointed 16 Ki-row words table (a
    # block scan, not a pipeline re-run — see the cut above); the corpus
    # side stays exchange-free through all three joins and the filter.
    tr = sh.filter(F.col("doc_id") % 41 != 0)
    probes = _bloom_positions(F.col("shingle"))
    for i, p in enumerate(probes):
        tr = tr.withColumn(f"pos{i}", p).withColumn(
            f"widx{i}", (F.col(f"pos{i}") / 64).cast("long")
        )
        wi = words.alias(f"w{i}")
        tr = (
            tr.join(
                F.broadcast(wi),
                F.col(f"widx{i}") == F.col(f"w{i}.widx"),
                "left",
            )
            .withColumn(f"word{i}", F.col(f"w{i}.word"))
            .drop(F.col(f"w{i}.widx"))
            .drop(F.col(f"w{i}.word"))
        )
    hit = None
    for i in range(len(probes)):
        bit_set = F.expr(
            f"(shiftrightunsigned(coalesce(word{i}, CAST(0 AS BIGINT)), "
            f"CAST(pos{i} % 64 AS INT)) & 1) = 1"
        )
        hit = bit_set if hit is None else (hit & bit_set)
    survivors = tr.filter(hit).select("doc_id", "shingle")

    # --- exact verify: false positives die here; result == exact op ---
    return (
        survivors.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_shingles"),
            F.min("eval_doc_id").alias("min_eval_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Context-window document chunking
# ---------------------------------------------------------------------------

_CHUNK_CHARS = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register_query(
    "doc_chunk_overlap",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text,
               CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT) AS mk
        FROM documents WHERE length(text) > 0
    ),
    ks AS (
        SELECT doc_id, text, unnest(range(0, mk + 1)) AS k FROM base
    )
    SELECT
        doc_id,
        CAST(k AS BIGINT) AS chunk_id,
        substring(text, CAST(k * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_CHARS}) AS chunk,
        CAST(length(substring(text, CAST(k * {_CHUNK_STRIDE} + 1 AS INT),
                              {_CHUNK_CHARS})) AS BIGINT) AS chunk_len
    FROM ks
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (chunk=200 chars, stride=150) — the context-window chunking step that
    turns raw documents into trainable sequences. Chunk k covers
    [k*stride, k*stride+chunk); the last window starts at the largest
    k*stride still inside the text, so every character lands in >=1 chunk
    and consecutive chunks share a 50-char overlap.

    Scale: pure narrow transformation — sequence/transform/substring stay
    JVM-side inside the scan stage; no shuffle, no Python. Output row
    count ~= total_chars / stride, which is why chunking runs AFTER
    dedup/quality filtering in a real pipeline (docstring order mirrors
    training_data_pipeline)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks_minus1 = F.floor((F.length("text") - 1) / _CHUNK_STRIDE).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_minus1),
        lambda k: F.col("text").substr(
            k * F.lit(_CHUNK_STRIDE) + F.lit(1), F.lit(_CHUNK_CHARS)
        ),
    )
    exploded = docs.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk"))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk",
        F.length("chunk").cast("long").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining (hard negatives) over embeddings
# ---------------------------------------------------------------------------

_N_MINE_QUERIES = 20  # bounded anchor set, same discipline as ann_* baselines


def _dot_exact(a: Column, b: Column) -> Column:
    # identical discipline to similarity.dot_exact (decimal-exact,
    # order-independent); re-stated here to keep this module standalone
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,12)")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    ).cast("double")


def _dot_exact_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"AS DECIMAL(30,12)))) AS DOUBLE)"
    )


@register_query(
    "hard_negative_mining",
    oracle=f"""
    WITH nrm AS (
        SELECT vec_id, label, embedding,
               sqrt({_dot_exact_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, label AS query_label,
               embedding AS qe, nrm AS qn
        FROM nrm WHERE vec_id < {_N_MINE_QUERIES}
    ),
    scored AS (
        SELECT query_id, query_label,
               c.vec_id AS neighbor_id,
               (c.label = query_label) AS same_label,
               {_dot_exact_sql('qe', 'c.embedding')} / (qn * c.nrm) AS cosine
        FROM q JOIN nrm c ON c.vec_id <> query_id
    ),
    best AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id, same_label
                ORDER BY cosine DESC, neighbor_id
            ) AS rk
            FROM scored
        ) WHERE rk = 1
    )
    SELECT
        query_id,
        CAST(MAX(query_label) AS BIGINT) AS query_label,
        CAST(MAX(CASE WHEN same_label THEN neighbor_id END) AS BIGINT) AS positive_id,
        MAX(CASE WHEN same_label THEN cosine END) AS positive_cos,
        CAST(MAX(CASE WHEN NOT same_label THEN neighbor_id END) AS BIGINT)
            AS hard_negative_id,
        MAX(CASE WHEN NOT same_label THEN cosine END) AS hard_negative_cos,
        MAX(CASE WHEN same_label THEN cosine END)
            - MAX(CASE WHEN NOT same_label THEN cosine END) AS margin
    FROM best GROUP BY query_id
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: for each anchor embedding, the
    most-similar SAME-label vector (positive) and the most-similar
    OTHER-label vector (the hard negative — the pair that carries the
    gradient signal in contrastive/embedding training), plus the margin
    between them.

    Exactness: cosines use the decimal-exact dot (similarity.dot_exact
    discipline), so positive/negative selection and the margin are
    bit-identical across engines.

    Scale: the anchor set is bounded (20 vectors broadcast,
    same discipline as the ann_* baselines) so the corpus streams through
    map-side scoring once; per-anchor winners come from a rank-1 window
    (partial top-1 per partition, no global sort). For an UNBOUNDED anchor
    set this composes with ann_ivf/ann_lsh candidate generation instead of
    the exhaustive scan — the plan below is the exact-baseline twin."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    nrm = emb.select(
        "vec_id", "label", "embedding", F.sqrt(_dot_exact(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )
    q = nrm.filter(F.col("vec_id") < _N_MINE_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(nrm, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("label") == F.col("query_label")).alias("same_label"),
            (_dot_exact(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id", "same_label").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    best = scored.select("*", F.row_number().over(w).alias("rk")).filter(F.col("rk") == 1)
    pos_cos = F.max(F.when(F.col("same_label"), F.col("cosine")))
    neg_cos = F.max(F.when(~F.col("same_label"), F.col("cosine")))
    return best.groupBy("query_id").agg(
        F.max("query_label").cast("long").alias("query_label"),
        F.max(F.when(F.col("same_label"), F.col("neighbor_id"))).cast("long").alias("positive_id"),
        pos_cos.alias("positive_cos"),
        F.max(F.when(~F.col("same_label"), F.col("neighbor_id"))).cast("long").alias("hard_negative_id"),
        neg_cos.alias("hard_negative_cos"),
        (pos_cos - neg_cos).alias("margin"),
    )


# ---------------------------------------------------------------------------
# Temperature-based corpus mixture weights
# ---------------------------------------------------------------------------

_MIX_BUDGET_DOCS = 1_000_000  # documents to allot across sources


@register_query(
    "corpus_mixture_weights",
    oracle=f"""
    WITH src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_micros
        FROM src
    )
    SELECT
        source,
        n_docs,
        w_micros,
        100.0 * (CAST(w_micros AS DOUBLE)
                 / CAST(CAST(SUM(w_micros) OVER () AS BIGINT) AS DOUBLE))
            AS share_pct,
        CAST(floor(CAST({_MIX_BUDGET_DOCS} * w_micros AS DOUBLE)
                   / CAST(CAST(SUM(w_micros) OVER () AS BIGINT) AS DOUBLE))
             AS BIGINT) AS quota_docs
    FROM w
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (T=2, i.e. weight ∝ n^(1/2)): the
    standard rebalancing that up-samples small high-quality sources and
    down-samples the web-scale crawl so no source dominates the token
    budget. Emits per-source sampling share and an integer document quota
    out of a 1,000,000-doc budget.

    Exactness across engines: sqrt is IEEE-correctly-rounded (identical
    doubles), the weight is quantized once to integer MICROS (floor —
    exact), and every subsequent sum/division is integer or a single
    int/int double divide — order-independent, hash-stable. The α
    exponent is restricted to .5 precisely because pow(x, 0.33) is NOT
    guaranteed bit-identical across libm implementations.

    Scale: one groupBy(source) on the corpus (low-cardinality keys,
    map-side partial agg), then a 20-row unpartitioned window — driver-
    trivial. The quota feeds corpus_mix_sample's hash-based sampler."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = src.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000.0)
        .cast("long")
        .alias("w_micros"),
    )
    tot = F.sum("w_micros").over(Window.partitionBy())
    # quota: floor of an exact-int double division — both operands are
    # exact integers < 2^53, so the divide is identically rounded on any
    # IEEE engine (the same trick certifies the pandas paths; DuckDB's
    # BIGINT // would differ from floor(double/double) at rounding edges,
    # so BOTH sides use the floor-of-double form)
    num = (F.lit(_MIX_BUDGET_DOCS).cast("long") * F.col("w_micros")).cast("double")
    return w.select(
        "source",
        "n_docs",
        "w_micros",
        (100.0 * (F.col("w_micros").cast("double") / tot.cast("double"))).alias(
            "share_pct"
        ),
        F.floor(num / tot.cast("double")).cast("long").alias("quota_docs"),
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


@register_query(
    "snapshot_diff_cdc",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_orderstatus AS status_a
        FROM orders WHERE o_orderkey % 9 <> 0
    ),
    snap_b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
                   AS status_b
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT
        COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        CASE
            WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed'
        END AS change_type,
        status_a AS old_status,
        status_b AS new_status
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR status_a <> status_b
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two table snapshots: classify every
    key as added / removed / changed (unchanged rows are dropped — they are
    the overwhelming majority and a CDC feed must not carry them). The two
    snapshots are deterministic slices of ``orders``: snapshot B drops keys
    ≡0 (mod 7), gains keys ≡0 (mod 9) relative to A, and rewrites the
    status of keys ≡0 (mod 5) — simulating deletes/inserts/updates.

    This is the batch complement of upsert_snapshot (which APPLIES a
    changeset; this one DERIVES it) — together they round-trip a table
    version. Scale: one full-outer shuffle join on the key; at 100 TB both
    snapshots would be bucketed by the key (see bucketed_join_no_shuffle)
    so the diff is a zero-shuffle zip of co-located buckets, and the
    unchanged-row drop happens before any row leaves the join stage."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 9 != 0).select(
        F.col("o_orderkey").alias("key_a"), F.col("o_orderstatus").alias("status_a")
    )
    b = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("key_b"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_b"),
    )
    joined = a.join(b, a.key_a == b.key_b, "full_outer")
    return joined.select(
        F.coalesce("key_a", "key_b").alias("o_orderkey"),
        F.when(F.col("key_a").isNull(), F.lit("added"))
        .when(F.col("key_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        F.col("status_a").alias("old_status"),
        F.col("status_b").alias("new_status"),
    ).filter(
        F.col("key_a").isNull()
        | F.col("key_b").isNull()
        | (F.col("status_a") != F.col("status_b"))
    )

# ---------------------------------------------------------------------------
# Model-based quality scoring (hashed-ngram linear classifier)
# ---------------------------------------------------------------------------

_CLF_BUCKETS = 1024
_CLF_MIX = 2654435761  # Knuth multiplicative constant
_CLF_BIAS = -3


@register_query(
    "quality_classifier_logit",
    oracle=f"""
    SELECT
        doc_id,
        CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
            AS n_tokens,
        CAST({_CLF_BIAS} + list_sum(list_transform(
            list_filter(string_split(text, ' '), w -> w <> ''),
            t -> ((CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                   % {_CLF_BUCKETS}) * {_CLF_MIX}) % 17 - 8
        )) AS BIGINT) AS logit,
        ({_CLF_BIAS} + list_sum(list_transform(
            list_filter(string_split(text, ' '), w -> w <> ''),
            t -> ((CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                   % {_CLF_BUCKETS}) * {_CLF_MIX}) % 17 - 8
        ))) > 0 AS kept
    FROM documents
    """,
)
def quality_classifier_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-BASED quality filtering — the fastText-classifier shape
    (hash tokens into a fixed feature space, sum per-feature weights into
    a logit, threshold) that complements the heuristic Gopher gates. The
    weights here are a deterministic stand-in derived from the bucket id
    (a real deployment broadcasts a trained weight array instead — same
    plan, the weight lookup just reads a 1024-float literal); the
    PLUMBING is the production shape and every step is integer-exact, so
    the full score is oracle-certified.

    Cross-engine exactness: the feature hash is the md5-prefix trick
    (conv(substring(md5(t),1,15),16,10) == CAST('0x'||... AS BIGINT),
    bit-identical 60-bit ints), and weights/logits stay in BIGINT. The
    logit is exposed raw rather than sigmoid(logit): exp() is not
    bit-stable across libm implementations, and thresholding is
    monotone-invariant to the sigmoid anyway.

    Scale: ZERO shuffle — the per-document weight sum runs as
    aggregate(transform(tokens, ...)) INSIDE the scan stage (no explode,
    no groupBy; the token array never leaves the row). Filtering on
    `kept` composes map-side with the rest of the pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def weight(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % _CLF_BUCKETS
        )
        return (bucket * F.lit(_CLF_MIX)) % 17 - 8

    logit = F.lit(_CLF_BIAS) + F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        logit.cast("bigint").alias("logit"),
        (logit > 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Quota-driven corpus sampling (applies the temperature mixture)
# ---------------------------------------------------------------------------

_MIX_APPLY_BUDGET = 200  # documents to draw across sources


@register_query(
    "corpus_mix_apply",
    oracle=f"""
    WITH w AS (
        SELECT source,
               CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_micros
        FROM documents GROUP BY source
    ),
    quota AS (
        SELECT source,
               CAST(floor(CAST({_MIX_APPLY_BUDGET} * w_micros AS DOUBLE)
                          / CAST(CAST(SUM(w_micros) OVER () AS BIGINT) AS DOUBLE))
                    AS BIGINT) AS quota_docs
        FROM w
    ),
    ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '/mix-apply-1'), doc_id
               ) AS rk
        FROM documents
    )
    SELECT r.source, r.doc_id, CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rk <= {_MIX_APPLY_BUDGET} AND r.rk <= q.quota_docs
    """,
)
def corpus_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the temperature mixture: draw each source's integer quota
    (the corpus_mixture_weights formula) as a deterministic pseudo-random
    sample — rank documents per source by a portable md5 order and keep
    rank <= quota. Together with corpus_mixture_weights this is the full
    rebalance: derive quotas, then materialize exactly that many documents
    per source, reproducibly on any engine/partitioning/rerun (no RNG).

    Scale: the rank <= BUDGET *literal* filter precedes the data-driven
    quota refinement so Spark plans a WindowGroupLimit (per-partition
    top-k per source — only ~BUDGET rows per source survive each map
    task) instead of fully ranking every source; the quota table is a
    broadcast join. One shuffle on source (salt heavy sources at 100 TB
    or pre-aggregate per partition — the group-limit already bounds what
    each task emits)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(
        F.floor(F.sqrt(F.count(F.lit(1)).cast("double")) * 1000000.0)
        .cast("long")
        .alias("w_micros")
    )
    tot = F.sum("w_micros").over(Window.partitionBy())
    quota = w.select(
        "source",
        F.floor(
            (F.lit(_MIX_APPLY_BUDGET).cast("long") * F.col("w_micros")).cast("double")
            / tot.cast("double")
        )
        .cast("long")
        .alias("quota_docs"),
    )
    order_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/mix-apply-1")))
    win = Window.partitionBy("source").orderBy(order_key, F.col("doc_id"))
    ranked = (
        docs.select("source", "doc_id", F.row_number().over(win).alias("rk"))
        .filter(F.col("rk") <= _MIX_APPLY_BUDGET)  # literal: WindowGroupLimit
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("quota_docs"))
        .select("source", "doc_id", F.col("rk").cast("long").alias("rk"))
    )

# ---------------------------------------------------------------------------
# The end-to-end curation pipeline (one logical plan)
# ---------------------------------------------------------------------------

_E2E_BUDGET = 150  # sampled documents across sources after gating


@register_query(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH clf AS MATERIALIZED (
        SELECT doc_id, source, text,
               {_CLF_BIAS} + list_sum(list_transform(
                   list_filter(string_split(text, ' '), w -> w <> ''),
                   t -> ((CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                          % {_CLF_BUCKETS}) * {_CLF_MIX}) % 17 - 8
               )) AS logit
        FROM documents WHERE doc_id % 41 <> 0
    ),
    kept AS MATERIALIZED (SELECT doc_id, source, text FROM clf WHERE logit > 0),
    toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents WHERE doc_id % 41 = 0
    ),
    ev AS MATERIALIZED (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
                        i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS shingle
        FROM toks WHERE len(t) >= 4
    ),
    ktoks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM kept
    ),
    ksh AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
                       i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS shingle
        FROM ktoks WHERE len(t) >= 4
    ),
    contaminated AS MATERIALIZED (
        SELECT DISTINCT k.doc_id FROM ksh k JOIN ev USING (shingle)
    ),
    surv AS MATERIALIZED (
        SELECT k.* FROM kept k LEFT JOIN contaminated c USING (doc_id)
        WHERE c.doc_id IS NULL
    ),
    w AS (
        SELECT source,
               CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_micros
        FROM surv GROUP BY source
    ),
    quota AS (
        SELECT source,
               CAST(floor(CAST({_E2E_BUDGET} * w_micros AS DOUBLE)
                          / CAST(CAST(SUM(w_micros) OVER () AS BIGINT) AS DOUBLE))
                    AS BIGINT) AS quota_docs
        FROM w
    ),
    ranked AS (
        SELECT source, doc_id, text,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '/e2e-sample-1'), doc_id
               ) AS rk
        FROM surv
    ),
    sampled AS (
        SELECT r.source, r.doc_id, r.text
        FROM ranked r JOIN quota q USING (source)
        WHERE r.rk <= {_E2E_BUDGET} AND r.rk <= q.quota_docs
    ),
    ks AS (
        SELECT source, doc_id, text,
               unnest(range(0, CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0)
                                    AS BIGINT) + 1)) AS k
        FROM sampled WHERE length(text) > 0
    ),
    chunks AS (
        SELECT source, doc_id,
               length(substring(text, CAST(k * {_CHUNK_STRIDE} + 1 AS INT),
                                {_CHUNK_CHARS})) AS clen
        FROM ks
    )
    SELECT
        source,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(COUNT(*) AS BIGINT) AS n_chunks,
        CAST(SUM(clen) AS BIGINT) AS chunk_chars
    FROM chunks GROUP BY source
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 curation tier composed END TO END in one logical plan:
    model-based quality gate (hashed-feature logit > 0) -> benchmark
    decontamination (drop training docs sharing a 4-gram with the eval
    slice) -> temperature-quota sampling (sqrt weights over survivors,
    portable md5 order) -> context-window chunking -> per-source corpus
    stats. Every stage is the standalone operator declared above, composed
    declaratively so Catalyst optimizes ACROSS stages: the classifier gate
    is a map-side filter that prunes before any shingle explodes, the
    contaminated set comes back through a BROADCAST anti join (no corpus
    shuffle to subtract it), and the chunk explode runs on the ~BUDGET
    sampled docs only.

    At 100 TB: one corpus scan feeding map-side gating + shingle probes,
    one shuffle on source for the quota window (WindowGroupLimit-capped),
    and small-side broadcasts everywhere else. This is the plan a user
    would actually run nightly; the standalone entries are its unit-tested
    parts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def weight(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % _CLF_BUCKETS
        )
        return (bucket * F.lit(_CLF_MIX)) % 17 - 8

    logit = F.lit(_CLF_BIAS) + F.aggregate(
        F.transform(toks, weight), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    # materialized once (round-15 opt): the per-token md5 classifier gate
    # is the plan's priciest map stage and THREE subtrees consume its
    # survivors (the contamination probe, the anti-join, and through it
    # the quota/sample passes) — each re-ran the gate before the cut
    kept = cut_lineage(
        docs.filter(F.col("doc_id") % 41 != 0)
        .filter(logit > 0)
        .select("doc_id", "source", "text")
    )

    n = 4
    ev = (
        _shingles(docs.filter(F.col("doc_id") % 41 == 0), n)
        .select("shingle")
        .distinct()
    )
    contaminated = (
        _shingles(kept, n).join(F.broadcast(ev), "shingle").select("doc_id").distinct()
    )
    surv = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")

    from pyspark.sql.window import Window

    w = surv.groupBy("source").agg(
        F.floor(F.sqrt(F.count(F.lit(1)).cast("double")) * 1000000.0)
        .cast("long")
        .alias("w_micros")
    )
    tot = F.sum("w_micros").over(Window.partitionBy())
    quota = w.select(
        "source",
        F.floor(
            (F.lit(_E2E_BUDGET).cast("long") * F.col("w_micros")).cast("double")
            / tot.cast("double")
        )
        .cast("long")
        .alias("quota_docs"),
    )
    order_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/e2e-sample-1")))
    win = Window.partitionBy("source").orderBy(order_key, F.col("doc_id"))
    sampled = (
        surv.select("source", "doc_id", "text", F.row_number().over(win).alias("rk"))
        .filter(F.col("rk") <= _E2E_BUDGET)  # literal: WindowGroupLimit
        .join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("quota_docs"))
        .filter(F.length("text") > 0)
    )
    n_chunks_minus1 = F.floor((F.length("text") - 1) / _CHUNK_STRIDE).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_minus1),
        lambda k: F.col("text").substr(
            k * F.lit(_CHUNK_STRIDE) + F.lit(1), F.lit(_CHUNK_CHARS)
        ),
    )
    exploded = sampled.select(
        "source", "doc_id", F.explode(chunks).alias("chunk")
    )
    return exploded.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk").cast("long")).alias("chunk_chars"),
    )


# ---------------------------------------------------------------------------
# Token-budget-constrained corpus selection (round 8)
# ---------------------------------------------------------------------------


@register_query(
    "token_budget_select",
    # The oracle states the NAIVE spec: one global order (quality desc,
    # md5, doc_id), keep the prefix whose running token total stays within
    # the budget. The Spark plan computes the SAME set scalably (two-pass
    # threshold; see the function docstring) — equality of the two is
    # exactly what the hash check certifies.
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                    AS BIGINT) AS n_tokens,
               CAST({_CLF_BIAS} + list_sum(list_transform(
                   list_filter(string_split(text, ' '), w -> w <> ''),
                   t -> ((CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                          % {_CLF_BUCKETS}) * {_CLF_MIX}) % 17 - 8
               )) AS BIGINT) AS logit,
               md5(CAST(doc_id AS VARCHAR) || '/budget-1') AS tie
        FROM documents
    ),
    budget AS (
        SELECT CAST(SUM(n_tokens) // 3 AS BIGINT) AS b FROM scored
    ),
    runsum AS (
        SELECT doc_id, source, n_tokens, logit,
               SUM(n_tokens) OVER (
                   ORDER BY logit DESC, tie, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM scored
    )
    SELECT r.doc_id, r.source, r.n_tokens, r.logit
    FROM runsum r CROSS JOIN budget
    WHERE r.cum <= budget.b
    """,
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a TOKEN BUDGET with the highest-quality documents — the
    selection step that turns "we can afford N tokens of pretraining data"
    into a concrete keep list. Spec: order docs by (quality logit desc,
    portable md5 tie-break), keep the prefix whose running token total
    stays within budget = total_tokens/3.

    The naive spec is a GLOBAL running sum — a single-partition window
    that dies at 100 TB. This plan computes the identical set in two
    passes, which is the point of the operator:

    1. bucket pass: aggregate (sum_tokens) per distinct logit value — the
       histogram is |distinct scores| rows (bounded by the classifier's
       integer score range, thousands, NOT corpus-sized), so its
       descending cumulative window is effectively free;
    2. threshold: every doc in a bucket whose cumulative total fits
       entirely is kept outright (map-side broadcast-join decision, no
       per-doc window); only the single BOUNDARY bucket ranks its own
       docs (md5 order) through a running sum over a 1/|buckets| slice
       to spend the remaining budget.

    The DuckDB oracle runs the naive global spec; the hash match proves
    the two-pass plan selects the exact same documents — the
    oracle-as-spec, plan-as-scale-path discipline this repo uses for
    every scalable rewrite.

    Exactness: tokens/logits/cumulative sums are all BIGINT; the only
    strings are md5 tie-breaks (portable); no floats anywhere."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def weight(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % _CLF_BUCKETS
        )
        return (bucket * F.lit(_CLF_MIX)) % 17 - 8

    logit = (
        F.lit(_CLF_BIAS)
        + F.aggregate(
            F.transform(toks, weight), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        )
    ).cast("bigint")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        logit.alias("logit"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/budget-1"))).alias(
            "tie"
        ),
    )
    scored = cut_lineage(scored)  # feeds histogram + budget + doc passes once

    budget = scored.agg(
        (F.sum("n_tokens") / 3).cast("long").alias("b")  # floor: exact ints
    )
    # pass 1: per-score histogram + descending cumulative totals (histogram-
    # sized window: |distinct logits| rows, NOT corpus-sized)
    hist = scored.groupBy("logit").agg(F.sum("n_tokens").alias("btok"))
    wcum = Window.orderBy(F.desc("logit")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "logit",
        F.sum("btok").over(wcum).alias("cum"),
        (F.sum("btok").over(wcum) - F.col("btok")).alias("cum_before"),
    ).crossJoin(F.broadcast(budget))
    decisions = cum.select(
        "logit",
        (F.col("cum") <= F.col("b")).alias("full_keep"),
        # boundary: the first bucket that overflows; it gets what's left
        ((F.col("cum") > F.col("b")) & (F.col("cum_before") <= F.col("b"))).alias(
            "boundary"
        ),
        (F.col("b") - F.col("cum_before")).alias("remaining"),
    ).filter(F.col("full_keep") | F.col("boundary"))

    joined = scored.join(F.broadcast(decisions), "logit")
    kept_full = joined.filter(F.col("full_keep")).select(
        "doc_id", "source", "n_tokens", "logit"
    )
    # pass 2: only the boundary bucket's docs rank + running-sum (a
    # 1/|buckets| slice of the corpus, partitioned by its single logit key)
    wb = Window.partitionBy("logit").orderBy("tie", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept_boundary = (
        joined.filter(F.col("boundary"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "logit",
            (F.sum("n_tokens").over(wb) <= F.col("remaining")).alias("fits"),
        )
        .filter(F.col("fits"))
        .drop("fits")
    )
    return kept_full.unionByName(kept_boundary)


# ---------------------------------------------------------------------------
# Split-leakage audit (round 9)
# ---------------------------------------------------------------------------


@register_query(
    "split_leakage_report",
    oracle="""
    WITH assigned AS (
        SELECT md5(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text, ' '), w -> w <> ''))), ' '))
                   AS dig,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT text,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || '/split-seed-1'), 1, 8)) AS BIGINT) % 100 AS b
            FROM documents
        )
    ),
    g AS (
        SELECT dig, split, CAST(COUNT(*) AS BIGINT) AS c
        FROM assigned GROUP BY dig, split
    ),
    x AS (
        SELECT a.dig, a.split AS split_a, b.split AS split_b,
               CASE WHEN a.split = b.split THEN a.c * (a.c - 1) // 2
                    ELSE a.c * b.c END AS np
        FROM g a JOIN g b ON a.dig = b.dig AND a.split <= b.split
    )
    SELECT split_a, split_b,
           CAST(SUM(np) AS BIGINT) AS n_dup_pairs,
           CAST(COUNT(DISTINCT dig) AS BIGINT) AS n_shared_digests
    FROM x
    WHERE np > 0
    GROUP BY split_a, split_b
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN/TEST LEAKAGE at the split level: apply the engine's OWN
    deterministic 80/10/10 split rule (bit-identical to
    deterministic_split — same seed string, same md5 prefix), canonicalize
    each document to its token-set digest (the cross_source_dup_matrix
    grain, which catches reordered copies byte-exact splitting misses),
    and report how many duplicate pairs land WITHIN each split and —
    the leakage signal — ACROSS split pairs. A nonzero (train, test) row
    is exactly the eval contamination ngram_decontaminate hunts at the
    n-gram level, caught earlier and at the whole-document grain.

    Scale: the cross_source_dup_matrix discipline verbatim — per-(digest,
    split) COUNTS (map-side partial agg), count-level self-join on digest;
    a million-way duplicate group costs one row per split, never c²
    pairs. The split assignment itself is map-only (hash of the key)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    dig = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/split-seed-1"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    g = docs.select(dig.alias("dig"), split.alias("split")).groupBy(
        "dig", "split"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = g.select("dig", F.col("split").alias("split_a"), F.col("c").alias("ca"))
    b = g.select("dig", F.col("split").alias("split_b"), F.col("c").alias("cb"))
    x = a.join(b, ["dig"]).filter(F.col("split_a") <= F.col("split_b")).select(
        "dig",
        "split_a",
        "split_b",
        F.when(
            F.col("split_a") == F.col("split_b"),
            F.expr("ca * (ca - 1) div 2"),
        )
        .otherwise(F.col("ca") * F.col("cb"))
        .alias("np"),
    )
    return (
        x.filter(F.col("np") > 0)
        .groupBy("split_a", "split_b")
        .agg(
            F.sum("np").cast("long").alias("n_dup_pairs"),
            F.count_distinct("dig").cast("long").alias("n_shared_digests"),
        )
    )

_QWM_LOGIT_SQL = f"""{_CLF_BIAS} + list_sum(list_transform(
            list_filter(string_split(text, ' '), w -> w <> ''),
            t -> ((CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
                   % {_CLF_BUCKETS}) * {_CLF_MIX}) % 17 - 8
        ))"""


@register_query(
    "quality_weighted_mixture",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               CAST(({_QWM_LOGIT_SQL}) > 0 AS BIGINT) AS kept
        FROM documents
    ),
    src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(kept) AS BIGINT) AS n_kept
        FROM per_doc GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_kept,
               (CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)
                * n_kept) // n_docs AS adj_w_micros
        FROM src
    )
    SELECT source, n_docs, n_kept, adj_w_micros,
           100.0 * (CAST(adj_w_micros AS DOUBLE)
                    / CAST(CAST(SUM(adj_w_micros) OVER () AS BIGINT) AS DOUBLE))
               AS share_pct,
           CAST(floor(CAST({_MIX_BUDGET_DOCS} * adj_w_micros AS DOUBLE)
                      / CAST(CAST(SUM(adj_w_micros) OVER () AS BIGINT) AS DOUBLE))
                AS BIGINT) AS quota_docs
    FROM w
    """,
)
def quality_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_mixture_weights x model quality: the temperature weight
    (w ∝ sqrt(n), T=2) DISCOUNTED by each source's classifier pass rate —
    adj_w = w_micros * n_kept / n_docs in pure BIGINT arithmetic. This is
    how a real mixture is actually set: volume-tempered so no crawl
    dominates, then quality-tempered so a big low-quality source cannot
    buy back its share with volume. Quotas come out of the same 1M-doc
    budget as corpus_mixture_weights, so the two tables diff directly.

    Exactness: kept = (logit > 0) is the certified integer classifier
    decision (quality_classifier_logit's exact expression); sqrt is
    IEEE-correctly-rounded; micros are floored once; the discount is an
    exact integer multiply-then-div; shares/quotas are single int/int
    double divisions (the corpus_mixture_weights rules).

    Scale: one groupBy(source) with map-side partial aggregation (the
    logit is a scan-stage expression), then a |sources|-row window."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def weight(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % _CLF_BUCKETS
        )
        return (bucket * F.lit(_CLF_MIX)) % 17 - 8

    logit = F.lit(_CLF_BIAS) + F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    src = docs.select("source", (logit > 0).cast("long").alias("kept")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
    )
    w = src.withColumn(
        "adj_w_micros",
        F.expr(
            "(CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)"
            " * n_kept) div n_docs"
        ),
    )
    w_all = Window.partitionBy()
    tot = F.sum("adj_w_micros").over(w_all).cast("long")
    return w.select(
        "source",
        "n_docs",
        "n_kept",
        "adj_w_micros",
        (
            F.lit(100.0) * (F.col("adj_w_micros").cast("double") / tot.cast("double"))
        ).alias("share_pct"),
        F.floor(
            (F.lit(_MIX_BUDGET_DOCS) * F.col("adj_w_micros")).cast("double")
            / tot.cast("double")
        )
        .cast("long")
        .alias("quota_docs"),
    )


# late-bind the ingest twin's oracle: streaming_twins (imported before
# this module) registered streaming_mixture_twin with oracle=None; the
# twin shares this batch operator's output contract verbatim.
from kasper_spark.registry import ORACLES as _OR  # noqa: E402

assert "quality_weighted_mixture" in _OR, "batch mixture oracle missing"
_OR["streaming_mixture_twin"] = _OR["quality_weighted_mixture"]


# ---------------------------------------------------------------------------
# Curriculum phase assignment (round 11)
# ---------------------------------------------------------------------------


# Naive-spec oracle shared by the certified spec form and the histogram
# scale form (curriculum_phases_hist) — exact rank equality pins both.
_CURRICULUM_ORACLE = """
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, n_tokens,
               CAST(n_letters AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                   AS difficulty,
               CAST(NTILE(3) OVER (
                   ORDER BY CAST(n_letters AS DOUBLE)
                            / CAST(n_tokens AS DOUBLE), doc_id
               ) AS BIGINT) AS phase
        FROM per_doc
        WHERE n_tokens > 0
    )
    SELECT phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
           MIN(difficulty) AS min_difficulty,
           MAX(difficulty) AS max_difficulty,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(SUM(n_tokens)) OVER (ORDER BY phase) AS BIGINT)
               AS cumulative_tokens
    FROM scored GROUP BY phase ORDER BY phase
    """


def _curriculum_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, difficulty): the per-document
    difficulty table shared by the spec and histogram forms."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("long")
        .alias("n_letters"),
    ).filter(F.col("n_tokens") > 0)
    return per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        (
            F.col("n_letters").cast("double") / F.col("n_tokens").cast("double")
        ).alias("difficulty"),
    )


def _curriculum_report(scored: DataFrame) -> DataFrame:
    """Phase-level aggregation + cumulative token schedule over a
    (…, n_tokens, difficulty, phase) table."""
    from pyspark.sql.window import Window

    agg = scored.groupBy("phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("phase_tokens"),
        F.min("difficulty").alias("min_difficulty"),
        F.max("difficulty").alias("max_difficulty"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    w_cum = Window.orderBy("phase").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "*", F.sum("phase_tokens").over(w_cum).cast("long").alias("cumulative_tokens")
    ).orderBy("phase")


@register_query("curriculum_phases", oracle=_CURRICULUM_ORACLE)
def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment (Bengio et al., ICML'09, the
    easy-to-hard schedule pretraining runs actually use): rank every
    document by a difficulty proxy (mean word length — cheap, monotone
    with readability on this corpus), split the ranking into 3 equal
    phases with NTILE, and report each phase's doc count, token budget,
    difficulty envelope, and the cumulative token schedule a trainer
    would consume phase by phase.

    Determinism: difficulty is a single divide of exact integer counts
    (letters / tokens — bit-identical both engines), NTILE ties break on
    doc_id, and phase totals are integer sums; the cumulative schedule
    is a 3-row ordered window over exact BIGINTs.

    Scale: map-side per-doc counts (no explode — length/replace string
    ops), one global NTILE window over doc-count rows — the certified
    SPEC form; curriculum_phases_hist is the executable scale form
    (identical phases from the difficulty-histogram prefix scan, no
    global row sort; r12 verdict ticket #4)."""
    from pyspark.sql.window import Window

    scored0 = _curriculum_scored(spark, sf_dir)
    scored = scored0.select(
        "doc_id",
        "source",
        "n_tokens",
        "difficulty",
        F.ntile(3)
        .over(Window.orderBy("difficulty", "doc_id"))
        .cast("long")
        .alias("phase"),
    )
    return _curriculum_report(scored)


@register_query("curriculum_phases_hist", oracle=_CURRICULUM_ORACLE)
def curriculum_phases_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTABLE scale form of curriculum_phases (r12 verdict
    ticket #4): identical output against the SAME naive-spec oracle.
    Each document's global difficulty rank comes from the difficulty
    HISTOGRAM's cumulative window (|distinct difficulty values| rows —
    difficulty is a ratio of two bounded integers, so the domain is far
    smaller than the corpus) plus a partitioned row_number within the
    tie group; the 3-way phase is the closed-form NTILE split of that
    rank (functions/ranks.py). Rank equality is exact (same doc_id
    tiebreak), so phase assignment — and the oracle hash — match the
    window spec bit-for-bit while no document row crosses a global
    sort."""
    from kasper_spark.functions.ranks import hist_prefix_rank, ntile_from_rank

    df = hist_prefix_rank(
        _curriculum_scored(spark, sf_dir), "difficulty", "doc_id", "_i", n_name="_n"
    )
    scored = df.select(
        "doc_id",
        "source",
        "n_tokens",
        "difficulty",
        ntile_from_rank(F.col("_i"), F.col("_n"), 3).alias("phase"),
    )
    return _curriculum_report(scored)
