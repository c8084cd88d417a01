"""Similarity search over embedding columns (array<float>).

North-star operators (absent in the reference, which stores only opaque
bytes — /root/reference/store.go:16-31): approximate-nearest-neighbor search
with a brute-force-exact baseline and an LSH-bucketed scale path.

Engine-exactness: dot products accumulate in DECIMAL so Spark and the DuckDB
oracle produce bit-identical doubles (see functions/exact.py rationale);
pointwise double ops (sqrt, divide) are IEEE-deterministic on both engines.

Scale notes:
- brute-force is O(|Q| x N) — correct baseline and fine when |Q| is small
  (the typical "find neighbors of this batch" case). A full N x N pass at
  100 TB must use the LSH variant: random-hyperplane signatures bucket the
  vectors, a same-bucket self-join replaces the cross join, cutting
  candidates by ~2^bits.
- vectors travel the shuffle once, as float arrays; the score expression is
  whole-stage-codegen JVM work, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import register_query

_N_QUERY = 20  # bounded query subset for the oracle-checked baseline
_TOP_K = 5
_LSH_BITS = 12


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent exact dot product of two float-array columns.

    Per-element product happens in double (deterministic), each product is
    rounded once into decimal(38,12) (deterministic), and the decimal sum is
    exact — so the final double is identical on any engine/partitioning.
    """
    # precision 30 (not 38): decimal(30,12)+decimal(30,12) -> decimal(31,12)
    # stays under 38, so the addition is exact and the cast back to (30,12)
    # is lossless for these magnitudes. At precision 38 Spark would shrink
    # the scale per step (deterministic but engine-specific rounding).
    prods = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,12)"),
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    ).cast("double")


def dot_exact_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot_exact` (1-based list indexing)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) AS DECIMAL(30,12)))) AS DOUBLE)"
    )


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


@register_query(
    "embedding_norms",
    oracle=f"""
    SELECT
        label,
        COUNT(*) AS n_vecs,
        CAST(SUM(CAST(sqrt({dot_exact_sql('embedding', 'embedding')}) AS DECIMAL(38,6))) AS DOUBLE)
            / COUNT(*) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics — exercises array numerics
    end-to-end with an engine-exact result.

    The norm (a computed double) is cast to decimal at scale 6, not deeper:
    DuckDB's double->decimal cast scales-then-rounds in double arithmetic,
    so at scale 10 it disagrees with Java's exact-expansion rounding for a
    measurable fraction of values; at scale 6 the disagreement window is
    ~1e-10 relative (negligible)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = norm_exact(F.col("embedding"))
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum(F.col("nrm").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_norm"
            ),
        )
    )


@register_query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe,
               sqrt({dot_exact_sql('embedding', 'embedding')}) AS qn
        FROM embeddings WHERE vec_id < {_N_QUERY}
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding AS ce,
               sqrt({dot_exact_sql('embedding', 'embedding')}) AS cn
        FROM embeddings
    ),
    scored AS (
        SELECT
            query_id,
            neighbor_id,
            {dot_exact_sql('qe', 'ce')} / (qn * cn) AS cosine
        FROM q JOIN c ON query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    WHERE rank <= {_TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a bounded query set (the ANN
    baseline). Norms are precomputed per side before the join so the O(QxN)
    stage does one exact dot + one divide per pair; top-k is a rank-limited
    window (per-group heap, no global sort)."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.select(
        "vec_id", "embedding", norm_exact(F.col("embedding")).alias("nrm")
    )
    q = (
        with_norm.filter(F.col("vec_id") < _N_QUERY)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    c = with_norm.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_exact(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOP_K)
    )


@register_query("ann_lsh_topk")  # rows-only: hyperplanes are engine-internal
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — the 100 TB scale path.

    Random-hyperplane signatures: bit j of a vector's signature is the sign
    of dot(v, h_j) where hyperplane component h_j[d] is a deterministic
    pseudo-random value in [-1, 1) derived from xxhash64(j, d). Same-bucket
    self-join replaces the cross join; exact cosine re-ranks within buckets.

    Recall is traded for the ~2^bits candidate reduction; tests check
    self-consistency against the brute-force baseline (recall@k), not an SQL
    oracle (the hyperplane derivation is engine-internal).
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64

    # deterministic hyperplane component: xxhash64(j, d) scaled to [-1, 1)
    def _plane_dot(vec: Column, j: int) -> Column:
        comps = F.array(
            *[
                (F.xxhash64(F.lit(j), F.lit(d)) % 10000 / F.lit(5000.0) )
                for d in range(dim)
            ]
        )
        return F.aggregate(
            F.zip_with(vec, comps, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = None
    for j in range(_LSH_BITS):
        bit = F.when(_plane_dot(F.col("embedding"), j) > 0, F.shiftleft(F.lit(1), j)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)

    signed = emb.select(
        "vec_id", "embedding", norm_exact(F.col("embedding")).alias("nrm"), sig.alias("sig")
    )
    a = signed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        "sig",
    )
    b = signed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
        F.col("sig").alias("sig_b"),
    )
    cand = a.join(b, (F.col("sig") == F.col("sig_b")) & (F.col("query_id") != F.col("neighbor_id")))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot_exact(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _TOP_K)
    )


@register_query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding,
               sqrt({dot_exact_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings WHERE vec_id < 200
    )
    SELECT
        a.vec_id AS vec_a,
        b.vec_id AS vec_b,
        {dot_exact_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {dot_exact_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) > 0.8
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (bounded oracle form):
    pairs above a cosine threshold. The unbounded form routes through
    ann_lsh_topk's bucketing at scale."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    e = emb.select("vec_id", "embedding", norm_exact(F.col("embedding")).alias("nrm"))
    a = e.alias("a")
    b = e.alias("b")
    cos = (
        dot_exact(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") > 0.8)
    )
