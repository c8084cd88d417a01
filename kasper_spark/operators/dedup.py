"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup (its state store is last-write-wins per key, which
*is* exact dedup by key — /root/reference/map.go:37-48); these operators
generalize that to content-based dedup at corpus scale:

- exact dedup: hash-groupBy on a normalized content digest;
- MinHash + LSH banding: near-dup candidate pairs without O(n^2) compare;
- SimHash: 64-bit locality-sensitive fingerprint;
- n-gram / token-set Jaccard: verification metric (oracle-checkable form
  uses token sets; shingled n-grams feed MinHash).

Scale notes:
- exact dedup is one map-side-combinable groupBy on a 16-byte digest — the
  shuffle carries digests, not documents;
- MinHash/LSH shuffles each doc b times (one row per band) keyed by
  (band, band-signature); bucket sizes are the skew risk, so oversized
  buckets are capped (documented in the function);
- all hashing uses xxhash64/md5 with fixed seeds — deterministic across
  runs, executors, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import register_query

# MinHash/LSH parameters: 32 hashes = 8 bands x 4 rows. With the standard
# S-curve, pair-collision prob at jaccard 0.5 is 1-(1-0.5^4)^8 ≈ 0.40, at
# 0.8 ≈ 0.98 — tuned for "near-dup" detection.
_NUM_HASHES = 32
_BANDS = 8
_ROWS_PER_BAND = _NUM_HASHES // _BANDS
_SHINGLE_N = 3
_MAX_BUCKET = 50  # cap pathological LSH buckets (skew guard at scale)


def _tokens(col):
    return F.filter(F.split(col, " "), lambda w: w != "")


def _shingles(tokens_col):
    """Word-level n-gram shingles as strings, distinct."""
    n = _SHINGLE_N
    idx = F.sequence(F.lit(0), F.size(tokens_col) - n)
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + k + 1) for k in range(n)]
            ),
        )
    )


@register_query(
    "dedup_exact",
    oracle="""
    SELECT
        md5(lower(trim(text))) AS content_hash,
        MIN(doc_id) AS keeper_doc_id,
        COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content digest: one deterministic keeper per distinct
    normalized text. groupBy(min) rather than dropDuplicates so the survivor
    is deterministic (dropDuplicates keeps an arbitrary row).

    At 100 TB: the shuffle key is the 32-hex digest, so shuffle volume is
    ~48 bytes/doc regardless of document size; digest computation is
    JVM-side (no Python).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("content_hash"),
            "doc_id",
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register_query(
    "tokenset_jaccard_pairs",
    oracle="""
    WITH sets AS (
        SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), w -> w <> '')) AS ws
        FROM documents
        WHERE doc_id < 40
    )
    SELECT
        a.doc_id AS doc_a,
        b.doc_id AS doc_b,
        len(list_filter(a.ws, w -> list_contains(b.ws, w))) AS n_common,
        CAST(len(list_filter(a.ws, w -> list_contains(b.ws, w))) AS DOUBLE)
            / (len(a.ws) + len(b.ws) - len(list_filter(a.ws, w -> list_contains(b.ws, w)))) AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_filter(a.ws, w -> list_contains(b.ws, w))) AS DOUBLE)
            / (len(a.ws) + len(b.ws) - len(list_filter(a.ws, w -> list_contains(b.ws, w)))) >= 0.5
    """,
)
def tokenset_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard similarity on a bounded candidate subset — the
    verification metric used downstream of MinHash candidates. Jaccard is an
    int/int ratio, so the double result is engine-exact.

    This bounded all-pairs form is the oracle-checkable twin; at scale the
    candidate pairs come from minhash_lsh_candidates instead of a cross join.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sets = docs.select(
        "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("ws")
    )
    a = sets.alias("a")
    b = sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_common"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@register_query("minhash_lsh_candidates")  # rows-only: not SQL-expressible
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates (no O(n^2) compare).

    Pipeline (all JVM-side, no Python UDFs):
      shingle (word 3-grams) -> 32 minhashes via xxhash64(seed, shingle)
      -> 8 bands x 4 rows -> explode one row per band
      -> groupBy (band, signature) -> intra-bucket pairs -> distinct pair
      + estimated jaccard = fraction of agreeing minhashes.

    Scale: docs shuffle once per band keyed by the band signature; bucket
    blowup (the classic LSH skew) is capped at _MAX_BUCKET docs per bucket —
    beyond that a bucket is near-certainly a degenerate shingle set and is
    dropped (logged at scale via metrics, silently here).

    Deterministic: fixed hash seeds; output sorted semantics left to the
    driver (rows-only correctness check).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    sh = toks.select("doc_id", _shingles(F.col("toks")).alias("shingles")).filter(
        F.size("shingles") > 0
    )

    # 32 minhashes: min over shingles of xxhash64(seed_i, shingle).
    # NB: seed binding uses a factory, not a default arg — pyspark infers
    # lambda arity, and a default arg would flip transform() into its
    # (element, index) form.
    def _minhash(seed: int):
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(F.lit(seed), s))
        )

    minhashes = F.array(*[_minhash(i) for i in range(_NUM_HASHES)]).alias("mh")
    sigs = sh.select("doc_id", minhashes)

    # band signatures: md5 of the concatenated row hashes in each band
    bands = sigs.select(
        "doc_id",
        "mh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(F.col("mh"), b * _ROWS_PER_BAND + r + 1)
                                    for r in range(_ROWS_PER_BAND)
                                ],
                            ).cast("binary")
                        ).alias("sig"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "mh", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    # bucket -> intra-bucket pairs (skew-capped)
    buckets = (
        bands.groupBy("band", "sig")
        .agg(
            F.slice(F.array_sort(F.collect_list(F.struct("doc_id", "mh"))), 1, _MAX_BUCKET).alias(
                "members"
            )
        )
        .filter(F.size("members") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda m: F.filter(
                            F.transform(
                                F.col("members"),
                                lambda n: F.struct(
                                    m["doc_id"].alias("doc_a"),
                                    n["doc_id"].alias("doc_b"),
                                    m["mh"].alias("mh_a"),
                                    n["mh"].alias("mh_b"),
                                ),
                            ),
                            lambda p: p["doc_a"] < p["doc_b"],
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.mh_a", "p.mh_b")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / _NUM_HASHES
    )
    return pairs.select(
        "doc_a", "doc_b", est.alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= 0.2)


@register_query("simhash_fingerprints")  # rows-only: not SQL-expressible
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + 16-bit prefix bucket.

    SimHash: for each token, xxhash64(token) contributes +1/-1 per bit
    position weighted by term frequency; the fingerprint sign-thresholds the
    64 sums. Near-dup docs differ in few bits (checked via hamming distance
    in tests). Entirely JVM-side expression work — no Python.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    hashes = toks.select(
        "doc_id", F.transform(F.col("toks"), lambda t: F.xxhash64(t)).alias("hs")
    )
    # bit_sums[i] = sum over tokens of (bit i set ? +1 : -1); bits are static
    # Python ints so shiftright/shiftleft get literal shift amounts.
    def _bit_sum(bit: int):
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    fp = None
    for bit in range(64):
        contrib = F.when(
            _bit_sum(bit) > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)
        ).otherwise(F.lit(0).cast("bigint"))
        fp = contrib if fp is None else fp.bitwiseOR(contrib)
    return hashes.select(
        "doc_id",
        fp.alias("simhash"),
    ).withColumn("bucket16", F.shiftrightunsigned(F.col("simhash"), 48))
