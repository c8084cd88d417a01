"""Dedicated quality/determinism tests for rows-only queries that had no
oracle AND no other dedicated test (the OPERATORS.md contract: rows-only
entries carry these in place of the SQL hash check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.registry import QUERIES, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_simhash_deterministic_and_structural(spark):
    rows1 = {
        r["doc_id"]: (r["simhash"], r["bucket16"])
        for r in QUERIES["simhash_fingerprints"](spark, SF_SMOKE).collect()
    }
    rows2 = {
        r["doc_id"]: (r["simhash"], r["bucket16"])
        for r in QUERIES["simhash_fingerprints"](spark, SF_SMOKE).collect()
    }
    assert rows1 == rows2  # deterministic across runs/partitionings
    docs = load_table(spark, SF_SMOKE, "documents")
    assert set(rows1) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    for fp, bucket in rows1.values():
        # bucket is the unsigned top 16 bits of the 64-bit fingerprint
        assert bucket == (fp >> 48) & 0xFFFF


def test_simhash_identical_text_same_fingerprint(spark):
    """Two docs with identical token multisets must hash identically —
    the invariant the near-dup bucketing relies on."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(20).collect()
    dup = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs]
        + [(r["doc_id"] + 10_000_000, r["text"]) for r in docs],
        "doc_id long, text string",
    )
    toks = dup.select("doc_id", F.filter(F.split("text", " "), lambda w: w != "").alias("toks"))
    hashes = toks.select(
        "doc_id", F.transform(F.col("toks"), lambda t: F.xxhash64(t)).alias("hs")
    )

    # same bit-sum/threshold construction as the operator
    def bit_sum(bit):
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    fp = None
    for bit in range(64):
        contrib = F.when(bit_sum(bit) > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = contrib if fp is None else fp.bitwiseOR(contrib)
    got = {r["doc_id"]: r["fp"] for r in hashes.select("doc_id", fp.alias("fp")).collect()}
    for r in docs:
        assert got[r["doc_id"]] == got[r["doc_id"] + 10_000_000]


def test_approx_distinct_users_within_error(spark):
    from kasper_spark.operators.analytics import approx_users_estimates

    # the certified contract form must say in-bound everywhere
    for r in QUERIES["approx_distinct_users"](spark, SF_SMOKE).collect():
        assert r["hll_in_bound"] == 1, r
    # and the raw estimate path is independently within 5%
    got = {
        r["event_type"]: r["approx_users"]
        for r in approx_users_estimates(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(exact)
    for etype, est in got.items():
        # rsd=0.01 requested; allow 5x slack at smoke cardinalities
        assert abs(est - exact[etype]) <= max(2, 0.05 * exact[etype])


def test_grouped_map_topn_share_matches_pandas(spark):
    got = {
        r["event_type"]: (r["n_users"], r["top3_share_pct"])
        for r in QUERIES["grouped_map_topn_share"](spark, SF_SMOKE).collect()
    }
    import numpy as np

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id", "value")
    pdf = ev.toPandas()
    pdf["cents"] = np.round(pdf["value"].to_numpy() * 100).astype("int64")
    for etype, grp in pdf.groupby("event_type"):
        per_user = (
            grp.groupby("user_id", as_index=False)["cents"]
            .sum()
            .sort_values(["cents", "user_id"], ascending=[False, True])
        )
        total = int(per_user["cents"].sum())
        top3 = int(per_user["cents"].head(3).sum())
        want = 100.0 * (float(top3) / float(total)) if total else 0.0
        n_users, share = got[etype]
        assert n_users == len(per_user)
        assert share == want  # bit-exact by construction (integer cents)
