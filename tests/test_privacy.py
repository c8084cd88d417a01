"""PII redaction: crafted-string behavior + map-only plan shape.

The oracle-parity sweep certifies the operator end-to-end vs DuckDB; these
tests pin the redaction semantics on adversarial inputs the synthetic
corpus can't produce.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kasper_spark.operators.privacy import pii_counts, redact_pii, pii_redact
from tests.conftest import SF_SMOKE

CASES = [
    # (input, expected redaction)
    (
        "mail alice.smith+spam@sub.example.co.uk today",
        "mail <EMAIL> today",
    ),
    ("server at 192.168.100.2, port 80", "server at <IP>, port 80"),
    ("ssn 123-45-6789 on file", "ssn <SSN> on file"),
    ("call 555-867-5309 now", "call <PHONE> now"),
    # email whose domain embeds a dotted quad: EMAIL-before-IP order keeps
    # it a single token
    ("x bob@10.0.0.1.example.com y", "x <EMAIL> y"),
    # several categories in one string
    (
        "a@b.co 1.2.3.4 111-22-3333 222-333-4444",
        "<EMAIL> <IP> <SSN> <PHONE>",
    ),
    # repeated matches all masked
    ("a@b.co c@d.org", "<EMAIL> <EMAIL>"),
    # near-misses stay untouched: 3-3-4 needs word boundaries and exact
    # group widths; 1.2.3 is not a quad; bare @ is not an email
    ("55-867-5309 1.2.3 not@an email x5555-867-53099", None),
    ("", None),
]


@pytest.fixture(scope="module")
def redacted_rows(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(CASES)], "id long, t string"
    )
    out = df.select(
        "id",
        redact_pii(F.col("t")).alias("red"),
        *pii_counts(F.col("t")).values(),
    )
    return {r["id"]: r for r in out.collect()}


def test_redaction_cases(redacted_rows):
    for i, (src, expected) in enumerate(CASES):
        got = redacted_rows[i]["red"]
        assert got == (expected if expected is not None else src), (i, src, got)


def test_counts_match_masks(redacted_rows):
    r = redacted_rows[5]  # the all-four-categories case
    assert (r["n_email"], r["n_ip"], r["n_ssn"], r["n_phone"]) == (1, 1, 1, 1)
    assert redacted_rows[7]["n_phone"] == 0
    assert redacted_rows[6]["n_email"] == 2


def test_pii_redact_plan_is_map_only(spark):
    """scan -> project, no exchange: the scrub pass must not shuffle."""
    plan = pii_redact(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_streaming_t_closeness_matches_batch(spark):
    """The ingest twin's merged cell partials must reproduce the batch
    audit exactly — same classes, same n_orders, bit-identical t_emd
    (exact-integer EMD numerators, one double division)."""
    from kasper_spark.registry import QUERIES, load_all_operators

    load_all_operators()

    def keyed(df):
        return {
            (r["c_nationkey"], r["c_mktsegment"], r["acctbal_bin"]): (
                r["n_orders"],
                r["t_emd"],
                r["at_risk"],
            )
            for r in df.collect()
        }

    batch = keyed(QUERIES["t_closeness_audit"](spark, SF_SMOKE))
    twin = keyed(QUERIES["streaming_t_closeness_twin"](spark, SF_SMOKE))
    assert twin == batch and batch
