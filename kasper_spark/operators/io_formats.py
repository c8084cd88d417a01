"""File source/sink coverage: CSV, JSON-lines, ORC, and partitioned parquet.

The reference's only source/sink is Kafka (SURVEY.md §2.C "File-format
sources/sinks: none"); its values are opaque bytes the app JSON-decodes
(/root/reference/elasticsearch.go:115-118 even *requires* JSON). A Spark
engine replacing it needs the standard file formats as first-class
sources/sinks, so each query here drives a real write -> read round trip
through one format and is hash-checked against the oracle reading the
ORIGINAL table — certifying the format path is lossless, not just runnable.

Scale notes (100 TB mindset):
- every read supplies an EXPLICIT schema: schema inference is a full extra
  pass over the data (CSV/JSON) and is banned in this engine's hot paths;
- CSV round-trips only exact types (ints/strings) — doubles survive Spark's
  shortest-round-trip float formatting, but keeping money columns out of CSV
  is the recommended practice this module demonstrates;
- the partitioned-parquet query shows the layout decision that matters most
  at 100 TB: partitionBy(low-cardinality time key) => partition pruning turns
  a full scan into a single-partition read (tests/test_io_formats.py asserts
  PartitionFilters in the plan);
- writes land in a per-call temp dir; at scale this is the sink side of A5
  (bulk flush then commit) with the same rename-free semantics parquet
  committers provide.

Environmental gap (probed 2026-08-15, same class as the Kafka jars —
ci/README.md): this pyspark build ships WITHOUT the spark-avro module
(`format("avro")` raises AnalysisException), so an Avro round-trip query
cannot execute here. On a cluster with the standard `spark-avro` package the
csv/jsonl round-trip pattern below applies unchanged (explicit schema,
write -> read -> hash against the original table).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kasper_spark.catalog import load_table
from kasper_spark.functions.exact import dsum_dec, money
from kasper_spark.registry import register_query


def _workdir(tag: str) -> str:
    """Round-trip scratch dir, removed at interpreter exit (the returned
    DataFrame lazily re-reads the written files, so cleanup can't be
    function-scoped)."""
    d = tempfile.mkdtemp(prefix=f"kasper-io-{tag}-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


@register_query(
    "csv_roundtrip_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink -> CSV source round trip (header on, explicit read schema).
    Nation is all ints+strings, the types CSV represents exactly."""
    out = os.path.join(_workdir("csv"), "nation_csv")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", "true"
    ).csv(out)
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", "true")
        .csv(out)
    )


@register_query(
    "jsonl_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def jsonl_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink -> source round trip with an explicit schema,
    including a timestamp (ISO-8601 text in the file, parsed back to the
    identical micros under the session's UTC zone) and a double
    (shortest-round-trip formatting both ways). JSON-lines is the
    reference's de-facto value format — every store value is an app-level
    JSON document (/root/reference/topic_processor_test.go:43-63)."""
    out = os.path.join(_workdir("jsonl"), "orders_json")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    orders.write.mode("overwrite").json(out)
    return spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).json(out)


@register_query(
    "orc_roundtrip_supplier",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink -> source round trip. ORC stores doubles in binary IEEE
    form, so s_acctbal survives bit-exactly; like parquet it carries its
    own schema and column statistics (predicate pushdown works the same
    way)."""
    out = os.path.join(_workdir("orc"), "supplier_orc")
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register_query(
    "partitioned_parquet_prune",
    oracle="""
    SELECT
        CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
    FROM orders
    WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) = 1996
    GROUP BY o_month
    ORDER BY o_month
    """,
)
def partitioned_parquet_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet write, then a partition-PRUNED read:
    orders land under o_year=YYYY/ directories; the o_year = 1996 filter is
    resolved against directory names only (PartitionFilters in the scan —
    asserted in tests/test_io_formats.py), so the other years' files are
    never opened. At 100 TB this is the difference between scanning one
    year and scanning every year — the single most effective data-layout
    optimization Spark offers, and the batch analog of kasper's
    topic-partition data placement (/root/reference/config.go:15-18:
    input partitions ARE the layout)."""
    out = os.path.join(_workdir("part"), "orders_by_year")
    orders = load_table(spark, sf_dir, "orders")
    orders.withColumn("o_year", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("o_year") == 1996)
        .groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_month")
    )


@register_query(
    "bucketed_join_no_shuffle",
    oracle="""
    SELECT
        o_orderpriority,
        COUNT(*) AS n_lines,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,4))
                      * (1 - CAST(l_discount AS DECIMAL(6,4))))
             AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via BUCKETED tables: both sides are written
    bucketBy(8, orderkey) + sortBy, so the sort-merge join consumes the
    stored layout directly — ZERO Exchange operators in the join plan
    (asserted in tests/test_io_formats.py).

    This is THE layout decision for repeated 100 TB fact-fact joins: the
    shuffle is paid once at write time and amortized over every subsequent
    join/aggregation on the bucket key. It is also the batch analog of the
    reference's co-partitioned topic consumption
    (/root/reference/topic_processor.go:117-130: partition i of every topic
    is processed by the same loop — i.e. the data arrives pre-bucketed by
    key, which is exactly what bucketBy persists for batch). The merge hint
    pins SMJ so the demonstration doesn't degrade to a broadcast at toy
    scale; on a real cluster SMJ is what AQE would pick for two large
    bucketed facts anyway."""
    wd = _workdir("bucketed")
    # trust sortBy metadata on read (off by default since Spark 3.0 because
    # MULTI-file buckets only guarantee per-file order and a sorted scan
    # would then plan harmfully; the repartition below writes exactly one
    # file per bucket, which is the precondition that makes this safe).
    # With it, the merge join runs with zero Exchange AND zero Sort.
    # Scope note: the flag only affects bucketed-table scans, and the only
    # bucketed tables in this engine are the ones this operator writes.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for name, df, key in (
        ("kasper_bkt_orders", orders.select("o_orderkey", "o_orderpriority"), "o_orderkey"),
        ("kasper_bkt_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # repartition on the bucket key first: Spark's repartition hash
            # (pmod of Murmur3) is the same function bucketing uses, so each
            # task holds exactly one bucket and writes exactly ONE file per
            # bucket — the precondition for the reader to trust the sortBy
            # metadata and elide the merge-join Sort (multi-file buckets
            # only guarantee per-file order, so Spark re-sorts them)
            df.repartition(8, F.col(key))
            .write.option("path", os.path.join(wd, name))
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    o = spark.table("kasper_bkt_orders")
    l = spark.table("kasper_bkt_lineitem")
    revenue = money("l_extendedprice", 10, 4) * (
        F.lit(1).cast("decimal(1,0)") - money("l_discount", 6, 4)
    )
    return (
        o.hint("merge")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum_dec(revenue).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- Z-order (multi-dimensional clustering) layout ----------------------


def interleave_bits16(u, v):
    """Morton/Z-value: interleave the low 16 bits of two nonnegative longs
    (u -> even bit positions, v -> odd). Pure JVM bit arithmetic, fused by
    whole-stage codegen into one expression."""
    z = F.lit(0).cast("bigint")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(u, i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftright(v, i).bitwiseAND(1), 2 * i + 1)
        )
    return z


def interleave_bits16_sql(u: str, v: str) -> str:
    """The identical Z-value as a DuckDB SQL expression."""
    return " + ".join(
        f"((({u} >> {i}) & 1) << {2 * i}) + ((({v} >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )


_ZORDER_ORACLE = f"""
    WITH ranked AS (
        SELECT
            event_id,
            CAST(floor(percent_rank() OVER (ORDER BY user_id) * 65535) AS BIGINT) AS u16,
            CAST(floor(percent_rank() OVER (ORDER BY value) * 65535) AS BIGINT) AS v16
        FROM events
    )
    SELECT event_id, u16, v16,
           {interleave_bits16_sql("u16", "v16")} AS zval
    FROM ranked
"""


@register_query("zorder_key_events", oracle=_ZORDER_ORACLE)
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (user_id, value): each dimension is
    rank-normalized to 16 bits, then bit-interleaved into one sortable long.

    Why it matters at 100 TB: sorting a fact table by ONE column gives
    min/max row-group pruning on that column only; sorting by the Z-value
    gives usable pruning on EVERY interleaved dimension at once (each file
    covers a small hyper-rectangle instead of a thin slab). This is the
    layout technique behind Delta OPTIMIZE ZORDER / Hudi clustering,
    expressed as plain Spark expressions. tests/test_zorder.py writes both
    layouts and proves the file-stat pruning difference with pyarrow.

    Exactness vs scale: this oracle-checked form rank-normalizes with
    percent_rank over the whole table (a global sort — fine for a
    verification query). The production layout path (write_zorder_layout,
    used by the test) replaces the global window with approxQuantile-sampled
    bucket boundaries: one cheap stats pass + a map-side bucket lookup, the
    standard trick for z-ordering petabyte tables.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    pr_u = F.percent_rank().over(Window.orderBy("user_id"))
    pr_v = F.percent_rank().over(Window.orderBy("value"))
    ranked = events.select(
        "event_id",
        F.floor(pr_u * 65535).cast("bigint").alias("u16"),
        F.floor(pr_v * 65535).cast("bigint").alias("v16"),
    )
    return ranked.select(
        "event_id", "u16", "v16", interleave_bits16("u16", "v16").alias("zval")
    )


def write_zorder_layout(
    df: DataFrame,
    dims: tuple[str, str],
    path: str,
    rows_per_file: int = 100,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-value of two dimensions,
    using approxQuantile-sampled bucket boundaries (the scalable
    rank-normalization: one stats pass, then map-side binary-search lookup
    per row — no global window)."""
    from pyspark.sql import Observation

    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    a, b = dims
    # ONE stats pass total: both dimensions' quantiles AND the row count
    # (an Observation rides the same action, so sizing the output no
    # longer costs its own df.count() scan — the whole operation is stats
    # pass + write, two scans)
    obs = Observation("zorder_rows")
    bounds_a, bounds_b = df.observe(obs, F.count(F.lit(1)).alias("n")).approxQuantile(
        list(dims), qs, 0.0
    )
    n_rows = int(obs.get["n"])

    def bucket(col, bounds):
        # bucket id = number of boundaries below the value, as ONE flat
        # array expression (a chained-`when` ladder of 255 additions blows
        # the analyzer's resolution-iteration limit). n_buckets is small
        # (<=256) so the literal array is cheap; at real scale this is a
        # broadcast lookup / width_bucket.
        arr = F.array(*[F.lit(t) for t in bounds])
        return F.size(F.filter(arr, lambda t: F.col(col) > t)).cast("bigint")

    shift = 16 - bits  # reuse the 16-bit interleave on bits-wide buckets
    z = interleave_bits16(
        F.shiftleft(bucket(a, bounds_a), shift),
        F.shiftleft(bucket(b, bounds_b), shift),
    )
    # DISTRIBUTED clustered write: range-partition on the z-value so every
    # task sorts only its slice (a coalesce(1) total sort would serialize
    # the write through one task and OOM at scale); sized so each range
    # partition lands as ~one rows_per_file file. Output files cover
    # disjoint z-ranges (part numbering follows range order), which is all
    # the min/max stat pruning needs.
    n_out = max(1, n_rows // rows_per_file)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_out, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.option("maxRecordsPerFile", rows_per_file)
        .mode("overwrite")
        .parquet(path)
    )


@register_query(
    "xml_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    """,
)
def xml_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink coverage (Spark 4 native to_xml/from_xml): serialize
    each order row to an XML document string, parse it back with an
    explicit schema, and emit the recovered columns — hash-checked against
    the ORIGINAL table, certifying the codec is lossless for
    ints/strings/doubles (the same contract the CSV/JSONL/ORC round trips
    pin for their formats; doubles survive because Spark's XML writer uses
    shortest-round-trip formatting).

    Scale: both directions are map-only expression work (no Python, no
    shuffle); schema is EXPLICIT on the parse side — schema inference over
    XML is a full extra pass and stays banned in hot paths, same rule as
    the other formats in this module."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    xml = orders.select(
        F.to_xml(
            F.struct("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            F.col("doc"),
            "o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING, "
            "o_totalprice DOUBLE",
        ).alias("r")
    )
    return parsed.select("r.o_orderkey", "r.o_orderstatus", "r.o_orderpriority",
                         "r.o_totalprice")
