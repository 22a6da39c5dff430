"""File-format source/sink coverage: CSV, JSON, ORC, and XML round trips.

SURVEY §2.2 row 1 lists parquet/json/csv among the scan carriers; every
other query reads parquet, so these exercise the other formats — each
query WRITES a filtered slice through the format under test, reads it
back with an explicit schema (never inference — schema drift is the
classic silent corruption at scale), aggregates, and hash-matches the
oracle computed from the original parquet.  A value mismatch would mean
the format round trip lost information.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       {rnd_sql('sum(l_quantity)', 2)} AS sum_qty,
       {rnd_sql('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
FROM lineitem
WHERE l_orderkey % 97 = 0
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_SCHEMA = (
    "l_orderkey bigint, l_quantity double, l_extendedprice double, "
    "l_discount double, l_returnflag string, l_linestatus string"
)


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    sub = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 97 == 0)
        .select(
            "l_orderkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_linestatus",
        )
    )
    # path is unique per (process, full sf_dir): concurrent sessions (the
    # driver gate + a local check run) must not overwrite each other's
    # files mid-scan, and distinct roots with equal basenames must not
    # silently share data
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        "/tmp/spark-graft-formats", f"{tag}-{os.getpid()}", fmt
    )
    writer = sub.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = spark.read.option("header", True).schema(_SCHEMA).csv(path)
    elif fmt == "orc":
        writer.orc(path)
        back = spark.read.schema(_SCHEMA).orc(path)
    elif fmt == "xml":
        writer.format("xml").option("rowTag", "row").save(path)
        back = (
            spark.read.format("xml")
            .option("rowTag", "row")
            .schema(_SCHEMA)
            .load(path)
        )
    else:
        writer.json(path)
        back = spark.read.schema(_SCHEMA).json(path)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register("q_csv_roundtrip", shape="bounded", tags=("formats", "source", "sink"), oracle=_ORACLE)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round trip with explicit read schema; the
    aggregate hash-matches the parquet-derived oracle, proving the text
    encoding didn't lose or shift values (doubles survive via Spark's
    shortest-round-trip repr).  Partitioned write/read — format coverage
    costs one extra scan, no shape change."""
    return _roundtrip(spark, sf_dir, "csv")


@register("q_json_roundtrip", shape="bounded", tags=("formats", "source", "sink"), oracle=_ORACLE)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round trip with explicit read schema —
    same invariant as the CSV trip for the schemaless format."""
    return _roundtrip(spark, sf_dir, "json")


@register("q_xml_roundtrip", shape="bounded", tags=("formats", "source", "sink"), oracle=_ORACLE)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round trip (Spark 4 ships spark-xml natively) —
    element-per-row encoding with an explicit read schema, same
    lost-information invariant as the other text trips.  Registered in
    round 8 (verdict ask #2): the format was already covered by
    tests/test_formats_extra.py but lacked an oracle row."""
    return _roundtrip(spark, sf_dir, "xml")


@register("q_orc_roundtrip", shape="bounded", tags=("formats", "source", "sink"), oracle=_ORACLE)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round trip — the second columnar format Spark
    ships natively.  Binary columnar encoding, so doubles are bit-exact
    by construction; the trip proves the writer/reader pair and the
    explicit-schema projection work, same invariant as the text trips."""
    return _roundtrip(spark, sf_dir, "orc")
