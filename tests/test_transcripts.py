"""Cross-engine parity of the deterministic transcripts fixture.

The canonical TRANSCRIPTS_SQL must yield byte-identical rows in Spark
and DuckDB — this is the foundation of every downstream oracle
comparison (mirrors the reference's deterministic mock input,
test/e2e/test_cases/input_mock_log/case.feature:15-24).
"""

import duckdb

from loongcollector_spark.sources.transcripts import (
    generate_transcripts,
    load_transcripts,
    transcripts_sql,
)


def test_spark_duckdb_parity(spark, sf_dir):
    sdf = load_transcripts(spark, sf_dir)
    spark_rows = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    duck_rows = sorted(con.execute(transcripts_sql("events")).fetchall())
    assert len(spark_rows) == len(duck_rows) > 0
    assert spark_rows == duck_rows


def test_schema(spark, sf_dir):
    sdf = load_transcripts(spark, sf_dir)
    fields = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
    assert [n for n, _ in fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = dict(fields)
    assert types["turn_idx"] == "int"
    # parquet TIMESTAMP comes back as ntz in Spark 4 — matches DuckDB's
    # naive TIMESTAMP, which is what the oracle compares against.
    assert types["ts"] in ("timestamp", "timestamp_ntz")


def test_order_key_dense(spark, sf_dir):
    """turn_idx is dense 0..n-1 per conversation (logNo order oracle)."""
    from pyspark.sql import functions as F

    sdf = load_transcripts(spark, sf_dir)
    bad = (
        sdf.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mx"),
            F.countDistinct("turn_idx").alias("nd"),
        )
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("nd") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_generator_deterministic_across_parallelism(spark):
    a = generate_transcripts(spark, 5000, partitions=2).collect()
    b = generate_transcripts(spark, 5000, partitions=16).collect()
    ka = sorted((r.conv_id, r.turn_idx, r.text) for r in a)
    kb = sorted((r.conv_id, r.turn_idx, r.text) for r in b)
    assert ka == kb
    assert len(ka) == 5000


def test_generator_has_skew(spark):
    from pyspark.sql import functions as F

    df = generate_transcripts(spark, 20000)
    top = (
        df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    avg = 20000 / df.select("conv_id").distinct().count()
    assert top["count"] > 3 * avg
