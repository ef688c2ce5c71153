"""Salted skew helpers: results must equal the unsalted computation, and
the hot key's work must actually spread across salt buckets."""

from pyspark.sql import functions as F


def _skewed(spark, hot_rows=5000, cold_keys=20):
    hot = spark.range(hot_rows).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(cold_keys).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.skew import salted_count

    df = _skewed(spark)
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(df, "k").collect()}
    assert salted == plain
    assert salted["HOT"] == 5000


def test_salt_actually_spreads_hot_key(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.skew import salted_count

    df = _skewed(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(16))
    )
    buckets = (
        salted.filter(F.col("k") == "HOT").select("_salt").distinct().count()
    )
    assert buckets == 16  # 5000 distinct rows hit every salt bucket


def test_salted_join_matches_plain(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.skew import salted_join

    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"c{i}", f"dim{i}") for i in range(20)],
        "k string, label string",
    )
    plain = big.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(big, dim, "k").groupBy("k", "label").count()
    a = {(r["k"], r["label"]): r["count"] for r in plain.collect()}
    b = {(r["k"], r["label"]): r["count"] for r in salted.collect()}
    assert a == b
