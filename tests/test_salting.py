"""Salted-aggregation skew utility: result parity with plain groupBy
and the expected two-exchange physical plan."""

from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions.salting import salted_agg, salted_count


def test_salted_count_equals_plain(spark):
    # Zipf-ish skew: key 'hot' dominates
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 8, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))).alias("k"),
        F.col("id"))
    plain = {r.k: r.cnt for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.k: r.cnt for r in
              salted_count(df, ["k"], entropy_col="id").collect()}
    assert salted == plain


def test_salted_sum_deterministic(spark):
    df = spark.range(5000).select(F.lit("a").alias("k"), F.col("id"))
    a = salted_agg(df, ["k"], {"s": F.sum("id")}, entropy_col="id").collect()
    b = salted_agg(df, ["k"], {"s": F.sum("id")}, entropy_col="id").collect()
    assert a == b and a[0].s == sum(range(5000))


def test_salted_plan_has_two_aggregation_phases(spark):
    df = spark.range(100).select(F.lit("a").alias("k"), F.col("id"))
    plan = salted_count(df, ["k"], entropy_col="id") \
        ._jdf.queryExecution().executedPlan().toString()
    # two logical groupBys → the salt key appears in the first exchange
    assert "_salt" in plan
    assert plan.count("Exchange") >= 2
