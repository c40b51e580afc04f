"""Pins for operators/rank.py: distributed dense rank equals the
single-reducer window dense rank bit-for-bit, while its executed plan
contains NO single-partition exchange."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from artis_data_ingest_spark.operators.rank import distributed_dense_rank
from artis_data_ingest_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_distributed_dense_rank_matches_global_window(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    got = (
        distributed_dense_rank(orders, ["cents"], out="r", num_partitions=8)
        .select("o_orderkey", "r")
        .toPandas()
        .set_index("o_orderkey")["r"]
    )
    w = Window.orderBy("cents")
    want = (
        orders.withColumn("r", F.dense_rank().over(w).cast("bigint"))
        .select("o_orderkey", "r")
        .toPandas()
        .set_index("o_orderkey")["r"]
    )
    assert got.sort_index().equals(want.sort_index())


def test_distributed_dense_rank_plan_has_no_single_partition(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = distributed_dense_rank(
        orders, ["o_totalprice"], out="r", num_partitions=8
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the shuffle the operator DOES pay is a range partitioning (the
    # checkpoint truncates it out of the final plan — assert on the
    # pre-checkpoint stage directly)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        orders.repartitionByRange(8, "o_totalprice").explain()
    assert "rangepartitioning" in buf.getvalue().lower()

    # the single-reducer construction this replaces DOES funnel
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        orders.withColumn(
            "r", F.dense_rank().over(Window.orderBy("o_totalprice"))
        ).explain()
    assert "SinglePartition" in buf.getvalue()


def test_distributed_dense_rank_ties_and_composite_keys(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    got = distributed_dense_rank(
        li, ["l_returnflag", "l_quantity"], out="r", num_partitions=6
    )
    w = Window.orderBy("l_returnflag", "l_quantity")
    want = li.withColumn("r", F.dense_rank().over(w).cast("bigint"))
    # dense rank is a function of the key tuple alone — compare the
    # distinct key->rank mapping (row identity is not unique here)
    key = ["l_returnflag", "l_quantity"]
    a = got.select(*key, "r").distinct().toPandas().set_index(key).sort_index()
    b = want.select(*key, "r").distinct().toPandas().set_index(key).sort_index()
    assert len(a) == len(b)
    assert a.equals(b)


def test_distributed_dense_rank_null_keys_match_global_window(spark):
    # Regression: countDistinct over bare columns skips null-containing
    # tuples, so the null group used to be missing from the cumulative
    # offsets and nulls collided with the first non-null key.  The
    # struct() wrapper counts them; ranks must equal the global window
    # (nulls first) exactly.
    rows = [
        (1, None), (2, 5), (3, 5), (4, 7), (5, None), (6, 2),
        (7, None), (8, 9), (9, 2), (10, 11),
    ]
    df = spark.createDataFrame(rows, "id int, k int")
    got = (
        distributed_dense_rank(df, ["k"], out="r", num_partitions=4)
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
        .sort_index()
    )
    w = Window.orderBy("k")
    want = (
        df.withColumn("r", F.dense_rank().over(w).cast("bigint"))
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
        .sort_index()
    )
    assert got.equals(want)


def test_distributed_dense_rank_null_composite_keys(spark):
    # composite keys where only ONE column is null must also count
    rows = [
        (1, None, 3), (2, "a", None), (3, "a", 3), (4, None, None),
        (5, "b", 1), (6, None, 3), (7, "a", None),
    ]
    df = spark.createDataFrame(rows, "id int, k1 string, k2 int")
    got = (
        distributed_dense_rank(df, ["k1", "k2"], out="r", num_partitions=3)
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
        .sort_index()
    )
    w = Window.orderBy("k1", "k2")
    want = (
        df.withColumn("r", F.dense_rank().over(w).cast("bigint"))
        .select("id", "r")
        .toPandas()
        .set_index("id")["r"]
        .sort_index()
    )
    assert got.equals(want)


def test_distributed_running_sum_matches_global_window(spark):
    from artis_data_ingest_spark.operators.rank import (
        distributed_running_sum,
    )

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 97).alias("v"),
    )
    got = distributed_running_sum(
        orders, ["o_orderkey"], "v", out="cum", num_partitions=8
    )
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    gp = got.select("o_orderkey", "cum").toPandas().set_index("o_orderkey")["cum"]
    w = (
        Window.orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = (
        orders.withColumn("cum", F.sum(F.col("v").cast("bigint")).over(w))
        .select("o_orderkey", "cum")
        .toPandas()
        .set_index("o_orderkey")["cum"]
    )
    assert gp.sort_index().equals(wp.sort_index())


def test_sequence_pack_global_plan_has_no_single_partition(spark):
    # VERDICT r8: this query carried the repo's only FULL
    # Exchange SinglePartition; the distributed_running_sum rewrite
    # must keep it out of the executed plan
    from artis_data_ingest_spark import plans

    df = plans.queries()["q_sequence_pack_global"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
