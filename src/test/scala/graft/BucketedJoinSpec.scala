package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BucketedSink

class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("co-bucketed tables join with ZERO exchanges (shuffle-free sort-merge)") {
    BucketedSink.writeBucketed(
      Tables.load(spark, sf, "orders"), "b_orders", "o_orderkey", 8)
    BucketedSink.writeBucketed(
      Tables.load(spark, sf, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      val joinExchanges = plan.linesIterator
        .takeWhile(!_.contains("HashAggregate")) // pre-agg part irrelevant
        .count(_.contains("Exchange"))
      // the join itself must read bucket-aligned inputs with no exchange
      // anywhere below it; the only exchange allowed in the whole plan is
      // the post-join aggregation shuffle
      val totalExchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(totalExchanges <= 1, s"join shuffled despite bucketing:\n$plan")
      // and the result is right
      val expected = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").count()
        .as[(String, Long)].collect().toSet
      assert(joined.as[(String, Long)].collect().toSet === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
