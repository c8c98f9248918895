package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the engine's skew posture end-to-end: the salted aggregate is
  * covered by CitationProps/CitationsSpec; THIS spec pins the other half
  * of the contract — that a skewed shuffle JOIN is re-planned by AQE's
  * OptimizeSkewedJoin under the session config the engine ships
  * (adaptive enabled), so hot keys split across tasks instead of
  * serializing into one. Thresholds are lowered to make a test-sized
  * skew visible; the MECHANISM asserted is exactly what runs at 100 TB
  * defaults. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (OptimizeSkewedJoin fires)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // one pathological key carrying ~92% of the left side
      val left = spark.range(0, 60000)
        .select(when($"id" < 55000, lit(0L)).otherwise($"id").as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("p"))
      val right = spark.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      // materialize THIS frame (count() would plan its own query and
      // leave joined's adaptive plan unfinalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    }
  }

  test("the same join un-skewed plans without skew handling (no false positive)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(0, 60000)
        .select($"id".as("k"), concat(lit("p"), $"id").as("p"))
      val right = spark.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      joined.collect()
      assert(!joined.queryExecution.executedPlan.toString.contains("skew=true"))
    }
  }
}
