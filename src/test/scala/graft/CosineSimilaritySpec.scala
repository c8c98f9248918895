package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.expr

import graft.operators.Similarity

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("cosine_sim: exact values on hand vectors (incl. orthogonal, antiparallel)") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(expr("cosine_sim(a, b)").as("c"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (c, e) => assert(math.abs(c - e) < 1e-12) }
  }

  test("cosine_sim is null-safe and length-tolerant (common prefix)") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f, 5.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f))))
      .toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).collect()
    // the whole computation — dot AND both norms — runs over the common
    // prefix, so the trailing 5 in `a` is invisible: cos([1,0],[1,0]) = 1
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).isNullAt(0))
  }

  test("fused kernel is bit-identical to the composable HOF formulation") {
    // keep the HOF side genuinely interpreted: the FuseCosine optimizer
    // rule would otherwise rewrite it into the kernel under test
    spark.conf.set("spark.graft.fuse_cosine", "false")
    val hof = try Similarity.annTopk(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSet
    finally spark.conf.unset("spark.graft.fuse_cosine")
    val fused = Similarity.annTopkFused(spark, sf)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(fused === hof)
  }

  test("l2_sq: exact values, codegen'd, bit-identical to the HOF fold") {
    val one = Seq((Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 6.0f)))
      .toDF("a", "b").select(expr("l2_sq(a, b)")).as[Double].head()
    assert(one === 14.0) // 1 + 4 + 9
    // bit-identical to the interpreted fold on real corpus vectors
    val pairs = Tables.load(spark, sf, "embeddings")
      .selectExpr("embedding AS a", "reverse(embedding) AS b")
    val hof = pairs.selectExpr(
      """aggregate(zip_with(a, b,
        |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |            * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d""".stripMargin)
      .as[Double].collect()
    val fused = pairs.selectExpr("l2_sq(a, b) AS d").as[Double].collect()
    assert(fused.toSeq === hof.toSeq)
    // whole-stage codegen participation, like cosine_sim
    val plan = pairs.selectExpr("l2_sq(a, b)")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("l2_sq")),
      s"l2_sq Project not codegen'd:\n$plan")
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    val plan = Tables.load(spark, sf, "embeddings")
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
      .queryExecution.executedPlan
    // whole-stage-codegen'd operators print with a `*(stageId)` star; the
    // Project evaluating cosine_sim must carry it (a CodegenFallback
    // expression would strip the star from its enclosing Project)
    val starredProject = plan.toString.linesIterator
      .exists(l => l.contains("*(") && l.contains("cosine_sim"))
    assert(starredProject, s"cosine_sim Project not codegen'd:\n$plan")
    // interpreted eval path also exercised and consistent
    val viaEval = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))).eval(null)
    assert(math.abs(viaEval.asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
