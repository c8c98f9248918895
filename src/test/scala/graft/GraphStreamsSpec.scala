package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Citations
import graft.streaming.GraphStreams

class GraphStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming count view == batch aggregate over 3-batch arrival; state = view size") {
    val edges = Citations.edges(spark, sf)
    val dir = Files.createTempDirectory("graft-countview").toString
    // three arbitrary hash slices — counts are order-free, so ANY split
    // must reproduce the batch view exactly
    (0 until 3).foreach { k =>
      edges.where(pmod(xxhash64(col("src"), col("dst")), lit(3)) === k)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val q = GraphStreams.countViewStream(
        GraphStreams.readEdges(spark, dir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("count_view")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("count_view")
      .as[(String, Long)].collect().toMap
    val batch = Citations.counts(edges).as[(String, Long)].collect().toMap
    assert(streamed === batch)

    // the aggregation state is one row per view key — the view IS the
    // state, nothing proportional to the edge stream
    val stateRows = q.lastProgress.stateOperators
      .map(_.numRowsTotal).sum
    assert(stateRows === batch.size.toLong,
      s"state should be one row per cited paper, got $stateRows")

    // and the IVM batch merge agrees with both (the identity the soak
    // re-proves at ~6M edges)
    val ivm = Citations.countsIvm(edges).as[(String, Long)].collect().toMap
    assert(ivm === batch)
  }

  test("streaming reciprocity pair view == batch over 3-batch arrival; fold == batch operator") {
    val edges = Citations.edges(spark, sf)
    val dir = Files.createTempDirectory("graft-pairview").toString
    (0 until 3).foreach { k =>
      edges.where(pmod(xxhash64(col("src"), col("dst")), lit(3)) === k)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val q = GraphStreams.pairViewStream(
        GraphStreams.readEdges(spark, dir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("pair_view")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("pair_view")
      .as[(String, String, Int, Int)].collect().toSet
    // batch twin of the pair view from the same edges
    val batchView = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        (col("src") < col("dst")).cast("int").as("f"),
        (col("src") > col("dst")).cast("int").as("r"))
      .groupBy(col("a"), col("b"))
      .agg(max(col("f")).as("fwd"), max(col("r")).as("rev"))
      .as[(String, String, Int, Int)].collect().toSet
    assert(streamed === batchView)

    // state = one row per undirected pair (the view), nothing stream-sized
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows === batchView.size.toLong)

    // the fold over the streamed view IS the batch reciprocity row
    val fold = Citations.reciprocityFromPairView(spark.table("pair_view"))
      .as[(Long, Long, Double)].collect().head
    val batchRow = Citations.reciprocity(edges)
      .as[(Long, Long, Double)].collect().head
    assert(fold === batchRow)

    // the motif census over the streamed view IS the batch census —
    // the view's (fwd, rev) flags are the dyad states, so a live graph
    // serves its full triad profile without replaying the edge log
    val censusFold = Citations.motifCensusFromPairView(spark.table("pair_view"))
      .as[(String, Long)].collect().toMap
    val censusBatch = Citations.motifCensus(edges)
      .as[(String, Long)].collect().toMap
    assert(censusFold === censusBatch)
    assert(censusFold.values.sum > 0, "no connected triads — fixture rot")
  }
}
