package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/** Property tests for MinHash-LSH near-dedup: random corpora with PLANTED
  * near-duplicates (a base doc with a few words mutated) checked against
  * an in-memory all-pairs Jaccard oracle — both precision (every emitted
  * pair truly passes J >= 3/5 with exact inter/union sizes) and recall
  * (every oracle pair is found; planted pairs sit at J >= ~0.75, where
  * the 16x2 band math puts the miss probability below 1e-6, and the
  * 200-word alphabet keeps background J near zero so borderline pairs
  * cannot occur by chance). */
object DedupProps extends Properties("Dedup") {

  private lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val wordGen: Gen[String] = Gen.chooseNum(0, 199).map(i => s"w$i")

  // base docs: 30-50 words; mutants: 1-3 words swapped at random positions
  private case class Corpus(docs: List[(Long, String)])

  private val corpusGen: Gen[Corpus] = for {
    nBase <- Gen.chooseNum(3, 8)
    bases <- Gen.listOfN(nBase,
      Gen.chooseNum(30, 50).flatMap(n => Gen.listOfN(n, wordGen)))
    nMut <- Gen.chooseNum(1, 4)
    muts <- Gen.listOfN(nMut, for {
      b <- Gen.chooseNum(0, nBase - 1)
      k <- Gen.chooseNum(1, 3)
      positions <- Gen.listOfN(k, Gen.chooseNum(0, 29))
      repl <- Gen.listOfN(k, wordGen)
    } yield (b, positions.zip(repl)))
  } yield {
    val baseDocs = bases.zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "))
    }
    val mutDocs = muts.zipWithIndex.map { case ((b, edits), j) =>
      val ws = bases(b).toArray
      edits.foreach { case (p, w) => ws(p % ws.length) = w }
      ((100 + j).toLong, ws.mkString(" "))
    }
    Corpus(baseDocs ++ mutDocs)
  }

  /** In-memory twin of the operator's shingle + threshold rule: distinct
    * word-3-gram sets (whole text as one shingle for short docs), all
    * pairs with inter*5 >= union*3. */
  private def oracle(docs: List[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    def shingles(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set(text)
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * 5 >= union * 3
    } yield (a, b, inter, union)).toSet
  }

  property("dedup_near == all-pairs Jaccard oracle on planted near-dups") =
    forAll(corpusGen) { c =>
      import spark.implicits._
      val got = Dedup.dedupNearFrom(c.docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long)].collect().toSet
      got == oracle(c.docs)
    }

  property("dedup_near invariant under repartition(k)") =
    forAll(corpusGen, Gen.oneOf(1, 3, 7)) { (c, k) =>
      import spark.implicits._
      val base = Dedup.dedupNearFrom(c.docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val re = Dedup.dedupNearFrom(c.docs.toDF("doc_id", "text").repartition(k))
        .as[(Long, Long, Long, Long)].collect().toSet
      base == re
    }
}
