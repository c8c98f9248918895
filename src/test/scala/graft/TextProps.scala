package graft

import java.util.regex.Pattern

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.TextAnalysis

/** Property-based tests for the text-pipeline operators: random corpora
  * against in-memory Scala oracles (value-level, not just invariants),
  * plus repartition invariance — the "same answer regardless of physical
  * layout" guarantee a 1000-executor run depends on. Small word alphabet
  * on purpose: it forces repeated tokens, repeated bigrams, and
  * duplicate documents. */
object TextProps extends Properties("TextAnalysis") {

  private lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // Spark's round() is BigDecimal HALF_UP
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val wordGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "ab", "ba", "xyz", "qq")

  private val docGen: Gen[String] =
    Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private case class RepOracle(nTokens: Long, topBigram: Long,
                               nBigrams: Long, rep2: Double, dup: Double)

  private def repOracle(text: String): RepOracle = {
    val ws = text.split(" ", -1).toList
    val n = ws.length.toLong
    val bgs = if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toList
              else Nil
    val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong)
    val top = if (counts.isEmpty) 0L else counts.values.max
    RepOracle(n, top, counts.size.toLong,
      r6(top * 2 * 1.0 / n), r6((n - ws.distinct.length) * 1.0 / n))
  }

  property("quality_repetition == in-memory bigram oracle") =
    forAll(corpusGen) { docs =>
      import spark.implicits._
      val got = TextAnalysis.qualityRepetitionFrom(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Double, Double, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      docs.forall { case (id, text) =>
        val o = repOracle(text)
        val (_, nTok, top, nBg, rep2, dup, clean) = got(id)
        nTok == o.nTokens && top == o.topBigram && nBg == o.nBigrams &&
          rep2 == o.rep2 && dup == o.dup &&
          clean == (o.rep2 <= 0.2 && o.dup <= 0.9)
      }
    }

  property("quality_repetition invariant under repartition(k)") =
    forAll(corpusGen, Gen.oneOf(1, 3, 7)) { (docs, k) =>
      import spark.implicits._
      val base = TextAnalysis.qualityRepetitionFrom(docs.toDF("doc_id", "text"))
        .collect().map(_.toString).sorted.toSeq
      val re = TextAnalysis.qualityRepetitionFrom(
        docs.toDF("doc_id", "text").repartition(k))
        .collect().map(_.toString).sorted.toSeq
      base == re
    }

  // fragments that do and don't trip the PII patterns, mixed with words
  private val fragGen: Gen[String] = Gen.frequency(
    6 -> wordGen,
    1 -> Gen.const("jane.doe+x@example.co.uk"),
    1 -> Gen.const("x@y"), // no dotted TLD: not an email
    1 -> Gen.const("10.0.0.254"),
    1 -> Gen.const("999.999.999.999"), // still matches the 1-3-digit quads
    1 -> Gen.const("+1 (555) 123-4567"),
    1 -> Gen.const("12"))

  private val piiCorpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 12).flatMap(m =>
        Gen.listOfN(m, fragGen).map(_.mkString(" ")))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def redactOracle(text: String): (String, Seq[Long]) =
    TextAnalysis.PiiPatterns.foldLeft((text, Seq.empty[Long])) {
      case ((t, ns), (pat, tag)) =>
        val m = Pattern.compile(pat).matcher(t)
        var c = 0L
        while (m.find()) c += 1
        (t.replaceAll(pat, tag), ns :+ c)
    }

  // the winnowing paper's selection rule, re-implemented value-level in
  // plain Scala: window of 4 shingle hashes, keep (rightmost-argmin pos,
  // min hash), dedupe — the in-memory twin of the fixed-width key trick
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def winnowOracle(text: String): Set[(Int, String)] = {
    val ws = text.split(" ", -1)
    val nsh = math.max(ws.length - 2, 1)
    val hashes = (1 to nsh).map { i =>
      md5hex(ws.slice(i - 1, math.min(i + 2, ws.length)).mkString(" "))
    }
    (1 to math.max(nsh - 3, 1)).map { j =>
      val win = j to math.min(j + 3, nsh)
      val minH = win.map(p => hashes(p - 1)).min
      (win.filter(p => hashes(p - 1) == minH).max, minH)
    }.toSet
  }

  property("doc_winnowing == per-doc selection oracle; repartition-invariant") =
    forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      def run(d: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
        TextAnalysis.docWinnowingFrom(d)
          .as[(Long, Int, String)].collect().toSet
      val got = run(df)
      val expected = docs.flatMap { case (id, text) =>
        winnowOracle(text).map { case (p, h) => (id, p, h) }
      }.toSet
      got == expected && run(df.repartition(7)) == got
    }

  property("pii_redact == java-regex stage oracle") =
    forAll(piiCorpusGen) { docs =>
      import spark.implicits._
      val got = TextAnalysis.piiRedactFrom(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r).toMap
      docs.forall { case (id, text) =>
        val (clean, Seq(ne, ni, np)) = redactOracle(text)
        val (_, gc, ge, gi, gp, gt) = got(id)
        gc == clean && ge == ne && gi == ni && gp == np && gt == ne + ni + np
      }
    }
}
