package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants over [[TextOps.piiScrub]] on a generated
  * corpus of safe words, injected PII of each type, and near-miss
  * tokens that must NOT match (boundary-guard checks). One Spark pass
  * over the whole corpus (not one job per ScalaCheck case), then
  * per-row assertions:
  *
  *   1. counts match the expected injections exactly (near-misses
  *      contribute zero) — independently recomputed with
  *      java.util.regex on the driver;
  *   2. the redacted text equals the driver-side ordered replaceAll
  *      (email → phone → IP), and carries exactly `count` placeholder
  *      tokens per type;
  *   3. idempotence: scrubbing the redacted text is a no-op with zero
  *      counts;
  *   4. PII-free docs pass through byte-identical.
  *
  * The generator keeps token classes disjoint (letters-only words,
  * letters-only email local parts) so no pattern can match inside
  * another's span and count == placeholder arithmetic is exact; the
  * deliberate overlap cases (an IPv4 as an email host, a phone inside
  * an email local part) are pinned by hand in OpsSpec instead.
  */
class PiiPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val email: Gen[String] = for {
    l <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    d <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    t <- Gen.oneOf("com", "org", "io", "co.uk")
  } yield s"$l@$d.$t"
  private val phone: Gen[String] =
    Gen.choose(0, 9999).map(n => f"${List(555, 212, 800)(n % 3)}-$n%04d")
  private val ip: Gen[String] =
    Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
  // tokens that look PII-ish but must not match any pattern
  private val nearMiss: Gen[String] = Gen.oneOf(
    "555-123456", "555-123", "5551234", "a@b", "x@y.z", "1.2.3", "v1.2", "10.0.0")

  private final case class Doc(n: (Long, Long, Long), text: String)

  private val docGen: Gen[Doc] = for {
    words <- Gen.choose(3, 10).flatMap(n => Gen.listOfN(n, word))
    es <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, email))
    ps <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, phone))
    is <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, ip))
    misses <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, nearMiss))
    shuffled <- Gen.const(
      new scala.util.Random((words ++ es ++ ps ++ is).hashCode)
        .shuffle(words ++ es ++ ps ++ is ++ misses))
  } yield Doc((es.size.toLong, ps.size.toLong, is.size.toLong), shuffled.mkString(" "))

  private def expectedRedact(text: String): String =
    text
      .replaceAll(TextOps.EmailRe, "<EMAIL>")
      .replaceAll(TextOps.PhoneRe, "<PHONE>")
      .replaceAll(TextOps.IpRe, "<IP>")

  private def occurrences(hay: String, needle: String): Long = {
    var i = hay.indexOf(needle); var n = 0L
    while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
    n
  }

  test("piiScrub invariants over 300 generated docs (counts, redaction, idempotence)") {
    import spark.implicits._
    val docs = (0 until 300).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(42L + i))).toVector
    assert(docs.size >= 290, "generator must rarely fail")
    assert(docs.exists(_.n == ((0L, 0L, 0L))), "want some PII-free docs")
    assert(docs.exists(d => d.n._1 > 0 && d.n._2 > 0 && d.n._3 > 0), "want mixed-PII docs")

    val in = docs.zipWithIndex.map { case (d, i) => (i.toLong, d.text) }
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(in).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getAs[String]("redacted"))).toMap
    val again = TextOps.piiScrub(
      TextOps.piiScrub(in).select(col("doc_id"), col("redacted").as("text"))).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("pii_total"), r.getAs[String]("redacted"))).toMap

    docs.zipWithIndex.foreach { case (d, i) =>
      val (ne, np, ni, red) = out(i.toLong)
      assert((ne, np, ni) == d.n, s"doc $i counts: got ($ne,$np,$ni) want ${d.n}: ${d.text}")
      assert(red == expectedRedact(d.text), s"doc $i redaction:\n got $red\nwant ${expectedRedact(d.text)}")
      assert(occurrences(red, "<EMAIL>") == ne && occurrences(red, "<PHONE>") == np &&
        occurrences(red, "<IP>") == ni, s"doc $i placeholder arithmetic: $red")
      if (d.n == ((0L, 0L, 0L))) assert(red == d.text, s"doc $i must pass through unchanged")
      val (t2, red2) = again(i.toLong)
      assert(t2 == 0L && red2 == red, s"doc $i scrub not idempotent: $red2")
    }
  }
}
