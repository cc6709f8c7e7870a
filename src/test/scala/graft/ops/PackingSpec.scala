package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def collectPlan(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("packPlan: docs straddle shard boundaries with exact span arithmetic") {
    // 3 docs of 4 tokens each, seqLen 5: md5 order decides concat order;
    // replay the contract in plain Scala instead of hardcoding the order
    val d = docs((1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) =
      md5.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val order = Seq(1L, 2L, 3L).sortBy(id => (key(id), id))
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var cum = 0L
    order.foreach { id =>
      val start = cum; cum += 4
      var s = start / 5
      while (s <= (cum - 1) / 5) {
        val s0 = math.max(start, s * 5); val s1 = math.min(cum, (s + 1) * 5)
        expected += ((s, id, s0 - s * 5, s1 - s0, s0 - start))
        s += 1
      }
    }
    val got = collectPlan(Packing.packPlan(d, seqLen = 5)).toSet
    assert(got == expected.toSet, s"got ${got.toSeq.sorted}")
    // 12 tokens over seqLen-5 shards: shard 0 and 1 carry exactly 5
    val perShard = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perShard == Map(0L -> 5L, 1L -> 5L, 2L -> 2L))
  }

  test("packPlanBucketed equals packPlan exactly; invariants hold; packedSpans reassembles docs") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 120L).map { id =>
      (id, (0 until 1 + rnd.nextInt(40)).map(j => s"t$id-$j").mkString(" "))
    }
    val d = docs(corpus: _*)
    val L = 64L
    val plan = collectPlan(Packing.packPlan(d, L)).sorted.toSeq
    val bucketed = collectPlan(Packing.packPlanBucketed(d, L)).sorted.toSeq
    assert(plan == bucketed, "bucketed decomposition must be EXACT")

    val total = corpus.map(_._2.split(" ", -1).length.toLong).sum
    val lastShard = (total - 1) / L
    val perShard = plan.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    perShard.foreach { case (s, tok) =>
      if (s < lastShard) assert(tok == L, s"shard $s holds $tok != $L")
      else assert(tok == total - lastShard * L, s"last shard $s holds $tok")
    }
    // per-doc spans: contiguous doc_offsets summing to the doc's tokens
    plan.groupBy(_._2).foreach { case (id, spans) =>
      val ss = spans.sortBy(_._5)
      val n = corpus.find(_._1 == id).get._2.split(" ", -1).length.toLong
      assert(ss.map(_._4).sum == n, s"doc $id spans don't cover it")
      ss.foldLeft(0L) { case (off, sp) =>
        assert(sp._5 == off, s"doc $id offsets not contiguous"); off + sp._4
      }
      // consecutive spans sit in consecutive shards starting at offset 0
      ss.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._1 == a._1 + 1 && b._3 == 0L, s"doc $id straddle shape wrong")
        case _ => ()
      }
    }
    // packedSpans: concatenating a doc's span_text in doc_offset order
    // reproduces the original text
    val spans = Packing.packedSpans(Packing.packPlanBucketed(d, L), d)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getString(4)))
    val rebuilt = spans.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
    corpus.foreach { case (id, t) => assert(rebuilt(id) == t, s"doc $id text") }
  }
}
