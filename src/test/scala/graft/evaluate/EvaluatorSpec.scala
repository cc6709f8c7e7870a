package graft.evaluate

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity of the stats table against the reference evaluator.
  *
  * The golden bytes below were produced by running the REFERENCE
  * implementation (/root/reference/ml/evaluator.py, plain python3) on the
  * fixture gold doc + prediction files reproduced in this suite — i.e.
  * the two engines were fed identical instance sets.
  */
class EvaluatorSpec extends AnyFunSuite {

  // gold from doc1.xml: NER einfo = sid|charOffset(RAW)|text
  private val goldNer = Seq(
    ("D.d0.s0|0-7|Warfarin", "drug"),
    ("D.d0.s0|24-30|aspirin", "brand"),
    ("D.d0.s1|0-6|Digoxin", "drug"),
    ("D.d0.s1|25-33|quinidine", "drug"),
    ("D.d0.s2|0-3;5-12|Beta blockers", "group")
  )

  // predictions incl. one exact duplicate line (dedup path)
  private val predNer = Seq(
    ("D.d0.s0|0-7|Warfarin", "drug"),
    ("D.d0.s0|24-30|aspirin", "drug"), // wrong type
    ("D.d0.s1|0-6|Digoxin", "drug"),
    ("D.d0.s1|40-46|monitor", "drug_n"), // spurious, type not in gold
    ("D.d0.s0|0-7|Warfarin", "drug") // duplicate
  )

  private val goldenNerTable =
    "                   tp\t  fp\t  fn\t#pred\t#exp\tP\tR\tF1\n" +
      "------------------------------------------------------------------------------\n" +
      "brand               0\t   0\t   1\t   0\t   1\t0.0%\t0.0%\t0.0%\n" +
      "drug                2\t   1\t   1\t   3\t   3\t66.7%\t66.7%\t66.7%\n" +
      "group               0\t   0\t   1\t   0\t   1\t0.0%\t0.0%\t0.0%\n" +
      "------------------------------------------------------------------------------\n" +
      "M.avg            -\t-\t-\t-\t-\t22.2%\t22.2%\t22.2%\n" +
      "------------------------------------------------------------------------------\n" +
      "m.avg               2\t   2\t   3\t   4\t   5\t50.0%\t40.0%\t44.4%\n" +
      "m.avg(no class)     3\t   1\t   2\t   4\t   5\t75.0%\t60.0%\t66.7%\n"

  private val goldDdi = Seq(
    ("D.d0.s0|D.d0.s0.e0|D.d0.s0.e1", "int"),
    ("D.d0.s1|D.d0.s1.e0|D.d0.s1.e1", "mechanism")
  )
  private val predDdi = Seq(
    ("D.d0.s0|D.d0.s0.e0|D.d0.s0.e1", "int"),
    ("D.d0.s1|D.d0.s1.e0|D.d0.s1.e1", "effect") // wrong class
  )

  private val goldenDdiTable =
    "                   tp\t  fp\t  fn\t#pred\t#exp\tP\tR\tF1\n" +
      "------------------------------------------------------------------------------\n" +
      "int                 1\t   0\t   0\t   1\t   1\t100.0%\t100.0%\t100.0%\n" +
      "mechanism           0\t   0\t   1\t   0\t   1\t0.0%\t0.0%\t0.0%\n" +
      "------------------------------------------------------------------------------\n" +
      "M.avg            -\t-\t-\t-\t-\t50.0%\t50.0%\t50.0%\n" +
      "------------------------------------------------------------------------------\n" +
      "m.avg               1\t   1\t   1\t   2\t   2\t50.0%\t50.0%\t50.0%\n" +
      "m.avg(no class)     2\t   0\t   0\t   2\t   2\t100.0%\t100.0%\t100.0%\n"

  test("NER stats table is byte-identical to the reference evaluator") {
    val rows = Evaluator.evalRowsLocal(goldNer, predNer)
    assert(Evaluator.statsTable(rows) == goldenNerTable)
  }

  test("DDI stats table is byte-identical to the reference evaluator") {
    val rows = Evaluator.evalRowsLocal(goldDdi, predDdi)
    assert(Evaluator.statsTable(rows) == goldenDdiTable)
  }

  test("zero guards: empty predictions give P=R=F1=0 (CustomModel floor)") {
    val rows = Evaluator.evalRowsLocal(goldNer, Seq.empty)
    rows.foreach { r =>
      assert(r.p == 0.0 && r.r == 0.0 && r.f1 == 0.0)
      assert(r.npred == 0 && r.fn == r.nexp)
    }
  }

  test("predicted-only types get no per-type row; fp still counted in CLASS") {
    val rows = Evaluator.evalRowsLocal(goldDdi, predDdi)
    assert(!rows.exists(_.kind == "effect"))
    assert(rows.find(_.kind == "CLASS").get.fp == 1)
  }

  test("distributed evalRows matches the local set-based evaluation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = spark.createDataset(goldNer)
    val p = spark.createDataset(predNer)
    val dist = Evaluator.evalRows(spark, g, p).sortBy(_.kind)
    val loc = Evaluator.evalRowsLocal(goldNer, predNer).sortBy(_.kind)
    assert(dist == loc)
  }

  test("pct matches python {:2.1%} formatting") {
    assert(Evaluator.pct(0.0) == "0.0%")
    assert(Evaluator.pct(1.0) == "100.0%")
    assert(Evaluator.pct(2.0 / 3.0) == "66.7%")
    assert(Evaluator.pct(0.5) == "50.0%")
    assert(Evaluator.pct(4.0 / 9.0) == "44.4%")
    assert(Evaluator.pct(0.2222222222222222) == "22.2%")
  }
}
