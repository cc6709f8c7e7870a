package graft.evaluate

import graft.core.EvalRow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Exact re-implementation of the reference evaluator
  * (ml/evaluator.py:105-179; nn/evaluator.py is a byte-identical copy).
  *
  * Semantics:
  *   - instance sets: CLASS = {einfo|etype}, NOCLASS = {einfo},
  *     per-type = {einfo} (ml/evaluator.py:12-16) — sets, so duplicates
  *     collapse (A7);
  *   - predicted lines deduplicate on the FULL line before set insert
  *     (ml/evaluator.py:88-90);
  *   - per-kind counters tp/fp/fn/npred/nexp with zero-guards:
  *     P = tp/npred if npred!=0 else 0 (same for R, F1)
  *     (ml/evaluator.py:105-127);
  *   - M.avg = arithmetic mean of per-type P/R/F1 over types present in
  *     GOLD (sorted, CLASS/NOCLASS excluded; predicted-only types never
  *     scored) (ml/evaluator.py:140-149);
  *   - m.avg = CLASS-key stats, m.avg(no class) = NOCLASS (ml/evaluator.py:151-155).
  *
  * The distributed form computes all per-type counters with ONE full
  * outer join + hash aggregation (no per-type scans), so it holds at
  * 10^12 predictions: both sides shuffle once on (etype, einfo).
  */
object Evaluator {

  /** Distributed per-kind counters.
    *
    * @param gold (einfo, etype) gold instances (un-dedup'd ok)
    * @param pred (einfo, etype) predicted instances (un-dedup'd ok)
    * @return one EvalRow per gold type + "CLASS" + "NOCLASS" rows.
    *         Types only in `pred` contribute fp to CLASS/NOCLASS but get
    *         no per-type row — exactly the reference's behavior.
    */
  def evalRows(
      spark: SparkSession,
      gold: Dataset[(String, String)],
      pred: Dataset[(String, String)]
  ): Seq[EvalRow] = {
    import spark.implicits._
    // ONE pass over both instance streams: each instance contributes its
    // three set keys — per-type ("t|"+etype, einfo), CLASS ("c|",
    // einfo|etype), NOCLASS ("n|", einfo) — and max() per (kind, key)
    // collapses duplicates, which IS the reference's set semantics (A7,
    // ml/evaluator.py:12-16; the full-line pred dedup at :88-90 is the
    // (einfo, etype) granularity these keys preserve). Two chained hash
    // aggregations, one job — instead of the previous three full-outer
    // joins, each rescanning both inputs.
    val insts = gold.toDF("einfo", "etype")
      .select($"einfo", $"etype", lit(1).as("isG"), lit(0).as("isP"))
      .unionAll(pred.toDF("einfo", "etype")
        .select($"einfo", $"etype", lit(0).as("isG"), lit(1).as("isP")))
    val counters = insts
      .select(
        explode(array(
          struct(concat(lit("t|"), $"etype").as("kind"), $"einfo".as("k")),
          struct(lit("c|").as("kind"), concat_ws("|", $"einfo", $"etype").as("k")),
          struct(lit("n|").as("kind"), $"einfo".as("k")))).as("x"),
        $"isG", $"isP")
      .groupBy($"x.kind".as("kind"), $"x.k".as("k"))
      .agg(max($"isG").as("g"), max($"isP").as("p"))
      .groupBy($"kind")
      .agg(
        sum(when($"g" === 1 && $"p" === 1, 1L).otherwise(0L)).as("tp"),
        sum(when($"g" === 0 && $"p" === 1, 1L).otherwise(0L)).as("fp"),
        sum(when($"g" === 1 && $"p" === 0, 1L).otherwise(0L)).as("fn"),
        sum($"p").cast("long").as("npred"),
        sum($"g").cast("long").as("nexp"))
      .collect()

    def row(r: org.apache.spark.sql.Row, kind: String) = mkRow(kind,
      r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
      r.getAs[Long]("npred"), r.getAs[Long]("nexp"))
    // per-type rows exist only for types present in GOLD (nexp > 0) —
    // predicted-only types contribute fp to CLASS/NOCLASS but are never
    // scored per-type, exactly the reference's behavior
    val typeRows = counters
      .filter(r => r.getString(0).startsWith("t|") && r.getAs[Long]("nexp") > 0)
      .sortBy(_.getString(0))
      .map(r => row(r, r.getString(0).drop(2)))
    def kindRow(key: String, name: String) = counters
      .find(_.getString(0) == key)
      .map(row(_, name))
      .getOrElse(mkRow(name, 0, 0, 0, 0, 0))
    (typeRows.toSeq :+ kindRow("c|", "CLASS")) :+ kindRow("n|", "NOCLASS")
  }

  /** Local (driver/test-side) evaluation over in-memory sets — same
    * contract, used by unit tests and the CLI.
    */
  def evalRowsLocal(
      gold: Seq[(String, String)],
      pred: Seq[(String, String)]
  ): Seq[EvalRow] = {
    // build instance sets exactly like add_instance (ml/evaluator.py:12-16)
    def sets(xs: Seq[(String, String)]): Map[String, Set[String]] = {
      var m = Map("CLASS" -> Set.empty[String], "NOCLASS" -> Set.empty[String])
      xs.foreach { case (einfo, etype) =>
        m = m.updated("CLASS", m("CLASS") + (einfo + "|" + etype))
        m = m.updated("NOCLASS", m("NOCLASS") + einfo)
        m = m.updated(etype, m.getOrElse(etype, Set.empty[String]) + einfo)
      }
      m
    }
    val gs = sets(gold)
    // predicted: dedup on full line first (ml/evaluator.py:88-90)
    val ps = sets(pred.distinct)
    val kinds =
      gs.keys.filter(k => k != "CLASS" && k != "NOCLASS").toSeq.sorted
    (kinds :+ "CLASS" :+ "NOCLASS").map { kind =>
      val gset = gs.getOrElse(kind, Set.empty)
      val pset = ps.getOrElse(kind, Set.empty)
      val tp = (gset & pset).size.toLong
      mkRow(kind, tp, pset.size - tp, gset.size - tp, pset.size, gset.size)
    }
  }

  private def mkRow(kind: String, tp: Long, fp: Long, fn: Long, npred: Long, nexp: Long): EvalRow = {
    val p = if (npred != 0) tp.toDouble / npred else 0.0
    val r = if (nexp != 0) tp.toDouble / nexp else 0.0
    val f1 = if (p + r != 0) 2 * p * r / (p + r) else 0.0
    EvalRow(kind, tp, fp, fn, npred, nexp, p, r, f1)
  }

  // ---- stats table, byte-identical to ml/evaluator.py:137-155 ----------

  private def rowPad(txt: String): String =
    txt + " " * math.max(0, 17 - txt.length)

  /** Python `{:2.1%}`: value*100 formatted with 1 decimal + '%'.
    * CPython rounds the binary double round-half-even at the decimal
    * boundary; BigDecimal HALF_EVEN on the double reproduces it.
    */
  def pct(v: Double): String = {
    val bd = new JBigDecimal(v * 100).setScale(1, RoundingMode.HALF_EVEN)
    bd.toPlainString + "%"
  }

  private def num(v: Long): String = {
    val s = v.toString
    " " * math.max(0, 4 - s.length) + s
  }

  private val Dashes =
    "------------------------------------------------------------------------------"

  /** Full table as printed by print_statistics. `rows` must contain the
    * per-type rows (any order), a CLASS row, and a NOCLASS row.
    */
  def statsTable(rows: Seq[EvalRow]): String = {
    val byKind = rows.map(r => r.kind -> r).toMap
    val types = rows.map(_.kind).filter(k => k != "CLASS" && k != "NOCLASS").distinct.sorted
    val sb = new StringBuilder
    sb ++= rowPad("") + "  tp\t  fp\t  fn\t#pred\t#exp\tP\tR\tF1\n"
    sb ++= Dashes + "\n"
    var (nk, sP, sR, sF1) = (0, 0.0, 0.0, 0.0)
    types.foreach { k =>
      val r = byKind(k)
      sb ++= rowPad(k) + s"${num(r.tp)}\t${num(r.fp)}\t${num(r.fn)}\t${num(r.npred)}\t${num(r.nexp)}\t${pct(r.p)}\t${pct(r.r)}\t${pct(r.f1)}\n"
      nk += 1; sP += r.p; sR += r.r; sF1 += r.f1
    }
    val d = math.max(nk, 1)
    sb ++= Dashes + "\n"
    sb ++= rowPad("M.avg") + s"-\t-\t-\t-\t-\t${pct(sP / d)}\t${pct(sR / d)}\t${pct(sF1 / d)}\n"
    sb ++= Dashes + "\n"
    val c = byKind("CLASS")
    sb ++= rowPad("m.avg") + s"${num(c.tp)}\t${num(c.fp)}\t${num(c.fn)}\t${num(c.npred)}\t${num(c.nexp)}\t${pct(c.p)}\t${pct(c.r)}\t${pct(c.f1)}\n"
    val n = byKind("NOCLASS")
    sb ++= rowPad("m.avg(no class)") + s"${num(n.tp)}\t${num(n.fp)}\t${num(n.fn)}\t${num(n.npred)}\t${num(n.nexp)}\t${pct(n.p)}\t${pct(n.r)}\t${pct(n.f1)}\n"
    sb.result()
  }
}
