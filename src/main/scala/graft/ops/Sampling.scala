package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * At corpus scale, "10% sample" must be (a) reproducible across runs
  * and engines (no RNG state, no partition-order dependence) and
  * (b) a pure row-local filter so it pushes into the scan stage and
  * composes with resume/backfill — the same row is always in or out.
  * Buckets come from the first 8 hex digits of md5(doc_id), not
  * murmur3, so the DuckDB oracle computes the identical assignment.
  */
object Sampling {

  /** The 0..99 bucket of a row id — the single cross-engine contract
    * expression (DuckDB oracle: ('0x' || substr(md5(CAST(id AS
    * VARCHAR)), 1, 8))::BIGINT % 100); both sampling ops MUST go
    * through this one definition.
    */
  private def bucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint") % 100

  /** Keep rows whose md5-derived bucket (0..99) is < `pct`. */
  def deterministicSample(docs: DataFrame, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    docs.filter(bucket(col("doc_id")) < pct)
  }

  /** Per-stratum deterministic rates: `rates` maps values of
    * `strataCol` to their pct (0..100); unlisted strata default to
    * `defaultPct`. Same row-local md5 bucketing as
    * [[deterministicSample]].
    */
  def stratifiedSample(
      docs: DataFrame,
      strataCol: String,
      rates: Map[String, Int],
      defaultPct: Int = 0
  ): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (value, p)) =>
      when(col(strataCol) === value, lit(p)).otherwise(acc)
    }
    docs.filter(bucket(col("doc_id")) < pct)
  }

  private def budgetFor(
      budgets: Map[String, Long],
      defaultBudget: Long
  ): org.apache.spark.sql.Column =
    budgets.foldLeft(lit(defaultBudget)) { case (acc, (l, b)) =>
      when(col("lang") === l, lit(b)).otherwise(acc)
    }

  /** Token-budget domain mixing — the "data mixture" sampler: per
    * domain (`lang`), take documents in a deterministic md5 order until
    * the domain's whitespace-token budget is reached (a document is in
    * iff the budget was not yet exhausted BEFORE it — the first
    * straddling doc is included). This is how per-domain mixture
    * weights ("X billion tokens of web, Y of code") become a concrete,
    * reproducible document subset.
    *
    * Output: (doc_id, lang, n_tokens, cum_tokens) for selected docs.
    *
    * Scale caveat: the cumulative sum is one window partitioned by
    * `lang` — a handful of domains means a handful of giant sort
    * partitions. Correct at any scale but serial per domain; the
    * catalog and any 100 TB run should use [[tokenBudgetMixBucketed]],
    * which produces the IDENTICAL set (spec-gated) with the per-domain
    * sort split across 256 md5-prefix buckets. This form exists as the
    * obviously-correct definition and the oracle twin.
    */
  def tokenBudgetMix(
      docs: DataFrame,
      budgets: Map[String, Long],
      defaultBudget: Long
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs
      .select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budgetFor(budgets, defaultBudget))
  }

  /** [[tokenBudgetMix]] at scale: the per-domain cumulative sum is
    * decomposed over 256 buckets keyed by the FIRST BYTE of the same
    * md5 sort key — a prefix of the sort key, so ordering by (bucket,
    * md5) equals ordering by md5 and the decomposition is exact:
    * cum(doc) = (sum of whole buckets before mine) + (within-bucket
    * cumulative). The within-bucket windows run 256-way parallel per
    * domain instead of one giant sort partition, and the bucket-total
    * prefix is a (domains × 256)-row aggregate joined back via
    * broadcast. Output is IDENTICAL to [[tokenBudgetMix]] including
    * `cum_tokens` (property-tested); this is the form the catalog runs.
    */
  def tokenBudgetMixBucketed(
      docs: DataFrame,
      budgets: Map[String, Long],
      defaultBudget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = md5(col("doc_id").cast("string"))
    val base = docs.select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_tokens"),
      ord.as("ord"),
      // numeric value of the first 2 hex chars == lexicographic order
      // of the md5 prefix (hex digits sort identically as chars and
      // numbers), so bucket order is consistent with full-key order
      conv(substring(ord, 1, 2), 16, 10).cast("int").as("bkt"))
    val prefix = base
      .groupBy(col("lang"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn(
        "before",
        coalesce(
          sum(col("bkt_tokens")).over(
            Window.partitionBy(col("lang")).orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("lang"), col("bkt"), col("before"))
    val withinW = Window
      .partitionBy(col("lang"), col("bkt"))
      .orderBy(col("ord").asc, col("doc_id").asc)
    base
      .join(broadcast(prefix), Seq("lang", "bkt"))
      .withColumn("cum_tokens", col("before") + sum(col("n_tokens")).over(withinW))
      .filter(col("cum_tokens") - col("n_tokens") < budgetFor(budgets, defaultBudget))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
  }
}
