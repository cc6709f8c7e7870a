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
}
