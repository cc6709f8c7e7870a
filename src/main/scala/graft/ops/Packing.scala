package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the stage every pretraining pipeline ends in:
  * after mixture selection (q40) the surviving documents are
  * concatenated in a deterministic order and CHUNKED into fixed-length
  * token shards (the GPT/Llama concat-and-chunk shape: documents
  * straddle shard boundaries; the plan records every (doc, shard) span
  * so boundaries are recoverable for attention-masking or provenance).
  *
  * The op computes the packing PLAN, not the token bytes: one row per
  * (shard, doc) span —
  * (shard_id, doc_id, start_in_shard, span_tokens, doc_offset) —
  * which is a pure deterministic function of the corpus (order =
  * (md5(doc_id), doc_id), token count = whitespace tokens), so DuckDB
  * replays it exactly via window prefix-sums. A writer then joins the
  * plan back to the text and emits one file per shard range
  * ([[graft.tools.DataPipeline]] demonstrates the full funnel).
  */
object Packing {

  /** The one deterministic global order both engines agree on —
    * md5(doc_id) with doc_id tiebreak (same contract as
    * [[Sampling.tokenBudgetMix]]).
    */
  private def ordKey: Column = md5(col("doc_id").cast("string"))

  private def spanCols(seqLen: Long): Seq[Column] = {
    val s0 = greatest(col("start"), col("shard_id") * seqLen)
    val s1 = least(col("cum"), (col("shard_id") + 1) * seqLen)
    Seq(
      col("shard_id"),
      col("doc_id"),
      (s0 - col("shard_id") * seqLen).as("start_in_shard"),
      (s1 - s0).as("span_tokens"),
      (s0 - col("start")).as("doc_offset"))
  }

  private def explodeShards(withCum: DataFrame, seqLen: Long): DataFrame =
    withCum
      .withColumn("start", col("cum") - col("n_tokens"))
      .select(
        col("doc_id"), col("start"), col("cum"),
        // integer `div`, not floor(double /): bit-exact at any offset
        // (the DuckDB replay uses BIGINT // too)
        explode(sequence(
          expr(s"start div ${seqLen}L"),
          expr(s"(cum - 1) div ${seqLen}L"))).as("shard_id"))
      .select(spanCols(seqLen): _*)

  /** Reference form: ONE global window computes the exclusive prefix
    * sum of token counts, then each doc explodes into the shards its
    * token range overlaps. Obviously correct and the oracle twin, but
    * the single unpartitioned window is a global sort — use
    * [[packPlanBucketed]] (identical output, spec-gated) everywhere
    * real.
    */
  def packPlan(docs: DataFrame, seqLen: Long = 512): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.orderBy(ordKey.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    explodeShards(
      docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w)),
      seqLen)
  }

  /** [[packPlan]] at scale: the global cumulative sum is decomposed
    * over 256 buckets keyed by the first byte of the md5 order key —
    * a PREFIX of the sort key, so (bucket, key) order equals key order
    * and the decomposition is exact: cum(doc) = Σ(earlier buckets'
    * totals) + within-bucket cumulative. The within-bucket windows run
    * 256-way parallel instead of one global sort, and the bucket-total
    * prefix is a 256-row broadcast — the same exact-decomposition
    * trick as [[Sampling.tokenBudgetMixBucketed]], without the
    * per-domain partition. Output is IDENTICAL to [[packPlan]]
    * (spec-gated, including span arithmetic).
    */
  def packPlanBucketed(docs: DataFrame, seqLen: Long = 512): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      ordKey.as("ord"),
      conv(substring(ordKey, 1, 2), 16, 10).cast("int").as("bkt"))
    val prefix = base
      .groupBy(col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn(
        "before",
        coalesce(
          sum(col("bkt_tokens")).over(
            Window.orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bkt"), col("before"))
    val withinW = Window.partitionBy(col("bkt"))
      .orderBy(col("ord").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    explodeShards(
      base
        .join(broadcast(prefix), Seq("bkt"))
        .withColumn("cum", col("before") + sum(col("n_tokens")).over(withinW))
        .select(col("doc_id"), col("n_tokens"), col("cum")),
      seqLen)
  }

  /** Materialize packed shards: join the plan back to the corpus and
    * emit, per (shard, doc) span, the actual token slice it
    * contributes, ordered by position — `write.partitionBy("shard_id")`
    * on this frame is the token-shard writer (DataPipeline does
    * exactly that). The join is plan⋈docs on doc_id — each side
    * shuffles once; the slice is row-local.
    */
  def packedSpans(plan: DataFrame, docs: DataFrame): DataFrame =
    plan
      .join(docs.select(col("doc_id"), split(col("text"), " ").as("toks")), Seq("doc_id"))
      .select(
        col("shard_id"),
        col("doc_id"),
        col("start_in_shard"),
        col("span_tokens"),
        array_join(
          slice(
            col("toks"),
            (col("doc_offset") + 1).cast("int"),
            col("span_tokens").cast("int")),
          " ").as("span_text"))
}
