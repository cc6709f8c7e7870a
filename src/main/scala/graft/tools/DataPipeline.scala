package graft.tools

import graft.ops.{Dedup, Packing, Sampling, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline demo: the catalog's LLM-data ops
  * composed the way a pretraining corpus build actually runs them —
  *
  *   filter policy (q42) → PII scrub (q41) → near-dup collapse (q37/
  *   q26) → exact-substring scrub (q49) → token-budget domain mix
  *   (q40) → partitioned corpus write → sequence packing (q46) +
  *   token-shard write
  *
  * and one JSON line of per-stage counts, including the policy's
  * drop-reason histogram. The point is composability: every stage
  * consumes the previous stage's frame, the text that reaches the
  * mixer is the REDACTED text, and dedup keeps each cluster's minimum
  * doc_id as its representative — the same contracts the individual
  * catalog oracles verify, chained.
  *
  * Stage boundaries are `localCheckpoint`ed: the policy/CC stages run
  * their own actions internally, and without the cut each later count
  * would recompute the whole upstream pipeline (the q26 lesson from
  * BENCH/BASELINE.md).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DataPipeline [outDir]
  */
object DataPipeline {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-corpus")
    // the first positional arg is a WRITE path — refuse the read-only
    // input trees outright (a swapped outDir/sfDir invocation would
    // otherwise drop lang= partition dirs into the source dataset)
    require(
      !outDir.startsWith("/root/testdata") && !outDir.startsWith("/root/reference"),
      s"outDir '$outDir' points into a read-only input tree; pass the OUTPUT dir first " +
        "(the corpus dir comes from SPARK_GRAFT_SF_DIR)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()

    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = documents.filter(col("doc_id") % 13 === 0)
    val corpus = documents.filter(col("doc_id") % 13 =!= 0)

    // 1. keep/drop policy with reason attribution
    val policy = TextOps.filterPolicy(corpus, bench).localCheckpoint()
    val reasons = policy.groupBy(col("reason")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = corpus.join(policy.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))

    // 2. PII scrub — downstream stages see only redacted text
    val scrubbed = TextOps.piiScrub(kept)
      .join(kept.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("redacted").as("text"),
        col("pii_total"))
      .localCheckpoint()
    val piiDocs = scrubbed.filter(col("pii_total") > 0).count()

    // 3. near-dup collapse (exact-dup-first flow); rep = min doc_id.
    // minBands = 6 of 8: the fixed-vocab synthetic corpus percolates
    // into 1-2 giant components at the catalog's permissive minBands=1
    // (every doc shares SOME shingle band with some doc), so the demo
    // uses the strict near-identical bar a real corpus build would
    val clusters = Dedup.nearDupClustersCollapsed(spark, scrubbed, minBands = 6)
    val reps = clusters.groupBy(col("cluster_id")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = scrubbed.join(reps.select("doc_id"), Seq("doc_id")).localCheckpoint()

    // 3b. exact-substring scrub (the q49 removal applied): cut verbatim
    // k-token repeats that survive the DOCUMENT-level collapse — the
    // RefinedWeb order (doc dedup, then substring removal, then mix).
    // Downstream token counts see the SCRUBBED text, so the mixer
    // budgets real tokens.
    val spanScrubbed = Dedup.removeDuplicatedWindows(
      deduped.select(col("doc_id"), col("text")), k = 12)
      .join(deduped.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("n_removed"))
      .localCheckpoint()
    val spanRemovedTokens = spanScrubbed
      .agg(coalesce(sum(col("n_removed")), lit(0L))).head().getLong(0)

    // 4. token-budget domain mix over the surviving corpus
    val mixed = Sampling.tokenBudgetMixBucketed(
      spanScrubbed, Map("en" -> 20000L, "de" -> 8000L), defaultBudget = 3000L)

    // 5. partitioned corpus write (dynamic overwrite per lang, the
    // Resume write-option contract)
    // stage boundary (the file's own rule): corpusOut feeds the corpus
    // write, the mixed-count agg, the packing plan, and the span
    // join-back — uncheckpointed, the mix window + join lineage would
    // re-run for each
    val corpusOut = mixed.select(col("doc_id"), col("lang"), col("n_tokens"))
      .join(spanScrubbed.select(col("doc_id"), col("text")), Seq("doc_id"))
      .localCheckpoint()
    corpusOut.write
      .partitionBy("lang")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(outDir)

    // report counts from corpusOut (what THIS run wrote), not a re-read
    // of outDir: dynamic partition overwrite only replaces partitions
    // present in the current write, so a re-run that drops a lang would
    // leave that lang's stale partition on disk and inflate a re-read
    val (nMixed, nTokens) = {
      val r = corpusOut
        .agg(count(lit(1)), sum(size(split(col("text"), " ")))).head()
      (r.getLong(0), r.getLong(1))
    }
    // 6. sequence packing: the mixed corpus concat-and-chunked into
    // 512-token shards; the shard write is partitioned by shard range
    // (shard_id div 64 — one directory per 64 shards keeps the
    // partition count bounded while the plan stays per-shard exact)
    val plan = Packing.packPlanBucketed(corpusOut, seqLen = 512)
    val shards = Packing.packedSpans(plan, corpusOut)
      .withColumn("shard_dir", expr("shard_id div 64"))
      .localCheckpoint() // written AND counted below — one computation
    shards.write
      .partitionBy("shard_dir")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$outDir-shards")
    val (nShards, nSpans) = {
      val r = shards.agg(countDistinct(col("shard_id")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }

    val sec = (System.nanoTime() - t0) / 1e9
    val reasonJson = reasons.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(
      f"""{"docs_in":${corpus.count()},"bench_docs":${bench.count()},""" +
        f""""kept":${reasons.getOrElse("kept", 0L)},"reasons":$reasonJson,""" +
        f""""pii_docs":$piiDocs,"dedup_reps":${deduped.count()},""" +
        f""""span_removed_tokens":$spanRemovedTokens,""" +
        f""""mixed_docs":$nMixed,"mixed_tokens":$nTokens,""" +
        f""""packed_shards":$nShards,"packed_spans":$nSpans,"sec":$sec%.3f,"out":"$outDir"}""")
    spark.stop()
  }
}
