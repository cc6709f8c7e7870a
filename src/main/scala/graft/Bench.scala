package graft

import graft.fixtures.DocGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]` and prints ONE JSON
  * line.
  *
  * Headline components:
  *   - `kg_pipeline`: the full KG construction run (parse → tokenize →
  *     NER score/decode → DDI classify → triples) over a synthetic docs
  *     corpus scaled to the sf (4× the documents-table row count).
  *     Model fitting is done once on a fixed 500-doc train corpus and
  *     excluded from the timed section — at 100 TB the model is fit once
  *     and broadcast, scoring is the recurring cost.
  *   - the ops queries from SparkEntry (dedup / similarity / text /
  *     events) on the sf tables.
  */
object Bench {

  /** The benchmark ACTION: a noop-format write, which evaluates every
    * output column of every row. The previous `count()` action let
    * Catalyst prune whatever does not change cardinality — all computed
    * columns of a pure per-doc select (q09-q12 read as a bare parquet
    * row count!) and the ENTIRE right subtree of the
    * base-LEFT-JOIN-keyed-aggregate tail the dup-spans family and the
    * decontaminate/incremental ops end in (the optimizer drops a left
    * join to an aggregate whose grouping key is the join key when no
    * right-side column is referenced). Found via DebugDupRemoval when
    * q48's 0.1 s ledger row met its 67 s honest evaluation. Ledger
    * totals before/after this change are NOT comparable — the
    * re-baseline rows in BENCH/BASELINE.md mark the cut.
    */
  def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def mkSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Timed KG run: returns (nDocs, bestSeconds, firstSeconds). Model
    * fitting (gazetteer + NER MNB + DDI MNB + canonical map) happens
    * before the clock; the timed section is the fused scoring pass
    * (parse -> tokenize -> tag -> decode -> DDI -> triples), counted
    * through one action. One UNTIMED warm-up run (codegen + JIT, like a
    * long-running cluster's steady state) precedes best-of-3 timed runs
    * — the round-2 ledger logged a phantom 2x "regression" from a cold
    * first run colliding with host contention; first-run time is still
    * returned so contention stays visible in the bench JSON.
    */
  def kgRun(spark: SparkSession, nDocs: Long, parallelism: Int): (Long, Double, Double) = {
    import spark.implicits._
    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()
    val models = spark.sparkContext.broadcast(Pipeline.fit(spark, train, "hybrid"))

    // 4 waves of tasks: long-tail tasks overlap instead of straggling
    // at the end of a 2-wave schedule
    val evalDocs = DocGen.corpus(spark, nDocs, seed = 42L)
      .repartition(parallelism * 4)
      .cache()
    evalDocs.count() // materialize input outside the timed section

    def onePass(): Double = {
      val t0 = System.nanoTime()
      val scored = Pipeline.score(spark, Pipeline.parse(spark, evalDocs), models)
      // columnar size+sum (stays on InternalRow; a typed .map here would
      // decode every nested SentenceResult back to objects just to count)
      val row = scored
        .select(
          org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("mentions")).as("m"),
          org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("triples")).as("t"))
        .agg(
          org.apache.spark.sql.functions.sum("m"),
          org.apache.spark.sql.functions.sum("t"))
        .head()
      require(row.getLong(0) > 0 && row.getLong(1) > 0, "kg bench produced no output")
      (System.nanoTime() - t0) / 1e9
    }
    val first = onePass() // warm-up: untimed-for-record, reported separately
    val times = (1 to 3).map(_ => onePass())
    train.unpersist(); evalDocs.unpersist(); models.destroy()
    (nDocs, times.min, first)
  }

  private val headlineOps = Seq(
    "q01_agg_pushdown", "q02_join_agg", "q03_window_lag", "q04_topk_per_group",
    "q06_sessionize", "q08_connected_components", "q13_simhash",
    "q15_minhash_sig", "q16_lsh_pairs", "q18_embed_neardup", "q19_cosine_topk",
    "q20_multimodal", "q21_minhash_fast", "q22_lsh_pairs_fast",
    "q23_token_bpe", "q26_neardup_clusters", "q27_simhash_neardup",
    "q34_token_rarity", "q35_boilerplate", "q36_frame_sample", "kg_ann_ivf",
    "q38_decontaminate", "q39_repetition", "q40_token_budget_mix",
    "q41_pii_scrub", "q42_filter_policy"
  )

  /** Catalog keys excluded from the sf1 full-catalog ledger: these run
    * on the FIXED reference-shaped synthetic corpus (they ignore the sf
    * dir), so timing them at "sf1" would record constant-size work under
    * a scaled label. Their sf-scaled twin IS `kg_pipeline` (the fused
    * scoring pass over a 4×-documents corpus), which every mode times.
    */
  private[graft] val fixedCorpusQueries = Set(
    "kg_mentions", "kg_mentions_crf", "kg_triples", "kg_feature_rows",
    "kg_eval_ner", "kg_eval_ner_crf", "kg_eval_ddi", "kg_canonical_map",
    "kg_gold_spans", "kg_gold_pairs"
  )

  /** Excluded from sf1 for a different reason: their EXACT side is
    * `Similarity.bruteForceTopK(emb, emb, k)` over ALL rows — a bounded
    * Θ(n²) recall VERIFIER (like q18's guard rationale), ~4·10⁸ cosine
    * evaluations at sf1's 20k vectors per timed run. They are
    * correctness instruments, not scale paths; the ANN surfaces they
    * verify (kg_ann_bucketed/clustered/cluster_map) ARE in the sf1
    * ledger, and kg_ann_ivf_recall stays (its exact side is 20 query
    * rows, not the full table).
    */
  private[graft] val quadraticVerifierQueries = Set(
    "kg_ann_recall", "kg_ann_clustered_recall", "kg_ann_ivf_all_recall"
  )

  /** Excluded from the RECURRING sf1 ledger after their behavior was
    * pinned (round 6, BENCH/BASELINE.md): hyperplane-LSH top-k on the
    * clusterBoost corpus is degenerate BY CONSTRUCTION — sign-bit
    * buckets are angularly atomic, so buckets collapse to whole
    * clusters and the per-bucket self-join is Θ(Σ cluster²) (measured
    * 131-190 s per run at 20k vectors, ~9 min of every full ledger run
    * counting warm-ups). The A/B against their IVF twins
    * (kg_ann_ivf_all / kg_ann_ivf_map — which stay timed) is recorded
    * in the ledger; re-measuring a structural fact each round buys
    * nothing. They remain fully oracle-gated in Verify at every sf.
    */
  private[graft] val degenerateOnClusteredQueries = Set(
    "kg_ann_clustered", "kg_ann_cluster_map"
  )

  /** Fourth exclusion set (round 7): the guarded Θ(n²) EXACT verifier.
    * q18 is the same instrument class as [[quadraticVerifierQueries]] —
    * a bounded all-pairs correctness check, refuse-by-default above
    * 100k rows, whose scale role is served by the ANN paths — but it
    * was still timed in the recurring sf1 row, where it contributed
    * ~40% of the 353–365 s total AND most of its variance (140–153 s
    * per run). Its final A/B is pinned in BENCH/BASELINE.md; it stays
    * fully oracle-gated in Verify at every sf and keeps its sf0.1
    * headline slot (the 11–20 s regression band was pinned with it in).
    */
  private[graft] val guardedQuadraticQueries = Set(
    "q18_embed_neardup"
  )

  /** sf1 mode times the ENTIRE sf-dir-driven catalog (every
    * SparkEntry.queries key minus [[fixedCorpusQueries]]) so the sf1
    * ledger has a row for each catalog surface; sf0.1 mode keeps the
    * faster headline subset the round-over-round noise band is pinned on.
    */
  private[graft] def sf1Catalog: Seq[String] =
    SparkEntry.queries.keys.toSeq
      .filterNot(fixedCorpusQueries)
      .filterNot(quadraticVerifierQueries)
      .filterNot(degenerateOnClusteredQueries)
      .filterNot(guardedQuadraticQueries)
      .sorted

  /** sf1 soak dir; regenerated deterministically by tools/gen_sf1.py
    * when absent (/tmp is wiped between sessions — testdata is
    * read-only, so the 10× dataset lives there). The generator is
    * seeded: a regenerated dataset is bit-identical to the round-4
    * soak's documents/embeddings draw.
    */
  private[graft] def ensureSf1(): String = {
    val dir = "/tmp/sf1"
    val marker = java.nio.file.Paths.get(dir, "embeddings.parquet")
    if (!java.nio.file.Files.exists(marker)) {
      System.err.println(s"[bench] $dir missing — regenerating via tools/gen_sf1.py")
      val rc = new ProcessBuilder("python3", "tools/gen_sf1.py").inheritIO().start().waitFor()
      require(rc == 0 && java.nio.file.Files.exists(marker), s"gen_sf1.py failed (rc=$rc)")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    // `sf1` mode (runMain graft.Bench sf1): the recurring 10× soak —
    // same catalog, /tmp/sf1 input (regenerate-if-missing), results
    // additionally archived to BENCH/last_bench_sf1.json so
    // round-over-round sf1 rows exist (the sf0.1 noise band is too wide
    // to regression-track the heavy dedup queries).
    val sf1Mode = args.contains("sf1")
    val sfDir =
      if (sf1Mode) ensureSf1()
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = mkSession(cpus)

    // KG throughput: corpus scaled to the sf tables (4x documents rows)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count() * 4
    val (kgDocs, kgSec, kgFirstSec) = kgRun(spark, nDocs, cpus.toInt)
    val docsPerSec = kgDocs / kgSec

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    results("kg_pipeline") = kgSec
    (if (sf1Mode) sf1Catalog else headlineOps).foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warm-up (codegen + JIT, like a long-running cluster's
      // steady state), then min of 2 timed runs to damp machine noise.
      // A query that THROWS is recorded in `errors` and omitted from
      // `results` (and the total) — a fast-fail must not land as a
      // near-zero timing row the ledger diff reads as a speedup; the
      // process exits nonzero so the regression gate sees it too.
      try materialize(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name warm-up: ${e.getMessage}") }
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            errors += name
            None
        }
      }
      if (times.nonEmpty && !errors.contains(name)) results(name) = times.min
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.sum
    // kg_pipeline_first rides outside "queries" (and the total) so host
    // contention is visible without skewing round-over-round totals
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","kg_docs":$kgDocs,"kg_docs_per_sec":$docsPerSec%.1f,"kg_pipeline_first":$kgFirstSec%.3f,"cpus":$cpus}"""
    println(json)
    // belt-and-braces for the driver: the same JSON at a stable path, in
    // case the stdout line is decorated or truncated in transit
    val benchDir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(benchDir)
    java.nio.file.Files.writeString(
      benchDir.resolve(if (sf1Mode) "last_bench_sf1.json" else "last_bench.json"), json + "\n")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] RED: ${errors.size} queries failed: ${errors.mkString(", ")}")
      sys.exit(1)
    }
  }
}
