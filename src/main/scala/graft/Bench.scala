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

  /** Timed KG run: returns (nDocs, seconds). Training (gazetteer + NER
    * MNB + DDI MNB) happens before the clock starts.
    */
  def kgRun(spark: SparkSession, nDocs: Long, parallelism: Int): (Long, Double) = {
    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()

    val evalDocs = DocGen.corpus(spark, nDocs, seed = 42L)
      .repartition(parallelism * 2)
      .cache()
    evalDocs.count() // materialize input outside the timed section

    val t0 = System.nanoTime()
    val sents = Pipeline.parse(spark, evalDocs)
    val (mentions, rels, trips) = Pipeline.run(spark, train, sents, "hybrid")
    val nMentions = mentions.count()
    val nTriples = trips.count()
    val sec = (System.nanoTime() - t0) / 1e9
    require(nMentions > 0 && nTriples > 0, "kg bench produced no output")
    train.unpersist(); evalDocs.unpersist()
    (nDocs, sec)
  }

  private val headlineOps = Seq(
    "q01_agg_pushdown", "q02_join_agg", "q03_window_lag", "q04_topk_per_group",
    "q06_sessionize", "q08_connected_components", "q13_simhash",
    "q15_minhash_sig", "q16_lsh_pairs", "q19_cosine_topk", "q20_multimodal_stub"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = mkSession(cpus)

    // KG throughput: corpus scaled to the sf tables (4x documents rows)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count() * 4
    val (kgDocs, kgSec) = kgRun(spark, nDocs, cpus.toInt)
    val docsPerSec = kgDocs / kgSec

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("kg_pipeline") = kgSec
    headlineOps.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","kg_docs":$kgDocs,"kg_docs_per_sec":$docsPerSec%.1f,"cpus":$cpus}"""
    )
    spark.stop()
  }
}
