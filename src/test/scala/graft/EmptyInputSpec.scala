package graft

import org.scalatest.funsuite.AnyFunSuite

/** Totality gate: every catalog query must execute (not throw) against
  * schema-correct EMPTY input tables — a library claim ("a user can run
  * every query") and an ANSI-mode trap detector (Spark 4 throws on
  * things like element_at out-of-bounds or div-by-zero that silently
  * return null elsewhere). KG queries build their own synthetic corpus
  * and are exercised by PipelineSpec, so only the table-reading queries
  * run here.
  */
class EmptyInputSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sf_empty").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "customer", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("every table-reading catalog query executes on empty inputs") {
    val tableQueries = SparkEntry.queries.keys.filterNot(_.startsWith("kg_mentions"))
      .filterNot(Set("kg_triples", "kg_feature_rows", "kg_eval_ner", "kg_eval_ddi",
        "kg_canonical_map", "kg_gold_spans", "kg_gold_pairs"))
      .toSeq.sorted
    val failures = tableQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
