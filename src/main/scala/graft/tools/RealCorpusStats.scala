package graft.tools

import graft.core.DocRow
import graft.evaluate.Evaluator
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Honest quality numbers on the real DDI corpus (read-only reference
  * data): train the deterministic stack on data/train, evaluate on
  * data/devel with the exact reference evaluator. These are reported in
  * BASELINE.md next to the synthetic-corpus gate numbers.
  */
object RealCorpusStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def load(dir: String) = {
      val docs = Files.list(Paths.get(dir)).iterator().asScala.toSeq
        .sortBy(_.toString)
        .map(p => DocRow("repo-ref", p.toString, "0" * 40, "xml",
          new String(Files.readAllBytes(p), "UTF-8")))
      Pipeline.parse(spark, Pipeline.withSha(spark.createDataset(docs).toDF())).cache()
    }
    val train = load("/root/reference/data/train")
    val devel = load("/root/reference/data/devel")
    println(s"train sentences: ${train.count()}, devel: ${devel.count()}")

    for (scorer <- Seq("gazetteer", "mnb", "hybrid")) {
      val (ms, rels, _) = Pipeline.run(spark, train, devel, scorer)
      println(s"== NER devel [$scorer] ==")
      print(Evaluator.statsTable(Pipeline.evaluateNER(spark, devel, ms)))
      if (scorer == "hybrid") {
        println(s"== DDI devel [mnb pair classifier] ==")
        print(Evaluator.statsTable(Pipeline.evaluateDDI(spark, devel, rels)))
      }
    }
    spark.stop()
  }
}
