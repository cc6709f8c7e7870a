package graft.tools

import graft.evaluate.Evaluator
import graft.io.PredFile
import graft.pipeline.Pipeline
import graft.core.DocRow
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Standalone evaluator CLI — the E3 contract
  * (ml/evaluator.py:189-199): `EvaluateCli (NER|DDI) golddir outfile`,
  * printing the identical statistics table. golddir holds reference-
  * format XML files; outfile holds `key|class` lines.
  */
object EvaluateCli {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      println("\n  Usage: evaluator.py (NER|DDI) golddir outfile\n")
      return
    }
    val Array(task, golddir, outfile) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Files.list(Paths.get(golddir)).iterator().asScala.toSeq
      .sortBy(_.toString)
      .map(p => DocRow("repo-cli", p.toString, "0" * 40, "xml",
        new String(Files.readAllBytes(p), "UTF-8")))
    val sents = Pipeline.parse(spark, Pipeline.withSha(spark.createDataset(docs).toDF()))

    val gold = task match {
      case "NER" => Pipeline.goldNer(spark, sents)
      case "DDI" => Pipeline.goldDdi(spark, sents)
      case other =>
        println(s"Invalid task '$other'. Please specify 'NER' or 'DDI'.")
        spark.stop(); return
    }
    val pred = PredFile.read(spark, outfile)
    print(Evaluator.statsTable(Evaluator.evalRows(spark, gold, pred)))
    spark.stop()
  }
}
