package graft.tools

import graft.core.DocRow
import graft.ddi.Relations
import graft.evaluate.Evaluator
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Dev tool: grid the DDI decision margin; report typed F1 on train
  * (tuning metric — no eval leakage) and devel (held-out report).
  */
object DebugDdi {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def load(dir: String) = {
      val docs = Files.list(Paths.get(dir)).iterator().asScala.toSeq.sortBy(_.toString)
        .map(p => DocRow("r", p.toString, "0" * 40, "xml",
          new String(Files.readAllBytes(p), "UTF-8")))
      Pipeline.parse(spark, Pipeline.withSha(spark.createDataset(docs).toDF())).cache()
    }
    val train = load("/root/reference/data/train")
    val devel = load("/root/reference/data/devel")
    val test = load("/root/reference/data/test")
    val params = spark.sparkContext.broadcast(Relations.fit(spark, train))

    for (margin <- Seq(0.0, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0)) {
      def f1On(ds: org.apache.spark.sql.Dataset[graft.core.ParsedSentence]): (Double, Double, Double) = {
        val rels = Relations.predict(spark, ds, params, margin)
        val cls = Evaluator
          .evalRows(spark, Pipeline.goldDdi(spark, ds), Pipeline.predDdi(spark, rels))
          .find(_.kind == "CLASS").get
        (cls.p, cls.r, cls.f1)
      }
      val (tp, tr, tf) = f1On(train)
      val (dp, dr, df) = f1On(devel)
      val (xp, xr, xf) = f1On(test)
      println(f"margin=$margin%.1f train P=$tp%.3f R=$tr%.3f F1=$tf%.3f | devel P=$dp%.3f R=$dr%.3f F1=$df%.3f | test P=$xp%.3f R=$xr%.3f F1=$xf%.3f")
    }
    spark.stop()
  }
}
