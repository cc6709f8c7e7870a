package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch decomposition of the sf1 kg_ann_ivf_all cost (round 6). */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val boosted = Similarity.clusterBoost(raw)
    val n = t("count")(boosted.count())
    val emb = t("localCheckpoint")(boosted.localCheckpoint())
    val nCells = Similarity.ivfAutoCells(n)
    println(s"[ivf] n=$n nCells=$nCells")
    val cents = t("centroids")(Similarity.ivfCentroids(emb, nCells))
    val assigned = t("assign+count")(Similarity.ivfAssign(emb, cents).localCheckpoint())
    println(s"[ivf] assigned rows=${assigned.count()}")
    t("cellsizes")(assigned.groupBy("cell").count().orderBy(desc("count")).show(5))
    val topk = t("full ivfTopK")(Similarity.ivfTopK(emb, emb, 3, nCells, 2).count())
    println(s"[ivf] topk rows=$topk")
    spark.stop()
  }
}
