package graft.tools

import graft.{Bench, SparkEntry}

/** Dev tool: run each headline query twice to separate codegen/JIT
  * warm-up from steady-state cost.
  */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.mkSession("32")
    val names = Seq("q01_agg_pushdown", "q02_join_agg", "q03_window_lag",
      "q16_lsh_pairs", "q19_cosine_topk")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
