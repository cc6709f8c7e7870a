package graft.tools
import graft.SparkEntry
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession("32")
    for (n <- (if (args.nonEmpty) args.toSeq else Seq("q26_neardup_clusters", "q08_connected_components"))) {
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.1").count()
      val ts = (1 to 2).map { _ => val t0 = System.nanoTime(); fn(spark, "/root/testdata/sf0.1").count(); (System.nanoTime()-t0)/1e9 }
      println(f"$n: ${ts.min}%.2f s")
    }
    spark.stop()
  }
}
