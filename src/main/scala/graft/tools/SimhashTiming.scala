package graft.tools
import graft.ops.TextOps
import org.apache.spark.sql.functions._
object SimhashTiming {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession("32")
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    d.count()
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$tag: ${ts.min}%.3f s (xor=${f})")
    }
    for (bits <- Seq(16, 60)) {
      time(s"agg   bits=$bits") {
        TextOps.simhash(d, bits).agg(expr("bit_xor(simhash)")).head.getLong(0)
      }
      time(s"local bits=$bits") {
        d.select(TextOps.simhashExpr($"text", bits).as("simhash")).agg(expr("bit_xor(simhash)")).head.getLong(0)
      }
    }
    spark.stop()
  }
}
