package graft.tools

import graft.Bench
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev tool: native CosineSim vs zip_with+aggregate HOF on a synthetic
  * all-pairs similarity join (the q18/q19 hot shape). Usage:
  * `runMain graft.tools.DebugCosine [nVecs] [dim]`.
  */
object DebugCosine {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Bench.mkSession("32")
    import spark.implicits._

    val emb = spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(hash(col("id"), i), lit(1000)).cast("float") / 100f - 5f)
          .as("embedding"))
      .cache()
    emb.count()

    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        pairs.select(c.as("cos")).agg(sum(when(col("cos") > 0.5, 1L).otherwise(0L))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${runs.map(t => f"$t%.2f").mkString(" ")}  (best ${runs.min}%.2f s)")
      runs.min
    }

    val tn = time("native CosineSim      ", Similarity.cosine(col("e_a"), col("e_b")))
    val th = time("zip_with+aggregate HOF", Similarity.cosineHof(col("e_a"), col("e_b")))
    println(f"pairs=${n.toLong * (n - 1) / 2}%d dim=$dim speedup=${th / tn}%.2fx")
    spark.stop()
  }
}
