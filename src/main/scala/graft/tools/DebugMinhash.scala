package graft.tools

import graft.Bench
import graft.ops.Dedup
import org.apache.spark.sql.functions._

object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.mkSession("32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("shingleRows flatMap") { Dedup.shingleRows(docs).count() }
    time("shingleRows + 1band agg") {
      Dedup.shingleRows(docs).groupBy(col("doc_id"))
        .agg(min(conv(substring(md5(to_binary(concat(col("shingle"), lit("#0")), lit("utf-8"))),1,15),16,10).cast("long"))).count()
    }
    time("full minhash 8 bands") { Dedup.minhashSignatures(docs).count() }
    time("lsh pairs") { Dedup.lshCandidates(docs).count() }
    Dedup.minhashSignatures(docs).explain("formatted")
    spark.stop()
  }
}
