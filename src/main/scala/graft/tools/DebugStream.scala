package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

object DebugStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(86400000L + 60000L * min)
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(
      StreamOps.Event(1, ts(0), 1, "a", 0.0),
      StreamOps.Event(2, ts(10), 1, "a", 0.0)
    )
    val q = StreamOps.sessionizeStream(spark, mem.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    q.processAllAvailable()
    println("after batch1: " + spark.table("sess").collect().mkString(", "))
    mem.addData(StreamOps.Event(3, ts(300), 2, "a", 0.0))
    q.processAllAvailable()
    println("after batch2: " + spark.table("sess").collect().mkString(", "))
    mem.addData(StreamOps.Event(4, ts(600), 2, "a", 0.0))
    q.processAllAvailable()
    println("after batch3: " + spark.table("sess").collect().mkString(", "))
    q.stop()
    spark.stop()
  }
}
