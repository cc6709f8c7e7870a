package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE catalog query best-of-N — for isolating a single
  * query's cost at a given SF without paying for the whole `graft.Bench`
  * catalog (13+ min at sf1). Same session config as Bench (local[cpus],
  * ParallelGC comes from build.sbt javaOptions, shuffle partitions =
  * cpus), a noop write as the action (see Bench.materialize) followed
  * by an untimed count for the rows field.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BenchOne <query> [n]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [n]"))
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val rows = fn(spark, sfDir).count() // untimed: the rows field only
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      graft.Bench.materialize(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"query":"$name","try":$i,"sec":$sec%.3f,"rows":$rows}""")
      sec
    }
    println(f"""{"query":"$name","best":${times.min}%.3f,"n":$n,"sf":"$sfDir"}""")
    spark.stop()
  }
}
