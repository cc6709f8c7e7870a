package graft.tools

import graft.{Bench, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev tool: interleaved A/B of several catalog queries in ONE JVM —
  * the measurement the single-run driver bench cannot make. Round-robin
  * execution means every query sees the same JIT/GC/host state within
  * each round, so a real regression shows up as a LEVEL difference
  * across all rounds while placement noise shows up as correlated
  * drift. (BenchOne numbers are NOT comparable across JVMs for the same
  * reason — see BENCH/BASELINE.md.)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BenchInterleave <q1> <q2> ... [-- rounds]
  */
object BenchInterleave {
  def main(args: Array[String]): Unit = {
    val (names, rest) = args.span(_ != "--")
    require(names.nonEmpty, "usage: BenchInterleave <query>... [-- rounds]")
    val rounds = rest.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = names.map(n => n -> SparkEntry.queries(n))
    // the action is Bench.materialize (noop-format write), NOT count():
    // count() lets Catalyst prune computed columns and drop
    // left-join-to-keyed-aggregate tails, so an A/B timed with it
    // measures a skeleton plan — the exact dishonest-timing bug the
    // round-7 bench-action fix closed (round-7 ADVICE item).
    // one untimed warm-up pass (codegen + JIT)
    fns.foreach { case (_, fn) => Bench.materialize(fn(spark, sfDir)) }
    val times = collection.mutable.LinkedHashMap(names.map(_ -> Vector.empty[Double]): _*)
    (1 to rounds).foreach { r =>
      fns.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ sec
        println(f"""{"round":$r,"query":"$name","sec":$sec%.3f}""")
      }
    }
    times.foreach { case (name, ts) =>
      val sorted = ts.sorted
      val med = sorted(sorted.size / 2)
      println(f"""{"query":"$name","min":${ts.min}%.3f,"median":$med%.3f,"max":${ts.max}%.3f,"rounds":$rounds,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
