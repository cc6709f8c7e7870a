package graft.tools

import graft.fixtures.DocGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Fault-tolerance check on the REAL standalone cluster (driven by
  * tools/chaos_cluster.sh): score the same corpus twice — once clean,
  * once while the harness SIGKILLs an executor JVM mid-pass — and
  * require bit-identical mention/triple counts. Exercises the two
  * recovery paths a 1000-executor deployment lives on: failed-task
  * retry on surviving executors, and recomputation of the killed
  * executor's lost cache blocks from (deterministic) lineage.
  *
  * Protocol with the harness: prints `CHAOS-READY` immediately before
  * the second pass; the harness kills one CoarseGrainedExecutorBackend
  * a few seconds after seeing it.
  *
  * Usage: spark-submit --class graft.tools.ChaosCheck <jar> [nDocs] [expectedCores]
  */
object ChaosCheck {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(400000L)
    val expectCores = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .appName("graft-chaos-check")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, size => asize, sum => asum}

    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.sparkContext.defaultParallelism < expectCores &&
           System.nanoTime() < deadline) Thread.sleep(500)
    val cores = spark.sparkContext.defaultParallelism
    def liveExecs(): Int =
      spark.sparkContext.statusTracker.getExecutorInfos.length - 1

    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()
    val models = spark.sparkContext.broadcast(Pipeline.fit(spark, train, "hybrid"))
    val evalDocs = DocGen.corpus(spark, nDocs, seed = 42L)
      .repartition(cores * 8)
      .cache()
    evalDocs.count()

    def pass(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val row = Pipeline.score(spark, Pipeline.parse(spark, evalDocs), models)
        .select(asize(col("mentions")).as("m"), asize(col("triples")).as("t"))
        .agg(asum("m"), asum("t"))
        .head()
      (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    val execsStart = liveExecs()
    val (cm, ct, cleanSec) = pass()
    println("CHAOS-READY") // harness kills one executor shortly after this
    System.out.flush()
    Thread.sleep(1000)
    val (dm, dt, chaosSec) = pass()
    val execsEnd = liveExecs()
    val ok = cm == dm && ct == dt
    println(
      s"""{"match":$ok,"docs":$nDocs,"mentions":$cm,"triples":$ct,""" +
        f""""clean_sec":$cleanSec%.3f,"chaos_sec":$chaosSec%.3f,""" +
        s""""executors_start":$execsStart,"executors_end":$execsEnd}""")
    require(ok, s"chaos pass diverged: clean=($cm,$ct) chaos=($dm,$dt)")
    spark.stop()
  }
}
