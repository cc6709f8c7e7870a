package graft.tools

import graft.fixtures.DocGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Cluster-mode KG throughput bench — the spark-submit entry point for
  * the north rule's REAL two-cluster-size evidence (N vs 4N standalone
  * workers; see tools/bench_cluster.sh). Unlike [[graft.Bench]] this
  * main takes its master/resources from spark-submit, so the same jar
  * runs unchanged on any cluster manager.
  *
  * Timed section mirrors Bench.kgRun: models fit once and broadcast
  * (over real RPC here, not local-mode shortcuts), then an untimed
  * warm-up pass and best-of-3 timed scoring passes over the same
  * materialized corpus.
  *
  * Usage: spark-submit --class graft.tools.BenchCluster <jar> [nDocs] [expectedCores]
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val expectCores = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .appName("graft-bench-cluster")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, size => asize, sum => asum}

    // defaultParallelism is 2 until executors REGISTER (the scheduler
    // backend floor) — sampling it at startup under-partitions the
    // whole run. Wait for the expected core count before sizing.
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.sparkContext.defaultParallelism < expectCores &&
           System.nanoTime() < deadline) Thread.sleep(500)
    val cores = spark.sparkContext.defaultParallelism
    require(expectCores == 0 || cores >= expectCores,
      s"only $cores cores registered, expected $expectCores")
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1 // minus driver

    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()
    val models = spark.sparkContext.broadcast(Pipeline.fit(spark, train, "hybrid"))

    // 8 waves (vs the local bench's 4): cache blocks land unevenly
    // across REAL executors, and with coarse partitions one executor's
    // extra wave idles the rest — finer tasks smooth the tail
    val evalDocs = DocGen.corpus(spark, nDocs, seed = 42L)
      .repartition(cores * 8)
      .cache()
    evalDocs.count()

    def onePass(): Double = {
      val t0 = System.nanoTime()
      val row = Pipeline.score(spark, Pipeline.parse(spark, evalDocs), models)
        .select(asize(col("mentions")).as("m"), asize(col("triples")).as("t"))
        .agg(asum("m"), asum("t"))
        .head()
      require(row.getLong(0) > 0 && row.getLong(1) > 0, "cluster bench produced no output")
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // warm-up (JIT + codegen on every executor)
    val sec = (1 to 3).map(_ => onePass()).min
    println(f"""{"executors":$execs,"cores":$cores,"docs":$nDocs,"sec":$sec%.3f,"tp":${nDocs / sec}%.1f}""")
    spark.stop()
  }
}
