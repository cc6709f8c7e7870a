package graft.tools

import graft.fixtures.DocGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast

/** Shared scaffold for the cluster-mode mains ([[BenchCluster]],
  * [[ChaosCheck]]): session bring-up with executor-registration wait,
  * model fit + broadcast, corpus materialization, and the counting
  * scoring pass. One definition so the pass shape and its guards
  * cannot drift between the harnesses (they already had, once).
  */
object ClusterBench {

  final case class Ctx(
      spark: SparkSession,
      cores: Int,
      models: Broadcast[Pipeline.Models],
      evalDocs: org.apache.spark.sql.DataFrame,
      nDocs: Long
  ) {
    def liveExecs(): Int =
      spark.sparkContext.statusTracker.getExecutorInfos.length - 1 // minus driver
  }

  /** Build the session, wait for resources, fit + broadcast models,
    * materialize the corpus. `expectCores == 0` still waits for at
    * least one executor registration — sizing off the pre-registration
    * `defaultParallelism` floor of 2 under-partitions the whole run.
    */
  def setup(appName: String, nDocs: Long, expectCores: Int): Ctx = {
    val spark = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execs(): Int = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
    // BOTH branches wait for a registered executor: defaultParallelism
    // floors at 2 before any executor registers, so for expectCores <= 2
    // the cores check alone is vacuously true on an empty cluster
    val deadline = System.nanoTime() + 60L * 1000000000L
    while ((execs() < 1 ||
            (expectCores > 0 && spark.sparkContext.defaultParallelism < expectCores)) &&
           System.nanoTime() < deadline) Thread.sleep(500)
    val cores = spark.sparkContext.defaultParallelism
    require(expectCores == 0 || cores >= expectCores,
      s"only $cores cores registered, expected $expectCores")
    require(execs() >= 1, "no executor registered within 60s")

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
    Ctx(spark, cores, models, evalDocs, nDocs)
  }

  /** One timed scoring pass; returns (mentions, triples, seconds).
    * Refuses zero output — an all-zero pipeline must fail the bench,
    * never certify it.
    */
  def pass(ctx: Ctx): (Long, Long, Double) = {
    import org.apache.spark.sql.functions.{col, size => asize, sum => asum}
    val t0 = System.nanoTime()
    val row = Pipeline.score(ctx.spark, Pipeline.parse(ctx.spark, ctx.evalDocs), ctx.models)
      .select(asize(col("mentions")).as("m"), asize(col("triples")).as("t"))
      .agg(asum("m"), asum("t"))
      .head()
    require(row.getLong(0) > 0 && row.getLong(1) > 0, "cluster pass produced no output")
    (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
  }
}
