package graft.tools

/** Cluster-mode KG throughput bench — the spark-submit entry point for
  * the north rule's REAL two-cluster-size evidence (N vs 4N standalone
  * workers; see tools/bench_cluster.sh). Unlike [[graft.Bench]] this
  * main takes its master/resources from spark-submit, so the same jar
  * runs unchanged on any cluster manager.
  *
  * Timed section mirrors Bench.kgRun: models fit once and broadcast
  * (over real RPC here, not local-mode shortcuts), then an untimed
  * warm-up pass and best-of-3 timed scoring passes over the same
  * materialized corpus. Scaffold shared with [[ChaosCheck]] via
  * [[ClusterBench]].
  *
  * Usage: spark-submit --class graft.tools.BenchCluster <jar> [nDocs] [expectedCores]
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val expectCores = args.lift(1).map(_.toInt).getOrElse(0)
    val ctx = ClusterBench.setup("graft-bench-cluster", nDocs, expectCores)
    val execs = ctx.liveExecs()
    ClusterBench.pass(ctx) // warm-up (JIT + codegen on every executor)
    val sec = (1 to 3).map(_ => ClusterBench.pass(ctx)._3).min
    println(f"""{"executors":$execs,"cores":${ctx.cores},"docs":$nDocs,"sec":$sec%.3f,"tp":${nDocs / sec}%.1f}""")
    ctx.spark.stop()
  }
}
