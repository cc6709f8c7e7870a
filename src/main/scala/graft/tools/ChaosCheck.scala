package graft.tools

/** Fault-tolerance check on the REAL standalone cluster (driven by
  * tools/chaos_cluster.sh): score the same corpus twice — once clean,
  * once while the harness SIGKILLs an executor JVM mid-pass — and
  * require bit-identical mention/triple counts. Exercises the two
  * recovery paths a 1000-executor deployment lives on: failed-task
  * retry on surviving executors, and recomputation of the killed
  * executor's lost cache blocks from (deterministic) lineage.
  * Scaffold shared with [[BenchCluster]] via [[ClusterBench]] — both
  * passes refuse zero output, and setup refuses a partially-registered
  * cluster (killing the ONLY executor would demonstrate nothing).
  *
  * Protocol with the harness: prints `CHAOS-READY` immediately before
  * the second pass; the harness kills one CoarseGrainedExecutorBackend
  * a few seconds after seeing it. The harness verifies the kill really
  * landed (master log) — a chaos run where nothing died must FAIL.
  *
  * Usage: spark-submit --class graft.tools.ChaosCheck <jar> [nDocs] [expectedCores]
  */
object ChaosCheck {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(400000L)
    val expectCores = args.lift(1).map(_.toInt).getOrElse(0)
    val ctx = ClusterBench.setup("graft-chaos-check", nDocs, expectCores)

    val execsStart = ctx.liveExecs()
    require(execsStart >= 2,
      s"need >= 2 executors for a meaningful chaos test, have $execsStart")
    val (cm, ct, cleanSec) = ClusterBench.pass(ctx)
    // app id lets the harness scope its pgrep to THIS app's executors —
    // a concurrent Spark app's executor must never be the chaos victim
    println(s"CHAOS-READY app=${ctx.spark.sparkContext.applicationId}")
    System.out.flush()
    Thread.sleep(1000)
    val (dm, dt, chaosSec) = ClusterBench.pass(ctx)
    val execsEnd = ctx.liveExecs()
    val ok = cm == dm && ct == dt
    println(
      s"""{"match":$ok,"docs":$nDocs,"mentions":$cm,"triples":$ct,""" +
        f""""clean_sec":$cleanSec%.3f,"chaos_sec":$chaosSec%.3f,""" +
        s""""executors_start":$execsStart,"executors_end":$execsEnd}""")
    require(ok, s"chaos pass diverged: clean=($cm,$ct) chaos=($dm,$dt)")
    ctx.spark.stop()
  }
}
