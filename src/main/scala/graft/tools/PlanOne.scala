package graft.tools

import graft.{Bench, SparkEntry}

/** Dev tool: print ONE catalog query's `explain("formatted")` plan —
  * for capturing per-query before/after plan evidence (plans/rNN/)
  * without re-dumping the whole BENCH/PLANS.md catalog.
  *
  * Usage: runMain graft.tools.PlanOne <query> [sfDir]
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanOne <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
