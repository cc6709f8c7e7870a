package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost decomposition for the exact-substring removal op
  * (q49) at a given SF dir — the DebugIvf-style probe that found the
  * 62 s regression after the typed-map rewrite. Prints one timing line
  * per stage so the expensive stage is unambiguous.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DebugDupRemoval
  */
object DebugDupRemoval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dupremoval] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val stats = docs.agg(count(lit(1)), avg(size(split(col("text"), " ")))).head()
    println(s"[dupremoval] docs=${stats.getLong(0)} avg_tokens=${stats.getDouble(1)}")

    val k = 12
    // Bench.materialize, not count(): count() prunes the q48-shaped
    // left-join tail, so these stage lines would understate the honest
    // cost, inconsistent with the agg-based probes below (round-7
    // ADVICE item)
    time("full removeDuplicatedWindows (noop write)")(
      graft.Bench.materialize(Dedup.removeDuplicatedWindows(docs, k)))
    // the same front half q48 runs
    time("duplicatedWindowSpans (noop write)")(
      graft.Bench.materialize(Dedup.duplicatedWindowSpans(docs, k)))
    // removal aggregate alone (the sorted flagged-starts frame)
    time("removal agg via q48 tail sum")(
      Dedup.duplicatedWindowSpans(docs, k).agg(sum(col("n_dup_windows"))).head())

    // ---- ablations: where do the ~60 s go? ----------------------------
    val toks = split(col("text"), " ", -1)
    val occ = docs
      .select(
        col("doc_id"),
        posexplode(
          filter(
            transform(toks, (_, i) =>
              when(i <= size(toks) - k, concat_ws(" ", slice(toks, i + 1, lit(k))))),
            x => x.isNotNull))
          .as(Seq("strt", "win")))
      .select(col("doc_id"), col("strt"), md5(to_binary(col("win"), lit("utf-8"))).as("h"))
    time("occ explode+md5 full (sum strt)")(occ.agg(sum(col("strt"))).head())

    def packedPlain = shiftleft(col("doc_id").cast("long"), 20) + col("strt")
    val packedGuarded = packedPlain +
      coalesce(
        assert_true(
          col("doc_id") >= 0 && col("doc_id") < (1L << 43) && col("strt") < (1 << 20),
          lit("overflow")).cast("long"),
        lit(0L))
    time("keeper agg PLAIN packed")(
      occ.groupBy(col("h")).agg(min(packedPlain).as("keep")).agg(sum(col("keep"))).head())
    time("keeper agg GUARDED packed")(
      occ.groupBy(col("h")).agg(min(packedGuarded).as("keep")).agg(sum(col("keep"))).head())

    val keepersP = occ.groupBy(col("h")).agg(min(packedPlain).as("keep"))
    val flaggedP = occ.join(keepersP, Seq("h"))
      .withColumn("dup", (packedPlain =!= col("keep")).cast("long"))
    time("flag join PLAIN (sum dup)")(flaggedP.agg(sum(col("dup"))).head())
    val starts = sort_array(collect_list(when(col("dup") === 1, col("strt"))))
    val fold = aggregate(
      starts,
      struct(lit(-1L).as("prevEnd"), lit(0L).as("mass")),
      (acc, s) => struct(
        (s + k).cast("long").as("prevEnd"),
        (acc.getField("mass") + (s + k) - greatest(s.cast("long"), acc.getField("prevEnd")))
          .as("mass")),
      acc => acc.getField("mass"))
    time("per-doc fold PLAIN (sum mass)")(
      flaggedP.groupBy(col("doc_id"))
        .agg(sum(col("dup")).as("nd"), fold.as("dt"))
        .agg(sum(col("dt"))).head())

    // typed windowOcc + the two election shapes
    val occT = Dedup.windowOcc(docs, k)
    time("occ TYPED (sum strt)")(occT.agg(sum(col("strt"))).head())
    val keepersT = occT.groupBy(col("h")).agg(min(packedPlain).as("keep"))
    time("flag TYPED agg+join (sum dup)")(
      occT.join(keepersT, Seq("h"))
        .withColumn("dup", (packedPlain =!= col("keep")).cast("long"))
        .agg(sum(col("dup"))).head())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("strt"))
    time("flag TYPED window rn (sum dup)")(
      occT.withColumn("dup", (row_number().over(w) > 1).cast("long"))
        .agg(sum(col("dup"))).head())
    spark.stop()
  }
}
