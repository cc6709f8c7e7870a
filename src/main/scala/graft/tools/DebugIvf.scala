package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch decomposition of the sf1 kg_ann_ivf_all cost (round 6). */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // `bigcells` mode: the assignment-path A/B — per-centroid-literal
    // plan vs broadcast-matrix mapPartitions at growing cell counts.
    // Since round 8 the broadcast path is the ONLY selected path (the
    // honest A/B below is why — see withNearestCells); the literal arm
    // is timed here as the reference. The broadcast path must stay
    // flat through nCells >= 4096, where √(nProbe·n) lands for
    // corpus-scale n.
    if (args.contains("bigcells")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
      println(s"[ivf] bigcells corpus rows=${emb.count()}")
      // Bench.materialize, not .select("cells").count(): count() let
      // Catalyst PRUNE the literal path's `cells` projection entirely
      // (the broadcast path is an opaque mapPartitions and cannot be
      // pruned), so the original A/B compared a literal SKELETON against
      // an honest broadcast evaluation — the same count()-action bug the
      // round-7 bench fix closed, discovered here in round 8 when the
      // "slower" broadcast path won the honest q47 A/B.
      for (nCells <- Seq(16, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)) {
        val cents = Similarity.ivfCentroids(emb, nCells)
        val bSec = t(s"broadcast assign nCells=$nCells") {
          graft.Bench.materialize(
            Similarity.withNearestCells(emb, cents, 2, "cells", Some(true))
              .select(col("cells")))
        }
        // literal path only while it is plan-viable; above the selection
        // threshold it exists only as the small-nCells fast path
        if (nCells <= 1024) {
          t(s"literal   assign nCells=$nCells") {
            graft.Bench.materialize(
              Similarity.withNearestCells(emb, cents, 2, "cells", Some(false))
                .select(col("cells")))
          }
        }
        val _ = bSec
      }
      spark.stop()
      return
    }
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val boosted = Similarity.clusterBoost(raw)
    val n = t("count")(boosted.count())
    val emb = t("localCheckpoint")(boosted.localCheckpoint())
    val nCells = Similarity.ivfAutoCells(n)
    println(s"[ivf] n=$n nCells=$nCells")
    val cents = t("centroids")(Similarity.ivfCentroids(emb, nCells))
    val assigned = t("assign+count")(Similarity.ivfAssign(emb, cents).localCheckpoint())
    println(s"[ivf] assigned rows=${assigned.count()}")
    t("cellsizes")(assigned.groupBy("cell").count().orderBy(desc("count")).show(5))
    // decompose the search: probes alone, candidate join alone (no
    // window), then the full top-k
    val probes = t("probes")(Similarity.ivfProbes(emb, cents, 2).localCheckpoint())
    println(s"[ivf] probe rows=${probes.count()}")
    val corpus = assigned
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val cand = t("candidate join count")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id")).count())
    println(s"[ivf] candidate pairs=$cand")
    val candCos = t("candidates + cosine")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
        .select(Similarity.cosine(col("q_emb"), col("n_emb")).as("cos"))
        .agg(sum(col("cos"))).head())
    println(s"[ivf] cos sum=$candCos")
    // tail in isolation over the checkpointed probes/corpus: join +
    // round(cosine) + window rank — the full op minus index build
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    val tail = t("join+round+window tail")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 3).count())
    println(s"[ivf] tail rows=$tail")
    val noRound = t("tail without round")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosine(col("q_emb"), col("n_emb")).as("cos"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 3).count())
    println(s"[ivf] no-round rows=$noRound")
    val repart = t("tail with explicit repartition(32, query_id)")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
        .repartition(32, col("query_id"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 3).count())
    println(s"[ivf] repart rows=$repart")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val noCoalesce = t("tail with AQE coalesce off")(
      probes.join(corpus, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 3).count())
    println(s"[ivf] no-coalesce rows=$noCoalesce")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val topk = t("full ivfTopK")(Similarity.ivfTopK(emb, emb, 3, nCells, 2).count())
    println(s"[ivf] topk rows=$topk")
    spark.stop()
  }
}
