package graft.tools

import graft.core.Triple
import graft.fixtures.DocGen
import graft.io.Resume
import graft.pipeline.Pipeline
import graft.streaming.StreamOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Structured-Streaming KG pipeline on the REAL standalone cluster
  * (driven by tools/stream_cluster.sh): file source → scoreStream →
  * foreachBatch + [[Resume.writeResumable]] manifest sink. The harness
  * SIGKILLs the driver mid-stream and re-submits; the checkpoint plus
  * the manifest contract must deliver exactly-once per repo — the same
  * scenario StreamOpsSpec proves locally, here on real executors
  * (where the round-3 foreachBatch overwrite bug only manifested).
  *
  * Modes:
  *   prep <srcDir> <expectedJson> <nDocs>  — write ONE parquet file per
  *     repo + the batch pipeline's expected triple counts (ground truth)
  *   run <srcDir> <table> <ckpt> <expectedCores>  — stream everything
  *     currently in srcDir into the resumable table, drain, report
  */
object StreamCluster {

  private def mkModels(spark: SparkSession) = {
    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()
    val m = spark.sparkContext.broadcast(Pipeline.fit(spark, train, "hybrid"))
    train.unpersist()
    m
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = SparkSession.builder()
      .appName(s"graft-stream-cluster-$mode")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    mode match {
      case "prep" =>
        val Array(_, srcDir, expectedJson, nDocsS) = args
        val nDocs = nDocsS.toLong
        val corpus = DocGen.corpus(spark, nDocs, seed = 42L).cache()
        val models = mkModels(spark)
        val expected = Pipeline.score(spark, Pipeline.parse(spark, corpus), models)
          .flatMap(_.triples).groupBy(col("repo")).count()
          .as[(String, Long)].collect().sortBy(_._1)
        val repos = expected.map(_._1)
        // one file per repo: each micro-batch is one repo's commit unit
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
        repos.foreach { r =>
          val tmp = java.nio.file.Files.createTempDirectory("prep").toString
          corpus.filter(col("repo") === r).coalesce(1).write.mode("overwrite").parquet(tmp)
          val listing = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          val moved = // close the stream: it holds a directory fd
            try {
              val part = listing.iterator()
              var done = false
              while (part.hasNext && !done) {
                val p = part.next()
                if (p.toString.endsWith(".parquet")) {
                  java.nio.file.Files.move(p,
                    java.nio.file.Paths.get(srcDir, java.net.URLEncoder.encode(r, "UTF-8") + ".parquet"))
                  done = true
                }
              }
              done
            } finally listing.close()
          require(moved, s"no parquet part written for repo $r")
        }
        val total = expected.map(_._2).sum
        // repo ids are arbitrary strings — escape them like Resume does
        def jsonStr(x: String): String = "\"" + x.flatMap {
          case '"'          => "\\\""
          case '\\'         => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c            => c.toString
        } + "\""
        val body = expected.map { case (r, n) => s"${jsonStr(r)}:$n" }.mkString("{", ",", "}")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(expectedJson),
          s"""{"total":$total,"per_repo":$body}""")
        println(s"""{"prep_repos":${repos.length},"expected_triples":$total}""")

      case "run" =>
        val Array(_, srcDir, table, ckpt, coresS) = args
        val expectCores = coresS.toInt
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (spark.sparkContext.defaultParallelism < expectCores &&
               System.nanoTime() < deadline) Thread.sleep(500)
        require(spark.sparkContext.defaultParallelism >= expectCores,
          s"only ${spark.sparkContext.defaultParallelism} cores registered")
        val models = mkModels(spark)
        val schema = DocGen.corpus(spark, 1).schema
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val q = StreamOps.scoreStream(spark, src, models)
          .flatMap(_.triples)
          .writeStream
          .foreachBatch { (b: Dataset[Triple], id: Long) =>
            val commits = Resume.writeResumable(spark, b, table)
            println(s"BATCH $id repos=${commits.map(_.repo).mkString(",")}")
            System.out.flush()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        val back = Resume.read(spark, table)
        val n = back.count()
        val repos = back.map(_.repo).distinct().count()
        println(s"""{"triples_in_table":$n,"repos_in_table":$repos,"committed":${Resume.committedRepos(table).size}}""")
    }
    spark.stop()
  }
}
