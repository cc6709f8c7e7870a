package graft.tools

import graft.{Bench}
import graft.fixtures.DocGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** Dev tool: decompose the timed KG pass into cumulative stages at full
  * parallelism to find the bandwidth hog.
  */
object DebugStages {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = Bench.mkSession("32")
    import spark.implicits._
    val train = Pipeline.parse(spark, DocGen.corpus(spark, 500, seed = 7L)).cache()
    train.count()
    val models = spark.sparkContext.broadcast(Pipeline.fit(spark, train, "hybrid"))
    val docs = DocGen.corpus(spark, n, seed = 42L).repartition(128).cache()
    docs.count()

    def time(name: String)(f: => Any): Unit = {
      f
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name: $best%.2f s -> ${n / best}%.0f docs/s")
    }

    time("0 cache scan only") { docs.select(length(col("content"))).agg(sum("length(content)")).head() }
    time("1 + xml parse") { Pipeline.parse(spark, docs).count() }
    time("2 + tokenize") {
      Pipeline.parse(spark, docs).map(s => graft.core.Tokenize.tokenize(s.text).length).agg(sum("value")).head()
    }
    time("3 + tag+decode (no ddi, no encode of nested)") {
      Pipeline.parse(spark, docs).mapPartitions { it =>
        val m = models.value
        it.map { s =>
          val toks = graft.core.Tokenize.tokenize(s.text)
          val tags = m.scorer.tagSentence(toks)
          val tagged = toks.indices.map(i => graft.core.TaggedTok(toks(i).form, toks(i).start, toks(i).end, tags(i)))
          graft.ner.Decode.decode(s.sid, tagged).length
        }
      }.agg(sum("value")).head()
    }
    time("4 full score+encode") {
      Pipeline.score(spark, Pipeline.parse(spark, docs), models)
        .select(size(col("mentions")).as("m")).agg(sum("m")).head()
    }
    spark.stop()
  }
}
