package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Quality measurement for the LSH-bucketed ANN path: recall@k against
  * the exact brute-force neighbors on deterministic clustered
  * embeddings (the workload ANN exists for — random noise has no
  * recoverable neighbors and would measure nothing).
  */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 10 deterministic cluster centers in 16d, 30 points each, small
    * noise — same-cluster points are each other's true neighbors.
    */
  private def clustered = {
    import spark.implicits._
    val rnd = new Random(42)
    val centers = Vector.fill(10)(Array.fill(16)(rnd.nextGaussian().toFloat * 2f))
    (0L until 300L).map { i =>
      val c = centers((i % 10).toInt)
      val v = c.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("bucketed ANN recall@3 >= 0.6 vs exact brute force on clustered data") {
    val emb = clustered.cache()
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.bucketedTopK(emb, k, nPlanes = 6)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    info(f"recall@3 = $recall%.3f over ${recalls.size} queries")
    assert(recall >= 0.6, f"LSH ANN recall too low: $recall%.3f")
    emb.unpersist()
  }

  test("multi-probe LSH recall@3 beats single-probe and reaches >= 0.95") {
    val emb = clustered.cache()
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.map { case (q, truth) =>
        approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val single = recallOf(Similarity.bucketedTopK(emb, k, nPlanes = 6))
    val multi = recallOf(Similarity.bucketedTopK(emb, k, nPlanes = 6, multiProbe = true))
    info(f"single-probe recall@3 = $single%.3f, multi-probe = $multi%.3f")
    assert(multi >= single, "multi-probe must not lose recall")
    assert(multi >= 0.95, f"multi-probe recall too low: $multi%.3f")
    emb.unpersist()
  }

  test("IVF ANN recall@3 >= 0.8 vs exact brute force on clustered data") {
    val emb = clustered.cache()
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.ivfTopK(emb, emb, k, nCells = 16, nProbe = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF recall@3 = $recall%.3f over ${recalls.size} queries")
    assert(recall >= 0.8, f"IVF ANN recall too low: $recall%.3f")
    emb.unpersist()
  }

  test("IVF assignment: every vector gets exactly one cell; cells are stable across runs") {
    val emb = clustered.cache()
    val cents = Similarity.ivfCentroids(emb, 8)
    assert(cents.length == 8 && cents.map(_._1) == (0 until 8))
    val a1 = Similarity.ivfAssign(emb, cents).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Similarity.ivfAssign(emb, cents).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1.size == 300)
    assert(a1 == a2, "assignment must be deterministic")
    assert(a1.values.toSet.subsetOf((0 until 8).toSet))
    emb.unpersist()
  }

  test("same-bucket property: near-identical vectors collide") {
    import spark.implicits._
    val pairs = Seq(
      (0L, Seq.fill(8)(1.0f)),
      (1L, Seq.fill(8)(1.001f)), // epsilon apart
      (2L, Seq.fill(8)(-1.0f)) // opposite orthant
    ).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(pairs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L))
  }
}
