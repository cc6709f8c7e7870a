package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, element_at}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Quality measurement for the ANN paths (hyperplane LSH, multi-probe
  * LSH, IVF): recall@k against the exact brute-force neighbors on
  * deterministic clustered embeddings (the workload ANN exists for —
  * random noise has no recoverable neighbors and would measure
  * nothing). One shared ground truth + recall definition so every gate
  * measures the same thing.
  */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val K = 3

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

  /** (query_id -> neighbor set) from a top-k result frame. */
  private def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  /** Mean recall of `approx` against `exact` over exact's query set. */
  private def meanRecall(exact: Map[Long, Set[Long]], approx: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    rs.sum / rs.size
  }

  test("ANN recall@3 vs exact brute force: LSH >= 0.6, multi-probe >= 0.95, IVF >= 0.8") {
    val emb = clustered.cache()
    val exact = neighborSets(Similarity.bruteForceTopK(emb, emb, K))

    val lsh = meanRecall(exact, neighborSets(Similarity.bucketedTopK(emb, K, nPlanes = 6)))
    val multi = meanRecall(exact,
      neighborSets(Similarity.bucketedTopK(emb, K, nPlanes = 6, multiProbe = true)))
    val ivf = meanRecall(exact,
      neighborSets(Similarity.ivfTopK(emb, emb, K, nCells = 16, nProbe = 2)))

    info(f"recall@3 over ${exact.size} queries: LSH $lsh%.3f, multi-probe $multi%.3f, IVF $ivf%.3f")
    assert(lsh >= 0.6, f"LSH ANN recall too low: $lsh%.3f")
    assert(multi >= lsh, "multi-probe must not lose recall vs single-probe")
    assert(multi >= 0.95, f"multi-probe recall too low: $multi%.3f")
    assert(ivf >= 0.8, f"IVF ANN recall too low: $ivf%.3f")
    emb.unpersist()
  }

  test("clusterBoost turns isotropic vectors into a clustered corpus with meaningful ANN recall") {
    import spark.implicits._
    // isotropic noise at the driver testdata shape (64d, sigma ~0.125 —
    // the regime where kg_ann_recall honestly measures ~0.02) ->
    // boosted toward 8 md5-derived centroids
    val rnd = new Random(9)
    val iso = (0L until 240L).map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat * 0.125f)))
      .toDF("vec_id", "embedding")
    val boosted = Similarity.clusterBoost(iso, nClusters = 8, strength = 3.0).cache()
    val exact = neighborSets(Similarity.bruteForceTopK(boosted, boosted, K))
    val multi = meanRecall(exact,
      neighborSets(Similarity.bucketedTopK(boosted, K, nPlanes = 6, multiProbe = true)))
    info(f"clusterBoost multi-probe recall@3: $multi%.3f")
    assert(multi >= 0.9, f"clustered recall too low: $multi%.3f — the driver entry would be hollow")
    // deterministic: same input -> bit-identical boosted vectors
    val a = boosted.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val b = Similarity.clusterBoost(iso, nClusters = 8, strength = 3.0)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
    boosted.unpersist()
  }

  test("annNearDupClusters recovers the planted clusters: pure, near-total coverage") {
    import spark.implicits._
    val rnd = new Random(13)
    val iso = (0L until 240L).map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat * 0.125f)))
      .toDF("vec_id", "embedding")
    val boosted = Similarity.clusterBoost(iso, nClusters = 8, strength = 3.0).cache()
    val got = Similarity.annNearDupClusters(spark, boosted, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 240)
    // purity: no cluster may mix ground-truth groups (vec_id mod 8) —
    // cross-group cosine is far below the 0.9 threshold by construction
    got.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(_ % 8).toSet.size == 1,
        s"merged ground-truth groups: ${members.keys.toSeq.sorted}")
    }
    // coverage: ANN recall is approximate by contract, but near-total
    // here — at most a handful of vectors may fall out as singletons
    val mainClusters = got.groupBy(_._2).values.count(_.size >= 10)
    assert(mainClusters == 8, s"expected the 8 planted clusters, got $mainClusters")
    val inMain = got.groupBy(_._2).values.filter(_.size >= 10).map(_.size).sum
    assert(inMain >= 240 * 9 / 10, s"only $inMain/240 vectors in the main clusters")
    boosted.unpersist()
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

  test("IVF twin on the clusterBoost fixture: recall >= 0.9 and exact planted-cluster recovery") {
    import spark.implicits._
    // the scale path for clustered corpora (round 6): hyperplane LSH
    // degenerates there (buckets == clusters, Θ(Σ cluster²) — measured
    // 192 s at sf1), IVF subdivides clusters with sampled centroids
    val rnd = new Random(17)
    val iso = (0L until 240L).map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat * 0.125f)))
      .toDF("vec_id", "embedding")
    val boosted = Similarity.clusterBoost(iso, nClusters = 8, strength = 3.0).cache()
    val exact = neighborSets(Similarity.bruteForceTopK(boosted, boosted, K))
    val ivf = meanRecall(exact,
      neighborSets(Similarity.ivfTopK(boosted, boosted, K, nCells = 16, nProbe = 2)))
    info(f"IVF (nCells=16, nProbe=2) recall@3 on clustered data: $ivf%.3f")
    assert(ivf >= 0.9, f"clustered IVF recall too low: $ivf%.3f — the kg_ann_ivf_* entries would be hollow")
    val got = Similarity.ivfNearDupClusters(spark, boosted, threshold = 0.9, nCells = 16, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 240)
    got.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(_ % 8).toSet.size == 1,
        s"merged ground-truth groups: ${members.keys.toSeq.sorted}")
    }
    assert(got.groupBy(_._2).values.count(_.size >= 10) == 8,
      "expected the 8 planted clusters")
    boosted.unpersist()
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

  test("IVF: a zero-norm vector sampled as a centroid does not collapse the index") {
    import spark.implicits._
    // small corpus where SOME vec_id hashes into the centroid sample;
    // force the pathology by making vec_id 0..nCells-1 include a zero
    // vector (cosine vs everything = null)
    val emb = ((0L until 40L).map { i =>
      val v =
        if (i == 1L) Seq.fill(8)(0.0f) // zero-norm corpus vector
        else Seq.tabulate(8)(d => math.cos(i * 0.7 + d).toFloat)
      (i, v)
    }).toDF("vec_id", "embedding").cache()
    // nCells = corpus size ⇒ every vector (incl. the zero one) IS a
    // centroid — the pathology is guaranteed present, not hash-dependent
    val cents = Similarity.ivfCentroids(emb, 40)
    assert(cents.exists(_._2.forall(_ == 0f)), "zero vector must be a centroid")
    val assign = Similarity.ivfAssign(emb, cents).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val zeroCell = cents.find(_._2.forall(_ == 0f)).get._1
    // without the coalesce guard, EVERY vector lands in the zero cell
    val inZero = assign.values.count(_ == zeroCell)
    assert(inZero <= 1, s"zero-norm centroid captured $inZero/40 vectors — index collapsed")
    // and top-k over the guarded index still returns k real neighbors
    val topk = Similarity.ivfTopK(emb, emb.filter($"vec_id" === 0L), 3, nCells = 8, nProbe = 2)
    assert(topk.count() == 3)
    emb.unpersist()
  }

  test("large-nCells assignment: broadcast-matrix path is bit-identical to the literal plan") {
    import org.apache.spark.sql.Row
    def cellsOf(df: DataFrame, cents: Seq[(Int, Seq[Float])], nProbe: Int, force: Boolean) =
      Similarity.withNearestCells(df, cents, nProbe, "cells", Some(force))
        .select("vec_id", "cells").collect()
        .map(r => r.getLong(0) -> r.getSeq[Row](1).map(x =>
          // raw bits, not ==: a -0.0 vs 0.0 divergence must FAIL here
          (java.lang.Double.doubleToRawLongBits(x.getDouble(0)), x.getInt(1))).toList)
        .toMap

    // float corpus, incl. a zero-norm vector (+inf guard on both paths)
    // and a NaN-poisoned vector — every centroid scores NaN, which
    // Spark sorts ABOVE MaxValue; the broadcast scan must fill REAL
    // cells in id order for it, not phantom Int.MaxValue sentinels
    import spark.implicits._
    val f = (clustered.as[(Long, Seq[Float])].collect().toSeq :+
      ((999L, Seq.fill(16)(0.0f))) :+
      ((998L, Seq.tabulate(16)(j => if (j == 3) Float.NaN else 0.5f))))
      .toDF("vec_id", "embedding").cache()
    val cf = Similarity.ivfCentroids(f, 24)
    assert(cellsOf(f, cf, 3, force = false) == cellsOf(f, cf, 3, force = true))

    // double corpus (the clusterBoost element type)
    val d = Similarity.clusterBoost(
      (0L until 150L).map(i =>
        (i, Seq.tabulate(32)(j => math.sin(i * 1.3 + j).toFloat))).toDF("vec_id", "embedding"))
      .cache()
    val cd = Similarity.ivfCentroids(d, 20)
    assert(cellsOf(d, cd, 2, force = false) == cellsOf(d, cd, 2, force = true))

    // end-to-end: ivfAssign through each forced path agrees
    def assignVia(force: Boolean) =
      Similarity.withNearestCells(f, cf, 1, "cells", Some(force))
        .select(col("vec_id"), element_at(col("cells"), 1).getField("cell").as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val aLit = assignVia(false)
    assert(aLit == assignVia(true))
    // the NaN row lands in a REAL cell on both paths
    assert(cf.map(_._1).contains(aLit(998L)), s"NaN row assigned phantom cell ${aLit(998L)}")
    f.unpersist(); d.unpersist()
  }

  test("incremental ANN dedup: delta flags vs history cells — sound, high recall, cell-bounded, replayable") {
    import spark.implicits._
    val emb = clustered.cache()
    // split on % 7, NOT % 5: the fixture's clusters are vec_id % 10, so
    // a % 5 delta would swallow clusters 0 and 5 WHOLE and leave them no
    // history twins (the catalog's % 5 split is fine — testdata
    // embeddings are isotropic, not keyed to vec_id)
    val delta = emb.filter($"vec_id" % 7 === 0)
    val hist = emb.filter($"vec_id" % 7 =!= 0)
    val nCells = 16
    val cents = Similarity.ivfCentroids(hist, nCells)
    val thr = 0.9
    val out = Similarity.incrementalAnnDedup(delta, hist, cents, thr, nProbe = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))).toMap

    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / math.sqrt(na * nb)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deltaIds = vecs.keys.filter(_ % 7 == 0).toSeq
    val histIds = vecs.keys.filter(_ % 7 != 0).toSeq

    // one row per delta vector
    assert(out.keySet == deltaIds.toSet)
    // soundness: a flagged vector really has a history near-dup
    out.foreach { case (id, (_, best, flag)) =>
      if (flag == 1) {
        val trueBest = histIds.map(h => r4(cos(vecs(id), vecs(h)))).max
        assert(trueBest >= thr, s"delta $id flagged but true best cos is $trueBest")
        assert(best.exists(_ <= trueBest + 1e-12), s"delta $id best_cos ${best} > true $trueBest")
      }
    }
    // recall on the tight-cluster fixture: every delta member's cluster
    // siblings live in history, so nearly all true near-dups are caught
    val trulyDup = deltaIds.filter(id => histIds.exists(h => r4(cos(vecs(id), vecs(h))) >= thr))
    val caught = trulyDup.count(id => out(id)._3 == 1)
    assert(caught.toDouble / trulyDup.size >= 0.9,
      s"incremental ANN recall ${caught.toDouble / trulyDup.size} over ${trulyDup.size} true dups")

    // cell-bounded candidate volume (never a delta×history all-pairs)
    val cellSizes = Similarity.ivfAssign(hist, cents).groupBy("cell").count()
      .collect().map(_.getLong(1))
    assert(out.values.map(_._1).max <= 2 * cellSizes.max,
      "candidates exceed nProbe × max cell size")

    // dump-twin replay (the oracle's join, in Scala): candidates from
    // incrementalAnnCells joined on cell reproduce the op's counts and
    // best_cos exactly
    val cells = Similarity.incrementalAnnCells(delta, hist, cents).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val hByCell = cells.filter(_._1 == "hist").groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    val replay = cells.filter(_._1 == "delta").groupBy(_._2).map { case (id, probes) =>
      val cand = probes.flatMap(p => hByCell.getOrElse(p._3, Array.empty[Long]))
      val scored = cand.map(h => r4(cos(vecs(id), vecs(h))))
      id -> ((cand.length.toLong, scored.sorted.lastOption, if (scored.exists(_ >= thr)) 1 else 0))
    }
    assert(replay == out, "dump-twin replay diverges from the operator")
    emb.unpersist()
  }

  test("clusterBoost typed pass is bit-identical to the Column-expression form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the round-8 typed rewrite vs the original transform-HOF tree,
    // compared on RAW double bits (any arithmetic-order drift must fail)
    val d = clustered
    def columnForm(embeddings: DataFrame, nClusters: Int, strength: Double) =
      embeddings.select(
        col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val k = pmod(
            conv(
              substring(
                md5(to_binary(
                  concat(
                    lit("c"), pmod(col("vec_id"), lit(nClusters)).cast("string"),
                    lit("#"), i.cast("string")),
                  lit("utf-8"))),
                1, 8),
              16, 10).cast("long"),
            lit(1000L))
          x.cast("double") + lit(strength) * (k.cast("double") / lit(1000.0) - lit(0.5))
        }).as("embedding"))
    def bits(df: DataFrame) = df.as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.map(java.lang.Double.doubleToRawLongBits).toList }
      .toMap
    assert(bits(Similarity.clusterBoost(d)) == bits(columnForm(d, 8, 3.0)))
    assert(bits(Similarity.clusterBoost(d, nClusters = 5, strength = 1.5)) ==
      bits(columnForm(d, 5, 1.5)))
    // double-element input (e.g. re-boosting a boosted frame): the
    // Column form's x.cast("double") is a no-op there — the typed pass
    // must pass doubles through untouched, not narrow via float
    val dd = Similarity.clusterBoost(d).cache()
    assert(bits(Similarity.clusterBoost(dd, nClusters = 3, strength = 0.25)) ==
      bits(columnForm(dd, 3, 0.25)))
    dd.unpersist()
  }

  test("lshBuckets typed pass is bit-identical to the Column-expression form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // original HOF tree, reconstructed: per plane, aggregate(transform)
    // dot product against the hash-derived component, sign bit summed
    def columnForm(embeddings: DataFrame, nPlanes: Int) = {
      val bucketBits = (0 until nPlanes).map { p =>
        val dotp = aggregate(
          transform(col("embedding"), (x, i) =>
            x.cast("double") *
              ((pmod(hash(lit(p), i), lit(1000)).cast("double") / 1000.0) - 0.5)),
          lit(0.0),
          (acc, v) => acc + v)
        when(dotp >= 0, lit(1L << p)).otherwise(0L)
      }
      embeddings.withColumn("bucket", bucketBits.reduce(_ + _))
    }
    def buckets(df: DataFrame) = df.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // float corpus and the double (clusterBoost) corpus, both plane counts
    val f = clustered
    assert(buckets(Similarity.lshBuckets(f, 8)) == buckets(columnForm(f, 8)))
    val dd = Similarity.clusterBoost(f)
    assert(buckets(Similarity.lshBuckets(dd, 6)) == buckets(columnForm(dd, 6)))
    // extra columns survive and a NaN-poisoned vector matches the
    // Column form's NaN-sorts-high `>= 0` semantics
    val weird = (clustered.as[(Long, Seq[Float])].collect().toSeq :+
      ((998L, Seq.tabulate(16)(j => if (j == 2) Float.NaN else 0.3f))))
      .toDF("vec_id", "embedding").withColumn("tag", lit("x"))
    val t = Similarity.lshBuckets(weird, 4)
    assert(t.columns.toSeq == Seq("vec_id", "embedding", "tag", "bucket"))
    assert(buckets(t) == buckets(columnForm(weird, 4)))
  }
}
