package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k via broadcast of the (small)
  *     query set against the full corpus — one narrow pass over the big
  *     side, no shuffle except the final per-query top-k (window on the
  *     query key). The cosine is pure higher-order-function arithmetic
  *     (zip_with + aggregate) — whole-stage codegen, no UDF.
  *   - `lshBuckets` + `bucketedTopK`: random-hyperplane LSH — sign-bit
  *     sketch of each vector against `nPlanes` deterministic
  *     pseudo-random hyperplanes; neighbors are searched only inside the
  *     same bucket (self-join on the bucket key). This is the 100 TB
  *     path: bucket sizes bound the join fan-out.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Native codegen'd expression: one fused loop for dot/|a|²/|b|², no
    * intermediate array (graft.functions.CosineSim).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Composable-primitives twin of [[cosine]] (zip_with + aggregate —
    * three passes, one intermediate array per pair). Kept as the
    * independent oracle for CosineSimSpec's exact-equality check.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v
      )
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (vec_id, embedding)
    * @param queries (vec_id, embedding) — small; broadcast
    * @param k       neighbors per query
    * Deterministic: ranked by (rounded cosine desc, vec_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    )
    val scored = corpus
      .join(q, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos")
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministically CLUSTERED variant of an embeddings table: adds a
    * strong md5-derived cluster centroid (cluster = vec_id mod
    * `nClusters`) to every vector, in double precision.
    *
    * Purpose: a recall measurement on near-isotropic synthetic
    * embeddings is honest but uninformative (hyperplane agreement is
    * close to random — kg_ann_recall measures ~0.02 on the driver
    * testdata); boosting each vector toward one of `nClusters` shared
    * centroids creates real neighbor structure, so the ANN recall
    * number MEANS something, while staying a pure function of the
    * input table that DuckDB can replay bit-exactly: the centroid
    * component for (cluster c, dim j) is
    * `md5("c" + c + "#" + j)[0:8] as int % 1000 / 1000.0 - 0.5` — the
    * same cross-engine md5-hex-window trick as the minhash band hash —
    * and the arithmetic tree `x + strength * (k/1000.0 - 0.5)` is kept
    * identical on both sides so the doubles agree exactly.
    *
    * Cost note: the centroid component is recomputed per ROW per dim
    * (dim md5 digests/row) even though only nClusters × dim distinct
    * values exist — fine for this op's benchmark-fixture role (µs/row
    * vs the downstream Θ(n·q) cosine work), but a production variant
    * at corpus scale would precompute the tiny centroid table
    * driver-side and broadcast it (the dim count isn't statically
    * known here, which is why this one stays pure-lazy).
    */
  /** Round-8 shape: the per-element offset depends only on
    * (vec_id % nClusters, dim) — nClusters × dim distinct md5 values
    * for the whole corpus — so the former `transform` HOF (interpreted,
    * one md5+conv string chain per ELEMENT per row: 64 per vector,
    * ~2–3.5 s of the sf1 kg_ann_* front) is now a typed pass with a
    * per-partition memo. Value contract unchanged and bit-exact:
    * k(c,i) = conv(first 8 hex chars of md5("c" + c + "#" + i), 16,
    * 10) % 1000 (parsed from digest bytes — same integer), and the
    * output double is x.toDouble + strength * (k/1000.0 − 0.5), the
    * identical operation order the Column tree evaluated. The DuckDB
    * oracle replays the same formula independently in SQL.
    */
  def clusterBoost(embeddings: DataFrame, nClusters: Int = 8, strength: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.types._
    // element type handled generically (float widens exactly, double
    // passes through — the Column form's x.cast("double") contract) and
    // null ELEMENTS stay null like the HOF did, so the rewrite is
    // bit-equivalent on every input the old expression accepted
    val in = embeddings.select(col("vec_id").cast("long"), col("embedding"))
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = true))))
    in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val memo = scala.collection.mutable.LongMap.empty[Double]
      def off(c: Int, i: Int): Double = {
        val key = (c.toLong << 32) | i.toLong
        memo.getOrElse(key, {
          md.reset()
          val d = md.digest(("c" + c + "#" + i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var x = 0
          while (x < 4) { v = (v << 8) | (d(x) & 0xffL); x += 1 }
          val o = strength * ((v % 1000L).toDouble / 1000.0 - 0.5)
          memo.update(key, o)
          o
        })
      }
      rows.map { row =>
        val id = row.getLong(0)
        if (row.isNullAt(1)) org.apache.spark.sql.Row(id, null)
        else {
          val emb = row.getSeq[Any](1)
          val c = java.lang.Math.floorMod(id, nClusters.toLong).toInt
          val out = new Array[Any](emb.length)
          var i = 0
          while (i < emb.length) {
            emb(i) match {
              case null                => out(i) = null
              case f: java.lang.Float  => out(i) = f.toDouble + off(c, i)
              case d: java.lang.Double => out(i) = d.doubleValue + off(c, i)
              case x: java.lang.Number => out(i) = x.doubleValue + off(c, i)
            }
            i += 1
          }
          org.apache.spark.sql.Row(id, out.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-0.5, 0.5). No RNG state — reproducible
    * across engines and runs. The typed twin below computes the SAME
    * value through Spark's own Murmur3 utility (the `hash()` function's
    * evaluation for two int children is hashInt(plane, 42) chained into
    * hashInt(dim, ·) — we call the identical library code, no
    * reimplementation).
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane), dim), lit(1000)).cast("double") / 1000.0) - 0.5

  private def planeComponentF(plane: Int, dim: Int): Double = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(
      dim, org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(plane, 42))
    java.lang.Math.floorMod(h, 1000).toDouble / 1000.0 - 0.5
  }

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes. Vectors in the
    * same bucket are likely neighbors; bucket count = 2^nPlanes.
    *
    * Round-8 shape: one typed pass per row — the former
    * `aggregate(transform(...))` HOF pair evaluated interpreted, one
    * murmur3 + multiply + add per (element × plane) with per-element
    * allocation. The plane components are memoized per partition (only
    * nPlanes × dim distinct values) via [[planeComponentF]] — Spark's
    * own Murmur3 library code, so values are identical — and the dot
    * product accumulates left-to-right exactly like the HOF fold, so
    * buckets are bit-identical (spec: LshBucketsSpec replays the Column
    * form). Null embedding / null element → every dotp null → every
    * bit's `when` falls to otherwise(0) → bucket 0, replicated
    * explicitly.
    */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.types._
    // withColumn REPLACED an existing `bucket` column; drop it first so
    // the appended field keeps that contract instead of duplicating
    val base =
      if (embeddings.columns.contains("bucket")) embeddings.drop("bucket") else embeddings
    val schema = base.schema
    val embIdx = schema.fieldIndex("embedding")
    val outSchema = schema.add("bucket", LongType, nullable = false)
    base.mapPartitions { it =>
      // planes(p)(i), grown on demand to the widest embedding seen
      var planeDim = 0
      var planes: Array[Array[Double]] = Array.fill(nPlanes)(new Array[Double](0))
      it.map { row =>
        var bucket = 0L
        if (!row.isNullAt(embIdx)) {
          val s = row.getSeq[Any](embIdx)
          val n = s.length
          val a = new Array[Double](n)
          var ok = true
          var i = 0
          while (i < n) {
            s(i) match {
              case f: java.lang.Float  => a(i) = f.toDouble
              case d: java.lang.Double => a(i) = d
              case x: java.lang.Number => a(i) = x.doubleValue
              case null                => ok = false
            }
            i += 1
          }
          if (ok) {
            if (n > planeDim) {
              planes = Array.tabulate(nPlanes) { p =>
                Array.tabulate(n)(i => planeComponentF(p, i))
              }
              planeDim = n
            }
            var p = 0
            while (p < nPlanes) {
              val pl = planes(p)
              var dotp = 0.0
              i = 0
              while (i < n) { dotp += a(i) * pl(i); i += 1 }
              // Spark double comparison sorts NaN ABOVE every value, so
              // the Column form's `dotp >= 0` is TRUE for NaN — match it
              // (plain Java `>=` would be false)
              if (dotp >= 0 || java.lang.Double.isNaN(dotp)) bucket |= (1L << p)
              p += 1
            }
          }
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ bucket)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path, complementary to
  // the hyperplane LSH below: cells adapt to the data distribution
  // (centroids are corpus points), so clustered corpora get higher
  // recall at the same candidate budget.
  // ------------------------------------------------------------------

  /** Deterministic coarse centroids: the `nCells` corpus vectors with
    * the smallest murmur3(vec_id) — a reproducible pseudo-random sample
    * (no RNG state; stable across runs — Spark-specific murmur3, so NOT
    * reproducible by other engines, which is fine: kg_ann_ivf has no
    * DuckDB twin and its gate is AnnRecallSpec). `orderBy.limit`
    * executes as TakeOrdered (per-partition top-k + driver merge), not a
    * global sort, so this stays O(n log k) with no shuffle at corpus
    * scale; the result is driver-side and tiny (nCells ≤ ~4k).
    */
  /** Scale-aware cell count, balanced rule: total work for an
    * all-queries self-search is assignment n·nCells plus candidates
    * n·nProbe·(n/nCells); both terms meet at nCells ≈ √(nProbe·n), the
    * classic IVF-flat optimum (FAISS's √n-cells guidance), making the
    * whole search Θ(n^1.5) where a FIXED cell count re-grows toward the
    * quadratic join as n scales. Floor 16 so tiny verify corpora keep a
    * meaningful multi-cell index; recall holds on the planted-cluster
    * fixture down to cells of ~15 (measured 0.92 @ k=3, nProbe=2).
    */
  def ivfAutoCells(n: Long, nProbe: Int = 2): Int =
    math.max(16L, math.ceil(math.sqrt(nProbe.toDouble * n)).toLong).toInt

  def ivfCentroids(embeddings: DataFrame, nCells: Int): Seq[(Int, Seq[Float])] =
    embeddings
      // float32 centroids regardless of input width (clusterBoost emits
      // array<double>): centroids are arbitrary sample points, the
      // query/corpus cosine against them runs in double either way
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .orderBy(hash(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .collect()
      .toSeq
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }

  /** The `nProbe` nearest cells for a vector column, as an array of
    * struct(neg_cos, cell) sorted by descending cosine (ties → lower
    * cell id). One fused pass per row: each centroid is its own typed
    * array LITERAL scored by the native CosineSim, and the whole
    * `array(struct, …)` tree stays inside whole-stage codegen.
    *
    * Deliberately NOT a `transform` HOF over a centroid-table literal:
    * `ArrayTransform` lambdas are interpreted (no codegen), and the
    * per-element `cast` inside the lambda re-allocated BOTH the 64-dim
    * embedding and the centroid per (row × centroid) evaluation —
    * measured 5× slower on the sf1 20k×200 assignment (the whole
    * kg_ann_ivf_all went 41.6 s → 8.0 s from this rewrite alone).
    *
    * Type matching instead of casting: centroid literals are emitted in
    * the embedding column's own element type (float32 centroids widen
    * to double EXACTLY, so scores are bit-identical either way); the
    * embedding column itself is only cast when its element type is
    * neither float nor double, and `SimplifyCasts` removes the no-op.
    */
  private def nearestCells(
      emb: Column,
      elemType: org.apache.spark.sql.types.DataType,
      centroids: Seq[(Int, Seq[Float])],
      nProbe: Int): Column = {
    // empty corpus → empty centroid sample: `array()` of zero children
    // is array<null> and fails analysis at the struct accessors, so emit
    // a TYPED empty literal (rows are zero anyway on an empty input)
    if (centroids.isEmpty)
      return array().cast("array<struct<neg_cos:double,cell:int>>")
    val isFloat = elemType == org.apache.spark.sql.types.FloatType
    val e = if (isFloat) emb else emb.cast("array<double>")
    val scored = array(centroids.map { case (id, vec) =>
      val c = if (isFloat) typedLit(vec) else typedLit(vec.map(_.toDouble))
      struct(
        // CosineSim is null for zero-norm vectors, and struct ordering
        // sorts a null field FIRST ascending — unguarded, a zero-norm
        // vector (either side) would become the "nearest" cell for every
        // row and collapse the index into one quadratic cell. Map null
        // to +inf so zero-norm pairs rank LAST instead.
        coalesce(-cosine(e, c), lit(Double.MaxValue)).as("neg_cos"),
        lit(id).as("cell"))
    }: _*)
    // array_sort is CodegenFallback (comparator lambda), but the scored
    // array it consumes is a fully codegen'd child and the sort itself
    // is one nCells·log(nCells) pass per row — an iterative
    // array_min/array_remove argmin was tried and measured SLOWER for
    // nProbe=2 (subexpression elimination does not collapse the
    // repeated `scored` subtree across the min/remove steps, so the
    // nCells cosines were evaluated twice).
    slice(array_sort(scored), 1, nProbe)
  }

  private def embElemType(df: DataFrame): org.apache.spark.sql.types.DataType =
    df.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  /** Branch-free contract shared by both assignment paths: `df` plus
    * `outCol` = the nProbe nearest cells as array<struct<neg_cos,cell>>
    * (descending cosine, ties → lower cell id, zero-norm/null → ranked
    * last via +inf, exactly [[nearestCells]]'s semantics).
    * `forceBroadcast` pins a path for the equivalence spec; callers
    * leave it None and get [[nearestCellsBroadcast]].
    *
    * Round-8 default flip: the broadcast-matrix `mapPartitions` path is
    * now ALWAYS selected (it had been reserved for nCells > 512). The
    * "literal plan is faster at small nCells" belief came from a
    * count()-action A/B in DebugIvf that Catalyst had quietly turned
    * into a skeleton — count() pruned the literal path's `cells`
    * projection entirely while the opaque typed path still evaluated —
    * the same dishonest-action bug the round-7 bench fix closed. The
    * honest noop-write A/B (DebugIvf bigcells, sf1 20k×64f rows,
    * local[32], warm) reads broadcast 0.15/0.12/0.15/0.19/0.29/0.48 s
    * vs literal 0.41/0.65/1.27/3.41/6.36/15.46 s at nCells =
    * 16/32/64/128/256/512 — the literal plan loses at EVERY cell count
    * (its giant generated method blows the JIT's size limits and runs
    * interpreted long before the O(nCells) plan-size ceiling matters).
    * [[nearestCells]] stays as the Catalyst-native REFERENCE arm the
    * RAW-BIT equivalence spec pins the broadcast path against
    * (AnnRecallSpec: float + double element types, zero-norm, NaN).
    */
  private[graft] def withNearestCells(
      df: DataFrame,
      centroids: Seq[(Int, Seq[Float])],
      nProbe: Int,
      outCol: String,
      forceBroadcast: Option[Boolean] = None): DataFrame = {
    val broadcastPath = forceBroadcast.getOrElse(true)
    if (centroids.isEmpty || !broadcastPath)
      df.withColumn(outCol, nearestCells(col("embedding"), embElemType(df), centroids, nProbe))
    else nearestCellsBroadcast(df, centroids, nProbe, outCol)
  }

  /** The large-nCells assignment path: centroids travel as ONE
    * broadcast double matrix and each row is scored in a single
    * primitive-array pass inside `mapPartitions` — no per-centroid
    * expression nodes, so the plan stays O(1) as the √(nProbe·n) rule
    * grows cells into the tens of thousands.
    *
    * Bit-exactness contract with [[nearestCells]] (spec-gated):
    *   - same fused dot/|a|²/|b|² double accumulation in index order
    *     as the native CosineSim (floats widen per element; the
    *     centroid matrix is pre-widened once — same doubles);
    *   - null array / length mismatch / null element / zero norm →
    *     +inf neg_cos, exactly the coalesce(-cos, MaxValue) guard;
    *   - ordering by (neg_cos, cell) with SPARK's double semantics
    *     (-0.0 == 0.0, primitive compare) — NOT java.lang.Double
    *     .compare, whose -0.0 < 0.0 would flip a probe order on an
    *     exact-zero cosine tie.
    */
  private def nearestCellsBroadcast(
      df: DataFrame,
      centroids: Seq[(Int, Seq[Float])],
      nProbe: Int,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val sorted = centroids.sortBy(_._1)
    val cellIds = sorted.map(_._1).toArray
    val matrix = sorted.map(_._2.map(_.toDouble).toArray).toArray
    val bc = spark.sparkContext.broadcast((cellIds, matrix))
    val schema = df.schema
    val embIdx = schema.fieldIndex("embedding")
    val outSchema = schema.add(
      outCol,
      ArrayType(
        StructType(Seq(
          StructField("neg_cos", DoubleType, nullable = false),
          StructField("cell", IntegerType, nullable = false))),
        containsNull = false))
    val take = math.min(nProbe, centroids.size)
    // centroid norms |q|² precomputed ONCE driver-side — the same q*q
    // index-order accumulation the fused loop would produce per row, so
    // the doubles are identical; per-(row,centroid) work drops to the
    // dot product alone (3× fewer FMAs than the fused literal loop)
    val cNorms = matrix.map { cv =>
      var nb = 0.0; var i = 0
      while (i < cv.length) { nb += cv(i) * cv(i); i += 1 }
      nb
    }
    df.mapPartitions { it =>
      val (ids, cents) = bc.value
      val n = ids.length
      val bestNeg = new Array[Double](take)
      val bestCell = new Array[Int](take)
      it.map { row =>
        val emb: Array[Double] =
          if (row.isNullAt(embIdx)) null
          else {
            val s = row.getSeq[Any](embIdx)
            val a = new Array[Double](s.length)
            var ok = true
            var i = 0
            while (i < s.length) {
              s(i) match {
                case f: java.lang.Float  => a(i) = f.toDouble
                case d: java.lang.Double => a(i) = d
                case x: java.lang.Number => a(i) = x.doubleValue
                case null                => ok = false
              }
              i += 1
            }
            if (ok) a else null
          }
        // |p|² hoisted out of the centroid loop (identical accumulation)
        var na = 0.0
        if (emb != null) {
          var i = 0
          while (i < emb.length) { na += emb(i) * emb(i); i += 1 }
        }
        // top-`take` insertion scan instead of a full boxed sort: cells
        // are visited in ASCENDING id order with a displacement test
        // matching Spark's struct order exactly — strict `<` for
        // ordinary doubles (so equal neg_cos, incl. -0.0 vs 0.0, never
        // displaces an earlier id), NaN ABOVE every double incl.
        // MaxValue (Spark sorts NaN last ascending — a NaN-carrying
        // embedding must still fill real cells in id order, not phantom
        // sentinels), and an explicit empty-slot model (bestCell ==
        // Int.MaxValue, never a real id) so degenerate rows — null /
        // zero-norm (all +inf) or NaN-poisoned (all NaN) — fill their
        // probe list in cell-id order like the literal path's sort.
        var k = 0
        while (k < take) { bestNeg(k) = Double.MaxValue; bestCell(k) = Int.MaxValue; k += 1 }
        // Spark double order: finite/±inf by `<`, NaN greater than all
        @inline def ltSpark(a: Double, b: Double): Boolean =
          if (java.lang.Double.isNaN(a)) false
          else java.lang.Double.isNaN(b) || a < b
        var c = 0
        while (c < n) {
          val cv = cents(c)
          val neg =
            if (emb == null || emb.length != cv.length) Double.MaxValue
            else {
              var dot = 0.0; var i = 0
              while (i < emb.length) { dot += emb(i) * cv(i); i += 1 }
              val nb = cNorms(c)
              if (na == 0.0 || nb == 0.0) Double.MaxValue
              else -(dot / math.sqrt(na * nb))
            }
          if (bestCell(take - 1) == Int.MaxValue || ltSpark(neg, bestNeg(take - 1))) {
            var pos = take - 1
            while (pos > 0 &&
              (bestCell(pos - 1) == Int.MaxValue || ltSpark(neg, bestNeg(pos - 1)))) {
              bestNeg(pos) = bestNeg(pos - 1); bestCell(pos) = bestCell(pos - 1)
              pos -= 1
            }
            bestNeg(pos) = neg; bestCell(pos) = ids(c)
          }
          c += 1
        }
        val cells = (0 until take).map(k => Row(bestNeg(k), bestCell(k)))
        Row.fromSeq(row.toSeq :+ cells)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Corpus side of the IVF index: each vector labeled with its single
    * nearest cell.
    */
  /** Probe side of the IVF search (query_id, q_emb, cell) — shared by
    * the DebugIvf cost decomposition, [[incrementalAnnDedup]] and its
    * dump twin (so the dumped probes are BY CONSTRUCTION the ones the
    * op joined on).
    */
  private[graft] def ivfProbes(
      queries: DataFrame, centroids: Seq[(Int, Seq[Float])], nProbe: Int): DataFrame =
    withNearestCells(
      queries.select(col("vec_id"), col("embedding")), centroids, nProbe, "cells")
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        explode(col("cells")).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell"))

  def ivfAssign(embeddings: DataFrame, centroids: Seq[(Int, Seq[Float])]): DataFrame =
    // empty centroid sample ⇒ empty corpus: emit a typed null cell
    // (zero rows flow anyway). element_at over the empty literal is
    // NOT an option — constant folding evaluates it at plan time and
    // ANSI element_at throws on the out-of-bounds index.
    if (centroids.isEmpty) embeddings.withColumn("cell", lit(null).cast("int"))
    else
      withNearestCells(embeddings, centroids, 1, "__cells")
        .withColumn("cell", element_at(col("__cells"), 1).getField("cell"))
        .drop("__cells")

  /** IVF ANN top-k: queries probe their `nProbe` nearest cells and rank
    * only the candidates assigned there. Join fan-out is bounded by
    * cell sizes (≈ corpus / nCells per cell); at 10^12-row scale the
    * assigned corpus is written bucketed by `cell` so the probe join is
    * co-located.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 2): DataFrame = {
    // localCheckpoint (same rationale as bucketedTopK): cut the input
    // lineage so an EXPRESSION-defined embedding column (clusterBoost's
    // 64-md5-per-row transform) is materialized ONCE per row here —
    // without this, Catalyst inlines the transform through the cell join
    // and re-evaluates it per CANDIDATE PAIR (measured: 152 s for the
    // sf1 kg_ann_ivf_all before the cut, md5 ×50M pairs ×64 dims ×2)
    val emb = embeddings.localCheckpoint()
    val (corpus, probes) =
      if (queries eq embeddings) {
        // self-search fusion: a vector's assigned cell IS the first
        // entry of its own probe list, so ONE nearestCells pass (the
        // nCells-cosine scan, the expensive per-row step) serves both
        // sides; localCheckpoint materializes it once.
        val centroids = ivfCentroids(emb, nCells)
        val scored = withNearestCells(
          emb.select(col("vec_id"), col("embedding")), centroids, nProbe, "cells")
          .localCheckpoint()
        (scored.select(
          element_at(col("cells"), 1).getField("cell").as("cell"),
          col("vec_id").as("neighbor_id"), col("embedding").as("n_emb")),
          scored.select(
            col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            explode(col("cells")).as("probe"))
            .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell")))
      } else {
        val q = queries.localCheckpoint()
        val centroids = ivfCentroids(emb, nCells)
        (ivfAssign(emb, centroids)
          .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("n_emb")),
          ivfProbes(q, centroids, nProbe))
      }
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probes.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        // rank on the ROUNDED cosine deliberately: every exact side this
        // is compared against (bruteForceTopK, the DuckDB recall
        // replays) ranks rounded — 4-decimal rounding is the contract
        // that absorbs cross-engine float sum-order differences at tie
        // boundaries. Rounding after rank was tried (round() is
        // BigDecimal per row, ~4 s over 8.2M sf1 candidates) and
        // measurably DESYNCED the rankings: multi-probe recall fell
        // 1.000 → 0.928 purely from tie-order disagreement.
        round(cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
      // explicit pre-window repartition on query_id: the window would
      // exchange anyway, but letting IT plan the exchange off the
      // cell-join output cost +75% on the whole tail (measured 15.1 s →
      // 8.6 s at sf1's 8.2M candidates); pinning the partition count
      // also keeps the sort width at the session's shuffle parallelism
      .repartition(
        embeddings.sparkSession.sessionState.conf.numShufflePartitions,
        col("query_id"))
      // no dedup needed: each corpus vector lives in exactly one cell,
      // so a (query, neighbor) pair appears at most once across probes
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** End-to-end embedding near-duplicate CLUSTERS on the ANN scale
    * path: multi-probe hyperplane-LSH top-k candidates, thresholded on
    * cosine, become edges of a duplicate graph; connected components
    * assign every vector a cluster whose id is its smallest member
    * (vectors with no qualifying neighbor cluster to themselves). This
    * is the embedding twin of [[graft.ops.Dedup.nearDupClusters]] — the
    * exact-verifier arm is `embeddingNearDup` (Θ(n²) by role); THIS is
    * what runs corpus-wide at 10^12 rows: candidate generation is
    * bucket-keyed (no all-pairs anywhere), the edge set is bounded by
    * n·k, and the CC is the same long-keyed loop as document dedup.
    *
    * Recall caveat inherited from ANN: a true near-dup pair outside the
    * top-k candidates (or missed by every probe) is not an edge — on
    * clustered data the measured cluster recovery is near-total
    * (AnnRecallSpec), but this is approximate by contract.
    */
  def annNearDupClusters(
      spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame,
      threshold: Double,
      k: Int = 3,
      nPlanes: Int = 6,
      multiProbe: Boolean = true): DataFrame =
    topKToClusters(spark, embeddings, bucketedTopK(embeddings, k, nPlanes, multiProbe), threshold)

  /** IVF twin of [[annNearDupClusters]] — the embedding-dedup scale path
    * for CLUSTERED corpora. The round-6 full-catalog sf1 ledger exposed
    * hyperplane LSH's degeneracy on tightly clustered data: sign-bit
    * buckets are ANGULARLY atomic (a random hyperplane through the
    * origin rarely cuts a tight cluster — it must pass within the
    * cluster's angular radius), so buckets collapse to whole clusters
    * and per-bucket top-k goes Θ(Σ cluster²) — kg_ann_clustered cost
    * 192 s at sf1's 20k vectors, MORE than the exact q18 verifier.
    * IVF does not degenerate there: its centroids are SAMPLED CORPUS
    * POINTS, so every tight cluster receives ~(nCells / nClusters)
    * centroids and is subdivided into cells of ~n/nCells regardless of
    * how tight it is; per-query work is nProbe · n / nCells, chosen by
    * parameters instead of dictated by the data. Same contract
    * otherwise: top-k candidates thresholded on cosine become edges,
    * long-keyed CC labels every vector with its component minimum.
    */
  def ivfNearDupClusters(
      spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame,
      threshold: Double,
      k: Int = 3,
      nCells: Int = 16,
      nProbe: Int = 2): DataFrame =
    topKToClusters(
      spark, embeddings, ivfTopK(embeddings, embeddings, k, nCells, nProbe), threshold)

  /** Shared tail of the ANN-dedup flows: threshold the candidate top-k
    * into a duplicate graph, run long-keyed CC, label every vector
    * (no qualifying neighbor → own cluster).
    */
  private def topKToClusters(
      spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame,
      topk: DataFrame,
      threshold: Double): DataFrame = {
    import spark.implicits._
    val edges = topk
      .filter(col("cos") >= threshold)
      .select(
        least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .as[(Long, Long)]
    val cc = graft.kg.Canonicalize.connectedComponentsLong(spark, edges)
      .select(col("node").as("vec_id"), col("comp").as("cluster_id"))
    embeddings.select(col("vec_id"))
      .join(cc, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
  }

  /** ANN top-k restricted to same-bucket candidates (the scale path for
    * corpora without tight cluster structure).
    * Recall < 1 by construction; `multiProbe = true` additionally probes
    * every bucket at Hamming distance 1 from the query's (flip each of
    * the `nPlanes` sign bits) — the standard multi-probe LSH recall
    * lever: candidate budget grows ×(nPlanes+1) on the QUERY side only,
    * the corpus keeps exactly one bucket per vector, so no pair can be
    * scored twice and the join stays keyed on the bucket.
    *
    * DEGENERACY CAVEAT (measured, round-6 sf1 ledger): on TIGHTLY
    * CLUSTERED data, sign-bit buckets are angularly atomic — a random
    * hyperplane through the origin cuts a cluster only if it passes
    * within the cluster's angular radius, so adding planes stops
    * splitting buckets once bucket ≈ cluster, and the per-bucket
    * self-join degenerates to Θ(Σ cluster²) (kg_ann_clustered: 192 s on
    * 20k clusterBoost vectors — costlier than the exact verifier). For
    * clustered corpora use [[ivfTopK]] / [[ivfNearDupClusters]]: IVF
    * cells are seeded by sampled corpus points, so they subdivide tight
    * clusters and per-query work stays nProbe · n / nCells by
    * construction.
    */
  /** Incremental (delta-vs-history) EMBEDDING dedup — completes the
    * incremental trio ([[graft.ops.Dedup.incrementalDedup]] = exact
    * digests, [[graft.ops.Dedup.incrementalNearDup]] = minhash bands,
    * this = embedding cosine): today's delta vectors are checked
    * against the already-ingested corpus through its STORED IVF index
    * — `centroids` is the index snapshot built offline on a corpus
    * sample ([[ivfCentroids]]; the same train-then-serve split as
    * `ivfDedupStream`'s static snapshot), `history` the ingested
    * vectors (assigned to their cells; at 10^12 rows a table WRITTEN
    * bucketed by cell so the probe join is co-located). Each delta
    * vector probes its `nProbe` nearest cells and scores ONLY the
    * history vectors assigned there.
    *
    * Output: one row per delta vector — (vec_id, n_candidates,
    * best_cos = max 4-decimal-rounded cosine among candidates (null
    * when none), near_dup = best_cos ≥ threshold). History-only by
    * contract, like the other two incremental flags: within-delta
    * duplicates are the admitted batch's own dedup pass
    * ([[ivfNearDupClusters]]).
    *
    * Approximate like every ANN surface: a history near-dup whose cell
    * no probe reaches is missed (AnnRecallSpec-measured on clustered
    * fixtures). Scale posture: work is delta-bounded — |delta| ·
    * nProbe · (|history| / nCells) candidate pairs, never a history
    * self-join; history embeddings outside probed cells are never
    * read when the store is cell-bucketed.
    */
  def incrementalAnnDedup(
      delta: DataFrame,
      history: DataFrame,
      centroids: Seq[(Int, Seq[Float])],
      threshold: Double,
      nProbe: Int = 2): DataFrame = {
    // localCheckpoint: same lineage-cut rationale as ivfTopK (an
    // expression-defined embedding column would re-evaluate per
    // candidate pair through the cell join)
    val d = delta.localCheckpoint()
    val hist = ivfAssign(history.localCheckpoint(), centroids)
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val scored = ivfProbes(d, centroids, nProbe)
      .join(hist, Seq("cell"))
      .select(
        col("query_id"),
        // round-before-aggregate: the same cross-engine tie contract as
        // ivfTopK (the oracle replays max over DuckDB's rounded sums)
        round(cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
    val agg = scored
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_candidates"), max(col("cos")).as("best_cos"))
      .withColumnRenamed("query_id", "vec_id")
    d.select(col("vec_id"))
      .join(agg, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_cos"),
        when(col("best_cos") >= threshold, 1).otherwise(0).as("near_dup"))
  }

  /** Dump twin of [[incrementalAnnDedup]] for the DuckDB oracle: the
    * delta's probed cells and the history's cell assignment as one
    * scalar-column frame (role ∈ delta|hist). Shares [[ivfProbes]] /
    * [[ivfAssign]] with the op, so the dumped projections ARE the join
    * inputs the op used — the oracle then replays the cell join, the
    * cosine scoring and the per-vector aggregation independently in
    * SQL over this dump plus the raw embeddings table.
    */
  def incrementalAnnCells(
      delta: DataFrame,
      history: DataFrame,
      centroids: Seq[(Int, Seq[Float])],
      nProbe: Int = 2): DataFrame =
    ivfProbes(delta.localCheckpoint(), centroids, nProbe)
      .select(lit("delta").as("role"), col("query_id").as("vec_id"), col("cell"))
      .unionByName(
        ivfAssign(history.localCheckpoint(), centroids)
          .select(lit("hist").as("role"), col("vec_id"), col("cell")))

  def bucketedTopK(
      embeddings: DataFrame, k: Int, nPlanes: Int = 8, multiProbe: Boolean = false): DataFrame = {
    // localCheckpoint, not cache: released on GC instead of pinned in
    // the CacheManager forever (no unpersist point exists here)
    val b = lshBuckets(embeddings, nPlanes).localCheckpoint()
    val probes =
      if (!multiProbe) array(col("bucket"))
      else array(col("bucket") +: (0 until nPlanes)
        .map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val a = b.select(
      explode(probes).as("bucket"),
      col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = b.select(col("bucket"), col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    a.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        // rounded-before-rank: the cross-engine tie-boundary contract —
        // see the ivfTopK note
        round(cosine(col("q_emb"), col("n_emb")), 4).as("cos")
      )
      // same pre-window repartition as ivfTopK (measured there at sf1)
      .repartition(
        embeddings.sparkSession.sessionState.conf.numShufflePartitions,
        col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
