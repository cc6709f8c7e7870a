package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  def clusterBoost(embeddings: DataFrame, nClusters: Int = 8, strength: Double = 3.0): DataFrame =
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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-0.5, 0.5). No RNG state — reproducible
    * across engines and runs.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane), dim), lit(1000)).cast("double") / 1000.0) - 0.5

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes. Vectors in the
    * same bucket are likely neighbors; bucket count = 2^nPlanes.
    */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 8): DataFrame = {
    val bucketBits = (0 until nPlanes).map { p =>
      val dotp = aggregate(
        transform(col("embedding"), (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(dotp >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    embeddings.withColumn("bucket", bucketBits.reduce(_ + _))
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
  def ivfCentroids(embeddings: DataFrame, nCells: Int): Seq[(Int, Seq[Float])] =
    embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(hash(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .collect()
      .toSeq
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }

  /** The `nProbe` nearest cells for a vector column, as an array of
    * struct(neg_cos, cell) sorted by descending cosine (ties → lower
    * cell id). One fused pass per row: the centroid table rides along
    * as an array literal (broadcast with the plan), scored by the
    * native CosineSim inside codegen — no join, no row blow-up.
    */
  private def nearestCells(
      emb: Column, centroids: Seq[(Int, Seq[Float])], nProbe: Int): Column = {
    val scored = transform(
      typedLit(centroids),
      c => struct(
        // CosineSim is null for zero-norm vectors, and struct ordering
        // sorts a null field FIRST ascending — unguarded, a zero-norm
        // vector (either side) would become the "nearest" cell for every
        // row and collapse the index into one quadratic cell. Map null
        // to +inf so zero-norm pairs rank LAST instead.
        coalesce(-cosine(emb, c.getField("_2")), lit(Double.MaxValue)).as("neg_cos"),
        c.getField("_1").as("cell")))
    slice(array_sort(scored), 1, nProbe)
  }

  /** Corpus side of the IVF index: each vector labeled with its single
    * nearest cell.
    */
  def ivfAssign(embeddings: DataFrame, centroids: Seq[(Int, Seq[Float])]): DataFrame =
    embeddings.withColumn(
      "cell",
      element_at(nearestCells(col("embedding"), centroids, 1), 1).getField("cell"))

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
    val centroids = ivfCentroids(embeddings, nCells)
    val corpus = ivfAssign(embeddings, centroids)
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val probes = queries
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        explode(nearestCells(col("embedding"), centroids, nProbe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probes.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("q_emb"), col("n_emb")), 4).as("cos"))
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
      multiProbe: Boolean = true): DataFrame = {
    import spark.implicits._
    val edges = bucketedTopK(embeddings, k, nPlanes, multiProbe)
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

  /** ANN top-k restricted to same-bucket candidates (the scale path).
    * Recall < 1 by construction; `multiProbe = true` additionally probes
    * every bucket at Hamming distance 1 from the query's (flip each of
    * the `nPlanes` sign bits) — the standard multi-probe LSH recall
    * lever: candidate budget grows ×(nPlanes+1) on the QUERY side only,
    * the corpus keeps exactly one bucket per vector, so no pair can be
    * scored twice and the join stays keyed on the bucket.
    */
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
        round(cosine(col("q_emb"), col("n_emb")), 4).as("cos")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
