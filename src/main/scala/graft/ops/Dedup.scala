package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, n-gram Jaccard,
  * embedding-cosine near-dup. (SimHash lives in TextOps.)
  *
  * Scale posture:
  *   - exact dedup is one hash-groupBy on a 128-bit digest — the digest
  *     (16 bytes) shuffles, never the document body;
  *   - MinHash+LSH bounds the near-dup search to same-(band, signature)
  *     buckets: candidate generation is a self-equi-join on the bucket
  *     key, i.e. O(sum of bucket² ) instead of O(n²);
  *   - n-gram Jaccard is the expensive verifier, run only on LSH
  *     candidates (or an explicit bounded pair set);
  *   - embedding near-dup brute force is for verification; the scale
  *     path is Similarity.lshBuckets.
  */
object Dedup {

  /** Exact duplicate groups: digest → group size + representative
    * (min doc_id). `keep_id` is the survivor a dedup pass would keep.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("dup_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

  /** Word k-gram shingles of `text` as a distinct array. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      filter(
        transform(toks, (_, i) => when(i <= size(toks) - k, concat_ws(" ", slice(toks, i + 1, lit(k))))),
        x => x.isNotNull
      )
    )
  }

  /** MinHash signatures: one row per (doc_id, band) with the band's
    * min-hash over shingles. Hash = md5(shingle + "#" + band) kept as a
    * string so the DuckDB oracle computes the identical value; the
    * hot-path variant would swap in xxhash64 (codegen, 8 bytes) — same
    * operator shape.
    */
  def minhashSignatures(docs: DataFrame, bands: Int = 8, k: Int = 3): DataFrame = {
    val sh = docs.select(
      col("doc_id"),
      explode(shingles(col("text"), k)).as("shingle")
    )
    val withBands = sh.select(
      col("doc_id"),
      explode(array((0 until bands).map(lit): _*)).as("band"),
      col("shingle")
    )
    withBands
      .groupBy(col("doc_id"), col("band"))
      .agg(min(md5(to_binary(concat(col("shingle"), lit("#"), col("band")), lit("utf-8")))).as("sig"))
  }

  /** LSH candidate pairs: docs sharing a (band, sig) bucket; returns
    * (doc_a < doc_b, n_shared_bands). The self-join shuffles on the
    * bucket key only.
    */
  def lshCandidates(docs: DataFrame, bands: Int = 8, k: Int = 3): DataFrame = {
    val sig = minhashSignatures(docs, bands, k)
    val a = sig.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = sig.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Jaccard similarity over distinct word k-grams for an explicit pair
    * set `(doc_a, doc_b)`. Used as the LSH verifier.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, k: Int = 3): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text"), k).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          4
        ).as("jaccard")
      )
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold.
    * Brute-force O(n²) within the frame — verification-scale only; the
    * production path buckets by Similarity.lshBuckets first.
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.95): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        round(Similarity.cosine(col("e_a"), col("e_b")), 4).as("cos")
      )
      .filter(col("cos") >= threshold)
  }
}
