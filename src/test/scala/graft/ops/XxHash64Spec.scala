package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent reimplementation of the public XXH64 algorithm
  * (Yann Collet's xxHash, https://github.com/Cyan4973/xxHash — the
  * spec is public; this file is written from the published algorithm,
  * not from Spark's source), used to VALUE-VERIFY the q21_minhash_fast
  * production path: DuckDB has no xxhash64 twin, so the q22 dump-replay
  * oracle verifies only the banding/bucketing DERIVATION over the q21
  * signatures. This spec closes the remaining gap by recomputing the
  * raw signature values with a second, independent JVM implementation
  * and asserting exact equality against:
  *   1. Spark's `xxhash64` column function (per input class: strings
  *     of every tail-length regime incl. multi-byte UTF-8, ints,
  *     longs, and the (string, int) seed-chaining shape q21 uses);
  *   2. the full `Dedup.minhashSignaturesFast` result on a corpus —
  *     shingling, per-band hashing, and the min-aggregation recomputed
  *     driver-side from the raw texts.
  * With this, every one of the catalog's value surfaces is verified
  * directly (DuckDB oracle), transitively (dump-replay), or by
  * independent reimplementation (this spec).
  */
class XxHash64Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ---- XXH64, from the public specification ------------------------

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  private def mergeRound(hash: Long, v: Long): Long =
    (hash ^ round(0L, v)) * P1 + P4

  /** XXH64 over a byte array (little-endian lane reads, per the spec). */
  def xxh64Bytes(bytes: Array[Byte], seed: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val len = bytes.length
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (off + 32 <= len) {
          v1 = round(v1, bb.getLong(off))
          v2 = round(v2, bb.getLong(off + 8))
          v3 = round(v3, bb.getLong(off + 16))
          v4 = round(v4, bb.getLong(off + 24))
          off += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1)
        acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3)
        mergeRound(acc, v4)
      } else seed + P5
    h += len
    while (off + 8 <= len) {
      h = rotl(h ^ round(0L, bb.getLong(off)), 27) * P1 + P4
      off += 8
    }
    if (off + 4 <= len) {
      h = rotl(h ^ ((bb.getInt(off) & 0xffffffffL) * P1), 23) * P2 + P3
      off += 4
    }
    while (off < len) {
      h = rotl(h ^ ((bytes(off) & 0xffL) * P5), 11) * P1
      off += 1
    }
    fmix(h)
  }

  /** XXH64 of a 4-byte int lane (the fixed-width shortcut the spec
    * defines for a single 4-byte input: seed + P5 + 4, then the 4-byte
    * tail step, then the avalanche).
    */
  def xxh64Int(input: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h = rotl(h ^ ((input & 0xffffffffL) * P1), 23) * P2 + P3
    fmix(h)
  }

  /** XXH64 of an 8-byte long lane (seed + P5 + 8, one 8-byte step,
    * avalanche).
    */
  def xxh64Long(input: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h = rotl(h ^ round(0L, input), 27) * P1 + P4
    fmix(h)
  }

  /** Spark's `xxhash64(a, b, ...)` seed-chains left to right from 42:
    * each column's hash becomes the next column's seed. q21's shape is
    * (string shingle, int band).
    */
  private def chainStringInt(s: String, b: Int): Long =
    xxh64Int(b, xxh64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 42L))

  // ---- 1. equality vs Spark's xxhash64, per input class ------------

  test("xxh64 matches Spark xxhash64 on strings across all tail-length regimes") {
    import spark.implicits._
    // lengths 0..40 cover: empty, byte tail, 4-byte step, 8-byte words,
    // and the >=32 stripe loop; plus multi-byte UTF-8 and shingle-like text
    val strings =
      (0 to 40).map(n => ("abcdefghij" * 5).take(n)) ++
        Seq("warfarin may increase", "the#0", "the#3",
          "naïve café — 日本語テキスト €", "a b c d e f g h i j k l m n o p q r s t")
    val df = strings.toDF("s")
    val got = df.select(col("s"), xxhash64(col("s"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      val mine = xxh64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 42L)
      assert(mine == got(s), s"mismatch on string '$s' (len ${s.length})")
    }
  }

  test("xxh64 matches Spark xxhash64 on int and long columns") {
    import spark.implicits._
    val ints = Seq(0, 1, -1, 7, 42, Int.MaxValue, Int.MinValue, 123456789)
    val gotI = ints.toDF("i").select(col("i"), xxhash64(col("i"))).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    ints.foreach(i => assert(xxh64Int(i, 42L) == gotI(i), s"int mismatch on $i"))

    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 987654321012345L)
    val gotL = longs.toDF("l").select(col("l"), xxhash64(col("l"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    longs.foreach(l => assert(xxh64Long(l, 42L) == gotL(l), s"long mismatch on $l"))
  }

  test("xxh64 seed chain matches Spark xxhash64(string, int) — the q21 hash shape") {
    import spark.implicits._
    val rows = for {
      s <- Seq("", "x", "warfarin interacts with digoxin", "shingle of three", "日本語")
      b <- 0 until 8
    } yield (s, b)
    val got = rows.toDF("s", "b")
      .select(col("s"), col("b"), xxhash64(col("s"), col("b"))).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { case (s, b) =>
      assert(chainStringInt(s, b) == got((s, b)), s"chain mismatch on ('$s', $b)")
    }
  }

  // ---- 2. full q21 recomputation from raw text ---------------------

  test("minhashSignaturesFast values == independent driver-side recomputation") {
    import spark.implicits._
    // corpus with duplicate texts, shared shingles, and a <3-token doc
    // (no shingles -> no signature rows), mirroring the documents table
    val vocab = Vector("the", "query", "ran", "fast", "on", "big", "table", "rows")
    val rnd = new scala.util.Random(5)
    val docs = (0L until 60L).map { i =>
      val text =
        if (i == 7L) "too short"
        else if (i % 10 == 3) "the query ran fast on the big table" // exact dups
        else Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, text)
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashSignaturesFast(df, bands = 8, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    // independent recomputation: split(" ") sliding-3 distinct shingles,
    // per band b: min over shingles of xxh64(shingle) seed-chained into
    // xxh64Int(b)
    var expectedRows = 0
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length >= 3) {
        val shingles = toks.sliding(3).map(_.mkString(" ")).toVector.distinct
        (0 until 8).foreach { b =>
          expectedRows += 1
          val expect = shingles.map(chainStringInt(_, b)).min
          assert(got((id, b)) == expect, s"sig mismatch doc=$id band=$b")
        }
      } else assert(!got.keySet.exists(_._1 == id), s"doc $id should emit no signature")
    }
    assert(got.size == expectedRows)
  }
}
