package graft.ner

import graft.core.ParsedSentence
import graft.core.Tokenize
import org.apache.spark.sql.{Dataset, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Vocabulary index build + the `.idx` persistence format (SURVEY A4 /
  * D8; reference nn/codemaps.py:36-95).
  *
  * Reference semantics: distinct lower-cased word forms, lower-cased
  * suffixes of length `suflen`, and BIO labels over the training corpus,
  * each mapped to dense ids starting at 2 with PAD=0 and UNK=1; plus a
  * `maxlen` padding bound. The reference's ids depend on Python set
  * iteration order (nondeterministic across runs, hash randomization) —
  * our ids are assigned over SORTED keys so every run and every engine
  * agrees (SURVEY §4 determinism rule).
  *
  * Build = three distinct() aggregations, collected (vocabularies are
  * KBs-MBs) and broadcast by callers.
  */
final case class Codemaps(
    maxlen: Int,
    suflen: Int,
    wordIndex: Map[String, Int],
    sufIndex: Map[String, Int],
    labelIndex: Map[String, Int]
) {

  /** Persist in the reference's `.idx` text format
    * (nn/codemaps.py:85-95): one `KIND key id` line per entry, plus
    * MAXLEN/SUFLEN headers. Sorted for byte determinism.
    */
  def save(path: String): Unit = {
    val sb = new StringBuilder
    sb ++= s"MAXLEN - $maxlen\n"
    sb ++= s"SUFLEN - $suflen\n"
    wordIndex.toSeq.sortBy(_._2).foreach { case (k, v) => sb ++= s"WORD $k $v\n" }
    sufIndex.toSeq.sortBy(_._2).foreach { case (k, v) => sb ++= s"SUF $k $v\n" }
    labelIndex.toSeq.sortBy(_._2).foreach { case (k, v) => sb ++= s"LABEL $k $v\n" }
    Files.write(Paths.get(path), sb.result().getBytes("UTF-8"))
  }

  /** Encode one sentence's lower-cased forms as post-padded int rows
    * (the D9 tensor shape, one row here).
    */
  def encodeWords(forms: Seq[String]): Array[Int] = {
    val out = Array.fill(maxlen)(0) // PAD
    forms.take(maxlen).zipWithIndex.foreach { case (f, i) =>
      out(i) = wordIndex.getOrElse(f.toLowerCase(java.util.Locale.ROOT), 1) // UNK
    }
    out
  }
}

object Codemaps {

  val Pad = 0
  val Unk = 1

  def build(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      maxlen: Int = 150,
      suflen: Int = 5
  ): Codemaps = {
    import spark.implicits._
    val toks = sents
      .flatMap(s => Tokenize.tokenize(s.text).map(_.form.toLowerCase(java.util.Locale.ROOT)))
      .cache()
    val words = toks.distinct().collect().sorted
    val sufs = toks.map(w => w.takeRight(suflen)).distinct().collect().sorted
    val labels = sents
      .flatMap(s => Features.tagSentence(Tokenize.tokenize(s.text), s.entities).map(_.tag))
      .distinct()
      .collect()
      .sorted
    toks.unpersist()
    Codemaps(
      maxlen,
      suflen,
      words.zipWithIndex.map { case (w, i) => w -> (i + 2) }.toMap,
      sufs.zipWithIndex.map { case (s, i) => s -> (i + 2) }.toMap,
      labels.zipWithIndex.map { case (l, i) => l -> (i + 2) }.toMap
    )
  }

  /** Load the `.idx` format back (nn/codemaps.py:63-82). */
  def load(path: String): Codemaps = {
    var maxlen = 0
    var suflen = 0
    val words = Map.newBuilder[String, Int]
    val sufs = Map.newBuilder[String, Int]
    val labels = Map.newBuilder[String, Int]
    Files.readAllLines(Paths.get(path)).asScala.foreach { line =>
      line.split(" ") match {
        case Array("MAXLEN", _, v)  => maxlen = v.toInt
        case Array("SUFLEN", _, v)  => suflen = v.toInt
        case Array("WORD", k, v)    => words += (k -> v.toInt)
        case Array("SUF", k, v)     => sufs += (k -> v.toInt)
        case Array("LABEL", k, v)   => labels += (k -> v.toInt)
        case _                      =>
      }
    }
    Codemaps(maxlen, suflen, words.result(), sufs.result(), labels.result())
  }
}
