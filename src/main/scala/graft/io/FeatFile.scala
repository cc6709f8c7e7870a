package graft.io

import graft.core.FeatureRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Reference feature-file format (SURVEY S5/S7):
  * `sid \t form \t start \t end \t tag \t feat1 \t ... \t featN`, one
  * token per line, sentences separated by a blank line
  * (ml/extract-features.py:123-129; consumer schema
  * ml/src/feature_space.py:8-15,70).
  *
  * The Spark-native pipeline never needs this file (stages fuse in one
  * job), but the sink/source pair exists for (a) byte-parity with the
  * reference's `.feat` artifacts and (b) interop: a `.feat` produced by
  * the reference tooling can be ingested directly.
  *
  * The blank-line framing does not survive a distributed text write
  * (line order within a partition file is preserved, but sentence
  * grouping across partitions isn't meaningful) — the parity-exact
  * sink is driver-side (`formatSentences`); the distributed source
  * drops the framing and regroups on sid, which is semantically
  * identical because column 0 is the sid (SURVEY S5).
  */
object FeatFile {

  /** One token line, exactly as the reference prints it. */
  def formatRow(r: FeatureRow): String =
    (Seq(r.sid, r.form, r.start.toString, r.end.toString, r.tag) ++ r.features)
      .mkString("\t")

  /** A whole corpus as the reference's stdout bytes: rows grouped by
    * sentence in input order, blank line after every sentence.
    */
  def formatSentences(sentences: Seq[Seq[FeatureRow]]): String = {
    val sb = new StringBuilder
    sentences.foreach { rows =>
      rows.foreach { r => sb ++= formatRow(r); sb += '\n' }
      sb += '\n'
    }
    sb.result()
  }

  /** Parse one feature-file line (inverse of formatRow). */
  def parseRow(line: String): FeatureRow = {
    val f = line.split("\t", -1)
    FeatureRow(f(0), f(1), f(2).toInt, f(3).toInt, f(4), f.drop(5).toVector)
  }

  /** Distributed source: read a `.feat` text file into FeatureRows.
    * Blank separator lines are dropped; sentence grouping is recovered
    * from the sid column when a consumer needs it (groupByKey(_.sid)).
    */
  def read(spark: SparkSession, path: String): Dataset[FeatureRow] = {
    import spark.implicits._
    spark.read.textFile(path).filter(_.nonEmpty).map(parseRow)
  }
}
