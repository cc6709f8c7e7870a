package graft.io

import graft.core.Mention
import org.apache.spark.sql.{Dataset, SparkSession}

/** Reference prediction-file format (SURVEY S6/S8):
  * `sid|start-end|text|type`, one entity per line
  * (ml/src/predictions.py:22,26), parsed back by the evaluator with
  * last-`|`-field-is-class semantics and full-line dedup
  * (ml/evaluator.py:83-97).
  */
object PredFile {

  def formatLine(m: Mention): String =
    s"${m.sid}|${m.start}-${m.end}|${m.text}|${m.etype}"

  /** Evaluator-side parse: last field = class, rest = instance key
    * (the key itself may contain '|' from the text). Mirrors
    * `line.split("|")[-1]` / `"|".join(split[:-1])`.
    */
  def parseLine(line: String): (String, String) = {
    val i = line.lastIndexOf('|')
    (line.substring(0, i), line.substring(i + 1))
  }

  /** Distributed source with the evaluator's dedup semantics (exact
    * duplicate lines collapse, ml/evaluator.py:88-90).
    */
  def read(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(_.nonEmpty)
      .map(_.strip())
      .distinct()
      .map(parseLine)
  }

  /** Inverse of formatLine for round-trips: sid|start-end|text -> a
    * Mention again (text may itself contain '|'; offsets are the 2nd
    * field).
    */
  private val SpanRe = "(-?\\d+)-(-?\\d+)".r

  def parseMention(line: String): Mention = {
    val firstBar = line.indexOf('|')
    val secondBar = line.indexOf('|', firstBar + 1)
    val lastBar = line.lastIndexOf('|')
    val sid = line.substring(0, firstBar)
    val (s, e) = line.substring(firstBar + 1, secondBar) match {
      case SpanRe(a, b) => (a.toInt, b.toInt) // starts can be -1 (W3 quirk)
      case _            => (-1, -1)
    }
    Mention(sid, s, e, line.substring(secondBar + 1, lastBar), line.substring(lastBar + 1))
  }
}
