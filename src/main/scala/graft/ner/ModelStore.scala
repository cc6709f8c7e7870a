package graft.ner

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Model persistence (SURVEY S9).
  *
  * The reference stores models as opaque binaries (crfsuite bytes,
  * joblib pickles — ml/src/models/CRF.py:45-52,
  * ml/src/models/multinomial_nb.py:44-58); ours are closed-form
  * parameters, so the store is a human-readable, deterministic text
  * format (sorted keys). `load` mirrors the reference's
  * try-each-registered-class inference (`load_model`,
  * ml/src/models/__init__.py:42-70): a path is inspected and parsed by
  * whichever format matches.
  *
  * Format (one record per line, tab-separated):
  *   MNB <tab> CLASSES <tab> c1,c2,...
  *   MNB <tab> PRIOR   <tab> p1,p2,...
  *   MNB <tab> DEFAULT <tab> d1,d2,...
  *   MNB <tab> FEAT <tab> <feature> <tab> lp1,lp2,...
  *   GAZ <tab> <surface> <tab> <type>
  */
object ModelStore {

  private def fmtD(d: Double): String = java.lang.Double.toString(d)

  /** Record framing is tab/newline-based, but surfaces and feature
    * strings come from UNTRUSTED document text (XML attributes may
    * legally encode tabs/newlines) — escape them so every entry
    * round-trips instead of silently corrupting the record grid.
    */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b += '\\'
          case 't'  => b += '\t'
          case 'n'  => b += '\n'
          case 'r'  => b += '\r'
          case o    => b += '\\'; b += o
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.result()
  }

  def saveMnb(params: MnbParams, path: String): Unit = {
    val sb = new StringBuilder
    sb ++= s"MNB\tCLASSES\t${params.classes.mkString(",")}\n"
    sb ++= s"MNB\tPRIOR\t${params.logPrior.map(fmtD).mkString(",")}\n"
    sb ++= s"MNB\tDEFAULT\t${params.defaultLog.map(fmtD).mkString(",")}\n"
    params.featLogProb.toSeq.sortBy(_._1).foreach { case (f, lp) =>
      sb ++= s"MNB\tFEAT\t${esc(f)}\t${lp.map(fmtD).mkString(",")}\n"
    }
    Files.write(Paths.get(path), sb.result().getBytes("UTF-8"))
  }

  def loadMnb(path: String): MnbParams = {
    var classes = Array.empty[String]
    var prior = Array.empty[Double]
    var default = Array.empty[Double]
    val feats = Map.newBuilder[String, Array[Double]]
    Files.readAllLines(Paths.get(path)).asScala.foreach { line =>
      line.split("\t", -1) match {
        case Array("MNB", "CLASSES", v)  => classes = v.split(",", -1)
        case Array("MNB", "PRIOR", v)    => prior = v.split(",", -1).map(_.toDouble)
        case Array("MNB", "DEFAULT", v)  => default = v.split(",", -1).map(_.toDouble)
        case Array("MNB", "FEAT", f, v)  => feats += (unesc(f) -> v.split(",", -1).map(_.toDouble))
        case _                           =>
      }
    }
    MnbParams(classes, prior, feats.result(), default)
  }

  def saveGazetteer(gaz: Map[String, String], path: String): Unit = {
    val sb = new StringBuilder
    gaz.toSeq.sorted.foreach { case (s, t) => sb ++= s"GAZ\t${esc(s)}\t${esc(t)}\n" }
    Files.write(Paths.get(path), sb.result().getBytes("UTF-8"))
  }

  def loadGazetteer(path: String): Map[String, String] =
    Files.readAllLines(Paths.get(path)).asScala.flatMap { line =>
      line.split("\t", -1) match {
        case Array("GAZ", s, t) => Some(unesc(s) -> unesc(t))
        case _                  => None
      }
    }.toMap

  /** Reference-style inference load: inspect the file's leading record
    * tag and dispatch (ml/src/models/__init__.py:60-70 tries each
    * registered class until one loads).
    */
  def load(path: String): Either[Map[String, String], MnbParams] = {
    val lines = Files.lines(Paths.get(path))
    val first = try lines.findFirst().orElse("") finally lines.close()
    if (first.startsWith("GAZ\t")) Left(loadGazetteer(path))
    else if (first.startsWith("MNB\t")) Right(loadMnb(path))
    else throw new IllegalArgumentException(s"unrecognized model file: $path")
  }
}
