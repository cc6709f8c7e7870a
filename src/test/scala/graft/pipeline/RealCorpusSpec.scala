package graft.pipeline

import graft.TestSpark
import graft.core.DocRow
import graft.evaluate.Evaluator
import graft.ner.Train
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Full-corpus parity runs against the read-only reference DDI corpus at
  * /root/reference/data — guarded by an existence check (FIXTURES.md:
  * tests must pass without it).
  *
  * The gold round-trip is the P/R>=0.95 evidence for the deterministic
  * stage chain: feed GOLD spans through tokenize → tag (J1) → BIO decode
  * (W2) → evaluator (E3); every mention the chain can represent must
  * survive. Known, bounded losses (measured in BASELINE.md): 12 devel
  * discontinuous entities (first-span truncation), quote-rewritten
  * offsets (13 sentences corpus-wide), and token/span misalignments.
  */
class RealCorpusSpec extends AnyFunSuite {

  private val develDir = Paths.get("/root/reference/data/devel")

  private def loadDocs(dir: java.nio.file.Path): Seq[DocRow] =
    Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString).map { p =>
      DocRow("repo-ref", p.toString, "0" * 40, "xml",
        new String(Files.readAllBytes(p), "UTF-8"))
    }

  test("gold round-trip on reference devel: NOCLASS and CLASS P/R >= 0.95") {
    assume(Files.isDirectory(develDir), "reference corpus not present")
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Pipeline.withSha(spark.createDataset(loadDocs(develDir)).toDF())
    val sents = Pipeline.parse(spark, docs).cache()

    // oracle tagging: tags straight from gold spans (reference get_tag)
    val mentions = sents.flatMap { s =>
      val toks = graft.core.Tokenize.tokenize(s.text)
      val tagged = toks.map(t =>
        graft.core.TaggedTok(t.form, t.start, t.end, graft.ner.Features.getTag(t, s.entities)))
      graft.ner.Decode.decode(s.sid, tagged)
    }

    val rows = Pipeline.evaluateNER(spark, sents, mentions)
    val noclass = rows.find(_.kind == "NOCLASS").get
    val cls = rows.find(_.kind == "CLASS").get
    info(Evaluator.statsTable(rows))
    assert(noclass.p >= 0.95, s"round-trip NOCLASS precision ${noclass.p}")
    assert(noclass.r >= 0.95, s"round-trip NOCLASS recall ${noclass.r}")
    assert(cls.p >= 0.95 && cls.r >= 0.95, s"round-trip CLASS P=${cls.p} R=${cls.r}")
    sents.unpersist()
  }

  test("train-derived gazetteer coverage on devel matches measured baseline (~0.70 typed)") {
    assume(Files.isDirectory(develDir), "reference corpus not present")
    val trainDir = Paths.get("/root/reference/data/train")
    assume(Files.isDirectory(trainDir), "reference train split not present")
    val spark = TestSpark.spark
    import spark.implicits._
    val trainSents = Pipeline.parse(spark,
      Pipeline.withSha(spark.createDataset(loadDocs(trainDir)).toDF())).cache()
    val develSents = Pipeline.parse(spark,
      Pipeline.withSha(spark.createDataset(loadDocs(develDir)).toDF())).cache()

    val (gaz, _) = Train.buildGazetteer(spark, trainSents)
    val develMentions = develSents.flatMap(s => s.entities.map(e => (e.text.toLowerCase, e.etype)))
      .collect()
    val surfaceHit = develMentions.count { case (t, _) => gaz.contains(t) }.toDouble / develMentions.length
    val typedHit = develMentions.count { case (t, ty) => gaz.get(t).contains(ty) }.toDouble / develMentions.length
    info(f"gazetteer surface coverage: $surfaceHit%.3f typed: $typedHit%.3f")
    assert(surfaceHit > 0.65 && surfaceHit < 0.80) // BASELINE.md: 71.0%
    assert(typedHit > 0.64 && typedHit < 0.80) // BASELINE.md: 70.3%
    trainSents.unpersist(); develSents.unpersist()
  }
}
