package graft.ner

import graft.core.{GoldSpan, ParsedSentence, Tokenize}
import org.scalatest.funsuite.AnyFunSuite

/** E2E check of the EXTERNAL-gazetteer deployment mode the north star
  * names (DrugBank/HSDB lexicons): the `gaz=` CRF feature
  * (`Features.withGaz` + `CrfScorer(params, Some(gaz))`) must let the
  * model recall surfaces it has NEVER seen in training when an external
  * lexicon covers them. The train-built gazetteer arm was measured
  * redundant (BASELINE.md: devel 77.1 vs 78.9 — form= memorization);
  * this spec exercises the path the plumbing is actually kept for —
  * a lexicon that is NOT train-derived.
  */
class GazExternalSpec extends AnyFunSuite {

  // suffixes kept disjoint between the two sets so the baseline CRF
  // cannot recover the held-out drugs through suf3= alone
  private val trainDrugs = Vector("alphadrin", "betamol", "gammazole", "deltaphen")
  private val extDrugs = Vector("epsilonib", "zetamab", "etaprofen")

  private val trainTemplates = Vector(
    "Patients taking %s should be monitored closely .",
    "%s increases the effect of other agents .",
    "Administration of %s reduced plasma levels .",
    "Concomitant use of %s is not recommended .",
    "%s was well tolerated in the study .")
  // eval contexts are DISJOINT from the train templates, so context
  // features alone cannot carry the unseen surfaces either — the gaz
  // feature is the only signal that transfers
  private val evalTemplates = Vector(
    "Therapy with %s continued for two weeks .",
    "%s blood samples were collected daily .",
    "No dose adjustment for %s appears necessary .")

  private def sent(sid: String, tpl: String, drug: String): ParsedSentence = {
    val text = tpl.format(drug)
    val st = text.indexOf(drug)
    ParsedSentence("r", sid.takeWhile(_ != '.'), sid, text,
      Seq(GoldSpan(s"$sid.e0", st, st + drug.length - 1, "drug", drug,
        s"$st-${st + drug.length - 1}")), Nil)
  }

  private lazy val spark = graft.TestSpark.spark

  test("external lexicon recovers recall on surfaces withheld from training") {
    import spark.implicits._
    val train = spark.createDataset(for {
      (d, i) <- trainDrugs.zipWithIndex
      (t, j) <- trainTemplates.zipWithIndex
    } yield sent(s"d$i.s$j", t, d))
    val eval = for {
      (d, i) <- extDrugs.zipWithIndex
      (t, j) <- evalTemplates.zipWithIndex
    } yield sent(s"x$i.s$j", t, d)

    // the external lexicon (DrugBank-shaped): covers BOTH the training
    // surfaces and the held-out ones — that is what "external" means
    val lexicon = (trainDrugs ++ extDrugs).map(_ -> "drug").toMap
    val gs = new GazetteerScorer(lexicon, 1)

    // (a) the feature fires on a surface the training set never saw
    val toksX = Tokenize.tokenize(eval.head.text)
    val featsX = Features.withGaz(Features.extractFeatures(toksX), toksX, Some(gs))
    val gi = toksX.indexWhere(_.form == extDrugs.head)
    assert(featsX(gi).contains("gaz=B-drug"), s"gaz feature missing: ${featsX(gi)}")
    assert(featsX.indices.filterNot(_ == gi).forall(i => featsX(i).contains("gaz=O")))

    // (b) recall on lexicon-only surfaces: CRF trained WITH the gaz
    // feature vs the plain CRF, both scored on the unseen contexts
    val plainParams = Train.fitCrf(spark, train, epochs = 30)
    val gazParams = Train.fitCrf(spark, train, epochs = 30, gazFeat = Some(gs))
    def recall(scorer: MentionScorer): Double = {
      val hits = eval.count { s =>
        val toks = Tokenize.tokenize(s.text)
        val tags = scorer.tagSentence(toks)
        val i = toks.indexWhere(_.start == s.entities.head.start)
        i >= 0 && tags(i) == "B-drug"
      }
      hits.toDouble / eval.length
    }
    val rPlain = recall(new CrfScorer(plainParams))
    val rGaz = recall(new CrfScorer(gazParams, Some(gs)))
    assert(rGaz == 1.0, s"external-gazetteer CRF must recall every lexicon surface, got $rGaz")
    assert(rPlain < rGaz,
      s"plain CRF should miss unseen surfaces in unseen contexts (plain=$rPlain gaz=$rGaz)")

    // the gaz-feature model must not hallucinate: non-entity tokens of
    // the eval sentences stay O
    val sc = new CrfScorer(gazParams, Some(gs))
    eval.foreach { s =>
      val toks = Tokenize.tokenize(s.text)
      val tags = sc.tagSentence(toks)
      toks.indices.foreach { i =>
        if (toks(i).start != s.entities.head.start)
          assert(tags(i) == "O", s"spurious tag ${tags(i)} on '${toks(i).form}' in '${s.text}'")
      }
    }
  }
}
