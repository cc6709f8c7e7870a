package graft.ner

import graft.core.{GoldSpan, ParsedSentence, Tokenize}
import org.scalatest.funsuite.AnyFunSuite

/** Precision drill for the external-gazetteer deployment mode: real
  * lexicons (DrugBank/HSDB) are NOISY — they contain entries that are
  * ordinary English words ("water", "oxygen") and typo'd variants.
  * GazExternalSpec proves the recall story on a clean lexicon; this
  * spec characterizes what a dirty lexicon costs in precision, the
  * other half of the deployment story.
  *
  * Setup: the lexicon covers the real drugs PLUS (a) common words that
  * occur as plain O tokens in train and/or eval sentences ("false
  * entry" noise) and (b) typo'd drug names matching no token. The CRF
  * trained WITH this gaz feature sees conflicting evidence —
  * lexicon-flagged tokens labeled O — so it learns a moderated gaz
  * weight instead of a hard rule.
  *
  * Measured facts (BASELINE.md "External gazetteer noise" rows):
  *   - PRECISION is immune: flagged common words never produce
  *     spurious mentions at any noise level (the O-labeled flags in
  *     training teach the model the flag alone is insufficient);
  *   - the cost lands entirely on RECALL of never-trained surfaces,
  *     and it is a CLIFF, not a slope: clean lexicon 1.0 → 0.333 as
  *     soon as the noise entries are corpus-FREQUENT words (42% and
  *     65% junk lexicons measure identically) — what matters is the
  *     flagged-token label ratio in the training corpus, not the
  *     lexicon's entry count, because the gaz weight is learned from
  *     exactly those occurrences;
  *   - typo entries are inert (exact surface matching): recall 1.0.
  * Deployment guidance that falls out: before plugging in
  * DrugBank/HSDB, drop lexicon entries that collide with
  * corpus-frequent tokens (a document-frequency cut) — a handful of
  * "water"/"oxygen" entries does the damage of thousands of junk
  * rows, while harmless junk (typos, surfaces absent from the corpus)
  * costs nothing.
  */
class GazNoiseSpec extends AnyFunSuite {

  private val trainDrugs = Vector("alphadrin", "betamol", "gammazole", "deltaphen")
  private val extDrugs = Vector("epsilonib", "zetamab", "etaprofen")

  // lexicon noise: ordinary words present as O tokens in the train
  // templates (the model SEES the conflict) and in the eval templates
  // (where a hard gaz rule would hallucinate mentions)
  private val trainNoise = Vector("monitored", "plasma", "use", "study", "levels")
  private val evalNoise = Vector("blood", "dose", "daily", "samples", "necessary")
  private val typoNoise = Vector("epsilonibb", "zetama", "alphadrine")

  private val trainTemplates = Vector(
    "Patients taking %s should be monitored closely .",
    "%s increases the effect of other agents .",
    "Administration of %s reduced plasma levels .",
    "Concomitant use of %s is not recommended .",
    "%s was well tolerated in the study .")
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

  test("lexicon-noise sweep: precision holds at every noise level; recall degrades with noise") {
    import spark.implicits._
    val train = spark.createDataset(for {
      (d, i) <- trainDrugs.zipWithIndex
      (t, j) <- trainTemplates.zipWithIndex
    } yield sent(s"d$i.s$j", t, d))
    val eval = for {
      (d, i) <- extDrugs.zipWithIndex
      (t, j) <- evalTemplates.zipWithIndex
    } yield sent(s"x$i.s$j", t, d)

    def arm(noise: Vector[String]): (Double, Double) = {
      val lexicon =
        ((trainDrugs ++ extDrugs).map(_ -> "drug") ++ noise.map(_ -> "drug")).toMap
      val gs = new GazetteerScorer(lexicon, 1)
      val sc = new CrfScorer(Train.fitCrf(spark, train, epochs = 30, gazFeat = Some(gs)), Some(gs))
      var tp = 0; var fn = 0; var fp = 0
      eval.foreach { s =>
        val toks = Tokenize.tokenize(s.text)
        val tags = sc.tagSentence(toks)
        toks.indices.foreach { i =>
          val isGold = toks(i).start == s.entities.head.start
          val tagged = tags(i) != "O"
          if (isGold && tagged) tp += 1
          else if (isGold) fn += 1
          else if (tagged) fp += 1
        }
      }
      (if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp), tp.toDouble / (tp + fn))
    }

    // sanity: the noise really fires as a conflicting flag in training
    val gsAll = new GazetteerScorer(
      ((trainDrugs ++ extDrugs) ++ trainNoise).map(_ -> "drug").toMap, 1)
    val toksT = Tokenize.tokenize(trainTemplates(0).format(trainDrugs(0)))
    val featsT = Features.withGaz(Features.extractFeatures(toksT), toksT, Some(gsAll))
    assert(featsT(toksT.indexWhere(_.form == "monitored")).contains("gaz=B-drug"),
      "train noise token must carry the gaz flag")

    val (pClean, rClean) = arm(typoNoise) // typos are inert -> effectively clean
    val (pMod, rMod) = arm(trainNoise) // 5 noise vs 7 real: ~42% junk
    val (pMaj, rMaj) = arm(trainNoise ++ evalNoise ++ typoNoise) // 13 vs 7: 65% junk
    info(f"clean+typos: p=$pClean%.3f r=$rClean%.3f | moderate(42%%): p=$pMod%.3f r=$rMod%.3f | majority(65%%): p=$pMaj%.3f r=$rMaj%.3f")

    // (a) precision NEVER degrades: lexicon-flagged common words stay O
    // at every noise level — the O-labeled flags in training teach the
    // model the flag alone is insufficient
    assert(pClean == 1.0 && pMod == 1.0 && pMaj == 1.0,
      s"flagged common words must not hallucinate mentions ($pClean/$pMod/$pMaj)")
    // (b) typo entries are inert: exact surface match -> clean-arm
    // recall is the full 1.0 of GazExternalSpec
    assert(rClean == 1.0, s"typo-only noise must not move recall (r=$rClean)")
    // (c) the cost of REAL noise is RECALL on unseen surfaces — the
    // more O-labeled flags in training, the more the gaz weight is
    // discounted; monotone in the noise fraction
    assert(rClean >= rMod && rMod >= rMaj,
      s"recall must degrade monotonically with lexicon noise ($rClean >= $rMod >= $rMaj)")
    assert(rMaj < 1.0,
      "a majority-junk lexicon is expected to lose unseen-surface recall — " +
        "if this starts passing, the deployment guidance in BASELINE.md is stale")
  }
}
