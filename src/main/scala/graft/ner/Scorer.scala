package graft.ner

import graft.core.Tok

/** Pluggable token-tagging models — the Spark counterpart of the
  * reference's `ModelABC` registry (ml/src/models/__init__.py:6-70):
  * implementations are resolved by alias; each maps a tokenized sentence
  * to one BIO tag per token. All implementations are pure + Serializable
  * so they ride inside `mapPartitions` closures after a broadcast.
  */
trait MentionScorer extends Serializable {

  /** One BIO tag per token. Implementations that need the W1 feature
    * vectors compute them internally — the gazetteer path never
    * materializes feature strings (a large fraction of the pipeline's
    * allocation volume when computed eagerly for every sentence).
    */
  def tagSentence(toks: IndexedSeq[Tok]): IndexedSeq[String]
}

/** The `CustomModel` floor: predicts "O" for every token
  * (ml/src/models/custom.py:19) — P=R=F1=0 by construction.
  */
object AllOScorer extends MentionScorer {
  def tagSentence(toks: IndexedSeq[Tok]): IndexedSeq[String] =
    toks.map(_ => "O")
}

/** Common contract of the linear pair/token classifiers (MNB,
  * averaged perceptron): score a raw feature bag against a sorted
  * class array. Lets the DDI decision logic ([[graft.ddi.Relations]])
  * swap models without touching the pipeline.
  */
trait RawScorer extends Serializable {
  def classes: Array[String]
  def scoresRaw(feats: Seq[String]): Array[Double]
}

/** Multinomial Naive Bayes parameters in closed form (SURVEY A5).
  *
  * Matches sklearn's `DictVectorizer(one-hot) + MultinomialNB(alpha=1)`
  * pipeline (ml/src/models/multinomial_nb.py:34-42) semantics:
  *   - classes sorted ascending (np.unique);
  *   - prior_c = log(n_tokens_c / n_tokens) (fit_prior default);
  *   - logp(f,c) = log((count(f,c) + 1) / (total_c + |V|));
  *   - a feature absent from the training vocabulary is DROPPED at
  *     predict time (DictVectorizer.transform);
  *   - argmax takes the FIRST maximal class (np.argmax).
  *
  * @param classes     sorted class labels
  * @param logPrior    per-class log prior
  * @param featLogProb feature -> per-class log likelihood (dense array
  *                    aligned with `classes`)
  * @param defaultLog  per-class log((0+1)/(total_c+|V|)) for in-vocab
  *                    features with no (f,c) count
  */
final case class MnbParams(
    classes: Array[String],
    logPrior: Array[Double],
    featLogProb: Map[String, Array[Double]],
    defaultLog: Array[Double]
) extends RawScorer {

  def scores(dictFeats: Seq[(String, String)]): Array[Double] = {
    val n = classes.length
    val s = new Array[Double](n)
    System.arraycopy(logPrior, 0, s, 0, n)
    dictFeats.foreach { case (k, v) =>
      featLogProb.get(k + "=" + v) match {
        case Some(lp) =>
          var i = 0
          while (i < n) { s(i) += lp(i); i += 1 }
        case None => // out-of-vocab: dropped by DictVectorizer.transform
      }
    }
    s
  }

  private def addFeat(s: Array[Double], key: String): Unit =
    featLogProb.get(key) match {
      case Some(lp) =>
        var i = 0
        while (i < s.length) { s(i) += lp(i); i += 1 }
      case None => // out-of-vocab: dropped by DictVectorizer.transform
    }

  /** Hot-path twin of [[scores]] over the RAW W1 feature strings: the
    * training vocabulary keys are exactly the raw `k=v` strings, and
    * extractFeatures never emits two features with the same dict key,
    * so the toDict split + re-concat round-trip (two allocations per
    * feature per token) is pure overhead — only the BoS/EoS expansion
    * (toDict's other job) is kept. Spec-gated equal to the dict path
    * (MnbSpec).
    */
  def scoresRaw(feats: Seq[String]): Array[Double] = {
    val n = classes.length
    val s = new Array[Double](n)
    System.arraycopy(logPrior, 0, s, 0, n)
    feats.foreach {
      case "BoS" => addFeat(s, "formPrev=BoS"); addFeat(s, "suf3Prev=BoS")
      case "EoS" => addFeat(s, "formNext=EoS"); addFeat(s, "suf3Next=EoS")
      case f     => addFeat(s, f)
    }
    s
  }

  /** Raw-feature twin of [[predictWithMargin]] (same argmax + margin
    * logic over [[scoresRaw]]).
    */
  def predictWithMarginRaw(feats: Seq[String], reject: String, margin: Double): String = {
    if (classes.isEmpty) return reject
    val s = scoresRaw(feats)
    val rejIdx = classes.indexOf(reject)
    var best = -1
    var i = 0
    while (i < s.length) {
      if (i != rejIdx && (best < 0 || s(i) > s(best))) best = i
      i += 1
    }
    // reject class absent from training (degenerate corpus with no
    // 'none' examples): plain argmax over the SAME raw-string scores —
    // routing through the dict view would collapse duplicate keys
    // (mid=/bef=/aft= keep only the last token) and diverge from the
    // representation the model was trained on
    if (rejIdx < 0) return classes(best)
    if (best >= 0 && s(best) - s(rejIdx) > margin) classes(best) else reject
  }

  def predict(dictFeats: Seq[(String, String)]): String = {
    // empty model (zero training examples): degrade to the all-O floor
    // like the other scorers instead of indexing into an empty array
    if (classes.isEmpty) return "O"
    val s = scores(dictFeats)
    var best = 0
    var i = 1
    while (i < s.length) {
      if (s(i) > s(best)) best = i
      i += 1
    }
    classes(best)
  }

  /** Argmax over classes other than `reject`, emitted only when its
    * log-odds over `reject` exceed `margin`; otherwise `reject`. The
    * precision/recall knob for detect-then-classify tasks (DDI: reject =
    * "none").
    */
  def predictWithMargin(dictFeats: Seq[(String, String)], reject: String, margin: Double): String = {
    if (classes.isEmpty) return reject
    val s = scores(dictFeats)
    val rejIdx = classes.indexOf(reject)
    if (rejIdx < 0) return predict(dictFeats)
    var best = -1
    var i = 0
    while (i < s.length) {
      if (i != rejIdx && (best < 0 || s(i) > s(best))) best = i
      i += 1
    }
    if (best >= 0 && s(best) - s(rejIdx) > margin) classes(best) else reject
  }
}

/** Token tagger backed by broadcast MNB parameters. */
final class MnbScorer(params: MnbParams) extends MentionScorer {
  def tagSentence(toks: IndexedSeq[Tok]): IndexedSeq[String] =
    Features.extractFeatures(toks).map(f => params.predict(Features.toDict(f)))

  /** Margin-gated tags: a non-O tag is kept only when its log-odds over
    * "O" exceed `margin` (precision gate for the hybrid merge). Hot
    * path: raw-feature scoring, no dict materialization.
    */
  def tagSentenceMargin(toks: IndexedSeq[Tok], margin: Double): IndexedSeq[String] =
    Features.extractFeatures(toks).map { f =>
      params.predictWithMarginRaw(f, "O", margin)
    }

  /** Margin-gated tag for ONE position given pre-extracted features —
    * lets HybridScorer skip MNB entirely on gazetteer-claimed positions.
    */
  def tagAtMargin(feats: Seq[String], margin: Double): String =
    params.predictWithMarginRaw(feats, "O", margin)
}

/** Greedy longest-match gazetteer tagger (SURVEY J3).
  *
  * The gazetteer maps lower-cased multi-token surfaces (token forms
  * joined by single spaces) to an entity type. At each position the
  * longest matching n-gram wins; matched tokens get B-type / I-type...,
  * everything else O. `maxN` bounds the n-gram length (longest surface
  * in the gazetteer). Deterministic by construction.
  */
final class GazetteerScorer(gaz: Map[String, String], maxN: Int)
    extends MentionScorer {

  /** First words of multi-word entries + all single-word entries: a
    * position whose (lower-cased) form is not in this set cannot start
    * any match, so the candidate n-gram surfaces are never built — the
    * common case for non-entity tokens.
    */
  private val firstWords: Set[String] =
    gaz.keysIterator.map { k =>
      val sp = k.indexOf(' ')
      if (sp < 0) k else k.substring(0, sp)
    }.toSet

  def tagSentence(toks: IndexedSeq[Tok]): IndexedSeq[String] = {
    val n = toks.length
    val tags = Array.fill(n)("O")
    val lc = new Array[String](n)
    var i = 0
    while (i < n) { lc(i) = toks(i).form.toLowerCase(java.util.Locale.ROOT); i += 1 }
    i = 0
    while (i < n) {
      if (firstWords.contains(lc(i))) {
        var matched = 0
        var mtype = ""
        var len = math.min(maxN, n - i)
        while (len >= 1 && matched == 0) {
          val sb = new java.lang.StringBuilder(lc(i))
          var j = 1
          while (j < len) { sb.append(' ').append(lc(i + j)); j += 1 }
          gaz.get(sb.toString) match {
            case Some(t) => matched = len; mtype = t
            case None    => len -= 1
          }
        }
        if (matched > 0) {
          tags(i) = "B-" + mtype
          var j = 1
          while (j < matched) { tags(i + j) = "I-" + mtype; j += 1 }
          i += matched
        } else i += 1
      } else i += 1
    }
    tags.toIndexedSeq
  }
}

/** Gazetteer-first with a margin-gated MNB merge: gazetteer tags are
  * authoritative where they fire; elsewhere the learned model may open
  * a mention only when its log-odds over O clear `mnbMargin`
  * (`Double.PositiveInfinity` = gazetteer-only). An MNB `I-` is accepted
  * only when it continues a same-type span in the merged tagging, so the
  * merge cannot corrupt the B/I structure the decoder relies on. This is
  * the engine's headline deterministic scorer.
  */
final class HybridScorer(
    gaz: GazetteerScorer,
    mnb: MnbScorer,
    mnbMargin: Double = HybridScorer.DefaultMargin
) extends MentionScorer {
  def tagSentence(toks: IndexedSeq[Tok]): IndexedSeq[String] = {
    val g = gaz.tagSentence(toks)
    if (mnbMargin.isPosInfinity) return g
    // MNB is consulted ONLY where the gazetteer said O (its tags are
    // authoritative elsewhere), so gazetteer-claimed positions skip the
    // feature scoring entirely — all-O sentences still pay extraction
    // once (window features are sentence-local)
    lazy val feats = Features.extractFeatures(toks)
    val out = new Array[String](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) =
        if (g(i) != "O") g(i)
        else {
          val mi = mnb.tagAtMargin(feats(i), mnbMargin)
          if (mi.startsWith("B-")) mi
          else if (mi.startsWith("I-") && i > 0 &&
            (out(i - 1) == "B-" + mi.drop(2) || out(i - 1) == "I-" + mi.drop(2))) mi
          else "O"
        }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

object HybridScorer {
  /** Tuned on the reference devel split (DebugNerMargin); test-split
    * confirmed. See BASELINE.md.
    */
  val DefaultMargin: Double = 4.0
}

object MentionScorer {

  /** Alias registry, mirroring ModelABC auto-registration
    * (ml/src/models/__init__.py:18-39).
    */
  def resolve(
      name: String,
      gaz: => Map[String, String],
      gazMaxN: => Int,
      mnb: => MnbParams,
      crf: => Crf.CrfParams = null
  ): MentionScorer = name.toLowerCase(java.util.Locale.ROOT) match {
    case "custom" | "all_o"              => AllOScorer
    case "gazetteer" | "gaz"             => new GazetteerScorer(gaz, gazMaxN)
    case "mnb" | "multinomial_nb"        => new MnbScorer(mnb)
    case "crf" =>
      val p = crf
      require(p != null, "crf scorer requested but no CrfParams supplied")
      new CrfScorer(p)
    case "hybrid" | "gaz+mnb" | "default" =>
      new HybridScorer(new GazetteerScorer(gaz, gazMaxN), new MnbScorer(mnb))
    case other => throw new IllegalArgumentException(s"unknown scorer: $other")
  }
}
