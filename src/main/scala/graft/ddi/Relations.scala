package graft.ddi

import graft.core.{GoldSpan, ParsedSentence, Relation, Tok}
import graft.ner.{MnbParams, Train}
import graft.core.Tokenize
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** DDI relation extraction over the 4 SemEval-2013 interaction classes
  * {mechanism, effect, advise, int} + implicit "none".
  *
  * The reference snapshot ships only the evaluator CONTRACT for this
  * stage (ml/evaluator.py:50-76: key = sid|e1|e2, class = pair type for
  * ddi="true" pairs); the classifier itself is ours. Design: the same
  * closed-form Multinomial NB used for NER (SURVEY A5), over deterministic
  * lexical features of the token window between/around the two entities —
  * fully reproducible, trained with one hash aggregation, broadcast for
  * scoring.
  *
  * Candidates are the sentence's `<pair>` elements (entity spans are
  * given input annotations in the DDI task; the evaluator keys on their
  * ids, so candidate generation from raw text could never match keys).
  */
object Relations {

  final case class PairExample(
      repo: String,
      sid: String,
      e1: String,
      e2: String,
      feats: Seq[String],
      label: String
  )

  /** Count bucket for the inter-entity token distance. */
  private def distBucket(n: Int): String =
    if (n == 0) "0" else if (n <= 3) "1-3" else if (n <= 7) "4-7" else "8+"

  /** Deterministic lexical features for one candidate pair. Tokens are
    * the sentence's reference tokenization; e1/e2 located by first-span
    * char offsets.
    */
  private val NegCues = Set("not", "no", "neither", "nor", "without", "lack", "absence")

  def pairFeatures(
      toks: IndexedSeq[Tok],
      e1: GoldSpan,
      e2: GoldSpan,
      otherEnts: Seq[GoldSpan] = Nil
  ): Seq[String] = {
    val (lo, hi) = if (e1.start <= e2.start) (e1, e2) else (e2, e1)
    val mid = toks.filter(t => t.start > lo.end && t.end < hi.start)
    val before = toks.filter(_.end < lo.start).takeRight(2)
    val after = toks.filter(_.start > hi.end).take(2)
    // feature ablations tried (DebugDdi, devel typed F1): mid bigrams
    // and entity-surface lexemes both OVERFIT (train R 0.90 from
    // memorization, devel F1 0.384 -> 0.362); unigram windows + the
    // structural cues below are the best deterministic set found
    val b = Vector.newBuilder[String]
    mid.foreach(t => b += ("mid=" + t.form.toLowerCase(java.util.Locale.ROOT)))
    before.foreach(t => b += ("bef=" + t.form.toLowerCase(java.util.Locale.ROOT)))
    after.foreach(t => b += ("aft=" + t.form.toLowerCase(java.util.Locale.ROOT)))
    b += ("ndist=" + distBucket(mid.length))
    b += ("e1t=" + lo.etype)
    b += ("e2t=" + hi.etype)
    // negation between the entities flips/voids most interaction cues
    if (mid.exists(t => NegCues.contains(t.form.toLowerCase(java.util.Locale.ROOT)))) b += "neg=1"
    // other annotated entities strictly between the pair — enumeration
    // sentences ("A, B, C and D were given") produce many false pairs
    val nBetween = otherEnts.count(o =>
      o.entityId != lo.entityId && o.entityId != hi.entityId &&
        o.start > lo.end && o.end < hi.start)
    b += ("nents=" + distBucket(nBetween))
    // pair order in text often encodes agent vs patient
    if (e1.start > e2.start) b += "inv=1"
    b.result()
  }

  /** All labeled pair examples of a corpus (label = pair type, or "none"
    * for ddi="false"). Tokenization happens here, per sentence, inside
    * the flatMap — shuffle-free.
    */
  def examples(
      spark: SparkSession,
      sents: Dataset[ParsedSentence]
  ): Dataset[PairExample] = {
    import spark.implicits._
    sents.flatMap { s =>
      if (s.pairs.isEmpty) Iterator.empty
      else {
        val toks = Tokenize.tokenize(s.text)
        val byId = s.entities.map(e => e.entityId -> e).toMap
        s.pairs.iterator.flatMap { p =>
          for (e1 <- byId.get(p.e1); e2 <- byId.get(p.e2)) yield PairExample(
            s.repo,
            s.sid,
            p.e1,
            p.e2,
            pairFeatures(toks, e1, e2, s.entities),
            // typeless ddi="true" (0 in the reference corpus, legal in
            // the schema) trains toward "" — the SAME label goldDdi keys
            // such a pair with, so prediction and gold can actually meet
            p.dtype.getOrElse(if (p.ddi) "" else "none")
          )
        }
      }
    }
  }

  /** Fit the DDI classifier: shared MNB core over pair features. */
  def fit(spark: SparkSession, sents: Dataset[ParsedSentence], minFreq: Long = 1L): MnbParams = {
    import spark.implicits._
    Train.fitMnbRaw(spark, examples(spark, sents).map(e => (e.feats, e.label)), minFreq)
  }

  /** Score candidate pairs; keep predicted interactions (label != none).
    * MnbParams.predict sums log-likelihood per raw feature occurrence —
    * multinomial bag semantics.
    */
  /** Default decision margin (log-odds over "none"), tuned by maximizing
    * typed F1 on the TRAINING split (no eval leakage) — see
    * tools/DebugDdi. 0 = plain argmax.
    */
  val DefaultMargin: Double = 2.0

  def predict(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      params: Broadcast[MnbParams],
      margin: Double = DefaultMargin
  ): Dataset[Relation] = {
    import spark.implicits._
    examples(spark, sents)
      .map { e =>
        // raw-feature hot path: pairFeatures emits the exact "k=v"
        // strings the model was trained on (no BoS/EoS expansion needed)
        // — the split-then-reconcat round trip was pure allocation
        Relation(e.sid, e.e1, e.e2,
          params.value.predictWithMarginRaw(e.feats, "none", margin))
      }
      .filter(_.dtype != "none")
  }
}
