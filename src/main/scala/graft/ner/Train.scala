package graft.ner

import graft.core.{FeatureRow, GoldSpan, ParsedSentence}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed model fitting (SURVEY A4/A5/J3).
  *
  * Both "models" are closed-form aggregations, so training is exactly one
  * Catalyst hash aggregation each (partial + final, map-side combine for
  * free) followed by a small driver collect + broadcast. Determinism:
  * everything that becomes an index or a tie-break is sorted first —
  * unlike the reference's Python-set iteration order (nn/codemaps.py:36-60,
  * SURVEY A4).
  */
object Train {

  /** Fit MNB from (bag-of-features, label) examples: one
    * groupBy((feature,label)).count(). Features count with multiplicity
    * (multinomial). `minFreq` prunes features seen fewer than that many
    * times — the scale knob for web-scale vocabularies (the reference's
    * crfsuite config uses feature.minfreq=1, i.e. keep all; default
    * matches).
    */
  def fitMnbRaw(
      spark: SparkSession,
      examples: Dataset[(Seq[String], String)],
      minFreq: Long = 1L
  ): MnbParams = {
    import spark.implicits._

    // two actions (feature counts + class counts) read `examples`; the
    // checkpoint stops the upstream tokenize/featurize lineage running
    // twice per fit (tokenization is ~half the pass cost)
    val ex = examples.localCheckpoint()
    val pairs = ex
      .flatMap { case (fs, label) => fs.map(f => (f, label)) }
      .toDF("feat", "tag")

    val counts = pairs
      .groupBy($"feat", $"tag")
      .agg(count(lit(1)).as("c"))
      .groupBy($"feat")
      .agg(
        sum($"c").as("featTotal"),
        collect_list(struct($"tag", $"c")).as("perTag")
      )
      .filter($"featTotal" >= minFreq)
      .collect()

    val classCounts = ex
      .map(_._2)
      .toDF("tag")
      .groupBy($"tag")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)

    val classes = classCounts.map(_._1)
    val idx = classes.zipWithIndex.toMap
    val nTotal = classCounts.map(_._2).sum.toDouble
    val logPrior = classCounts.map { case (_, n) => math.log(n / nTotal) }

    // total feature-occurrence mass per class (sum over all features of
    // count(f,c)) — with one-hot dict features this is (#dict entries)
    // summed over tokens of class c
    val totalPerClass = new Array[Double](classes.length)
    counts.foreach { r =>
      r.getSeq[org.apache.spark.sql.Row](2).foreach { tc =>
        totalPerClass(idx(tc.getString(0))) += tc.getLong(1).toDouble
      }
    }
    val vocabSize = counts.length.toDouble
    val defaultLog = totalPerClass.map(t => math.log(1.0 / (t + vocabSize)))

    val featLogProb = counts.map { r =>
      val feat = r.getString(0)
      val lp = defaultLog.clone()
      r.getSeq[org.apache.spark.sql.Row](2).foreach { tc =>
        val i = idx(tc.getString(0))
        lp(i) = math.log((tc.getLong(1) + 1.0) / (totalPerClass(i) + vocabSize))
      }
      feat -> lp
    }.toMap

    MnbParams(classes, logPrior, featLogProb, defaultLog)
  }

  /** NER token-tagging fit: the DictVectorizer view of each token's
    * features — one-hot per dict key, last value per key wins
    * (ml/src/models/multinomial_nb.py:61-73) — then the shared MNB core.
    */
  def fitMnb(
      spark: SparkSession,
      rows: Dataset[FeatureRow],
      minFreq: Long = 1L
  ): MnbParams = {
    import spark.implicits._
    fitMnbRaw(
      spark,
      rows.map(r => (Features.toDict(r.features).map { case (k, v) => k + "=" + v }, r.tag)),
      minFreq
    )
  }

  /** Derive the gazetteer from training gold entities (SURVEY J3):
    * lower-cased surface -> majority type; ties broken by (count desc,
    * type asc) so the result is deterministic. Surfaces are the gold
    * `text` attributes re-joined through the tokenizer's forms would be
    * ideal, but the raw lowercased text matches how mentions are decoded
    * (space-joined forms) for all single-space surfaces; multi-space /
    * rewritten surfaces simply never fire.
    */
  def buildGazetteer(
      spark: SparkSession,
      sents: Dataset[ParsedSentence]
  ): (Map[String, String], Int) = {
    import spark.implicits._
    val surfaces = sents
      .flatMap(s => s.entities.map(e => (e.text.toLowerCase(java.util.Locale.ROOT), e.etype)))
      .toDF("surface", "etype")
      .groupBy($"surface", $"etype")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val gaz = surfaces
      .groupBy(_._1)
      .map { case (surface, variants) =>
        val best = variants.minBy { case (_, t, c) => (-c, t) }
        surface -> best._2
      }
    val maxN =
      if (gaz.isEmpty) 1
      else gaz.keys.map(_.count(_ == ' ') + 1).max
    (gaz, maxN)
  }

  /** Per-sentence ordered token streams: (sid, [(features, tag)...] in
    * TOKEN order). Ordering must happen at sentence granularity — sids
    * are unique, while no FeatureRow-level sort key is total (quote
    * tokens all carry start = -1 after the W3 offset quirk, so a
    * (sid, start) sort both scrambles their relative order run-to-run
    * and hoists them out of sentence position).
    */
  private def sentStreams(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      gazFeat: Option[GazetteerScorer] = None
  ): Dataset[(String, Seq[(Seq[String], String)])] = {
    import spark.implicits._
    sents.map { s =>
      val toks = graft.core.Tokenize.tokenize(s.text)
      val feats = Features.withGaz(Features.extractFeatures(toks), toks, gazFeat)
      (s.sid, toks.indices.map(i =>
        (feats(i): Seq[String], Features.getTag(toks(i), s.entities))): Seq[(Seq[String], String)])
    }
  }

  /** CRF fit (reference A6): collect the training token stream in
    * deterministic sentence order (unique sids; tokens stay in sentence
    * position) — bounded by the TRAINING corpus, never the scoring
    * corpus — and run the driver-side l2sgd fit with the reference's
    * 100-token pseudo-sequence chunking (CRF.py:28-29).
    */
  def fitCrf(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      c2: Double = 0.1,
      epochs: Int = 30,
      gazFeat: Option[GazetteerScorer] = None
  ): Crf.CrfParams = {
    val stream = sentStreams(spark, sents, gazFeat)
      .collect()
      .sortBy(_._1)
      .flatMap(_._2)
      .toSeq
    Crf.fitTokenStream(stream, c2, epochs)
  }

  /** Distributed CRF fit for training corpora too large to collect:
    * partition-local l2sgd (each range partition fits on its own
    * document-contiguous chunk, sorted (sid, start) — pseudo-sequences
    * never span executors) followed by parameter averaging on the
    * driver. The averaged model trades a little accuracy for unbounded
    * training-set scale; measured on the reference corpus in BASELINE.md.
    * Determinism caveat: range-partition boundaries come from sampling
    * seeded by RDD id, so the result is reproducible for a fixed program
    * (same session, same job order) but NOT across different call
    * orderings — the driver-side fitCrf is the fully-deterministic path.
    */
  /** `rounds > 1` = iterative parameter mixing (McDonald et al. 2010,
    * the full recipe, not just one-shot averaging): each round warm-
    * starts every partition's l2sgd from the previous round's averaged
    * weights and runs `epochs / rounds` local epochs, so total epoch
    * work matches the single-shot arm at any `rounds`. One broadcast +
    * one tiny collect per round; the partitioned token stream is
    * computed once and persisted across rounds. `rounds = 1` is the
    * original one-shot average.
    */
  def fitCrfDistributed(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      c2: Double = 0.1,
      epochs: Int = 30,
      parts: Int = 8,
      rounds: Int = 1
  ): Crf.CrfParams = {
    require(rounds >= 1 && epochs % rounds == 0,
      s"epochs ($epochs) must be a positive multiple of rounds ($rounds) " +
        "so total epoch work matches the single-shot arm exactly")
    implicit val enc: org.apache.spark.sql.Encoder[Crf.CrfParams] =
      org.apache.spark.sql.Encoders.kryo[Crf.CrfParams]
    val streams = sentStreams(spark, sents)
      .repartitionByRange(parts, col("_1"))
      .sortWithinPartitions(col("_1"))
      .persist()
    try {
      val perRound = epochs / rounds
      var cur: Option[Crf.CrfParams] = None
      for (_ <- 0 until rounds) {
        val bc = spark.sparkContext.broadcast(cur)
        val locals = streams
          .mapPartitions { it =>
            val stream = it.flatMap(_._2).toVector
            if (stream.isEmpty) Iterator.empty
            else Iterator.single(Crf.fitTokenStream(stream, c2, perRound, init = bc.value))
          }
          .collect()
        cur = Some(Crf.average(scala.collection.immutable.ArraySeq.unsafeWrapArray(locals)))
        bc.destroy()
      }
      cur.getOrElse(Crf.fit(IndexedSeq.empty))
    } finally streams.unpersist()
  }

  /** Gold spans -> reference-tag oracle (used for round-trip parity and
    * as the training-label producer).
    */
  def goldTags(toks: IndexedSeq[graft.core.Tok], spans: Seq[GoldSpan]): IndexedSeq[String] =
    toks.map(t => Features.getTag(t, spans))
}
