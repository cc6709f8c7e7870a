package graft.pipeline

import graft.core._
import graft.ddi.Relations
import graft.evaluate.Evaluator
import graft.kg.{Canonicalize, Triples}
import graft.ner._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-sentence analysis result — everything the narrow pass computes. */
final case class SentenceAnalysis(
    repo: String,
    docId: String,
    sid: String,
    toks: Seq[TaggedTok],
    mentions: Seq[Mention]
)

/** The end-to-end KG-construction pipeline (SURVEY §3 E1 recast).
  *
  * The reference runs extract → train → predict → evaluate as separate
  * OS processes glued by text files; here the whole NER path is ONE
  * narrow Spark pipeline — scan → parse → tokenize → tag → featurize →
  * score → decode never shuffles (documents are independent), so it
  * scales linearly with executors. Shuffles exist only where semantics
  * demand them: model fitting (one hash agg), canonicalization (CC), the
  * evaluation joins, and the final partitioned write.
  */
object Pipeline {

  /** Attach the per-row content sha256 invariant (BASELINE.json):
    * computed at ingest, re-checked at every materialization boundary.
    */
  def withSha(docs: DataFrame): DataFrame =
    docs.withColumn("content_sha", sha2(col("content"), 256))

  /** Verify the sha invariant on a materialized docs table; returns the
    * number of violating rows (0 = intact).
    */
  def checkSha(docs: DataFrame): Long =
    docs.filter(sha2(col("content"), 256) =!= col("content_sha")).count()

  /** Parse the docs table into sentences. Narrow: mapPartitions over
    * (repo, content); column pruning pushes the 2-column projection into
    * the parquet/Iceberg scan.
    */
  def parse(spark: SparkSession, docs: DataFrame): Dataset[ParsedSentence] = {
    import spark.implicits._
    docs
      .select(col("repo"), col("content"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (repo, content) =>
        XmlParse.parseDoc(repo, content)
      })
  }

  /** Reference-format feature rows (D4) — the `extract-features.py`
    * stage output, kept nested per sentence.
    */
  def featureRows(spark: SparkSession, sents: Dataset[ParsedSentence]): Dataset[FeatureRow] = {
    import spark.implicits._
    sents.flatMap { s =>
      val toks = Tokenize.tokenize(s.text)
      val feats = Features.extractFeatures(toks)
      toks.indices.map { i =>
        val t = toks(i)
        FeatureRow(s.sid, t.form, t.start, t.end, Features.getTag(t, s.entities), feats(i))
      }
    }
  }

  /** The fused narrow pass: tokenize, score with the broadcast model,
    * decode mentions. One `flatMap`-shaped stage, zero shuffle.
    */
  def analyze(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      scorer: Broadcast[MentionScorer]
  ): Dataset[SentenceAnalysis] = {
    import spark.implicits._
    sents.mapPartitions { it =>
      val sc = scorer.value
      it.map { s =>
        val toks = Tokenize.tokenize(s.text)
        val feats = Features.extractFeatures(toks)
        val tags = sc.tagSentence(toks, feats)
        val tagged = toks.indices.map(i => TaggedTok(toks(i).form, toks(i).start, toks(i).end, tags(i)))
        SentenceAnalysis(s.repo, s.docId, s.sid, tagged, Decode.decode(s.sid, tagged))
      }
    }
  }

  def mentions(spark: SparkSession, analyzed: Dataset[SentenceAnalysis]): Dataset[Mention] = {
    import spark.implicits._
    analyzed.flatMap(_.mentions)
  }

  // ---- evaluation (E3 contract) --------------------------------------

  /** Gold NER instances: einfo = sid|charOffset|text (RAW charOffset
    * attr, semicolons included — ml/evaluator.py:40), etype = type.
    */
  def goldNer(spark: SparkSession, sents: Dataset[ParsedSentence]): Dataset[(String, String)] = {
    import spark.implicits._
    sents.flatMap(s => s.entities.map(e => (s"${s.sid}|${e.rawOffset}|${e.text}", e.etype)))
  }

  /** Predicted NER instances from mentions: einfo = sid|start-end|text. */
  def predNer(spark: SparkSession, ms: Dataset[Mention]): Dataset[(String, String)] = {
    import spark.implicits._
    ms.map(m => (s"${m.sid}|${m.start}-${m.end}|${m.text}", m.etype))
  }

  /** Gold DDI instances: einfo = sid|e1|e2 for ddi="true" pairs. */
  def goldDdi(spark: SparkSession, sents: Dataset[ParsedSentence]): Dataset[(String, String)] = {
    import spark.implicits._
    sents.flatMap(s =>
      s.pairs.filter(_.ddi).map(p => (s"${s.sid}|${p.e1}|${p.e2}", p.dtype.getOrElse("")))
    )
  }

  def predDdi(spark: SparkSession, rels: Dataset[Relation]): Dataset[(String, String)] = {
    import spark.implicits._
    rels.map(r => (s"${r.sid}|${r.e1}|${r.e2}", r.dtype))
  }

  def evaluateNER(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      ms: Dataset[Mention]
  ): Seq[EvalRow] =
    Evaluator.evalRows(spark, goldNer(spark, sents), predNer(spark, ms))

  def evaluateDDI(
      spark: SparkSession,
      sents: Dataset[ParsedSentence],
      rels: Dataset[Relation]
  ): Seq[EvalRow] =
    Evaluator.evalRows(spark, goldDdi(spark, sents), predDdi(spark, rels))

  // ---- full run -------------------------------------------------------

  /** Train NER + DDI models on `train`, run the fused pass + relation
    * extraction + canonicalization + triple materialization on `eval`.
    * Returns (mentions, relations, triples).
    */
  def run(
      spark: SparkSession,
      train: Dataset[ParsedSentence],
      eval: Dataset[ParsedSentence],
      scorerName: String = "hybrid",
      mnbMinFreq: Long = 1L
  ): (Dataset[Mention], Dataset[Relation], Dataset[Triple]) = {
    import spark.implicits._
    val (gaz, gazN) = Train.buildGazetteer(spark, train)
    lazy val nerParams = Train.fitMnb(spark, featureRows(spark, train), mnbMinFreq)
    val scorer = MentionScorer.resolve(scorerName, gaz, gazN, nerParams)
    val scorerB = spark.sparkContext.broadcast(scorer)

    val ddiParams = spark.sparkContext.broadcast(Relations.fit(spark, train, mnbMinFreq))

    val analyzed = analyze(spark, eval, scorerB)
    val ms = mentions(spark, analyzed)
    val rels = Relations.predict(spark, eval, ddiParams)

    val surfaces = eval.flatMap(s => s.entities.map(_.text))
    val canon = Canonicalize
      .canonicalMap(spark, surfaces)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    val trips = Triples.materialize(spark, eval, rels, canon)
    (ms, rels, trips)
  }
}
