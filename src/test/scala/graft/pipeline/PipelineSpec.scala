package graft.pipeline

import graft.TestSpark
import graft.fixtures.DocGen
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end run on the deterministic synthetic corpus (FIXTURES.md §4):
  * the BASELINE.json quality gate — NER and DDI P/R >= 0.95 on the
  * reference evaluator contract — plus the sha invariant and triple
  * materialization sanity.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val corpus = DocGen.corpus(spark, 300).cache()
  private lazy val sents = Pipeline.parse(spark, corpus).cache()
  private lazy val train = sents.filter(s => math.abs(s.docId.hashCode) % 4 != 0)
  private lazy val evalSents = sents.filter(s => math.abs(s.docId.hashCode) % 4 == 0).cache()
  private lazy val run = Pipeline.run(spark, train, evalSents, "hybrid")

  test("featureRowsIndexed: idx is emission order even for quote tokens (start = -1)") {
    import spark.implicits._
    // the W3 quirk: both quotes rewrite to ``/'' with start = -1, so
    // (sid, start) hoists them to the sentence front and scrambles
    // their relative order — idx must instead reproduce the exact
    // token emission order the feature chain was built in
    val s = graft.core.ParsedSentence("r", "d", "s0",
      "The \"loading dose\" of warfarin increased .", Nil, Nil)
    val rows = Pipeline.featureRowsIndexed(spark, spark.createDataset(Seq(s)))
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == rows.indices.toSeq, "idx must be dense 0..n-1")
    assert(rows.count(_._2.start == -1) == 2, "both rewritten quotes carry start = -1")
    // the prev/next feature chain agrees with idx order at every token
    // (this is exactly what the kg_feature_rows dump-replay oracle
    // reconstructs with lag/lead OVER (PARTITION BY sid ORDER BY idx))
    rows.indices.foreach { i =>
      val f = rows(i)._2.features
      if (i == 0) assert(f.contains("BoS"), s"token 0: $f")
      else assert(f.contains("formPrev=" + rows(i - 1)._2.form), s"token $i: $f")
      if (i == rows.length - 1) assert(f.contains("EoS"), s"last token: $f")
      else assert(f.contains("formNext=" + rows(i + 1)._2.form), s"token $i: $f")
    }
    // and a (sid, start) sort would NOT: the first start-ordered token
    // is a quote (start -1), whose features say it is mid-sentence
    val byStart = rows.sortBy(_._2.start)
    assert(byStart.head._2.start == -1 && !byStart.head._2.features.contains("BoS"),
      "start-order places a mid-sentence quote token first — the bug idx fixes")
  }

  test("sha256 invariant holds on the generated docs table") {
    assert(Pipeline.checkSha(corpus) == 0L)
    // and the column actually is the sha of content
    val row = corpus.select("content", "content_sha").head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(row.getString(0).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.getString(1) == expect)
  }

  test("corpus parses: sentences, entities, pairs all present") {
    import spark.implicits._
    assert(sents.count() > 500)
    val withEnts = sents.filter(_.entities.nonEmpty).count()
    assert(withEnts > 400)
    assert(sents.flatMap(_.pairs).count() > 100)
  }

  test("NER on synthetic corpus: typed P and R >= 0.95 (BASELINE gate)") {
    val (mentions, _, _) = run
    val rows = Pipeline.evaluateNER(spark, evalSents, mentions)
    val cls = rows.find(_.kind == "CLASS").get
    assert(cls.p >= 0.95, s"NER precision ${cls.p} < 0.95\n${graft.evaluate.Evaluator.statsTable(rows)}")
    assert(cls.r >= 0.95, s"NER recall ${cls.r} < 0.95\n${graft.evaluate.Evaluator.statsTable(rows)}")
  }

  test("DDI on synthetic corpus: typed P and R >= 0.95 (BASELINE gate)") {
    val (_, rels, _) = run
    val rows = Pipeline.evaluateDDI(spark, evalSents, rels)
    val cls = rows.find(_.kind == "CLASS").get
    assert(cls.p >= 0.95, s"DDI precision ${cls.p} < 0.95\n${graft.evaluate.Evaluator.statsTable(rows)}")
    assert(cls.r >= 0.95, s"DDI recall ${cls.r} < 0.95\n${graft.evaluate.Evaluator.statsTable(rows)}")
  }

  test("triples: canonical subjects/objects, evaluator-parity keys intact") {
    val (_, rels, trips) = run
    val t = trips.cache()
    assert(t.count() == rels.count()) // every relation becomes one triple
    val interactionClasses = Set("mechanism", "effect", "advise", "int")
    assert(t.collect().forall(x => interactionClasses.contains(x.interactionPred)))
    // canonicalization lowercases and resolves variants
    assert(t.collect().forall(x => x.drugSubj == x.drugSubj.toLowerCase))
  }

  test("all-O floor: CustomModel-equivalent yields zero mentions (P=R=F1=0)") {
    import spark.implicits._
    val scorerB = spark.sparkContext.broadcast(graft.ner.AllOScorer: graft.ner.MentionScorer)
    val ms = Pipeline.mentions(spark, Pipeline.analyze(spark, evalSents.limit(50), scorerB))
    assert(ms.count() == 0L)
  }

  test("quirk docs survive the full path (parse + tokenize + decode)") {
    import spark.implicits._
    val quirks = Pipeline.parse(
      spark,
      Pipeline.withSha(spark.createDataset(DocGen.quirkDocs).toDF()))
    assert(quirks.count() == 6L) // q2 has two sentences
    // the discontinuous entity kept its raw offset for the evaluator key
    val q0 = quirks.filter(_.sid == "DDI-Synth.q0.s0").head()
    assert(q0.entities.head.rawOffset == "0-3;5-18")
    assert(q0.entities.head.end == 3) // first-span truncation
  }
}
