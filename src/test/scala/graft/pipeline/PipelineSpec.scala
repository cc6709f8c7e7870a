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
