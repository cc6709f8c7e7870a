package graft.ner

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the linear-chain CRF (reference A6, ml/src/models/CRF.py):
  * transition learning (the capability MNB lacks), the 100-token
  * pseudo-sequence chunking quirk, and decode determinism.
  */
class CrfSpec extends AnyFunSuite {

  private def seq(pairs: (String, String)*) =
    (pairs.map(p => Seq("f=" + p._1): Seq[String]).toIndexedSeq,
      pairs.map(_._2).toIndexedSeq)

  test("transitions disambiguate a state-ambiguous token (what MNB cannot do)") {
    // token 'b' has IDENTICAL state features in both contexts; only the
    // previous label decides: after B-drug it is I-drug, after O it is O
    val train = IndexedSeq(
      seq("a" -> "B-drug", "b" -> "I-drug"),
      seq("c" -> "O", "b" -> "O"),
      seq("a" -> "B-drug", "b" -> "I-drug"),
      seq("c" -> "O", "b" -> "O")
    )
    val params = Crf.fit(train, c2 = 0.1, epochs = 50)
    assert(Crf.viterbi(params, IndexedSeq(Seq("f=a"), Seq("f=b"))) ==
      IndexedSeq("B-drug", "I-drug"))
    assert(Crf.viterbi(params, IndexedSeq(Seq("f=c"), Seq("f=b"))) ==
      IndexedSeq("O", "O"))
  }

  test("fitTokenStream chunks the flat stream into 100-token pseudo-sequences") {
    // 250 tokens -> chunks of 100/100/50 (CRF.py:28-29 batched(xseq, 100));
    // verified through the learned transition: 'y' ALWAYS follows 'x' in
    // the stream, so if chunking preserved the stream order the model
    // tags ...x y... correctly even though 'y' alone is ambiguous
    val stream = (0 until 125).flatMap { _ =>
      Seq((Seq("f=x"): Seq[String]) -> "B-drug", (Seq("f=y"): Seq[String]) -> "I-drug")
    }
    val params = Crf.fitTokenStream(stream, epochs = 20)
    val out = Crf.viterbi(params, IndexedSeq(Seq("f=x"), Seq("f=y")))
    assert(out == IndexedSeq("B-drug", "I-drug"))
  }

  test("viterbi: unseen features are ignored; empty sentence yields empty tags") {
    val params = Crf.fit(IndexedSeq(seq("a" -> "B-drug", "b" -> "I-drug")), epochs = 10)
    val out = Crf.viterbi(params, IndexedSeq(Seq("f=a", "f=NEVER_SEEN"), Seq("f=b")))
    assert(out == IndexedSeq("B-drug", "I-drug"))
    assert(Crf.viterbi(params, IndexedSeq.empty).isEmpty)
  }

  test("parameter averaging: single-model average is the identity; distributed fit learns transitions") {
    val p = Crf.fit(IndexedSeq(seq("a" -> "B-drug", "b" -> "I-drug")), epochs = 10)
    val avg1 = Crf.average(Seq(p))
    assert(avg1.labels.toSeq == p.labels.toSeq)
    assert(avg1.trans.flatten.toSeq == p.trans.flatten.toSeq)
    assert(p.state.forall { case (f, w) => avg1.state(f).toSeq == w.toSeq })

    val spark = graft.TestSpark.spark
    import spark.implicits._
    // the tagging task replicated across many sids so both range
    // partitions get full copies of the pattern; sentence "aa bb cc bb"
    // with gold span over "aa bb" -> tags B-drug I-drug O O
    val sents = (0 until 40).map { d =>
      graft.core.ParsedSentence("r", s"d$d", f"s$d%03d", "aa bb cc bb",
        Seq(graft.core.GoldSpan("e0", 0, 4, "drug", "aa bb", "0-4")), Nil)
    }
    val dist = Train.fitCrfDistributed(spark, spark.createDataset(sents), epochs = 30, parts = 2)
    val toks = graft.core.Tokenize.tokenize("aa bb cc bb")
    val tags = Crf.viterbi(dist, Features.extractFeatures(toks))
    assert(tags == IndexedSeq("B-drug", "I-drug", "O", "O"), s"got $tags")
    // and it matches the driver-side fit on the same input
    val local = Train.fitCrf(spark, spark.createDataset(sents), epochs = 30)
    assert(Crf.viterbi(local, Features.extractFeatures(toks)) == tags)
  }

  test("fit init warm-start: init-only features survive (scaled only by L2 decay)") {
    val seqs = IndexedSeq(
      (IndexedSeq[Seq[String]](Seq("f=a"), Seq("f=b")), IndexedSeq("B-drug", "O")))
    val base = Crf.fit(seqs, epochs = 5)
    val ghost = "f=ghost"
    val seeded = base.copy(state =
      base.state + (ghost -> Array.fill(base.labels.length)(0.25)))
    val warm = Crf.fit(seqs, epochs = 1, init = Some(seeded))
    // the ghost feature is never touched by the data, so only the
    // global L2 scale moves it: same sign, strictly between 0 and init
    val g = warm.state(ghost)
    assert(g.forall(v => v > 0.0 && v <= 0.25), g.toSeq.toString)
    // labels are the union (identical here), sorted
    assert(warm.labels.toSeq == base.labels.toSeq)
  }

  test("fitCrfDistributed with mixing rounds solves the toy task (IPM path)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sents = (0 until 40).map { d =>
      graft.core.ParsedSentence("r", s"d$d", f"s$d%03d", "aa bb cc bb",
        Seq(graft.core.GoldSpan("e0", 0, 4, "drug", "aa bb", "0-4")), Nil)
    }
    val ipm = Train.fitCrfDistributed(
      spark, spark.createDataset(sents), epochs = 30, parts = 2, rounds = 3)
    val toks = graft.core.Tokenize.tokenize("aa bb cc bb")
    val tags = Crf.viterbi(ipm, Features.extractFeatures(toks))
    assert(tags == IndexedSeq("B-drug", "I-drug", "O", "O"), s"got $tags")
  }

  test("fit rejects c2 <= 0 (step size would be NaN and weights silently NaN)") {
    val seqs = IndexedSeq((IndexedSeq(Seq("f=x")), IndexedSeq("O")))
    intercept[IllegalArgumentException](Crf.fit(seqs, c2 = 0.0))
    intercept[IllegalArgumentException](Crf.fit(seqs, c2 = -1.0))
  }

  test("CrfScorer resolves via the registry and tags a real tokenized sentence") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sents = spark.createDataset(Seq(
      graft.core.ParsedSentence("r", "d", "s0", "Warfarin interacts with aspirin.",
        Seq(
          graft.core.GoldSpan("e0", 0, 7, "drug", "Warfarin", "0-7"),
          graft.core.GoldSpan("e1", 24, 30, "drug", "aspirin", "24-30")),
        Nil),
      graft.core.ParsedSentence("r", "d", "s1", "Warfarin interacts with aspirin.",
        Seq(
          graft.core.GoldSpan("e0", 0, 7, "drug", "Warfarin", "0-7"),
          graft.core.GoldSpan("e1", 24, 30, "drug", "aspirin", "24-30")),
        Nil)
    ))
    val params = Train.fitCrf(spark, sents, epochs = 40)
    val scorer = MentionScorer.resolve("crf", Map.empty, 1, null, params)
    val toks = graft.core.Tokenize.tokenize("Warfarin interacts with aspirin.")
    val tags = scorer.tagSentence(toks)
    assert(tags(toks.indexWhere(_.form == "Warfarin")) == "B-drug")
    assert(tags(toks.indexWhere(_.form == "aspirin")) == "B-drug")
    assert(tags(toks.indexWhere(_.form == "interacts")) == "O")
  }
}
