package graft.ner

import graft.core.{GoldSpan, Tok}
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {

  private def span(s: Int, e: Int, t: String) =
    GoldSpan("e", s, e, t, "x", s"$s-$e")

  test("getTag: B- when token starts at span start and fits") {
    assert(Features.getTag(Tok("warfarin", 0, 7), Seq(span(0, 7, "drug"))) == "B-drug")
  }

  test("getTag: I- when token starts mid-span, even with no preceding B") {
    assert(Features.getTag(Tok("agents", 11, 16), Seq(span(0, 16, "group"))) == "I-group")
  }

  test("getTag: token overhanging span end gets O even when start matches") {
    assert(Features.getTag(Tok("warfarins", 0, 8), Seq(span(0, 7, "drug"))) == "O")
  }

  test("getTag: first matching span wins (document order)") {
    val spans = Seq(span(0, 7, "drug"), span(0, 20, "group"))
    assert(Features.getTag(Tok("warfarin", 0, 7), spans) == "B-drug")
    // only the second span covers this token
    assert(Features.getTag(Tok("therapy", 9, 15), spans) == "I-group")
  }

  test("getTag: no span -> O") {
    assert(Features.getTag(Tok("with", 9, 12), Seq(span(0, 7, "drug"))) == "O")
  }

  test("suf3: last three chars, whole word when short, no lowercasing") {
    assert(Features.suf3("Warfarin") == "rin")
    assert(Features.suf3("ab") == "ab")
    assert(Features.suf3("abc") == "abc")
    assert(Features.suf3("ABCD") == "BCD")
  }

  test("extractFeatures: exact reference feature strings and order") {
    val toks = Vector(Tok("Warfarin", 0, 7), Tok("interacts", 9, 17), Tok(".", 18, 18))
    val f = Features.extractFeatures(toks)
    assert(f(0) == Vector("form=Warfarin", "suf3=rin", "BoS", "formNext=interacts", "suf3Next=cts"))
    assert(f(1) == Vector("form=interacts", "suf3=cts", "formPrev=Warfarin", "suf3Prev=rin", "formNext=.", "suf3Next=."))
    assert(f(2) == Vector("form=.", "suf3=.", "formPrev=interacts", "suf3Prev=cts", "EoS"))
  }

  test("extractFeatures: single-token sentence gets both BoS and EoS") {
    val f = Features.extractFeatures(Vector(Tok("Digoxin", 0, 6)))
    assert(f(0) == Vector("form=Digoxin", "suf3=xin", "BoS", "EoS"))
  }

  test("toDict: BoS/EoS expansion and last-value-wins (MNB dict view)") {
    val d = Features.toDict(Vector("form=a", "form=b", "BoS", "EoS")).toMap
    assert(d("form") == "b")
    assert(d("formPrev") == "BoS" && d("suf3Prev") == "BoS")
    assert(d("formNext") == "EoS" && d("suf3Next") == "EoS")
  }

  test("withGaz: None is identity; Some appends one gaz= BIO feature per token") {
    val toks = graft.core.Tokenize.tokenize("Take oral contraceptives daily.")
    val base = Features.extractFeatures(toks)
    assert(Features.withGaz(base, toks, None) eq base)
    val gaz = new GazetteerScorer(Map("oral contraceptives" -> "group"), 2)
    val aug = Features.withGaz(base, toks, Some(gaz))
    assert(aug.map(_.size) == base.map(_.size + 1))
    val tags = aug.map(_.last)
    val i = toks.indexWhere(_.form == "oral")
    assert(tags(i) == "gaz=B-group" && tags(i + 1) == "gaz=I-group")
    assert(tags.head == "gaz=O")
    // the W1 parity prefix is untouched (D4 TSV contract)
    assert(aug.map(_.init) == base.map(identity))
  }
}
