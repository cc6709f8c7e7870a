package graft.ner

import graft.core.{Mention, TaggedTok}
import org.scalatest.funsuite.AnyFunSuite

class DecodeSpec extends AnyFunSuite {

  private def tt(form: String, s: Int, e: Int, tag: String) = TaggedTok(form, s, e, tag)

  test("simple B O sequence emits on the O") {
    val m = Decode.decode("s", Seq(tt("warfarin", 0, 7, "B-drug"), tt("helps", 9, 13, "O")))
    assert(m == Vector(Mention("s", 0, 7, "warfarin", "drug")))
  }

  test("B I I extends end, text is space-joined forms") {
    val m = Decode.decode("s", Seq(
      tt("calcium", 0, 6, "B-group"),
      tt("channel", 8, 14, "I-group"),
      tt("blockers", 16, 23, "I-group"),
      tt(".", 24, 24, "O")))
    assert(m == Vector(Mention("s", 0, 23, "calcium channel blockers", "group")))
  }

  test("entity open at end of sentence is flushed (EOS quirk)") {
    val m = Decode.decode("s", Seq(tt("a", 0, 0, "O"), tt("digoxin", 2, 8, "B-drug")))
    assert(m == Vector(Mention("s", 2, 8, "digoxin", "drug")))
  }

  test("B immediately after open entity silently drops the first (B-after-B quirk)") {
    val m = Decode.decode("s", Seq(
      tt("warfarin", 0, 7, "B-drug"),
      tt("aspirin", 9, 15, "B-brand"),
      tt(".", 16, 16, "O")))
    assert(m == Vector(Mention("s", 9, 15, "aspirin", "brand")))
  }

  test("I without open entity is ignored (I-without-B quirk)") {
    val m = Decode.decode("s", Seq(tt("agents", 0, 5, "I-group"), tt("x", 7, 7, "O")))
    assert(m.isEmpty)
  }

  test("I-type mismatch ignored: opening B's type is kept") {
    val m = Decode.decode("s", Seq(
      tt("beta", 0, 3, "B-group"),
      tt("blockers", 5, 12, "I-drug"),
      tt(".", 13, 13, "O")))
    assert(m == Vector(Mention("s", 0, 12, "beta blockers", "group")))
  }

  test("all O yields nothing (CustomModel floor)") {
    assert(Decode.decode("s", Seq(tt("a", 0, 0, "O"), tt("b", 2, 2, "O"))).isEmpty)
  }

  test("formatLine matches the reference sid|start-end|text|type format") {
    assert(Decode.formatLine(Mention("D.d0.s0", 0, 7, "Warfarin", "drug")) ==
      "D.d0.s0|0-7|Warfarin|drug")
  }

  test("space-joined text may differ from original substring spacing") {
    // original had a double space; decode joins forms with ONE space
    val m = Decode.decode("s", Seq(
      tt("beta", 16, 19, "B-group"),
      tt("blockers", 22, 29, "I-group"),
      tt("need", 31, 34, "O")))
    assert(m.head.text == "beta blockers")
    assert(m.head.start == 16 && m.head.end == 29)
  }
}
