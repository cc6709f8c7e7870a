package graft.ner

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ModelStoreSpec extends AnyFunSuite {

  private val params = MnbParams(
    classes = Array("B-drug", "O"),
    logPrior = Array(math.log(0.25), math.log(0.75)),
    featLogProb = Map(
      "form=warfarin" -> Array(math.log(0.4), math.log(0.01)),
      "suf3=rin" -> Array(math.log(0.3), math.log(0.05))
    ),
    defaultLog = Array(math.log(0.001), math.log(0.002))
  )

  test("MNB params round-trip exactly (bit-preserving doubles)") {
    val p = Files.createTempDirectory("ms").resolve("m.mnb").toString
    ModelStore.saveMnb(params, p)
    val back = ModelStore.loadMnb(p)
    assert(back.classes.toSeq == params.classes.toSeq)
    assert(back.logPrior.toSeq == params.logPrior.toSeq)
    assert(back.defaultLog.toSeq == params.defaultLog.toSeq)
    assert(back.featLogProb.keySet == params.featLogProb.keySet)
    params.featLogProb.foreach { case (k, v) =>
      assert(back.featLogProb(k).toSeq == v.toSeq)
    }
    // behavioral equality
    assert(back.predict(Seq(("form", "warfarin"))) == params.predict(Seq(("form", "warfarin"))))
  }

  test("gazetteer round-trip and registry-style inference load") {
    val dir = Files.createTempDirectory("ms")
    val gp = dir.resolve("g.gaz").toString
    val mp = dir.resolve("m.mnb").toString
    val gaz = Map("warfarin" -> "drug", "beta blockers" -> "group")
    ModelStore.saveGazetteer(gaz, gp)
    ModelStore.saveMnb(params, mp)
    assert(ModelStore.load(gp) == Left(gaz))
    assert(ModelStore.load(mp).isRight)
    assertThrows[IllegalArgumentException] {
      val bad = dir.resolve("bad.txt").toString
      Files.writeString(java.nio.file.Paths.get(bad), "garbage\n")
      ModelStore.load(bad)
    }
  }

  test("surfaces with tabs/newlines/backslashes round-trip (untrusted XML text)") {
    val dir = Files.createTempDirectory("ms")
    val gp = dir.resolve("weird.gaz").toString
    val gaz = Map(
      "tab\there" -> "drug",
      "new\nline" -> "group",
      "back\\slash" -> "brand",
      "plain" -> "drug_n")
    ModelStore.saveGazetteer(gaz, gp)
    assert(ModelStore.loadGazetteer(gp) == gaz)
  }
}
