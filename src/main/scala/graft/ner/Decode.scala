package graft.ner

import graft.core.{Mention, TaggedTok}
import scala.collection.mutable.ArrayBuffer

/** BIO → mention decoding (W2): the stateful fold of
  * ml/src/predictions.py:4-26 with every quirk intact:
  *
  *   - `B-x` opens an entity (form, start, type = tag.drop(2)); if one was
  *     already open it is SILENTLY DROPPED (no emit before reset);
  *   - `I-*` while inside appends `" " + form` and extends the end — the
  *     type of the opening B is kept, I-type mismatches ignored;
  *   - `I-*` with no open entity is ignored;
  *   - `O` while inside emits and closes;
  *   - an entity still open at end-of-sentence is emitted after the loop;
  *   - emitted text is token forms joined by single spaces (which may
  *     differ from the original substring's spacing).
  *
  * Pure per-sentence function — runs inside the shuffle-free
  * parse→tokenize→tag→score→decode `mapPartitions` chain.
  */
object Decode {

  def decode(sid: String, toks: Seq[TaggedTok]): Vector[Mention] = {
    val out = ArrayBuffer.empty[Mention]
    var inside = false
    var form = ""
    var start = 0
    var end = 0
    var etype = ""
    toks.foreach { t =>
      val y = t.tag
      if (y.nonEmpty && y.charAt(0) == 'B') {
        form = t.form; start = t.start; end = t.end; etype = y.drop(2)
        inside = true
      } else if (y.nonEmpty && y.charAt(0) == 'I' && inside) {
        form += " " + t.form
        end = t.end
      } else if (y == "O" && inside) {
        out += Mention(sid, start, end, form, etype)
        inside = false
      }
    }
    if (inside) out += Mention(sid, start, end, form, etype)
    out.toVector
  }

  /** Reference output-line format: sid|start-end|text|type
    * (ml/src/predictions.py:22,26).
    */
  def formatLine(m: Mention): String =
    s"${m.sid}|${m.start}-${m.end}|${m.text}|${m.etype}"
}
