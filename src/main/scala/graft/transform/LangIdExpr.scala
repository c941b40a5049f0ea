package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-ID heuristic as ONE codegen'd scan — semantically identical to
  * the reference scorer `TextOps.langIdOf` (lowercase, split on `\s+`,
  * count marker-word hits per language, argmax in sorted-language order,
  * strict `>` so the first maximum wins, "und" when nothing matches) but
  * with no regex split, no token array, and no per-row closure: tokens are
  * byte slices of the lowercased UTF8String, matched against a
  * precomputed open-addressed (hash -> language-bitmask) table.
  *
  * `UTF8String.toLowerCase` takes its ASCII fast path on web text, so the
  * only per-row allocation is the lowered copy. Marker words are pure
  * ASCII: a token that differs from a marker in any byte cannot match it
  * under either byte-wise or Unicode comparison, so byte equality on the
  * lowered bytes is exact for this marker set.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangId.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.transform.LangId.score($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** sorted language codes — index == bit position in the marker masks */
  private val langs: Array[String] =
    graft.text.TextOps.langMarkers.keys.toArray.sorted
  private val langCodes: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  // open-addressed marker table: FNV-1a(word bytes) -> bitmask of languages
  // claiming the word (several languages share e.g. "la", "que", "con").
  // ~60 entries in a 256-slot table; hash 0 is reserved as the empty mark
  // (FNV of a short ASCII word is never 0).
  private val TableSize = 256
  private val tMask = TableSize - 1
  private val tHash = new Array[Long](TableSize)
  private val tBytes = new Array[Array[Byte]](TableSize)
  private val tLangMask = new Array[Int](TableSize)
  locally {
    graft.text.TextOps.langMarkers.foreach { case (lang, words) =>
      val bit = 1 << langs.indexOf(lang)
      words.foreach { w =>
        val b = w.getBytes("UTF-8")
        val h = fnvBytes(b, 0, b.length)
        require(h != 0L, s"marker '$w' hashes to the empty sentinel")
        var idx = slot(h)
        while (tHash(idx) != 0L && tHash(idx) != h) idx = (idx + 1) & tMask
        tHash(idx) = h
        tBytes(idx) = b
        tLangMask(idx) |= bit
      }
    }
  }

  private def slot(h: Long): Int = ((h ^ (h >>> 32)).toInt & tMask)

  private def fnvBytes(b: Array[Byte], from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < to) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Runtime kernel (shared by interpreted eval and generated code). */
  def score(s: UTF8String): UTF8String = {
    if (s == null || s.numBytes() == 0) return und
    val lower = s.toLowerCase
    val n = lower.numBytes()
    val scores = new Array[Int](langCodes.length)
    var start = -1
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i <= n) {
      val ws = i == n || {
        val b = lower.getByte(i)
        b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)
      }
      if (!ws) {
        if (start < 0) { start = i; h = 0xcbf29ce484222325L }
        h ^= (lower.getByte(i) & 0xffL)
        h *= 0x100000001b3L
      } else if (start >= 0) {
        // token [start, i): probe the marker table
        if (h != 0L) {
          var idx = slot(h)
          var probing = true
          while (probing) {
            val th = tHash(idx)
            if (th == 0L) probing = false
            else if (th == h && bytesMatch(lower, start, i, tBytes(idx))) {
              var l = 0
              val m = tLangMask(idx)
              while (l < scores.length) { if ((m & (1 << l)) != 0) scores(l) += 1; l += 1 }
              probing = false
            } else idx = (idx + 1) & tMask
          }
        }
        start = -1
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < scores.length) {
      if (scores(l) > bestScore) { bestScore = scores(l); best = l }
      l += 1
    }
    if (best < 0) und else langCodes(best)
  }

  private def bytesMatch(s: UTF8String, from: Int, to: Int, w: Array[Byte]): Boolean = {
    if (to - from != w.length) return false
    var i = 0
    while (i < w.length) {
      if (s.getByte(from + i) != w(i)) return false
      i += 1
    }
    true
  }

  def column(c: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(c)))
}
