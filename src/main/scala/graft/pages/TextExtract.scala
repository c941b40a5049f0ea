package graft.pages

import java.nio.charset.StandardCharsets

/** Deterministic html → text extraction — the per-row invariant the
  * BASELINE demands ("byte-identical extracted text per url", E8).
  *
  * The extractor is a pure `Array[Byte] => String` shared by the synthetic
  * generator (which embeds the text into the html template) and the
  * engine's scan path, so extraction is byte-identical by construction AND
  * verified byte-for-byte in tests. The html dialect is the generator's
  * fixed template: the payload is the region between the first `<p>` and
  * the last `</p>`; entities `&amp; &lt; &gt;` are decoded; anything
  * outside the body is ignored. Unparseable bytes → empty string (never
  * throws — a malformed row must not kill a 10¹²-row job).
  */
object TextExtract {
  val OpenTag = "<p>"
  val CloseTag = "</p>"

  def wrapHtml(title: String, text: String): Array[Byte] = {
    val escaped = escape(text)
    s"<html><head><title>${escape(title)}</title></head><body><p>$escaped</p></body></html>"
      .getBytes(StandardCharsets.UTF_8)
  }

  def extract(html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, StandardCharsets.UTF_8)
    val start = s.indexOf(OpenTag)
    if (start < 0) return ""
    val end = s.lastIndexOf(CloseTag)
    if (end <= start) return ""
    unescape(s.substring(start + OpenTag.length, end))
  }

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
}
