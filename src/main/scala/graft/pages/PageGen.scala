package graft.pages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.mix64

/** Deterministic synthetic Common-Crawl-style page table — the BASELINE
  * input shape `(url:string, warc_ts:timestamp, html:binary, text:string,
  * lang:string)` (FIXTURES.md §1), generated distributed with
  * `spark.range` (no driver-side materialization, no external data):
  *
  *  - hosts are Zipf-skewed (quadratic transform of a uniform hash) so a
  *    few hosts carry most pages — exercises skew salting (E7);
  *  - each url has 1..5 crawls with increasing `warc_ts` — as-of joins
  *    and lag/lead have real history;
  *  - `html` is a fixed template embedding the text; `text` IS
  *    `TextExtract.extract(html)` by construction (E8), with the invariant
  *    re-verified row-by-row in tests;
  *  - `lang` is drawn from a skewed distribution with a rare tail
  *    (exercises `__OTHER__` grouping in the carver).
  *
  * Everything is a pure function of (urlId, crawlIdx, seed): the same
  * (row, seed) yields the same bytes on any cluster at any parallelism.
  */
object PageGen {
  private val langs = Vector("en", "en", "en", "en", "de", "fr", "es", "zh", "pt", "it", "nl", "sv")
  private val words = Vector(
    "the", "data", "page", "web", "crawl", "spark", "query", "join", "scan", "text",
    "feature", "model", "bin", "host", "link", "index", "time", "value", "count", "rate",
    "and", "of", "to", "in", "is", "for", "with", "stream", "batch", "shuffle")

  val BaseEpochSec: Long = 1704067200L // 2024-01-01T00:00:00Z

  def hostOf(urlId: Long, nHosts: Int, seed: Long): Int = {
    val r = (mix64(seed ^ urlId) >>> 11).toDouble / (1L << 53).toDouble
    math.min(nHosts - 1, (nHosts * r * r).toInt) // quadratic → Zipf-ish skew
  }

  def crawlsOf(urlId: Long, seed: Long): Int =
    1 + (mix64(seed ^ (urlId * 31 + 7)) >>> 60).toInt % 5

  def langOf(urlId: Long, seed: Long): String = {
    val h = mix64(seed ^ (urlId * 13 + 3))
    val r = (h >>> 11).toDouble / (1L << 53).toDouble
    if (r > 0.995) s"rare${(h & 7L).toInt}" // rare tail languages
    else langs(((h >>> 32) % langs.length).toInt.abs)
  }

  def textOf(urlId: Long, crawl: Int, seed: Long): String = {
    var state = mix64(seed ^ (urlId * 1000003L + crawl))
    val n = 30 + (state >>> 56).toInt % 120
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      state = mix64(state)
      if (i > 0) sb.append(' ')
      sb.append(words(((state >>> 33) % words.length).toInt))
      i += 1
    }
    sb.toString
  }

  def urlOf(urlId: Long, nHosts: Int, seed: Long): String =
    s"https://host${hostOf(urlId, nHosts, seed)}.example.com/page/$urlId"

  /** warc_ts of one crawl: per-url base offset + growing crawl gaps. */
  def tsOf(urlId: Long, crawl: Int, seed: Long): Long = {
    val base = BaseEpochSec + (mix64(seed ^ (urlId * 17 + 1)) >>> 44).toInt // 0..~1M sec
    base + crawl.toLong * (3600L * 24 * 7) + (mix64(seed ^ (urlId + crawl * 101L)) >>> 50).toInt
  }

  /** The page table: one row per (url, crawl), distributed generation. */
  def pages(spark: SparkSession, nUrls: Long, nHosts: Int = 1000, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val gen = udf { (urlId: Long, crawl: Int) =>
      val text = textOf(urlId, crawl, seed)
      val html = TextExtract.wrapHtml(s"page $urlId", text)
      (urlOf(urlId, nHosts, seed), tsOf(urlId, crawl, seed), html, TextExtract.extract(html), langOf(urlId, seed))
    }
    spark.range(0, nUrls)
      .withColumn("crawl", explode(sequence(lit(0), lit(4))))
      // deterministic per-url crawl count
      .filter(col("crawl") < udf((u: Long) => crawlsOf(u, seed)).apply(col("id")))
      .select(gen(col("id"), col("crawl").cast("int")).as("p"))
      .select(
        col("p._1").as("url"),
        to_timestamp(from_unixtime(col("p._2"))).as("warc_ts"),
        col("p._3").as("html"),
        col("p._4").as("text"),
        col("p._5").as("lang")
      )
  }
}
