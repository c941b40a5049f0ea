package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** LLM qualification plumbing (reference `features/llm_qualifier.py`):
  * prompt construction over a Spark frame, JSON answer parsing, and
  * type-routing into carve specs — all with a deterministic fake backend
  * (the reference is provider-agnostic too: the caller supplies llm_fn).
  */
class LlmQualifierSpec extends SparkSuite {

  private val answer =
    """{"age": {"type": "numerical"},
      | "city": {"type": "categorical"},
      | "grade": {"type": "ordinal", "values": ["low", "medium", "high"]},
      | "signed_at": {"type": "datetime", "reference": "2020-01-01"},
      | "product": {"type": "nested", "parents": ["category"]},
      | "user_id": {"type": "ignore"}}""".stripMargin

  test("prompt describes every column with dtype, distinct count and samples") {
    val df = spark.range(0, 50).select(
      (col("id") % 7).cast("double").as("age"),
      concat(lit("c"), col("id") % 3).as("city"),
      to_timestamp(lit("2024-03-01 00:00:00")).as("signed_at"))
    val prompt = LlmQualifier.buildQualificationPrompt(df, sampleSize = 4)
    assert(prompt.contains("'age' (dtype=double"))
    assert(prompt.contains("'city' (dtype=string, n_unique=3): c0, c1, c2"))
    assert(prompt.contains("'signed_at' (dtype=timestamp"))
    // the JSON contract rides along
    assert(prompt.contains("\"type\" field"))
    assert(prompt.contains("\"nested\""))
    // sampleSize caps the shown values: age has 7 distinct but shows 4
    // (3 separators + the dtype/n_unique comma in the header)
    val ageLine = prompt.linesIterator.find(_.startsWith("- 'age'")).get
    assert(ageLine.count(_ == ',') == 4, ageLine)
  }

  test("qualifyWithLlm routes the fake answer into ordered carve specs") {
    val df = spark.range(0, 10).select(
      col("id").cast("double").as("age"),
      lit("paris").as("city"),
      lit("low").as("grade"),
      to_timestamp(lit("2024-03-01 00:00:00")).as("signed_at"),
      lit("widget").as("product"),
      col("id").as("user_id"))
    var seenPrompt: String = null
    val routed = LlmQualifier.qualifyWithLlm(df, { p => seenPrompt = p; s"Sure! Here you go:\n$answer" })
    assert(seenPrompt.contains("'grade'"))
    assert(routed.ignored == Vector("user_id"))
    assert(routed.datetimes.map(d => (d.name, d.referenceDate)) == Vector(("signed_at", "2020-01-01")))
    assert(routed.specs.map(s => (s.name, s.kind)) == Vector(
      ("age", "quantitative"), ("city", "categorical"), ("grade", "ordinal"),
      ("signed_at", "quantitative"), ("product", "nested")))
    assert(routed.specs.find(_.name == "grade").get.ordinalOrder == Seq("low", "medium", "high"))
    assert(routed.specs.find(_.name == "product").get.parents == Seq("category"))
    // prepare converts the datetime in place and keeps spec order
    val (prepared, specs) = routed.prepare(df)
    assert(specs.map(_.name) == Seq("age", "city", "grade", "signed_at", "product"))
    val v = prepared.select(col("signed_at")).head().getDouble(0)
    // 2024-03-01 is 1521 days after 2020-01-01
    assert(math.abs(v - 1521.0 * 86400) < 1e-6, s"signed_at seconds: $v")
  }

  test("a qualified frame carves end-to-end") {
    import spark.implicits._
    val df = (0 until 400).map { i =>
      (i % 100 / 10.0, if (i % 3 == 0) "a" else "b", if (i % 100 > 60) 1 else 0)
    }.toDF("x", "c", "y")
    val routed = LlmQualifier.parseQualificationResponse(
      """{"x": {"type": "numerical"}, "c": {"type": "categorical"}, "y": {"type": "ignore"}}""")
    val (frame, specs) = routed.prepare(df)
    val model = BinaryCarver.fit(frame, "y", specs,
      config = BinaryCarver.Config(minFreq = 0.05, maxNMod = 4))
    assert(model.kept.nonEmpty)
  }

  test("parse errors carry the reference's clear messages") {
    def msg(s: String): String =
      intercept[IllegalArgumentException](LlmQualifier.parseQualificationResponse(s)).getMessage
    assert(msg("no json here").contains("No JSON object found"))
    assert(msg("""{"x": {"type": "wat"}}""").contains("unknown type 'wat'"))
    assert(msg("""{"x": {"type": "ordinal"}}""").contains("missing its 'values'"))
    assert(msg("""{"x": {"type": "datetime"}}""").contains("missing its 'reference'"))
    assert(msg("""{"x": {"type": "nested"}}""").contains("missing its 'parents'"))
    assert(msg("""{"x": {"type": "nested", "parents": []}}""").contains("'parents'"))
    // prose around the JSON object is tolerated (find/rfind extraction)
    val ok = LlmQualifier.parseQualificationResponse("""Sure: {"x": {"type": "numerical"}} done""")
    assert(ok.specs.map(_.name) == Vector("x"))
  }
}
