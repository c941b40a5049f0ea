package graft.carve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Provider-agnostic LLM column qualification — the reference's
  * `features/llm_qualifier.py:1-186` re-expressed over Spark frames.
  *
  * No provider SDK is imported (the reference does the same): the caller
  * supplies `llmFn`, any `String => String` backend — an HTTP client, a
  * local model, or a deterministic fake in tests. The JSON answer contract
  * (`llm_qualifier.py:46-67`) and the type-routing
  * (`specs_to_features_kwargs`, `llm_qualifier.py:100-139`) are preserved;
  * the routing is the same single source of truth used by the CLI session's
  * draft (`cli/CarverSession.prepared`), mirroring how the reference shares
  * it between the LLM qualifier and the MCP session.
  *
  * Scale notes (the reference describes columns with pandas
  * `series.nunique()` + `unique()[:n]` — full-column work):
  *  - distinct counts come from ONE `approx_count_distinct` aggregation
  *    over all columns (prompt content, not a scoring path — approximate
  *    is fine and stays a single scan at any table size);
  *  - sample values come from a `limit(sampleScanRows)` slice so the
  *    collected sets stay bounded no matter the table size.
  */
object LlmQualifier {

  /** The JSON contract the model must follow, embedded in the prompt and
    * used to parse the answer (`llm_qualifier.py:46-67`).
    */
  val schemaInstructions: String =
    """Return ONLY a JSON object (no prose, no markdown fences) mapping every column name to an object
      |describing its feature type. Each value must have a "type" field, one of:
      |
      |- "numerical": a quantitative column.
      |- "categorical": an unordered qualitative column.
      |- "ordinal": an ordered qualitative column. Add "values": the full list of categories from
      |  smallest/lowest to largest/highest (strings).
      |- "datetime": a date/time column. Add "reference": either the name of another datetime column
      |  to measure elapsed time against, or a fixed date literal like "2020-01-01".
      |- "nested": a fine-grained qualitative column that rolls up into coarser columns. Add "parents":
      |  the list of coarser-ward parent column names, from nearest to farthest.
      |- "ignore": a column that should not become a feature (ids, free text, leakage, etc.).
      |
      |Example:
      |{"age": {"type": "numerical"},
      | "city": {"type": "categorical"},
      | "grade": {"type": "ordinal", "values": ["low", "medium", "high"]},
      | "signed_at": {"type": "datetime", "reference": "observed_at"},
      | "product": {"type": "nested", "parents": ["category", "division"]},
      | "user_id": {"type": "ignore"}}
      |""".stripMargin

  /** Builds the qualification prompt describing every column of `df`
    * (`llm_qualifier.py:70-90`): name, dtype, distinct count and a small
    * sample of values, so the model can infer each column's feature type
    * and any ordering / hierarchy. Two cluster jobs regardless of width:
    * one `approx_count_distinct` pass and one bounded sample scan.
    */
  def buildQualificationPrompt(df: DataFrame, sampleSize: Int = 20,
      sampleScanRows: Int = 10000): String = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "[qualify] the frame has no columns to qualify")
    val acdAggs = fields.map(f => approx_count_distinct(col(f.name)).as(s"${f.name}__acd"))
    val acdRow = df.agg(acdAggs.head, acdAggs.tail: _*).head()
    // binary payloads would render as raw bytes — show base64 instead;
    // complex types (maps are not orderable, so neither collect_set nor
    // sort_array accepts them) go through their JSON rendering
    val sampleAggs = fields.map { f =>
      val c = f.dataType match {
        case BinaryType => base64(col(f.name))
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.ArrayType => to_json(col(f.name))
        case _ => col(f.name).cast("string")
      }
      slice(sort_array(collect_set(c)), 1, sampleSize).as(s"${f.name}__sample")
    }
    val sampleRow = df.limit(sampleScanRows).agg(sampleAggs.head, sampleAggs.tail: _*).head()
    // zip the two single-row results by position
    val described = fields.zipWithIndex.map { case (f, i) =>
      val nUnique = acdRow.getLong(i)
      val sample = Option(sampleRow.getSeq[String](i)).getOrElse(Seq.empty)
      s"- '${f.name}' (dtype=${f.dataType.simpleString}, n_unique=$nUnique): ${sample.mkString(", ")}"
    }
    (Seq(
      "You are qualifying the columns of a tabular dataset for an optimal-discretization",
      "feature-engineering pipeline.", "") ++ described ++ Seq("", schemaInstructions)).mkString("\n")
  }

  /** One routed column spec (the validated `{"type": ...}` object). */
  sealed trait ColumnSpec
  case object Numerical extends ColumnSpec
  case object Categorical extends ColumnSpec
  final case class Ordinal(values: Vector[String]) extends ColumnSpec
  final case class Datetime(reference: String) extends ColumnSpec
  final case class Nested(parents: Vector[String]) extends ColumnSpec
  case object Ignore extends ColumnSpec

  /** The routed qualification: carve specs in mapping order plus the
    * datetime conversions to apply first (the reference's in-place
    * `withTimedeltas` order semantics) and the ignored columns.
    */
  final case class Routed(
      columns: Vector[(String, ColumnSpec)]
  ) {
    def ignored: Vector[String] = columns.collect { case (c, Ignore) => c }

    def datetimes: Vector[DatetimeFeatures.DatetimeSpec] =
      columns.collect { case (c, Datetime(ref)) => DatetimeFeatures.DatetimeSpec(c, ref) }

    /** FeatureSpecs in mapping order — datetime columns carve as
      * quantitative over their converted (same-name) column.
      */
    def specs: Vector[BinaryCarver.FeatureSpec] = columns.collect {
      case (c, Numerical) => BinaryCarver.FeatureSpec(c, "quantitative")
      case (c, Datetime(_)) => BinaryCarver.FeatureSpec(c, "quantitative")
      case (c, Categorical) => BinaryCarver.FeatureSpec(c, "categorical")
      case (c, Ordinal(vs)) => BinaryCarver.FeatureSpec(c, "ordinal", ordinalOrder = vs)
      case (c, Nested(ps)) => BinaryCarver.FeatureSpec(c, "nested", parents = ps)
    }

    /** Applies the datetime conversions (in mapping order, the reference's
      * in-place declaration-order semantics) and returns the carve-ready
      * frame with the specs.
      */
    def prepare(df: DataFrame): (DataFrame, Seq[BinaryCarver.FeatureSpec]) = {
      val converted =
        if (datetimes.isEmpty) df else DatetimeFeatures.withTimedeltas(df, datetimes)
      (converted, specs)
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def strings(j: JValue, key: String, c: String, kind: String): Vector[String] = j match {
    case JArray(vs) if vs.nonEmpty => vs.map {
      case JString(s) => s
      case other => JsonMethods.compact(JsonMethods.render(other))
    }.toVector
    case JNothing | JNull => fail(s"[qualify] $kind column '$c' is missing its '$key'.")
    case _ => fail(s"[qualify] $kind column '$c' needs a non-empty '$key' list.")
  }

  /** Routes a `{column: {"type": ..., ...}}` mapping into carve specs —
    * the single source of truth shared with the CLI session
    * (`llm_qualifier.py:100-139` `specs_to_features_kwargs`). Preserves
    * mapping order; `ignore` columns are kept (listed) but produce no spec.
    */
  def route(mapping: Seq[(String, JValue)]): Routed = Routed(mapping.map { case (c, spec) =>
    val kind = spec \ "type" match { case JString(s) => s; case _ => null }
    c -> (kind match {
      case "numerical" => Numerical
      case "categorical" => Categorical
      case "ordinal" => Ordinal(strings(spec \ "values", "values", c, kind))
      case "datetime" => spec \ "reference" match {
        case JString(r) if r.nonEmpty => Datetime(r)
        case JNothing | JNull => fail(s"[qualify] datetime column '$c' is missing its 'reference'.")
        case _ => fail(s"[qualify] datetime column '$c' needs a string 'reference'.")
      }
      case "nested" => Nested(strings(spec \ "parents", "parents", c, kind))
      case "ignore" => Ignore
      case other => fail(s"[qualify] column '$c' has unknown type '$other'.")
    })
  }.toVector)

  /** Parses the LLM's raw text answer (`llm_qualifier.py:142-160`):
    * extracts the outermost JSON object and routes it. Fails with a clear
    * message when no JSON object is present or a column's spec is
    * unknown / incomplete.
    */
  def parseQualificationResponse(response: String): Routed = {
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start == -1 || end == -1 || end < start)
      fail(s"[qualify] No JSON object found in LLM response: $response")
    val parsed =
      try JsonMethods.parse(response.substring(start, end + 1))
      catch { case e: Exception => fail(s"[qualify] Could not parse JSON from LLM response: ${e.getMessage}") }
    parsed match {
      case JObject(fields) => route(fields)
      case _ => fail("[qualify] LLM response is not a JSON object.")
    }
  }

  /** Qualifies every column of `df` by asking `llmFn`
    * (`llm_qualifier.py:163-185`): builds the prompt, sends it through the
    * caller's backend, parses + routes the answer.
    */
  def qualifyWithLlm(df: DataFrame, llmFn: String => String,
      sampleSize: Int = 20, sampleScanRows: Int = 10000): Routed =
    parseQualificationResponse(llmFn(buildQualificationPrompt(df, sampleSize, sampleScanRows)))
}
