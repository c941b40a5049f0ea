package graft.carve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Datetime features (SURVEY.md T3) — the reference's TimedeltaDiscretizer
  * (`discretizers/utils/type_discretizers.py:128-194`,
  * `features/quantitatives/datetime_feature.py:30-67`): a datetime column
  * becomes the float number of seconds elapsed since a reference — either a
  * fixed date literal or another timestamp column (row-wise) — and is then
  * carved as an ordinary quantitative feature. NaT/null → null (the
  * carver's NaN bucket), matching the reference's coerce semantics.
  */
object DatetimeFeatures {

  final case class DatetimeSpec(name: String, referenceDate: String, as: String = null) {
    def outputName: String = if (as == null) name else as
  }

  /** Auto-resolution of each datetime column's reference (the reference's
    * default UX for frames with >=2 datetime columns —
    * `features/features.py:121-143` `_resolve_datetime_references`,
    * behavior pinned by executing it):
    *  - the ANCHOR is the column with the latest observation (first in
    *    `cols` order on ties — Python `max` keeps the first of equals);
    *  - every other column (all-null ones included) is measured row-wise
    *    against the anchor;
    *  - the anchor itself (or a single column, or every column when all
    *    are null) falls back to a fixed literal: its own earliest DATE
    *    (time-of-day truncated), or "NaT" when the column has no values.
    * One aggregation job over all columns.
    */
  def resolveReferences(df: DataFrame, cols: Seq[String]): Seq[DatetimeSpec] = {
    require(cols.nonEmpty, "[DatetimeFeatures] no datetime columns given")
    val aggs = cols.flatMap(c => Seq(
      max(col(c).cast("timestamp")).as(s"__max_$c"),
      min(col(c).cast("timestamp")).as(s"__min_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // parquet timestamps may surface as NTZ (LocalDateTime) — session tz UTC
    def instantAt(name: String): Option[java.time.Instant] =
      Option(row.getAs[Any](name)).map {
        case t: java.sql.Timestamp => t.toInstant
        case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
        case i: java.time.Instant => i
      }
    val maxes = cols.map(c => c -> instantAt(s"__max_$c")).toMap
    val mins = cols.map(c => c -> instantAt(s"__min_$c")).toMap
    val anchor = cols.filter(maxes(_).isDefined).foldLeft(Option.empty[String]) {
      case (None, c) => Some(c)
      case (Some(b), c) => if (maxes(c).get.isAfter(maxes(b).get)) Some(c) else Some(b)
    }
    cols.map { c =>
      anchor match {
        case Some(a) if c != a => DatetimeSpec(c, a)
        case _ =>
          val litRef = mins(c) match {
            case Some(i) => java.time.LocalDate.ofInstant(i, java.time.ZoneOffset.UTC).toString
            case None => NaTReference
          }
          DatetimeSpec(c, litRef)
      }
    }
  }

  /** Sentinel reference for an all-null datetime column with no anchor —
    * mirrors the reference's `str(NaT)`; every delta is null.
    */
  val NaTReference = "NaT"

  /** Seconds-since-reference column for one datetime feature. */
  def secondsSince(df: DataFrame, spec: DatetimeSpec): Column = {
    val ts = col(spec.name).cast("timestamp")
    if (spec.referenceDate == NaTReference) {
      lit(null).cast("double")
    } else if (df.columns.contains(spec.referenceDate)) {
      val ref = col(spec.referenceDate).cast("timestamp")
      (unix_micros(ts) - unix_micros(ref)).cast("double") / 1e6
    } else {
      // fixed literal: validate driver-side so a typo fails fast instead of
      // silently nulling the whole column (reference raises the same way)
      val parsed =
        try java.time.Instant.parse(withUtc(spec.referenceDate))
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"[DatetimeFeatures] reference_date '${spec.referenceDate}' is neither a column of the frame " +
                "nor a parseable date. If it is meant to be a reference column, keep it in the frame.")
        }
      (unix_micros(ts) - lit(parsed.toEpochMilli * 1000L)).cast("double") / 1e6
    }
  }

  private def withUtc(s: String): String =
    if (s.endsWith("Z") || s.contains("+")) s
    else if (s.contains("T")) s + "Z"
    else s + "T00:00:00Z"

  /** Adds one seconds-since-reference column per spec (pure projection). */
  def withTimedeltas(df: DataFrame, specs: Seq[DatetimeSpec]): DataFrame =
    specs.foldLeft(df)((d, sp) => d.withColumn(sp.outputName, secondsSince(d, sp)))

  /** Quantitative FeatureSpecs for the converted columns. */
  def featureSpecs(specs: Seq[DatetimeSpec]): Seq[BinaryCarver.FeatureSpec] =
    specs.map(sp => BinaryCarver.FeatureSpec(sp.outputName, "quantitative"))
}
