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

  /** Seconds-since-reference column for one datetime feature. */
  def secondsSince(df: DataFrame, spec: DatetimeSpec): Column = {
    val ts = col(spec.name).cast("timestamp")
    if (df.columns.contains(spec.referenceDate)) {
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
