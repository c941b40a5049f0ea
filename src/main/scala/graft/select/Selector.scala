package graft.select

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

import graft.carve.{BinaryCarver, Stats}

/** Feature pre-selection (SURVEY.md §2.7, reference `selectors/`):
  * gate metrics, association ranking vs the target, redundancy filtering,
  * and the best-first selection walk.
  *
  * Cluster shape: gate + qualitative association come from ONE long-form
  * `groupBy(feature, value)` pass (shared with the carver's histogram
  * machinery); quantitative association (Pearson, Spearman) is one wide
  * aggregation; redundancy needs one correlation pass over the candidate
  * quantitative block and one `groupBy(a, b)` per qualitative pair that
  * the best-first walk actually inspects.
  */
object Selector {

  final case class FeatureRank(
      name: String,
      kind: String,
      nanFreq: Double,
      modeFreq: Double,
      cardinality: Long,
      association: Double, // ranking measure: |pearson| or Cramér's V
      spearman: Double,
      passedGates: Boolean
  )

  final case class Config(
      maxNanFreq: Double = 0.999,
      maxModeFreq: Double = 0.999,
      redundancyThreshold: Double = 0.9,
      nBest: Int = 10
  )

  /** One pass: per-feature nan fraction, mode frequency, cardinality, and
    * (for qualitative features vs a binary target) the chi²-derived
    * unrounded Cramér's V (`selectors/measures/qualitative_measures.py`).
    */
  def qualitativeMetrics(
      df: DataFrame,
      target: String,
      quals: Seq[String]
  ): Map[String, FeatureRank] = {
    if (quals.isEmpty) return Map.empty
    val specs = quals.map(n => BinaryCarver.FeatureSpec(n, "categorical"))
    val hist = BinaryCarver.histogram(df, target, specs)
    quals.map { name =>
      val rows = hist.getOrElse(name, Array.empty)
      val total = rows.map(_.count).sum.toDouble
      val nanCount = rows.filter(_.isNull).map(_.count).sum.toDouble
      val nonNull = rows.filterNot(_.isNull)
      val modeFreq = if (nonNull.isEmpty) 0.0 else nonNull.map(_.count).max / total
      // chi2 on the (value × {0,1}) table, unrounded V (selector-side)
      val obs = nonNull.map(r => Array(r.count - r.sumY, r.sumY))
      val assoc =
        if (obs.length < 2) 0.0
        else {
          val chi2 = Stats.pearsonChi2(obs, guardZeroExpected = true)
          val nObs = nonNull.map(_.count).sum.toDouble
          Stats.cramervTschuprowtUnrounded(chi2, nObs, obs.length.toDouble, 2.0)._1
        }
      name -> FeatureRank(name, "categorical", nanCount / total, modeFreq,
        nonNull.length.toLong, assoc, Double.NaN, passedGates = true)
    }.toMap
  }

  /** One wide aggregation: per-feature nan fraction + Pearson corr with the
    * target; plus a second pass for Spearman (corr of rank transforms).
    */
  def quantitativeMetrics(
      df: DataFrame,
      target: String,
      quants: Seq[String]
  ): Map[String, FeatureRank] = {
    if (quants.isEmpty) return Map.empty
    val y = col(target).cast("double")
    val aggs = quants.flatMap { n =>
      val c = col(n).cast("double")
      Seq(
        avg(c.isNull.cast("double")).as(s"${n}__nan"),
        safeCorr(c, y).as(s"${n}__corr"),
        count_distinct(c).as(s"${n}__card")
      )
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // Spearman: correlate fractional ranks (percent_rank over each feature and y)
    val ranked = quants.foldLeft(
      df.withColumn("__ry", percent_rank().over(org.apache.spark.sql.expressions.Window.orderBy(y)))
    ) { (d, n) =>
      d.withColumn(s"__r_$n", percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(n).cast("double"))))
    }
    val spAggs = quants.map(n => safeCorr(col(s"__r_$n"), col("__ry")).as(s"${n}__sp"))
    val spRow = ranked.agg(spAggs.head, spAggs.tail: _*).head()

    quants.zipWithIndex.map { case (n, i) =>
      val nanF = Option(row.getAs[java.lang.Double](s"${n}__nan")).map(_.toDouble).getOrElse(0.0)
      val pearson = Option(row.getAs[java.lang.Double](s"${n}__corr")).map(_.toDouble).getOrElse(Double.NaN)
      val card = row.getAs[Long](s"${n}__card")
      val sp = Option(spRow.getAs[java.lang.Double](s"${n}__sp")).map(_.toDouble).getOrElse(Double.NaN)
      n -> FeatureRank(n, "quantitative", nanF, Double.NaN, card,
        math.abs(pearson), sp, passedGates = true)
    }.toMap
  }

  /** Pairwise redundancy for the best-first walk: |Pearson| for two
    * quantitative features (one tiny agg), Cramér's V from a
    * `groupBy(a, b)` crosstab for two qualitatives.
    */
  /** ANSI-safe Pearson correlation: Spark 4's `corr` throws DIVIDE_BY_ZERO
    * on constant columns under ANSI mode; this returns null instead.
    */
  private def safeCorr(a: Column, b: Column): Column =
    try_divide(covar_samp(a, b), stddev_samp(a) * stddev_samp(b))

  def pairAssociation(df: DataFrame, a: FeatureRank, b: FeatureRank): Double = {
    if (a.kind == "quantitative" && b.kind == "quantitative") {
      val r = df.agg(safeCorr(col(a.name).cast("double"), col(b.name).cast("double"))).head()
      Option(r.getAs[java.lang.Double](0)).map(d => math.abs(d)).getOrElse(0.0)
    } else if (a.kind == "categorical" && b.kind == "categorical") {
      val counts = df.groupBy(col(a.name).cast("string").as("a"), col(b.name).cast("string").as("b"))
        .agg(count(lit(1)).as("n")).collect()
      val aVals = counts.map(_.getString(0)).distinct.zipWithIndex.toMap
      val bVals = counts.map(_.getString(1)).distinct.zipWithIndex.toMap
      if (aVals.size < 2 || bVals.size < 2) return 0.0
      val obs = Array.fill(aVals.size, bVals.size)(0.0)
      counts.foreach(r => obs(aVals(r.getString(0)))(bVals(r.getString(1))) += r.getLong(2).toDouble)
      val chi2 = Stats.pearsonChi2(obs, guardZeroExpected = true)
      Stats.cramervTschuprowtUnrounded(chi2, counts.map(_.getLong(2)).sum.toDouble,
        aVals.size.toDouble, bVals.size.toDouble)._1
    } else 0.0 // mixed-kind redundancy not filtered (matches reference split by type)
  }

  final case class Selection(kept: Vector[FeatureRank], dropped: Vector[(FeatureRank, String)])

  /** Best-first selection (`selectors/filters`): gate, rank by association
    * desc, walk best-first dropping any feature too associated with an
    * already-kept better one, stop at nBest per kind.
    */
  def select(
      df: DataFrame,
      target: String,
      quants: Seq[String],
      quals: Seq[String],
      config: Config = Config()
  ): Selection = {
    val metrics = (quantitativeMetrics(df, target, quants) ++ qualitativeMetrics(df, target, quals)).values.toVector
    val dropped = Vector.newBuilder[(FeatureRank, String)]
    val gated = metrics.filter { m =>
      val nanOk = m.nanFreq <= config.maxNanFreq
      val modeOk = m.modeFreq.isNaN || m.modeFreq <= config.maxModeFreq
      val cardOk = m.cardinality > 1
      if (!nanOk) dropped += ((m, f"nan_freq=${m.nanFreq}%.3f"))
      else if (!modeOk) dropped += ((m, f"mode_freq=${m.modeFreq}%.3f"))
      else if (!cardOk) dropped += ((m, "constant"))
      nanOk && modeOk && cardOk
    }
    val ranked = gated.sortBy(m => (-nz(m.association), m.name))
    val kept = mutable.ArrayBuffer.empty[FeatureRank]
    ranked.foreach { m =>
      val perKind = kept.count(_.kind == m.kind)
      if (perKind >= config.nBest) dropped += ((m, "budget"))
      else {
        val redundantWith = kept.find(k =>
          k.kind == m.kind && pairAssociation(df, k, m) > config.redundancyThreshold)
        redundantWith match {
          case Some(k) => dropped += ((m, s"redundant_with=${k.name}"))
          case None => kept += m
        }
      }
    }
    Selection(kept.toVector, dropped.result())
  }

  private def nz(d: Double): Double = if (d.isNaN) Double.NegativeInfinity else d
}
