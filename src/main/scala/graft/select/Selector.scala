package graft.select

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

import graft.carve.{BinaryCarver, Stats}

/** Feature pre-selection (SURVEY.md §2.7, reference `selectors/`):
  * gate metrics, association ranking vs the target, redundancy filtering,
  * and the best-first selection walk.
  *
  * Cluster shape: gate + qualitative association come from ONE long-form
  * `groupBy(feature, value)` pass (shared with the carver's histogram
  * machinery); quantitative association is one wide aggregation (Pearson)
  * plus one melt-groupBy pass (Spearman from average ranks over grouped
  * counts — cardinality-sized, never a global row sort); redundancy is ONE
  * correlation-matrix aggregation over the quantitative block and ONE
  * batched crosstab job over the qualitative pairs — the best-first walk
  * itself launches zero Spark jobs.
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
      nBest: Int = 10,
      // outlier gates (F3, `quantitative_measures.py:290-330`): max allowed
      // outlier rate per quantitative feature; None disables the gate
      maxZscoreOutlierRate: Option[Double] = None,
      maxIqrOutlierRate: Option[Double] = None,
      // F5: ONE total budget apportioned across kinds by largest-remainder
      // (`base_selector.py:395-411`); None keeps the per-kind nBest cap
      totalBudget: Option[Int] = None
  )

  /** Largest-remainder apportionment of a total selection budget across
    * feature kinds (`base_selector.py:split_budget`): floor of the
    * proportional share per kind, leftover seats to the largest fractional
    * parts. A budget >= the feature count means no cap.
    */
  def splitBudget(nBest: Int, counts: Seq[(String, Int)]): Map[String, Int] = {
    val total = counts.map(_._2).sum
    if (total == 0 || nBest >= total) return counts.toMap
    val exact = counts.map { case (k, c) => k -> (nBest.toDouble * c / total) }
    val floor = exact.map { case (k, e) => k -> e.toInt }.toMap
    val leftover = nBest - floor.values.sum
    // ties on the fractional part resolve by input order (Python's stable
    // sort over the insertion-ordered dict — quantitatives first)
    val bump = exact.zipWithIndex
      .sortBy { case ((k, e), i) => (-(e - floor(k)), i) }
      .take(leftover).map(_._1._1).toSet
    floor.map { case (k, v) => k -> (if (bump(k)) v + 1 else v) }
  }

  /** One pass: per-feature nan fraction, mode frequency, cardinality, and
    * (for qualitative features vs a binary target) the chi²-derived
    * unrounded Cramér's V (`selectors/measures/qualitative_measures.py`).
    */
  def qualitativeMetrics(
      df: DataFrame,
      target: String,
      quals: Seq[String]
  ): Map[String, FeatureRank] =
    qualitativeMetricsFromHist(qualHistogram(df, target, quals), quals)

  /** The one-pass categorical histogram shared by every qualitative
    * selector measure (gates, Cramér's V, Tschuprow's T) — compute once per
    * (df, quals) and derive all of them (guide §1.2: selectTask used to run
    * this identical job twice).
    */
  def qualHistogram(df: DataFrame, target: String, quals: Seq[String])
      : Map[String, Array[BinaryCarver.HistRow]] =
    if (quals.isEmpty) Map.empty
    else BinaryCarver.histogram(df, target, quals.map(n => BinaryCarver.FeatureSpec(n, "categorical")))

  private def qualitativeMetricsFromHist(
      hist: Map[String, Array[BinaryCarver.HistRow]],
      quals: Seq[String]
  ): Map[String, FeatureRank] = {
    if (quals.isEmpty) return Map.empty
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

  /** Quantitative metrics in two jobs for ALL features: one wide
    * aggregation (nan fraction, Pearson, cardinality) and one melt-groupBy
    * pass for Spearman. Spearman uses average ranks computed from grouped
    * (feature, value[, y]) counts — the shuffles are sized by column
    * cardinality, not row count, and every window is partitioned by
    * feature id (never the round-1 global single-partition `percent_rank`).
    */
  def quantitativeMetrics(
      df: DataFrame,
      target: String,
      quants: Seq[String]
  ): Map[String, FeatureRank] = quantitativeMetricsWith(df, target, quants, None)

  /** Gate + Pearson + cardinality only (ONE wide aggregation): for callers
    * that never read the spearman column, skipping its multi-stage rank
    * pass halves the job count.
    */
  def quantitativeMetricsNoSpearman(
      df: DataFrame,
      target: String,
      quants: Seq[String]
  ): Map[String, FeatureRank] = quantitativeMetricsWith(df, target, quants, Some(Map.empty))

  /** [[quantitativeMetrics]] with an optional precomputed Spearman map:
    * the regression/ordinal task preset already ran spearmanByFeature for
    * its ranking override, and the classification preset never reads the
    * spearman column — either way the duplicate multi-stage rank pass is
    * skipped (`Some(Map.empty)` = don't compute, report NaN).
    */
  private def quantitativeMetricsWith(
      df: DataFrame,
      target: String,
      quants: Seq[String],
      spearmanPre: Option[Map[String, Double]]
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
    val sp = spearmanPre.getOrElse(spearmanByFeature(df, target, quants))

    quants.map { n =>
      val nanF = Option(row.getAs[java.lang.Double](s"${n}__nan")).map(_.toDouble).getOrElse(0.0)
      val pearson = Option(row.getAs[java.lang.Double](s"${n}__corr")).map(_.toDouble).getOrElse(Double.NaN)
      val card = row.getAs[Long](s"${n}__card")
      n -> FeatureRank(n, "quantitative", nanF, Double.NaN, card,
        math.abs(pearson), sp.getOrElse(n, Double.NaN), passedGates = true)
    }.toMap
  }

  /** "Distance" ranking measure (F2) — the reference's DistanceMeasure
    * (`selectors/measures/quantitative_measures.py:272-288`) is
    * `scipy.spatial.distance.correlation(x, y) - 1`, and scipy's
    * correlation DISTANCE is `1 - pearson`, so the measure is exactly
    * `-pearson` over the feature's non-null rows. Shares the one batched
    * aggregation with [[quantitativeMetrics]]'s Pearson — no extra job.
    */
  def distanceByFeature(df: DataFrame, target: String, quants: Seq[String]): Map[String, Double] = {
    if (quants.isEmpty) return Map.empty
    val y = col(target).cast("double")
    val aggs = quants.map { n => safeCorr(col(n).cast("double"), y).as(s"${n}__corr") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    quants.map { n =>
      val pearson = Option(row.getAs[java.lang.Double](s"${n}__corr")).map(_.toDouble).getOrElse(Double.NaN)
      n -> -pearson
    }.toMap
  }

  /** Spearman rho per feature vs the target, over rows where the feature is
    * non-null. Average-rank (tie-corrected) formulation as the Pearson
    * correlation of rank transforms, computed entirely from grouped counts:
    *
    *  - melt to (fid, v, yv) and count — one shuffle sized by Σ per-feature
    *    (value × target-value) cardinality;
    *  - rank(v) within fid from the per-(fid, v) cumulative counts;
    *  - rank(yv) within fid likewise (the feature's null rows are excluded,
    *    so target ranks are per-feature);
    *  - weighted Pearson over the grouped triples.
    */
  def spearmanByFeature(df: DataFrame, target: String, quants: Seq[String]): Map[String, Double] = {
    if (quants.isEmpty) return Map.empty
    val melted = df
      .select(col(target).cast("double").as("yv"),
        explode(map(quants.flatMap(n => Seq(lit(n), col(n).cast("double"))): _*)).as(Seq("fid", "v")))
      .filter(col("v").isNotNull && !isnan(col("v")) && col("yv").isNotNull)
    // persisted: the grouped counts feed the two rank derivations AND the
    // final join — unpersisted, each reference replays the melt+groupBy
    // over the input (3 full scans)
    val g = melted.groupBy(col("fid"), col("v"), col("yv")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val rx = bucketedAvgRank(g.groupBy("fid", "v").agg(sum("cnt").as("n")), "v", "rx")
    val ry = bucketedAvgRank(g.groupBy("fid", "yv").agg(sum("cnt").as("n")), "yv", "ry")

    val joined = g.join(rx, Seq("fid", "v")).join(ry, Seq("fid", "yv"))
    val stats = joined.groupBy("fid").agg(
      sum(col("cnt")).cast("double").as("n"),
      sum(col("cnt") * col("rx")).as("sx"),
      sum(col("cnt") * col("ry")).as("sy"),
      sum(col("cnt") * col("rx") * col("rx")).as("sxx"),
      sum(col("cnt") * col("ry") * col("ry")).as("syy"),
      sum(col("cnt") * col("rx") * col("ry")).as("sxy")
    ).collect()
    g.unpersist()
    stats.map { r =>
      val (n, sx, sy, sxx, syy, sxy) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      r.getString(0) -> (if (den == 0 || den.isNaN) Double.NaN else (n * sxy - sx * sy) / den)
    }.toMap
  }

  /** Kruskal-Wallis H (tie-corrected) per quantitative feature with the
    * target as the grouping variable, plus the ε²/η² effect sizes
    * (`selectors/measures/quantitative_measures.py:36-160`) — computed from
    * the same melt-groupBy machinery as Spearman: one shuffle sized by
    * cardinality, ranks from grouped cumulative counts, never a row sort.
    */
  final case class KruskalRow(h: Double, epsilonSq: Double, etaSq: Double)

  def kruskalByFeature(df: DataFrame, target: String, quants: Seq[String]): Map[String, KruskalRow] = {
    if (quants.isEmpty) return Map.empty
    val melted = df
      .select(col(target).cast("double").as("yv"),
        explode(map(quants.flatMap(n => Seq(lit(n), col(n).cast("double"))): _*)).as(Seq("fid", "v")))
      .filter(col("v").isNotNull && !isnan(col("v")) && col("yv").isNotNull)
    // persisted: g feeds the rank derivation and the join (2 references)
    val g = melted.groupBy(col("fid"), col("v"), col("yv")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // average rank of each x value within fid (ties -> midrank)
    val rx = bucketedAvgRank(g.groupBy("fid", "v").agg(sum("cnt").as("n")), "v", "rx",
      keepTie = true)
    val joined = g.join(rx, Seq("fid", "v"))
    val grpStats = joined.groupBy("fid", "yv").agg(
      sum(col("cnt")).cast("double").as("ng"),
      sum(col("cnt") * col("rx")).as("rg"))
    val tieStats = rx.groupBy("fid").agg(
      sum(col("tie") * col("tie") * col("tie") - col("tie")).cast("double").as("tsum"))
    val rows = grpStats.groupBy("fid").agg(
      sum(col("ng")).as("n"),
      sum(col("rg") * col("rg") / col("ng")).as("ssbn"),
      count(lit(1)).as("k")
    ).join(tieStats, Seq("fid")).collect()
    g.unpersist()
    rows.map { r =>
      val n = r.getDouble(1); val ssbn = r.getDouble(2); val k = r.getLong(3).toDouble
      val tsum = r.getDouble(4)
      val h0 = 12.0 / (n * (n + 1.0)) * ssbn - 3.0 * (n + 1.0)
      val tie = 1.0 - tsum / (n * n * n - n)
      val h = if (tie <= 0) Double.NaN else h0 / tie
      val eps = if (n > 1) h / (n - 1.0) else Double.NaN
      val eta = if (n - k > 0) math.max(0.0, (h - k + 1.0) / (n - k)) else Double.NaN
      r.getString(0) -> KruskalRow(h, eps, eta)
    }.toMap
  }

  /** R measure per quantitative feature vs a binary/low-cardinality target
    * (`quantitative_measures.py:RMeasure`): sqrt of the OLS R² of
    * feature ~ C(target) = sqrt(SS_between / SS_total), one groupBy(target)
    * aggregation for all features.
    */
  def rMeasure(df: DataFrame, target: String, quants: Seq[String]): Map[String, Double] = {
    if (quants.isEmpty) return Map.empty
    val aggs = quants.flatMap { n =>
      val c = col(n).cast("double")
      Seq(sum(c).as(s"${n}__s"), sum(c * c).as(s"${n}__ss"),
        count(c).as(s"${n}__n"))
    }
    val rows = df.groupBy(col(target)).agg(aggs.head, aggs.tail: _*).collect()
    quants.map { n =>
      val groups = rows.map(r => (
        Option(r.getAs[java.lang.Double](s"${n}__s")).map(_.toDouble).getOrElse(0.0),
        Option(r.getAs[java.lang.Double](s"${n}__ss")).map(_.toDouble).getOrElse(0.0),
        r.getAs[Long](s"${n}__n").toDouble)).filter(_._3 > 0)
      val nTot = groups.map(_._3).sum
      val sTot = groups.map(_._1).sum
      val ssTot = groups.map(_._2).sum
      val mean = sTot / nTot
      val tss = ssTot - nTot * mean * mean
      val bss = groups.map { case (sg, _, ng) => ng * (sg / ng - mean) * (sg / ng - mean) }.sum
      val r2 = if (tss <= 0) Double.NaN else bss / tss
      n -> (if (r2.isNaN || r2 < 0) Double.NaN else math.sqrt(r2))
    }.toMap
  }

  /** Outlier rates per quantitative feature (F3,
    * `quantitative_measures.py:290-330`): zscore rate = mean(|x-μ|>3σ)
    * (sample σ), IQR rate = fraction outside [q1-1.5·iqr, q3+1.5·iqr].
    * Two aggregation jobs for ALL features (moments+quartiles, then rates).
    */
  final case class OutlierRates(zscoreRate: Double, iqrRate: Double)

  def outlierRates(df: DataFrame, quants: Seq[String]): Map[String, OutlierRates] = {
    if (quants.isEmpty) return Map.empty
    val statAggs = quants.flatMap { n =>
      val c = col(n).cast("double")
      Seq(avg(c).as(s"${n}__m"), stddev_samp(c).as(s"${n}__sd"),
        percentile_approx(c, array(lit(0.25), lit(0.75)), lit(100000)).as(s"${n}__q"))
    }
    val st = df.agg(statAggs.head, statAggs.tail: _*).head()
    val rateAggs = quants.flatMap { n =>
      val c = col(n).cast("double")
      val m = st.getAs[java.lang.Double](s"${n}__m")
      val sd = st.getAs[java.lang.Double](s"${n}__sd")
      val q = Option(st.getAs[scala.collection.Seq[Double]](s"${n}__q")).map(_.toSeq).orNull
      val (zlo, zhi) =
        if (m == null || sd == null || sd == 0.0) (Double.NegativeInfinity, Double.PositiveInfinity)
        else (m - 3 * sd, m + 3 * sd)
      val (ilo, ihi) =
        if (q == null || q.length < 2) (Double.NegativeInfinity, Double.PositiveInfinity)
        else { val iqr = q(1) - q(0); (q(0) - 1.5 * iqr, q(1) + 1.5 * iqr) }
      Seq(avg((c < zlo || c > zhi).cast("double")).as(s"${n}__zr"),
        avg((c < ilo || c > ihi).cast("double")).as(s"${n}__ir"))
    }
    val rr = df.agg(rateAggs.head, rateAggs.tail: _*).head()
    quants.map { n =>
      n -> OutlierRates(
        Option(rr.getAs[java.lang.Double](s"${n}__zr")).map(_.toDouble).getOrElse(0.0),
        Option(rr.getAs[java.lang.Double](s"${n}__ir")).map(_.toDouble).getOrElse(0.0))
    }.toMap
  }

  /** ANSI-safe Pearson correlation: Spark 4's `corr` throws DIVIDE_BY_ZERO
    * on constant columns under ANSI mode; this returns null instead.
    */
  private def safeCorr(a: Column, b: Column): Column =
    try_divide(covar_samp(a, b), stddev_samp(a) * stddev_samp(b))

  /** Full |Pearson| matrix over a quantitative block in ONE aggregation
    * (k stddevs + k(k−1)/2 covariances as codegen'd agg expressions).
    */
  def quantCorrMatrix(df: DataFrame, quants: Seq[String]): Map[(String, String), Double] = {
    if (quants.size < 2) return Map.empty
    val pairs = for { i <- quants.indices; j <- i + 1 until quants.size } yield (quants(i), quants(j))
    val aggs = quants.map(n => stddev_samp(col(n).cast("double")).as(s"sd__$n")) ++
      pairs.zipWithIndex.map { case ((a, b), k) =>
        covar_samp(col(a).cast("double"), col(b).cast("double")).as(s"cv__$k")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def get(n: String): Option[Double] = Option(row.getAs[java.lang.Double](n)).map(_.toDouble)
    pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val r = (for {
        sa <- get(s"sd__$a"); sb <- get(s"sd__$b"); cv <- get(s"cv__$k")
        if sa * sb > 0
      } yield math.abs(cv / (sa * sb))).getOrElse(0.0)
      Seq((a, b) -> r, (b, a) -> r)
    }.toMap
  }

  /** Cramér's V for every qualitative pair in ONE batched crosstab job:
    * each row emits one (pair, value_a, value_b) per pair, a single
    * groupBy counts them all, and the tiny grouped result collects once.
    */
  def qualPairMatrix(df: DataFrame, quals: Seq[String]): Map[(String, String), Double] = {
    if (quals.size < 2) return Map.empty
    val pairs = for { i <- quals.indices; j <- i + 1 until quals.size } yield (quals(i), quals(j))
    val pairStructs = pairs.zipWithIndex.map { case ((a, b), k) =>
      struct(lit(k).as("pid"), col(a).cast("string").as("va"), col(b).cast("string").as("vb"))
    }
    val counts = df
      .select(explode(array(pairStructs: _*)).as("p"))
      .groupBy(col("p.pid"), col("p.va"), col("p.vb"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val byPair = counts.groupBy(_.getInt(0))
    pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val rows = byPair.getOrElse(k, Array.empty)
      val aVals = rows.map(_.getString(1)).distinct.zipWithIndex.toMap
      val bVals = rows.map(_.getString(2)).distinct.zipWithIndex.toMap
      val v =
        if (aVals.size < 2 || bVals.size < 2) 0.0
        else {
          val obs = Array.fill(aVals.size, bVals.size)(0.0)
          rows.foreach(r => obs(aVals(r.getString(1)))(bVals(r.getString(2))) += r.getLong(3).toDouble)
          val chi2 = Stats.pearsonChi2(obs, guardZeroExpected = true)
          Stats.cramervTschuprowtUnrounded(chi2, rows.map(_.getLong(3)).sum.toDouble,
            aVals.size.toDouble, bVals.size.toDouble)._1
        }
      Seq((a, b) -> v, (b, a) -> v)
    }.toMap
  }

  /** Single-pair association (kept for targeted checks; `select` uses the
    * batched matrices instead of per-pair jobs).
    */
  def pairAssociation(df: DataFrame, a: FeatureRank, b: FeatureRank): Double = {
    if (a.kind == "quantitative" && b.kind == "quantitative")
      quantCorrMatrix(df, Seq(a.name, b.name)).getOrElse((a.name, b.name), 0.0)
    else if (a.kind == "categorical" && b.kind == "categorical")
      qualPairMatrix(df, Seq(a.name, b.name)).getOrElse((a.name, b.name), 0.0)
    else 0.0 // mixed-kind redundancy not filtered (matches reference split by type)
  }

  /** One row of the uniform per-feature ranking table — the reference's
    * `selectors/utils/pretty_print.py:44-78` `format_ranked_features`:
    * gate values keep a column each, the ranking measure and redundancy
    * filter are NAMED in `measure`/`filter` columns (so qualitative and
    * quantitative branches concatenate into one non-ragged frame), `rank`
    * is the per-kind association rank among gate survivors (None when
    * gated out, like the reference's NaN), `filteredWith` names the
    * already-kept feature a redundancy drop correlated with.
    */
  final case class ReportRow(
      feature: String,
      kind: String,
      nanFreq: Double,
      modeFreq: Double,
      measure: String,
      association: Double,
      rank: Option[Int],
      filter: Option[String],
      redundancy: Option[Double],
      filteredWith: Option[String],
      kept: Boolean,
      reason: String)

  final case class Selection(kept: Vector[FeatureRank], dropped: Vector[(FeatureRank, String)],
      report: Vector[ReportRow] = Vector.empty) {

    /** The ranking table as a frame, sorted by rank ascending with gated-out
      * features last (`pretty_print.py:76-77`).
      */
    def reportFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      report.sortBy(r => (r.rank.getOrElse(Int.MaxValue), r.feature))
        .toDF("feature", "kind", "nan_freq", "mode_freq", "measure", "association",
          "rank", "filter", "redundancy", "filtered_with", "kept", "reason")
    }
  }

  /** Best-first selection (`selectors/filters`): gate, rank by association
    * desc, walk best-first dropping any feature too associated with an
    * already-kept better one, stop at nBest per kind. All pairwise
    * associations are precomputed in two batched jobs; the walk is pure
    * driver-side lookups.
    */
  def select(
      df: DataFrame,
      target: String,
      quants: Seq[String],
      quals: Seq[String],
      config: Config = Config()
  ): Selection = selectWith(df, target, quants, quals, config, Map.empty)

  /** Task presets (F6): the reference's selector classes pick the ranking
    * measure per (task, feature kind) — `classification_selector.py:7-17`,
    * `regression_selector.py:7-17`, `ordinal_selector.py`:
    *
    *  - classification (qualitative target): quantitatives ranked by
    *    Kruskal-η² (target as groups), qualitatives by Tschuprow's T;
    *  - regression / ordinal (numeric target): quantitatives by |Spearman|,
    *    qualitatives by REVERSED Kruskal-η² (feature modalities as groups,
    *    the target as the ranked variable).
    */
  def selectTask(
      df: DataFrame,
      target: String,
      quants: Seq[String],
      quals: Seq[String],
      task: String,
      config: Config = Config()
  ): Selection = task match {
    // the two ranking passes per preset are data-independent — submitted
    // concurrently (guide §2.6: actions are only sequential because the
    // driver calls them sequentially; the later pass's tasks back-fill
    // executor cores the first pass's tail leaves idle). Same results —
    // only the submission overlaps.
    case "classification" =>
      // the qualitative histogram serves BOTH the Tschuprow T override and
      // the gate metrics; the spearman column is never read under a task
      // preset, so its rank pass is skipped (Some(Map.empty))
      val (hist, kru) = concurrently(
        qualHistogram(df, target, quals),
        kruskalByFeature(df, target, quants))
      val overrides = kru.view.mapValues(_.etaSq).toMap ++ tschuprowtFromHist(hist, quals)
      selectWith(df, target, quants, quals, config, overrides,
        Map("quantitative" -> "Kruskal", "categorical" -> "TschuprowT"),
        qualHist = Some(hist), spearmanPre = Some(Map.empty))
    case "regression" | "ordinal" =>
      // the spearman override IS the spearman metric — pass it through
      // instead of re-running the identical rank pass inside
      // quantitativeMetrics
      val (sp, kruRev) = concurrently(
        spearmanByFeature(df, target, quants),
        kruskalReversedByFeature(df, target, quals))
      val overrides = sp.view.mapValues(math.abs(_)).toMap ++
        kruRev.view.mapValues(_.etaSq).toMap
      selectWith(df, target, quants, quals, config, overrides,
        Map("quantitative" -> "Spearman", "categorical" -> "KruskalReversed"),
        spearmanPre = Some(sp))
    case other => throw new IllegalArgumentException(
      s"unknown task '$other' (classification | regression | ordinal)")
  }

  /** Run two independent job-submitting computations concurrently (the
    * Spark scheduler interleaves their jobs; results and their uses are
    * unchanged — guide §2.6's overlap-independent-jobs pattern).
    */
  private def concurrently[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val a = Future(fa)
    val b = Future(fb)
    (Await.result(a, Duration.Inf), Await.result(b, Duration.Inf))
  }

  /** Tschuprow's T per qualitative feature vs the target (classification
    * ranking measure) — same one-pass histogram as qualitativeMetrics.
    */
  def tschuprowtByFeature(df: DataFrame, target: String, quals: Seq[String]): Map[String, Double] =
    tschuprowtFromHist(qualHistogram(df, target, quals), quals)

  private def tschuprowtFromHist(
      hist: Map[String, Array[BinaryCarver.HistRow]], quals: Seq[String]): Map[String, Double] = {
    if (quals.isEmpty) return Map.empty
    quals.map { name =>
      val nonNull = hist.getOrElse(name, Array.empty).filterNot(_.isNull)
      val obs = nonNull.map(r => Array(r.count - r.sumY, r.sumY))
      val t =
        if (obs.length < 2) 0.0
        else {
          val chi2 = Stats.pearsonChi2(obs, guardZeroExpected = true)
          Stats.cramervTschuprowtUnrounded(chi2, nonNull.map(_.count).sum.toDouble,
            obs.length.toDouble, 2.0)._2
        }
      name -> t
    }.toMap
  }

  /** REVERSED Kruskal-Wallis per qualitative feature vs a numeric target
    * (`_vectorized.py:kruskal_h_reversed`): the feature's modalities are
    * the groups, the target is the ranked variable. Same cardinality-sized
    * grouped-rank machinery as [[kruskalByFeature]] with the roles swapped.
    */
  def kruskalReversedByFeature(df: DataFrame, target: String, quals: Seq[String]): Map[String, KruskalRow] = {
    if (quals.isEmpty) return Map.empty
    val melted = df
      .select(col(target).cast("double").as("yv"),
        explode(map(quals.flatMap(n => Seq(lit(n), col(n).cast("string"))): _*)).as(Seq("fid", "g")))
      .filter(col("g").isNotNull && col("yv").isNotNull)
    // persisted: gr feeds the rank derivation and the join (2 references)
    val gr = melted.groupBy(col("fid"), col("g"), col("yv")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // average rank of each y value within fid (ties -> midrank)
    val ry = bucketedAvgRank(gr.groupBy("fid", "yv").agg(sum("cnt").as("n")), "yv", "ry",
      keepTie = true)
    val joined = gr.join(ry, Seq("fid", "yv"))
    val grpStats = joined.groupBy("fid", "g").agg(
      sum(col("cnt")).cast("double").as("ng"),
      sum(col("cnt") * col("ry")).as("rg"))
    val tieStats = ry.groupBy("fid").agg(
      sum(col("tie") * col("tie") * col("tie") - col("tie")).cast("double").as("tsum"))
    val rows = grpStats.groupBy("fid").agg(
      sum(col("ng")).as("n"),
      sum(col("rg") * col("rg") / col("ng")).as("ssbn"),
      count(lit(1)).as("k")
    ).join(tieStats, Seq("fid")).collect()
    gr.unpersist()
    rows.map { r =>
      val n = r.getDouble(1); val ssbn = r.getDouble(2); val k = r.getLong(3).toDouble
      val tsum = r.getDouble(4)
      val h0 = 12.0 / (n * (n + 1.0)) * ssbn - 3.0 * (n + 1.0)
      val tie = 1.0 - tsum / (n * n * n - n)
      val h = if (tie <= 0) Double.NaN else h0 / tie
      val eps = if (n > 1) h / (n - 1.0) else Double.NaN
      val eta = if (n - k > 0) math.max(0.0, (h - k + 1.0) / (n - k)) else Double.NaN
      r.getString(0) -> KruskalRow(h, eps, eta)
    }.toMap
  }

  /** Average rank of each value within fid over grouped `(fid, value, n)`
    * counts WITHOUT a per-feature single-task window: a window partitioned
    * by `fid` alone puts a feature's ENTIRE grouped-count table in one
    * task — for a high-cardinality quantitative (id-like) feature that is
    * ~|rows| rows through one task at corpus scale. Instead, global
    * approximate splits of the value range bucket the cumulative sum
    * (exactness unaffected — buckets only partition it), small per-(fid,
    * bucket) totals collect for driver-side exclusive offsets, and the
    * window runs within (fid, bucket) — the same shape as the continuous
    * carver's rank job and prebin/Quantiles.exactEdgesDF. Rank values are
    * identical (exact integer-count arithmetic). NaN values route to the
    * LAST bucket, matching their position in an ascending value sort.
    */
  private def bucketedAvgRank(grouped: DataFrame, valueCol: String, out: String,
      keepTie: Boolean = false): DataFrame = {
    val splits = grouped.stat.approxQuantile(valueCol, (1 until 32).map(_ / 32.0).toArray, 0.05)
      .filterNot(_.isNaN).distinct.sorted
    val bucketCol = graft.transform.BinarySearchBucketize.column(
      col(valueCol), splits.toVector, splits.indices.toVector :+ splits.length,
      nanBin = splits.length)
    val gB = grouped.withColumn("bucket", bucketCol)
    val per = gB.groupBy(col("fid"), col("bucket")).agg(sum(col("n")).as("bn")).collect()
    val offs: Map[String, Long] = per.groupBy(_.getString(0)).toSeq.flatMap { case (fid, rows) =>
      val sorted = rows.toSeq.sortBy(_.getInt(1))
      sorted.scanLeft(0L)((acc, r) => acc + r.getLong(2)).init.zip(sorted)
        .map { case (off, r) => s"$fid#${r.getInt(1)}" -> off }
    }.toMap
    val offsetExpr =
      if (offs.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offs), concat_ws("#", col("fid"), col("bucket"))), lit(0L))
    val w = Window.partitionBy(col("fid"), col("bucket")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    gB
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)) + offsetExpr)
      .select(Seq(col("fid"), col(valueCol), (col("cum") + (col("n") + 1) / 2.0).as(out)) ++
        (if (keepTie) Seq(col("n").as("tie")) else Nil): _*)
  }

  private def selectWith(
      df: DataFrame,
      target: String,
      quants: Seq[String],
      quals: Seq[String],
      config: Config,
      assocOverride: Map[String, Double],
      // ranking-measure display names per kind (the report's `measure`
      // column — reference strips the "Measure" suffix the same way)
      measureNames: Map[String, String] = Map(
        "quantitative" -> "Pearson", "categorical" -> "CramerV"),
      qualHist: Option[Map[String, Array[BinaryCarver.HistRow]]] = None,
      spearmanPre: Option[Map[String, Double]] = None
  ): Selection = {
    // gate metrics and outlier rates are data-independent aggregations over
    // the same frame — overlapped (guide §2.6); results unchanged
    val (quantMetrics, (qualMetrics, outliers)) = concurrently(
      quantitativeMetricsWith(df, target, quants, spearmanPre),
      concurrently(
        qualHist match {
          case Some(h) => qualitativeMetricsFromHist(h, quals)
          case None => qualitativeMetrics(df, target, quals)
        },
        if (config.maxZscoreOutlierRate.nonEmpty || config.maxIqrOutlierRate.nonEmpty)
          outlierRates(df, quants)
        else Map.empty: Map[String, OutlierRates]))
    val metrics = (quantMetrics ++ qualMetrics)
      .values.toVector
      .map(m => assocOverride.get(m.name).fold(m)(a => m.copy(association = a)))
    val dropped = Vector.newBuilder[(FeatureRank, String)]
    val gated = metrics.filter { m =>
      val nanOk = m.nanFreq <= config.maxNanFreq
      val modeOk = m.modeFreq.isNaN || m.modeFreq <= config.maxModeFreq
      val cardOk = m.cardinality > 1
      val zOk = config.maxZscoreOutlierRate.forall(t =>
        outliers.get(m.name).forall(_.zscoreRate <= t))
      val iOk = config.maxIqrOutlierRate.forall(t =>
        outliers.get(m.name).forall(_.iqrRate <= t))
      if (!nanOk) dropped += ((m, f"nan_freq=${m.nanFreq}%.3f"))
      else if (!modeOk) dropped += ((m, f"mode_freq=${m.modeFreq}%.3f"))
      else if (!cardOk) dropped += ((m, "constant"))
      else if (!zOk) dropped += ((m, f"zscore_outliers=${outliers(m.name).zscoreRate}%.3f"))
      else if (!iOk) dropped += ((m, f"iqr_outliers=${outliers(m.name).iqrRate}%.3f"))
      nanOk && modeOk && cardOk && zOk && iOk
    }
    // pairwise association matrices over the gated survivors only
    // (independent per kind — overlapped, §2.6)
    val gatedQuants = gated.filter(_.kind == "quantitative").map(_.name)
    val gatedQuals = gated.filter(_.kind == "categorical").map(_.name)
    val (quantAssoc, qualAssoc) = concurrently(
      quantCorrMatrix(df, gatedQuants), qualPairMatrix(df, gatedQuals))
    val assoc = quantAssoc ++ qualAssoc

    // per-kind caps: either the flat nBest, or the largest-remainder split
    // of one total budget (F5)
    val budgets: Map[String, Int] = config.totalBudget match {
      case Some(tb) => splitBudget(tb, Seq("quantitative" -> quants.size, "categorical" -> quals.size))
      case None => Map("quantitative" -> config.nBest, "categorical" -> config.nBest)
    }
    val ranked = gated.sortBy(m => (-nz(m.association), m.name))
    val kept = mutable.ArrayBuffer.empty[FeatureRank]
    // redundancy drops keep their (correlated-with, value) for the report
    val redundancyInfo = mutable.Map.empty[String, (String, Double)]
    ranked.foreach { m =>
      val perKind = kept.count(_.kind == m.kind)
      if (perKind >= budgets.getOrElse(m.kind, config.nBest)) dropped += ((m, "budget"))
      else {
        val redundantWith = kept.find(k =>
          k.kind == m.kind && assoc.getOrElse((k.name, m.name), 0.0) > config.redundancyThreshold)
        redundantWith match {
          case Some(k) =>
            dropped += ((m, s"redundant_with=${k.name}"))
            redundancyInfo(m.name) = (k.name, assoc.getOrElse((k.name, m.name), 0.0))
          case None => kept += m
        }
      }
    }
    val droppedV = dropped.result()
    // uniform ranking table (reference format_ranked_features): every
    // feature keeps its gate values; per-kind association rank among gate
    // survivors; gated-out features have no rank
    val reasonOf = droppedV.map { case (m, r) => m.name -> r }.toMap
    val rankOf: Map[String, Int] = ranked.groupBy(_.kind).flatMap { case (_, ms) =>
      ms.zipWithIndex.map { case (m, i) => m.name -> (i + 1) }
    }
    val report = metrics.map { m =>
      val red = redundancyInfo.get(m.name)
      ReportRow(m.name, m.kind, m.nanFreq, m.modeFreq,
        measureNames.getOrElse(m.kind, ""), m.association,
        rankOf.get(m.name),
        red.map(_ => "Redundancy"), red.map(_._2), red.map(_._1),
        kept = !reasonOf.contains(m.name), reason = reasonOf.getOrElse(m.name, ""))
    }
    Selection(kept.toVector, droppedV, report)
  }

  private def nz(d: Double): Double = if (d.isNaN) Double.NegativeInfinity else d
}
