package graft.carve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

import graft.carve.BinaryCarver.{FeatureSpec, FittedFeature, NanLabel, OtherLabel}
import graft.carve.OrdinalCarver.{KHistRow, KPrep}

/** Supervised optimal discretization against an UNORDERED multiclass target
  * (K > 2 classes) — the Spark-native re-expression of the reference's
  * MulticlassCarver (`carvers/multiclass_carver.py`): one carving per
  * feature against the full (modalities × classes) crosstab, association by
  * Tschuprow's T / Cramér's V generalised to K columns, modalities ordered
  * and viability-rated by correspondence-analysis first-axis score.
  *
  * Cluster/driver split mirrors BinaryCarver: ONE
  * `groupBy(feature, value, class).count()` long-form pass; everything else
  * is driver-side math over the collected crosstabs.
  */
object MulticlassCarver {

  final case class Config(
      minFreq: Double = 0.02,
      maxNMod: Int = 5,
      sortBy: String = "tschuprowt", // tschuprowt (default) | cramerv
      minFreqAlpha: Double = 0.05,
      topKInitial: Int = 2000,
      escalate: Boolean = false,
      maxHistogramRows: Long = 5000000L,
      cv: Int = 0,
      foldCol: String = null,
      rescue: Boolean = false,
      sketchCardinalityThreshold: Long = 2000000L,
      sketchRelativeError: Double = 0.0001,
      history: Boolean = true
  ) {
    require(maxNMod >= 2, s"max_n_mod must be >= 2, got $maxNMod")
    // sklearn check_cv raises for a single split; 0 disables CV here
    require(cv == 0 || cv >= 2, s"cv=1 is not enough splits for k-fold cross-validation; use cv >= 2 (or 0 to disable), got $cv")
  }

  final case class MFitted(feature: FittedFeature, cramerv: Double, tschuprowt: Double,
      // fitted CA-axis rate (the reference's `rate_reference` for nominal
      // targets) for comparable new-sample rates at stability time (M4)
      rateRef: Ordinal.ORate = null)

  final case class Model(
      target: String,
      minFreq: Double,
      maxNMod: Int,
      sortBy: String,
      classes: Vector[String],
      features: Vector[MFitted]
  ) {
    def kept: Vector[MFitted] = features.filterNot(_.feature.dropped)
    /** Structural view shared with the binary machinery: powers transform
      * and the stability monitor (PSI/chi² over bin distributions applies
      * to any fitted bin structure).
      */
    def binaryView: BinaryCarver.Model = BinaryCarver.Model(target, minFreq, maxNMod, sortBy, features.map(_.feature))
    def transform(df: DataFrame, keepOriginal: Boolean = false): DataFrame =
      binaryView.transform(df, keepOriginal)
    def transformLabels(df: DataFrame): DataFrame = binaryView.transformLabels(df)
  }

  /** The one cluster pass for a string-class target: classes map to their
    * sorted (canonical) column order — `get_multiclass_crosstab` pins the
    * same order in the reference. Returns (histograms, sorted classes).
    */
  def histogramM(df: DataFrame, target: String, specs: Seq[FeatureSpec],
      sketched: Map[String, Vector[Double]] = Map.empty): (Map[String, Array[KHistRow]], Vector[String]) = {
    val y = col(target).cast("string")
    val long = df.select(explode(array(BinaryCarver.histEntries(specs, sketched): _*)).as("e"), y.as("__y"))
    val agg = long
      .groupBy(col("e.fid").as("fid"), col("e.dv").as("dv"), col("e.sv").as("sv"), col("__y"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    // reference validate_multiclass_target: NaN y raises (a null here would
    // otherwise become a class -- or NPE in the sort below)
    require(!agg.exists(_.isNullAt(3)),
      s"[MulticlassCarver] y ('$target') should not contain null")
    val classes = agg.map(_.getString(3)).distinct.sorted.toVector
    val classIdx = classes.zipWithIndex.toMap
    val byFid = mutable.Map.empty[String, mutable.ArrayBuffer[KHistRow]]
    agg.foreach { r =>
      val dvNull = r.isNullAt(1)
      val svNull = r.isNullAt(2)
      byFid.getOrElseUpdate(r.getString(0), mutable.ArrayBuffer.empty) += KHistRow(
        if (dvNull) Double.NaN else r.getDouble(1),
        if (svNull) null else r.getString(2),
        dvNull && svNull,
        classIdx(r.getString(3)).toDouble,
        r.getLong(4)
      )
    }
    (byFid.view.mapValues(_.toArray).toMap, classes)
  }

  /** Train class-histogram + all `cv` fold class-histograms from ONE pass
    * (fold key as one more groupBy column; total = fold sum; class order is
    * the canonical sorted order of the FULL data so fold levels are already
    * in the train class space). The single-scan C4 shape.
    */
  def histogramMWithFolds(df: DataFrame, target: String, specs: Seq[FeatureSpec], cv: Int,
      sketched: Map[String, Vector[Double]] = Map.empty,
      foldCol: Option[String] = None)
      : (Map[String, Array[KHistRow]], Vector[String], Seq[Map[String, Array[KHistRow]]]) = {
    val y = col(target).cast("string")
    val long = df.select(explode(array(BinaryCarver.histEntries(specs, sketched): _*)).as("e"), y.as("__y"),
      BinaryCarver.foldExpr(specs, target, cv, foldCol).as("__fold"))
    val agg = long
      .groupBy(col("e.fid").as("fid"), col("e.dv").as("dv"), col("e.sv").as("sv"),
        col("__y"), col("__fold"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    require(!agg.exists(_.isNullAt(3)),
      s"[MulticlassCarver] y ('$target') should not contain null")
    val classes = agg.map(_.getString(3)).distinct.sorted.toVector
    val classIdx = classes.zipWithIndex.toMap
    val folds = Vector.fill(cv)(mutable.Map.empty[String, mutable.ArrayBuffer[KHistRow]])
    val total = mutable.LinkedHashMap.empty[(String, Long, String, Int), (Boolean, Long)]
    agg.foreach { r =>
      val fid = r.getString(0)
      val dvNull = r.isNullAt(1)
      val svNull = r.isNullAt(2)
      val dv = if (dvNull) Double.NaN else r.getDouble(1)
      val sv = if (svNull) null else r.getString(2)
      val ci = classIdx(r.getString(3))
      val f = BinaryCarver.checkFoldId(r, 4, cv, "MulticlassCarver")
      val cnt = r.getLong(5)
      folds(f).getOrElseUpdate(fid, mutable.ArrayBuffer.empty) +=
        KHistRow(dv, sv, dvNull && svNull, ci.toDouble, cnt)
      val key = (fid, java.lang.Double.doubleToLongBits(dv), sv, ci)
      val (isNull, c0) = total.getOrElse(key, (dvNull && svNull, 0L))
      total(key) = (isNull, c0 + cnt)
    }
    val totalByFid = mutable.Map.empty[String, mutable.ArrayBuffer[KHistRow]]
    total.foreach { case ((fid, dvBits, sv, ci), (isNull, c)) =>
      totalByFid.getOrElseUpdate(fid, mutable.ArrayBuffer.empty) +=
        KHistRow(java.lang.Double.longBitsToDouble(dvBits), sv, isNull, ci.toDouble, c)
    }
    (totalByFid.view.mapValues(_.toArray).toMap, classes,
      folds.map(_.view.mapValues(_.toArray).toMap))
  }

  def fit(
      train: DataFrame,
      target: String,
      specs: Seq[FeatureSpec],
      dev: Option[DataFrame] = None,
      config: Config = Config()
  ): Model = {
    val guarded = BinaryCarver.guardTarget(target, specs)
    if (guarded.length != specs.length) return fit(train, target, guarded, dev, config)
    BinaryCarver.validateInputs(train, target, specs)
    require(!specs.exists(_.kind == "nested"),
      "nested features are not supported against an unordered multiclass target — the " +
        "reference's NestedDiscretizer target sort cannot score string classes " +
        "(series_target_rate crashes there); use Binary/Continuous/Ordinal carvers")
    val sketched = BinaryCarver.sketchHighCardinality(train, specs,
      BinaryCarver.Config(minFreq = config.minFreq,
        sketchCardinalityThreshold = config.sketchCardinalityThreshold,
        sketchRelativeError = config.sketchRelativeError))
    // one scan for the train histogram AND (when cv>1) every fold view —
    // histogramMWithFolds levels are already in the full-data class space
    val (trainHist, classes, foldHists) =
      if (config.cv > 1) histogramMWithFolds(train, target, specs, config.cv, sketched, Option(config.foldCol))
      else { val (h, c) = histogramM(train, target, specs, sketched); (h, c, Nil) }
    require(classes.length > 2,
      s"[MulticlassCarver] y has ${classes.length} classes; use BinaryCarver for <=2")
    // dev classes must map into the train class space (unseen dev classes raise
    // in the reference's ca_row_scores; here the histogram mapping raises)
    val devHist = dev.map { d =>
      val (h, devClasses) = histogramM(d, target, specs, sketched)
      // reference validate_multiclass_target raises on a mismatch in EITHER
      // direction -- a dev sample missing a train class would silently score
      // that class as all-zero otherwise
      val unseen = devClasses.filterNot(classes.contains)
      val missing = classes.filterNot(devClasses.contains)
      require(unseen.isEmpty && missing.isEmpty,
        s"[MulticlassCarver] Mismatched classes between y and y_dev: train-only $missing, dev-only $unseen")
      val remap = devClasses.zipWithIndex.map { case (c, i) => i.toDouble -> classes.indexOf(c).toDouble }.toMap
      h.view.mapValues(_.map(r => r.copy(level = remap(r.level)))).toMap
    }
    fitFromHistograms(trainHist, devHist, target, specs, classes, config, foldHists)
  }

  def fitFromHistograms(
      trainHist: Map[String, Array[KHistRow]],
      devHist: Option[Map[String, Array[KHistRow]]],
      target: String,
      specs: Seq[FeatureSpec],
      classes: Vector[String],
      config: Config = Config(),
      foldHists: Seq[Map[String, Array[KHistRow]]] = Nil
  ): Model = {
    require(specs.nonEmpty, "no features to carve")
    val histRows = trainHist.values.map(_.length.toLong).sum
    require(histRows <= config.maxHistogramRows,
      s"histogram too large ($histRows rows) — use the sketch prebin path for high-cardinality columns")
    val levels = classes.indices.map(_.toDouble).toVector

    val halfMinFreq = config.minFreq / 2.0
    val q = math.rint(1.0 / halfMinFreq).toInt
    def totalOf(name: String): Long = trainHist(name).map(_.count).sum

    val prep: Map[String, KPrep] = specs.map { s =>
      s.name -> (s.kind match {
        case "quantitative" =>
          prepQuantitativeM(trainHist(s.name), totalOf(s.name), levels, q, halfMinFreq, config)
        case "ordinal" =>
          prepOrdinalM(trainHist(s.name), totalOf(s.name), levels, s.ordinalOrder, halfMinFreq, config)
        case _ =>
          prepCategoricalM(trainHist(s.name), totalOf(s.name), levels, halfMinFreq, config)
      })
    }.toMap

    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fitted = Await.result(
      Future.traverse(specs.toVector) { spec =>
        Future {
          val p = prep(spec.name)
          val devX = devHist.map(h => OrdinalCarver.devKXaggOf(spec, p, h.getOrElse(spec.name, Array.empty), levels))
          val foldXs = foldHists.map(h => OrdinalCarver.devKXaggOf(spec, p, h.getOrElse(spec.name, Array.empty), levels))
            .filter(_.labels.nonEmpty)
          searchFeatureM(spec, p, devX.filter(_.labels.nonEmpty), config, foldXs)
        }
      },
      Duration.Inf
    )
    Model(target, config.minFreq, config.maxNMod, config.sortBy, classes, fitted)
  }

  /** Quantitative prep for a nominal target: quantile prebin as usual; the
    * rare-prebin merge "rate" is the prebin's CA first-axis score against
    * the class crosstab (`ordinal_discretizer.py:compute_stats` — an
    * unordered target has no numeric mean).
    */
  private[carve] def prepQuantitativeM(
      hist: Array[KHistRow], total: Long, levels: Vector[Double],
      q: Int, halfMinFreq: Double, config: Config
  ): KPrep = {
    val levelIdx = levels.zipWithIndex.toMap
    val nonNull = hist.filterNot(_.isNull)
    val nanRows = hist.filter(_.isNull)
    val byVal = mutable.TreeMap.empty[Double, Long]
    nonNull.foreach(r => byVal(r.dv) = byVal.getOrElse(r.dv, 0L) + r.count)
    val edges = Prebin.findQuantiles(byVal.keys.toArray, byVal.values.toArray, total, q)
    val nPrebins = edges.length + 1
    val mat = Array.fill(nPrebins, levels.length)(0.0)
    val cnt = new Array[Double](nPrebins)
    nonNull.foreach { r =>
      val idx = BinaryCarver.searchsortedLeft(edges, r.dv)
      mat(idx)(levelIdx(r.level)) += r.count
      cnt(idx) += r.count
    }
    val labels = Vector.tabulate(nPrebins)(BinaryCarver.quantLabel)
    val hasRare = cnt.exists(c => Stats.isSignificantlyBelow(c, total, halfMinFreq, config.minFreqAlpha))
    val groups =
      if (hasRare) {
        // per-prebin CA score × count as the merge "target sum"
        val scores = Ca.caRowScores(mat, Ca.fitCaAxis(mat))
        val sy = Array.tabulate(nPrebins)(i => cnt(i) * scores(i))
        Prebin.findCommonModalities(labels, cnt, sy, total, halfMinFreq, config.minFreqAlpha)
      } else labels.map(Vector(_))
    val leaderOf = groups.flatMap(g => g.map(_ -> g.head)).toMap
    val order = groups.map(_.head)
    val pos = labels.zipWithIndex.toMap
    val gMat = groups.map { g =>
      val row = new Array[Double](levels.length)
      g.foreach { l => val p = pos(l); var j = 0; while (j < row.length) { row(j) += mat(p)(j); j += 1 } }
      row
    }.toArray
    val hasNan = nanRows.nonEmpty
    val nanRow = {
      val row = new Array[Double](levels.length)
      nanRows.foreach(r => row(levelIdx(r.level)) += r.count)
      row
    }
    val xLabels = if (hasNan) order :+ NanLabel else order
    val m = if (hasNan) gMat :+ nanRow else gMat
    KPrep("quantitative", edges, labels.map(leaderOf), Map.empty, order,
      Ordinal.KXagg(xLabels, levels, m), hasNan, hasDefault = false)
  }

  /** Categorical prep for a nominal target: rare→OTHER, then modality order
    * by CA first-axis score ascending (`categorical_discretizer.py:182-191`,
    * ties by label via the crosstab's sorted index).
    */
  private[carve] def prepCategoricalM(
      hist: Array[KHistRow], total: Long, levels: Vector[Double],
      halfMinFreq: Double, config: Config
  ): KPrep = {
    val levelIdx = levels.zipWithIndex.toMap
    val nonNull = hist.filterNot(_.isNull)
    val nanRows = hist.filter(_.isNull)
    locally {
      val perValue = mutable.Map.empty[String, Double]
      hist.foreach(r => perValue(if (r.isNull) null else r.sv) =
        perValue.getOrElse(if (r.isNull) null else r.sv, 0.0) + r.count)
      Prebin.frequencyGate(perValue.values, total, halfMinFreq, config.rescue, "categorical")
    }
    val valCounts = mutable.Map.empty[String, Double]
    nonNull.foreach(r => valCounts(r.sv) = valCounts.getOrElse(r.sv, 0.0) + r.count)
    val rare = Prebin.rareCategoricals(valCounts.toMap, total, halfMinFreq, config.minFreqAlpha, NanLabel).toSet
    val hasDefault = rare.nonEmpty
    val valueToRaw = nonNull.map(r => r.sv -> (if (rare(r.sv)) OtherLabel else r.sv)).toMap
    val mats = mutable.Map.empty[String, Array[Double]]
    nonNull.foreach { r =>
      val lbl = valueToRaw(r.sv)
      mats.getOrElseUpdate(lbl, new Array[Double](levels.length))(levelIdx(r.level)) += r.count
    }
    // CA scores over the sorted-label crosstab (pd.crosstab sorts its index)
    val sortedLabels = mats.keys.toVector.sorted
    val labelMat = sortedLabels.map(mats(_)).toArray
    val scores = Ca.caRowScores(labelMat, Ca.fitCaAxis(labelMat))
    val order = sortedLabels.zip(scores).sortBy(_._2).map(_._1) // stable: ties keep sorted order
    val hasNan = nanRows.nonEmpty
    val nanRow = {
      val row = new Array[Double](levels.length)
      nanRows.foreach(r => row(levelIdx(r.level)) += r.count)
      row
    }
    val xLabels = if (hasNan) order :+ NanLabel else order
    val m = (order.map(mats(_)) ++ (if (hasNan) Vector(nanRow) else Vector.empty)).toArray
    KPrep("categorical", Vector.empty, Vector.empty, valueToRaw, order,
      Ordinal.KXagg(xLabels, levels, m), hasNan, hasDefault)
  }

  /** Declared-ordinal feature prep against a NOMINAL target: declared
    * order preserved; the rare-merge "rate" substitutes each modality's
    * CA first-axis score (`ordinal_discretizer.py:compute_stats` —
    * `_ca_row_scores` — an unordered target has no numeric mean).
    */
  private[carve] def prepOrdinalM(
      hist: Array[KHistRow], total: Long, levels: Vector[Double], declared: Seq[String],
      halfMinFreq: Double, config: Config
  ): KPrep = {
    require(declared.nonEmpty, "[ordinal] declared value order is empty")
    require(!declared.contains(NanLabel),
      s"[ordinal] ordering for '$NanLabel' can't be set by user, only fitted on data")
    val levelIdx = levels.zipWithIndex.toMap
    val nonNull = hist.filterNot(_.isNull)
    val nanRows = hist.filter(_.isNull)
    locally {
      val perValue = mutable.Map.empty[String, Double]
      hist.foreach(r => perValue(if (r.isNull) null else r.sv) =
        perValue.getOrElse(if (r.isNull) null else r.sv, 0.0) + r.count)
      Prebin.frequencyGate(perValue.values, total, halfMinFreq, config.rescue, "ordinal")
    }
    val undeclared = nonNull.map(_.sv).distinct.filterNot(declared.contains).sorted
    require(undeclared.isEmpty,
      s"[ordinal] observed values not in the declared order: ${undeclared.mkString(", ")}")
    val labels = declared.toVector
    val pos = labels.zipWithIndex.toMap
    val mat = Array.fill(labels.length, levels.length)(0.0)
    val cnt = new Array[Double](labels.length)
    nonNull.foreach { r =>
      val i = pos(r.sv)
      mat(i)(levelIdx(r.level)) += r.count
      cnt(i) += r.count
    }
    val hasRare = cnt.exists(c => Stats.isSignificantlyBelow(c, total, halfMinFreq, config.minFreqAlpha))
    val groups =
      if (hasRare) {
        val scores = Ca.caRowScores(mat, Ca.fitCaAxis(mat))
        val sy = Array.tabulate(labels.length)(i => cnt(i) * scores(i))
        Prebin.findCommonModalities(labels, cnt, sy, total, halfMinFreq, config.minFreqAlpha)
      } else labels.map(Vector(_))
    val leaderOf = groups.flatMap(g => g.map(_ -> g.head)).toMap
    val valueToRaw = nonNull.map(r => r.sv -> leaderOf(r.sv)).toMap
    val order = groups.map(_.head)
    val gMat = groups.map { g =>
      val row = new Array[Double](levels.length)
      g.foreach { l => val p = pos(l); var j = 0; while (j < row.length) { row(j) += mat(p)(j); j += 1 } }
      row
    }.toArray
    val hasNan = nanRows.nonEmpty
    val nanRow = {
      val row = new Array[Double](levels.length)
      nanRows.foreach(r => row(levelIdx(r.level)) += r.count)
      row
    }
    val xLabels = if (hasNan) order :+ NanLabel else order
    val m = if (hasNan) gMat :+ nanRow else gMat
    KPrep("ordinal", Vector.empty, Vector.empty, valueToRaw, order,
      Ordinal.KXagg(xLabels, levels, m), hasNan, hasDefault = false,
      members = groups.map(g => g.head -> g).toMap)
  }

  private[carve] def searchFeatureM(spec: FeatureSpec, p: KPrep, devX: Option[Ordinal.KXagg], config: Config,
      folds: Seq[Ordinal.KXagg] = Nil): MFitted = {
    val histBuf =
      if (config.history) scala.collection.mutable.ArrayBuffer.empty[Search.HistoryEntry] else null
    def run(minFreq: Option[Double]) = Multiclass.bestCombination(
      p.xagg, devX, config.maxNMod, minFreq, config.minFreqAlpha,
      config.sortBy, p.hasNan, NanLabel, dropna = true, config.topKInitial, config.escalate, folds,
      histSink = histBuf, rescueMode = minFreq.isEmpty)
    val normal = run(Some(config.minFreq))
    val best =
      if (normal.isEmpty && config.rescue && (devX.nonEmpty || folds.nonEmpty)) run(None)
      else normal

    best match {
      case None =>
        MFitted(FittedFeature(spec.name, p.kind, p.prebinEdges, Vector.empty, Map.empty,
          -1, -1, p.hasNan, p.hasDefault, Vector.empty, Double.NaN, Double.NaN,
          Vector.empty, dropped = true, droppedReason = "no viable combination",
          history = if (histBuf == null) Vector.empty else histBuf.toVector),
          Double.NaN, Double.NaN, Multiclass.CAScoreRate(Ca.fitCaAxis(p.xagg.m)))
      case Some(b) =>
        val labelToBin: Map[String, Int] =
          b.combination.zipWithIndex.flatMap { case (g, i) => g.map(_ -> i) }.toMap
        val nanBin = labelToBin.getOrElse(NanLabel, -1)
        val f =
          if (p.kind == "quantitative") {
            val prebinToBin = p.prebinLeader.map(l => labelToBin.getOrElse(l, -1))
            val prep = BinaryCarver.Prep(p.kind, p.prebinEdges, p.prebinLeader, p.valueToRaw,
              p.rawOrder, Search.Xagg(Vector.empty, Array.empty, Array.empty), p.hasNan, p.hasDefault)
            val binLabels = BinaryCarver.quantBinLabels(b.combination, prep, nanBin)
            FittedFeature(spec.name, p.kind, p.prebinEdges, prebinToBin, Map.empty,
              nanBin, -1, p.hasNan, p.hasDefault, binLabels, b.cramerv, b.tschuprowt,
              b.rates, dropped = false, droppedReason = "",
              history = if (histBuf == null) Vector.empty else histBuf.toVector)
          } else {
            val valueToBin = p.valueToRaw.collect {
              case (v, raw) if labelToBin.contains(raw) => v -> labelToBin(raw)
            }
            val otherBin = labelToBin.getOrElse(OtherLabel, -1)
            val binLabels = b.combination.map(g =>
              g.flatMap(l => p.members.getOrElse(l, Vector(l))).mkString(", "))
            FittedFeature(spec.name, p.kind, Vector.empty, Vector.empty, valueToBin,
              nanBin, otherBin, p.hasNan, p.hasDefault, binLabels, b.cramerv, b.tschuprowt,
              b.rates, dropped = false, droppedReason = "",
              history = if (histBuf == null) Vector.empty else histBuf.toVector)
          }
        MFitted(f, b.cramerv, b.tschuprowt, Multiclass.CAScoreRate(Ca.fitCaAxis(p.xagg.m)))
    }
  }
}

/** One-vs-rest multiclass carving (`carvers/one_vs_rest_carver.py`): the
  * classes are sorted, the first is dropped, and a full BinaryCarver fit
  * runs per remaining class on the binarized target `y == class`. Each fit
  * produces per-class feature versions named `<feature>__y=<class>`
  * (`features/features.py:866`) — the reference's S2 column aliasing.
  */
object OneVsRestCarver {

  final case class Model(
      target: String,
      classes: Vector[String], // carved classes (first sorted class dropped)
      perClass: Map[String, BinaryCarver.Model]
  ) {
    def versionName(feature: String, yClass: String): String = s"${feature}__y=$yClass"

    /** Adds one bin column per kept (class, feature) version:
      * `<feature>__y=<class>_bin`. Pure projection (no shuffle), same as the
      * binary transform — K−1 bucketize expressions per feature.
      */
    def transform(df: DataFrame): DataFrame =
      classes.foldLeft(df) { (d, yClass) =>
        val m = perClass(yClass)
        m.kept.foldLeft(m.transform(d, keepOriginal = true)) { (dd, f) =>
          dd.withColumnRenamed(s"${f.name}_bin", s"${versionName(f.name, yClass)}_bin")
        }
      }
  }

  /** Binary projection of a class-histogram: for class index `ci`, each
    * (feature, value) row gets count = Σ over classes, sumY = count of `ci`
    * — the `y == class` crosstab column sums, no second scan
    * (`one_vs_rest_carver.py:20-155` fits every class from the same data).
    */
  private[carve] def binarize(kHist: Map[String, Array[KHistRow]], ci: Double)
      : Map[String, Array[BinaryCarver.HistRow]] =
    kHist.map { case (fid, rows) =>
      val acc = mutable.LinkedHashMap.empty[(Long, String), (Boolean, Long, Double)]
      rows.foreach { r =>
        val key = (java.lang.Double.doubleToLongBits(r.dv), r.sv)
        val (isNull, c0, s0) = acc.getOrElse(key, (r.isNull, 0L, 0.0))
        acc(key) = (isNull, c0 + r.count, s0 + (if (r.level == ci) r.count.toDouble else 0.0))
      }
      fid -> acc.map { case ((dvBits, sv), (isNull, c, s)) =>
        BinaryCarver.HistRow(java.lang.Double.longBitsToDouble(dvBits), sv, isNull, c, s)
      }.toArray
    }

  /** Single-pass fit: ONE shared sketch pass (target-independent) + ONE
    * class-histogram scan (plus one per fold-free dev) feed all K−1 binary
    * fits — the per-class crosstabs are driver-side column-sum projections
    * of the same aggregate, so fit job count is independent of K.
    */
  def fit(
      train: DataFrame,
      target: String,
      specs: Seq[FeatureSpec],
      dev: Option[DataFrame] = None,
      config: BinaryCarver.Config = BinaryCarver.Config()
  ): Model = {
    val guarded = BinaryCarver.guardTarget(target, specs)
    if (guarded.length != specs.length) return fit(train, target, guarded, dev, config)
    BinaryCarver.validateInputs(train, target, specs)
    // nested specs are fine HERE (unlike the CA MulticlassCarver): each
    // class is a binary sub-fit, so the rollup's target sort runs per class
    // on the binarized rate — matching the reference, where OvR + nested
    // works while the CA carver's NestedDiscretizer sort crashes on string y
    val sketched = BinaryCarver.sketchHighCardinality(train, specs, config)
    // the class-histogram scan also yields the class set: no distinct() pass.
    // cv>1 folds share the same scan (fold key = one more groupBy column);
    // the fold assignment hashes the raw class label (deterministic, shared
    // across classes) rather than each per-class binarized target.
    val (kHist, classes, kFolds) =
      if (config.cv > 1) MulticlassCarver.histogramMWithFolds(train, target, specs, config.cv, sketched, Option(config.foldCol))
      else { val (h, c) = MulticlassCarver.histogramM(train, target, specs, sketched); (h, c, Nil) }
    require(classes.length > 2, s"[OneVsRestCarver] y has ${classes.length} classes; use BinaryCarver for <=2")
    val carved = classes.drop(1) // reference drops the first sorted class
    val devK = dev.map { d =>
      val (h, devClasses) = MulticlassCarver.histogramM(d, target, specs, sketched)
      // reference validate_multiclass_target: class-set mismatch in either
      // direction raises (a missing dev class would silently binarize to
      // an all-zero dev target for that class's fit)
      val devOnly = devClasses.filterNot(classes.contains)
      val trainOnly = classes.filterNot(devClasses.contains)
      require(devOnly.isEmpty && trainOnly.isEmpty,
        s"[OneVsRestCarver] Mismatched classes between y and y_dev: train-only $trainOnly, dev-only $devOnly")
      (h, devClasses)
    }
    fitFromHistograms(kHist, classes, target, specs, config, kFolds, devK)
  }

  /** Driver-side remainder of [[fit]] over a precomputed class-histogram —
    * the K−1 binary sub-fits are column-sum projections of the SAME
    * aggregate, so a caller that already holds the (kHist, classes) pass
    * (e.g. shared with a CA multiclass fit over the same frame) pays zero
    * extra cluster work.
    */
  def fitFromHistograms(
      kHist: Map[String, Array[KHistRow]],
      classes: Vector[String],
      target: String,
      specs: Seq[FeatureSpec],
      config: BinaryCarver.Config = BinaryCarver.Config(),
      kFolds: Seq[Map[String, Array[KHistRow]]] = Nil,
      devK: Option[(Map[String, Array[KHistRow]], Vector[String])] = None
  ): Model = {
    require(classes.length > 2, s"[OneVsRestCarver] y has ${classes.length} classes; use BinaryCarver for <=2")
    val carved = classes.drop(1) // reference drops the first sorted class
    val perClass = carved.map { yClass =>
      val ci = classes.indexOf(yClass).toDouble
      val trainHist = binarize(kHist, ci)
      val devHist = devK.map { case (h, devClasses) =>
        val di = devClasses.indexOf(yClass).toDouble // -1 => class absent, all sumY 0
        binarize(h, di)
      }
      val foldHists = kFolds.map(binarize(_, ci))
      yClass -> BinaryCarver.fitFromHistograms(trainHist, devHist, "__ovr_y", specs, config, foldHists)
    }.toMap
    Model(target, carved, perClass)
  }
}
