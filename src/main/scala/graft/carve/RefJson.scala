package graft.carve

import org.json4s._
import org.json4s.jackson.JsonMethods
import scala.collection.mutable

/** Reference-schema JSON interop (S3): read and write the EXACT artifact
  * format the reference's `BaseDiscretizer.save`/`load` uses
  * (`base_discretizer.py:565-663`, `features/utils/serialization.py:
  * 117-199`, `features/features.py:759-830`):
  *
  *  - top level `{features: {version: {...}, is_fitted}, min_freq,
  *    is_fitted, config, max_n_mod, combination_evaluator,
  *    dropped_features}`;
  *  - per feature: GroupedList `values` (bin leaders, `"__INF__"` for the
  *    +inf edge) and `content` — a JSON-dumps STRING of
  *    `{leader: [members..., leader]}` whose float keys are Python
  *    `str(float)` renderings (fixed back at load via the `values` list);
  *  - type discriminators `is_quantitative`/`is_categorical`/... select
  *    the feature class at load;
  *  - per-bin `statistics` (`target_mean`/`frequency`/`count` keyed by
  *    display label).
  *
  * A model loaded from a reference-saved JSON transforms identically to
  * the reference (pinned by RefJsonSpec against `tools/gen_ref_saved.py`
  * fixtures, which execute the reference itself), and a model written here
  * loads back into the reference (`gen_ref_saved.py --check-load`).
  */
object RefJson {
  private val Inf = "__INF__"
  private val Nan = BinaryCarver.NanLabel
  private val Other = BinaryCarver.OtherLabel

  /** Python `str(float)` for the range of values a carver produces:
    * integral doubles render as "2.0", everything else via Java's
    * shortest-roundtrip rendering (identical to CPython repr for doubles
    * within e-4..e16, the quantile-edge range).
    */
  private[carve] def pyFloatStr(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e16) s"${d.toLong}.0" else d.toString

  private def numOf(v: JValue): Double = v match {
    case JString(Inf) => Double.PositiveInfinity
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"not a numeric value: $other")
  }

  private def bool(v: JValue, default: Boolean = false): Boolean = v match {
    case JBool(b) => b
    case _ => default
  }

  // --------------------------------------------------------------- read

  def load(path: String): BinaryCarver.Model =
    read(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def read(json: String): BinaryCarver.Model = {
    val (m, _) = readWithRaw(json)
    m
  }

  /** Parses the model plus each feature's raw JSON (for family readers that
    * need `rate_reference` payloads).
    */
  private def readWithRaw(json: String): (BinaryCarver.Model, Vector[(String, JValue)]) = {
    val top = JsonMethods.parse(json)
    val minFreq = numOf(top \ "min_freq")
    val maxNMod = (top \ "max_n_mod") match { case JInt(i) => i.toInt; case _ => 5 }
    val sortBy = (top \ "combination_evaluator" \ "sort_by") match {
      case JString(s) => s
      case _ => "tschuprowt"
    }
    val rateName = (top \ "combination_evaluator" \ "target_rate") match {
      case JString(s) => s
      case _ => "target_mean"
    }
    val raw = (top \ "features") match {
      case JObject(fields) => fields.collect {
        case (version, fj: JObject) if version != "is_fitted" => version -> (fj: JValue)
      }.toVector
      case _ => Vector.empty
    }
    val feats = raw.map { case (version, fj) => readFeature(version, fj.asInstanceOf[JObject], rateName) }
    (BinaryCarver.Model("y", minFreq, maxNMod, sortBy, feats), raw)
  }

  /** Continuous-family load: same structural read; per-bin stds restored
    * from the statistics `std` column.
    */
  def readContinuous(json: String): BinaryCarver.Model = read(json)

  def loadOrdinal(path: String): OrdinalCarver.Model =
    readOrdinal(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Ordinal-family load: features plus each one's fitted ridit marginal
    * (`rate_reference.levels/counts`) — enough to recompute comparable
    * rates on a new sample at stability time.
    */
  def readOrdinal(json: String): OrdinalCarver.Model = {
    val (m, raw) = readWithRaw(json)
    val refs = raw.toMap
    val fitted = m.features.map { f =>
      val rr = refs.get(f.name).map(_ \ "rate_reference").getOrElse(JNothing)
      val rate: Ordinal.ORate = rr match {
        case JObject(_) =>
          val levels = arrOf(rr \ "levels").map(numOf).toArray
          val counts = arrOf(rr \ "counts").map(numOf).toArray
          Ordinal.TargetMeanRidit(levels, counts)
        case _ => null
      }
      OrdinalCarver.OFitted(f, Double.NaN, Double.NaN, Double.NaN, rate)
    }
    val levels = fitted.flatMap(of => Option(of.rateRef)).collectFirst {
      case Ordinal.TargetMeanRidit(lv, _) if lv != null => lv.toVector
    }.getOrElse(Vector.empty)
    OrdinalCarver.Model(m.target, m.minFreq, m.maxNMod, m.sortBy, levels, fitted)
  }

  def loadMulticlass(path: String): MulticlassCarver.Model =
    readMulticlass(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Multiclass-family load: features plus each one's fitted CA axis. The
    * reference schema carries no class NAMES (only col_mass/v1), so
    * `classes` is empty — the stability monitor re-derives class order from
    * the scored sample, exactly like the reference does.
    */
  def readMulticlass(json: String): MulticlassCarver.Model = {
    val (m, raw) = readWithRaw(json)
    val refs = raw.toMap
    val fitted = m.features.map { f =>
      val rr = refs.get(f.name).map(_ \ "rate_reference").getOrElse(JNothing)
      val rate: Ordinal.ORate = rr match {
        case JObject(_) =>
          val colMass = arrOf(rr \ "col_mass").map(numOf).toArray
          val v1 = arrOf(rr \ "v1").map(numOf).toArray
          val degen = bool(rr \ "degenerate")
          Multiclass.CAScoreRate(Ca.CAAxis(colMass, v1, degen))
        case _ => null
      }
      MulticlassCarver.MFitted(f, Double.NaN, Double.NaN, rate)
    }
    // engine extension: class names restored when present (absent from
    // true reference artifacts — stability then derives order from the
    // scored sample, with the documented same-K class-swap blind spot)
    val classes = (JsonMethods.parse(json) \ "y_classes") match {
      case JArray(a) => a.collect { case JString(c) => c }.toVector
      case _ => Vector.empty
    }
    MulticlassCarver.Model(m.target, m.minFreq, m.maxNMod, m.sortBy, classes, fitted)
  }

  private def arrOf(v: JValue): List[JValue] = v match { case JArray(a) => a; case _ => Nil }

  private def readFeature(version: String, fj: JObject, rateName: String = "target_mean"): BinaryCarver.FittedFeature = {
    val j: JValue = fj
    val isQuant = bool(j \ "is_quantitative")
    val hasNan = bool(j \ "has_nan")
    val hasDefault = bool(j \ "has_default")
    val values: List[JValue] = (j \ "values") match { case JArray(a) => a; case _ => Nil }
    val contentRaw = (j \ "content") match {
      case JString(s) => JsonMethods.parse(s)
      case o => o // tolerate an un-stringified dict
    }
    val contentFields: List[(String, List[JValue])] = contentRaw match {
      case JObject(fs) => fs.map { case (k, JArray(a)) => k -> a; case (k, o) => k -> List(o) }
      case _ => Nil
    }
    // per-bin member lists in `values` order: float keys were stringified
    // by json.dumps, so match leaders to content keys by parsed value
    def keyMatches(key: String, leader: JValue): Boolean = leader match {
      case JString(s) => key == s
      case _ =>
        val d = numOf(leader)
        key == pyFloatStr(d) || (try key.toDouble == d catch { case _: Exception => false })
    }
    val groups: Vector[List[JValue]] = values.map { leader =>
      contentFields.find { case (k, _) => keyMatches(k, leader) } match {
        case Some((_, members)) => members
        case None => List(leader)
      }
    }.toVector

    val stats = (j \ "statistics")
    def statMap(name: String): Vector[(String, Double)] = (stats \ name) match {
      case JObject(fs) => fs.collect { case (k, v) if v != JNull => k -> numOf(v) }.toVector
      case _ => Vector.empty
    }
    // the rate column is keyed by the family rate's name (target_mean /
    // target_mean_ridit / ca_score / ...); fall back to target_mean
    val tm = { val v = statMap(rateName); if (v.nonEmpty) v else statMap("target_mean") }
    val fr = statMap("frequency").toMap
    val cn = statMap("count").toMap
    // continuous family: per-bin sample std rides the same statistics dict.
    // keys may carry null (singleton bins, ddof=1) — keep positional order
    val stdByLabel = (stats \ "std") match {
      case JObject(fs) => fs.map { case (k, v) =>
        k -> (v match { case JNull => Double.NaN; case x => numOf(x) })
      }.toMap
      case _ => Map.empty[String, Double]
    }

    if (isQuant) {
      val memberVals: Vector[Vector[Either[String, Double]]] = groups.map(_.map {
        case JString(Inf) => Right(Double.PositiveInfinity)
        case JString(s) => Left(s) // __NAN__
        case v => Right(numOf(v))
      }.toVector)
      val edges = memberVals.flatten.collect { case Right(d) if !d.isInfinite => d }
        .distinct.sorted.toVector
      val nPrebins = edges.length + 1
      val prebinToBin = Array.fill(nPrebins)(-1)
      var nanBin = -1
      memberVals.zipWithIndex.foreach { case (ms, b) =>
        ms.foreach {
          case Right(d) if d.isPosInfinity => prebinToBin(edges.length) = b
          case Right(d) => prebinToBin(edges.indexOf(d)) = b
          case Left(Nan) => nanBin = b
          case Left(_) => ()
        }
      }
      val binLabels = memberVals.zipWithIndex.map { case (ms, b) =>
        val idxs = (0 until nPrebins).filter(prebinToBin(_) == b)
        val base =
          if (idxs.isEmpty) ""
          else {
            val lo = if (idxs.min == 0) "-inf" else fmt(edges(idxs.min - 1))
            val hi = if (idxs.max >= edges.length) "+inf" else fmt(edges(idxs.max))
            s"($lo, $hi]"
          }
        if (b == nanBin && base.nonEmpty) s"$base or $Nan" else if (b == nanBin) Nan else base
      }
      val rates = ratesFrom(tm, fr, cn, binLabels.length)
      val stds =
        if (stdByLabel.isEmpty || tm.length != binLabels.length) Vector.empty[Double]
        else tm.map(t => stdByLabel.getOrElse(t._1, Double.NaN))
      BinaryCarver.FittedFeature(version, "quantitative", edges, prebinToBin.toVector,
        Map.empty, nanBin, -1, hasNan, hasDefault, binLabels, Double.NaN, Double.NaN,
        rates, dropped = false, droppedReason = "", stds = stds,
        fitDropna = refDropna(j))
    } else {
      val memberStrs: Vector[Vector[String]] = groups.map(_.map {
        case JString(s) => s
        case v => pyFloatStr(numOf(v)) // numeric-typed categorical values
      }.toVector)
      var nanBin = -1
      var otherBin = -1
      val valueToBin = mutable.LinkedHashMap.empty[String, Int]
      memberStrs.zipWithIndex.foreach { case (ms, b) =>
        ms.foreach {
          case Nan => nanBin = b
          case Other => otherBin = b
          case v => valueToBin(v) = b
        }
      }
      // our display convention: leader (content's LAST member) first
      val binLabels = memberStrs.map(ms => (ms.last +: ms.init).mkString(", "))
      val rates = ratesFrom(tm, fr, cn, binLabels.length)
      val kind =
        if (bool(j \ "is_nested")) "nested"
        else if (bool(j \ "is_ordinal")) "ordinal"
        else "categorical"
      val stds =
        if (stdByLabel.isEmpty || tm.length != binLabels.length) Vector.empty[Double]
        else tm.map(t => stdByLabel.getOrElse(t._1, Double.NaN))
      // nested: the X4 walk probes parent values against the artifact's bin
      // LEADERS (the reference's `feature.values` / remap_nested_unseen
      // bucket_leaders set) — content's last member per group
      val parents =
        if (kind == "nested") (j \ "parents") match {
          case JArray(a) => a.collect { case JString(s) => s }.toVector
          case _ => Vector.empty[String]
        }
        else Vector.empty[String]
      val leaderToBin =
        if (kind == "nested")
          memberStrs.zipWithIndex.collect {
            case (ms, b) if ms.last != Nan && ms.last != Other => ms.last -> b
          }.toMap
        else Map.empty[String, Int]
      BinaryCarver.FittedFeature(version, kind, Vector.empty, Vector.empty,
        valueToBin.toMap, nanBin, otherBin, hasNan, hasDefault, binLabels,
        Double.NaN, Double.NaN, rates, dropped = false, droppedReason = "",
        stds = stds, parents = parents, leaderToBin = leaderToBin,
        fitDropna = refDropna(j))
    }
  }

  /** The artifact's per-feature `dropna` flag (feature._dropna): carried
    * into [[BinaryCarver.FittedFeature.fitDropna]] so a re-export
    * round-trips it instead of re-inferring it from nanBin.
    */
  private def refDropna(j: JValue): Boolean =
    (j \ "dropna") match { case JBool(b) => b; case _ => true }

  private def ratesFrom(tm: Vector[(String, Double)], fr: Map[String, Double],
      cn: Map[String, Double], nBins: Int): Vector[Search.RateRow] =
    if (tm.length != nBins) Vector.empty
    else tm.zipWithIndex.map { case ((label, rate), i) =>
      Search.RateRow(label, rate, fr.getOrElse(label, Double.NaN), cn.getOrElse(label, Double.NaN))
    }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else f"$d%.6g"

  // -------------------------------------------------------------- write

  def save(m: BinaryCarver.Model, path: String, minFreqAlpha: Double = 0.05): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), write(m, minFreqAlpha))
    ()
  }

  def write(m: BinaryCarver.Model, minFreqAlpha: Double = 0.05): String =
    writeTop(m, minFreqAlpha, "target_mean", Map.empty)

  /** Continuous-family artifact (`ContinuousCarver` fit): same structural
    * schema, `target_mean`/`target_median` rate, per-bin `std` in the
    * statistics (the reference's `_extra_columns` for the Welch drift test).
    * The rate itself is stateless — `rate_reference` stays null.
    */
  def writeContinuous(m: BinaryCarver.Model, targetRate: String = "target_mean",
      minFreqAlpha: Double = 0.05): String =
    writeTop(m, minFreqAlpha, targetRate, Map.empty)

  /** Ordinal-family artifact: `target_mean_ridit` (or level) rate with the
    * fitted train marginal snapshotted as `rate_reference` parallel lists
    * (`ordinal_target_rates.py:66-81` reference_to_json).
    */
  def writeOrdinal(m: OrdinalCarver.Model, minFreqAlpha: Double = 0.05): String = {
    val rateName = m.features.flatMap(f => Option(f.rateRef)).headOption
      .map(_.name).getOrElse("target_mean_ridit")
    val refs = m.features.map(of => of.feature.name -> rateRefJson(of.rateRef)).toMap
    writeTop(m.binaryView, minFreqAlpha, rateName, refs)
  }

  /** Multiclass-family artifact: `ca_score` rate with the fitted CA axis as
    * `rate_reference` (`multiclass_target_rates.py:53-62`). Class NAMES are
    * not part of the reference schema (the axis stores only col_mass/v1) —
    * a loaded model re-derives class order from the scored sample, exactly
    * like the reference.
    */
  def writeMulticlass(m: MulticlassCarver.Model, minFreqAlpha: Double = 0.05): String = {
    val rateName = m.features.flatMap(f => Option(f.rateRef)).headOption
      .map(_.name).getOrElse("ca_score")
    val refs = m.features.map(mf => mf.feature.name -> rateRefJson(mf.rateRef)).toMap
    // engine EXTENSION field (the reference ignores unknown keys): class
    // names in axis-column order, so an engine round-trip keeps full class
    // fidelity instead of re-deriving order from the scored sample
    val extra =
      if (m.classes.isEmpty) ""
      else s""", "y_classes": [${m.classes.map(c => "\"" + esc(c) + "\"").mkString(", ")}]"""
    writeTop(m.binaryView, minFreqAlpha, rateName, refs, extraTop = extra)
  }

  /** Family rate state → the reference's `reference_to_json` payload. */
  private def rateRefJson(r: Ordinal.ORate): String = r match {
    case null => "null"
    case Ordinal.TargetMeanRidit(levels, counts) if levels != null =>
      // reference levels are crosstab column scalars: ints render as ints
      // (`level.item()`), counts always as floats
      val lv = levels.map(l =>
        if (l == math.rint(l) && math.abs(l) < 1e15) l.toLong.toString else l.toString)
      s"""{"levels": [${lv.mkString(", ")}], "counts": [${counts.map(pyFloatStr).mkString(", ")}]}"""
    case Multiclass.CAScoreRate(axis) if axis != null =>
      s"""{"col_mass": [${axis.colMass.mkString(", ")}], "v1": [${axis.v1.mkString(", ")}], """ +
        s""""degenerate": ${axis.degenerate}}"""
    case _ => "null" // stateless rates (TargetMeanLevel, continuous means)
  }

  /** One-vs-rest artifact: per-class binary features keyed by their
    * `<name>__y=<class>` version aliases (S2), exactly like the reference's
    * OneVsRestCarver.save.
    */
  def writeOneVsRest(m: OneVsRestCarver.Model, minFreqAlpha: Double = 0.05): String = {
    require(m.classes.nonEmpty, "[RefJson] one-vs-rest model carries no carved classes")
    val any = m.perClass(m.classes.head)
    val feats = m.classes.flatMap(c => m.perClass(c).features)
    val versions = m.classes.flatMap(c => m.perClass(c).features.map(f => s"${f.name}__y=$c"))
    val versionOf = feats.zip(versions).map { case (f, v) => (f, v) }
    val flat = BinaryCarver.Model(m.target, any.minFreq, any.maxNMod, any.sortBy, feats.toVector)
    writeTop(flat, minFreqAlpha, "target_mean", Map.empty,
      f => versionOf.collectFirst { case (ff, v) if ff eq f => v }.getOrElse(f.name))
  }

  def loadOneVsRest(path: String): OneVsRestCarver.Model =
    readOneVsRest(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** One-vs-rest load: version keys `<name>__y=<class>` regroup into the
    * per-class binary models (classes in sorted order, like the fit).
    */
  def readOneVsRest(json: String): OneVsRestCarver.Model = {
    val (m, _) = readWithRaw(json)
    val Versioned = "^(.*)__y=(.*)$".r
    val grouped = m.features.flatMap { f =>
      f.name match {
        case Versioned(base, cls) => Some((cls, f.copy(name = base)))
        case _ => None
      }
    }.groupBy(_._1)
    require(grouped.nonEmpty,
      "[RefJson] no '<name>__y=<class>' versioned features found — this is not a " +
        "one-vs-rest artifact (use load/loadOrdinal/... for single-model families)")
    val classes = grouped.keys.toVector.sorted
    val perClass = grouped.map { case (cls, fs) =>
      cls -> BinaryCarver.Model(m.target, m.minFreq, m.maxNMod, m.sortBy, fs.map(_._2))
    }
    OneVsRestCarver.Model(m.target, classes, perClass)
  }

  private def writeTop(m: BinaryCarver.Model, minFreqAlpha: Double,
      targetRate: String, rateRefs: Map[String, String],
      versionOf: BinaryCarver.FittedFeature => String = _.name,
      extraTop: String = ""): String = {
    val sb = new StringBuilder
    sb.append("{\"features\": {")
    val featJsons = m.kept.map(f =>
      "\"" + esc(versionOf(f)) + "\": " + writeFeature(f, targetRate, rateRefs.getOrElse(f.name, "null"), versionOf(f)))
    sb.append(featJsons.mkString(", "))
    if (m.kept.nonEmpty) sb.append(", ")
    sb.append("\"is_fitted\": true}")
    sb.append(s""", "min_freq": ${m.minFreq}, "is_fitted": true""")
    sb.append(s""", "config": {"dropna": ${m.features.forall(_.fitDropna)}, "n_jobs": 1, "verbose": false, "ordinal_encoding": true, "copy": true, "min_freq_alpha": $minFreqAlpha, "rescue_rare": false}""")
    sb.append(s""", "max_n_mod": ${m.maxNMod}""")
    sb.append(s""", "combination_evaluator": {"sort_by": "${esc(m.sortBy)}", "target_rate": "${esc(targetRate)}", "verbose": false}""")
    sb.append(""", "dropped_features": [""")
    sb.append(m.features.filter(_.dropped).map(f => "\"" + esc(f.name) + "\"").mkString(", "))
    sb.append("]")
    sb.append(extraTop)
    sb.append("}")
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def writeFeature(f: BinaryCarver.FittedFeature, targetRate: String = "target_mean",
      rateRef: String = "null", version: String = null): String = {
    val ver = if (version == null) f.name else version
    // (leaderJson, contentKeyString, memberJsons) per bin, in bin order
    val groups: Vector[(String, String, Vector[String])] =
      if (f.kind == "quantitative") {
        (0 until f.nBins).toVector.map { b =>
          val idxs = f.prebinToBin.zipWithIndex.collect { case (bin, i) if bin == b => i }
          val memberVals = idxs.map(i =>
            if (i >= f.prebinEdges.length) Double.PositiveInfinity else f.prebinEdges(i)).sorted
          val leader = memberVals.last
          val leaderJson = if (leader.isPosInfinity) "\"" + Inf + "\"" else pyFloatStr(leader)
          val key = if (leader.isPosInfinity) Inf else pyFloatStr(leader)
          val base = memberVals.map(v => if (v.isPosInfinity) "\"" + Inf + "\"" else pyFloatStr(v))
          // NaN grouped into this bin: member just before the leader
          val members =
            if (f.nanBin == b) base.init ++ Vector("\"" + Nan + "\"", base.last)
            else base
          (leaderJson, key, members)
        }
      } else {
        (0 until f.nBins).toVector.map { b =>
          val ms = f.binLabels(b).split(", ").toVector // leader first (our order)
          val content = ms.tail :+ ms.head            // reference: leader LAST
          ("\"" + esc(ms.head) + "\"", ms.head, content.map(v => "\"" + esc(v) + "\""))
        }
      }
    val values = groups.map(_._1).mkString("[", ", ", "]")
    val contentDict = groups.map { case (_, key, members) =>
      "\"" + esc(key) + "\": " + members.mkString("[", ", ", "]")
    }.mkString("{", ", ", "}")
    val contentStr = "\"" + esc(contentDict) + "\""

    def statDict(pick: Search.RateRow => Double, asInt: Boolean = false): String =
      f.rates.zipWithIndex.map { case (r, i) =>
        val v = pick(r)
        val vs = if (v.isNaN) "null" else if (asInt) math.round(v).toString else v.toString
        "\"" + esc(f.binLabels(i)) + "\": " + vs
      }.mkString("{", ", ", "}")
    // per-bin sample std (continuous family only) joins the statistics dict,
    // keyed like the other columns (`_extra_columns` in the reference)
    val stdDict =
      if (f.stds.isEmpty || f.stds.length != f.binLabels.length) ""
      else {
        val d = f.stds.zipWithIndex.map { case (s, i) =>
          "\"" + esc(f.binLabels(i)) + "\": " + (if (s.isNaN) "null" else s.toString)
        }.mkString("{", ", ", "}")
        s""", "std": $d"""
      }
    val statistics =
      if (f.rates.isEmpty) "null"
      else s"""{"${esc(targetRate)}": ${statDict(_.rate)}, "frequency": ${statDict(_.frequency)}, "count": ${statDict(_.count, asInt = true)}$stdDict}"""

    s"""{"name": "${esc(f.name)}", "version": "${esc(ver)}", "version_tag": "${esc(ver)}", """ +
      s""""has_nan": ${f.hasNan}, "nan": "$Nan", "has_default": ${f.hasDefault}, "default": "$Other", """ +
      s""""dropna": ${f.fitDropna && !(f.hasNan && f.nanBin < 0 && !f.dropped)}, "is_fitted": true, "values": $values, "content": $contentStr, """ +
      s""""is_qualitative": ${f.kind != "quantitative"}, "is_quantitative": ${f.kind == "quantitative"}, """ +
      s""""is_categorical": ${f.kind == "categorical"}, "is_ordinal": ${f.kind == "ordinal"}, "is_nested": ${f.kind == "nested"}, """ +
      (if (f.kind == "nested") s""""parents": [${f.parents.map(p => "\"" + esc(p) + "\"").mkString(", ")}], "max_n_chars": 50, """ else "") +
      s""""is_datetime": false, "ordinal_encoding": true, "statistics": $statistics, """ +
      s""""rate_reference": $rateRef, "history": ${historyJson(f)}}"""
  }

  /** Per-candidate search history in the reference's `_history` dict shape
    * (`combination_evaluator.py:774-850`): info, association values,
    * `combination` as a modality→leader dict, viable, n_mod, dropna.
    * Empty when the fit ran with `Config(history = false)`.
    */
  private def historyJson(f: BinaryCarver.FittedFeature): String =
    f.history.map { h =>
      val combo = h.combination.flatMap(g => g.map(m => "\"" + esc(m) + "\": \"" + esc(g.head) + "\""))
        .mkString("{", ", ", "}")
      def num(d: Double): String = if (d.isNaN) "null" else d.toString
      val assoc =
        if (h.measure.nonEmpty && h.cramerv.isNaN && h.tschuprowt.isNaN)
          s""""${esc(h.measure)}": ${num(h.value)}"""
        else s""""cramerv": ${num(h.cramerv)}, "tschuprowt": ${num(h.tschuprowt)}"""
      s"""{"info": "${esc(h.info)}", $assoc, "combination": $combo, "viable": ${h.viable}, """ +
        s""""n_mod": ${h.nMod}, "dropna": ${h.withNan}, """ +
        s""""train": {"viable_min_freq": ${h.minFreqOk}, "viable_distinct_rates": ${h.distinctOk}, """ +
        s""""viable_ordering": ${h.orderingOk}}}"""
    }.mkString("[", ", ", "]")
}
