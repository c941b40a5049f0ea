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
    val top = JsonMethods.parse(json)
    val minFreq = numOf(top \ "min_freq")
    val maxNMod = (top \ "max_n_mod") match { case JInt(i) => i.toInt; case _ => 5 }
    val sortBy = (top \ "combination_evaluator" \ "sort_by") match {
      case JString(s) => s
      case _ => "tschuprowt"
    }
    val feats = (top \ "features") match {
      case JObject(fields) => fields.collect {
        case (version, fj: JObject) if version != "is_fitted" => readFeature(version, fj)
      }
      case _ => Nil
    }
    BinaryCarver.Model("y", minFreq, maxNMod, sortBy, feats.toVector)
  }

  private def readFeature(version: String, fj: JObject): BinaryCarver.FittedFeature = {
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
    val tm = statMap("target_mean")
    val fr = statMap("frequency").toMap
    val cn = statMap("count").toMap

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
      BinaryCarver.FittedFeature(version, "quantitative", edges, prebinToBin.toVector,
        Map.empty, nanBin, -1, hasNan, hasDefault, binLabels, Double.NaN, Double.NaN,
        rates, dropped = false, droppedReason = "")
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
      val kind = if (bool(j \ "is_ordinal")) "ordinal" else "categorical"
      BinaryCarver.FittedFeature(version, kind, Vector.empty, Vector.empty,
        valueToBin.toMap, nanBin, otherBin, hasNan, hasDefault, binLabels,
        Double.NaN, Double.NaN, rates, dropped = false, droppedReason = "")
    }
  }

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

  def write(m: BinaryCarver.Model, minFreqAlpha: Double = 0.05): String = {
    val sb = new StringBuilder
    sb.append("{\"features\": {")
    val featJsons = m.kept.map(f => "\"" + esc(f.name) + "\": " + writeFeature(f))
    sb.append(featJsons.mkString(", "))
    if (m.kept.nonEmpty) sb.append(", ")
    sb.append("\"is_fitted\": true}")
    sb.append(s""", "min_freq": ${m.minFreq}, "is_fitted": true""")
    sb.append(s""", "config": {"dropna": true, "n_jobs": 1, "verbose": false, "ordinal_encoding": true, "copy": true, "min_freq_alpha": $minFreqAlpha, "rescue_rare": false}""")
    sb.append(s""", "max_n_mod": ${m.maxNMod}""")
    sb.append(s""", "combination_evaluator": {"sort_by": "${esc(m.sortBy)}", "target_rate": "target_mean", "verbose": false}""")
    sb.append(""", "dropped_features": [""")
    sb.append(m.features.filter(_.dropped).map(f => "\"" + esc(f.name) + "\"").mkString(", "))
    sb.append("]}")
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def writeFeature(f: BinaryCarver.FittedFeature): String = {
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
    val statistics =
      if (f.rates.isEmpty) "null"
      else s"""{"target_mean": ${statDict(_.rate)}, "frequency": ${statDict(_.frequency)}, "count": ${statDict(_.count, asInt = true)}}"""

    s"""{"name": "${esc(f.name)}", "version": "${esc(f.name)}", "version_tag": "${esc(f.name)}", """ +
      s""""has_nan": ${f.hasNan}, "nan": "$Nan", "has_default": ${f.hasDefault}, "default": "$Other", """ +
      s""""dropna": true, "is_fitted": true, "values": $values, "content": $contentStr, """ +
      s""""is_qualitative": ${f.kind != "quantitative"}, "is_quantitative": ${f.kind == "quantitative"}, """ +
      s""""is_categorical": ${f.kind == "categorical"}, "is_ordinal": ${f.kind == "ordinal"}, "is_nested": false, """ +
      s""""is_datetime": false, "ordinal_encoding": true, "statistics": $statistics, """ +
      s""""rate_reference": null, "history": ${historyJson(f)}}"""
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
