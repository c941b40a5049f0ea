package graft.carve

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** JSON persistence of a fitted carver model (reference S3:
  * `base_discretizer.py:565-663` — a fitted carver is a pure-JSON artifact;
  * `transform` after `load` needs no training data). Infinity is encoded
  * as the reference's `"__INF__"` sentinel.
  */
object Json {
  private val Inf = "__INF__"
  private val NegInf = "__NEG_INF__"

  private def num(d: Double): JValue =
    if (d.isPosInfinity) JString(Inf)
    else if (d.isNegInfinity) JString(NegInf)
    else if (d.isNaN) JNull
    else JDouble(d)

  private def numOf(v: JValue): Double = v match {
    case JString(Inf) => Double.PositiveInfinity
    case JString(NegInf) => Double.NegativeInfinity
    case JNull => Double.NaN
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  def writeModel(m: BinaryCarver.Model): String = {
    val json: JValue =
      ("target" -> m.target) ~
      ("min_freq" -> m.minFreq) ~
      ("max_n_mod" -> m.maxNMod) ~
      ("sort_by" -> m.sortBy) ~
      ("features" -> m.features.map { f =>
        ("name" -> f.name) ~
        ("kind" -> f.kind) ~
        ("prebin_edges" -> f.prebinEdges.map(num)) ~
        ("prebin_to_bin" -> f.prebinToBin) ~
        ("value_to_bin" -> JObject(f.valueToBin.toList.sortBy(_._1).map { case (k, v) => k -> JInt(v) })) ~
        ("nan_bin" -> f.nanBin) ~
        ("other_bin" -> f.otherBin) ~
        ("has_nan" -> f.hasNan) ~
        ("has_default" -> f.hasDefault) ~
        ("bin_labels" -> f.binLabels) ~
        ("cramerv" -> num(f.cramerv)) ~
        ("tschuprowt" -> num(f.tschuprowt)) ~
        ("rates" -> f.rates.map(r =>
          ("label" -> r.label) ~ ("rate" -> num(r.rate)) ~
          ("frequency" -> num(r.frequency)) ~ ("count" -> num(r.count)))) ~
        ("dropped" -> f.dropped) ~
        ("dropped_reason" -> f.droppedReason) ~
        ("stds" -> f.stds.map(num)) ~
        ("ordinal_order" -> f.ordinalOrder) ~
        ("parents" -> f.parents) ~
        ("leader_to_bin" -> JObject(f.leaderToBin.toList.sortBy(_._1).map { case (k, v) => k -> JInt(v) })) ~
        ("fit_dropna" -> f.fitDropna)
      })
    JsonMethods.pretty(JsonMethods.render(json))
  }

  def readModel(s: String): BinaryCarver.Model = {
    val j = JsonMethods.parse(s)
    def str(v: JValue): String = v match { case JString(x) => x; case other => other.values.toString }
    def int(v: JValue): Int = v match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case JDouble(d) => d.toInt
      case other => throw new IllegalArgumentException(s"not an int: $other")
    }
    def bool(v: JValue): Boolean = v match { case JBool(b) => b; case _ => false }
    def arr(v: JValue): List[JValue] = v match { case JArray(xs) => xs; case _ => Nil }

    val features = arr(j \ "features").map { f =>
      BinaryCarver.FittedFeature(
        name = str(f \ "name"),
        kind = str(f \ "kind"),
        prebinEdges = arr(f \ "prebin_edges").map(numOf).toVector,
        prebinToBin = arr(f \ "prebin_to_bin").map(int).toVector,
        valueToBin = (f \ "value_to_bin") match {
          case JObject(fields) => fields.map { case (k, v) => k -> int(v) }.toMap
          case _ => Map.empty
        },
        nanBin = int(f \ "nan_bin"),
        otherBin = int(f \ "other_bin"),
        hasNan = bool(f \ "has_nan"),
        hasDefault = bool(f \ "has_default"),
        binLabels = arr(f \ "bin_labels").map(str).toVector,
        cramerv = numOf(f \ "cramerv"),
        tschuprowt = numOf(f \ "tschuprowt"),
        rates = arr(f \ "rates").map(r =>
          Search.RateRow(str(r \ "label"), numOf(r \ "rate"), numOf(r \ "frequency"), numOf(r \ "count"))
        ).toVector,
        dropped = bool(f \ "dropped"),
        droppedReason = str(f \ "dropped_reason"),
        stds = arr(f \ "stds").map(numOf).toVector,
        ordinalOrder = arr(f \ "ordinal_order").map(_.values.toString).toVector,
        parents = arr(f \ "parents").map(_.values.toString).toVector,
        leaderToBin = (f \ "leader_to_bin") match {
          case JObject(fields) => fields.map { case (k, v) => k -> int(v) }.toMap
          case _ => Map.empty
        },
        // absent in pre-r6 artifacts -> the dropna=true default
        fitDropna = (f \ "fit_dropna") match { case JBool(b) => b; case _ => true }
      )
    }.toVector
    BinaryCarver.Model(
      target = str(j \ "target"),
      minFreq = numOf(j \ "min_freq"),
      maxNMod = int(j \ "max_n_mod"),
      sortBy = str(j \ "sort_by"),
      features = features
    )
  }
}
