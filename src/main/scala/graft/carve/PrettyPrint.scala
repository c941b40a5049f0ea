package graft.carve

/** HTML rendering of fit summaries — the reference's
  * `carvers/utils/pretty_print.py` (styled per-feature crosstab with a
  * coolwarm background gradient, 4-decimal precision, optional caption).
  * Driver-only cosmetics over the already-aggregated per-bin rates; never
  * touches row-level data.
  */
object PrettyPrint {

  /** Linear interpolation of the coolwarm endpoints (blue → white → red)
    * used by the reference's `background_gradient(cmap="coolwarm")`:
    * t in [0,1] → CSS rgb(). Not the exact matplotlib colormap (that table
    * is matplotlib's), but the same semantics: sub-midpoint values cool,
    * super-midpoint values warm.
    */
  private[carve] def coolwarm(t0: Double): String = {
    val t = math.max(0.0, math.min(1.0, t0))
    val (lo, mid, hi) = ((59, 76, 192), (221, 221, 221), (180, 4, 38))
    def lerp(a: Int, b: Int, f: Double): Int = math.round(a + (b - a) * f).toInt
    val (r, g, b) =
      if (t < 0.5) (lerp(lo._1, mid._1, t * 2), lerp(lo._2, mid._2, t * 2), lerp(lo._3, mid._3, t * 2))
      else (lerp(mid._1, hi._1, (t - 0.5) * 2), lerp(mid._2, hi._2, (t - 0.5) * 2), lerp(mid._3, hi._3, (t - 0.5) * 2))
    s"rgb($r,$g,$b)"
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def fmt(x: Double): String =
    if (x.isNaN) "NaN" else f"$x%.4f"

  /** One column's min-max normalized gradient positions (constant columns
    * sit at the midpoint, like a constant pandas gradient column).
    */
  private def gradient(values: Seq[Double]): Seq[Double] = {
    val defined = values.filterNot(_.isNaN)
    if (defined.isEmpty) values.map(_ => 0.5)
    else {
      val lo = defined.min
      val hi = defined.max
      if (hi == lo) values.map(_ => 0.5)
      else values.map(v => if (v.isNaN) 0.5 else (v - lo) / (hi - lo))
    }
  }

  /** HTML table of one fitted feature's per-bin statistics — label,
    * frequency and target rate on the same line (`pretty_print.py:8-56`
    * `prettier_xagg`): inline-displayed table, coolwarm background per
    * numeric cell, 4-decimal precision, optional caption.
    */
  def featureHtml(f: BinaryCarver.FittedFeature, caption: String = null,
      hideIndex: Boolean = false): String = {
    val freqG = gradient(f.rates.map(_.frequency))
    val rateG = gradient(f.rates.map(_.rate))
    val sb = new StringBuilder
    sb ++= "<table style='display:inline'>"
    if (caption != null) sb ++= s"<caption>${esc(caption)}</caption>"
    sb ++= "<thead><tr>"
    if (!hideIndex) sb ++= "<th></th>"
    sb ++= "<th>label</th><th>frequency</th><th>target_rate</th></tr></thead><tbody>"
    f.rates.zipWithIndex.foreach { case (r, i) =>
      sb ++= "<tr>"
      if (!hideIndex) sb ++= s"<th>$i</th>"
      sb ++= s"<td>${esc(f.binLabels(i))}</td>"
      sb ++= s"<td style='background-color:${coolwarm(freqG(i))}'>${fmt(r.frequency)}</td>"
      sb ++= s"<td style='background-color:${coolwarm(rateG(i))}'>${fmt(r.rate)}</td>"
      sb ++= "</tr>"
    }
    sb ++= "</tbody></table>"
    sb.result()
  }

  /** Whole-model HTML summary: one captioned per-feature table (kept
    * features carry their association metrics in the caption; dropped
    * features a one-line note).
    */
  def modelHtml(m: BinaryCarver.Model): String = {
    val sb = new StringBuilder
    sb ++= s"<div><h3>Carved features (target=${esc(m.target)}, sort_by=${esc(m.sortBy)})</h3>"
    m.features.foreach { f =>
      if (f.dropped)
        sb ++= s"<p><b>${esc(f.name)}</b>: dropped (${esc(f.droppedReason)})</p>"
      else
        sb ++= featureHtml(f,
          caption = f"${f.name} — cramerv=${f.cramerv}%.4f tschuprowt=${f.tschuprowt}%.4f")
    }
    sb ++= "</div>"
    sb.result()
  }
}
