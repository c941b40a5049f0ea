package graft.carve

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Continuous-target (regression) carver — Kruskal-Wallis H family
  * (`carvers/continuous_carver.py` + `combinations/continuous/...`).
  *
  * The reference aggregates a LIST of y values per modality; at scale that
  * is exactly what not to do (SURVEY.md C3). The DP only consumes
  * per-modality `(n, Σrank(y), Σy)` plus the global tie correction, so the
  * cluster computes average ranks exactly with a `groupBy(feature, y)`
  * histogram + one cumulative window per feature, then joins ranks back and
  * reduces to per-modality stats. Nothing row-sized ever reaches the
  * driver.
  *
  * Scale note: the per-feature rank window partitions by feature id — a
  * single task per feature sized by that feature's distinct-y count. For
  * web-scale continuous targets with ~N distinct values, swap in a
  * range-partitioned two-pass cumulative sum; at carving granularity the
  * distinct-y count is almost always ≪ N.
  */
object Continuous {

  /** numpy-median semantics over an integer-weighted value histogram: the
    * middle element of the expanded sorted sample, or the average of the
    * two middle elements for an even total.
    */
  def weightedMedian(hist: Array[(Double, Double)]): Double = {
    if (hist.isEmpty) return Double.NaN
    val sorted = hist.sortBy(_._1)
    val total = math.round(sorted.map(_._2).sum)
    if (total == 0) return Double.NaN
    def valueAt(pos: Long): Double = { // 1-indexed order statistic
      var acc = 0L
      var i = 0
      while (i < sorted.length) {
        acc += math.round(sorted(i)._2)
        if (acc >= pos) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    if (total % 2 == 1) valueAt(total / 2 + 1)
    else (valueAt(total / 2) + valueAt(total / 2 + 1)) / 2.0
  }

  /** Per-modality rank aggregate for one feature. */
  final case class RankXagg(
      labels: Vector[String],
      n: Array[Double],
      sumRank: Array[Double],
      sumY: Array[Double],
      tieCorr: Double,
      // viability rate: target_mean (default) or target_median (R4,
      // `continuous_target_rates.py:TargetMedian`); medians need the
      // per-modality y histogram (grouped counts, never y-lists)
      rateStrategy: String = "target_mean",
      yHist: Map[String, Array[(Double, Double)]] = Map.empty
  ) {
    def nObs: Double = n.sum
    def without(label: String): RankXagg = {
      val idx = labels.indexOf(label)
      if (idx < 0) this
      else RankXagg(labels.patch(idx, Nil, 1), n.patch(idx, Nil, 1),
        sumRank.patch(idx, Nil, 1), sumY.patch(idx, Nil, 1), tieCorr,
        rateStrategy, yHist - label)
    }
    def grouped(indexToGroupby: Map[String, String]): RankXagg = {
      val order = mutable.LinkedHashMap.empty[String, Int]
      val leaders = labels.map(l => indexToGroupby.getOrElse(l, l))
      leaders.foreach(l => order.getOrElseUpdate(l, order.size))
      val gn = new Array[Double](order.size)
      val gr = new Array[Double](order.size)
      val gy = new Array[Double](order.size)
      var i = 0
      while (i < labels.length) {
        val g = order(leaders(i))
        gn(g) += n(i); gr(g) += sumRank(i); gy(g) += sumY(i)
        i += 1
      }
      val gHist =
        if (yHist.isEmpty) yHist
        else labels.indices.groupBy(i => order(leaders(i))).map { case (g, idxs) =>
          order.keysIterator.toVector(g) ->
            idxs.flatMap(i => yHist.getOrElse(labels(i), Array.empty[(Double, Double)])).toArray
        }
      RankXagg(order.keysIterator.toVector, gn, gr, gy, tieCorr, rateStrategy, gHist)
    }
    def rates: Vector[Search.RateRow] = {
      val total = nObs
      labels.indices.map { i =>
        val rate =
          if (rateStrategy == "target_median")
            Continuous.weightedMedian(yHist.getOrElse(labels(i), Array.empty))
          else sumY(i) / n(i)
        Search.RateRow(labels(i), rate, n(i) / total, n(i))
      }.toVector
    }
  }

  /** Kruskal H from group rank sums (`stats/kruskal.py:h_from_rank_sums`). */
  def hFromRankSums(rankSums: Array[Double], counts: Array[Double], nObs: Double, tieCorr: Double): Double = {
    var ssbn = 0.0
    var i = 0
    while (i < rankSums.length) {
      ssbn += rankSums(i) * rankSums(i) / counts(i) // 0-count group → NaN, as scipy
      i += 1
    }
    if (ssbn.isNaN || ssbn.isInfinite) return Double.NaN
    val h = (12.0 / (nObs * (nObs + 1))) * ssbn - 3.0 * (nObs + 1)
    if (tieCorr == 0) Double.NaN else h / tieCorr
  }

  /** Top-K Kruskal DP (`continuous_combination_evaluators.py:516-594`):
    * one DP across all caps (ssbn is k-independent), empty segments
    * excluded via skipCost, ssbn → H translation, sorted desc.
    */
  def kruskalTopKPartitions(
      rPerMod: Array[Double],
      nPerMod: Array[Double],
      nObs: Double,
      tieCorr: Double,
      maxNMod: Int,
      rawIndex: Vector[String],
      topK: Int = 2000
  ): Vector[(Vector[Vector[String]], Double)] = {
    if (nObs < 2 || tieCorr == 0) return Vector.empty
    val nMod = rawIndex.length
    val cap = math.min(maxNMod, nMod)
    if (cap < 2) return Vector.empty
    val rPrefix = rPerMod.scanLeft(0.0)(_ + _)
    val nPrefix = nPerMod.scanLeft(0.0)(_ + _)
    def segCost(i: Int, j: Int): Double = {
      val nn = nPrefix(j) - nPrefix(i)
      if (nn <= 0) Double.NegativeInfinity
      else {
        val r = rPrefix(j) - rPrefix(i)
        r * r / nn
      }
    }
    val rows = Dp.topKNodes(nMod, cap, segCost, topK, maximize = true,
      skipCost = Some(Double.NegativeInfinity))
    val coef = 12.0 / (nObs * (nObs + 1))
    val offset = 3.0 * (nObs + 1)
    // same (k asc, row order) emission the former topKPartitions flattened;
    // splits materialize only for the post-sort top-K survivors
    val entries = Vector.newBuilder[(Double, Dp.Node)]
    var k = 2
    while (k <= cap) {
      rows(k).foreach(e => entries += (((coef * e.cost - offset) / tieCorr, e)))
      k += 1
    }
    entries.result().sortBy(-_._1).take(topK).map { case (h, e) =>
      (Dp.splitsToCombination(e.splits, rawIndex), h)
    }
  }

  /** Closed-form H for an arbitrary grouping (NaN fan-out scorer). */
  def hForCombination(
      rPerMod: Array[Double],
      nPerMod: Array[Double],
      nObs: Double,
      tieCorr: Double,
      modToPos: Map[String, Int],
      combination: Vector[Vector[String]]
  ): Double = {
    if (nObs < 2) return Double.NaN
    var gid = 0
    val nMod = modToPos.size
    val assign = new Array[Int](nMod)
    val assigned = new Array[Boolean](nMod)
    combination.foreach { g =>
      g.foreach(m => modToPos.get(m).foreach { p => assign(p) = gid; assigned(p) = true })
      gid += 1
    }
    var nGroups = gid
    var p = 0
    while (p < nMod) { if (!assigned(p)) { assign(p) = nGroups; nGroups += 1 }; p += 1 }
    if (nGroups < 2) return Double.NaN
    val rg = new Array[Double](nGroups)
    val ng = new Array[Double](nGroups)
    var i = 0
    while (i < nMod) { rg(assign(i)) += rPerMod(i); ng(assign(i)) += nPerMod(i); i += 1 }
    hFromRankSums(rg, ng, nObs, tieCorr)
  }

  /** Kruskal analogue of `Search.bestCombination`: same escalating walk,
    * same vetoes (rates are target MEANS `Σy/n` here), NaN fan-out scored
    * by closed-form H.
    *
    * Ranks are pool-dependent (reference `_modality_rank_stats` runs on the
    * nan-filtered xagg for the non-nan phase and on the restored raw xagg
    * for the nan phase), so the caller provides both bases:
    *
    * @param trainSub  non-NaN modalities with ranks pooled over non-NaN rows
    * @param trainFull all modalities (incl. NaN) with ranks pooled over all rows
    * @param dev       robustness view — only (n, Σy) are consumed (vetoes
    *                  use rates, never ranks)
    */
  def bestCombination(
      trainSub: RankXagg,
      trainFull: RankXagg,
      dev: Option[RankXagg],
      maxNMod: Int,
      minFreq: Option[Double],
      alpha: Double = 0.05,
      hasNan: Boolean = false,
      nanLabel: String = BinaryCarver.NanLabel,
      topKInitial: Int = 2000,
      escalate: Boolean = false,
      folds: Seq[RankXagg] = Nil,
      histSink: mutable.Buffer[Search.HistoryEntry] = null,
      rescueMode: Boolean = false,
      // optional cross-strategy candidate memo (Dp.CandMemo): the DP inputs
      // are rank aggregates, independent of the rate strategy
      dpMemo: Dp.CandMemo = null
  ): Option[(Vector[Vector[String]], Double, Vector[Search.RateRow])] = {
    def kCands(r: Array[Double], n: Array[Double], nObs: Double, tieCorr: Double,
        labels: Vector[String], topK: Int): Vector[(Vector[Vector[String]], Double)] =
      if (dpMemo == null) kruskalTopKPartitions(r, n, nObs, tieCorr, maxNMod, labels, topK)
      else dpMemo.getOrElseUpdate(
        ("kruskal", r.toSeq, n.toSeq, nObs, tieCorr, maxNMod, labels, topK),
        kruskalTopKPartitions(r, n, nObs, tieCorr, maxNMod, labels, topK))

    def viabilityFlags(t: RankXagg, d: Option[RankXagg], f: Seq[RankXagg]): Search.Viability = {
      val tr = t.rates
      val mf = Search.testMinFreq(tr, minFreq, alpha)
      val di = Search.testDistinctRates(tr)
      if (!mf || !di) return Search.Viability(viable = false, mf, di, orderingOk = true)
      var res = Search.Viability(viable = true, mf, di, orderingOk = true)
      val it = (d.toSeq ++ f).iterator
      while (it.hasNext && res.viable) {
        val dd = it.next()
        val dr = dd.rates
        val mfD = Search.testMinFreq(dr, minFreq, alpha)
        val diD = Search.testDistinctRates(dr)
        val ord = Search.testOrdering(tr.map(_.rate), dr.map(_.rate))
        res = Search.Viability(mfD && diD && ord, mf && mfD, di && diD, ord)
      }
      res
    }
    def viability(t: RankXagg, d: Option[RankXagg], f: Seq[RankXagg]): Boolean =
      viabilityFlags(t, d, f).viable
    def historize(combo: Vector[Vector[String]], h: Double, v: Search.Viability, withNan: Boolean): Unit = {
      if (histSink == null) return
      val info =
        if (!v.viable) "Not viable"
        else {
          val base = s"Best for kruskal and max_n_mod=$maxNMod"
          val d = if (withNan) base + " (dropna=True)" else base
          if (rescueMode) d + " (rescue: min_freq waived)" else d
        }
      histSink += Search.HistoryEntry(combo, Double.NaN, Double.NaN, combo.length, v.viable,
        v.minFreqOk, v.distinctOk, v.orderingOk, withNan, info, measure = "kruskal", value = h)
    }

    val rawLabels0 = trainSub.labels
    val trainNoNan = trainSub
    val devNoNan = if (hasNan) dev.map(_.without(nanLabel)) else dev
    val foldsNoNan = if (hasNan) folds.map(_.without(nanLabel)) else folds

    def align(x: RankXagg, order: Vector[String]): (Array[Double], Array[Double], Array[Double]) = {
      val pos = x.labels.zipWithIndex.toMap
      val r = new Array[Double](order.length)
      val n = new Array[Double](order.length)
      val y = new Array[Double](order.length)
      order.indices.foreach { i =>
        pos.get(order(i)).foreach { p => r(i) = x.sumRank(p); n(i) = x.n(p); y(i) = x.sumY(p) }
      }
      (r, n, y)
    }

    val nonNanWinner: Option[(Vector[Vector[String]], Double)] =
      if (trainNoNan.labels.length <= 1) None
      else {
        val (r, n, _) = align(trainNoNan, rawLabels0)
        var topK = topKInitial
        var walked = 0
        var found: Option[(Vector[Vector[String]], Double)] = None
        var done = false
        while (!done) {
          val cands = kCands(r, n, trainNoNan.nObs, trainNoNan.tieCorr, rawLabels0, topK)
          var i = walked
          while (i < cands.length && found.isEmpty) {
            val (combo, h) = cands(i)
            val idx = combo.iterator.flatMap(g => g.iterator.map(_ -> g.head)).toMap
            val v = viabilityFlags(trainNoNan.grouped(idx), devNoNan.map(_.grouped(idx)),
              foldsNoNan.map(_.grouped(idx)))
            historize(combo, h, v, withNan = false)
            if (v.viable) found = Some((combo, h))
            i += 1
          }
          walked = i
          if (found.isDefined) done = true
          else if (cands.length < topK) done = true
          else if (!escalate) done = true
          else topK *= 4
        }
        found
      }

    val (mergedTrain, mergedDev, mergedFolds, mergedLabels, baseBest) = nonNanWinner match {
      case Some((combo, h)) =>
        val idx = combo.iterator.flatMap(g => g.iterator.map(_ -> g.head)).toMap
        val gt = trainFull.grouped(idx)
        (gt, dev.map(_.grouped(idx)), folds.map(_.grouped(idx)), gt.labels.filterNot(_ == nanLabel),
          Some((combo, h, gt.rates)))
      case None => (trainFull, dev, folds, rawLabels0, None)
    }

    if (!hasNan) return baseBest

    // NaN fan-out over merged bins
    val fullLabels = mergedTrain.labels
    val modToPos = fullLabels.zipWithIndex.toMap
    val (fr, fn, _) = align(mergedTrain, fullLabels)
    val (br, bn, _) = align(mergedTrain, mergedLabels)
    val historized = mutable.Set.empty[Vector[Vector[String]]]
    var topK = topKInitial
    var winner: Option[(Vector[Vector[String]], Double)] = None
    var done = false
    while (!done) {
      val base = kCands(br, bn, mergedTrain.nObs, mergedTrain.tieCorr, mergedLabels, topK)
      val scored = Dp.nanFanoutVariants(base.map(_._1), nanLabel, mergedLabels, maxNMod)
        .map { v => (v, hForCombination(fr, fn, mergedTrain.nObs, mergedTrain.tieCorr, modToPos, v)) }
        .toVector
        .sortBy { case (_, h) => if (h.isNaN) Double.PositiveInfinity else -h }
      var i = 0
      while (i < scored.length && winner.isEmpty) {
        val (v, h) = scored(i)
        if (!historized.contains(v)) {
          historized += v
          val idx = v.iterator.flatMap(g => g.iterator.map(_ -> g.head)).toMap
          val vf = viabilityFlags(mergedTrain.grouped(idx), mergedDev.map(_.grouped(idx)),
            mergedFolds.map(_.grouped(idx)))
          historize(v, h, vf, withNan = true)
          if (vf.viable) winner = Some((v, h))
        }
        i += 1
      }
      if (winner.isDefined) done = true
      else if (base.length < topK) done = true
      else if (!escalate) done = true
      else topK *= 4
    }

    winner.map { case (v, h) =>
      val expand: Map[String, Vector[String]] = nonNanWinner match {
        case Some((combo, _)) => combo.map(g => g.head -> g).toMap
        case None => Map.empty
      }
      val finalCombo = v.map(g => g.flatMap(l => expand.getOrElse(l, Vector(l))))
      val idx = v.iterator.flatMap(g => g.iterator.map(_ -> g.head)).toMap
      (finalCombo, h, mergedTrain.grouped(idx).rates)
    }
  }
}
