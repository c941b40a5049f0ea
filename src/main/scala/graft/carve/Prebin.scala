package graft.carve

import scala.collection.mutable

/** Driver-side pre-binning algorithms (SURVEY.md §2.3), operating on
  * collected per-value aggregates — the cluster only ever ships
  * `groupBy(value).agg(count, sum(y))` histograms, never rows.
  */
object Prebin {

  /** Frequency-aware quantile finder — exact port of the reference's
    * single-sort algorithm (`discretizers/quantitatives/
    * continuous_discretizer.py:88-156`) re-expressed over a value-count
    * histogram (sorted unique values + counts), which is what a distributed
    * `groupBy(value).count()` yields:
    *
    *  - values with count >= N/q become their own modalities;
    *  - each run between frequent values is quantile-cut with
    *    `new_q = round(seg_len/N*q)` lower-method quantiles
    *    (`sorted[floor(p*(N-1))]` within the segment);
    *  - segments too small for 2 quantiles contribute their max;
    *  - NaNs are excluded from the histogram but count in N.
    *
    * @param uniqueSorted ascending distinct non-NaN values
    * @param counts       per-value counts, aligned
    * @param totalLen     total rows INCLUDING NaNs
    * @param q            quantile count = round(1/min_freq)
    * @return ascending quantile edges (deduplicated), without the +inf cap
    */
  def findQuantiles(
      uniqueSorted: Array[Double],
      counts: Array[Long],
      totalLen: Long,
      q: Int
  ): Vector[Double] = {
    val nVals = counts.sum
    if (nVals == 0) return Vector.empty
    val threshold = totalLen.toDouble / q
    val isFrequent = counts.map(_ >= threshold)

    // cumulative counts → (start, end) index in the implicit sorted array
    val cum = counts.scanLeft(0L)(_ + _) // length n+1; cum(i)..cum(i+1) = run of value i

    // order statistic lookup within [lo, hi) of the implicit sorted values
    def valueAt(sortedIdx: Long): Double = {
      // first unique index whose cumulative end exceeds sortedIdx
      var lo = 0
      var hi = uniqueSorted.length - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid + 1) > sortedIdx) hi = mid else lo = mid + 1
      }
      uniqueSorted(lo)
    }

    val freqIdx = isFrequent.zipWithIndex.collect { case (true, i) => i }
    val segmentBounds = mutable.ArrayBuffer.empty[(Long, Long)]
    if (freqIdx.isEmpty) segmentBounds += ((0L, nVals))
    else {
      segmentBounds += ((0L, cum(freqIdx(0))))
      var i = 0
      while (i < freqIdx.length - 1) {
        segmentBounds += ((cum(freqIdx(i) + 1), cum(freqIdx(i + 1))))
        i += 1
      }
      segmentBounds += ((cum(freqIdx.last + 1), nVals))
    }

    val quantiles = mutable.ArrayBuffer.empty[Double]
    segmentBounds.foreach { case (lo, hi) =>
      val segLen = hi - lo
      if (segLen > 0) {
        val newQ = math.rint(segLen.toDouble / totalLen * q).toInt
        if (newQ < 2) {
          quantiles += valueAt(hi - 1) // fallback to segment max
        } else {
          // probs = linspace(0,1,newQ+1)[1:-1]
          var p = 1
          while (p < newQ) {
            val prob = p.toDouble / newQ
            val idx = lo + math.floor(prob * (segLen - 1)).toLong
            quantiles += valueAt(idx)
            p += 1
          }
        }
      }
    }
    freqIdx.foreach(i => quantiles += uniqueSorted(i))
    quantiles.sorted.distinct.toVector
  }

  /** Greedy rare-modality merge for ordered modalities — exact port of
    * `discretizers/qualitatives/ordinal_discretizer.py:94-251`
    * (`find_common_modalities` + `find_closest_modality` tie-breaks).
    *
    * @param labels ordered modality labels
    * @param counts per-modality counts (same order)
    * @param sumY   per-modality target sums
    * @param totalLen  total rows (including NaNs / other modalities)
    * @return groups: partition of `labels` into consecutive groups; each
    *         group's leader is the kept (merge-target) label
    */
  def findCommonModalities(
      labels: Vector[String],
      counts: Array[Double],
      sumY: Array[Double],
      totalLen: Long,
      minFreq: Double,
      alpha: Double
  ): Vector[Vector[String]] = {
    if (totalLen == 0 || labels.isEmpty) return labels.map(Vector(_))
    // mutable working state: parallel arrays + group membership
    var curLabels = labels
    var freq = counts.clone()
    var rate = sumY.clone()
    val members = mutable.LinkedHashMap.empty[String, Vector[String]]
    labels.foreach(l => members(l) = Vector(l))

    def underrepresented: Boolean =
      freq.exists(c => Stats.isSignificantlyBelow(c, totalLen, minFreq, alpha))

    while (underrepresented && freq.length > 1) {
      // first (lowest-count) underrepresented value = global argmin of counts
      val discarded = freq.zipWithIndex.minBy(_._1)._2
      val frequencies = freq.map(_ / totalLen)
      val rates = freq.indices.map(i => rate(i) / freq(i)).toArray
      val kept = findClosestModality(discarded, frequencies, rates, minFreq)
      // group: discarded merges INTO kept (kept is the leader)
      val keptLabel = curLabels(kept)
      val discardedLabel = curLabels(discarded)
      members(keptLabel) = members(keptLabel) ++ members(discardedLabel)
      members.remove(discardedLabel)
      // stats update: nan-safe add then drop discarded slot
      freq(kept) += (if (freq(discarded).isNaN) 0.0 else freq(discarded))
      rate(kept) += (if (rate(discarded).isNaN) 0.0 else rate(discarded))
      freq = freq.patch(discarded, Nil, 1)
      rate = rate.patch(discarded, Nil, 1)
      curLabels = curLabels.patch(discarded, Nil, 1)
    }
    // groups in surviving-order; members of each group sorted by original order
    val orderIdx = labels.zipWithIndex.toMap
    curLabels.map(l => members(l).sortBy(orderIdx)).toVector
  }

  /** `ordinal_discretizer.py:find_closest_modality` tie-break cascade. */
  def findClosestModality(idx: Int, frequencies: Array[Double], rates: Array[Double], minFreq: Double): Int = {
    if (frequencies.length == 1) return 0
    if (idx == 0) return 1
    if (idx == frequencies.length - 1) return idx - 1
    if (isNextModalityCloser(idx, frequencies, rates, minFreq)) idx + 1 else idx - 1
  }

  private def isNextModalityCloser(idx: Int, freq: Array[Double], rates: Array[Double], minFreq: Double): Boolean = {
    val prevF = freq(idx - 1); val curF = freq(idx); val nextF = freq(idx + 1)
    val bothBelow = nextF < minFreq && prevF < minFreq
    val bothAbove = nextF >= minFreq && prevF >= minFreq
    if (curF == 0) return nextF < prevF
    if (nextF < minFreq && minFreq <= prevF) return true
    if (bothBelow || bothAbove)
      return math.abs(rates(idx - 1) - rates(idx)) > math.abs(rates(idx + 1) - rates(idx))
    false
  }

  /** Frequency sanity gate (`nested_discretizer.py:check_frequencies`, P7):
    * a feature whose mode is more frequent than `1 - minFreq` (NaN counts as
    * a modality) or whose most frequent value is below `minFreq` cannot be
    * discretized — raise, unless `rescue` keeps it for the carver's
    * last-chance min_freq-waived search (C13).
    */
  def frequencyGate(perValueCounts: Iterable[Double], total: Long, minFreq: Double,
      rescue: Boolean, featureName: String): Unit = {
    if (perValueCounts.isEmpty || total == 0) return
    val maxFreq = perValueCounts.max / total
    val (tooCommon, nonCommon) = gateStatus(maxFreq, minFreq)
    if ((tooCommon || nonCommon) && !rescue)
      throw new IllegalArgumentException(
        f"[frequencyGate] feature $featureName%s: most frequent value has freq=$maxFreq%2.2f " +
          f"outside [$minFreq%2.4f, ${1 - minFreq}%2.4f]. Decrease min_freq, drop the feature, " +
          "or set rescue=true to keep it for the min_freq-waived search.")
  }

  /** The gate's pure decision (shared with the q_freq_gate oracle):
    * (tooCommon, nonCommon) for a mode frequency against min_freq.
    */
  def gateStatus(maxFreq: Double, minFreq: Double): (Boolean, Boolean) =
    (maxFreq > 1 - minFreq, maxFreq < minFreq)

  /** Categorical rare-modality grouping (`categorical_discretizer.py:82-132`):
    * values Wilson-significantly below minFreq (excluding the NaN label) go
    * to the default bucket. Returns (valuesToGroup, hasDefault).
    */
  def rareCategoricals(
      valueCounts: Map[String, Double],
      nobs: Long,
      minFreq: Double,
      alpha: Double,
      nanLabel: String
  ): Vector[String] =
    valueCounts.collect {
      case (v, c) if v != nanLabel && Stats.isSignificantlyBelow(c, nobs, minFreq, alpha) => v
    }.toVector.sorted

  /** Target-rate ordering of categorical modalities
    * (`categorical_discretizer.py:series_target_rate`): mean(y) ascending,
    * ties broken by label (sort_index then stable sort_values).
    */
  def targetRateOrder(stats: Map[String, (Double, Double)]): Vector[String] =
    stats.toVector
      .sortBy(_._1) // sort_index
      .sortBy { case (_, (count, sy)) => sy / count } // stable: preserves label order on ties
      .map(_._1)
}
