package graft.carve

import scala.collection.mutable

/** Interval-DP search over consecutive partitions — the reference's
  * combination engine (`AutoCarver/combinations/utils/dp.py:91-118` and the
  * binary chi² instantiation
  * `combinations/binary/binary_combination_evaluators.py:376-485`).
  *
  * All driver-side: the inputs are per-modality aggregates (≤ ~200 rows per
  * feature at default knobs), never row-level data.
  */
object Dp {

  /** One scored candidate partition of the raw modality order. */
  final case class Candidate(
      combination: Vector[Vector[String]],
      cramerv: Double,
      tschuprowt: Double
  ) {
    /** modality -> group leader (first element of its group),
      * reference `combinations.py:combination_formatter`. */
    lazy val indexToGroupby: Map[String, String] =
      combination.iterator.flatMap(g => g.iterator.map(_ -> g.head)).toMap
    def metric(sortBy: String): Double = if (sortBy == "cramerv") cramerv else tschuprowt
  }

  /** Top-`topK` consecutive partitions of `range(nMod)` into 2..`cap`
    * groups under an additive per-segment cost. Returns (k, cost, splits)
    * with splits = (0, s1, ..., nMod), per-k lists concatenated, NOT
    * globally sorted (mirrors `dp.py:top_k_partitions`). `skipCost` marks
    * excluded segments.
    */
  def topKPartitions(
      nMod: Int,
      cap: Int,
      segCost: (Int, Int) => Double,
      topK: Int,
      maximize: Boolean = true,
      skipCost: Option[Double] = None
  ): Vector[(Int, Double, Vector[Int])] = {
    final case class Entry(cost: Double, splits: Vector[Int])
    // dp rows: rows(g)(j) = top-K g-group partitions of [0, j), kept SORTED
    // (metric-best first). The sortedness lets the next row prune: extensions
    // of worse prefixes than the current K-th candidate can stop early.
    var prev: Array[Array[Entry]] = Array.fill(nMod + 1)(Array.empty)
    var j = 1
    while (j <= nMod) {
      val c = segCost(0, j)
      if (!skipCost.contains(c)) prev(j) = Array(Entry(c, Vector(0, j)))
      j += 1
    }
    val out = Vector.newBuilder[(Int, Double, Vector[Int])]
    // bounded selection: a size-<=topK heap whose head is the WORST kept entry
    // (PriorityQueue dequeues the max of its ordering)
    val worstFirst: Ordering[Entry] =
      if (maximize) Ordering.by[Entry, Double](-_.cost) else Ordering.by[Entry, Double](_.cost)

    var g = 2
    var rowsByK = Map(1 -> prev)
    while (g <= cap) {
      val row: Array[Array[Entry]] = Array.fill(nMod + 1)(Array.empty)
      var jj = g
      while (jj <= nMod) {
        val heap = mutable.PriorityQueue.empty[Entry](worstFirst)
        var i = g - 1
        while (i < jj) {
          val c = segCost(i, jj)
          if (!skipCost.contains(c)) {
            val prevEntries = prev(i)
            var p = 0
            var stop = false
            while (p < prevEntries.length && !stop) {
              val total = prevEntries(p).cost + c
              if (heap.size < topK) {
                heap.enqueue(Entry(total, prevEntries(p).splits :+ jj))
              } else if ((maximize && total > heap.head.cost) || (!maximize && total < heap.head.cost)) {
                heap.dequeue()
                heap.enqueue(Entry(total, prevEntries(p).splits :+ jj))
              } else {
                // prev entries are sorted best-first: all remaining are worse
                stop = true
              }
              p += 1
            }
          }
          i += 1
        }
        if (heap.nonEmpty) row(jj) = heap.dequeueAll.toArray.reverse // best-first
        jj += 1
      }
      rowsByK = rowsByK + (g -> row)
      prev = row
      g += 1
    }
    var k = 2
    while (k <= cap) {
      rowsByK(k)(nMod).foreach(e => out += ((k, e.cost, e.splits)))
      k += 1
    }
    out.result()
  }

  /** Splits → raw-label groups (`dp.py:splits_to_combination`). */
  def splitsToCombination(splits: Vector[Int], rawIndex: Vector[String]): Vector[Vector[String]] =
    (0 until splits.length - 1).map(g => rawIndex.slice(splits(g), splits(g + 1))).toVector

  /** Binary chi² top-K DP (`binary_combination_evaluators.py:376-485`):
    * per-k interval DP over the closed-form chi² cell contributions with
    * the `+tol` shift folded into the marginals and Yates iff k==2;
    * results translated to quantised Cramér's V / Tschuprow's T and sorted
    * by `sortBy` desc, truncated to topK.
    */
  def chi2TopKPartitions(
      n0PerMod: Array[Double],
      n1PerMod: Array[Double],
      maxNMod: Int,
      rawIndex: Vector[String],
      sortBy: String = "tschuprowt",
      topK: Int = 2000,
      tol: Double = 1e-10
  ): Vector[Candidate] = {
    require(sortBy == "cramerv" || sortBy == "tschuprowt", s"bad sortBy $sortBy")
    val nMod = rawIndex.length
    val cap = math.min(maxNMod, nMod)
    if (cap < 2) return Vector.empty

    val n0Prefix = n0PerMod.scanLeft(0.0)(_ + _)
    val n1Prefix = n1PerMod.scanLeft(0.0)(_ + _)
    val n0Total = n0Prefix.last
    val n1Total = n1Prefix.last
    val nObs = n0Total + n1Total

    // (sortKey, cramerv_q, tt_q, splits)
    val all = mutable.ArrayBuffer.empty[(Double, Double, Double, Vector[Int])]
    var kGroups = 2
    while (kGroups <= cap) {
      val c0 = n0Total + kGroups * tol
      val c1 = n1Total + kGroups * tol
      val nWithTol = n0Total + n1Total + 2.0 * kGroups * tol
      val yates = kGroups == 2
      def segCost(i: Int, j: Int): Double = {
        var obs0 = (n0Prefix(j) - n0Prefix(i)) + tol
        var obs1 = (n1Prefix(j) - n1Prefix(i)) + tol
        val r = obs0 + obs1
        val e0 = r * c0 / nWithTol
        val e1 = r * c1 / nWithTol
        if (yates) {
          val d0 = e0 - obs0
          val d1 = e1 - obs1
          obs0 = obs0 + (if (d0 > 0) 1.0 else if (d0 < 0) -1.0 else 0.0) * math.min(0.5, math.abs(d0))
          obs1 = obs1 + (if (d1 > 0) 1.0 else if (d1 < 0) -1.0 else 0.0) * math.min(0.5, math.abs(d1))
        }
        (obs0 - e0) * (obs0 - e0) / e0 + (obs1 - e1) * (obs1 - e1) / e1
      }
      val entries = topKPartitions(nMod, kGroups, segCost, topK, maximize = true)
      val denom = math.pow(kGroups - 1.0, 0.25)
      entries.foreach { case (k, chi2, splits) =>
        if (k == kGroups) {
          val cramervQ = Stats.quantize(math.sqrt(chi2 / nObs), tol)
          val ttQ = Stats.quantize(cramervQ / denom, tol)
          val sortKey = if (sortBy == "tschuprowt") ttQ else cramervQ
          all += ((sortKey, cramervQ, ttQ, splits))
        }
      }
      kGroups += 1
    }
    val top = all.sortBy(-_._1).take(topK)
    top.iterator.map { case (_, cv, tt, splits) =>
      Candidate(splitsToCombination(splits, rawIndex), cv, tt)
    }.toVector
  }

  /** Closed-form V/T for one arbitrary grouping of the full modality set
    * (`binary_combination_evaluators.py:_chi2_assoc_for_combination`):
    * bincount per group (first-appearance group ids, unmapped modalities
    * become singletons), `+tol` shift, chi², quantised V/T.
    */
  def chi2AssocForCombination(
      n0PerMod: Array[Double],
      n1PerMod: Array[Double],
      nObs: Double,
      modToPos: Map[String, Int],
      combination: Vector[Vector[String]],
      tol: Double = 1e-10
  ): (Double, Double) = {
    val nMod = modToPos.size
    val assign = new Array[Int](nMod)
    val assigned = new Array[Boolean](nMod)
    // group ids in combination order (= the reference dict's insertion order)
    var gid = 0
    combination.foreach { group =>
      group.foreach { mod =>
        modToPos.get(mod).foreach { pos => assign(pos) = gid; assigned(pos) = true }
      }
      gid += 1
    }
    var nGroups = gid
    var pos = 0
    while (pos < nMod) {
      if (!assigned(pos)) { assign(pos) = nGroups; nGroups += 1 }
      pos += 1
    }
    val n0g = new Array[Double](nGroups)
    val n1g = new Array[Double](nGroups)
    var i = 0
    while (i < nMod) {
      n0g(assign(i)) += n0PerMod(i)
      n1g(assign(i)) += n1PerMod(i)
      i += 1
    }
    val obs = Array.tabulate(nGroups)(g => Array(n0g(g) + tol, n1g(g) + tol))
    val chi2 = Stats.pearsonChi2(obs)
    Stats.cramervTschuprowt(chi2, nObs, nGroups, 2, tol)
  }

  /** NaN fan-out variants of base partitions (`dp.py:nan_fanout_variants`):
    * nan folded into each group; nan alone iff len(base) < maxNMod; finally
    * the all-vs-nan partition once.
    */
  def nanFanoutVariants(
      basePartitions: Vector[Vector[Vector[String]]],
      nanLabel: String,
      rawLabels: Vector[String],
      maxNMod: Int
  ): Iterator[Vector[Vector[String]]] = {
    val perBase = basePartitions.iterator.flatMap { base =>
      val folded = base.indices.iterator.map { j =>
        base.updated(j, base(j) :+ nanLabel)
      }
      if (base.length < maxNMod) folded ++ Iterator(base :+ Vector(nanLabel))
      else folded
    }
    perBase ++ Iterator(Vector(rawLabels, Vector(nanLabel)))
  }
}
