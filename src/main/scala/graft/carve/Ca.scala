package graft.carve

/** Correspondence-analysis first-axis fitting and row scoring — driver-side
  * port of the reference's `stats/correspondence_analysis.py`. The tables
  * are tiny (feature groups × target classes), so a cyclic Jacobi
  * eigensolver on SᵀS extracts the first right singular vector to machine
  * precision; the reference's content-based sign convention then makes the
  * axis deterministic regardless of the eigensolver's sign.
  */
object Ca {

  final case class CAAxis(colMass: Array[Double], v1: Array[Double], degenerate: Boolean)

  /** Fits the CA first axis of a count crosstab
    * (`correspondence_analysis.py:34-91`, sign convention at 72-91).
    */
  def fitCaAxis(values: Array[Array[Double]], tol: Double = 1e-10): CAAxis = {
    val nRows = values.length
    val nCols = if (nRows == 0) 0 else values(0).length
    val total = values.iterator.map(_.sum).sum
    if (nRows <= 2 || nCols < 2 || total <= 0)
      return CAAxis(new Array[Double](nCols), new Array[Double](nCols), degenerate = true)

    val rowTotals = values.map(_.sum)
    val colTotals = Array.tabulate(nCols)(j => values.iterator.map(_(j)).sum)
    val r = rowTotals.map(_ / total)
    val c = colTotals.map(_ / total)
    val rowOk = r.map(_ > tol)
    val colOk = c.map(_ > tol)
    if (rowOk.count(identity) < 2 || colOk.count(identity) < 2)
      return CAAxis(c, new Array[Double](nCols), degenerate = true)

    val s = Array.tabulate(nRows, nCols) { (i, j) =>
      if (rowOk(i) && colOk(j)) {
        val p = values(i)(j) / total
        (p - r(i) * c(j)) / math.sqrt(r(i) * c(j))
      } else 0.0
    }
    // first right singular vector = dominant eigenvector of SᵀS
    val sts = Array.tabulate(nCols, nCols) { (a, b) =>
      var acc = 0.0; var i = 0
      while (i < nRows) { acc += s(i)(a) * s(i)(b); i += 1 }
      acc
    }
    val (eigVals, eigVecs) = symEig(sts)
    val top = eigVals.indices.maxBy(eigVals(_))
    val sigma0 = math.sqrt(math.max(eigVals(top), 0.0))
    if (sigma0 <= tol) return CAAxis(c, new Array[Double](nCols), degenerate = true)
    val v1 = Array.tabulate(nCols)(j => eigVecs(j)(top))

    // sign convention: largest-mass row's score non-negative; zero-score rows
    // skipped; ties broken by |score| then the row's own count vector
    val unsigned = caRowScores(values, CAAxis(c, v1, degenerate = false))
    val ordered = (0 until nRows).sorted(new Ordering[Int] {
      def compare(a: Int, b: Int): Int = {
        val byMass = java.lang.Double.compare(rowTotals(b), rowTotals(a))
        if (byMass != 0) return byMass
        val byAbs = java.lang.Double.compare(math.abs(unsigned(b)), math.abs(unsigned(a)))
        if (byAbs != 0) return byAbs
        var j = 0
        while (j < nCols) {
          val d = java.lang.Double.compare(values(a)(j), values(b)(j))
          if (d != 0) return d
          j += 1
        }
        0
      }
    })
    var sign = 1.0
    var k = 0
    var found = false
    while (k < ordered.length && !found) {
      val sc = unsigned(ordered(k))
      if (sc != 0.0) { sign = if (sc > 0) 1.0 else -1.0; found = true }
      k += 1
    }
    CAAxis(c, v1.map(_ * sign), degenerate = false)
  }

  /** Projects each row's own profile onto a fixed axis
    * (`correspondence_analysis.py:94-160`); degenerate → -rowTotal.
    */
  def caRowScores(values: Array[Array[Double]], axis: CAAxis): Array[Double] = {
    val rowTotals = values.map(_.sum)
    if (axis.degenerate) return rowTotals.map(-_)
    val c = axis.colMass
    require(values.isEmpty || values(0).length == c.length,
      s"crosstab carries ${values.headOption.map(_.length).getOrElse(0)} classes but axis was fit on ${c.length}")
    values.zipWithIndex.map { case (row, i) =>
      val rt = rowTotals(i)
      var score = 0.0
      var j = 0
      while (j < row.length) {
        if (c(j) > 1e-10) {
          val profile = if (rt > 0) row(j) / rt else 0.0
          score += (profile - c(j)) / math.sqrt(c(j)) * axis.v1(j)
        }
        j += 1
      }
      score
    }
  }

  /** Cyclic Jacobi eigendecomposition of a small symmetric matrix.
    * Returns (eigenvalues, eigenvectors-as-columns).
    */
  def symEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = 1e-30 + a.iterator.map(_.iterator.map(math.abs).sum).sum
    while (off > 1e-28 * scale && sweep < 100) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cos = 1.0 / math.sqrt(t * t + 1.0)
            val sin = t * cos
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cos * akp - sin * akq
              a(k)(q) = sin * akp + cos * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cos * apk - sin * aqk
              a(q)(k) = sin * apk + cos * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cos * vkp - sin * vkq
              v(k)(q) = sin * vkp + cos * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
