package graft.carve

/** Ad-hoc DP microbench (not a test): times the driver-side top-K interval
  * DP at carve-realistic sizes (nMod prebins, maxNMod cap, topK 2000) for
  * both the chi² (binary) and Kruskal (continuous) instantiations.
  * Run: sbt "Test/runMain graft.carve.DpMicrobench"
  */
object DpMicrobench {
  def main(args: Array[String]): Unit = {
    def hist(n: Int): (Array[Double], Array[Double]) = {
      val rnd = new scala.util.Random(7)
      (Array.fill(n)(50.0 + rnd.nextInt(1000)), Array.fill(n)(20.0 + rnd.nextInt(400)))
    }
    def time[T](label: String, reps: Int)(f: => T): T = {
      var r: T = f // warmup
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { r = f; i += 1 }
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e6 / reps}%9.1f ms/op")
      r
    }
    // operation-count diagnosis: replicate the DP loop shape with counters
    def countOps(nMod: Int, cap: Int, segCost: (Int, Int) => Double, topK: Int): Unit = {
      final class E(val cost: Double)
      var prev: Array[Array[E]] = Array.fill(nMod + 1)(Array.empty)
      var j = 1
      while (j <= nMod) { prev(j) = Array(new E(segCost(0, j))); j += 1 }
      var pushes = 0L; var exams = 0L; var segs = 0L
      val ord = new Ordering[E] { def compare(x: E, y: E) = java.lang.Double.compare(-x.cost, -y.cost) }
      var g = 2
      while (g <= cap) {
        val row: Array[Array[E]] = Array.fill(nMod + 1)(Array.empty)
        var jj = g
        while (jj <= nMod) {
          val heap = scala.collection.mutable.PriorityQueue.empty[E](ord)
          var i = g - 1
          while (i < jj) {
            val c = segCost(i, jj); segs += 1
            val pe = prev(i)
            var p = 0; var stop = false
            while (p < pe.length && !stop) {
              exams += 1
              val t = pe(p).cost + c
              if (heap.size < topK) { heap.enqueue(new E(t)); pushes += 1 }
              else if (t > heap.head.cost) { heap.dequeue(); heap.enqueue(new E(t)); pushes += 1 }
              else stop = true
              p += 1
            }
            i += 1
          }
          if (heap.nonEmpty) row(jj) = heap.dequeueAll.toArray.reverse
          jj += 1
        }
        prev = row; g += 1
      }
      println(f"   countOps nMod=$nMod: segCost=$segs%,d exams=$exams%,d pushes=$pushes%,d")
    }
    {
      val (n0, n1) = hist(100)
      val pre0 = n0.scanLeft(0.0)(_ + _); val pre1 = n1.scanLeft(0.0)(_ + _)
      countOps(100, 5, (i, j) => { val r = (pre0(j) - pre0(i)) + (pre1(j) - pre1(i)); r * r / (pre1(j) - pre1(i) + 1) }, 2000)
    }
    for (nMod <- Seq(20, 50, 100)) {
      val (n0, n1) = hist(nMod)
      val labels = (0 until nMod).map(i => f"m$i%02d").toVector
      val c = time(s"chi2TopK   nMod=$nMod cap=5 topK=2000", 5) {
        Dp.chi2TopKPartitions(n0, n1, 5, labels, "tschuprowt", 2000)
      }
      println(s"   -> ${c.length} candidates, head=${c.head.combination.map(_.mkString("+")).mkString("|")}")
      val r = n0.clone()
      val k = time(s"kruskalTopK nMod=$nMod cap=5 topK=2000", 5) {
        Continuous.kruskalTopKPartitions(r, n1, n1.sum, 0.9, 5, labels, 2000)
      }
      println(s"   -> ${k.length} candidates")
    }
  }
}
