package graft.carve

/** Ad-hoc driver-tail profiler (not a test): times HistJson.read and the
  * per-feature DP search from a bench checkpoint left on disk.
  * Run: java -cp ... graft.carve.DpProfile <hist.json path>
  */
object DpProfile {
  def main(args: Array[String]): Unit = {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    // the bench checkpoint wraps the histogram in {stage,...,payload}
    val json = {
      import org.json4s._, org.json4s.jackson.JsonMethods
      JsonMethods.parse(raw) \ "payload" match {
        case JString(p) => p
        case _ => raw
      }
    }
    val t0 = System.nanoTime()
    val hist = graft.pages.HistJson.read(json)
    println(f"HistJson.read: ${(System.nanoTime() - t0) / 1e9}%.3f s, features=${hist.size}, rows=${hist.values.map(_.length).sum}")
    hist.foreach { case (k, v) => println(f"  $k%-16s ${v.length}%6d rows") }
    val specs = graft.pages.PagePipeline.specs
    // warmup
    BinaryCarver.fitFromHistograms(hist, None, "y", specs)
    for (_ <- 1 to 3) {
      specs.foreach { s =>
        val t = System.nanoTime()
        BinaryCarver.fitFromHistograms(hist.view.filterKeys(_ == s.name).toMap, None, "y", Seq(s))
        println(f"  fit ${s.name}%-16s ${(System.nanoTime() - t) / 1e9}%.3f s")
      }
      val t = System.nanoTime()
      BinaryCarver.fitFromHistograms(hist, None, "y", specs)
      println(f"  fit ALL(6)        ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
  }
}
