package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (guide §1): times each declared
  * query with the SAME methodology as [[Bench]] (sorted order, `.count()`
  * action, warmed tables, local[min(cpus,8)] session) and additionally
  * records the number of Spark jobs each query launches — the direct
  * measure of "how many cluster round-trips does this operator cost".
  *
  * This is a SEPARATE main so the frozen driver harness (Bench.scala)
  * stays untouched; its numbers are cited in OPTIMIZATION_r07.md only.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra [queryFilter...]"
  * With query names as args, only those run (in the given order).
  * Env:
  *   BENCH_EXTRA_REPEAT=n   repeat the whole suite n times (JIT-warm deltas)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val repeat = sys.env.getOrElse("BENCH_EXTRA_REPEAT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[${math.min(cpus, 8)}]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", math.min(cpus, 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job counter (thread-safe enough for the sequential query loop)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    // same warmup as Bench: touch every input table's data pages once
    Seq("documents", "events", "embeddings", "lineitem", "orders", "customer").foreach { t =>
      try {
        val df = graft.tables.Tables.load(spark, sfDir, t)
        val aggs = df.schema.fields.map(f =>
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col(f.name).cast("string")))
        df.agg(aggs.head, aggs.tail: _*).head()
        ()
      } catch { case _: Throwable => () }
    }

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = if (args.isEmpty) all else args.toSeq.flatMap(n => all.find(_._1 == n))
    (1 to repeat).foreach { round =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int)]
      picked.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        val j0 = jobCount.get()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        acc(name) = (sec, jobCount.get() - j0)
        spark.sparkContext.setJobDescription(null)
      }
      val total = acc.values.map(_._1).sum
      val qjson = acc.map { case (k, (s, j)) =>
        "\"" + k + "\":{\"sec\":" + f"$s%.3f" + ",\"jobs\":" + j + "}"
      }.mkString("{", ",", "}")
      println(s"""EXTRA_RESULT {"round":$round,"total":${f"$total%.3f"},"queries":$qjson}""")
    }
    spark.stop()
  }
}
