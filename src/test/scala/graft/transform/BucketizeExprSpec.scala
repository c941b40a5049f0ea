package graft.transform

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BucketizeExprSpec extends SparkSuite {
  import spark.implicits._

  test("binary-search bucketize matches searchsorted side='left' semantics") {
    val edges = Vector(1.0, 3.0, 5.0)
    val bins = Vector(0, 1, 2, 3) // identity prebin->bin
    val df = Seq(0.5, 1.0, 1.5, 3.0, 3.5, 5.0, 99.0).toDF("x")
    val out = df.select(col("x"), BinarySearchBucketize.column(col("x"), edges, bins, -1).as("b"))
      .as[(Double, Int)].collect().toMap
    assert(out(0.5) == 0)
    assert(out(1.0) == 0) // x == edge -> (prev, edge] bucket (side left)
    assert(out(1.5) == 1)
    assert(out(3.0) == 1)
    assert(out(3.5) == 2)
    assert(out(5.0) == 2)
    assert(out(99.0) == 3)
  }

  test("null and NaN route to nanBin; null when no nan bin") {
    val edges = Vector(1.0)
    val df = Seq(Some(0.5), None, Some(Double.NaN)).toDF("x")
    val withNan = df.select(BinarySearchBucketize.column(col("x"), edges, Vector(0, 1), 7).as("b"))
      .as[Int].collect()
    assert(withNan.sorted.sameElements(Array(0, 7, 7)))
    val noNan = df.select(BinarySearchBucketize.column(col("x"), edges, Vector(0, 1), -1).as("b"))
      .as[Option[Int]].collect()
    assert(noNan.count(_.isEmpty) == 2)
  }

  test("works under whole-stage codegen and merged prebin mapping") {
    val edges = Vector.tabulate(99)(i => (i + 1).toDouble) // 100 prebins
    val mapping = Vector.tabulate(100)(i => i / 25)        // 4 final bins
    val df = spark.range(0, 1000).select((col("id") % 100).cast("double").as("x"))
    val out = df.select(BinarySearchBucketize.column(col("x"), edges, mapping, -1).as("b"))
    val counts = out.groupBy("b").count().orderBy("b").as[(Int, Long)].collect()
    assert(counts.map(_._1).sameElements(Array(0, 1, 2, 3)))
    assert(counts.map(_._2).sum == 1000)
    // plan stays inside whole-stage codegen ("*(n)" marker) and the
    // generated Java contains our binary search (no interpreted fallback)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(300))
    val gen = org.apache.spark.sql.execution.debug.codegenString(out.queryExecution.executedPlan)
    assert(gen.contains(">>> 1"), gen.take(500))
  }
}
