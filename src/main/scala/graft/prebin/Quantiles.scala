package graft.prebin

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles with the reference's `method='lower'`
  * semantics: quantile p of N sorted values is `sorted[floor(p*(N-1))]`
  * (AutoCarver `discretizers/quantitatives/continuous_discretizer.py:75-84`
  * uses numpy `method='lower'`).
  *
  * Strategy: a value-count histogram (`groupBy(value).count()`) plus a
  * cumulative-count window gives every order statistic exactly with one
  * shuffle sized by the column's *cardinality*, not its row count. For
  * web-scale columns whose cardinality is itself huge, the carver falls
  * back to `approxQuantile` with a tight epsilon (see SURVEY.md §7.4 —
  * quantile parity at scale); the histogram path is the parity gate.
  */
object Quantiles {

  /** DataFrame of (p_idx, edge): the q-quantile edges p_idx/q for
    * p_idx = 1..q-1, lower-method. Fully declarative (no collect).
    */
  def exactEdgesDF(df: DataFrame, valueCol: String, q: Int): DataFrame = {
    val spark = df.sparkSession
    val nonNull = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val hist = nonNull.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val total = nonNull.count()
    val probs = spark.range(1, q.toLong).select(col("id").as("p_idx"))
    // target order-statistic index: floor(p*(N-1)); edge = min v with cum >= idx+1
    val withIdx = probs.withColumn(
      "target",
      floor(col("p_idx").cast("double") / lit(q.toDouble) * lit((total - 1).toDouble)).cast("long")
    )
    cum
      .join(broadcast(withIdx), col("cum") >= col("target") + 1)
      .groupBy(col("p_idx"))
      .agg(min(col("v")).as("edge"))
      .select(col("p_idx"), col("edge"))
  }

  /** Driver-side edge array (distinct, ascending) for the carver pre-bin. */
  def exactEdges(df: DataFrame, valueCol: String, q: Int): Array[Double] =
    exactEdgesDF(df, valueCol, q)
      .orderBy("p_idx")
      .collect()
      .map(_.getDouble(1))
      .distinct
}
