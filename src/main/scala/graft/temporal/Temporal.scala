package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time / windowed feature operators (SURVEY.md §2.10 E1–E4).
  *
  * All operators are pure DataFrame transformations: one shuffle each
  * (on the partition key), whole-stage-codegen friendly, no RDDs, no
  * driver-side collection. At cluster scale the key-partitioned window
  * shuffles are the same hash exchanges a groupBy would need, so these
  * compose with downstream aggregations without extra exchanges (Catalyst
  * reuses the child distribution when keys match).
  */
object Temporal {

  /** As-of (point-in-time) join — E1.
    *
    * For each probe row, attach the latest build row whose `buildTs <=`
    * the probe's `probeTs`, per join key (backward-inclusive semantics,
    * i.e. DuckDB/pandas `ASOF JOIN ... ON p.ts >= b.ts`). Rows with no
    * earlier build row get nulls (left join).
    *
    * Implementation: the union+window trick. Both sides are unioned with
    * a side marker, sorted per key by (ts, side) — build rows sort before
    * probes at equal ts so an exactly-simultaneous build row is visible —
    * and each requested build column is forward-filled with
    * `last(col, ignoreNulls = true)` over `rowsBetween(unboundedPreceding,
    * currentRow)`. One shuffle total (vs two + a range join for the naive
    * formulation); no join, so no skew amplification: a hot key costs one
    * sorted partition-local pass. For keys hot enough to overflow a single
    * task, pre-aggregate the build side or split probes by time range
    * before calling.
    *
    * If multiple build rows share (key, ts), the one sorting last by
    * `buildTs` then input order wins; pre-deduplicate the build side for
    * fully deterministic output.
    *
    * Reference semantics: AutoCarver has no join operator; this is the
    * BASELINE north-rule temporal core (see SURVEY.md §2.10 E1).
    */
  def asOfJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      buildValueCols: Seq[String]
  ): DataFrame = {
    require(buildValueCols.nonEmpty, "asOfJoin needs at least one build value column")
    val ts = "__asof_ts"
    val side = "__asof_side"
    val matchedTs = "__asof_matched_ts"
    val probeCols = probe.columns.toSeq
    require(
      !probeCols.exists(buildValueCols.contains),
      s"probe/build column collision: ${probeCols.intersect(buildValueCols)}"
    )

    val p = probe
      .withColumn(ts, col(probeTs))
      .withColumn(side, lit(1))
      .withColumn(matchedTs, lit(null).cast(probe.schema(probeTs).dataType))
    val pAligned = buildValueCols.foldLeft(p) { (df, c) =>
      df.withColumn(c, lit(null).cast(build.schema(c).dataType))
    }
    val bBase = build
      .withColumn(ts, col(buildTs))
      .withColumn(side, lit(0))
      .withColumn(matchedTs, col(buildTs))
    // build rows carry null for every probe-only column
    val bAligned = probeCols.filterNot(c => keys.contains(c)).foldLeft(bBase) { (df, c) =>
      if (build.columns.contains(c)) df else df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
    val cols = (probeCols ++ buildValueCols ++ Seq(ts, side, matchedTs)).distinct
    val unioned = pAligned.select(cols.map(col): _*)
      .unionByName(bAligned.select(cols.map(col): _*))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (buildValueCols :+ matchedTs).foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(side) === 1)
      .select((probeCols ++ buildValueCols :+ matchedTs).map(col): _*)
      .withColumnRenamed(matchedTs, "matched_ts")
  }

  /** Lag/lead feature columns — E2. One window shuffle for all requested offsets. */
  def lagLead(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[String],
      valueCol: String,
      lags: Seq[Int] = Seq(1),
      leads: Seq[Int] = Seq(1)
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(col): _*)
    val withLags = lags.foldLeft(df)((d, n) => d.withColumn(s"${valueCol}_lag$n", lag(col(valueCol), n).over(w)))
    leads.foldLeft(withLags)((d, n) => d.withColumn(s"${valueCol}_lead$n", lead(col(valueCol), n).over(w)))
  }

  /** Gap-based sessionization — E3.
    *
    * A new session starts when the gap to the previous event for the same
    * key exceeds `gapSeconds` (strictly greater). Session ids are 0-based
    * per key, assigned by a cumulative sum of new-session flags — two
    * window functions over one shuffle.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      orderTieBreak: Seq[String] = Nil
  ): DataFrame = {
    val order = (col(tsCol) +: orderTieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val gapUs = gapSeconds * 1000000L
    // cast covers TIMESTAMP_NTZ parquet columns (session tz is UTC)
    val tsUs = unix_micros(col(tsCol).cast("timestamp"))
    val prevTs = lag(tsUs, 1).over(w)
    val isNew = when(prevTs.isNull, lit(0L))
      .otherwise(when(tsUs - prevTs > gapUs, lit(1L)).otherwise(lit(0L)))
    df.withColumn(
      "session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
  }

  /** Forward-fill (backfill) — E4: replace nulls with the latest preceding
    * non-null value per key. One window shuffle for all columns.
    */
  def backfill(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      orderTieBreak: Seq[String] = Nil
  ): DataFrame = {
    val order = (col(tsCol) +: orderTieBreak.map(col)).map(_.asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Temporal-leakage guard — E5: restrict a training frame to rows at or
    * before the as-of cutoff. Trivial on purpose: every fit path routes
    * through it so the leakage invariant is greppable and testable.
    */
  def leakageGuard(df: DataFrame, tsCol: String, asOf: java.sql.Timestamp): DataFrame =
    df.filter(col(tsCol) <= lit(asOf))

  /** Skew-salted range repartitioning — E7.
    *
    * Range-partition on (ts, salt) where salt = pmod(hash(key), buckets):
    * a hot key's rows spread across `saltBuckets` consecutive partitions
    * instead of landing in one, while the primary ts ordering (what
    * downstream temporal scans prune on) is preserved. Use for writes and
    * wide stages keyed by a Zipf-skewed entity (url hosts).
    */
  def skewSaltedRepartitionByRange(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      numPartitions: Int,
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(keyCol)), lit(saltBuckets)))
    salted.repartitionByRange(numPartitions, col(tsCol), col("__salt")).drop("__salt")
  }

  /** Hot-key detection via sampling: keys whose sampled share exceeds
    * `shareThreshold` (the candidates for salting / broadcast isolation).
    * Frame variant — `sampleFraction = 1.0` makes it exact (the oracle
    * path); the sampled default keeps the scan cheap at 100 TB.
    */
  def hotKeysFrame(df: DataFrame, keyCol: String, shareThreshold: Double = 0.01,
      sampleFraction: Double = 0.05): DataFrame = {
    val sampled =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val total = math.max(sampled.count(), 1L)
    sampled.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > (lit(total) * shareThreshold))
      .orderBy(col("n").desc, col("k"))
  }

  def hotKeys(df: DataFrame, keyCol: String, shareThreshold: Double = 0.01, sampleFraction: Double = 0.05): Seq[(String, Long)] =
    hotKeysFrame(df, keyCol, shareThreshold, sampleFraction)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
}
