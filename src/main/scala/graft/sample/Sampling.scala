package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and train/test splitting for a training-data
  * pipeline — the operations a 100 TB corpus needs BEFORE any fit:
  *
  *  - [[hashSplit]] — per-row train/test assignment by a portable hash of
  *    the row key. Reproducible across runs, clusters and engines (the
  *    correctness oracle replays the FNV-1a hash in plain SQL); no RNG, no
  *    `sample()` nondeterminism, no full-data shuffle — a pure projection.
  *  - [[groupSplit]] — LEAKAGE-SAFE split: every row of a group (e.g. all
  *    pages of one url host) lands in the same side, so near-duplicate
  *    crawls of one site can never straddle train/test. Same hash, keyed
  *    by the group column.
  *  - [[stratifiedSample]] — per-stratum sampling fractions via the same
  *    hash threshold: exact-in-expectation, deterministic, single scan,
  *    no `sampleBy` RNG (whose results depend on partitioning).
  *
  * All three are column expressions (codegen'd FNV), so they push into the
  * scan stage and cost nothing extra at scale.
  */
object Sampling {

  /** Deterministic value in [0, 1) for a key: portable FNV-1a of
    * "key:seed", folded to 6 decimal digits. The oracle replays the exact
    * arithmetic in DuckDB HUGEINT SQL.
    */
  def hashUnit(key: Column, seed: Long): Column =
    pmod(graft.transform.Fnv1aRaw.column(concat(key.cast("string"), lit(s":$seed"))),
      lit(1000000L)).cast("double") / 1e6

  /** Adds a `split` column ("train" / "test") keyed by `keyCol`.
    *
    * NULL-KEY CONTRACT (applies to [[groupSplit]] and
    * [[stratifiedSample]] too): `hashUnit(null)` is null, null compares
    * false, so every null-key row deterministically routes to `train`
    * here and is DROPPED by stratifiedSample's filter. A corpus where
    * null keys are meaningful should coalesce them to a sentinel first —
    * the engine will not invent a hash for a missing identity.
    */
  def hashSplit(df: DataFrame, keyCol: String, testFrac: Double, seed: Long = 42L): DataFrame = {
    require(testFrac > 0.0 && testFrac < 1.0, s"testFrac $testFrac out of (0,1)")
    df.withColumn("split",
      when(hashUnit(col(keyCol), seed) < testFrac, lit("test")).otherwise(lit("train")))
  }

  /** Adds a `split` column keyed by `groupCol` — all rows of a group share
    * the assignment (leakage-safe across near-duplicates of one site).
    */
  def groupSplit(df: DataFrame, groupCol: String, testFrac: Double, seed: Long = 42L): DataFrame =
    hashSplit(df, groupCol, testFrac, seed) // same hash, group column as key

  /** Keeps each row with its stratum's fraction (default `defaultFrac` for
    * unlisted strata). Null strata use `defaultFrac`.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fracs: Map[String, Double],
      defaultFrac: Double = 0.0,
      seed: Long = 42L
  ): DataFrame = {
    require((fracs.values ++ Seq(defaultFrac)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val fracCol =
      if (fracs.isEmpty) lit(defaultFrac)
      else coalesce(element_at(typedlit(fracs), col(strataCol).cast("string")), lit(defaultFrac))
    df.filter(hashUnit(col(keyCol), seed) < fracCol)
  }
}
