package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: greedily fills fixed
  * token-budget sequences with whole documents, in deterministic id order.
  *
  * Scale design: a truly global greedy pack is a sequential recurrence —
  * unusable at 10^11 docs. Instead documents are grouped into LOGICAL
  * BLOCKS of `blockSize` consecutive ids (`block = id / blockSize`), and
  * packing runs independently per block: blocks are embarrassingly
  * parallel (one shuffle keyed by block), the result is fully
  * deterministic (independent of physical partitioning), per-task memory
  * is bounded by `blockSize` rows, and the only waste vs a global pack is
  * at most one under-filled sequence per block. Sequence ids are
  * `(block, seq_in_block)`.
  *
  * Packing rule (first-fit in id order): a document that would overflow
  * the current sequence's remaining budget starts a new sequence; a
  * document longer than the whole budget gets a sequence of its own (kept
  * whole — truncation is the tokenizer's decision, not the packer's).
  */
object Packing {

  final case class PackedDoc(id: Long, block: Long, seq: Long, pos: Long, tokens: Long)

  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      blockSize: Long = 100000L
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(blockSize > 0, "blockSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // null-safety: a null token count (e.g. TokenCount over a null text)
    // packs as 0 tokens — the doc still lands in a sequence; rows with a
    // null id are unaddressable and are dropped
    df.select(col(idCol).cast("long"), coalesce(col(tokenCol).cast("long"), lit(0L)))
      .filter(col(idCol).isNotNull)
      .as[(Long, Long)]
      // floorDiv, not truncating `/`: with signed ids, truncation folds all
      // of (-blockSize, blockSize) into block 0 — up to 2*blockSize-1 rows
      // in one task, silently doubling the documented memory bound
      .groupByKey(p => Math.floorDiv(p._1, blockSize))
      .flatMapGroups { (block, it) =>
        val docs = it.toArray.sortBy(_._1)
        var seq = 0L
        var used = 0L
        var pos = 0L
        docs.iterator.map { case (id, t) =>
          if (used > 0 && used + t > budget) { seq += 1; used = 0; pos = 0 }
          val out = PackedDoc(id, block, seq, pos, t)
          used += t
          pos += 1
          out
        }
      }
      .toDF()
  }

  /** Per-sequence fill statistics — the packing-efficiency report. */
  def sequenceStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("block"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
      .withColumn("fill", round(col("tokens").cast("double") / budget, 6))
}
