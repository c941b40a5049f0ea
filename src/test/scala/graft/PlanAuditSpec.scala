package graft

/** Pinned physical-plan budgets for the most expensive queries (the
  * regression-gate form of [[PlanAudit]]): a change that un-pushes a
  * filter, adds a shuffle, or reintroduces a hot-key window fails HERE,
  * not in a 100 TB run. Budgets are raw "Exchange"-line counts of the
  * formatted pre-AQE plan (each exchange appears twice: tree + detail),
  * measured on the plans as shipped — a tighter future plan may lower
  * them, anything above is a regression.
  */
class PlanAuditSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  private def exchanges(p: String): Int = p.linesIterator.count(_.contains("Exchange"))

  test("exchange budgets hold for the expensive pipelines") {
    val budgets = Map(
      "q_ngram_jaccard" -> 12, // posting build + bounded self-join + verify
      "q_dedup_minhash" -> 8, // band explode + capped buckets + pair agg
      "q_embed_neardup" -> 8, // sign-LSH banding + capped buckets + verify
      "q1_agg" -> 2, // one groupBy shuffle
      // r7: broadcast join + TWO window shuffles — the two-phase top-k
      // trades one extra narrow-column exchange (hash on (segment,
      // partition-id), thousands of keys) for removing the 5-task
      // hot-segment funnel of the single global window (guide §2.5)
      "q3_topk" -> 6,
      "q_asof_join" -> 4, // union + one range/window shuffle
      "q_sessionize" -> 2, // one window shuffle for lag+session
      "q_dedup_exact" -> 2, // one digest groupBy
      "q_pack_sequences" -> 2, // one block groupBy
      "q_knn_brute" -> 4 // broadcast query side + top-k window
    )
    budgets.foreach { case (q, budget) =>
      val n = exchanges(plan(q))
      assert(n <= budget, s"$q exchange count regressed: $n > $budget")
    }
  }

  test("pure projections stay shuffle-free") {
    // the scoring path (X1/X2 codegen) and the portable hash split must
    // never shuffle — they are the per-row hot paths at corpus scale
    Seq("q_carve_transform", "q_hash_split").foreach { q =>
      val n = exchanges(plan(q))
      assert(n == 0, s"$q must be a pure projection, found $n exchange lines")
    }
  }

  test("no window partitioned on the raw gram key (hot-key skew fix pinned)") {
    // VERDICT r5 item 2: counting postings with count().over(partitionBy(gram))
    // funnels every posting of a hot gram into one task; the fix pre-aggregates
    // and broadcast-anti-joins. The only windows left in the n-gram pipeline
    // are the bounded LSH bucket caps keyed on (band, hash).
    assert(!plan("q_ngram_jaccard").contains("windowspecdefinition(gram"))
  }

  test("no window partitioned on a text digest (applied dedup paths de-windowed)") {
    // VERDICT r6 item 2: row_number()/min() over partitionBy(md5(text))
    // funnels every copy of the hottest digest (an empty/boilerplate page
    // duplicated ~10⁹× at web scale) into ONE window task. Both applied
    // paths now pre-aggregate the keeper set (groupBy digest → min id,
    // map-side partial aggregation) and join back — no window at all.
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val dropper = graft.dedup.Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!dropper.contains("windowspecdefinition"),
      "dropExactDuplicates must stay window-free")
    val shortEdges = graft.dedup.Dedup.shortTextEdges(docs, "doc_id", "text", 5)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!shortEdges.contains("windowspecdefinition"),
      "shortTextEdges (nearDupComponents exact path) must stay window-free")
  }

  test("leakage guard pushes the as-of filter into the parquet scan") {
    val p = plan("q_leakage_guard")
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("LessThanOrEqual(ts"),
      "the warc_ts<=asOf guard must reach the scan:\n" +
        p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }
}
