package graft

import graft.queries.TextQueries

/** Plan assertions for the composed curation pipelines — the queries
  * whose scale behavior depends on Catalyst/AQE picking the right
  * physical join, not just on the declared shape.
  */
class CurationPlanSpec extends SparkSpec {

  test("curate_corpus_full decontamination anti-join is hash-based, never a nested loop") {
    // the contaminated set is data-dependent and unbounded, so the query
    // carries NO broadcast hint: AQE must still resolve the equi
    // anti-join to a hash join at this scale (BHJ expected — the set
    // measures tiny; SMJ is the acceptable at-scale fallback), and a
    // BroadcastNestedLoopJoin anywhere in the final adaptive plan would
    // mean the join degenerated
    val df = TextQueries.queries("curate_corpus_full")(spark, Sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("search_bm25 plan: one corpus pass, top-k heap, no vector exchange") {
    // the per-doc frame must materialize ONCE (localCheckpoint) so the
    // corpus explode doesn't run per reference; the totals side is a
    // 1-row broadcast (the only sanctioned cross join); the top-k must
    // be TakeOrdered, never a global sort
    val df = TextQueries.queries("search_bm25")(spark, Sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    // exactly one Generate (the explode) across the whole plan — a
    // second one means the per-doc subtree recomputed
    assert("Generate".r.findAllIn(plan).size <= 1, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("vocab_bpe_encode plan: vocabulary join carries no broadcast hint") {
    // the vocab is corpus-derived (unbounded) — the word-key join must
    // come from AQE's size check, not a forced hint; and no nested loop
    val df = TextQueries.queries("vocab_bpe_encode")(spark, Sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("train_manifest_full: contiguous gap-free offsets, no nested loops") {
    val df = TextQueries.queries("train_manifest_full")(spark, Sf)
    val rows = df.select("n_tokens", "start_offset", "end_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    assert(rows.nonEmpty)
    // every row spans exactly its token count, the stream starts at 0,
    // and consecutive rows are gap-free (a packed manifest's contract)
    assert(rows.forall { case (n, s, e) => e - s == n })
    assert(rows.head._2 === 0L)
    rows.sliding(2).foreach {
      case Array((_, _, e1), (_, s2, _)) => assert(e1 === s2)
      case _ =>
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("curate_corpus_full survives with AQE disabled (static-plan fallback)") {
    // the unforced joins lean on AQE's runtime size check; with AQE off
    // the static planner must still produce a correct (if less optimal)
    // plan — this is the degraded-config resilience the no-hint design
    // claims. Results must match the AQE run exactly.
    val withAqe = TextQueries.queries("curate_corpus_full")(spark, Sf)
      .collect().map(_.toString).sorted
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val noAqe = TextQueries.queries("curate_corpus_full")(spark, Sf)
        .collect().map(_.toString).sorted
      assert(noAqe.sameElements(withAqe))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
