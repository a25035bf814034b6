package graft

/** Anti-pattern guard over the ENTIRE gated query surface: no query may
  * plan a CartesianProduct, and BroadcastNestedLoopJoin is allowed only
  * where a documented constant-size side makes it the right plan (scalar
  * aggregates crossed in — capacity rows, corpus totals, TPC-H scalar
  * subqueries — or the deliberately quadratic exact-pairs validation
  * baseline). A new operator that accidentally plans a cross join fails
  * here before it ever reaches a cluster. */
class PlanGuardSpec extends SparkSpec {

  // name -> max BroadcastNestedLoopJoin nodes, with the constant-size side
  // that justifies each
  private val bnlAllowed: Map[String, Int] = Map(
    "llm_balance_mix" -> 1,          // 1-row capacity aggregate
    "llm_bm25" -> 1,                 // 1-row corpus-stats aggregate
    "llm_embed_ann_recall" -> 3,     // exact-pairs baseline + summary rows
    "llm_embed_cluster_recall" -> 3, // exact-pairs baseline + summary rows
    "llm_embed_exact_pairs" -> 1,    // the documented quadratic baseline
    "llm_knn_graph" -> 2,            // exact-pair mode, both directions
    "llm_knn_density" -> 2,          // exact-pair mode, both directions
    "llm_lm_bigram" -> 1,            // 1-row vocab aggregate
    "llm_pipeline_curate_v2" -> 1,   // 1-row capacity aggregate (balanceMix)
    "llm_embed_quantized_topk" -> 1, // 1-row query-vector broadcast
    "llm_embed_topk" -> 1,           // 1-row query-vector broadcast
    "llm_lm_score" -> 1,             // 2-row total/vocab aggregate
    "llm_semantic_dedup" -> 1,       // exact-pair mode (validation)
    "llm_tfidf_pairs" -> 3,          // 1-row corpus-size (idf N) aggregate;
                                     // the cached weight relation is printed
                                     // under dots + both norm joins, so the
                                     // single scalar cross shows 3× in text
                                     // (one cache build executes it once)
    "llm_vocab_coverage" -> 1,       // 1-row top-K sum × 1-row totals
    "llm_distinct_sketch" -> 1,      // 1-row merged sketch × 1-row exact
    "tpch_q11" -> 1,                 // scalar-subquery threshold
    "tpch_q22" -> 1)                 // scalar-subquery avg balance

  test("no gated query plans a cartesian product; nested-loop joins only " +
    "where a constant-size side justifies them") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = "CartesianProduct".r.findAllIn(plan).length
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        val bad =
          (if (cart > 0) Seq(s"$name: CartesianProduct x$cart") else Nil) ++
          (if (bnl > bnlAllowed.getOrElse(name, 0))
            Seq(s"$name: BroadcastNestedLoopJoin x$bnl " +
              s"(allowed ${bnlAllowed.getOrElse(name, 0)})")
          else Nil)
        bad
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
