package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Smoke-level pinning for every declared query: runs at sf0.001,
  * asserts non-empty and stable row counts where the count is a
  * meaningful semantic (the DuckDB oracle compare is the authoritative
  * value-level gate, run by the driver / check_oracle.py). */
class QueriesSpec extends SparkSpec {

  test("every declared query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("pinned row counts at sf0.001") {
    val expect = Map(
      "q01_scan_project_sort" -> 5L,
      "q04_join_chain_agg" -> 5L,
      "q09_count_distinct" -> 1L,
      "q13_topk_limit" -> 25L,
      "q23_exact_dedup_distinct" -> 6L,
      "x01_exact_dedup" -> 500L,  // no exact dups at sf0.001
      "x06_cosine_topk_bruteforce" -> 50L, // 5 queries × k=10
      "x10_token_count" -> 500L,
      "x58_bm25_retrieval" -> 30L, // 3 queries × k=10
      "x71_token_budget_select" -> 500L) // every doc attributed
    expect.foreach { case (name, want) =>
      val got = SparkEntry.queries(name)(spark, sf001).count()
      assert(got == want, s"$name: got $got want $want")
    }
  }
}
