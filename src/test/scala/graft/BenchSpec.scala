package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function coverage for the bench harness's normalizer and the
  * contamination sentinel's artifact parser — the pieces whose silent
  * breakage would invalidate cross-round performance adjudication. */
class BenchSpec extends AnyFunSuite {

  test("flatMapOf: extracts queries/plans maps from the one-line artifact; " +
      "tolerates empty maps and missing keys") {
    val line = """{"metric":"sec","value":1.0,"queries":{"q01_a":0.25,"x02_b":1.5},""" +
      """"plans":{"q01_a":"deadbeef","x02_b":"12345678"},"failed":{}}"""
    assert(Bench.flatMapOf(line, "queries") ==
      Map("q01_a" -> "0.25", "x02_b" -> "1.5"))
    assert(Bench.flatMapOf(line, "plans") ==
      Map("q01_a" -> "deadbeef", "x02_b" -> "12345678"))
    assert(Bench.flatMapOf(line, "failed") == Map.empty)
    assert(Bench.flatMapOf(line, "nope") == Map.empty)
    assert(Bench.flatMapOf("not json at all", "queries") == Map.empty)
  }

  test("normalizeText: the r14-churn variants — expression ids, lambda " +
      "counters, gid assignment, aggregate-key order, hashpartitioning " +
      "order, object identities — normalize to ONE text; a literal hex " +
      "string survives (ADVICE r14)") {
    // the same plan printed in two sessions: different exprIds, lambda
    // counters, gid assignment, attribute iteration order, identities
    val runA = "HashAggregate(keys=[b#12, a#7L], functions=[partial_count(x#3) " +
      "FILTER (WHERE (gid#9 = 3))]) +- Exchange hashpartitioning(b#12, a#7L, 32), " +
      "[plan_id=55] +- Project [lambdafunction(length(lambda x_111#2) > 0, " +
      "lambda x_111#2, false)] +- Scan ExistingRDD[a#7L,b#12] LogicalRDD@1a2b3c4"
    val runB = "HashAggregate(keys=[a#901L, b#955], functions=[partial_count(x#800) " +
      "FILTER (WHERE (gid#990 = 7))]) +- Exchange hashpartitioning(a#901L, b#955, 32), " +
      "[plan_id=812] +- Project [lambdafunction(length(lambda x_2724#801) > 0, " +
      "lambda x_2724#801, false)] +- Scan ExistingRDD[b#955,a#901L] LogicalRDD@9f8e7d6"
    assert(Bench.normalizeText(runA) == Bench.normalizeText(runB))
    // a genuinely different plan (extra exchange) must NOT collapse
    val runC = runA.replace("Exchange hashpartitioning", "Exchange rangepartitioning")
    assert(Bench.normalizeText(runA) != Bench.normalizeText(runC))
    // a literal hex string in a filter is NOT an object identity — the
    // anchored rule must leave it alone (a real literal change flips
    // the fp)
    val litA = Bench.normalizeText("Filter (col#1 = @abcdef123456)")
    val litB = Bench.normalizeText("Filter (col#1 = @fedcba654321)")
    assert(litA != litB)
  }
}
