package graft.operators

import graft.SparkSpec

/** Unit semantics for majority-vote label propagation: vote counting,
  * the (count desc, label asc) tie-break, seed immutability, round
  * provenance, and multi-hop reach. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  //   1 ─▶ 10, 11, 12   (seeds: 10→A=1, 11→A=1, 12→B=2)  majority A
  //   2 ─▶ 10, 12       tie 1×A vs 1×B → smaller label A wins
  //   3 ─▶ 1            no labeled neighbor in round 1; 1 adopts in
  //                     round 1, so 3 adopts ITS label in round 2
  //   4 ─▶ (nothing)    absent from edges → never labeled
  //   10 ─▶ 12          seed: must keep A=1, never adopt B
  private val edges = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 12L),
    (3L, 1L),
    (10L, 12L)).toDF("src", "dst")
  private val seeds = Seq((10L, 1), (11L, 1), (12L, 2)).toDF("id", "label")

  test("labelPropagate: majority vote, min-label tie-break, seeds immutable, round provenance") {
    val out = Graph.labelPropagate(edges, seeds, rounds = 2)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1, 1),   // majority 2×A vs 1×B
      (2L, 1, 1),   // 1×A vs 1×B tie → smaller label
      (3L, 1, 2),   // reached only through 1's round-1 label
      (10L, 1, 0), (11L, 1, 0), (12L, 2, 0)))
    // node 4 never appears: no edges, no label
  }

  test("labelPropagate: rounds=1 stops before multi-hop reach") {
    val out = Graph.labelPropagate(edges, seeds, rounds = 1)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(!out.exists(_._1 == 3L), "3 is two hops from any seed")
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 1, 2L -> 1, 10L -> 1, 11L -> 1, 12L -> 2))
  }

  test("labelPropagate: a seed with a differently-labeled neighborhood keeps its label") {
    // 12 (seed B) points at 12→... no outgoing needed: give 12 an edge
    // to two A seeds — it must still report B at round 0
    val e = Seq((12L, 10L), (12L, 11L)).toDF("src", "dst")
    val out = Graph.labelPropagate(e, seeds, rounds = 2)
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((10L, 1, 0), (11L, 1, 0), (12L, 2, 0)))
  }

  test("pageRank: hand-computed micro-unit ranks over two iterations") {
    // 1→2, 2→1, 3→1; all out-degrees 1, contrib = pr·17 div 20
    // p1: 1 = 150000 + 850000·2 = 1850000; 2 = 150000+850000; 3 = 150000
    // p2: 1 = 150000 + 850000 + 127500 = 1127500
    //     2 = 150000 + (1850000·17 div 20 = 1572500) = 1722500
    //     3 = 150000 (no in-edges)
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1127500L), (2L, 1722500L), (3L, 150000L)))
  }

  test("pageRank: dangling mass is dropped, total never exceeds N·10⁶") {
    // 2 is a sink (no out-edges): its mass vanishes each round
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    // p1: 1=150000, 2=150000+850000=1000000
    // p2: 1=150000, 2=150000+(150000·17 div 20=127500)=277500
    assert(out.toSeq == Seq((1L, 150000L), (2L, 277500L)))
    assert(out.map(_._2).sum <= 2L * 1000000L)
  }

  test("mutualEdges + triangleProfile: one triangle, integer coefficient, one-way edges excluded") {
    // mutual pairs 1↔2, 2↔3, 1↔3 (a triangle) + one-way 4→1 (ignored)
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (1L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val mu = Graph.mutualEdges(e).as[(Long, Long)].collect().sortBy(identity)
    assert(mu.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val out = Graph.triangleProfile(Graph.mutualEdges(e))
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    // every node: deg 2, 1 triangle, cc = 2·1·10⁶ / (2·1) = 10⁶
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, Some(1000000L)),
      (2L, 2L, 1L, Some(1000000L)),
      (3L, 2L, 1L, Some(1000000L))))
  }

  test("triangleProfile: open wedge has zero triangles; deg-1 nodes get null coefficient") {
    val und = Seq((1L, 2L), (2L, 3L)).toDF("u", "v") // path, no closing edge
    val out = Graph.triangleProfile(und)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, None),
      (2L, 2L, 0L, Some(0L)),
      (3L, 1L, 0L, None)))
  }

  test("degreeProfile: out/in/mutual degrees, sink-only and source-only nodes included") {
    //   1→2, 2→1 (mutual pair)   1→3 (one-way)   4→1 (source 4, 1 gains in)
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val out = Graph.degreeProfile(e)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L),  // out: →2,→3; in: 2→,4→; mutual: 1↔2
      (2L, 1L, 1L, 1L),
      (3L, 0L, 1L, 0L),  // sink-only: appears with out_deg 0
      (4L, 1L, 0L, 0L))) // source-only: appears with in_deg 0
  }

  test("linkPrediction: non-adjacent pairs only, exact counts and Jaccard micro") {
    // path 1—2—3—4: candidates are the two wedge endpoints
    //   (1,3) via 2: common 1, deg 1+2−1=2 → 500000
    //   (2,4) via 3: common 1, deg 2+1−1=2 → 500000
    // (1,4) shares no neighbor → absent
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = Graph.linkPrediction(e)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 500000L),
      (2L, 4L, 1L, 500000L)))
  }

  test("linkPrediction: adjacent pairs are excluded even with common neighbors") {
    // triangle 1-2-3 plus pendant 3—4: (1,2) shares 3 but IS an edge
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = Graph.linkPrediction(e)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // (1,4) and (2,4) each share neighbor 3: jac = 1/(2+1−1) = 500000
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 500000L),
      (2L, 4L, 1L, 500000L)))
  }

  test("linkPrediction: minCommon filters single-wedge evidence") {
    // K(2,2): 1,2 on one side, 3,4 on the other — (1,2) and (3,4)
    // each share BOTH opposite nodes: common 2, jac = 2/(2+2−2) = 10⁶
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("u", "v")
    val out = Graph.linkPrediction(e, minCommon = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1000000L),
      (3L, 4L, 2L, 1000000L)))
  }

  test("partitionModularity: two bridged triangles score the textbook Q; " +
      "an unlabeled endpoint makes its edges between-groups") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("u", "v")
    val labAll = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, "B"), (6L, "B")).toDF("id", "label")
    val out = Graph.partitionModularity(und, labAll)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // m=7; each side: 3/7 − (7/14)² = 0.178571
    assert(out.toSeq == Seq(
      ("A", 3L, 3L, 7L, 178571L, 357142L),
      ("B", 3L, 3L, 7L, 178571L, 357142L)))
    // drop node 6's label: B keeps only the 4-5 edge within
    val labPart = labAll.filter($"id" =!= 6L)
    val part = Graph.partitionModularity(und, labPart)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(part.toSeq == Seq(
      ("A", 3L, 3L, 7L, 178571L, 193877L),
      ("B", 2L, 1L, 5L, 15306L, 193877L)))
  }

  test("kCore: pendant and chain peel away, the triangle is the 2-core, " +
      "and extra rounds past the fixpoint change nothing") {
    // triangle 1-2-3, pendant 4 on 1, chain 5-6
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L))
      .toDF("u", "v")
    val out = Graph.kCore(e, k = 2, rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    val more = Graph.kCore(e, k = 2, rounds = 5)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(more.toSeq == out.toSeq)
  }

  test("kCore: cascading peel — a path needs one round per layer, and a " +
      "graph with no k-core returns empty") {
    // path 1-2-3-4-5: 2-core is empty, but each peel round only
    // removes the current endpoints — 2 rounds leave {3}, 3+ rounds
    // reach the true (empty) core
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    assert(Graph.kCore(path, k = 2, rounds = 3).count() == 0)
    // 4-clique: every node sits in the 3-core with core_deg 3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("u", "v")
    val out = Graph.kCore(k4, k = 3, rounds = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("labelNoiseAudit: hand-traced disagreement counts; strict majority " +
      "flags suspects; edge-less points are absent") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (3L, 2L))
      .toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "a"))
      .toDF("id", "label")
    val out = Graph.labelNoiseAudit(edges, labels)
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      // 1: neighbors 2(b), 3(b) — both disagree with a → suspect
      (1L, "a", 2L, 2L, 1000000L, true),
      // 2: neighbor 1(a) disagrees with b → 1/1, suspect
      (2L, "b", 1L, 1L, 1000000L, true),
      // 3: neighbors 1(a), 2(b) — one disagrees → 1/2, NOT strict majority
      (3L, "b", 2L, 1L, 500000L, false)))
    // 4 has no outgoing edges: no evidence, no row
    assert(!out.exists(_._1 == 4L))
  }
  test("degreeAssortativity: star graph reads exactly -1; mixed star+leaf " +
      "edge hand-traced; regular graph (zero variance) emits nothing") {
    import spark.implicits._
    def sym(e: Seq[(Long, Long)]) =
      (e ++ e.map(p => (p._2, p._1))).toDF("src", "dst")
    val star = sym(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    val s = graft.operators.Graph.degreeAssortativity(star)
      .as[(Long, Long, Long)].collect()
    assert(s.toSeq == Seq((4L, 6L, -1000000L)))
    // star + l1-l2 edge: m=8, Sxy=38, Sxx=Syy=44, Sx=Sy=18
    // r = (304-324)/(352-324) = -20/28 -> round(-714285.714) = -714286
    val mixed = sym(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)))
    val m = graft.operators.Graph.degreeAssortativity(mixed)
      .as[(Long, Long, Long)].collect()
    assert(m.toSeq == Seq((4L, 8L, -714286L)))
    // triangle: all degrees 2 -> zero variance -> no row
    val tri = sym(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(graft.operators.Graph.degreeAssortativity(tri).count() == 0L)
  }
}
