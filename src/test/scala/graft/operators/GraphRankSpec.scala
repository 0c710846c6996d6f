package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Fixed-iteration PageRank: hand-computed values, the sum-to-1
  * invariant on dangling-free graphs, and the regular-graph fixed
  * point.
  */
class GraphRankSpec extends GraftSuite {
  import spark.implicits._

  private def ranksOf(
      edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Double)].collect().toMap

  test("one iteration on a 3-node chain matches the hand computation") {
    // a -> b -> c, plus c -> a to avoid dangling; outdeg all 1.
    // rank0 = 1/3 each; rank1(v) = 0.05 + 0.85 * rank0(pred) = 0.05 + 0.85/3.
    val got = ranksOf(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 1)
    val expected = 0.15 / 3 + 0.85 / 3
    for (v <- Seq("a", "b", "c"))
      assert(math.abs(got(v) - expected) < 1e-15, v)
  }

  test("asymmetric star: the hub accumulates, leaves stay at the teleport floor plus hub flow") {
    // leaves l1..l3 each -> hub; hub -> l1 only.
    val e = Seq(("l1", "h"), ("l2", "h"), ("l3", "h"), ("h", "l1"))
    // By hand, N=4, d=0.85: r0 = .25 each.
    // r1(h) = .15/4 + .85*(3*.25) = .0375 + .6375 = .675
    // r1(l1) = .0375 + .85*.25 = .25; r1(l2)=r1(l3) = .0375
    val r1 = ranksOf(e, 1)
    assert(math.abs(r1("h") - 0.675) < 1e-12)
    assert(math.abs(r1("l1") - 0.25) < 1e-12)
    assert(math.abs(r1("l2") - 0.0375) < 1e-12)
    assert(math.abs(r1("l3") - 0.0375) < 1e-12)
    // r2(h) = .0375 + .85*(r1(l1)+r1(l2)+r1(l3)) = .0375 + .85*.325
    val r2 = ranksOf(e, 2)
    assert(math.abs(r2("h") - (0.0375 + 0.85 * 0.325)) < 1e-12)
  }

  test("uniform distribution is the fixed point on a regular graph; ranks sum to 1 without dangling nodes") {
    // 4-cycle, symmetric: every node indeg == outdeg == 2.
    val ring = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val sym = ring ++ ring.map(_.swap)
    for (iters <- Seq(1, 4)) {
      val got = ranksOf(sym, iters)
      for ((_, r) <- got) assert(math.abs(r - 0.25) < 1e-12)
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
  }

  test("dangling nodes leak mass by the documented simplified form") {
    // b has no out-edges: its rank is never redistributed.
    val got = ranksOf(Seq(("a", "b")), 2)
    assert(got.values.sum < 1.0 - 1e-6)
    // a receives only teleport; b = teleport + damped flow from a.
    assert(math.abs(got("a") - 0.075) < 1e-12)
    assert(math.abs(got("b") - (0.075 + 0.85 * 0.075)) < 1e-12)
  }

  test("duplicate and weighted input edges dedup before degree counting") {
    val got = ranksOf(
      Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "b")), iters = 3)
    val clean = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 3)
    assert(got === clean)
  }

  test("personalized: teleport pins to seeds, proximity decays with distance, unreachable nodes stay at zero") {
    // Path a -> b -> c -> d plus returns, seed {a}.
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val sym = path ++ path.map(_.swap)
    val got = GraphRank.personalizedPageRank(
        sym.toDF("src", "dst"), "src", "dst", seeds = Seq("a"), iters = 6)
      .as[(String, Double)].collect().toMap
    // The seed holds the most mass and the farthest node the least.
    // (No strict monotonicity along the path: a path graph is
    // bipartite, so finite-k power iteration oscillates mass between
    // the seed's parity class and the other — c, at even distance,
    // legitimately outranks b at odd distance for some k.)
    assert(got.maxBy(_._2)._1 === "a", got)
    assert(got.minBy(_._2)._1 === "d", got)
    // Symmetric graph, teleport total 1 => mass conserved.
    assert(math.abs(got.values.sum - 1.0) < 1e-9, got)
    // A disconnected component never receives mass.
    val twoIslands = sym ++ Seq("x" -> "y", "y" -> "x")
    val iso = GraphRank.personalizedPageRank(
        twoIslands.toDF("src", "dst"), "src", "dst", seeds = Seq("a"), iters = 4)
      .as[(String, Double)].collect().toMap
    assert(iso("x") === 0.0 && iso("y") === 0.0, iso)
    // Hand check, one iteration on a -> b (symmetric), seed {a}:
    // r0 = (1, 0); r1(a) = .15·1 + .85·r0(b)/1 = .15,
    // r1(b) = .15·0 + .85·r0(a)/1 = .85.
    val pair = Seq("a" -> "b", "b" -> "a")
    val r1 = GraphRank.personalizedPageRank(
        pair.toDF("src", "dst"), "src", "dst", seeds = Seq("a"), iters = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r1("a") - 0.15) < 1e-12 && math.abs(r1("b") - 0.85) < 1e-12, r1)
  }

  test("transaction-graph ranks sum to 1 at sf0.001 (symmetric edges, no dangling mass)") {
    val dir = graft.SparkTestBase.sf0001
    val pair = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val edges = pair.union(pair.select(col("dst"), col("src")))
    val ranks = GraphRank.pageRank(edges, "src", "dst", iters = 3)
    assert(math.abs(ranks.agg(sum("rank")).first().getDouble(0) - 1.0) < 1e-9)
  }

  test("iteration lineage is CUT: the returned frame is a checkpoint leaf, not a per-iteration plan chain") {
    // The r20 optimization: persist()+count() never truncated the
    // LOGICAL plan, so the caller's edge lineage re-embedded per
    // iteration (q41's 3-iteration plan was ~1100 Exchanges). The
    // returned frame must now be a materialized leaf — analysis cost
    // constant in the iteration count, the Dedup.clusters discipline.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    for (ranks <- Seq(
        GraphRank.pageRank(edges, "src", "dst", iters = 3),
        GraphRank.personalizedPageRank(edges, "src", "dst", Seq("a"), iters = 3))) {
      val leaves = ranks.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.size === 1)
      assert(leaves.head.getClass.getSimpleName === "LogicalRDD",
        s"expected a checkpoint leaf, got ${leaves.head.getClass}")
    }
  }
}
