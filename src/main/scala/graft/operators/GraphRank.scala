package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-authority scoring: fixed-iteration PageRank (Page, Brin,
  * Motwani, Winograd 1999) over an edge frame — the quality-prior
  * pattern production curation pipelines run over the crawl's link
  * graph (CCNet/RefinedWeb-style domain reputation: a document's
  * admission score includes how authoritative its domain is in the
  * hyperlink structure, computed once per crawl snapshot).
  *
  * Semantics are the classic simplified iteration, deterministic and
  * replayable cross-engine:
  *
  *   rank⁰(v)   = 1/N
  *   rankᵏ(v)   = (1−d)/N + d · Σ_{(u,v)∈E} rankᵏ⁻¹(u) / outdeg(u)
  *
  * run for a FIXED number of iterations (convergence-threshold loops
  * are not oracle-expressible; k fixed unrolls exactly). Dangling mass
  * is NOT redistributed — callers with dangling nodes get the
  * documented simplified form (rank sums to < 1); on a symmetric edge
  * set there are no dangling nodes and the sum-to-1 invariant holds
  * (spec-pinned).
  *
  * Scale shape: each iteration is ONE shuffle — contributions =
  * edges ⋈ ranks ⋈ outdeg (both rank/deg sides keyed by src, the same
  * partitioning) partial-aggregated by dst — and ranks persist with
  * lineage CUT per iteration (persist + materialize + unpersist of the
  * predecessor), the standard iterative-algorithm discipline: without
  * it the plan doubles per iteration and iteration 20 replays
  * iteration 1. Edge dedup, degree, and the node universe are each a
  * single pass.
  */
object GraphRank {

  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, "damping must lie in (0, 1)")
    // Lineage.cut (checkpoint), not persist+count: persist only cuts
    // PHYSICAL recomputation — the logical plan keeps growing, and with
    // e/nodes/outDeg each re-embedding the caller's edge lineage (often
    // a multi-table join) in every iteration, the analyzed plan reached
    // ~1100 Exchange nodes by iteration 3 (plans/r20/q41_*_before.txt)
    // and driver-side analysis/cache-matching time grew with it — the
    // Bpe.train lesson (guide §3.3: very large plans make planning
    // itself the bottleneck; materialize to truncate). Checkpointing
    // makes every iteration's plan constant-size over leaf inputs; the
    // cut is reliable when the session has a checkpoint dir (the
    // executor-loss trade — see [[graft.Lineage]]). Superseded rank
    // frames release their blocks as each iteration retires its
    // predecessor, and the e/nodes/outDeg leaves release on return —
    // at high iteration counts inside a long-lived session the
    // ContextCleaner frees them only on GC, measurably too late (the
    // d22 leak precedent); storage held at return is exactly one
    // rank-frame of blocks.
    val e = graft.Lineage.cut(edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = graft.Lineage.cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outDeg = graft.Lineage.cut(e.groupBy("src").agg(count(lit(1)).as("__deg")))
    val n = nodes.count() // scalar: the node-universe size
    var ranks = graft.Lineage.cut(nodes.withColumn("rank", lit(1.0 / n)))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      val prev = ranks
      ranks = graft.Lineage.cut(nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("rank")))
      graft.Lineage.free(prev) // eager cut done: predecessor blocks retire
    }
    Seq(e, nodes, outDeg).foreach(graft.Lineage.free)
    ranks
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass
    * concentrated on a SEED set instead of spread uniformly — the
    * seed-expansion primitive curation stacks use to grow a small
    * trusted set ("these 50 domains are known-good") into a ranked
    * neighborhood of the link graph (proximity to the seeds, damped by
    * distance), without any labels beyond the seeds themselves.
    *
    *   rank⁰(v)  = 1/|S| if v ∈ S else 0
    *   rankᵏ(v)  = (1−d)·[v ∈ S]/|S| + d · Σ_{(u,v)∈E} rankᵏ⁻¹(u)/outdeg(u)
    *
    * Same fixed-iteration, lineage-cut, one-shuffle-per-step shape as
    * [[pageRank]]; seeds are a driver-side literal set (a trusted list
    * is human-curated and small by nature). Dangling mass leaks as in
    * the simplified form; seeds absent from the graph contribute
    * teleport only.
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String, seeds: Seq[String],
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, "damping must lie in (0, 1)")
    require(seeds.nonEmpty, "at least one seed node required")
    require(seeds.distinct == seeds, s"duplicate seeds: $seeds")
    // Same lineage-cut + release discipline as [[pageRank]] (see there).
    val e = graft.Lineage.cut(edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = graft.Lineage.cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outDeg = graft.Lineage.cut(e.groupBy("src").agg(count(lit(1)).as("__deg")))
    val nSeeds = seeds.length
    val isSeed = col("node").isin(seeds: _*)
    val teleport = when(isSeed, lit(1.0 / nSeeds)).otherwise(lit(0.0))
    var ranks = graft.Lineage.cut(nodes.withColumn("rank", teleport))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      val prev = ranks
      ranks = graft.Lineage.cut(nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * teleport +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("rank")))
      graft.Lineage.free(prev) // eager cut done: predecessor blocks retire
    }
    Seq(e, nodes, outDeg).foreach(graft.Lineage.free)
    ranks
  }
}
