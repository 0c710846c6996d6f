package graft.pipeline

import graft.GraftSuite

/** RRF fusion: hand-computed scores, the consensus law, per-probe
  * grouping, and rank-depth damping.
  */
class RetrievalSpec extends GraftSuite {
  import spark.implicits._

  private def ranking(rows: (Long, Int)*) = rows.toDF("doc_id", "rnk")

  test("hand-computed two-source fusion with consensus outranking") {
    // Source A: d1@1, d2@2; source B: d2@1, d3@2.
    // rrf(d2) = 1/61 + 1/62 > rrf(d1) = 1/61 > rrf(d3) = 1/62.
    val fused = Retrieval.rrfFuse(
        Seq(ranking(1L -> 1, 2L -> 2), ranking(2L -> 1, 3L -> 2)),
        "doc_id", "rnk", topK = 10)
      .as[(Long, Double, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def round6(x: Double) = math.round(x * 1e6) / 1e6
    assert(fused(2L) === ((round6(1.0 / 61 + 1.0 / 62), 2L, 1)))
    assert(fused(1L) === ((round6(1.0 / 61), 1L, 2)))
    assert(fused(3L) === ((round6(1.0 / 62), 1L, 3)))
  }

  test("consensus law: an item in every source outranks any single-source item at equal depth; ties break by id") {
    val fused = Retrieval.rrfFuse(
        Seq(ranking(7L -> 3, 9L -> 5), ranking(7L -> 3, 8L -> 5)),
        "doc_id", "rnk", topK = 10)
      .select("doc_id", "rnk").as[(Long, Int)].collect().toMap
    assert(fused(7L) === 1)
    // 8 and 9 both scored 1/65 — id order decides.
    assert(fused(8L) === 2)
    assert(fused(9L) === 3)
  }

  test("per-probe fusion partitions independently and topK caps per probe") {
    def pr(rows: (String, Long, Int)*) = rows.toDF("q", "doc_id", "rnk")
    val fused = Retrieval.rrfFuse(
        Seq(pr(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1)),
          pr(("a", 2L, 1), ("b", 6L, 1))),
        "doc_id", "rnk", topK = 1, probeCols = Seq("q"))
      .select("q", "doc_id").as[(String, Long)].collect().toSet
    assert(fused === Set(("a", 2L), ("b", 5L))) // b: 5 and 6 tie at 1/61, id 5 wins
  }

  test("kRrf damps the head: at large k, rank-1-once loses to rank-2-twice; at k=1 the head dominates") {
    val sources = Seq(ranking(1L -> 1), ranking(2L -> 2), ranking(2L -> 2))
    val atK60 = Retrieval.rrfFuse(sources, "doc_id", "rnk", topK = 1)
      .select("doc_id").as[Long].first()
    assert(atK60 === 2L) // 2/62 > 1/61
    val atK1 = Retrieval.rrfFuse(sources, "doc_id", "rnk", topK = 1, kRrf = 1)
      .select("doc_id").as[Long].first()
    assert(atK1 === 2L) // 2/3 > 1/2 — still consensus
    // but a rank-1 pair beats a lone rank-1 at any k
    val pairWins = Retrieval.rrfFuse(
        Seq(ranking(1L -> 1), ranking(2L -> 1), ranking(2L -> 1)),
        "doc_id", "rnk", topK = 1, kRrf = 1)
      .select("doc_id").as[Long].first()
    assert(pairWins === 2L)
  }
}
