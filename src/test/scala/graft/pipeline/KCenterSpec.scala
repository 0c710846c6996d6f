package graft.pipeline

import graft.GraftSuite

/** Greedy k-center laws (C179): hand-checked farthest-point geometry,
  * monotone coverage radius, duplicate starvation, early exhaustion,
  * and determinism.
  */
class KCenterSpec extends GraftSuite {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private val square = emb(
    1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), // 2 duplicates the seed
    3L -> Seq(0f, 1f),                    // orthogonal: cosine dist 1
    4L -> Seq(0.7f, 0.7f))                // the diagonal: dist ≈ 0.292893

  test("hand-checked geometry: seed = min id, then farthest-first") {
    val out = Similarity.kCenters(square, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // Seed 1; farthest is the orthogonal 3 (dist 1.0); then the diagonal
    // 4 (dist 1 − cos45° rounded); the duplicate 2 (dist 0) comes last.
    assert(out.map(_._2) === Seq(1L, 3L, 4L, 2L))
    assert(out.map(_._3).take(2) === Seq(0.0, 1.0))
    assert(out(2)._3 === 0.292893 && out(3)._3 === 0.0)
  }

  test("coverage radius is monotone non-increasing after the seed") {
    val d = emb((1L to 20L).map(i =>
      i -> Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)): _*)
    val dists = Similarity.kCenters(d, "vec_id", "embedding", k = 8)
      .collect().map(_.getDouble(2)).drop(1)
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b })
  }

  test("k beyond the corpus stops at corpus size") {
    val out = Similarity.kCenters(square, "vec_id", "embedding", k = 10).collect()
    assert(out.length === 4)
  }

  test("deterministic across runs") {
    val a = Similarity.kCenters(square, "vec_id", "embedding", k = 3).collect().toSeq
    val b = Similarity.kCenters(square, "vec_id", "embedding", k = 3).collect().toSeq
    assert(a.toString === b.toString)
  }
}
