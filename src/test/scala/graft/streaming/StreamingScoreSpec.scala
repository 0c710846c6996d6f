package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Streaming scoring-gate laws (C183): the gate is a pure projection —
  * routing totality (every row to exactly one verdict), and frozen-
  * model equivalence (the gate's scores are the batch scorer's scores,
  * verbatim — the property the shared t35/st20 oracle rests on).
  */
class StreamingScoreSpec extends GraftSuite {
  import spark.implicits._

  private val feats = Seq(
    (1L, 2.0), (2L, -2.0), (3L, 0.4), (4L, -0.1)).toDF("doc_id", "x1")
  private val w = Seq(0.0, 1.5)

  test("routing totality: accepted + rejected partition the input exactly") {
    val out = StreamingScore.gate(feats, w, Seq("x1"), threshold = 0.5)
    assert(out.count() === 4)
    val byRoute = out.groupBy("routed").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRoute.values.sum === 4L && byRoute.keySet.subsetOf(Set("accepted", "rejected")))
    assert(out.filter(col("accepted") =!= (col("routed") === "accepted")).isEmpty)
  }

  test("frozen-model law: gate scores == batch scorer scores, verbatim") {
    val gate = StreamingScore.gate(feats, w, Seq("x1"), threshold = 0.5)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = graft.pipeline.Classifier.score(feats, w, Seq("x1"), threshold = 0.5)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gate === batch)
  }
}
