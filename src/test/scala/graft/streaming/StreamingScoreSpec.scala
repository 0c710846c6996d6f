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

  private val kfeats = Seq(
    (1L, 2.0, -1.0), (2L, -2.0, 2.0), (3L, 0.0, 0.0)).toDF("doc_id", "x1", "x2")
  private val kw = Seq(Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0), Seq(0.0, -1.0, -1.0))
  private val labels = Seq("a", "b", "c")

  test("multiclass router: every row routes to exactly one class label") {
    val out = StreamingScore.routeGate(kfeats, kw, Seq("x1", "x2"), labels)
    assert(out.count() === 3)
    val routed = out.select("doc_id", "routed").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 leans class a (x1 weight), doc 2 class b, doc 3 ties all at
    // p=1/3 → lowest class index → 'a'.
    assert(routed === Map(1L -> "a", 2L -> "b", 3L -> "a"))
  }

  test("multiclass router: frozen-matrix law — routed == batch scoreSoftmax argmax label") {
    val viaGate = StreamingScore.routeGate(kfeats, kw, Seq("x1", "x2"), labels)
      .select("doc_id", "routed").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaBatch = graft.pipeline.Classifier.scoreSoftmax(kfeats, kw, Seq("x1", "x2"))
      .select(col("doc_id"), element_at(
        array(labels.map(lit): _*), (col("pred_class") + 1).cast("int")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaGate === viaBatch)
  }

  test("multiclass router: label arity is validated") {
    intercept[IllegalArgumentException] {
      StreamingScore.routeGate(kfeats, kw, Seq("x1", "x2"), Seq("a", "b"))
    }
  }
}
