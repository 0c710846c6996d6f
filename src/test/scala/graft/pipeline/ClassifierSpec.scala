package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Trained-quality-classifier laws (C174): hand-checked gradient
  * arithmetic, separation on separable data, threshold inclusivity,
  * weight-arity validation, and run-to-run determinism.
  */
class ClassifierSpec extends GraftSuite {

  private def frame(rows: (Double, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("x1", "y")
  }

  test("trainLogistic: one hand-checked GD step from zero init") {
    // w0 = [0,0] → s = σ(0) = 0.5 for every row.
    // rows (x=1,y=1), (x=0,y=0): grad_b = ((0.5−1) + (0.5−0))/2 = 0,
    // grad_w = ((−0.5)·1 + 0.5·0)/2 = −0.25 → lr=1 ⇒ w = [0, 0.25].
    val w = Classifier.trainLogistic(frame((1.0, 1.0), (0.0, 0.0)),
      Seq("x1"), "y", iters = 1, lr = 1.0)
    assert(w === Seq(0.0, 0.25))
  }

  test("trainLogistic: separable data separates — positive weight, correct gate") {
    val d = frame((2.0, 1.0), (2.0, 1.0), (1.5, 1.0), (-2.0, 0.0), (-2.0, 0.0), (-1.5, 0.0))
    val w = Classifier.trainLogistic(d, Seq("x1"), "y", iters = 10, lr = 1.0)
    assert(w(1) > 0.0)
    val scored = Classifier.score(d, w, Seq("x1"), threshold = 0.5)
      .select("y", "accepted").collect()
    assert(scored.forall(r => r.getBoolean(1) === (r.getDouble(0) == 1.0)))
  }

  test("score: threshold is inclusive; zero weights score exactly 0.5") {
    val out = Classifier.score(frame((3.0, 1.0)), Seq(0.0, 0.0), Seq("x1"), threshold = 0.5)
      .select("score", "accepted").head()
    assert(out.getDouble(0) === 0.5 && out.getBoolean(1))
  }

  test("score: weight arity is validated") {
    intercept[IllegalArgumentException] {
      Classifier.score(frame((1.0, 1.0)), Seq(0.0), Seq("x1"), threshold = 0.5)
    }
  }

  test("prCurve: hand-checked cumulative counts, last row reaches full recall") {
    import spark.implicits._
    // scores desc: .9(y=1), .8(y=0), .6(y=1), .2(y=0)
    val scored = Seq((0.9, 1.0), (0.8, 0.0), (0.6, 1.0), (0.2, 0.0)).toDF("score", "y")
    val rows = Classifier.prCurve(scored, "score", "y")
      .orderBy(org.apache.spark.sql.functions.desc("thr"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows(0) === ((0.9, 1L, 0L, 1L, 1.0, 0.5, BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows(1) === ((0.8, 1L, 1L, 1L, 0.5, 0.5, 0.5)))
    assert(rows(2)._5 === BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble && rows(2)._6 === 1.0)
    assert(rows.last._6 === 1.0 && rows.last._3 + rows.last._2 === 4L)
  }

  test("prCurve: zero positive labels yields recall/f1 = 0.0, never NULL") {
    import spark.implicits._
    val scored = Seq((0.9, 0.0), (0.2, 0.0)).toDF("score", "y")
    val rows = Classifier.prCurve(scored, "score", "y")
      .orderBy(org.apache.spark.sql.functions.desc("thr")).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(!r.isNullAt(5) && r.getDouble(5) === 0.0, "recall must be 0.0")
      assert(!r.isNullAt(6) && r.getDouble(6) === 0.0, "f1 must be 0.0")
    }
  }

  test("trainLogistic: deterministic across runs (6dp re-round per iteration)") {
    val d = frame((2.0, 1.0), (0.3, 0.0), (1.1, 1.0), (-0.4, 0.0), (0.9, 1.0))
    val a = Classifier.trainLogistic(d, Seq("x1"), "y", iters = 5, lr = 0.7)
    val b = Classifier.trainLogistic(d, Seq("x1"), "y", iters = 5, lr = 0.7)
    assert(a === b)
  }

  private def kframe(rows: (Double, Double, Int)*) = {
    import spark.implicits._
    rows.toSeq.toDF("x1", "x2", "y")
  }

  test("trainSoftmax: one hand-checked GD step from zero init (K=2)") {
    // w0 = 0 → z_k = 0 → p_k = round(1/2, 6) = 0.5 for both classes.
    // rows (x=1, y=0), (x=0, y=1):
    //   g0_bias = ((0.5−1) + (0.5−0))/2 = 0        → w0_bias = 0
    //   g0_x    = ((0.5−1)·1 + (0.5−0)·0)/2 = −0.25 → w0_x = 0.25
    //   g1_bias = ((0.5−0) + (0.5−1))/2 = 0        → w1_bias = 0
    //   g1_x    = ((0.5−0)·1 + (0.5−1)·0)/2 = 0.25  → w1_x = −0.25
    val d = kframe((1.0, 0.0, 0), (0.0, 0.0, 1))
    val w = Classifier.trainSoftmax(d, Seq("x1", "x2"), "y",
      numClasses = 2, iters = 1, lr = 1.0)
    assert(w === Seq(Seq(0.0, 0.25, 0.0), Seq(0.0, -0.25, 0.0)))
  }

  test("trainSoftmax + scoreSoftmax: separable 3-class data classifies diagonally") {
    val d = kframe(
      (1.0, 0.0, 0), (0.9, 0.1, 0), (1.1, -0.1, 0),
      (0.0, 1.0, 1), (0.1, 0.9, 1), (-0.1, 1.1, 1),
      (-1.0, -1.0, 2), (-0.9, -1.1, 2), (-1.1, -0.9, 2))
    val w = Classifier.trainSoftmax(d, Seq("x1", "x2"), "y",
      numClasses = 3, iters = 20, lr = 2.0)
    val pred = Classifier.scoreSoftmax(d, w, Seq("x1", "x2"))
      .select("y", "pred_class").collect()
    pred.foreach(r => assert(r.getInt(0).toLong === r.getLong(1), r.toString))
  }

  test("scoreSoftmax: argmax ties break to the LOWEST class index; probs sum ≈ 1") {
    val d = kframe((0.7, -0.2, 0))
    // Zero weights → every class scores round(1/3, 6) → tie → class 0.
    val zero = Seq.fill(3)(Seq(0.0, 0.0, 0.0))
    val r = Classifier.scoreSoftmax(d, zero, Seq("x1", "x2")).head()
    assert(r.getAs[Long]("pred_class") === 0L)
    val ps = Seq("p0", "p1", "p2").map(r.getAs[Double])
    assert(ps.forall(_ === 0.333333) && r.getAs[Double]("pred_prob") === 0.333333)
  }

  test("trainSoftmax/scoreSoftmax: validation") {
    val d = kframe((1.0, 0.0, 0), (0.0, 1.0, 1))
    intercept[IllegalArgumentException] {
      Classifier.trainSoftmax(d, Seq("x1"), "y", numClasses = 1, iters = 1, lr = 1.0)
    }
    intercept[IllegalArgumentException] {
      Classifier.scoreSoftmax(d, Seq(Seq(0.0)), Seq("x1", "x2"))
    }
  }

  test("trainSoftmax: deterministic across runs") {
    val d = kframe(
      (2.0, 0.3, 0), (0.3, 1.8, 1), (1.1, 0.2, 0), (-0.4, -0.6, 2), (0.9, 1.4, 1))
    val a = Classifier.trainSoftmax(d, Seq("x1", "x2"), "y", 3, iters = 6, lr = 1.0)
    val b = Classifier.trainSoftmax(d, Seq("x1", "x2"), "y", 3, iters = 6, lr = 1.0)
    assert(a === b)
  }
}
