package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the trained-classifier gate that
  * modern curation stacks run AFTER the heuristic signals: fit a small
  * logistic-regression model on weak labels (a heuristic or a curated
  * seed set), score every document, and admit by score. The production
  * instances are fastText-style quality classifiers (the GPT-3 /
  * LLaMA-pipeline "looks like a reference corpus" filter); the engine
  * primitive they all need is a DISTRIBUTED trainer whose model is
  * tiny and whose per-iteration cost is one pass over the corpus.
  *
  * Training is full-batch gradient descent for a FIXED number of
  * iterations: each round computes the exact gradient in one
  * aggregation (d+1 sums — bounded by the feature count, the only
  * driver-side state is the weight vector) and steps the weights. No
  * sampling, no per-partition SGD — the fixed-iteration, exact-agg
  * shape is what makes the model reproducible AND oracle-checkable
  * (the rounds unroll as SQL layers, the e20/e21 discipline).
  *
  * Determinism: features, per-row sigmoids, gradient averages, and
  * weights are all re-rounded to 6dp per round, so distributed
  * sum-order noise (~1e-16) never reaches the model; the same corpus
  * trains to bit-identical weights on any engine or cluster size.
  */
object Classifier {

  /** σ(z) rounded to 6dp — the per-row score primitive; pure codegen'd
    * scalar math, no UDF.
    */
  private def sigmoid(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)

  private def dot(weights: Seq[Double], featureCols: Seq[String]): Column =
    featureCols.zip(weights.tail).map { case (f, w) => col(f) * lit(w) }
      .foldLeft(lit(weights.head): Column)(_ + _)

  /** Train logistic weights (bias +: one per feature) by `iters` rounds
    * of full-batch GD from zero init:
    *   w ← round(w − lr · round(avg((σ(w·x) − y) · x), 6), 6)
    * Feature columns must arrive pre-rounded (6dp) doubles; `labelCol`
    * is 0/1. One aggregation pass per round; the collect is the (d+1)-
    * vector of gradient components — bounded by the schema, never rows.
    *
    * Cross-engine hazard, learned the hard way: pick an `lr` whose
    * product with a 6dp gradient stays at ≤6 decimals (1.0, 2.0, …).
    * A fractional lr like 0.5 parks the unrounded step EXACTLY on the
    * 7th-decimal .5 boundary every round, where engines that round the
    * shortest decimal representation (Spark's HALF_UP BigDecimal) and
    * engines that round the binary double (DuckDB) systematically
    * disagree.
    */
  def trainLogistic(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int, lr: Double): Seq[Double] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var w = Seq.fill(featureCols.size + 1)(0.0)
    for (_ <- 1 to iters) {
      val err = sigmoid(dot(w, featureCols)) - col(labelCol)
      val grads = df.agg(
        round(avg(err), 6).as("g0"),
        featureCols.zipWithIndex.map { case (f, i) =>
          round(avg(err * col(f)), 6).as(s"g${i + 1}")
        }: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        BigDecimal(wi - lr * grads.getDouble(i))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }

  /** Append softmax probability columns `{prefix}0..{prefix}{K−1}`
    * under a K×(d+1) weight matrix (bias first per class), each
    * rounded 6dp. Unstabilized exp — legal because weights stay
    * 6dp-bounded over few fixed iterations (z magnitudes are far from
    * overflow), and the stabilizing max-subtraction would just add
    * another cross-engine surface. Class order is fixed: the
    * denominator folds exp(z_k) left-to-right over k, the same written
    * order as the oracle.
    *
    * Two projections, deliberately: the K logits materialize first and
    * the probs reference them — inlined, each prob duplicates every
    * z-tree via the shared denominator (K² dot products per row), and
    * at K·(d+1) downstream consumers the CODEGEN COMPILE dominates the
    * pass (measured: t44's 8-round trainer went 71 s → ~4 s through
    * this and the trainer-side materialization). CollapseProject keeps
    * the layers apart because the aliases are non-cheap and multiply
    * referenced.
    */
  private def withSoftmaxProbs(
      df: DataFrame, weights: Seq[Seq[Double]], featureCols: Seq[String],
      prefix: String): DataFrame = {
    val zs = weights.map(w => dot(w, featureCols))
    val withZ = df.select(
      col("*") +: zs.zipWithIndex.map { case (z, k) => z.as(s"__z$k") }: _*)
    val zRefs = weights.indices.map(k => col(s"__z$k"))
    val denom = zRefs.map(exp).reduce(_ + _)
    withZ.select(
        col("*") +: zRefs.zipWithIndex.map { case (z, k) =>
          round(exp(z) / denom, 6).as(s"$prefix$k")
        }: _*)
      .drop(weights.indices.map(k => s"__z$k"): _*)
  }

  /** Train a K-class softmax (multinomial logistic) model by `iters`
    * rounds of full-batch GD from zero init — [[trainLogistic]]
    * generalized to the gates that need MORE than accept/reject:
    * domain routing and trained language ID. `labelCol` holds the
    * class INDEX 0..K−1 (map strings to indices with a fixed sorted
    * order). Per round, ONE aggregation computes all K·(d+1) exact
    * gradient components ((p_k − 1{y=k})·x, 6dp-rounded averages) —
    * driver state is the K×(d+1) matrix, never rows. Same determinism
    * contract as the binary trainer: 6dp re-round per step, integer-
    * friendly lr (1.0, 2.0 — see [[trainLogistic]]'s lr hazard note).
    */
  def trainSoftmax(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      numClasses: Int, iters: Int, lr: Double): Seq[Seq[Double]] = {
    require(numClasses >= 2, s"numClasses must be >= 2, got $numClasses")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d1 = featureCols.size + 1
    var w = Seq.fill(numClasses)(Seq.fill(d1)(0.0))
    for (_ <- 1 to iters) {
      // Materialize the K probs in a projection FIRST and aggregate
      // over references: inlining the softmax trees into all K·(d+1)
      // gradient expressions codegens ~K² z-trees per component —
      // compilation, not data, dominated the round (the scoreSoftmax
      // lesson, on the training side).
      val scored = withSoftmaxProbs(df, w, featureCols, "__p")
      val aggs = for {
        k <- 0 until numClasses
        i <- 0 until d1
      } yield {
        val err = col(s"__p$k") - when(col(labelCol) === k, lit(1.0)).otherwise(lit(0.0))
        val g = if (i == 0) err else err * col(featureCols(i - 1))
        round(avg(g), 6).as(s"g${k}_$i")
      }
      val row = scored.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wk, k) =>
        wk.zipWithIndex.map { case (wi, i) =>
          BigDecimal(wi - lr * row.getDouble(k * d1 + i))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    w
  }

  /** Score every row under a trained softmax matrix: adds `p0..p{K−1}`
    * (6dp), `pred_class` (argmax, ties to the LOWEST class index — the
    * scriptMix priority discipline, deterministic on any engine) and
    * `pred_prob`. Map-only: the matrix is a plan literal.
    */
  def scoreSoftmax(
      df: DataFrame, weights: Seq[Seq[Double]],
      featureCols: Seq[String]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_.size == featureCols.size + 1),
      s"need K rows of ${featureCols.size + 1} weights (bias first)")
    // p0..p{K−1} materialize first (see withSoftmaxProbs); the
    // argmax/pred layer references them as plain column refs.
    val withP = withSoftmaxProbs(df, weights, featureCols, "p")
    val pRefs = weights.indices.map(k => col(s"p$k"))
    val mx = greatest(pRefs: _*)
    val pred = pRefs.zipWithIndex.tail
      .foldLeft(when(pRefs.head === mx, lit(0))) { case (acc, (p, k)) =>
        acc.when(p === mx, lit(k))
      }
    withP
      .withColumn("pred_class", pred.cast("long"))
      .withColumn("pred_prob", mx)
  }

  /** Precision–recall curve over a scored frame — the threshold-
    * calibration step between training (C174) and deployment: "admit at
    * score ≥ t" is a business choice, and this is the table it is made
    * from. One row per distinct score, descending (each score is the
    * admission threshold that includes it):
    * (thr, tp, fp, fn, precision, recall, f1).
    *
    * All ratios derive from integer cumulative counts — f1 is
    * 2·tp/(2·tp+fp+fn), never a ratio of rounded ratios — so the only
    * rounding is the final 6dp and the curve replays exactly on any
    * engine. Scale shape: one per-score aggregation (threshold-
    * cardinality-sized, bounded by distinct scores ≤ corpus) + one
    * ordered window over that frame + a 1-row totals broadcast.
    */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = scored.groupBy(col(scoreCol).as("thr"))
      .agg(count(lit(1)).as("__n"), sum(col(labelCol)).cast("long").as("__pos"))
    val totals = scored.agg(sum(col(labelCol)).cast("long").as("__totpos"))
    // Global ordered window, single-partition by construction — legal
    // because its input is the per-DISTINCT-SCORE frame, and a 6dp
    // sigmoid has at most 10^6+1 representable values: the window is
    // bounded by the score REPRESENTATION, not the corpus.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("thr").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perScore
      .withColumn("tp", sum(col("__pos")).over(w))
      .withColumn("__pred", sum(col("__n")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("thr"), col("tp"),
        (col("__pred") - col("tp")).as("fp"),
        (col("__totpos") - col("tp")).as("fn"),
        round(col("tp") / col("__pred").cast("double"), 6).as("precision"),
        // Zero positive labels ⇒ recall is 0/0; define it as 0.0 (no
        // positives to recover) instead of letting the NULL silently
        // poison the calibration table. f1's denominator is
        // 2tp+fp+fn = pred+totpos ≥ 1 (every threshold row admits ≥ 1
        // prediction), so f1 is already total.
        when(col("__totpos") === 0, lit(0.0))
          .otherwise(round(col("tp") / col("__totpos").cast("double"), 6)).as("recall"),
        round(lit(2.0) * col("tp") /
          (lit(2) * col("tp") + (col("__pred") - col("tp")) +
            (col("__totpos") - col("tp"))).cast("double"), 6).as("f1"))
  }

  /** Score every row under trained weights: adds `score` = σ(w·x)
    * (6dp) and `accepted` = score ≥ `threshold`. Map-only — the model
    * is a literal in the plan, broadcast for free inside codegen.
    */
  def score(
      df: DataFrame, weights: Seq[Double], featureCols: Seq[String],
      threshold: Double): DataFrame = {
    require(weights.size == featureCols.size + 1,
      s"need ${featureCols.size + 1} weights (bias first), got ${weights.size}")
    df.withColumn("score", sigmoid(dot(weights, featureCols)))
      .withColumn("accepted", col("score") >= lit(threshold))
  }
}
