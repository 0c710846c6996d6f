package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: Reciprocal Rank Fusion (Cormack,
  * Clarke & Büttcher, SIGIR 2009) — the standard way production search
  * combines a LEXICAL ranker (BM25, C103) with a SEMANTIC one (the
  * cosine/ANN family, C5/C6/C93) without score calibration: raw BM25
  * scores and cosine similarities live on incomparable scales, but
  * RANKS always compose —
  *
  *   rrf(d) = Σ_sources 1 / (k + rank_source(d)),   k = 60 in the paper
  *
  * k damps the head (rank 1 vs 2 differs by ~1/3700 at k=60) so one
  * ranker's top hit cannot steamroll consensus; items found by several
  * rankers accumulate. In a training-data stack this is targeted-eval
  * construction and contamination triage: "find documents about X"
  * wants the union of keyword hits and embedding neighbors, fused.
  *
  * Scale shape: inputs are ALREADY top-k frames (each ≤ probes × k
  * rows — search output, never corpora), so the fusion is one
  * union + one hash aggregation + one probe-partitioned rank window
  * over a few-hundred-row frame. The heavy lifting stays in the
  * rankers, each already scale-shaped (posting-index BM25, partition-
  * pruned ANN). Determinism: 1/(k+r) is one IEEE divide, per-item sums
  * are order-insensitive at round(6), ties break by item id.
  */
object Retrieval {

  /** Fuse ranked frames. Each input must carry `itemCol` and an
    * integer 1-based `rankCol` (plus `probeCols` when fusing per
    * probe). Output: probeCols ++ (itemCol, rrf_score, n_sources,
    * rnk ≤ topK); `n_sources` counts the rankers that returned the
    * item — the consensus signal callers threshold on.
    */
  def rrfFuse(
      rankings: Seq[DataFrame], itemCol: String, rankCol: String,
      topK: Int, probeCols: Seq[String] = Nil, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val keyCols = probeCols :+ itemCol
    val tagged = rankings
      .map(_.select(keyCols.map(col) :+ col(rankCol).cast("long").as("__r"): _*))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(probeCols.map(col): _*)
      .orderBy(col("rrf_score").desc, col(itemCol))
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(
        round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("__r").cast("double"))), 6)
          .as("rrf_score"),
        count(lit(1)).as("n_sources"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
  }
}
