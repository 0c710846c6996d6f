package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two tiers:
  *
  *   - [[cosineTopK]] — brute-force cosine top-k: the exact baseline.
  *     Linear scan per probe; right when the probe set is small (it is
  *     broadcast) or as the verification oracle for the approximate tier.
  *   - [[ivfTopK]] — IVF-style: vectors are bucketed to their nearest
  *     centroid once, probes search only their own bucket. At 100 TB the
  *     scan per probe drops from |corpus| to |corpus|/nCentroids; bucket
  *     assignment is a broadcast join (centroid set is tiny by
  *     construction) followed by one shuffle on the bucket id.
  *
  * All arithmetic is higher-order-function expression trees
  * (`zip_with` + `aggregate`) over `array<double>` — codegen'd, no UDFs.
  * Dot products fold left-to-right, matching DuckDB's `list_dot_product`
  * for oracle parity; similarity is rounded to 6 decimals before ranking
  * so cross-engine float noise (~1e-15) cannot flip the top-k order.
  */
object Similarity {

  /** Sequential-fold dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity, rounded to 6 decimals. */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k for each probe vector.
    *
    * @param vectors corpus (idCol, vecCol: array<float>)
    * @param probes  probe rows from the same schema; must be small — it is
    *                broadcast to every corpus partition (no shuffle of the
    *                corpus side).
    * @return (probe_id, neighbor_id, sim, rnk) — k rows per probe, ranked
    *         by rounded similarity desc, neighbor id asc as tiebreak.
    */
  def cosineTopK(vectors: DataFrame, probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = vectors.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__v"))
    val probe = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("__p"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus
      .join(broadcast(probe), col("neighbor_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("__p"), col("__v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "sim", "rnk")
  }

  /** Assign every vector to its nearest centroid (max cosine, centroid id
    * as deterministic tiebreak). Centroids must be a small frame — they are
    * broadcast.
    */
  def assignBuckets(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vecs = vectors.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("__v"))
    val cents = centroids.select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("__c"))
    val w = Window.partitionBy("vid").orderBy(col("csim").desc, col("centroid_id"))
    vecs
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("__v"), col("__c")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("vid"), col("centroid_id").as("bucket"), col("__v"))
  }

  /** IVF-bucketed cosine top-k: probes only scan the corpus partition that
    * shares their centroid bucket. Approximate (a true neighbor in another
    * bucket is missed) — the classic IVF recall/probe-cost trade.
    *
    * @param centroids the coarse quantizer; at real scale these come from a
    *                  sampled k-means — here any deterministic small vector
    *                  set works (the operator is agnostic).
    */
  def ivfTopK(
      vectors: DataFrame,
      centroids: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val bucketed = assignBuckets(vectors, centroids, idCol, vecCol)
    val probeIds = probes.select(col(idCol).as("probe_id"))
    val probeBuckets = bucketed.join(broadcast(probeIds), col("vid") === col("probe_id"))
      .select(col("probe_id"), col("bucket"), col("__v").as("__p"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vid"))
    // Bucket-equi-join: each probe meets only its bucket's vectors.
    bucketed
      .join(broadcast(probeBuckets), Seq("bucket"))
      .filter(col("vid") =!= col("probe_id"))
      .withColumn("sim", cosine(col("__p"), col("__v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vid").as("neighbor_id"), col("sim"), col("rnk"))
  }
}
