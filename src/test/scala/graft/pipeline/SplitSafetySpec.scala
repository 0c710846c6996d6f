package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.SparkTestBase

/** The leakage-safety law of cluster-keyed splitting (C166/p5): a
  * near-dup cluster is ATOMIC across splits by construction — verified
  * against the naive doc-keyed split, which demonstrably straddles the
  * same clusters on the same data.
  */
class SplitSafetySpec extends GraftSuite {

  private val weights = Seq("train" -> 0.9, "test" -> 0.1)

  test("a doc-keyed split straddles a planted pair; the cluster-keyed split cannot") {
    import spark.implicits._
    val ids = (1L to 200L).toDF("doc_id")
    val naive = Sampling.split(ids, "doc_id", weights, seed = 11)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Find a pair the naive split separates — guaranteed to exist at
    // these proportions over 200 ids unless the hash is degenerate.
    val train = naive.collect { case (id, "train") => id }.min
    val test = naive.collect { case (id, "test") => id }.min
    assert(naive(train) !== naive(test))
    // Declare them near-dups: the cluster-keyed split must reunite them.
    val clusters = Seq((train, math.min(train, test)), (test, math.min(train, test)))
      .toDF("doc_id", "cluster_id")
    val safe = Sampling.splitByCluster(ids, "doc_id", clusters, weights, seed = 11)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(safe(train) === safe(test))
  }

  test("singletons (no cluster) split exactly like the naive split — same hash, own id") {
    import spark.implicits._
    val ids = (1L to 100L).toDF("doc_id")
    val clusters = Seq((1L, 1L)).toDF("doc_id", "cluster_id") // only doc 1 clustered
    val naive = Sampling.split(ids, "doc_id", weights, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val safe = Sampling.splitByCluster(ids, "doc_id", clusters, weights, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    for (id <- 2L to 100L) assert(safe(id) === naive(id), s"doc $id")
  }

  test("zero leakage on the corpus: every verified near-dup pair lands in ONE split") {
    val d = spark.read.parquet(s"${SparkTestBase.sf001}/documents.parquet")
      .select("doc_id", "text")
    val aug = d.unionByName(d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" zq zq zq")).as("text")))
    val (straddled, naiveStraddled) =
      Dedup.withJaccardPairs(aug, "doc_id", "text", n = 3, dfCap = 100, threshold = 0.5) { pairs =>
        val p = pairs.select("doc_a", "doc_b").localCheckpoint()
        val safe = Sampling.splitByCluster(
          aug.select("doc_id"), "doc_id", Dedup.clusters(p), weights, seed = 11)
        val naive = Sampling.split(aug.select("doc_id"), "doc_id", weights, seed = 11)
        def straddles(assigned: org.apache.spark.sql.DataFrame): Long =
          p.join(assigned.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
            .join(assigned.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
            .filter(col("sa") =!= col("sb")).count()
        (straddles(safe), straddles(naive))
      }
    assert(straddled === 0L)
    // The law is non-vacuous: the naive split DOES leak on this corpus.
    assert(naiveStraddled > 0L, "fixture no longer exercises the straddle case")
  }

  test("both splits populated and cluster members share one cluster_id in the output") {
    import spark.implicits._
    val ids = (1L to 300L).toDF("doc_id")
    val clusters = Seq((10L, 10L), (20L, 10L), (30L, 10L)).toDF("doc_id", "cluster_id")
    val out = Sampling.splitByCluster(ids, "doc_id", clusters, weights, seed = 3)
    assert(out.filter(col("split") === "train").count() > 0)
    assert(out.filter(col("split") === "test").count() > 0)
    assert(out.filter(col("doc_id").isin(10L, 20L, 30L))
      .select("cluster_id").distinct().count() === 1)
  }
}
