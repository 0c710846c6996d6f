package graft.queries

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.pipeline.{Classifier, HashMode}

/** The langid feature hash is a deployment dial, not part of the
  * contract (the d6/d7 discipline): Md5Portable exists for the exact
  * DuckDB oracle twin; Xxhash64 is the production mode (~10× cheaper,
  * and the md5 term dominates t44's 10× cell). Features only need to
  * be consistent within one model — pin that the LEARNING story is
  * hash-agnostic: under either mode the seed-trained softmax classifies
  * its seed set perfectly.
  */
class LangidModeSpec extends GraftSuite {

  test("both hash modes train to a perfect seed diagonal") {
    import spark.implicits._
    val seed = PipelineQueries.LangidSeeds.toDF("doc_id", "lang", "text")
    val feats = (0 until PipelineQueries.LangidBuckets).map(b => s"x$b")
    for (mode <- Seq[HashMode](HashMode.Md5Portable, HashMode.Xxhash64)) {
      val f = PipelineQueries.langidFeatures(seed, mode).cache()
      val w = Classifier.trainSoftmax(f, feats, "y",
        numClasses = PipelineQueries.LangidLangs.size, iters = 8, lr = 1.0)
      val pred = Classifier.scoreSoftmax(f, w, feats)
        .select("y", "pred_class").collect()
      assert(pred.length === PipelineQueries.LangidSeeds.size)
      pred.foreach(r => assert(r.getInt(0).toLong === r.getLong(1), s"$mode: $r"))
      f.unpersist()
    }
  }

  test("xxhash64-mode routing is deterministic across runs") {
    import spark.implicits._
    val seed = PipelineQueries.LangidSeeds.toDF("doc_id", "lang", "text")
    val feats = (0 until PipelineQueries.LangidBuckets).map(b => s"x$b")
    def run() = {
      val f = PipelineQueries.langidFeatures(seed, HashMode.Xxhash64)
      val w = Classifier.trainSoftmax(f, feats, "y",
        numClasses = PipelineQueries.LangidLangs.size, iters = 8, lr = 1.0)
      Classifier.scoreSoftmax(f, w, feats)
        .select("doc_id", "pred_class").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(run() === run())
  }
}
