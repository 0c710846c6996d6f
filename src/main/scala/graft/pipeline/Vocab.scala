package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction + token-id encoding — the
  * tokenizer-adjacent step a pretraining pipeline runs between curation
  * and batching: fix a top-V vocabulary over the corpus, then map every
  * token stream to dense integer ids with out-of-vocabulary tokens
  * folded into a bounded set of hash buckets (the feature-hashing
  * standard for the tail the vocab cannot hold).
  *
  * Determinism is the contract: ranks break ties by (count DESC, token
  * ASC), OOV buckets use the portable hash — the same build on any run,
  * engine, or cluster size yields byte-identical ids, which is what
  * makes encoded corpora cacheable and diffable.
  */
object Vocab {

  /** Build the top-`vocabSize` vocabulary of the corpus's whitespace
    * tokens: (token_id, token, n), ids 0..V−1 dense in rank order.
    *
    * Scale shape: one map-side-combined token count (the t1 aggregation
    * shape — the shuffle carries distinct tokens, not the token
    * stream), then TakeOrdered V — the driver holds V rows, never the
    * tail. The final rank window runs on the V-row frame (bounded by
    * the vocab budget, not the corpus), so its single-partition sort is
    * metadata-scale by construction.
    */
  def build(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(vocabSize)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(desc("n"), asc("token"))) - 1).cast("long"))
      .select("token_id", "token", "n")
  }

  /** Encode every document's token stream against a [[build]] vocabulary:
    * (idCol, pos, token_id) — pos is the 0-based token position, in-vocab
    * tokens take their vocab id, OOV tokens take
    * `vocabSize + portableHash(token) mod oovBuckets` (ids stay dense in
    * [0, vocabSize + oovBuckets)). Exploded-row output rather than an
    * array column: order-stable, engine-comparable, and the shape the
    * packing tier (C41) already consumes.
    *
    * Scale shape: posexplode is map-only; the vocab attaches as a
    * BROADCAST join (V rows by construction — never a shuffle of the
    * token stream against the vocabulary); the OOV fallback is a
    * codegen'd hash — no second pass.
    */
  def encode(
      docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      vocabSize: Int, oovBuckets: Int, seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(oovBuckets >= 1, s"oovBuckets must be >= 1, got $oovBuckets")
    docs.select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .withColumn("token_id", coalesce(col("token_id"),
        lit(vocabSize.toLong) + pmod(hashMode.hash(col("token"), seed), lit(oovBuckets.toLong))))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("token_id"))
  }
}
