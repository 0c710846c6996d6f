package graft.pipeline

/** The engine's reserved special-token convention, shared by BOTH
  * tokenizer families ([[Bpe.pieceVocab]], [[Unigram.pieceVocab]]) and
  * by the packing tier ([[Packing.withEos]]): ids `0..BandSize−1` are
  * control tokens — UNK, BOS, EOS, PAD in that fixed order (the
  * SentencePiece/LLaMA id layout) — and REAL pieces start at
  * `BandSize`. One band, stated once, so an EOS id can never collide
  * with a piece id and a stream encoded by one family packs/decodes
  * under the same control-id semantics as the other.
  *
  * Collision safety is enforced, not assumed: both `pieceVocab`s REJECT
  * a model whose learned pieces spell a reserved label (a crawled
  * corpus can legitimately contain the literal text "&lt;unk&gt;" — at
  * word grain that becomes a candidate piece), and `withEos` rejects an
  * `eosId` inside the piece-id range. A silent collision corrupts every
  * downstream training stream (EOS indistinguishable from a real
  * piece); these guards make it a loud train-time error instead.
  *
  * Reference framing: the tokenizer.json/sentencepiece discipline —
  * special ids are model METADATA fixed at train time, not a caller
  * convention: both trainers take `reserved` as a TRAIN parameter and
  * record it on the model, and every id surface (pieceVocab,
  * encodeIds, decode) resolves the band FROM the model, so an encode
  * under one band can never meet a decode under another. Defaults per
  * family: BPE defaults to no band (`Nil` — every id is a piece, the
  * pre-C203 layout); the unigram family ALWAYS needs at least the unk
  * slot (OOV pieces take its id), so its minimum band is
  * `Seq(Unk)` and `Nil` is rejected there. [[Packing.withEos]]/
  * [[Packing.padPacks]] take the layout as explicit
  * (`vocabSize`, `reservedBand`) numbers because they see only id
  * streams, never models.
  */
object SpecialTokens {
  val Unk = "<unk>"
  val Bos = "<s>"
  val Eos = "</s>"
  val Pad = "<pad>"

  /** The full reserved band, in id order. */
  val Band: Seq[String] = Seq(Unk, Bos, Eos, Pad)

  val UnkId = 0L
  val BosId = 1L
  val EosId = 2L
  val PadId = 3L

  val BandSize: Long = Band.length.toLong

  /** Guard shared by both families' `pieceVocab`: reserved labels must
    * be distinct and must not collide with any learned piece — fail
    * loud at vocabulary-build time, never silently downstream.
    */
  private[pipeline] def requireNoCollision(
      reserved: Seq[String], pieces: Iterable[String]): Unit = {
    require(reserved.distinct == reserved,
      s"reserved special tokens must be distinct, got $reserved")
    val clash = pieces.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"reserved special tokens collide with learned pieces: $clash — " +
        "a control id indistinguishable from a real piece corrupts every " +
        "downstream training stream; rename the reserved labels or scrub " +
        "the colliding surface from the corpus first.")
  }
}
