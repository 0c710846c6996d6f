package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget packs — the
  * step that turns a curated corpus into context-window-sized training
  * examples. Exact first-fit packing is inherently sequential; the
  * distributed-standard approximation used here keeps documents ATOMIC and
  * assigns each to pack `floor(tokensBefore / budget)` within its group's
  * deterministic id order:
  *
  *   - pack boundaries fall wherever the running token count crosses a
  *     budget multiple, so a pack overflows by at most one document (the
  *     straddler) and is never fragmented;
  *   - one window sort per group partition — the same shuffle shape as
  *     every per-key operator here, no sequential driver loop, scales to
  *     any corpus;
  *   - deterministic: same corpus + group + budget → the same packs on any
  *     cluster, which training-data reproducibility requires.
  */
object Packing {

  /** Assign each document a `pack_id` within its group, plus its
    * `n_tokens` (whitespace tokens — swap the tokenizer for a BPE count
    * upstream by pre-computing a token-count column and using
    * [[packGreedyByCount]]).
    *
    * @param groupCols pack within these partitions (e.g. language) —
    *                  empty packs globally (single partition: fine for
    *                  modest corpora, use groups at scale)
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      groupCols: Seq[String] = Nil): DataFrame =
    packGreedyByCount(
      docs.withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long")),
      idCol, "n_tokens", budget, groupCols)

  /** [[packGreedy]] over a pre-computed token-count column (the real
    * pipeline counts BPE tokens once, upstream).
    */
  def packGreedyByCount(
      docs: DataFrame,
      idCol: String,
      countCol: String,
      budget: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    docs
      .withColumn("__cum", coalesce(
        sum(col(countCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("__cum") / budget).cast("long"))
      .drop("__cum")
  }

  /** Emit the training-ready PACKED ID SEQUENCES — the last join of the
    * tokenizer tier: [[packGreedyByCount]] assigns documents to packs,
    * [[graft.pipeline.Bpe.encodeIds]] emits per-document id streams,
    * and this splices them into one dense position space per pack:
    * (groupCols…, pack_id, pos, idCol, piece_id) with `pos` dense
    * 0..n−1 within every (group, pack) and each document's ids
    * contiguous in its original (word_pos, piece_pos) order — exactly
    * the concatenated sequence a trainer reads, with the doc id riding
    * along as the attention-boundary/provenance marker.
    *
    * Scale shape: one doc-keyed count aggregation, one prefix-sum
    * window over the DOC-level frame (partitioned by pack — rows =
    * docs, not tokens), one row_number window over the id stream
    * partitioned BY DOCUMENT (bounded by document length, never a
    * global sort), and one doc-keyed equi-join attaching offsets to
    * the stream. Nothing is ever ordered globally; packs materialize
    * in parallel.
    *
    * @param ids   (idCol, word_pos, piece_pos, piece_id) — the
    *              [[graft.pipeline.Bpe.encodeIds]] shape
    * @param packs (idCol, pack_id) plus `groupCols` — the
    *              [[packGreedyByCount]] output
    */
  /** Append ONE end-of-document marker to each document's id stream —
    * the EOS separator real training sequences carry between documents
    * (GPT-family packing joins docs with `<|endoftext|>`; the attention
    * mask keys off it). The marker lands at `word_pos = max + 1` so
    * every downstream position ordering places it LAST in its document,
    * and because it is just one more stream row, pack budgeting
    * ([[packGreedyByCount]] over the augmented counts) and splicing
    * ([[packedSequences]]) compose unchanged — the separator is counted
    * against the budget exactly as a trainer counts it.
    *
    * `eosId` must lie OUTSIDE the piece-id range, and that is ENFORCED,
    * not a docstring convention: pass the vocabulary layout
    * (`vocabSize` = total ids including any reserved band,
    * `reservedBand` = ids 0..band−1 reserved for control tokens — the
    * [[SpecialTokens]] layout) and an `eosId` inside the piece range
    * `[reservedBand, vocabSize)` is rejected loud. A silent collision
    * makes EOS indistinguishable from a real piece downstream — the
    * one failure a packed training stream cannot detect after the
    * fact. Legal choices: a reserved control id
    * ([[SpecialTokens.EosId]] with the band) or any id ≥ `vocabSize`
    * (the one-past-the-vocabulary convention when no band is in play).
    *
    * Invariant, stated: exactly one EOS per document PRESENT IN `ids`.
    * A document whose id stream is empty (zero tokens — or dropped
    * upstream) gets no marker here; when the doc frame is the source
    * of truth, use [[withEosForDocs]], which guarantees one EOS per
    * document of the FRAME, empty streams included. Map-only plus one
    * doc-keyed aggregation for the max position.
    */
  def withEos(
      ids: DataFrame, idCol: String, eosId: Long, vocabSize: Long,
      reservedBand: Long = 0L): DataFrame = {
    requireEosOutsideVocab(eosId, vocabSize, reservedBand)
    ids.unionByName(eosRows(ids, idCol, eosId))
  }

  /** [[withEos]] with the one-EOS-per-DOCUMENT invariant anchored to
    * the doc frame rather than the id stream: every document of `docs`
    * gets exactly one marker, including documents whose id stream is
    * EMPTY (zero tokens, or dropped by an upstream inner join) — those
    * get their EOS at `word_pos = 0`, so an empty document still
    * terminates visibly in the packed sequence instead of silently
    * contributing nothing. Same collision guard as [[withEos]].
    */
  def withEosForDocs(
      ids: DataFrame, docs: DataFrame, idCol: String, eosId: Long,
      vocabSize: Long, reservedBand: Long = 0L): DataFrame = {
    requireEosOutsideVocab(eosId, vocabSize, reservedBand)
    val eos = docs.select(col(idCol)).distinct()
      .join(ids.groupBy(col(idCol))
        .agg((max(col("word_pos")) + 1).as("word_pos")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("word_pos"), lit(0L)).as("word_pos"),
        lit(0L).as("piece_pos"), lit(eosId).as("piece_id"))
    ids.unionByName(eos)
  }

  private def eosRows(ids: DataFrame, idCol: String, eosId: Long): DataFrame =
    ids
      .groupBy(col(idCol))
      .agg((max(col("word_pos")) + 1).as("word_pos"))
      .withColumn("piece_pos", lit(0L))
      .withColumn("piece_id", lit(eosId))
      .select(col(idCol), col("word_pos"), col("piece_pos"), col("piece_id"))

  /** Prepend ONE beginning-of-document marker to each document's id
    * stream — [[withEos]]'s opening twin, the LLaMA-style `&lt;s&gt;`
    * convention (sequences open with BOS so the model conditions on a
    * document start, exactly as they close with EOS). The marker lands
    * at `word_pos = -1` (every real id sits at ≥ 0), so every
    * downstream position ordering places it FIRST in its document —
    * no aggregation is even needed, the position is a constant: one
    * map-only distinct over the stream's ids. Because it is one more
    * stream row, pack budgeting and splicing compose unchanged — the
    * marker is counted against the budget exactly as a trainer counts
    * it. Same collision guard as [[withEos]]: `bosId` must lie outside
    * the piece-id range ([[SpecialTokens.BosId]] with the band, or any
    * id ≥ `vocabSize`).
    *
    * Invariant: exactly one BOS per document PRESENT IN `ids`; when
    * the doc frame is the source of truth use [[withBosForDocs]] —
    * empty documents still OPEN visibly (a BOS/EOS pair) instead of
    * silently contributing nothing.
    */
  def withBos(
      ids: DataFrame, idCol: String, bosId: Long, vocabSize: Long,
      reservedBand: Long = 0L): DataFrame = {
    requireControlOutsideVocab("bosId", bosId, vocabSize, reservedBand)
    ids.unionByName(bosRows(ids.select(col(idCol)).distinct(), idCol, bosId))
  }

  /** [[withBos]] anchored to the doc frame — every document of `docs`
    * opens with exactly one marker, empty id streams included (their
    * packed sequence is then the visible BOS/EOS pair when composed
    * with [[withEosForDocs]]).
    */
  def withBosForDocs(
      ids: DataFrame, docs: DataFrame, idCol: String, bosId: Long,
      vocabSize: Long, reservedBand: Long = 0L): DataFrame = {
    requireControlOutsideVocab("bosId", bosId, vocabSize, reservedBand)
    ids.unionByName(bosRows(docs.select(col(idCol)).distinct(), idCol, bosId))
  }

  private def bosRows(docIds: DataFrame, idCol: String, bosId: Long): DataFrame =
    docIds.select(col(idCol), lit(-1L).as("word_pos"),
      lit(0L).as("piece_pos"), lit(bosId).as("piece_id"))

  /** Pad each pack's spliced sequence ([[packedSequences]] output) up
    * to `budget` positions with the PAD control id — the fixed-shape
    * batch emission a trainer's tensor layout needs (rectangular
    * batches; attention masks key off the pad id). Pad rows carry a
    * NULL document id (they belong to no document — the provenance
    * column stays honest) and positions `len..budget−1`, so every
    * padded pack reads back dense 0..budget−1.
    *
    * Overflow contract, stated: [[packGreedyByCount]] lets a pack
    * overflow by at most ONE straddler document (atomicity wins over
    * the budget), and an overflowing pack is left UNPADDED rather than
    * truncated — dropping tokens silently is the one thing a packing
    * stage must never do; a trainer that needs hard rectangularity
    * re-windows or truncates under its own policy. `padId` is
    * validated against the vocabulary layout exactly like
    * [[withEos]]'s eosId — a pad indistinguishable from a real piece
    * corrupts every batch.
    *
    * Scale shape: one (group, pack)-keyed aggregation over the spliced
    * frame + a map-only `sequence` explode of the deficits; nothing
    * reshuffles the sequence rows.
    */
  def padPacks(
      seqs: DataFrame, idCol: String, budget: Int, padId: Long,
      vocabSize: Long, reservedBand: Long = 0L,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    require(reservedBand >= 0 && reservedBand <= vocabSize,
      s"reservedBand must lie in [0, vocabSize=$vocabSize], got $reservedBand")
    require(padId >= 0 && (padId < reservedBand || padId >= vocabSize),
      s"padId $padId collides with the piece-id range [$reservedBand, " +
        s"$vocabSize): a pad indistinguishable from a real piece corrupts " +
        "every fixed-shape batch. Use a reserved control id " +
        "(SpecialTokens.PadId with the reserved band) or an id >= vocabSize.")
    val idType = seqs.schema(idCol).dataType
    val keys = groupCols :+ "pack_id"
    val pads = seqs.groupBy(keys.map(col): _*)
      .agg(max(col("pos")).as("__mx"))
      // The filter is load-bearing: Spark's sequence(a, b) DESCENDS
      // when a > b (step defaults to −1), so full/overflowing packs
      // must never reach the explode.
      .filter(col("__mx") < budget - 1)
      .select(keys.map(col) ++ Seq(
        explode(sequence(col("__mx") + 1, lit(budget.toLong - 1))).as("pos"),
        lit(null).cast(idType).as(idCol),
        lit(padId).as("piece_id")): _*)
    seqs.unionByName(pads)
  }

  private def requireEosOutsideVocab(
      eosId: Long, vocabSize: Long, reservedBand: Long): Unit =
    requireControlOutsideVocab("eosId", eosId, vocabSize, reservedBand)

  private def requireControlOutsideVocab(
      label: String, id: Long, vocabSize: Long, reservedBand: Long): Unit = {
    require(reservedBand >= 0 && reservedBand <= vocabSize,
      s"reservedBand must lie in [0, vocabSize=$vocabSize], got $reservedBand")
    require(id >= 0 && (id < reservedBand || id >= vocabSize),
      s"$label $id collides with the piece-id range [$reservedBand, " +
        s"$vocabSize): a control marker indistinguishable from a real piece " +
        "silently corrupts every packed training stream. Use a reserved " +
        "control id (SpecialTokens with the reserved band) or an id >= " +
        "vocabSize.")
  }

  def packedSequences(
      ids: DataFrame,
      packs: DataFrame,
      idCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val counts = ids.groupBy(idCol).agg(count(lit(1)).as("__n"))
    val wPack = Window
      .partitionBy((groupCols :+ "pack_id").map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = packs
      .select((idCol +: "pack_id" +: groupCols).map(col): _*)
      .join(counts, Seq(idCol))
      .withColumn("__off", coalesce(sum(col("__n")).over(wPack), lit(0L)))
      .drop("__n")
    val wDoc = Window.partitionBy(col(idCol))
      .orderBy(col("word_pos"), col("piece_pos"))
    ids.join(offsets, Seq(idCol))
      .select(groupCols.map(col) ++ Seq(
        col("pack_id"),
        (col("__off") + row_number().over(wDoc) - 1).cast("long").as("pos"),
        col(idCol),
        col("piece_id")): _*)
  }

  /** Sliding token-window chunking: split each document into
    * `chunkTokens`-token windows whose starts advance by `stride` tokens
    * (overlap = chunkTokens − stride when stride < chunkTokens) — the
    * context-window prep that turns long documents into model-sized
    * pieces while overlapping enough to avoid cutting facts at hard
    * boundaries. The final window is partial (`n_tokens < chunkTokens`)
    * rather than padded; padding policy belongs to the trainer.
    *
    * Scale shape: map-only — tokenize, `sequence` over window starts,
    * `posexplode` — no shuffle, no window sort; fan-out per document is
    * ceil(n/stride), bounded by document length.
    *
    * @return one row per (document, window): `(id, chunk_idx,
    *         chunk_start, n_tokens, chunk_text)` with `chunk_idx` dense
    *         from 0 and `chunk_start = chunk_idx * stride`.
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("chunk_start"),
        least(lit(chunkTokens), col("__n") - col("chunk_start")).as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Sentence-aligned chunking — [[chunk]]'s boundary-respecting twin:
    * sentences ([[TextOps.sentences]]) pack greedily into `budget`-token
    * chunks and are NEVER split mid-sentence (an embedding or training
    * window that cuts a sentence in half degrades both). Same prefix-sum
    * discipline as [[packGreedyByCount]]: chunk = floor(exclusive running
    * token sum / budget) within the doc, so a sentence straddling a
    * boundary lands in the earlier chunk (chunks can overfill by at most
    * one sentence; an oversized single sentence becomes its own chunk —
    * atomicity wins over the budget, exactly the packing contract).
    *
    * Scale shape: sentence explode (map-only), one per-doc window for the
    * running sum, one (doc, chunk) aggregation reassembling in position
    * order — the tokenBlocks shape at sentence granularity.
    */
  def chunkBySentences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy("__id").orderBy("pos")
    docs
      .select(col(idCol).as("__id"),
        posexplode(graft.pipeline.TextOps.sentences(col(textCol))).as(Seq("pos", "s")))
      .withColumn("nt", graft.pipeline.TextOps.tokenCount(col("s")).cast("long"))
      .withColumn("__cum", coalesce(
        sum(col("nt")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_idx", floor(col("__cum") / budget).cast("long"))
      .groupBy(col("__id").as(idCol), col("chunk_idx"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("s")))), e => e.getField("s")),
          " ").as("chunk_text"),
        sum(col("nt")).as("n_tokens"),
        count(lit(1)).as("n_sentences"))
  }
}
