package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * curation. Decisions hash the row's ID through [[TextOps.portableHash]]
  * (uniform in [0, 2^60)), so they are:
  *
  *   - reproducible: same id + seed → same verdict on every run, engine,
  *     and cluster size (unlike `df.sample`, which is rng-and-partition
  *     dependent);
  *   - stable under corpus growth: adding documents never flips existing
  *     rows between splits (the property that keeps eval sets clean);
  *   - map-only: a pure filter/projection, no shuffle, pushdown-friendly.
  */
object Sampling {

  private val HashSpace: Double = (1L << 60).toDouble

  /** Threshold in hash space for a [0,1] rate (public so oracle SQL can
    * inline the identical integer constant).
    */
  def thresholdFor(rate: Double): Long = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    (rate * HashSpace).toLong
  }

  /** Keep-decision column: true for ~rate of ids, deterministically. */
  def hashFilter(id: Column, rate: Double, seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): Column =
    hashMode.hash(id.cast("string"), seed) < lit(thresholdFor(rate))

  /** Reproducible sample of ~rate of the rows. */
  def sample(df: DataFrame, idCol: String, rate: Double, seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame =
    df.filter(hashFilter(col(idCol), rate, seed, hashMode))

  /** Per-boundary hash thresholds for a split spec: one upper bound per
    * split EXCEPT the last (which takes the remainder). Cumulative weights
    * are rounded to 12 decimals before conversion so a floating-point
    * running sum (0.8 + 0.1 = 0.9000000000000001) lands on the SAME integer
    * constant as `thresholdFor(0.9)` — callers inlining thresholds into
    * oracle/portable SQL get bit-identical assignment (ADVICE r2 #2).
    */
  def splitThresholds(weights: Seq[(String, Double)]): Seq[Long] = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.forall(_._2 > 0), s"split weights must be positive: $weights")
    val total = weights.map(_._2).sum
    weights.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
      .map(c => thresholdFor(
        BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  /** Assign every row to a named split with the given proportions
    * (normalized). Splits are disjoint and exhaustive: cumulative hash
    * ranges via [[splitThresholds]], last split takes the remainder.
    */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)], seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    val bounds = splitThresholds(weights)
    val h = hashMode.hash(col(idCol).cast("string"), seed)
    val assigned = weights.init.zip(bounds).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), bound)) => acc.when(h < lit(bound), lit(name))
    }.otherwise(lit(weights.last._1))
    df.withColumn("split", assigned)
  }

  /** Leakage-safe split: assign splits by near-dup CLUSTER, not by
    * document — the FIX paired with s4's leakage detector. A naive
    * [[split]] hashes each doc independently, so the two halves of a
    * near-duplicate pair land in train and test ~2·p·(1−p) of the time
    * and the benchmark leaks into training verbatim (what s4 measures).
    * Here every doc inherits its cluster representative
    * ([[Dedup.clusters]]' min-id label; docs in no cluster are their own
    * singleton via the coalesce) and the hash-range assignment runs on
    * the CLUSTER id — a cluster is atomic across splits by construction,
    * not by audit. Proportions now hold over clusters rather than docs;
    * for near-dup-scale cluster sizes (tiny relative to the corpus) the
    * doc-level proportions converge to the weights, and the residual
    * skew is the price of zero leakage.
    *
    * Scale shape: one id-keyed equi-join (AQE-shaped; the cluster frame
    * is pair-vertex-sized, typically ≪ corpus) + the same map-only
    * hash-range assignment as [[split]]. Deterministic across runs,
    * engines, and cluster sizes — same portable hash contract.
    */
  def splitByCluster(
      df: DataFrame, idCol: String, clusters: DataFrame,
      weights: Seq[(String, Double)], seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    val labeled = df.join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    split(labeled, "cluster_id", weights, seed, hashMode)
  }

  /** Corpus rebalancing: keep a DIFFERENT deterministic fraction per
    * stratum — the data-mixing step that up/down-weights sources or
    * languages before training ("keep 100% of code, 30% of web crawl").
    * Strata absent from `rates` keep `defaultRate`. Still map-only and
    * growth-stable per stratum: the keep decision is the same hash filter
    * as [[sample]], just with a per-stratum threshold chosen by a
    * CASE over the stratum column — no join, no shuffle, pushdown intact.
    */
  def rebalance(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      seed: Int,
      defaultRate: Double = 1.0,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(rates.nonEmpty, "at least one stratum rate required")
    val bound = rates.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(strataCol) === lit(stratum), lit(thresholdFor(rate)))
    }.otherwise(lit(thresholdFor(defaultRate)))
    df.filter(hashMode.hash(col(idCol).cast("string"), seed) < bound)
  }

  /** Hard per-stratum frequency cap: keep at most `maxPerStratum` rows of
    * each stratum (domain, source, language…), the data-mixing guard
    * [[rebalance]]'s RATE cannot express — a rate shrinks a dominant
    * stratum proportionally, a cap bounds it absolutely no matter how
    * much one crawl balloons.
    *
    * Selection ranks each stratum by the portable hash of the id (id as
    * final tiebreak), so the kept set is deterministic across runs,
    * engines, and cluster sizes — effectively a uniform random
    * `maxPerStratum`-subset frozen by the seed. Unlike [[sample]], growth
    * is NOT append-stable at the cap: a new row can hash below an
    * existing one and displace it (inherent to any exact cap; use
    * [[rebalance]] when append-stability matters more than the bound).
    *
    * Scale shape: one shuffle on the stratum, rank within partition. A
    * single stratum's rows land in one task (the usual top-N skew); for
    * strata that dwarf a task, pre-thin with [[rebalance]] to ~cap size
    * first — cap-then-rank stays exact on the survivors.
    */
  def capPerStratum(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      maxPerStratum: Int,
      seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(maxPerStratum >= 1, s"maxPerStratum must be >= 1, got $maxPerStratum")
    val rn = "__graft_cap_rn"
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashMode.hash(col(idCol).cast("string"), seed), col(idCol))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= maxPerStratum)
      .drop(rn)
  }

  /** Weighted reservoir sample WITHOUT replacement per stratum
    * (Efraimidis–Spirakis A-Res, "Weighted random sampling with a
    * reservoir", IPL 2006), deterministic and engine-portable: the
    * uniform is frozen from the portable hash of the id
    * (u = (h + 0.5)/2^60 ∈ (0,1)), each row keys at `ln(u)/weight` —
    * the log-space form of the E–S key u^(1/weight), same order
    * without pow underflow — and the top-`k` keys per stratum win.
    * Heavier rows draw stochastically larger keys, so inclusion tracks
    * weight exactly as E–S proves (k=1 selects row i with probability
    * wᵢ/Σw); without-replacement is by construction (a row holds one
    * key). [[capPerStratum]] is the w≡1 special case of this scheme.
    *
    * Keys round to 6 decimals with an id tiebreak so an engine twin
    * reproduces the SELECTION bit-exactly (the [[splitThresholds]]
    * discipline: libm `ln` may differ in the last ulp across engines;
    * rounding collapses the difference and the tiebreak orders equal
    * keys identically).
    *
    * Scale shape: one shuffle on the stratum + rank within partition
    * (the [[capPerStratum]] shape) — no global sort, no corpus-wide
    * collect. Rows with non-positive weight are excluded (zero weight
    * means "never sample", and the E–S key is undefined there).
    *
    * @return surviving rows + `rnk` (1-based within-stratum rank by
    *         descending key — rnk 1 is the strongest draw).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      strataCol: String,
      k: Int,
      seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hashMode.hash(col(idCol).cast("string"), seed).cast("double") + lit(0.5)) /
      lit(HashSpace)
    val key = round(log(u) / col(weightCol).cast("double"), 6)
    val w = Window.partitionBy(col(strataCol)).orderBy(key.desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** EXACT-proportion stratified split: within each stratum, rank rows by
    * the portable hash (id tiebreak — [[capPerStratum]]'s frozen-uniform
    * ordering) and cut at `floor(cumWeight × n)` boundaries, so every
    * stratum lands within one row of its target proportions and the last
    * split takes the remainder. The contrast with [[split]]: hash
    * thresholds are only proportional IN EXPECTATION and stratum-blind (a
    * small language can land 70/30 when the corpus-wide target is 80/10/10
    * — exactly the eval-set skew this exists to prevent), but they are
    * append-stable; exact ranking is not (a new row shifts ranks), so use
    * [[split]] for growing corpora and this for FROZEN snapshot cuts
    * where per-stratum balance matters.
    *
    * Scale shape: one shuffle on the stratum + the rank window and a
    * per-stratum count — the same top-N skew note as [[capPerStratum]]
    * (a stratum's rows rank in one task; pre-thin gigantic strata).
    */
  def stratifiedSplit(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weights: Seq[(String, Double)],
      seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.forall(_._2 > 0), s"split weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val cums = weights.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
      .map(c => BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashMode.hash(col(idCol).cast("string"), seed), col(idCol))
    val rn = "__graft_split_rn"
    val nc = "__graft_split_n"
    val assigned = weights.init.zip(cums).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), c)) => acc.when(col(rn) <= floor(lit(c) * col(nc)), lit(name))
    }.otherwise(lit(weights.last._1))
    df.withColumn(rn, row_number().over(w))
      .withColumn(nc, count(lit(1)).over(Window.partitionBy(col(strataCol))))
      .withColumn("split", assigned)
      .drop(rn, nc)
  }

  /** Deterministic epoch shuffle: assign every row a (shard, ord) pair —
    * `shard` = portable hash mod `numShards`, `ord` = rank within the
    * shard by (hash, id) — so that writing shard-partitioned, ord-sorted
    * files yields a reproducible GLOBAL random visit order for training
    * (read shards in order, rows in ord order). A new `epochSeed` is a
    * fresh independent permutation; the same seed replays the epoch
    * exactly on any run, engine, or cluster size — the property
    * `df.orderBy(rand())` cannot give you, and the reason shuffling
    * belongs in the curation layer instead of the trainer's RAM.
    *
    * Scale shape: NO global sort — one shuffle on the shard id plus a
    * per-shard window sort, each shard a task-sized slice (pick
    * numShards ≈ corpus / target file size; hash sharding makes them
    * uniform). Like [[capPerStratum]]'s ranking, the assignment is not
    * append-stable — an exact permutation cannot be — so shuffle a
    * frozen snapshot, once per epoch.
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      epochSeed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = hashMode.hash(col(idCol).cast("string"), epochSeed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("ord", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Temperature-based mixture resampling: keep a per-stratum fraction
    * that reshapes source proportions from nₛ toward nₛ^α (the multilingual
    * / multi-source mixing rule — α < 1 flattens the mixture so dominant
    * crawls stop drowning small sources; α = 1 keeps everything). The
    * acceptance rate is rₛ = (nₛ / n_min)^(α−1), so the smallest stratum
    * keeps 100% and larger strata are thinned toward the tempered
    * proportions; the keep decision reuses [[sample]]'s hash filter, so it
    * is deterministic and engine-portable.
    *
    * Rates are rounded to 6 decimals before the threshold conversion so a
    * last-ulp `pow` divergence between engines cannot flip a verdict
    * (same trick as [[splitThresholds]]'s 12-decimal rounding).
    *
    * Scale shape: one metadata-sized aggregation (stratum → count, then a
    * 1-row global min) broadcast-joined back onto the corpus; the corpus
    * itself sees a single map-side filter — no corpus shuffle.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      alpha: Double,
      seed: Int,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("__rate",
        round(pow(col("__n").cast("double") / col("__nmin"), alpha - 1.0), 6))
      .select(col(strataCol), (col("__rate") * lit(HashSpace)).cast("long").as("__bound"))
    df.join(broadcast(rates), strataCol)
      .filter(hashMode.hash(col(idCol).cast("string"), seed) < col("__bound"))
      .drop("__bound")
  }

  /** Deterministic weighted interleave of strata — the training-order
    * companion to [[temperatureSample]]: stride scheduling assigns each
    * row `pos = rank / weight` within its stratum (rank = the
    * [[epochShuffle]]-style (hash, id) order), so a trainer reading
    * rows ordered by `(pos, stratum, id)` sees every prefix mixed in
    * proportion to the weights — source A at weight 1.0 appears twice
    * as often as B at 0.5 from the very first batch, not just in
    * aggregate (what a concatenate-then-shuffle cannot promise for
    * small prefixes).
    *
    * No global sort HERE: the operator emits the schedule key; writing
    * ordered output is the sink's layout choice (e.g. range-partition
    * by pos), exactly like [[epochShuffle]]'s (shard, ord) contract.
    * One stratum shuffle + rank window.
    *
    * @param weights per-stratum relative read frequency (> 0); strata
    *                absent from the map use `defaultWeight`. Use exact
    *                binary fractions (1.0, 0.5, 0.25…) when an engine
    *                twin must reproduce positions bit-exactly.
    * @return input columns + (`rnk`: within-stratum rank, `pos`: the
    *         global schedule key, rounded to 6).
    */
  def mixtureSchedule(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weights: Map[String, Double],
      seed: Int,
      defaultWeight: Double = 1.0,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      s"weights must be positive: $weights / $defaultWeight")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashMode.hash(col(idCol).cast("string"), seed), col(idCol))
    val weightExpr = weights.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (stratum, wt)) => acc.when(col(strataCol) === lit(stratum), lit(wt))
    }.otherwise(lit(defaultWeight))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("pos", round(col("rnk") / weightExpr, 6))
  }

  /** Quality-weighted selection under a global token budget: keep the
    * highest-scoring documents until their tokens spend the budget — the
    * data-selection step when compute, not data, is the binding
    * constraint. NOT a global sort: scores in [0, 1] are histogrammed
    * into `bins` fixed buckets (map-side), the bins-sized token totals
    * are cumulated best-bin-first, whole bins above the boundary keep
    * everything, and ONLY the single boundary bin's rows are rank-cut
    * (portable-hash order, id tiebreak) against the budget remainder —
    * so the sort the operator pays is one bin, not the corpus.
    *
    * Granularity trade, stated: every doc in a kept bin is kept even if
    * the bin straddles the budget by < one bin's tokens; `bins` controls
    * that slack (corpus_tokens / bins expected overshoot bound within
    * the boundary bin, zero outside it). Documents are atomic — the
    * boundary prefix keeps a doc only if its INCLUSIVE running token sum
    * fits the remainder.
    *
    * @param scoreCol quality score in [0, 1], higher = better (round it
    *                 to a fixed number of decimals upstream if an engine
    *                 twin must bin identically).
    * @return the kept rows (all input columns).
    */
  def selectUnderBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokenCol: String,
      budget: Long,
      bins: Int = 1000,
      seed: Int = 17,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val binned = df.withColumn("__bin",
      least(lit(bins - 1), floor(col(scoreCol) * bins)).cast("int"))
    val binTok = binned.groupBy("__bin").agg(sum(col(tokenCol)).as("__btok"))
    // bins-sized frame: the single-partition cumsum window is metadata,
    // not corpus (the same license as the k×dim centroid frames).
    val wb = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binPlan = binTok
      .withColumn("__cum", sum(col("__btok")).over(wb))
      .withColumn("__rem", lit(budget) - (col("__cum") - col("__btok")))
      .select(col("__bin"), col("__cum"), col("__rem"))
    val joined = binned.join(broadcast(binPlan), "__bin")
    val outCols = df.columns.toSeq.map(col)
    val fullKeep = joined.filter(col("__cum") <= budget)
    val wd = Window.partitionBy(col("__bin"))
      .orderBy(hashMode.hash(col(idCol).cast("string"), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined
      .filter(col("__cum") > budget && col("__rem") > 0)
      .withColumn("__dcum", sum(col(tokenCol)).over(wd))
      .filter(col("__dcum") <= col("__rem"))
    fullKeep.select(outCols: _*).unionByName(boundary.select(outCols: _*))
  }

  /** UniMax-style budget allocation (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling"): split a total token budget
    * across strata by CAPPED WATER-FILLING — process strata in
    * ascending capacity order (cap = `maxEpochs × n_tokens`, the
    * repeat-ceiling that stops a tiny language from being epoched into
    * memorization); a stratum whose cap fits under the current equal
    * share keeps its whole cap, everyone past the breakpoint splits the
    * remainder equally. The fairness fix over temperature sampling
    * (C54): no head-language ever starves the tail, and no tail
    * language is over-epoched.
    *
    * The entire derivation runs as EXPRESSIONS over the strata-sized
    * aggregate (window ranks on an L-row frame — metadata, not corpus),
    * exactly so an engine twin can replay it: the breakpoint test and
    * allocations are pure integer arithmetic, the final keep-rate is
    * one rounded double division, and the hash threshold uses the same
    * truncating double→int64 conversion as every sampler here.
    *
    * @return (strataCol, n_tokens, cap_tokens, alloc_tokens, rate) —
    *         one row per stratum; rate = min(1, alloc/n_tokens) rounded
    *         to 6 (an over-allocated stratum — alloc beyond one epoch —
    *         keeps everything; actual up-sampling is the trainer's job).
    */
  def unimaxAllocations(
      df: DataFrame, strataCol: String, textCol: String,
      budgetTokens: Long, maxEpochs: Double = 1.0): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    val lt = df.groupBy(col(strataCol))
      .agg(sum(TextOps.tokenCount(col(textCol))).as("n_tokens"))
      .withColumn("cap_tokens",
        floor(col("n_tokens").cast("double") * lit(maxEpochs)).cast("long"))
    val byCap = Window.orderBy(col("cap_tokens"), col(strataCol))
    val whole = Window.partitionBy()
    lt
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__l", count(lit(1)).over(whole))
      .withColumn("__cum", sum(col("cap_tokens")).over(
        byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__full",
        col("cap_tokens") * (col("__l") - col("__i") + 1) +
          (col("__cum") - col("cap_tokens")) <= lit(budgetTokens))
      .withColumn("__k", sum(when(col("__full"), 1L).otherwise(0L)).over(whole))
      .withColumn("__fullcap",
        coalesce(sum(when(col("__full"), col("cap_tokens"))).over(whole), lit(0L)))
      .withColumn("alloc_tokens",
        when(col("__full"), col("cap_tokens"))
          .when(col("__l") > col("__k"),
            least(col("cap_tokens"),
              expr(s"($budgetTokens - __fullcap) div (__l - __k)")))
          .otherwise(lit(0L)))
      .withColumn("rate", round(
        least(lit(1.0), col("alloc_tokens").cast("double") / col("n_tokens").cast("double")), 6))
      .select(col(strataCol), col("n_tokens"), col("cap_tokens"),
        col("alloc_tokens"), col("rate"))
  }

  /** Keep ~`rate` of each stratum's docs per [[unimaxAllocations]] —
    * the same growth-stable hash decision as [[rebalance]], with the
    * rate frame (strata-sized) broadcast back. The doc-level proxy for
    * the token allocation: expected kept-token mass per stratum equals
    * its allocation.
    */
  def unimaxSample(
      df: DataFrame, idCol: String, strataCol: String, textCol: String,
      budgetTokens: Long, maxEpochs: Double = 1.0, seed: Int = 41,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    val bounds = unimaxAllocations(df, strataCol, textCol, budgetTokens, maxEpochs)
      .select(col(strataCol), (col("rate") * lit(HashSpace)).cast("long").as("__bound"))
    df.join(broadcast(bounds), strataCol)
      .filter(hashMode.hash(col(idCol).cast("string"), seed) < col("__bound"))
      .drop("__bound")
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much its hashed-unigram distribution looks like a
    * TARGET corpus rather than the raw corpus itself —
    *
    *   score(d) = (1/|d|) · Σ_tokens ln( p̂_target(b(w)) / p̂_raw(b(w)) )
    *
    * with b(w) a portable-hash bucket in [0, buckets) and both
    * distributions add-k smoothed. The standard cheap proxy for "give me
    * more data like THIS slice" (a trusted domain, a high-quality
    * source): rank by score and feed [[selectUnderBudget]] /
    * [[capPerStratum]] to take the cut.
    *
    * Scale shape: both n-gram histograms partial-aggregate to `buckets`
    * rows (≪ corpus) and broadcast; the scoring pass is one token
    * explode joined to those broadcasts, folded per doc — the t12 NLL
    * shape, one shuffle keyed on the id. Nothing scales with corpus size
    * except the linear scans.
    *
    * Determinism: the per-token ln terms fold position-ordered
    * (left-to-right, both engines), the smoothing denominators are
    * single interpolatable constants, and the final score rounds to 6
    * decimals.
    *
    * @return (id, n_tokens, avg_lir) — avg log importance ratio, one row
    *         per `raw` document; positive = more target-like than the
    *         raw average.
    */
  def dsirScores(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024, seed: Int = 31, addK: Double = 1.0,
      hashMode: HashMode = HashMode.Md5Portable): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(addK > 0, s"addK must be > 0 (smoothing keeps empty buckets finite), got $addK")
    def hist(docs: DataFrame, cnt: String, tot: String): (DataFrame, DataFrame) = {
      val h = docs
        .select(explode(TextOps.tokens(col(textCol))).as("__w"))
        .select(pmod(hashMode.hash(col("__w"), seed), lit(buckets.toLong)).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(cnt))
      (h, h.agg(sum(col(cnt)).as(tot)))
    }
    val (tb, tn) = hist(target, "__ct", "__nt")
    val (rb, rn) = hist(raw, "__cr", "__nr")
    val denom = lit(addK * buckets)
    val tok = raw.select(
      col(idCol).as("__id"), posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__w")))
      .select(col("__id"), col("__pos"),
        pmod(hashMode.hash(col("__w"), seed), lit(buckets.toLong)).as("__b"))
    tok
      .join(broadcast(tb), Seq("__b"), "left")
      .join(broadcast(rb), Seq("__b"))
      .crossJoin(broadcast(tn)).crossJoin(broadcast(rn))
      .withColumn("__lnw", log(
        ((coalesce(col("__ct"), lit(0L)) + lit(addK)) / (col("__nt") + denom)) /
          ((col("__cr") + lit(addK)) / (col("__nr") + denom))))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        collect_list(struct(col("__pos"), col("__lnw"))).as("__s"))
      .withColumn("__sum", aggregate(
        transform(array_sort(col("__s")), e => e.getField("__lnw")),
        lit(0.0), (acc, x) => acc + x))
      .select(col(idCol), col("n_tokens"),
        round(col("__sum") / col("n_tokens"), 6).as("avg_lir"))
  }
}
