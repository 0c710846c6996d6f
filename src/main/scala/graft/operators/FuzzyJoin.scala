package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join — the entity-resolution operator (vendor
  * names, author strings, product codes: one real-world entity spelled
  * several nearly-identical ways). Spark has `levenshtein` but no way to
  * JOIN on it short of a cartesian product; this gives the scalable
  * candidate-generation + exact-verify shape the rest of the dedup family
  * uses (reference scope: SQLFox merges key on exact equality only,
  * `sp_SimpleMerge.sql:254-268` — fuzzy keying is the pipeline extension).
  *
  * Candidate generation is the DELETION NEIGHBORHOOD (FastSS, Bocek et
  * al. 2007 — public): two strings within edit distance d always share a
  * variant obtainable by deleting ≤ d characters from each (take any
  * optimal alignment; drop substituted/deleted positions from one side
  * and substituted/inserted from the other — at most d drops each side,
  * remainders equal). So an equi-join on the variant has PERFECT recall,
  * and `levenshtein` verification on each candidate makes precision
  * exact: the result is identical to the cartesian filter, never a
  * heuristic (the sf0.01 oracle checks exactly that).
  *
  * Scale shape: one map-side variant expansion (1 + L + L(L-1)/2 variants
  * per string at d=2 — built for SHORT keys: names, titles, codes), one
  * hash shuffle on the variant, per-bucket pair fan-out bounded by
  * `bucketCap` (the dfCap discipline: a variant shared by n strings
  * yields n(n-1)/2 candidates — generic hubs like a bare first name
  * would otherwise explode; capped buckets are skipped during candidate
  * generation only, and [[editDistancePairsDiag]] reports what the cap
  * dropped), then a map-only verify. No cartesian product at any size.
  */
object FuzzyJoin {

  /** Above-cap hub variants to ship as a broadcast local relation; a hub
    * set beyond this (degenerate key domains where most variants are
    * shared hubs) falls back to a shuffle anti-join instead of an
    * unbounded driver broadcast. ~100k short strings ≈ single-digit MB. */
  val DefaultHubBroadcastLimit = 100000

  /** `idx` minus rows whose `v` is in `hot` (single column `v`). Probes
    * the hub set with a LIMIT-bounded collect: within the limit, the
    * already-computed rows become a broadcast LocalRelation (no second
    * evaluation of the occupancy aggregate on the probe side); above it,
    * a plain shuffle anti-join — correct at any hub cardinality, just not
    * broadcast. The collect is metadata-sized by construction (bounded by
    * the limit, same discipline as PartitionedApply's touched-bucket
    * ids). */
  private def hubSide(hot: DataFrame, limit: Int): DataFrame = {
    val spark = hot.sparkSession
    import spark.implicits._
    val probed = hot.select("v").limit(limit + 1).collect()
    if (probed.length <= limit) broadcast(probed.map(_.getString(0)).toSeq.toDF("v"))
    else hot.select("v")
  }

  /** All strings with one character deleted; empty input has no variants. */
  private def del1(c: Column): Column =
    when(length(c) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))

  /** Distinct deletion variants with at most `maxDist` deletions,
    * including the string itself. */
  private def variants(c: Column, maxDist: Int): Column = {
    val base = concat(array(c), del1(c))
    val all = if (maxDist == 1) base else concat(base, flatten(transform(del1(c), t => del1(t))))
    array_distinct(all)
  }

  /** Pairs of rows whose `strCol` values are within `maxDist` edits
    * (Levenshtein), as `(id_a, id_b, dist)` with `id_a < id_b`.
    * Null ids/strings never pair. Result equals the brute-force
    * `levenshtein(a, b) <= maxDist` filter whenever no bucket crosses
    * `bucketCap` (exact recall of the deletion neighborhood); pairs
    * sharing ONLY above-cap variants are not surfaced — raise the cap or
    * pre-collapse exact duplicates for hub-heavy key domains.
    *
    * @param maxDist 1 or 2 — the useful entity-resolution range; the
    *                variant count grows O(L^maxDist) per string.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, bucketCap: Int = 1000,
      hubBroadcastLimit: Int = DefaultHubBroadcastLimit): DataFrame =
    capped(df, idCol, strCol, maxDist, bucketCap, hubBroadcastLimit)._1

  /** [[editDistancePairs]] plus the cap's shadow: a second frame of
    * `(variant, occ)` buckets the cap skipped — empty means the pair set
    * is provably the exact brute-force answer. */
  def editDistancePairsDiag(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, bucketCap: Int = 1000,
      hubBroadcastLimit: Int = DefaultHubBroadcastLimit): (DataFrame, DataFrame) =
    capped(df, idCol, strCol, maxDist, bucketCap, hubBroadcastLimit)

  /** The delta-ingest form (the same discipline as the incremental
    * near-dup family): pairs between `delta` rows and `corpus` rows only —
    * corpus-internal pairs are assumed already resolved, delta-internal
    * pairs are included (a batch can contain its own near-collisions).
    * Equals [[editDistancePairs]] over corpus ∪ delta restricted to pairs
    * touching the delta (spec-pinned). Work ∝ |delta| variants joined
    * against the variant index; the corpus is never self-joined.
    *
    * Id contract: `idCol` is the ENTITY identity, and rows are never
    * paired with themselves (`id_a =!= id_b`). A delta row that reuses an
    * id already present in the corpus is therefore treated as the same
    * entity and is NOT compared against the corpus version — the
    * equivalence to [[editDistancePairs]] over corpus ∪ delta holds for
    * id-disjoint inputs. To re-key an existing entity's string, drop the
    * corpus row first or ingest under a fresh id.
    */
  def incrementalPairs(
      corpus: DataFrame, delta: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, bucketCap: Int = 1000,
      hubBroadcastLimit: Int = DefaultHubBroadcastLimit): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    def indexOf(df: DataFrame) = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("id").isNotNull && col("s").isNotNull)
      .select(col("id"), col("s"), explode(variants(col("s"), maxDist)).as("v"))
    val dIdx = indexOf(delta)
    val cIdx = indexOf(corpus)
    // Occupancy counts the UNION index — capping must see the combined
    // bucket, or a hub split across the boundary slips the cap.
    val occ = dIdx.select("v").unionByName(cIdx.select("v"))
      .groupBy("v").agg(count(lit(1)).as("occ"))
    val hot = hubSide(occ.where(col("occ") > bucketCap), hubBroadcastLimit)
    val dCool = dIdx.join(hot, Seq("v"), "left_anti")
    val cCool = cIdx.join(hot, Seq("v"), "left_anti")
    val a = dCool.select(col("v"), col("id").as("id_a"), col("s").as("s_a"))
    // Delta×corpus plus delta-internal: the right side is corpus ∪ delta,
    // with the delta-internal half deduped by id_a < id_b.
    val b = cCool.unionByName(dCool)
      .select(col("v"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("v")).where(col("id_a") =!= col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        when(col("id_a") < col("id_b"), col("s_a")).otherwise(col("s_b")).as("s_a"),
        when(col("id_a") < col("id_b"), col("s_b")).otherwise(col("s_a")).as("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  private def capped(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, bucketCap: Int, hubBroadcastLimit: Int): (DataFrame, DataFrame) = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    val base = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("id").isNotNull && col("s").isNotNull)
    val idx = base
      .select(col("id"), col("s"), explode(variants(col("s"), maxDist)).as("v"))
      // One (id, variant) row even when several deletion orders reach the
      // same variant — array_distinct already dedups within a row.
      .select(col("v"), col("id"), col("s"))
    val occ = idx.groupBy("v").agg(count(lit(1)).as("occ"))
    val hot = occ.where(col("occ") > bucketCap)
    val cool = idx.join(hubSide(hot, hubBroadcastLimit), Seq("v"), "left_anti")
    val a = cool.select(col("v"), col("id").as("id_a"), col("s").as("s_a"))
    val b = cool.select(col("v"), col("id").as("id_b"), col("s").as("s_b"))
    val pairs = a.join(b, Seq("v")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
    (pairs, hot)
  }
}
