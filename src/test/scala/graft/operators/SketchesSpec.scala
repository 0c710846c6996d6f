package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftSuite, SparkTestBase}

/** HLL distinct-count sketches: exact in the sparse regime at both
  * fixture SFs, mergeable across slices in any regrouping, and
  * persistable as plain binary parquet.
  */
class SketchesSpec extends GraftSuite {
  import spark.implicits._

  private def events(dir: String) =
    spark.read.parquet(s"$dir/events.parquet").withColumn("day", to_date(col("ts")))

  test("sketch union estimate == exact distinct at both fixture SFs (sparse-mode regime)") {
    for (dir <- Seq(SparkTestBase.sf0001, SparkTestBase.sf001)) {
      val ev = events(dir)
      val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
        .as[(String, Long)].collect().toMap
      val est = Sketches.unionEstimate(
        Sketches.distinctSketches(ev, Seq("event_type", "day"), "user_id"),
        Seq("event_type"))
        .as[(String, Long)].collect().toMap
      assert(est === exact, dir)
    }
  }

  test("sketches regroup freely: day slices collapse to the whole-corpus answer; persisted round-trip") {
    val ev = events(SparkTestBase.sf001).withColumn("grp", lit("all"))
    val daily = Sketches.distinctSketches(ev, Seq("grp", "day"), "user_id")
    // More slices than days would fit one scan: union across ALL slices
    // equals the single-sketch answer over the raw rows.
    val direct = Sketches.unionEstimate(
      Sketches.distinctSketches(ev, Seq("grp"), "user_id"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    val merged = Sketches.unionEstimate(daily, Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
    // The increment persists as plain parquet binary and unions after a
    // round-trip — history itself is never needed again.
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    daily.write.parquet(s"$dir/sketches")
    val reread = Sketches.unionEstimate(
      spark.read.parquet(s"$dir/sketches"), Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(reread === direct)
  }

  test("at-rest store: backfill + partition-scoped appends answer exactly; re-ingest replaces, untouched buckets stay physically untouched") {
    val ev = events(SparkTestBase.sf0001)
    val store = s"${java.nio.file.Files.createTempDirectory("hllstore")}/sk"
    def slices(pred: org.apache.spark.sql.Column) =
      Sketches.distinctSketches(ev.filter(pred), Seq("event_type", "day"), "user_id")
    val days = ev.select("day").distinct().orderBy("day").collect().map(_.getDate(0))
    assert(days.length >= 3, "fixture needs ≥3 days")
    val (backfill, tail) = days.splitAt(days.length - 2)
    Sketches.writeSketchStore(
      slices(col("day") <= lit(backfill.last)), store, Seq("event_type", "day"))
    for (d <- tail) Sketches.appendSlices(spark, store, slices(col("day") === lit(d)))

    // The persisted few-KB rows answer the whole corpus exactly.
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(Sketches.storedEstimate(spark, store, Seq("event_type"))
      .as[(String, Long)].collect().toMap === exact)

    // Re-ingesting an already-stored day: its rows REPLACE (no
    // double-count, no row growth), and buckets its keys don't hash to
    // are physically untouched files.
    def fileState() = {
      val root = new java.io.File(store)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val spec = graft.merge.PartitionedTarget.readSpec(spark, store)
    val redo = slices(col("day") === lit(backfill.last))
    val touched = redo
      .select(spec.bucket(Seq(col("event_type"), col("day"))).as("b"))
      .distinct().as[Int].collect().toSet
    val before = fileState()
    val rowsBefore = graft.merge.PartitionedTarget.read(spark, store).count()
    Sketches.appendSlices(spark, store, redo)
    val after = fileState()
    assert(graft.merge.PartitionedTarget.read(spark, store).count() === rowsBefore)
    assert(Sketches.storedEstimate(spark, store, Seq("event_type"))
      .as[(String, Long)].collect().toMap === exact)
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"__graft_bucket=$b/")) }
    assert(untouchedBefore.nonEmpty, "fixture should leave some bucket untouched")
    for ((p, st) <- untouchedBefore)
      assert(after.get(p).contains(st), s"untouched bucket file changed: $p")

    // Slices regroup from the store without the slice key: per-day rows
    // collapse to per-type — already asserted — and to daily totals.
    val perDay = Sketches.storedEstimate(spark, store, Seq("day"))
      .as[(java.sql.Date, Long)].collect().toMap
    val exactDay = ev.groupBy("day").agg(count_distinct(col("user_id")).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(perDay === exactDay)
  }

  // ---- Theta sketches (C138): set algebra HLL cannot do ----

  test("theta overlap matrix == exact pairwise intersections/unions at both fixture SFs") {
    for (dir <- Seq(SparkTestBase.sf0001, SparkTestBase.sf001)) {
      val ev = events(dir)
      val du = ev.select("event_type", "user_id").distinct()
        .as[(String, Long)].collect().groupBy(_._1)
        .map { case (t, rows) => t -> rows.map(_._2).toSet }
      val types = du.keys.toSeq.sorted
      val exact = (for {
        a <- types; b <- types if a < b
      } yield (a, b) -> (
        du(a).size.toLong, du(b).size.toLong,
        (du(a) & du(b)).size.toLong, (du(a) | du(b)).size.toLong)).toMap
      val got = Sketches.thetaOverlapMatrix(
          Sketches.thetaSketches(ev, Seq("event_type"), "user_id"), "event_type")
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
      assert(got === exact, dir)
    }
  }

  test("theta novelty: |snapshot \\ archive| exact; past the exact regime the estimate stays within the sampling error bound") {
    val ev = events(SparkTestBase.sf001)
    // Archive = first half of users; per-type novelty vs it is exact in
    // the exact regime.
    val cut = ev.agg(expr("percentile_approx(user_id, 0.5, 100000)")).first().getLong(0)
    val archive = ev.filter(col("user_id") <= cut)
      .agg(theta_sketch_agg(col("user_id"), lit(14)).as("sketch"))
    val got = Sketches.thetaNovelty(
        Sketches.thetaSketches(ev, Seq("event_type"), "user_id"), archive)
      .select("event_type", "n_novel").as[(String, Long)].collect().toMap
    val arch = ev.filter(col("user_id") <= cut).select("user_id")
      .as[Long].collect().toSet
    val exact = ev.select("event_type", "user_id").distinct()
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(_._2).toSet.diff(arch).size.toLong }
    assert(got === exact)

    // Sampling contract: lgK=4 (16 nominal entries) forces estimation
    // mode on ~750 distinct users/type; the estimate must land within
    // 4 relative standard errors (1/√k) of the truth — the documented
    // trade, not a precision claim.
    val small = Sketches.unionEstimateTheta(
      Sketches.thetaSketches(ev, Seq("event_type"), "user_id", lgK = 4),
      Seq("event_type"))
    val exactN = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    for ((t, est) <- small.as[(String, Long)].collect()) {
      val n = exactN(t).toDouble
      assert(math.abs(est - n) / n <= 4.0 / math.sqrt(16.0),
        s"$t: est $est vs exact $n beyond 4 RSE")
    }
  }

  test("theta sketch rows persist through the at-rest store machinery unchanged (binary column + slice keys)") {
    val ev = events(SparkTestBase.sf0001)
    val store = s"${java.nio.file.Files.createTempDirectory("theta")}/sk"
    val daily = Sketches.thetaSketches(ev, Seq("event_type", "day"), "user_id")
    val days = ev.select("day").distinct().orderBy("day").collect().map(_.getDate(0))
    Sketches.writeSketchStore(
      daily.filter(col("day") < lit(days.last)), store, Seq("event_type", "day"))
    Sketches.appendSlices(spark, store, daily.filter(col("day") === lit(days.last)))
    val live = Sketches.thetaOverlapMatrix(
        Sketches.unionThetaSlices(daily, Seq("event_type")), "event_type")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val stored = Sketches.thetaOverlapMatrix(
        Sketches.unionThetaSlices(
          graft.merge.PartitionedTarget.read(spark, store), Seq("event_type")),
        "event_type")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(stored === live)
  }

  // ---- KLL quantile sketches (C139): mergeable distributions ----

  test("kll inclusive-rule semantics pinned on a hand-computed frame (ties included)") {
    val df = Seq(1L, 1L, 1L, 9L).toDF("v").withColumn("g", lit("a"))
    val q = Sketches.mergedQuantiles(
        Sketches.quantileSketches(df, Seq("g"), "v"), Seq("g"),
        Seq(0.5, 0.75, 0.95))
      .select("n", "p50", "p75", "p95").as[(Long, Long, Long, Long)].first()
    // cume_dist(1)=0.75 ⇒ p50=p75=1 (smallest value reaching the rank);
    // p95 needs 0.95 ⇒ 9.
    assert(q === ((4L, 1L, 1L, 9L)))
  }

  test("kll merged quantiles == exact inclusive quantiles at both fixture SFs; slice merge == direct sketch") {
    for (dir <- Seq(SparkTestBase.sf0001, SparkTestBase.sf001)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val ranks = Seq(0.25, 0.5, 0.75, 0.95)
      val got = Sketches.mergedQuantiles(
          Sketches.quantileSketches(docs, Seq("lang", "source"), "n_chars"),
          Seq("lang"), ranks)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      val perLang = docs.select("lang", "n_chars").as[(String, Long)].collect()
        .groupBy(_._1).map { case (l, rows) =>
          val vs = rows.map(_._2).sorted
          def q(r: Double) = vs(math.ceil(r * vs.length).toInt - 1)
          l -> ((vs.length.toLong, q(0.25), q(0.5), q(0.75), q(0.95)))
        }
      assert(got === perLang, dir)
      // Merging per-(lang, source) slices loses nothing vs sketching
      // the lang directly (k ≥ n: both lossless).
      val direct = Sketches.mergedQuantiles(
          Sketches.quantileSketches(docs, Seq("lang"), "n_chars"),
          Seq("lang"), ranks)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      assert(got === direct, dir)
    }
  }

  test("distribution drift: hand-computed KS, zero self-drift, disjoint supports saturate, symmetric") {
    import graft.operators.Sketches
    def sk(vals: Seq[Long]) = Sketches.quantileSketches(
      vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
    def ks(a: Seq[Long], b: Seq[Long]) =
      Sketches.distributionDrift(sk(a), sk(b), Seq("g"))
        .select("n_a", "n_b", "ks_num").as[(Long, Long, Long)].first()
    // F_a vs F_b over the union of values: max |c_a·n_b − c_b·n_a| = 8
    // (KS = 8/16 = 0.5), computed by hand.
    assert(ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)) === ((4L, 4L, 8L)))
    // Identical samples: zero drift.
    assert(ks(Seq(5L, 7L, 7L, 9L), Seq(5L, 7L, 7L, 9L))._3 === 0L)
    // Disjoint supports: KS = 1, the numerator saturates at n_a·n_b.
    assert(ks(Seq(1L, 2L), Seq(100L, 200L, 300L)) === ((2L, 3L, 6L)))
    // Symmetry: |F_a − F_b| is direction-free.
    val fwd = ks(Seq(1L, 5L, 9L), Seq(2L, 2L, 8L))
    val rev = ks(Seq(2L, 2L, 8L), Seq(1L, 5L, 9L))
    assert(fwd._3 === rev._3)
  }

  test("distribution drift on the real corpus equals the direct two-sample KS (exact regime)") {
    import graft.operators.Sketches
    val docs = spark.read.parquet(s"${SparkTestBase.sf001}/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val got = Sketches.distributionDrift(
        Sketches.quantileSketches(a, Seq("lang"), "n_chars"),
        Sketches.quantileSketches(b, Seq("lang"), "n_chars"), Seq("lang"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val av = a.select("lang", "n_chars").as[(String, Long)].collect().groupBy(_._1)
    val bv = b.select("lang", "n_chars").as[(String, Long)].collect().groupBy(_._1)
    val exact = (av.keySet & bv.keySet).map { l =>
      val xs = av(l).map(_._2).sorted; val ys = bv(l).map(_._2).sorted
      val grid = (xs ++ ys).distinct
      val num = grid.map { v =>
        math.abs(xs.count(_ <= v).toLong * ys.length - ys.count(_ <= v).toLong * xs.length)
      }.max
      l -> ((xs.length.toLong, ys.length.toLong, num))
    }.toMap
    assert(got === exact)
  }

  test("kll error contract past the exact regime: k=200 on a compacting sketch keeps ranks within the documented epsilon") {
    val docs = spark.read.parquet(s"${SparkTestBase.sf001}/documents.parquet")
      .withColumn("g", lit("all"))
    val est = Sketches.mergedQuantiles(
        Sketches.quantileSketches(docs, Seq("g"), "n_chars", k = 200),
        Seq("g"), Seq(0.5), k = 200)
      .select("p50").as[Long].first()
    val vs = docs.select("n_chars").as[Long].collect().sorted
    // True (inclusive) rank of the estimated median must sit within
    // ±3.2% of 0.5 — double DataSketches' published ~1.7% single-sided
    // rank error at k=200, a contract check not a precision claim.
    val rank = vs.count(_ <= est).toDouble / vs.length
    assert(math.abs(rank - 0.5) <= 0.032, s"rank of p50 estimate drifted: $rank")
  }

  test("quantile bins: hand-computed edges and tie placement, brute-force parity on the corpus, near-equal populations") {
    // Values 1..8: quartile edges (inclusive rule) are 2, 4, 6.
    // Ties land in the LOWER bin: v=2 -> bin 0, v=4 -> bin 1, v=6 -> bin 2.
    val tiny = (1L to 8L).toDF("v")
    val got = Sketches.quantileBins(tiny, "v", nBins = 4)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3))
    // Corpus parity: sketch edges (exact regime) == brute-force edges,
    // so bins == the replayed comparison chain; populations near-equal.
    val d = spark.read.parquet(s"${SparkTestBase.sf001}/documents.parquet")
    val vs = d.select("n_chars").as[Long].collect().sorted
    def edge(r: Double) = vs(math.ceil(r * vs.length).toInt - 1)
    val edges = Seq(edge(0.25), edge(0.5), edge(0.75))
    val binned = Sketches.quantileBins(d, "n_chars", nBins = 4)
      .select("doc_id", "n_chars", "bin")
      .as[(Long, Long, Int)].collect()
    for ((_, v, b) <- binned)
      assert(b === edges.count(v > _), s"v=$v")
    val counts = binned.groupBy(_._3).view.mapValues(_.size)
    assert(counts.keySet === Set(0, 1, 2, 3))
    // Equal-population up to tie mass at the edges.
    for ((_, c) <- counts)
      assert(math.abs(c - vs.length / 4.0) <= vs.length * 0.05, counts.toMap)
  }

  test("MAD outliers: hand-computed flags, planted tails caught, and the mean/stddev gate provably masks") {
    // Hand fixture: values 1..9 plus 100. med = 5 (inclusive over 10
    // values), ads = {4,3,2,1,0,1,2,3,4,95}, mad = 3 (inclusive).
    // Flag iff 0.6745·ad > 3.5·3 = 10.5 -> only the 100.
    val tiny = (Seq.range(1L, 10L) :+ 100L).toDF("v")
    val flags = Sketches.madOutliers(tiny, "v")
      .as[(Long, Boolean)].collect().toMap
    assert(flags(100L) === true)
    assert(flags.filter(_._1 <= 9L).values.forall(_ == false), flags)

    // Corpus with a planted two-class tail: giants (x20) and moderates
    // (x6). The median/MAD gate catches every giant and most moderates;
    // the mean/stddev gate at the same cut self-destructs — the giants
    // inflate sigma until it misses EVERY moderate and even some
    // giants (the masking effect, breakdown point 0 vs 50%).
    val d = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
      .select("doc_id", "n_chars")
    val planted = d
      .unionByName(d.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 600000).as("doc_id"), (col("n_chars") * 20).as("n_chars")))
      .unionByName(d.filter(col("doc_id") % 50 === 25)
        .select((col("doc_id") + 700000).as("doc_id"), (col("n_chars") * 6).as("n_chars")))
    val robust = Sketches.madOutliers(planted, "n_chars")
      .filter(col("is_outlier")).select("doc_id").as[Long].collect().toSet
    val giants = planted.filter(col("doc_id") >= 600000 && col("doc_id") < 700000)
      .select("doc_id").as[Long].collect().toSet
    val moderates = planted.filter(col("doc_id") >= 700000)
      .select("doc_id").as[Long].collect().toSet
    assert(giants.subsetOf(robust), "a giant escaped the MAD gate")
    assert((moderates & robust).size >= moderates.size / 2, "moderates under-caught")
    assert((robust -- giants -- moderates).isEmpty, "false positives on the base corpus")
    // The naive gate at the same 3.5 cut:
    val st = planted.agg(avg("n_chars"), stddev_pop("n_chars")).first()
    val (mu, sd) = (st.getDouble(0), st.getDouble(1))
    val naive = planted
      .filter(abs(col("n_chars") - lit(mu)) > lit(3.5) * lit(sd))
      .select("doc_id").as[Long].collect().toSet
    assert((naive & moderates).isEmpty, "sigma was not inflated enough to demonstrate masking")
    assert((giants -- naive).nonEmpty, "naive gate unexpectedly caught every giant")
  }

  // ---------------------------------------------------------------
  // Frequency tier: Misra–Gries heavy hitters + count-min sketches.
  // ---------------------------------------------------------------

  private def bruteHitters(dir: String, phi: Double): Map[Long, Long] = {
    val ev = events(dir).filter(col("user_id").isNotNull)
    val n = ev.count()
    ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n) * lit(phi))
      .as[(Long, Long)].collect().toMap
  }

  test("heavyHitters == brute-force HAVING at both fixture SFs and several phi") {
    for (dir <- Seq(SparkTestBase.sf0001, SparkTestBase.sf001);
         phi <- Seq(0.002, 0.005, 0.008, 0.02)) {
      val got = Sketches.heavyHitters(events(dir), "user_id", phi)
        .as[(Long, Long)].collect().toMap
      assert(got === bruteHitters(dir, phi), s"$dir phi=$phi")
    }
  }

  test("MG candidate set is a superset of the true heavy hitters; totals match") {
    val dir = SparkTestBase.sf001
    for (phi <- Seq(0.002, 0.008)) {
      val (cands, total) = Sketches.mgSummary(events(dir), "user_id", phi)
      val exactN = events(dir).filter(col("user_id").isNotNull).count()
      assert(total === exactN)
      val hh = bruteHitters(dir, phi).keySet
      val candSet = cands.map(_.asInstanceOf[Long]).toSet
      assert(hh.subsetOf(candSet),
        s"phi=$phi lost hitters: ${hh -- candSet}")
    }
  }

  test("CMS slice merge is linear: per-day sketches fold to the byte-identical single-pass sketch") {
    val ev = events(SparkTestBase.sf001).withColumn("g", lit("all"))
    val single = Sketches.freqSketches(ev, Seq("g"), "user_id")
      .select("sketch").as[Array[Byte]].first()
    val daily = Sketches.freqSketches(ev, Seq("day"), "user_id")
    val merged = Sketches.mergeFreqSketches(daily)
    assert(java.util.Arrays.equals(merged, single))
  }

  test("CMS estimates are one-sided: est >= exact for every key, and exact for most in the wide regime") {
    val ev = events(SparkTestBase.sf0001)
    val exact = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val merged = Sketches.mergeFreqSketches(
      Sketches.freqSketches(ev, Seq("day"), "user_id"))
    val probes = ev.select("user_id").distinct()
    val est = Sketches.probeCounts(probes, "user_id", merged)
      .as[(Long, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((k, e) <- est) assert(e >= exact(k), s"CMS underestimated key $k")
    // width 2/eps = 20000 vs ~15 distinct keys: everything is exact here
    assert(est === exact)
  }

  test("probeCounts (distributed) == driver-side estimateCount") {
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = events(SparkTestBase.sf001)
    val merged = Sketches.mergeFreqSketches(
      Sketches.freqSketches(ev, Seq("day"), "user_id"))
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(merged))
    val got = Sketches.probeCounts(ev.select("user_id").distinct(), "user_id", merged)
      .as[(Long, Long)].collect().toMap
    for ((k, v) <- got)
      assert(v === cms.estimateCount(java.lang.Long.valueOf(k)))
  }

  test("per-group heavy hitters == per-group brute force; thresholds apply per group's own total") {
    val ev = events(SparkTestBase.sf001)
    for (phi <- Seq(0.008, 0.01)) {
      val got = Sketches.heavyHittersByGroup(ev, Seq("event_type"), "user_id", phi)
        .as[(String, Long, Long)].collect().toSet
      val n = ev.filter(col("user_id").isNotNull)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val brute = ev.filter(col("user_id").isNotNull)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
        .join(n, "event_type")
        .filter(col("cnt") > col("n") * lit(phi))
        .select("event_type", "user_id", "cnt")
        .as[(String, Long, Long)].collect().toSet
      assert(got === brute, s"phi=$phi")
    }
    // A value can be a hitter in one group and not another: per-group
    // totals, not the corpus total, set each threshold.
    val skew = (Seq.fill(30)(("a", 1L)) ++ (1L to 70L).map(("a", _)) ++
      Seq(("b", 1L)) ++ (1L to 99L).map(i => ("b", 100L + i)))
      .toDF("grp", "v")
    val hh = Sketches.heavyHittersByGroup(skew, Seq("grp"), "v", 0.2)
      .as[(String, Long, Long)].collect().toSet
    assert(hh === Set(("a", 1L, 31L))) // 31/101 > .2 in a; 1/100 < .2 in b
  }

  test("storedHeavyHitters through a persisted CMS store == brute force; idempotent re-ingest") {
    val ev = events(SparkTestBase.sf001)
    val store = s"${java.nio.file.Files.createTempDirectory("cms").toString}/freq"
    def slices(p: org.apache.spark.sql.Column) =
      Sketches.freqSketches(ev.filter(p), Seq("day"), "user_id")
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getDate(0))
    val (backfill, tail) = days.splitAt(days.length - 2)
    Sketches.writeSketchStore(
      slices(col("day") <= lit(backfill.last)), store, Seq("day"))
    for (d <- tail)
      Sketches.appendSlices(spark, store, slices(col("day") === lit(d)))
    // re-ingest one day: its sketch row is REPLACED, not double-counted
    Sketches.appendSlices(
      spark, store, slices(col("day") === lit(backfill.last)))
    val got = Sketches.storedHeavyHitters(spark, store, ev, "user_id", 0.008)
      .as[(Long, Long)].collect().toMap
    assert(got === bruteHitters(SparkTestBase.sf001, 0.008))
  }
}
