package graft.queries

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema / analytical queries over the TPC-H-ish tables — the general
  * join/aggregation machinery behind SURVEY.md §2.4 J2-J3, §2.3, §2.6 and
  * docs/dimensional_modeling.md's BI intent, exercised at bench scale.
  *
  * Scale design:
  *  - dims (region, nation, supplier; customer at star scale) join via
  *    `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key with AQE
  *    free to pick sort-merge vs shuffled-hash;
  *  - top-k uses orderBy+limit → Spark plans TakeOrderedAndProject (per-
  *    partition heap + driver merge of k rows, never a full sort);
  *  - filters sit directly on the scans so they push into the parquet reader.
  *
  * Oracle-parity: every SUM over doubles goes through DECIMAL so both engines
  * compute the identical exact value (double addition is order-sensitive;
  * decimal addition is associative). AVG is emitted as decimal-sum / count
  * performed in double on both sides.
  */
object StarQueries {

  // j7's bucketed-layout staging, one per dataset dir per JVM
  private val bucketedStage =
    scala.collection.concurrent.TrieMap.empty[String, String]

  // j8's z-ordered-layout staging, same lifecycle as bucketedStage
  private val zorderStage =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Exact sum: cast each double to DECIMAL(18,6), sum exactly, emit double. */
  /** Exact decimal sum emitted as a 2-dp-rounded double. The sum itself is
    * exact in both engines; the final decimal->double conversion can differ
    * by 1 ulp between Spark (BigDecimal correctly-rounded) and DuckDB
    * (int128/10^scale division), so outputs are rounded to cents. */
  private def dsum(c: Column): Column =
    round(sum(c.cast("decimal(18,6)")).cast("double"), 2)

  private val revenue: Column =
    col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1.0) - col("l_discount")).cast("decimal(18,6)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: full-scan aggregate with exact sums and derived avg
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-06-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(revenue).cast("double"), 2).as("sum_disc_price"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: segment filter, 3-way join, grouped revenue, top-10
    "q3_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-01-01"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        // min(), not first(): priority is functionally dependent on the
        // group key, but min is deterministic by construction
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"),
          min(col("o_orderpriority")).as("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: full star — region/nation/supplier broadcast dims
    "q5_region_revenue" -> ((s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // customer/supplier grow with scale factor — no forced broadcast
      // hint; AQE picks broadcast vs shuffle join from runtime sizes.
      // region/nation are bounded dims, safe to hint.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"))
    }),

    // TPC-H Q10 shape: returned-items revenue per customer over a date
    // window, top-20 — fact-fact shuffle join, bounded nation dim
    // broadcast, customer join left to AQE (grows with scale factor)
    "q10_returned_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01") &&
          col("o_orderdate") < lit("2000-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q6 shape: forecast-revenue — a pure filter-aggregate whose
    // three predicates ALL push into the parquet scan (date range,
    // discount band, quantity cap); the plan is scan → partial agg →
    // single-row exchange, nothing else
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01") &&
          col("l_shipdate") < lit("2000-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum((col("l_extendedprice").cast("decimal(18,6)") *
          col("l_discount").cast("decimal(18,6)"))).cast("double"), 2)
          .as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q2 shape (min-per-group correlated subquery): the cheapest
    // part(s) per brand — window min + equality filter, one shuffle on the
    // group key, no join-back
    "q2_cheapest_parts" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_brand"))
      Tables.part(s, d)
        .withColumn("min_price", min(col("p_retailprice")).over(w))
        .filter(col("p_retailprice") === col("min_price"))
        .select(col("p_brand"), col("p_partkey"), col("p_name"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
    }),

    // TPC-H Q19 shape: disjunctive mixed-side predicates — the OR spans
    // both join sides so it cannot push below the join; the optimizer must
    // still push the shared l_shipdate conjunct to the scan and keep the
    // part dim broadcast
    "q19_disjunctive" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter((col("p_type") === "PROMO" && col("l_quantity") < 10) ||
          (col("p_type") === "STANDARD" && col("l_quantity") >= 40))
        .groupBy(col("p_type"))
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q4 shape: priority counts over orders that had at least one
    // line shipped after the order date — a semi-join whose condition mixes
    // an equi key (shuffle/broadcast-able) with a correlated inequality
    // (applied as a post-join filter, never a nested loop). The date filter
    // sits on the orders scan and pushes into parquet.
    "q4_priority_exists" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01") &&
          col("o_orderdate") < lit("2000-01-01"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))),

    // TPC-H Q12 shape: conditional aggregation over a fact-fact join —
    // per return flag, how many lines belong to high- vs low-priority
    // orders. sum(when) compiles to a partial-aggregated conditional count
    // (map-side combined; the join shuffles once on the order key).
    "q12_priority_by_flag" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01") &&
          col("l_shipdate") < lit("2000-01-01"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))),

    // TPC-H Q14 shape: promo revenue share — conditional DECIMAL sums
    // (exact under any partial-agg order) with ONE double division at the
    // end; part joins via broadcast (bounded dim at any scale factor
    // relative to lineitem).
    "q14_promo_share" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-09-01") &&
          col("l_shipdate") < lit("1999-10-01"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "PROMO", revenue)).cast("double")
            / sum(revenue).cast("double"), 6).as("promo_share"),
          count(lit(1)).as("n_lines"))),

    // J7: the bucketed LAYOUT path under the gate — both facts written as
    // external bucketed+sorted tables on the join key (the one-time ingest
    // cost), then the co-located join (zero exchanges of either fact —
    // plan-proven in BucketingSpec) aggregates revenue per priority. The
    // result must equal the plain shuffled join's, which is what the
    // oracle states.
    "j7_bucketed_join" -> ((s, d) => {
      // layout staging is a one-time ingest cost: cache per dataset dir so
      // repeated gate/bench invocations reuse the SAME path and tables
      // instead of leaking a fresh two-fact copy into /tmp per run.
      // Table names carry a hash of the dataset dir: catalog tables are
      // global per JVM, so a second dataset must get its OWN tables rather
      // than overwrite the first's while its cache entry still points there.
      val suffix = Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d) & 0x7fffffff)
      val (tblO, tblL) = (s"graft_bkt_orders_$suffix", s"graft_bkt_lineitem_$suffix")
      val tmp = bucketedStage.getOrElseUpdate(d, {
        val t = Files.createTempDirectory("graft-j7-").toString
        graft.sources.Bucketed.writeBucketed(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          s"$t/o", tblO, Seq("o_orderkey"), buckets = 16)
        graft.sources.Bucketed.writeBucketed(
          Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
            revenue.as("rev")),
          s"$t/l", tblL, Seq("o_orderkey"), buckets = 16)
        t
      })
      require(tmp.nonEmpty)
      s.table(tblO)
        .join(s.table(tblL), Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Z-order layout end-to-end: lineitem written Morton-clustered on
    // (l_partkey, l_suppkey), read back through a range predicate on BOTH
    // dimensions — the case a single-column layout can't prune (ZOrderSpec
    // measures the per-file span tightening that drives the skipping).
    // Results must equal the same predicate over the raw table.
    "j8_zorder_scan" -> ((s, d) => {
      val zdir = zorderStage.getOrElseUpdate(d, {
        val t = Files.createTempDirectory("graft-j8-").toString
        graft.sources.ZOrder.writeZOrdered(
          Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "l_partkey", "l_suppkey", numFiles = 16, t)
        t
      })
      s.read.parquet(zdir)
        .filter(col("l_partkey") >= 100 && col("l_partkey") < 400 &&
          col("l_suppkey") >= 10 && col("l_suppkey") < 40)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"),
          round(sum(revenue).cast("double"), 2).as("revenue"))
    }),

    // SCD Type-2 merge end-to-end: the customer dim versioned against a
    // deterministic update batch (each customer's latest order restates
    // segment/acctbal). Changed keys close + reopen, absent keys pass
    // through, new keys open fresh — the full branch set under the hash
    // gate; ScdSpec covers the equal-update no-op and NULL-attr semantics.
    "j9_scd2_customers" -> ((s, d) => {
      val cur = Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
        lit("1990-01-01 00:00:00").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val upd = Tables.orders(s, d)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("o_custkey").as("c_custkey"),
          col("o_orderpriority").as("segment"),
          col("o_totalprice").as("acctbal"), col("o_orderdate").as("ts"))
      graft.operators.Scd.merge2(cur, upd, Seq("c_custkey"), Seq("segment", "acctbal"))
        .select(col("c_custkey"), col("segment"), col("acctbal"),
          unix_timestamp(col("valid_from")).as("valid_from_s"),
          unix_timestamp(col("valid_to")).as("valid_to_s"))
    }),

    // rollup: region/nation revenue with subtotal and grand-total rows —
    // Spark expands grouping sets in ONE aggregation pass (no self-union);
    // grouping_id disambiguates real NULLs from rollup NULLs
    "a7_rollup_revenue" -> ((s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"),
          grouping_id().as("gid"))
    }),

    // cube: the full 2^k grouping-set lattice over two independent
    // dimensions (status × priority) — unlike a7's rollup (a prefix
    // hierarchy), cube emits the cross-dimension margins too. One Expand +
    // one aggregation pass; at 100 TB the Expand multiplies rows by the
    // grouping-set count BEFORE the shuffle, so k stays small by design.
    "a7b_cube_status_priority" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"),
          grouping_id().as("gid"))),

    // pivot: order counts per priority spread across status columns —
    // fixed pivot values keep the schema static (the only scale-safe form:
    // an inferred pivot collects the distinct set to the driver)
    "a8_pivot_status" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"), coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_filled"),
          coalesce(col("P"), lit(0L)).as("n_pending"))),

    // O2 top-k: TakeOrderedAndProject, never a full sort
    "o2_top_customers" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("o_custkey"))
        .limit(10)),

    // A5 distinct on low-cardinality combo
    "a5_distinct_status" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()),

    // J2 dim-id lookup: derive a dim from data, broadcast-join ids back.
    // Id assignment happens driver-side on the aggregated distinct set (the
    // reference's S3 "scan dims to drive the plan" pattern) with a hard
    // cardinality guard — never a global single-partition window, which
    // would serialize at scale if the column were high-cardinality.
    "j2_dim_lookup" -> ((s, d) => {
      val maxDim = 10000
      val types = Tables.events(s, d).select(col("event_type")).distinct()
        .orderBy(col("event_type")).limit(maxDim + 1)
        .collect().map(_.getString(0))
      require(types.length <= maxDim, s"dimension cardinality exceeds $maxDim")
      import s.implicits._
      val dim = types.zipWithIndex
        .map { case (t, i) => (t, (i + 1).toLong) }.toSeq
        .toDF("event_type", "type_id")
      Tables.events(s, d)
        .join(broadcast(dim), Seq("event_type"))
        .groupBy(col("type_id"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // left-anti join: customers with no order since 2001
    "j_anti_customers" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2001-01-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // left-semi join: parts that appear in at least one lineitem
    "j_semi_parts" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).select(col("l_partkey")),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))),

    // exact grouped percentiles — the exact counterpart of the L20
    // sketches (Spark's `percentile` = continuous interpolated quantile,
    // same definition as DuckDB quantile_cont; verified bit-parity at 6dp)
    "a6_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med_price"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"),
          count(lit(1)).as("n"))),

    // TPC-H Q18 shape: large-volume orders — group-by-having over the
    // lineitem fact, joined back to the orders fact + customer dim. The
    // HAVING prunes the agg output to a sliver BEFORE the fact-fact join,
    // so AQE sees a tiny build side and broadcasts it; sum(l_quantity) is
    // integral-valued doubles (exact under any partial-agg order). Top-100
    // under a total order (totalprice DESC, date, orderkey) for a
    // deterministic LIMIT.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("odate_s"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("odate_s"), col("o_orderkey"))
        .limit(100)
    }),

    // L20 gate row: the sketch family's documented error bounds, emitted as
    // per-slice booleans the driver hash-checks. Sketch estimates themselves
    // differ across engines (HLL++/KLL internals), so the oracle cannot
    // compare values — but the BOUNDS are engine-independent claims:
    //  - HLL++ at rsd=0.05 within 3σ (15%) of the exact distinct count;
    //  - approx_percentile at accuracy=10000 returns an element whose RANK
    //    is within n/10000 + 1 of the target rank p·n.
    // The oracle asserts all-true per slice; any bound violation flips a
    // boolean and fails the hash. Sketches are deterministic for fixed
    // input, so this is a stable (not flaky) gate.
    "a6b_sketch_bounds" -> ((s, d) => {
      val e = Tables.events(s, d)
      val hll = graft.operators.Sketches.distinctUsersPerType(e, rsd = 0.05)
        .select(col("event_type"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.15).as("hll_ok"))
      val approx = e.groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, array(0.5, 0.95), 10000)").as("aq"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("aq")(0).as("a50"), col("aq")(1).as("a95"), col("n"))
      val ranked = e.join(broadcast(approx), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n"),
          sum(when(col("value") <= col("a50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("a95"), 1L).otherwise(0L)).as("r95"))
        .select(col("event_type"),
          (abs(col("r50") - col("n") * 0.5) <= col("n") / 10000.0 + 1).as("q50_ok"),
          (abs(col("r95") - col("n") * 0.95) <= col("n") / 10000.0 + 1).as("q95_ok"))
      hll.join(ranked, Seq("event_type"))
    }),

    // equi-depth binning WITHOUT a global sort (ntile would serialize the
    // corpus through one task): exact decile boundaries from one
    // aggregation, broadcast as literals into a codegen'd scan pass.
    // Engine parity: percentile == quantile_cont bit-exactly (a6), and
    // both engines then run identical comparisons on identical doubles.
    // Note the boundary pass here is EXACT percentile for oracle parity —
    // its final buffer holds the distinct values of the column (bounded
    // for metric-like data); at open-ended scale swap in
    // approx_percentile boundaries (binning logic unchanged, no oracle).
    "a9_equidepth_bins" -> ((s, d) => {
      val e = Tables.events(s, d)
      val bounds = Option(e.agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"))
        .head().getSeq[Double](0))
        .getOrElse(throw new IllegalStateException("events is empty — no bins"))
      val binExpr = "1 + " + bounds.map(b =>
        s"(CASE WHEN value > $b THEN 1 ELSE 0 END)").mkString(" + ")
      e.withColumn("bin", expr(binExpr))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 6).as("lo"),
          round(max(col("value")), 6).as("hi"))
    }),

    // correlation with ENGINEERED parity: Spark's corr/covar stream float
    // moments in partition order (non-deterministic tails) — instead take
    // exact DECIMAL sums of x, y, xy, x², y² (associative) and evaluate
    // one identical double formula per engine at the end.
    "a10_corr_qty_price" -> ((s, d) => {
      val q = col("l_quantity").cast("decimal(18,6)")
      val p = col("l_extendedprice").cast("decimal(18,6)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(q).cast("double").as("sx"), sum(p).cast("double").as("sy"),
          sum(q * p).cast("double").as("sxy"),
          sum(q * q).cast("double").as("sxx"),
          sum(p * p).cast("double").as("syy"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
              * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qp"),
          col("n").cast("long").as("n_rows"))
    }),

    // J3 dim_time: the reference's calendar dimension
    // (/root/reference/docs/dimensional_modeling.md:37-47 sketches
    // `fact LEFT JOIN dim_time t ON f.time = t.time` — design intent with
    // no shipped DDL). The dim is GENERATED from the fact's own date span
    // (sequence over min..max date, one row per day) entirely inside the
    // plan — no driver collect — and is bounded by construction (a century
    // of days is 36k rows), so the fact join is always a broadcast: zero
    // shuffle of the fact side at any scale factor.
    "j3_dim_time" -> ((s, d) => {
      val span = Tables.orders(s, d)
        .agg(to_date(min(col("o_orderdate"))).as("lo"),
          to_date(max(col("o_orderdate"))).as("hi"))
      val dimTime = span
        .select(explode(sequence(col("lo"), col("hi"))).as("d_date"))
        .select(col("d_date"),
          year(col("d_date")).cast("long").as("d_year"),
          quarter(col("d_date")).cast("long").as("d_quarter"),
          // ISO day-of-week (Mon=1..Sun=7): weekday() is Mon=0
          (weekday(col("d_date")) + 1).cast("long").as("d_isodow"))
        .withColumn("is_weekend", col("d_isodow") >= 6)
      Tables.orders(s, d)
        .withColumn("d_date", to_date(col("o_orderdate")))
        .join(broadcast(dimTime), Seq("d_date"))
        .groupBy(col("d_year"), col("d_quarter"), col("is_weekend"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spend"))
    }),

    // TPC-H Q21 shape: suppliers who kept others waiting — the hardest
    // join shape in the suite: a fact-fact join (late-line detection needs
    // o_orderdate; "late" = shipped >80 days after order date, standing in
    // for receipt>commit which the fixture lacks) followed by TWO
    // correlated self-joins over the same fact with DIFFERENT predicates:
    // EXISTS (another supplier in the order) → left_semi; NOT EXISTS
    // (another supplier ALSO late) → left_anti. Both right sides are the
    // raw lineitem scan column-pruned to 2-3 columns (the late predicate
    // correlates through l1's o_orderdate — same order ⇒ same date — so
    // neither re-joins orders); AQE picks build sides from runtime sizes.
    "q21_waiting_suppliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS")
      val l1 = li
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
      val others = li.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val lateOthers = li.select(col("l_orderkey").as("y_orderkey"),
        col("l_suppkey").as("y_suppkey"), col("l_shipdate").as("y_shipdate"))
      l1
        .join(others,
          col("l_orderkey") === col("x_orderkey") &&
            col("l_suppkey") =!= col("x_suppkey"), "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("y_orderkey") &&
            col("l_suppkey") =!= col("y_suppkey") &&
            col("y_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"),
          "left_anti")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q7 shape: bilateral trade volume between two nations by ship
    // year. Each dim side pre-filters to the two qualifying nations BEFORE
    // its join (the classic Q7 rewrite — the cross-side pair disjunction
    // cannot push below the joins, but its per-side implications can), so
    // the star joins drop non-qualifying rows at the earliest point; the
    // residual filter only removes the two same-nation combinations.
    "q7_nation_volume" -> ((s, d) => {
      val picks = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, d).filter(col("n_name").isin(picks: _*))
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).filter(col("n_name").isin(picks: _*))
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(revenue).cast("double"), 2).as("revenue"))
    }),

    // TPC-H Q13 shape: customer order-count distribution — the outer-join-
    // with-ON-clause-filter shape (the filter must NOT drop customers, only
    // orders, so it sits on the orders side BEFORE the left join), then a
    // count that treats the null-extended rows as zero, then a second
    // aggregation over the counts.
    "q13_custdist" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count skips nulls
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // TPC-H Q15 shape: the top supplier(s) by quarterly revenue — an
    // aggregate-of-aggregate (max over the per-supplier rollup) joined back
    // as a one-row broadcast, never a global window over the rollup (which
    // would single-task the supplier dimension at scale). Revenue rounds
    // to cents BEFORE the max so tie semantics are decimal-exact in both
    // engines.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01") &&
          col("l_shipdate") < lit("1999-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(revenue).cast("double"), 2).as("total_rev"))
      rev.join(broadcast(rev.agg(max(col("total_rev")).as("mx"))),
          col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
    }),

    // TPC-H Q17 shape: small-quantity-order revenue — the correlated
    // per-part scalar average (lines under 20% of their own part's mean
    // quantity), restricted to one brand. The brand's part keys broadcast
    // into BOTH lineitem passes (average + detail), so the per-part mean is
    // computed only where needed; the mean is exact decimal-sum / count so
    // the 0.2·avg comparison is bit-identical cross-engine.
    "q17_small_qty_revenue" -> ((s, d) => {
      val bparts = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val avgs = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("avg_qty"))
      li.join(avgs, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double")
          / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q22 shape: wealthy inactive customers — a one-row global
    // average broadcast into the scan filter, then an anti-join against
    // orders, rolled up per nation. The scalar subquery is a broadcast
    // cross-join of a single aggregated row (the a9/L6 pattern), never a
    // re-scan per row.
    "q22_wealthy_inactive" -> ((s, d) => {
      val avgBal = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("ab"))
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        // "inactive" = no order in the final year of the date range (every
        // fixture customer has SOME order, so the unscoped anti-join would
        // be vacuously empty and the gate row would prove nothing)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2001-01-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    }),

    // TPC-H Q8 shape: national market share — the target nation's revenue
    // share of a (region, part-type) market per order year. The share is a
    // conditional-sum ratio over ONE aggregation pass (no self-join);
    // both sums go through DECIMAL so the final double division is
    // bit-identical cross-engine.
    "q8_market_share" -> ((s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nkey"))
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01") &&
            col("o_orderdate") < lit("2001-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nr), col("c_nationkey") === col("c_nkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", revenue)
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
            / sum(revenue).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q9 shape (partsupp-free restatement): product-type profit by
    // (supplier nation, order year). Supply cost comes from the part dim
    // (p_retailprice × 0.5 × l_quantity) since partsupp doesn't exist in
    // this schema — keeping Q9's character: a computed profit expression
    // mixing fact and dim columns under a 4-table join, grouped on
    // attributes from two different dimension arms. Profit stays exact
    // DECIMAL end-to-end (two-factor products only — a triple decimal
    // product overflows DuckDB's width-38 multiply) and is emitted as
    // exact integer hundred-thousandths: revenue has ≤4 decimals and cost
    // ≤3, so ×10⁵ is integral — no rounding mode in play on either engine.
    "q9_product_profit" -> ((s, d) => {
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val bolts = Tables.part(s, d).filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"),
          (col("p_retailprice").cast("decimal(18,6)") *
            lit(0.5).cast("decimal(18,6)")).cast("decimal(18,6)").as("cost_unit"))
      val amount =
        revenue - col("cost_unit") * col("l_quantity").cast("decimal(18,6)")
      Tables.lineitem(s, d)
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(amount) * lit(100000)).cast("long").as("profit_e5"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q11 shape (partsupp-free restatement): parts whose revenue
    // exceeds a fraction of TOTAL revenue — group-by-having against a
    // one-row global scalar, the exact-arithmetic way: per-part and total
    // sums stay DECIMAL (associative) and convert to double only inside
    // the final comparison/emission, so the threshold predicate is
    // bit-identical cross-engine.
    "q11_important_parts" -> ((s, d) => {
      val perPart = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(revenue).as("value_dec"))
      perPart
        .crossJoin(broadcast(perPart.agg(sum(col("value_dec")).as("total_dec"))))
        .filter(col("value_dec").cast("double") >
          col("total_dec").cast("double") * 0.0001)
        // exact integer ten-thousandths, NO rounding anywhere: these totals
        // are big enough that decimal→double differs by 1 ulp exactly at
        // half-cent boundaries, and the engines' decimal scale-down
        // rounding modes differ too (Spark HALF_UP, DuckDB truncates).
        // price(2dp) × (1−discount)(2dp) has ≤ 4 exact decimals, so ×10⁴
        // is integral — both engines emit the identical BIGINT.
        .select(col("l_partkey"),
          (col("value_dec") * 10000).cast("long").as("value_e4"))
    }),

    // TPC-H Q16 shape: supplier diversity per (brand, type) — exclusion
    // filters on the dim, a distinct fact projection, an anti-join against
    // the "complaint" supplier set (the NOT IN subquery), then COUNT
    // DISTINCT per group.
    "q16_supplier_diversity" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
      val complaints = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q20 shape: dominant suppliers — nested aggregate semi-chain:
    // per-(part, supplier) volume vs the part's total, the >50% filter,
    // then a SEMI-join reducing suppliers (a supplier dominating several
    // parts must appear once). Scale shape: the fact is scanned and
    // shuffled ONCE — the per-part total re-aggregates the per-(part,
    // supplier) output (exact: decimal addition is associative), and that
    // second aggregation plus the dominant join are all keyed on
    // l_partkey, so AQE keeps them on the first shuffle's partitioning
    // instead of re-scanning lineitem for an independent aggregate.
    "q20_dominant_suppliers" -> ((s, d) => {
      val perPS = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01") &&
          col("l_shipdate") < lit("2000-01-01") &&
          // explicit null guards so BOTH consumers of this aggregate see
          // the identical filter set — the semi-join branch infers
          // isnotnull(l_suppkey) on its own, and a one-sided inferred
          // filter makes the two Exchange subplans differ, defeating
          // ReusedExchange (→ a second full fact scan at 100 TB)
          col("l_partkey").isNotNull && col("l_suppkey").isNotNull)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("ps_qty"))
      val perP = perPS.groupBy(col("l_partkey"))
        .agg(sum(col("ps_qty")).as("p_qty"))
      val dominant = perPS.join(perP, Seq("l_partkey"))
        .filter(col("ps_qty").cast("double") > col("p_qty").cast("double") * 0.5)
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // O1/W: per-customer running total (window over shuffled key)
    "w_running_total" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("running_spent",
          round(sum(col("o_totalprice").cast("decimal(18,6)"))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate"), col("o_orderkey"))
              .rowsBetween(Long.MinValue, 0)).cast("double"), 2))
        .select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("odate_s"), col("running_spent"))))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round((CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS sum_qty,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS sum_base_price,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS sum_disc_price,
        |  round((round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) / COUNT(*))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue,
        |  min(o_orderpriority) AS o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q2_cheapest_parts" ->
      """SELECT p_brand, p_partkey, p_name, round((p_retailprice)::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
        |                       WHERE p2.p_brand = p.p_brand)""".stripMargin,

    "q19_disjunctive" ->
      """SELECT p_type,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND ((p_type = 'PROMO' AND l_quantity < 10)
        |    OR (p_type = 'STANDARD' AND l_quantity >= 40))
        |GROUP BY 1""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin,

    "q12_priority_by_flag" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q14_promo_share" ->
      """SELECT round((100.0 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6)))
        |                         FILTER (p_type = 'PROMO') AS DOUBLE)
        |             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS promo_share,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1999-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-10-01 00:00:00'""".stripMargin,

    "j7_bucketed_join" ->
      """SELECT o_orderpriority,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue,
        |  count(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    // the z-layout is a pure re-clustering: the oracle is the same 2-D
    // predicate over the raw table
    "j8_zorder_scan" ->
      """SELECT l_suppkey, count(*) AS n_lines,
        |  round((CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS sum_qty,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue
        |FROM lineitem
        |WHERE l_partkey >= 100 AND l_partkey < 400
        |  AND l_suppkey >= 10 AND l_suppkey < 40
        |GROUP BY 1""".stripMargin,

    // the three live branches of the type-2 merge restated as explicit
    // UNION ALL arms over one full-outer join
    "j9_scd2_customers" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS acctbal,
        |         TIMESTAMP '1990-01-01 00:00:00' AS vf
        |  FROM customer),
        |u AS (
        |  SELECT c_custkey, segment, acctbal, uts FROM (
        |    SELECT o_custkey AS c_custkey, o_orderpriority AS segment,
        |           o_totalprice AS acctbal, o_orderdate AS uts,
        |           row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) x WHERE rn = 1),
        |j AS (
        |  SELECT coalesce(cur.c_custkey, u.c_custkey) AS c_custkey,
        |         cur.segment AS cs, cur.acctbal AS ca, cur.vf AS vf,
        |         u.segment AS us, u.acctbal AS ua, u.uts AS uts,
        |         cur.c_custkey IS NOT NULL AS has_open,
        |         u.c_custkey IS NOT NULL AS has_upd
        |  FROM cur FULL OUTER JOIN u ON cur.c_custkey = u.c_custkey),
        |chg AS (SELECT * FROM j WHERE has_open AND has_upd
        |        AND (cs IS DISTINCT FROM us OR ca IS DISTINCT FROM ua))
        |SELECT c_custkey, cs AS segment, ca AS acctbal,
        |       epoch(vf)::BIGINT AS valid_from_s, epoch(uts)::BIGINT AS valid_to_s
        |FROM chg
        |UNION ALL
        |SELECT c_custkey, us, ua, epoch(uts)::BIGINT, CAST(NULL AS BIGINT) FROM chg
        |UNION ALL
        |SELECT c_custkey, cs, ca, epoch(vf)::BIGINT, CAST(NULL AS BIGINT)
        |FROM j WHERE has_open AND (NOT has_upd
        |  OR (cs IS NOT DISTINCT FROM us AND ca IS NOT DISTINCT FROM ua))
        |UNION ALL
        |SELECT c_custkey, us, ua, epoch(uts)::BIGINT, CAST(NULL AS BIGINT)
        |FROM j WHERE NOT has_open""".stripMargin,

    // DuckDB GROUPING() bit order matches Spark grouping_id for the same
    // column list (r_name = high bit, n_name = low bit)
    "a7_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue,
        |  GROUPING(r_name, n_name)::BIGINT AS gid
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "a7b_cube_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS total_price,
        |  GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "a8_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_open,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_filled,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_pending
        |FROM orders GROUP BY 1""".stripMargin,

    "o2_top_customers" ->
      """SELECT o_custkey,
        |  round((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin,

    "a5_distinct_status" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "j2_dim_lookup" ->
      """WITH dim AS (
        |  SELECT event_type,
        |         row_number() OVER (ORDER BY event_type) AS type_id
        |  FROM (SELECT DISTINCT event_type FROM events) t)
        |SELECT d.type_id, e.event_type, COUNT(*) AS n,
        |  round((CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS total_value
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1, 2""".stripMargin,

    "j_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,

    "j_semi_parts" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |GROUP BY p_brand""".stripMargin,

    "a6_percentiles" ->
      """SELECT l_returnflag,
        |       round((quantile_cont(l_extendedprice, 0.5))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS med_price,
        |       round((quantile_cont(l_extendedprice, 0.95))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS p95_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS odate_s,
        |       o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, odate_s, o_orderkey
        |LIMIT 100""".stripMargin,

    // the bounds hold ⟺ every boolean is true; the oracle states exactly
    // that, so a violated bound hash-mismatches
    "a6b_sketch_bounds" ->
      """SELECT event_type, true AS hll_ok, true AS q50_ok, true AS q95_ok
        |FROM (SELECT DISTINCT event_type FROM events)""".stripMargin,

    "a9_equidepth_bins" ->
      """WITH b AS (
        |  SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
        |  FROM events),
        |binned AS (
        |  SELECT value,
        |         1 + (CASE WHEN value > q[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[4] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[5] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[6] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[7] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[8] THEN 1 ELSE 0 END)
        |           + (CASE WHEN value > q[9] THEN 1 ELSE 0 END) AS bin
        |  FROM events, b)
        |SELECT bin, count(*) AS n, round((min(value))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS lo,
        |       round((max(value))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS hi
        |FROM binned GROUP BY 1""".stripMargin,

    "a10_corr_qty_price" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    count(*)::DOUBLE AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |       round(((n * sxy - sx * sy)
        |             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS corr_qp,
        |       n::BIGINT AS n_rows
        |FROM m""".stripMargin,

    // generate_series over the span (single-row CTE, so the list-returning
    // form + unnest works on DuckDB 1.0); isodow matches Spark weekday()+1
    "j3_dim_time" ->
      """WITH span AS (
        |  SELECT min(o_orderdate)::DATE AS lo, max(o_orderdate)::DATE AS hi
        |  FROM orders),
        |dim AS (
        |  SELECT unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |                                INTERVAL 1 DAY))::DATE AS d_date
        |  FROM span),
        |dim2 AS (
        |  SELECT d_date, year(d_date)::BIGINT AS d_year,
        |         quarter(d_date)::BIGINT AS d_quarter,
        |         isodow(d_date)::BIGINT >= 6 AS is_weekend
        |  FROM dim)
        |SELECT d_year, d_quarter, is_weekend, count(*) AS n_orders,
        |  round((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS spend
        |FROM orders JOIN dim2 ON o_orderdate::DATE = d_date
        |GROUP BY 1, 2, 3""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate)::BIGINT AS l_year,
        |  round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c
        |GROUP BY c_count""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'),
        |a AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |           / count(*) AS avg_qty
        |  FROM li GROUP BY 1)
        |SELECT round((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |             / 7.0)::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS avg_yearly,
        |       count(*) AS n_lines
        |FROM li JOIN a USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q22_wealthy_inactive" ->
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |           / count(*) AS ab
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  round((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 2)::DOUBLE AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,

    "q8_market_share" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |  round((CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
        |                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))
        |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE))::VARCHAR::DECIMAL(38,23), 6)::DOUBLE AS mkt_share,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
        |  (SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))
        |       - CAST(CAST(p_retailprice AS DECIMAL(18,6)) * CAST(0.5 AS DECIMAL(18,6)) AS DECIMAL(18,6))
        |         * CAST(l_quantity AS DECIMAL(18,6))) * 100000)::BIGINT AS profit_e5,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS value_dec
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(value_dec) AS total_dec FROM v)
        |SELECT l_partkey, (value_dec * 10000)::BIGINT AS value_e4
        |FROM v, t
        |WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.0001""".stripMargin,

    "q16_supplier_diversity" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH li99 AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,6)) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'),
        |ps AS (SELECT l_partkey, l_suppkey, SUM(qty) AS ps_qty FROM li99 GROUP BY 1, 2),
        |p AS (SELECT l_partkey, SUM(qty) AS p_qty FROM li99 GROUP BY 1)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM ps JOIN p USING (l_partkey)
        |  WHERE ps.l_suppkey = s_suppkey
        |    AND CAST(ps_qty AS DOUBLE) > CAST(p_qty AS DOUBLE) * 0.5)""".stripMargin,

    "w_running_total" ->
      """SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS odate_s,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spent
        |FROM orders""".stripMargin)
}
