package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Queries.QDef

/** Relational extension queries: joins and window ranking. The reference
  * has no joins at all (SURVEY §2.5 — `concat` is its only two-table op),
  * but an engine a koalas user switches to for 100 TB work needs them;
  * they also exercise the join machinery the EXT near-dup operators build
  * on. All Spark built-ins; strategy chosen to scale:
  *  - dimension joins broadcast the small side explicitly;
  *  - fact-fact joins shuffle on the join key and let AQE pick
  *    broadcast/sort-merge and coalesce partitions at runtime;
  *  - anti-join for "absent in" instead of NOT IN subquery re-scans.
  */
object Rel {

  import Tables._

  /** Broadcast dimension join: order revenue by market segment. */
  private val joinBroadcast = QDef(
    "join_broadcast",
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_totalprice"))
      .orderBy(col("c_mktsegment")),
    Some("SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "GROUP BY c_mktsegment ORDER BY c_mktsegment")
  )

  /** Fact-fact equi-join on the shuffle key (AQE re-plans at runtime). */
  private val joinLarge = QDef(
    "join_large",
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_price"))
      .orderBy(col("o_orderstatus")),
    Some("SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items, " +
      "sum(l_quantity) AS sum_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus")
  )

  /** Anti join: customers that never ordered. */
  private val joinAnti = QDef(
    "join_anti",
    (s, d) => customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("SELECT c_custkey, c_name FROM customer " +
      "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
      "ORDER BY c_custkey")
  )

  /** Semi join: parts that appear in some lineitem. */
  private val joinSemi = QDef(
    "join_semi",
    (s, d) => part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey")),
    Some("SELECT p_partkey, p_brand FROM part " +
      "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey) " +
      "ORDER BY p_partkey")
  )

  /** Window ranking: top-3 orders per customer by price (deterministic
    * tie-break on the key). */
  private val windowTopK = QDef(
    "window_topk",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    },
    Some("SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank " +
      "FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_custkey " +
      "ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM orders) " +
      "WHERE rank <= 3 ORDER BY o_custkey, rank")
  )

  /** As-of join: each purchase event gets the latest prior signup ts of
    * the same user (union + running-max window — one shuffle on user_id;
    * see graft.operators.Joins.asofJoin). Oracle: the equivalent
    * correlated max-subquery. */
  private val joinAsof = QDef(
    "join_asof",
    (s, d) => {
      val ev = events(s, d)
      graft.operators.Joins.asofJoin(
        left = ev.filter(col("event_type") === "purchase"),
        right = ev.filter(col("event_type") === "signup"),
        key = "user_id", tsCol = "ts", asofCol = "last_signup_ts")
        .orderBy(col("event_id"))
    },
    Some("SELECT event_id, CAST(e.ts AS TIMESTAMP) AS ts, user_id, event_type, value, props, " +
      "(SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s " +
      " WHERE s.user_id = e.user_id AND s.event_type = 'signup' " +
      " AND CAST(s.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)) AS last_signup_ts " +
      "FROM events e WHERE e.event_type = 'purchase' ORDER BY event_id")
  )

  /** Tolerance-bounded as-of join ([[graft.operators.Joins
    * .asofJoinWithin]]): latest prior signup per purchase, but only if it
    * happened within the last 24 hours — stale matches null out. */
  private val joinAsofTol = QDef(
    "join_asof_tol",
    (s, d) => {
      val ev = events(s, d)
      graft.operators.Joins.asofJoinWithin(
        left = ev.filter(col("event_type") === "purchase"),
        right = ev.filter(col("event_type") === "signup"),
        key = "user_id", tsCol = "ts", asofCol = "last_signup_ts",
        toleranceSec = 86400L)
        .orderBy(col("event_id"))
    },
    Some("SELECT event_id, CAST(e.ts AS TIMESTAMP) AS ts, user_id, event_type, value, props, " +
      "(SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s " +
      " WHERE s.user_id = e.user_id AND s.event_type = 'signup' " +
      " AND CAST(s.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) " +
      " AND CAST(s.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 86400 SECOND" +
      ") AS last_signup_ts " +
      "FROM events e WHERE e.event_type = 'purchase' ORDER BY event_id")
  )

  /** Forward as-of join ([[graft.operators.Joins.asofJoinForwardWithin]]):
    * each signup gets the EARLIEST following purchase of the same user
    * within 24 h (time-to-conversion attribution) — the mirror direction
    * of `join_asof`, same one-exchange running-extreme plan over
    * descending order. */
  private val joinAsofFwd = QDef(
    "join_asof_fwd",
    (s, d) => {
      val ev = events(s, d)
      graft.operators.Joins.asofJoinForwardWithin(
        left = ev.filter(col("event_type") === "signup"),
        right = ev.filter(col("event_type") === "purchase"),
        key = "user_id", tsCol = "ts", asofCol = "next_purchase_ts",
        toleranceSec = 86400L)
        .orderBy(col("event_id"))
    },
    Some("SELECT event_id, CAST(e.ts AS TIMESTAMP) AS ts, user_id, event_type, value, props, " +
      "(SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p " +
      " WHERE p.user_id = e.user_id AND p.event_type = 'purchase' " +
      " AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) " +
      " AND CAST(p.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) + INTERVAL 86400 SECOND" +
      ") AS next_purchase_ts " +
      "FROM events e WHERE e.event_type = 'signup' ORDER BY event_id")
  )

  /** Point-in-interval join via banding ([[graft.operators.Joins
    * .rangeJoin]]): count lineitems whose (floored) price falls within
    * ±500 of each sampled part's retail price. A plain inequality join
    * here is a BroadcastNestedLoopJoin — O(points×intervals); the banded
    * form is an ordinary hash join on the band key (PlanSpec asserts no
    * nested loop survives). The oracle runs the naive BETWEEN join —
    * same rows, quadratic plan, which is the point. */
  private val joinRange = QDef(
    "join_range",
    (s, d) => {
      val pts = lineitem(s, d).select(
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("price_pt"))
      val iv = part(s, d).filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey"),
          (expr("CAST(floor(p_retailprice) AS BIGINT)") - 500L).as("lo"),
          (expr("CAST(floor(p_retailprice) AS BIGINT)") + 500L).as("hi"))
      graft.operators.Joins
        .rangeJoin(pts, iv, "price_pt", "lo", "hi", bandWidth = 256L)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_in_band"))
        .orderBy(col("p_partkey"))
    },
    Some("SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_in_band " +
      "FROM part JOIN lineitem ON CAST(floor(l_extendedprice) AS BIGINT) " +
      "BETWEEN CAST(floor(p_retailprice) AS BIGINT) - 500 " +
      "AND CAST(floor(p_retailprice) AS BIGINT) + 500 " +
      "WHERE p_partkey % 100 = 0 GROUP BY 1 ORDER BY 1")
  )

  /** Hierarchical totals: ROLLUP over the grouping keys with grouping_id
    * disambiguating subtotal levels (Spark's grouping_id bit order matches
    * DuckDB's GROUPING(a,b)). */
  private val rollupAgg = QDef(
    "rollup_agg",
    (s, d) => lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_price"),
        grouping_id().as("lvl"))
      .orderBy(col("lvl"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
      "sum(l_quantity) AS sum_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
      "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl " +
      "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
      "ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
  )

  /** Distinct aggregate: exact per-group distinct counts (Expand-based
    * plan — one extra shuffle, no driver-side sets). */
  private val distinctCountAgg = QDef(
    "distinct_count_agg",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("SELECT l_returnflag, l_linestatus, " +
      "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts, " +
      "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps, " +
      "CAST(count(*) AS BIGINT) AS n " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus")
  )

  /** Pivot: line status as columns (explicit value list so the plan needs
    * no discovery pass; oracle = conditional aggregation). */
  private val pivotAgg = QDef(
    "pivot_agg",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType))
      .orderBy(col("l_returnflag")),
    Some("SELECT l_returnflag, " +
      "CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F, " +
      "CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
  )

  /** Moving aggregate: trailing-3-orders average spend per customer
    * (rows-frame window; decimal-exact numerator). */
  private val windowMoving = QDef(
    "window_moving",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DoubleType)
          / count(lit(1)).over(w)).as("mov_avg_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("SELECT o_custkey, o_orderkey, o_orderdate, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) " +
      " / count(*) OVER w AS mov_avg_price " +
      "FROM orders " +
      "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) " +
      "ORDER BY o_custkey, o_orderkey")
  )

  /** Per-group mode with a pinned tie order ([[graft.operators.Grouped
    * .modeOf]]): most frequent ship mode per return flag. SQL `mode()`
    * tie-breaks are implementation-defined, so the oracle mirrors the
    * same count → top-1-window definition instead. */
  private val groupbyMode = QDef(
    "groupby_mode",
    (s, d) => graft.operators.Grouped
      .modeOf(events(s, d), "user_id", "event_type")
      .orderBy(col("user_id")),
    Some("WITH c AS (SELECT user_id, event_type, " +
      "CAST(count(*) AS BIGINT) AS n_mode FROM events GROUP BY 1, 2), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY user_id " +
      "ORDER BY n_mode DESC, event_type) AS rn FROM c) " +
      "SELECT user_id, event_type AS mode_event_type, n_mode " +
      "FROM r WHERE rn = 1 ORDER BY user_id")
  )

  /** Exact interpolated quantiles per group — Spark `percentile` and DuckDB
    * `quantile_cont` share the interpolation formula (verified
    * bit-identical on the testdata). Exact percentile concentrates each
    * group's values into one task, so it is registered on a
    * HIGH-CARDINALITY grouping (l_partkey mod 1024 — ~n/1024 values per
    * task, and the shape scales by raising the modulus with the data); the
    * 3-group `l_returnflag` version of this query would put a third of the
    * table in one task at 100 TB. For a global (single-group) exact
    * quantile see `quantile_dist`; for constant memory see `approx_agg`. */
  private val quantileAgg = QDef(
    "quantile_agg",
    (s, d) => lineitem(s, d)
      .groupBy(pmod(col("l_partkey"), lit(1024)).as("pk_bucket"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("med_price"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        expr("percentile(l_quantity, 0.5)").as("med_qty"))
      .orderBy(col("pk_bucket")),
    Some("SELECT l_partkey % 1024 AS pk_bucket, " +
      "quantile_cont(l_extendedprice, 0.5) AS med_price, " +
      "quantile_cont(l_extendedprice, 0.9) AS p90_price, " +
      "quantile_cont(l_quantity, 0.5) AS med_qty " +
      "FROM lineitem GROUP BY 1 ORDER BY pk_bucket")
  )

  /** GLOBAL exact interpolated quantiles with NO value concentration — the
    * two-pass range-partition + order-statistics plan
    * ([[graft.functions.Quantiles.exactQuantilesGlobal]]). The scale
    * counterpart to `quantile_agg`: a global `percentile(...)` aggregate
    * would pull every value of the table into one task. */
  private val quantileDist = QDef(
    "quantile_dist",
    (s, d) => graft.functions.Quantiles.exactQuantilesGlobal(
      lineitem(s, d), "l_extendedprice", Seq(0.25, 0.5, 0.9, 0.99)),
    Some(Seq(0.25, 0.5, 0.9, 0.99).map(q =>
      s"SELECT $q AS q, quantile_cont(l_extendedprice, $q) AS value FROM lineitem")
      .mkString("", " UNION ALL ", " ORDER BY q"))
  )

  /** Sketch aggregates (HLL++ distinct count, KLL-style quantile) — the
    * constant-memory per-group versions for when exact is too expensive.
    * Sketch internals are engine-specific → rows-only check; accuracy
    * bounds are unit-tested against the exact aggregates and
    * oracle-checked by `approx_agg_bounds`. */
  private val approxAgg = QDef(
    "approx_agg",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_med"))
      .orderBy(col("l_returnflag")),
    None
  )

  /** Oracle-checkable companion to `approx_agg`: per group, does the sketch
    * land within its documented error bound of the exact aggregate?
    * (HLL++ rsd 5% default → 15% bound; approx_percentile accuracy 1000 →
    * 5% relative bound on the median.) The booleans are computed in Spark
    * from BOTH the sketch and the exact value; the oracle asserts they are
    * all true — a hash-matching driver-visible accuracy gate for the
    * engine-native sketches. Shape notes, each learned from a measured
    * failure: (a) grouped on a 64-bucket key, not 3 groups — the EXACT
    * reference aggregates concentrate each group's values into one task
    * (19 s at sf0.1 on `l_returnflag`, a scale-killer); (b) not 1024
    * buckets — `approx_percentile` returns an ELEMENT while `percentile`
    * interpolates, and in a ~60-row bucket adjacent order statistics can
    * differ by more than any sane bound (observed FAIL), while ~1000-row
    * buckets keep the gap ≪ the 10% bound; (c) the exact distinct count is
    * a two-step group-by (bucket,key)→(bucket), NOT `countDistinct` in the
    * same agg — that would Expand every row per aggregate. */
  private val approxAggBounds = QDef(
    "approx_agg_bounds",
    (s, d) => {
      val li = lineitem(s, d)
        .withColumn("pk_bucket", pmod(col("l_partkey"), lit(64)))
      val exactDistinct = li.groupBy(col("pk_bucket"), col("l_orderkey")).agg(count(lit(1)))
        .groupBy(col("pk_bucket")).agg(count(lit(1)).as("eo"))
      val sketches = li.groupBy(col("pk_bucket"))
        .agg(
          approx_count_distinct(col("l_orderkey")).as("ao"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("am"),
          expr("percentile(l_extendedprice, 0.5)").as("em"))
      sketches.join(exactDistinct, "pk_bucket")
        .select(col("pk_bucket"),
          (abs(col("ao") - col("eo")).cast(DoubleType) / col("eo") <= 0.15)
            .as("orders_in_bound"),
          (abs(col("am") - col("em")) / col("em") <= 0.10).as("med_in_bound"))
        .orderBy(col("pk_bucket"))
    },
    Some("SELECT l_partkey % 64 AS pk_bucket, true AS orders_in_bound, " +
      "true AS med_in_bound FROM lineitem GROUP BY 1 ORDER BY pk_bucket")
  )

  /** CUBE: all grouping-set combinations with grouping_id levels. */
  private val cubeAgg = QDef(
    "cube_agg",
    (s, d) => lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("lvl"))
      .orderBy(col("lvl"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
      "sum(l_quantity) AS sum_qty, " +
      "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl " +
      "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
      "ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
  )

  /** Set intersection (distinct semantics, like SQL INTERSECT). */
  private val setIntersect = QDef(
    "set_intersect",
    (s, d) => {
      val n = nation(s, d)
      n.filter(col("n_regionkey") < 3)
        .intersect(n.filter(col("n_nationkey") < 15))
        .orderBy(col("n_nationkey"))
    },
    Some("SELECT * FROM nation WHERE n_regionkey < 3 " +
      "INTERSECT SELECT * FROM nation WHERE n_nationkey < 15 " +
      "ORDER BY n_nationkey")
  )

  /** Set difference (distinct semantics, like SQL EXCEPT). */
  private val setExcept = QDef(
    "set_except",
    (s, d) => {
      val n = nation(s, d)
      n.except(n.filter(col("n_regionkey") >= 3))
        .orderBy(col("n_nationkey"))
    },
    Some("SELECT * FROM nation " +
      "EXCEPT SELECT * FROM nation WHERE n_regionkey >= 3 " +
      "ORDER BY n_nationkey")
  )

  /** JSON field extraction from the events.props payload column —
    * semi-structured columns are routine in event pipelines; extraction
    * is a codegen'd path expression, no parsing UDF. */
  private val jsonExtract = QDef(
    "json_extract",
    (s, d) => events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k " +
      "FROM events ORDER BY event_id")
  )

  /** TPC-H Q3-shaped 3-way join pipeline: segment filter pushed into the
    * customer scan, customer broadcast into orders, orders⋈lineitem on the
    * shuffle key, decimal-exact revenue, top-10 by revenue. The multi-join
    * shape Catalyst + AQE must reorder/choose strategies for. */
  private val q3Shipping = QDef(
    "q3_shipping",
    (s, d) => lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-06-15").cast("timestamp"))
      .join(orders(s, d).filter(col("o_orderdate") < lit("1998-06-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10),
    Some("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
      " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "WHERE l_shipdate > TIMESTAMP '1998-06-15' " +
      "AND o_orderdate < TIMESTAMP '1998-06-15' " +
      "AND c_mktsegment = 'BUILDING' " +
      "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
      "ORDER BY revenue DESC, l_orderkey LIMIT 10")
  )

  /** TPC-H Q5-shaped 5-table join: revenue by nation where customer and
    * supplier share the nation, region-filtered. The join-reorder stress
    * q3 doesn't reach — two fact tables (lineitem, orders) plus three
    * dimension hops (customer, supplier, nation→region). Strategy: facts
    * shuffle on l_orderkey; supplier/nation/region are broadcast (supplier
    * is sf-tiny, nation/region are constant-size); the region filter
    * prunes before the broadcast ships. */
  private val q5LocalSupplier = QDef(
    "q5_local_supplier",
    (s, d) => lineitem(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name")),
    Some("SELECT n_name, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
      " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1999-01-01' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name")
  )

  /** TPC-H Q17-shaped two-pass aggregate join: revenue of lineitems whose
    * quantity is below 20% of their part's average quantity. The
    * "aggregate, join back to the fact" shape (a decorrelated scalar
    * subquery): per-part averages are one hash aggregate — O(parts) rows —
    * then a key join back to lineitem. At scale both sides shuffle on
    * l_partkey once; AQE broadcasts the aggregate side when it fits. */
  private val q17SmallQty = QDef(
    "q17_small_qty",
    (s, d) => {
      val li = lineitem(s, d)
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType) / 7.0).as("avg_yearly"))
    },
    Some("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) " +
      " / 7.0 AS avg_yearly " +
      "FROM lineitem JOIN (SELECT l_partkey AS ap_partkey, " +
      " CAST(sum(l_quantity) AS DOUBLE) / count(l_quantity) AS avg_qty " +
      " FROM lineitem GROUP BY 1) ON l_partkey = ap_partkey " +
      "WHERE l_quantity < 0.2 * avg_qty")
  )

  /** Bloom-pruned fact⋈dim join ([[graft.operators.Joins.bloomPrunedJoin]]):
    * the fact side is pre-filtered by a Bloom sketch of the (filtered) dim
    * keys before its shuffle; the exact join removes false positives, so
    * the oracle is the PLAIN join's SQL — bit-identical results, fewer
    * shuffled bytes. */
  private val joinBloom = QDef(
    "join_bloom",
    (s, d) => graft.operators.Joins.bloomPrunedJoin(
      lineitem(s, d),
      supplier(s, d).filter(col("s_nationkey") === 1),
      "l_suppkey", "s_suppkey")
      .groupBy(col("s_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_name")),
    Some("SELECT s_name, CAST(count(*) AS BIGINT) AS n_items, " +
      "sum(l_quantity) AS sum_qty " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE s_nationkey = 1 GROUP BY s_name ORDER BY s_name")
  )

  /** TPC-H Q6-shaped forecast-revenue scan: tight multi-predicate filter
    * straight into one global aggregate — the purest pushdown+codegen
    * shape (no shuffle beyond the single-row final agg). Revenue goes
    * through exact decimal products (DECIMAL(18,2)×DECIMAL(18,2) — both
    * engines multiply decimals exactly), so the sum is reduction-order-
    * and engine-invariant. */
  private val q6Forecast = QDef(
    "q6_forecast",
    (s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2))
          * col("l_discount").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items")),
    Some("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
      "* CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
      "CAST(count(*) AS BIGINT) AS n_items FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24")
  )

  /** TPC-H Q4-shaped EXISTS aggregate: orders with at least one deeply
    * discounted item, counted by priority — EXISTS decorrelates to a
    * left-semi join (no payload duplication, no distinct needed). */
  private val q4Priority = QDef(
    "q4_priority",
    (s, d) => orders(s, d)
      .join(lineitem(s, d).filter(col("l_discount") >= 0.06),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority")),
    Some("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders " +
      "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_discount >= 0.06) " +
      "GROUP BY 1 ORDER BY o_orderpriority")
  )

  /** TPC-H Q14-shaped promo-revenue ratio: conditional vs total aggregate
    * in ONE pass over the filtered fact (no second scan), dimension
    * broadcast. Exact decimal sums; the final ratio is one IEEE divide. */
  private val q14Promo = QDef(
    "q14_promo",
    (s, d) => {
      val prod = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", prod)).cast(DoubleType)
            .as("promo_rev"),
          sum(prod).cast(DoubleType).as("total_rev"))
        .select((col("promo_rev") * 100.0 / col("total_rev"))
          .as("promo_pct"))
    },
    Some("SELECT CAST(sum(CASE WHEN p_type = 'PROMO' " +
      "THEN CAST(l_extendedprice AS DECIMAL(18,2)) " +
      "* CAST(1.0 - l_discount AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 " +
      "/ CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
      "* CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_pct " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01'")
  )

  /** Salted equi-join on a PATHOLOGICALLY skewed key: `l_returnflag` has 3
    * distinct values, so a plain shuffle join lands each key's entire row
    * mass on one reducer — the partition that doesn't fit an executor at
    * 100 TB. [[graft.operators.Joins.saltedJoin]] splits every key across
    * 8 salt buckets by a deterministic row hash and replicates the (tiny)
    * dim side per bucket: parallelism becomes keys×buckets, and the result
    * is EXACTLY the plain join — which is precisely what the oracle checks
    * (the dim derives from lineitem itself, so the join is an identity on
    * flags and the oracle is the plain group-by). */
  private val joinSalted = QDef(
    "join_salted",
    (s, d) => {
      val li = lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
      val dim = lineitem(s, d).select(col("l_returnflag")).distinct()
        .withColumn("flag_code", ascii(col("l_returnflag")))
      graft.operators.Joins.saltedJoin(li, dim, "l_returnflag", saltBuckets = 8)
        .groupBy(col("l_returnflag"), col("flag_code"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("SELECT l_returnflag, CAST(ascii(l_returnflag) AS INT) AS flag_code, " +
      "CAST(count(*) AS BIGINT) AS n_items, sum(l_quantity) AS sum_qty " +
      "FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag")
  )

  /** TPC-H Q2-shaped correlated-min subquery: for every part, the
    * supplier(s) and price of its CHEAPEST lineitem. The classic
    * "row whose value equals a correlated aggregate" shape; testdata has no
    * partsupp so lineitem plays the price-list role. Decorrelated into a
    * single window-min over the correlation key — ONE shuffle on l_partkey
    * (a groupBy+self-join decorrelation would shuffle twice); ties keep all
    * rows, exactly the correlated-subquery semantics. Dimension hops
    * (part, supplier) broadcast. */
  private val q2MinPrice = QDef(
    "q2_min_price",
    (s, d) => {
      val w = Window.partitionBy(col("l_partkey"))
      lineitem(s, d)
        .withColumn("min_price", min(col("l_extendedprice")).over(w))
        .filter(col("l_extendedprice") === col("min_price"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          col("min_price")).distinct()
        .orderBy(col("p_partkey"), col("s_name"))
    },
    Some("SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price " +
      "FROM lineitem l JOIN part ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "WHERE l_extendedprice = (SELECT min(l2.l_extendedprice) " +
      " FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) " +
      "ORDER BY p_partkey, s_name")
  )

  /** TPC-H Q18-shaped "large volume" query: orders whose total quantity
    * exceeds a threshold, with customer detail. The IN-(grouped-HAVING)
    * subquery decorrelates to aggregate→filter→semi-join: the qualifying
    * key set is O(big orders) rows, so AQE broadcasts it back against the
    * fact; lineitem is aggregated once and reused for the output quantity. */
  private val q18BigOrders = QDef(
    "q18_big_orders",
    (s, d) => {
      val li = lineitem(s, d)
      val orderQty = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
      orderQty.filter(col("total_qty") > 250)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, " +
      "sum(l_quantity) AS total_qty " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem " +
      " GROUP BY l_orderkey HAVING sum(l_quantity) > 250) " +
      "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")
  )

  /** TPC-H Q20-shaped supplier screen: suppliers that shipped more than a
    * threshold quantity of red-named parts. Nested semi-join pyramid —
    * part-name filter → semi-join into lineitem (broadcast: the filtered
    * part key set is small) → grouped HAVING → semi-join into supplier.
    * Each level's output is strictly smaller; nothing rescans the fact. */
  private val q20QtySuppliers = QDef(
    "q20_qty_suppliers",
    (s, d) => {
      val redParts = part(s, d).filter(col("p_name").contains("red"))
        .select(col("p_partkey"))
      val bigSupp = lineitem(s, d)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 2000)
      supplier(s, d)
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (" +
      "SELECT l_suppkey FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') " +
      "GROUP BY l_suppkey HAVING sum(l_quantity) > 2000) " +
      "ORDER BY s_suppkey")
  )

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * per-returnflag and per-linestatus subtotals only, no detail rows. */
  private val groupingSets = QDef(
    "grouping_sets",
    (s, d) => {
      lineitem(s, d).createOrReplaceTempView("_li_gs")
      s.sql("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "sum(l_quantity) AS sum_qty, grouping_id() AS lvl FROM _li_gs " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
        "ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
    },
    Some("SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
      "sum(l_quantity) AS sum_qty, " +
      "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl " +
      "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
      "ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
  )

  /** Interval-overlap join ([[graft.operators.Joins.intervalOverlapJoin]]):
    * per user, count the ±30 min incident windows around error events
    * that overlap each of the user's sessions — banded to an equi-join on
    * (user, hour-band) with responsibility-band dedup; the oracle runs
    * the naive overlap join. */
  private val joinInterval = QDef(
    "join_interval",
    (s, d) => {
      val ev = events(s, d)
      val sess = graft.operators.Sessions.sessionize(ev)
        .select(col("user_id"), col("session_id"),
          unix_micros(col("session_start")).as("s_lo"),
          unix_micros(col("session_end")).as("s_hi"))
      val inc = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("incident_id"),
          (unix_micros(col("ts")) - lit(1800000000L)).as("i_lo"),
          (unix_micros(col("ts")) + lit(1800000000L)).as("i_hi"))
      graft.operators.Joins.intervalOverlapJoin(
          sess, inc, "s_lo", "s_hi", "i_lo", "i_hi",
          bandWidth = 3600000000L, keys = Seq("user_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_incidents"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some(
      """WITH sess AS (SELECT user_id, session_id,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM (
        | SELECT user_id, ts, event_id,
        |  sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          + INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS _new
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |        FROM events)) )
        |GROUP BY user_id, session_id),
        |inc AS (SELECT user_id,
        | epoch_us(CAST(ts AS TIMESTAMP)) - 1800000000 AS i_lo,
        | epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS i_hi
        |FROM events WHERE event_type = 'error')
        |SELECT sess.user_id, CAST(session_id AS BIGINT) AS session_id,
        | CAST(count(*) AS BIGINT) AS n_incidents
        |FROM sess JOIN inc ON sess.user_id = inc.user_id
        | AND epoch_us(session_start) <= i_hi AND i_lo <= epoch_us(session_end)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace('\n', ' ')
    )
  )

  /** Exact per-group discrete quantiles ([[graft.functions.Quantiles
    * .groupQuantilesDisc]]): percentile_disc semantics (rank ceil(q·n) —
    * an actual data value), one group-partitioned window + one aggregate.
    * The oracle spells out the same rank definition rather than trusting
    * engine-specific quantile_disc conventions. */
  private val quantileGroup = QDef(
    "quantile_group",
    (s, d) => graft.functions.Quantiles.groupQuantilesDisc(
        lineitem(s, d), "l_returnflag", "l_extendedprice", Seq(0.5, 0.9))
      .orderBy(col("l_returnflag")),
    Some("WITH r AS (SELECT l_returnflag, l_extendedprice AS v, " +
      "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn, " +
      "count(*) OVER (PARTITION BY l_returnflag) AS n " +
      "FROM lineitem WHERE l_extendedprice IS NOT NULL) " +
      "SELECT l_returnflag, " +
      "min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50, " +
      "min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN v END) AS p90 " +
      "FROM r GROUP BY 1 ORDER BY 1")
  )

  /** Robust MAD outlier summary ([[graft.functions.Quantiles
    * .madOutliers]]): per event type, discrete median, MAD, and the
    * count beyond 3·MAD — two group-partitioned windows, everything
    * else exact data values and single IEEE ops. */
  private val outlierMad = QDef(
    "outlier_mad",
    (s, d) => graft.functions.Quantiles.madOutliers(
        events(s, d), "event_type", "value", cutoff = 3.0)
      .orderBy(col("event_type")),
    Some("WITH base AS (SELECT event_type, value AS v FROM events WHERE value IS NOT NULL), " +
      "r1 AS (SELECT event_type, v, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn, " +
      "count(*) OVER (PARTITION BY event_type) AS n FROM base), " +
      "med AS (SELECT event_type, " +
      "min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS median " +
      "FROM r1 GROUP BY 1), " +
      "d AS (SELECT base.event_type, v, median, abs(v - median) AS dev " +
      "FROM base JOIN med USING (event_type)), " +
      "r2 AS (SELECT event_type, dev, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn, " +
      "count(*) OVER (PARTITION BY event_type) AS n FROM d), " +
      "madt AS (SELECT event_type, " +
      "min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN dev END) AS mad_val " +
      "FROM r2 GROUP BY 1) " +
      "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
      "min(median) AS median, min(mad_val) AS mad, " +
      "CAST(count(CASE WHEN dev > 3.0 * mad_val THEN 1 END) AS BIGINT) AS n_outliers " +
      "FROM d JOIN madt USING (event_type) GROUP BY 1 ORDER BY 1")
  )

  /** Top length-3 event paths ([[graft.functions.EventStats.topPaths]]):
    * most frequent consecutive event-type trigrams across users; ties
    * broken by path string so the top-k cut is deterministic in both
    * engines. */
  private val topPathsQ = QDef(
    "top_paths",
    (s, d) => graft.functions.EventStats.topPaths(
      events(s, d), "user_id", "event_type", "ts", "event_id",
      len = 3, k = 10),
    Some("WITH t AS (SELECT event_type, " +
      "lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2 " +
      "FROM events WINDOW w AS (PARTITION BY user_id " +
      "ORDER BY CAST(ts AS TIMESTAMP), event_id)), " +
      "p AS (SELECT event_type || '>' || t1 || '>' || t2 AS path FROM t " +
      "WHERE t2 IS NOT NULL) " +
      "SELECT path, CAST(count(*) AS BIGINT) AS n_paths FROM p GROUP BY 1 " +
      "ORDER BY n_paths DESC, path LIMIT 10")
  )

  /** Corpus language mix per source: counts and exact-ratio fractions
    * (one grouped aggregate + a source-partitioned window; the only IEEE
    * op is the final divide of exact longs). The per-source language
    * drift monitor a multilingual ingest pipeline watches. */
  private val langMix = QDef(
    "lang_mix",
    (s, d) => {
      val counts = documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      counts
        .withColumn("frac",
          col("n_docs").cast(DoubleType) / sum(col("n_docs")).over(w).cast(DoubleType))
        .orderBy(col("source"), col("lang"))
    },
    Some("WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs " +
      "FROM documents GROUP BY 1, 2) " +
      "SELECT source, lang, n_docs, " +
      "CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE) AS frac " +
      "FROM c ORDER BY source, lang")
  )

  /** Per-user activity histogram: how many users produced k events — the
    * engagement-distribution / bot-detection monitor. Two integer
    * aggregates, both key-hashed; the histogram is |distinct counts|
    * rows (bounded metadata). */
  private val userActivityHist = QDef(
    "user_activity_hist",
    (s, d) => events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_events")),
    Some("WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events " +
      "FROM events GROUP BY 1) " +
      "SELECT n_events, CAST(count(*) AS BIGINT) AS n_users FROM u " +
      "GROUP BY 1 ORDER BY 1")
  )

  /** Hour-of-day × event-type profile with exact decimal value sums —
    * the seasonality fingerprint behind anomaly alerts. One grouped
    * aggregate; UTC session TZ keeps `hour()` identical across engines. */
  private val hourlyProfile = QDef(
    "hourly_profile",
    (s, d) => events(s, d)
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("hour_of_day"), col("event_type")),
    Some("SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour_of_day, event_type, " +
      "CAST(count(*) AS BIGINT) AS n_events, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2")
  )

  /** Day-over-day volume anomaly monitor: per event type, the daily
    * count series' sample mean/std (from exact integer moment sums,
    * double finishing arithmetic written identically in the oracle) and
    * the number of days beyond 2σ — the "did ingest volume spike or
    * die" alert. Daily counts are one grouped aggregate; the per-type
    * stats table is |types| rows (broadcast back for the flag count). */
  private val dailyAnomaly = QDef(
    "daily_anomaly",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val moments = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("_s"), sum(col("c") * col("c")).as("_ss"))
      val nd = col("n_days").cast(DoubleType)
      val sd = col("_s").cast(DoubleType)
      val ssd = col("_ss").cast(DoubleType)
      val stats = moments.select(
        col("event_type"), col("n_days"),
        (sd / nd).as("mean_daily"),
        sqrt((nd * ssd - sd * sd) / (nd * (nd - lit(1.0)))).as("std_daily"))
      daily.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(
          min(col("n_days")).as("n_days"),
          min(col("mean_daily")).as("mean_daily"),
          min(col("std_daily")).as("std_daily"),
          count(when(abs(col("c").cast(DoubleType) - col("mean_daily"))
            > lit(2.0) * col("std_daily"), 1)).as("n_anomalous_days"))
        .orderBy(col("event_type"))
    },
    Some("WITH daily AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
      "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), " +
      "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, " +
      "CAST(sum(c) AS DOUBLE) AS sd, CAST(sum(c*c) AS DOUBLE) AS ssd " +
      "FROM daily GROUP BY 1), " +
      "st AS (SELECT event_type, n_days, sd / CAST(n_days AS DOUBLE) AS mean_daily, " +
      "sqrt((CAST(n_days AS DOUBLE) * ssd - sd * sd) / " +
      "(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))) AS std_daily FROM m) " +
      "SELECT daily.event_type, min(n_days) AS n_days, " +
      "min(mean_daily) AS mean_daily, min(std_daily) AS std_daily, " +
      "CAST(count(CASE WHEN abs(CAST(c AS DOUBLE) - mean_daily) > 2.0 * std_daily " +
      "THEN 1 END) AS BIGINT) AS n_anomalous_days " +
      "FROM daily JOIN st USING (event_type) GROUP BY 1 ORDER BY 1")
  )

  /** Correlation / least-squares regression per group, computed from
    * EXACT decimal moment sums (Σx, Σy, Σxy, Σx², Σy² — one map-side-
    * combined aggregate, one exchange) with the final corr/slope/
    * intercept arithmetic done in doubles using the IDENTICAL expression
    * tree the oracle SQL spells out: every IEEE op (+,-,*,/ and sqrt) is
    * correctly rounded, so exact-decimal inputs + a fixed evaluation
    * order give bit-identical doubles across engines — the same
    * determinism recipe as `unigram_quality`. (Built-in `corr`/`regr_*`
    * stream doubles in engine-specific order and cannot hash-match.)
    * At 100 TB swap DECIMAL(18,2) inputs for wider precision before the
    * (38,4) sum bound binds; the plan shape is unchanged. */
  private val statsCorr = QDef(
    "stats_corr",
    (s, d) => {
      val x = col("l_quantity").cast(DecimalType(18, 2))
      val y = col("l_extendedprice").cast(DecimalType(18, 2))
      val moments = lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("_sx"), sum(y).as("_sy"), sum(x * y).as("_sxy"),
          sum(x * x).as("_sxx"), sum(y * y).as("_syy"))
      val nd = col("n").cast(DoubleType)
      val sx = col("_sx").cast(DoubleType)
      val sy = col("_sy").cast(DoubleType)
      val sxy = col("_sxy").cast(DoubleType)
      val sxx = col("_sxx").cast(DoubleType)
      val syy = col("_syy").cast(DoubleType)
      val covn = nd * sxy - sx * sy
      val varx = nd * sxx - sx * sx
      val vary = nd * syy - sy * sy
      moments.select(
        col("l_returnflag"), col("n"),
        (covn / (sqrt(varx) * sqrt(vary))).as("corr_qty_price"),
        (covn / varx).as("slope"),
        ((sy - (covn / varx) * sx) / nd).as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some("WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, " +
      "CAST(sum(x*y) AS DOUBLE) AS sxy, CAST(sum(x*x) AS DOUBLE) AS sxx, " +
      "CAST(sum(y*y) AS DOUBLE) AS syy FROM (SELECT l_returnflag, " +
      "CAST(l_quantity AS DECIMAL(18,2)) AS x, " +
      "CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem) GROUP BY 1) " +
      "SELECT l_returnflag, n, " +
      "(CAST(n AS DOUBLE)*sxy - sx*sy) / " +
      "(sqrt(CAST(n AS DOUBLE)*sxx - sx*sx) * sqrt(CAST(n AS DOUBLE)*syy - sy*sy)) " +
      "AS corr_qty_price, " +
      "(CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx) AS slope, " +
      "(sy - ((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)) * sx) " +
      "/ CAST(n AS DOUBLE) AS intercept " +
      "FROM m ORDER BY l_returnflag")
  )

  /** Per-group higher-moment statistics (mean, population sd, skewness,
    * non-excess kurtosis) from EXACT integer power sums — the
    * one-pass-decomposable formulation (raw moments commute with
    * partial aggregation, so map-side combine applies; a Welford-style
    * streaming pass would not be reduction-order-stable). l_quantity is
    * integral (SchemaContract-checked at read via the BIGINT cast), so
    * q..q⁴ sums in DECIMAL(38,0) are exact at any scale and the double
    * finishing arithmetic bit-matches the oracle's identical tree. */
  private val statsMoments = QDef(
    "stats_moments",
    (s, d) => {
      val q = col("l_quantity").cast(LongType)
      def dec(c: Column): Column = c.cast(DecimalType(38, 0))
      val sums = lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(q)).as("_s1"), sum(dec(q * q)).as("_s2"),
          sum(dec(q * q * q)).as("_s3"), sum(dec(q * q * q * q)).as("_s4"))
      val n = col("n")
      val mean = col("_s1").cast(DoubleType) / n
      val ex2 = col("_s2").cast(DoubleType) / n
      val ex3 = col("_s3").cast(DoubleType) / n
      val ex4 = col("_s4").cast(DoubleType) / n
      val vr = ex2 - mean * mean
      sums.select(
        col("l_returnflag"), n,
        mean.as("mean"), sqrt(vr).as("sd"),
        ((ex3 - lit(3.0) * mean * ex2 + lit(2.0) * mean * mean * mean) /
          (vr * sqrt(vr))).as("skewness"),
        ((ex4 - lit(4.0) * mean * ex3 + lit(6.0) * mean * mean * ex2 -
          lit(3.0) * mean * mean * mean * mean) / (vr * vr)).as("kurtosis"))
        .orderBy(col("l_returnflag"))
    },
    Some("WITH s AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS s1, " +
      "CAST(sum(CAST(q*q AS DECIMAL(38,0))) AS DOUBLE) AS s2, " +
      "CAST(sum(CAST(q*q*q AS DECIMAL(38,0))) AS DOUBLE) AS s3, " +
      "CAST(sum(CAST(q*q*q*q AS DECIMAL(38,0))) AS DOUBLE) AS s4 " +
      "FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem) " +
      "GROUP BY 1), " +
      "m AS (SELECT l_returnflag, n, s1 / n AS mean, s2 / n AS ex2, " +
      "s3 / n AS ex3, s4 / n AS ex4 FROM s), " +
      "v AS (SELECT *, ex2 - mean * mean AS var FROM m) " +
      "SELECT l_returnflag, n, mean, sqrt(var) AS sd, " +
      "(ex3 - 3.0 * mean * ex2 + 2.0 * mean * mean * mean) / " +
      "(var * sqrt(var)) AS skewness, " +
      "(ex4 - 4.0 * mean * ex3 + 6.0 * mean * mean * ex2 - " +
      "3.0 * mean * mean * mean * mean) / (var * var) AS kurtosis " +
      "FROM v ORDER BY l_returnflag")
  )

  /** Per-group z-score normalization ([[graft.functions.Normalize
    * .zscore]]) of event values by event type: exact decimal moment
    * sums, broadcast stats join-back, bit-matching IEEE finishing. */
  private val zscoreNorm = QDef(
    "zscore_norm",
    (s, d) => graft.functions.Normalize
      .zscore(events(s, d), "event_type", "value", Seq("event_id"))
      .orderBy(col("event_id")),
    Some("WITH s AS (SELECT event_type, CAST(count(value) AS BIGINT) AS n, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2 " +
      "FROM events GROUP BY 1), " +
      "m AS (SELECT event_type, s1 / n AS mean, " +
      "sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sd FROM s) " +
      "SELECT event_id, e.event_type AS event_type, " +
      "(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) - mean) / NULLIF(sd, 0) AS z " +
      "FROM events e JOIN m ON e.event_type = m.event_type " +
      "ORDER BY event_id")
  )

  /** Robust per-group scaling ([[graft.functions.Normalize
    * .robustScale]]): (x − median) / IQR with discrete quartiles —
    * the outlier-immune sibling of `zscore_norm`, same broadcast
    * join-back shape. */
  private val robustScaleQ = QDef(
    "robust_scale",
    (s, d) => graft.functions.Normalize
      .robustScale(events(s, d), "event_type", "value", Seq("event_id"))
      .orderBy(col("event_id")),
    Some("WITH r AS (SELECT event_type, value AS v, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn, " +
      "count(*) OVER (PARTITION BY event_type) AS n " +
      "FROM events WHERE value IS NOT NULL), " +
      "s AS (SELECT event_type, " +
      "min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25, " +
      "min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50, " +
      "min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75 " +
      "FROM r GROUP BY 1) " +
      "SELECT event_id, e.event_type AS event_type, " +
      "CASE WHEN p75 <> p25 THEN (value - p50) / (p75 - p25) END AS robust_z " +
      "FROM events e JOIN s ON e.event_type = s.event_type " +
      "ORDER BY event_id")
  )

  /** Global percent-rank normalization ([[graft.functions.Normalize
    * .rankTransform]]): distribution-free [0,1] mapping with SQL
    * percent_rank tie semantics — range-shuffle two-pass over the
    * distinct-value table, never a single-partition global window. */
  private val rankTransformQ = QDef(
    "rank_transform",
    (s, d) => graft.functions.Normalize
      .rankTransform(events(s, d), "value", Seq("event_id"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, value, " +
      "percent_rank() OVER (ORDER BY value) AS pct_rank " +
      "FROM events WHERE value IS NOT NULL ORDER BY event_id")
  )

  /** Activity quartile segmentation ([[graft.functions.EventStats
    * .activityQuartiles]]): users bucketed 1–4 against the exact global
    * quartiles of the per-user event-count distribution. */
  private val userQuartilesQ = QDef(
    "user_quartiles",
    (s, d) => graft.functions.EventStats
      .activityQuartiles(events(s, d), "user_id")
      .orderBy(col("user_id")),
    Some("WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events " +
      "FROM events GROUP BY 1), " +
      "b AS (SELECT quantile_cont(n_events, 0.25) AS p25, " +
      "quantile_cont(n_events, 0.5) AS p50, " +
      "quantile_cont(n_events, 0.75) AS p75 FROM uc) " +
      "SELECT user_id, n_events, " +
      "CAST(1 + CASE WHEN n_events > p25 THEN 1 ELSE 0 END " +
      "+ CASE WHEN n_events > p50 THEN 1 ELSE 0 END " +
      "+ CASE WHEN n_events > p75 THEN 1 ELSE 0 END AS INT) AS quartile " +
      "FROM uc CROSS JOIN b ORDER BY user_id")
  )

  /** Conversion rate by activity segment: [[graft.functions.EventStats
    * .activityQuartiles]] composed with a purchase semi-flag — the
    * "do heavy users convert more" analyst query; quartile table is
    * user-sized, output 4 rows. */
  private val segmentConversionQ = QDef(
    "segment_conversion",
    (s, d) => {
      val ev = events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct().withColumn("_c", lit(1))
      graft.functions.EventStats.activityQuartiles(ev, "user_id")
        .join(conv, Seq("user_id"), "left")
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("_c").isNotNull, 1L).otherwise(0L)).as("n_converted"))
        .withColumn("conv_rate",
          col("n_converted").cast("double") / col("n_users"))
        .orderBy(col("quartile"))
    },
    Some("WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events " +
      "FROM events GROUP BY 1), " +
      "b AS (SELECT quantile_cont(n_events, 0.25) AS p25, " +
      "quantile_cont(n_events, 0.5) AS p50, " +
      "quantile_cont(n_events, 0.75) AS p75 FROM uc), " +
      "qa AS (SELECT user_id, " +
      "CAST(1 + CASE WHEN n_events > p25 THEN 1 ELSE 0 END " +
      "+ CASE WHEN n_events > p50 THEN 1 ELSE 0 END " +
      "+ CASE WHEN n_events > p75 THEN 1 ELSE 0 END AS INT) AS quartile " +
      "FROM uc CROSS JOIN b), " +
      "cv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') " +
      "SELECT quartile, CAST(count(*) AS BIGINT) AS n_users, " +
      "CAST(sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_converted, " +
      "CAST(sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) " +
      "/ count(*) AS conv_rate " +
      "FROM qa LEFT JOIN cv ON qa.user_id = cv.user_id " +
      "GROUP BY 1 ORDER BY 1")
  )

  /** Last-touch attribution ([[graft.functions.EventStats
    * .lastTouchAttribution]]): purchases credited to the user's most
    * recent prior click/view — the as-of lookup as ONE per-user window
    * pass, no self-join; organic purchases (no prior touch) keep NULL
    * attribution. */
  private val attributionQ = QDef(
    "attribution",
    (s, d) => graft.functions.EventStats.lastTouchAttribution(
      events(s, d), "user_id", "event_type", "ts", "event_id",
      convType = "purchase", touchTypes = Seq("click", "view"))
      .orderBy(col("conv_id")),
    Some("WITH a AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
      "last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS) " +
      "OVER w AS touch_id, " +
      "last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS) " +
      "OVER w AS touch_type, " +
      "last_value(CASE WHEN event_type IN ('click', 'view') THEN CAST(ts AS TIMESTAMP) END " +
      "IGNORE NULLS) OVER w AS touch_ts " +
      "FROM events WINDOW w AS (PARTITION BY user_id " +
      "ORDER BY CAST(ts AS TIMESTAMP), event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
      "SELECT user_id, event_id AS conv_id, ts AS conv_ts, " +
      "touch_id, touch_type, touch_ts, " +
      "CAST(epoch_us(ts) - epoch_us(touch_ts) AS BIGINT) AS lag_us " +
      "FROM a WHERE event_type = 'purchase' ORDER BY conv_id")
  )

  /** Exact cumulative distinct users per day ([[graft.functions
    * .EventStats.cumulativeDistinctUsers]]): first-occurrence trick (one
    * user-key shuffle) + two-pass bucketed running sum — never a
    * partition-less window, never a per-day distinct recount. Oracle
    * replays the same first-day definition with a window cumsum, fine at
    * oracle scale. */
  private val dauCumulative = QDef(
    "dau_cumulative",
    (s, d) => graft.functions.EventStats
      .cumulativeDistinctUsers(events(s, d), "user_id", "ts")
      .orderBy(col("day")),
    Some("WITH fd AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day " +
      "FROM events GROUP BY 1), " +
      "nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM fd GROUP BY 1), " +
      "days AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events) " +
      "SELECT days.day, COALESCE(nu.new_users, 0) AS new_users, " +
      "CAST(sum(COALESCE(nu.new_users, 0)) OVER (ORDER BY days.day) AS BIGINT) AS cum_users " +
      "FROM days LEFT JOIN nu USING (day) ORDER BY day")
  )

  /** Rolling 7-day distinct active users ([[graft.functions.EventStats
    * .rollingActiveUsers]]): contribute-then-dedup (distinct user-days →
    * ×7 replication → two-phase countDistinct) — rolling COUNT(DISTINCT)
    * does not decompose as a running sum, and the naive per-day recount
    * re-scans history O(days) times. Oracle: interval self-join recount,
    * fine at oracle scale. */
  private val wauRolling = QDef(
    "wau_rolling",
    (s, d) => graft.functions.EventStats
      .rollingActiveUsers(events(s, d), "user_id", "ts", windowDays = 7)
      .orderBy(col("day")),
    Some("WITH ud AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events), " +
      "days AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events) " +
      "SELECT days.day, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS active_users " +
      "FROM days JOIN ud ON ud.day BETWEEN days.day - 6 AND days.day " +
      "GROUP BY 1 ORDER BY 1")
  )

  /** Next-event transition matrix ([[graft.functions.EventStats
    * .transitionCounts]]): per-user lead window (one user-key exchange,
    * event_id tie-break for total order) → |types|²-sized count table. */
  private val eventTransitions = QDef(
    "event_transitions",
    (s, d) => graft.functions.EventStats
      .transitionCounts(events(s, d), "user_id", "event_type", "ts", "event_id")
      .orderBy(col("from_type"), col("to_type")),
    Some("WITH t AS (SELECT user_id, event_type AS from_type, " +
      "lead(event_type) OVER (PARTITION BY user_id " +
      "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type FROM events) " +
      "SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions " +
      "FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2")
  )

  /** Activity streaks ([[graft.functions.EventStats.activityStreaks]]):
    * gaps-and-islands per user — active days, streak count, longest
    * consecutive-day run. */
  private val userStreaks = QDef(
    "user_streaks",
    (s, d) => graft.functions.EventStats
      .activityStreaks(events(s, d), "user_id", "ts")
      .orderBy(col("user_id")),
    Some("WITH dd AS (SELECT DISTINCT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
      "i AS (SELECT user_id, day, (day - DATE '1970-01-01') - " +
      "row_number() OVER (PARTITION BY user_id ORDER BY day) AS island FROM dd), " +
      "s AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2) " +
      "SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days, " +
      "CAST(count(*) AS BIGINT) AS n_streaks, " +
      "CAST(max(len) AS BIGINT) AS longest_streak " +
      "FROM s GROUP BY user_id ORDER BY user_id")
  )

  /** Inter-arrival cadence ([[graft.functions.EventStats
    * .interArrivalStats]]): per-type same-user gap stats in seconds;
    * exact long micro sums, one final divide in both engines. */
  private val interarrivalStats = QDef(
    "interarrival_stats",
    (s, d) => graft.functions.EventStats
      .interArrivalStats(events(s, d), "user_id", "event_type", "ts", "event_id")
      .orderBy(col("event_type")),
    Some("WITH g AS (SELECT event_type, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) " +
      "OVER (PARTITION BY user_id, event_type " +
      "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap FROM events) " +
      "SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps, " +
      "(CAST(sum(gap) AS DOUBLE) / count(*)) / 1000000.0 AS mean_gap_s, " +
      "CAST(min(gap) AS DOUBLE) / 1000000.0 AS min_gap_s, " +
      "CAST(max(gap) AS DOUBLE) / 1000000.0 AS max_gap_s " +
      "FROM g WHERE gap IS NOT NULL GROUP BY event_type ORDER BY event_type")
  )

  /** Two-proportion A/B z-test ([[graft.functions.EventStats.abTestZ]]):
    * arms by user_id parity, conversion = any purchase with value > 150
    * (≈45% at the testdata scales — non-degenerate by construction). */
  private val abtestZ = QDef(
    "abtest_z",
    (s, d) => graft.functions.EventStats
      .abTestZ(events(s, d), "user_id", "event_type", "value", "purchase", 150.0),
    Some("WITH u AS (SELECT user_id, " +
      "max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS conv " +
      "FROM events GROUP BY 1), " +
      // ((x % 2) + 2) % 2 = Spark's pmod: both engines' bare % keep the
      // dividend's sign, so the positive-modulus form must be spelled out
      // on both sides for negative (signed-hash) user ids
      "a AS (SELECT " +
      "CAST(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
      "CAST(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
      "CAST(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv0, " +
      "CAST(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv1 FROM u) " +
      "SELECT n0, n1, conv0, conv1, " +
      "CAST(conv0 AS DOUBLE) / n0 AS p0, CAST(conv1 AS DOUBLE) / n1 AS p1, " +
      "((CAST(conv1 AS DOUBLE) / n1) - (CAST(conv0 AS DOUBLE) / n0)) / " +
      "sqrt((CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1)) * " +
      "(CAST(1 AS DOUBLE) - CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1)) * " +
      "(CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)) AS z " +
      "FROM a")
  )

  /** Day-over-day churn ([[graft.functions.EventStats.dailyChurn]]):
    * active-on-d users who did not return on d+1, per day. */
  private val churnDaily = QDef(
    "churn_daily",
    (s, d) => graft.functions.EventStats
      .dailyChurn(events(s, d), "user_id", "ts")
      .orderBy(col("day")),
    Some("WITH ud AS (SELECT DISTINCT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
      "w AS (SELECT day, count(*) AS actives FROM ud GROUP BY 1), " +
      "ret AS (SELECT a.day, count(*) AS retained FROM ud a JOIN ud b " +
      "ON a.user_id = b.user_id AND b.day = a.day + 1 GROUP BY 1) " +
      "SELECT w.day AS day, CAST(actives AS BIGINT) AS actives, " +
      "CAST(coalesce(retained, 0) AS BIGINT) AS retained, " +
      "CAST(actives - coalesce(retained, 0) AS BIGINT) AS churned, " +
      "CAST(actives - coalesce(retained, 0) AS DOUBLE) / actives AS churn_rate " +
      "FROM w LEFT JOIN ret ON w.day = ret.day " +
      // ANY later event day (not day+1 specifically): a calendar gap must
      // not delete the interior 100%-churn rows — same rule as the Spark op
      "WHERE EXISTS (SELECT 1 FROM w w2 WHERE w2.day > w.day) " +
      "ORDER BY day")
  )

  /** Join-key skew diagnostic ([[graft.functions.Profile.keySkew]]) over
    * the lineitem part key. */
  private val keySkewQ = QDef(
    "key_skew",
    (s, d) => graft.functions.Profile
      .keySkew(lineitem(s, d), "l_partkey", k = 20),
    Some("WITH t AS (SELECT l_partkey AS key, count(*) AS n " +
      "FROM lineitem GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM t) " +
      "SELECT key, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) / total AS share " +
      "FROM t CROSS JOIN tot ORDER BY n DESC, key LIMIT 20")
  )

  val all: Seq[QDef] = Seq(joinBroadcast, joinLarge, joinAnti, joinSemi,
    windowTopK, joinAsof, joinAsofTol, joinRange, rollupAgg, distinctCountAgg,
    pivotAgg, windowMoving,
    quantileAgg, quantileDist, approxAgg, approxAggBounds, cubeAgg,
    setIntersect, setExcept, jsonExtract, q3Shipping, q5LocalSupplier,
    q17SmallQty, q2MinPrice, q18BigOrders, q20QtySuppliers, joinBloom,
    joinSalted, groupingSets, q6Forecast, q4Priority, q14Promo, groupbyMode,
    statsCorr, dauCumulative, eventTransitions, wauRolling, joinAsofFwd,
    quantileGroup, outlierMad, topPathsQ, joinInterval,
    langMix, userActivityHist, hourlyProfile, dailyAnomaly,
    userStreaks, interarrivalStats, abtestZ, churnDaily, keySkewQ,
    statsMoments, zscoreNorm, attributionQ, robustScaleQ, userQuartilesQ,
    rankTransformQ, segmentConversionQ)
}
