package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Queries.QDef
import graft.Tables._

/** Second batch of TPC-H-shaped relational queries (Q7/Q9/Q10/Q13/Q16/
  * Q19/Q21/Q22 shapes), adapted to the driver's reduced TPC-H schema
  * (no partsupp, no commit/receipt dates, no ship mode/instruct — the
  * adapted predicate is documented per query). Together with Rel's
  * Q1-Q6/Q14/Q17/Q18/Q20 shapes these cover every distinct PLAN SHAPE in
  * the TPC-H suite: multi-dim star joins, left-outer distribution,
  * derived-table distinct aggregation, disjunctive pushdown, correlated
  * EXISTS/NOT EXISTS decorrelated to semi/anti joins, and scalar-subquery
  * cross filters.
  *
  * Money arithmetic goes through DECIMAL(18,2) in both engines (exact,
  * reduction-order-invariant) and is cast back to DOUBLE only at the end —
  * the oracle-parity convention the whole registry follows.
  */
object Tpch {

  private def revenue = sum(col("l_extendedprice").cast(DecimalType(18, 2))
    * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
    .cast(DoubleType).as("revenue")

  private val revenueSql = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue"

  /** TPC-H Q7-shaped nation-to-nation volume: revenue per (supplier
    * nation, customer nation, ship year) over ALL nation pairs (the
    * two-nation filter of stock Q7 is dropped — the full 25×25 pair grid
    * is harder on the join planner and the output is still ≤ pairs×years
    * rows). Plan: facts shuffle on l_orderkey once; both nation hops are
    * constant-size broadcasts; the aggregate output is O(n²·years) —
    * bounded regardless of fact size. */
  private val q7NationVolume = QDef(
    "q7_nation_volume",
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
      .join(broadcast(nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenue)
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year")),
    Some("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "CAST(year(l_shipdate) AS INTEGER) AS l_year, " + revenueSql + " " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")
  )

  /** TPC-H Q9-shaped product-type profit (adapted: the schema has no
    * partsupp, so profit = revenue without the supplycost term): revenue
    * of parts whose name contains 'ring', by supplier nation and ship
    * year. The LIKE filter prunes part BEFORE its broadcast ships. */
  private val q9Profit = QDef(
    "q9_profit",
    (s, d) => lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_name").contains("ring"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"),
        year(col("l_shipdate")).as("o_year"))
      .agg(revenue)
      .orderBy(col("nation_name"), col("o_year").desc),
    Some("SELECT n_name AS nation_name, " +
      "CAST(year(l_shipdate) AS INTEGER) AS o_year, " + revenueSql + " " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%ring%' " +
      "GROUP BY 1, 2 ORDER BY nation_name, o_year DESC")
  )

  /** TPC-H Q10-shaped returned-item report: top-20 customers by revenue
    * lost to returns in a one-year window. Facts shuffle on l_orderkey;
    * the customer join shuffles on o_custkey (customer is the grouping
    * dimension, large at scale — NOT broadcast); nation broadcasts. */
  private val q10Returned = QDef(
    "q10_returned",
    (s, d) => lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20),
    Some("SELECT c_custkey, c_name, c_acctbal, n_name, " + revenueSql + " " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE l_returnflag = 'R' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20")
  )

  /** TPC-H Q13-shaped customer order-count distribution: LEFT OUTER join
    * (customers with zero matching orders must survive with count 0) with
    * a predicate in the join condition, then a second aggregate over the
    * first's output. The outer join shuffles on custkey; the distribution
    * aggregate's input is O(customers) and its output O(distinct counts). */
  private val q13OrderDist = QDef(
    "q13_order_dist",
    (s, d) => customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (" +
      "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
      "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC")
  )

  /** TPC-H Q16-shaped supplier count (adapted: no partsupp table — the
    * distinct (l_partkey, l_suppkey) pairs of lineitem stand in for it):
    * distinct suppliers per (brand, type, size) for a size IN-list,
    * excluding one brand. The derived-distinct-then-count-distinct shape:
    * pair dedup is one shuffle on (partkey, suppkey); the count-distinct
    * re-shuffles on the group key (Spark plans it as two aggregates). */
  private val q16SupplierCnt = QDef(
    "q16_supplier_cnt",
    (s, d) => lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(part(s, d)
        .filter(col("p_brand") =!= "Brand#1"
          && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size")),
    Some("SELECT p_brand, p_type, p_size, " +
      "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
      "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) " +
      "JOIN part ON l_partkey = p_partkey " +
      "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49) " +
      "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")
  )

  /** TPC-H Q19-shaped disjunctive-predicate revenue: OR of three
    * brand×size×quantity conjunctions across a join. The disjunction
    * references both sides, so it can only be applied post-join — but the
    * per-side prunable parts (brand IN, size ≤ max) do push to the scans;
    * the shape exercises exactly that split. */
  private val q19Disjunctive = QDef(
    "q19_disjunctive",
    (s, d) => lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(revenue),
    Some("SELECT " + revenueSql + " " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 " +
      " AND l_quantity BETWEEN 1 AND 11) " +
      "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 " +
      " AND l_quantity BETWEEN 10 AND 20) " +
      "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 " +
      " AND l_quantity BETWEEN 20 AND 30)")
  )

  /** TPC-H Q21-shaped waiting-supplier count (adapted: no receipt/commit
    * dates — `l_returnflag = 'R'` stands in for "delivered late"):
    * suppliers whose lineitem is the ONLY late one in a multi-supplier
    * finished order. The correlated EXISTS decorrelates to a left-semi
    * join and the NOT EXISTS to a left-anti join, both on l_orderkey with
    * a suppkey-inequality residual — three scans of lineitem co-shuffled
    * on the same key, so at scale the exchange is reused across all
    * three (one shuffle of the fact, not three). */
  private val q21Waiting = QDef(
    "q21_waiting",
    (s, d) => {
      val li = lineitem(s, d)
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"),
          col("l_suppkey").as("l3_suppkey"))
      l1
        .join(orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("l2_orderkey")
          && col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey")
          && col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("SELECT s_name, CAST(count(*) AS BIGINT) AS numwait " +
      "FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey " +
      "WHERE l1.l_returnflag = 'R' " +
      "AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey " +
      " AND o_orderstatus = 'F') " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 " +
      " WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
      " WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
      " AND l3.l_returnflag = 'R') " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100")
  )

  /** TPC-H Q22-shaped dormant high-balance customers (adapted: "no
    * orders" finds nobody in this data — every customer ordered — so the
    * anti-join predicate is "no URGENT order"): customers with balance
    * above the positive-balance average and no urgent orders, by nation
    * key. The scalar subquery is a 1-row aggregate cross-joined (broadcast
    * by construction); the NOT EXISTS is a left-anti join on o_custkey.
    * The average divides an exact DECIMAL sum by the count, so the
    * threshold is bit-identical across engines. */
  private val q22Opportunity = QDef(
    "q22_opportunity",
    (s, d) => {
      val avgBal = customer(s, d).filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType)
          / count(lit(1))).as("avg_bal"))
      customer(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },
    Some("SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust, " +
      "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
      "FROM customer, (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) " +
      " AS DOUBLE) / count(*) AS avg_bal FROM customer WHERE c_acctbal > 0) " +
      "WHERE c_acctbal > avg_bal " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      " AND o_orderpriority = '1-URGENT') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey")
  )

  /** TPC-H Q8-shaped market share: one nation's fraction of the revenue
    * that ASIA-region customers spent on STANDARD-type parts, per order
    * year. Shape: star join with two nation hops + conditional aggregation
    * whose ratio is a per-group scalar divide. The numerator/denominator
    * are exact DECIMAL sums, divided only after the cast to DOUBLE — one
    * IEEE divide of identical operands in both engines. */
  private val q8MarketShare = QDef(
    "q8_market_share",
    (s, d) => {
      val volDec = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("c_nk"),
          col("n_regionkey"))), col("c_nationkey") === col("c_nk"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(part(s, d).filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_7", volDec))
          .cast(DoubleType) /
          sum(volDec).cast(DoubleType)).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
      "CAST(sum(CASE WHEN n2.n_name = 'NATION_7' THEN " +
      "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) / " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA' " +
      "JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD' " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "GROUP BY 1 ORDER BY o_year")
  )

  /** TPC-H Q11-shaped important stock (adapted: the schema has no
    * partsupp, so part "value" is its lineitem revenue): parts whose
    * revenue exceeds 1.5× the mean part revenue. Stock Q11's fixed
    * fraction-of-total threshold goes degenerate as part count grows
    * (0 survivors at sf0.1); a mean multiple is scale-free. Shape:
    * aggregate filtered against a global scalar subquery — the scalar
    * lands as a 1-row broadcast cross join, never a shuffle. Threshold
    * compare happens in DOUBLE on both sides from exact DECIMAL sums,
    * with matching operator order (1.5*total)/n in both engines. */
  private val q11ImportantStock = QDef(
    "q11_important_stock",
    (s, d) => {
      val volDec = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
      val partVal = lineitem(s, d).groupBy(col("l_partkey"))
        .agg(sum(volDec).as("_value_dec"))
      val total = partVal.agg(sum(col("_value_dec")).as("_total_dec"),
        count(lit(1)).as("_n_parts"))
      partVal.crossJoin(broadcast(total))
        .filter(col("_value_dec").cast(DoubleType) >
          lit(1.5) * col("_total_dec").cast(DoubleType) / col("_n_parts"))
        .select(col("l_partkey"),
          col("_value_dec").cast(DoubleType).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
    Some("WITH pv AS (SELECT l_partkey, " +
      "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS vd " +
      "FROM lineitem GROUP BY 1), " +
      "t AS (SELECT sum(vd) AS td, count(*) AS n FROM pv) " +
      "SELECT l_partkey, CAST(vd AS DOUBLE) AS part_value FROM pv, t " +
      "WHERE CAST(vd AS DOUBLE) > 1.5 * CAST(td AS DOUBLE) / n " +
      "ORDER BY part_value DESC, l_partkey")
  )

  /** TPC-H Q12-shaped shipping-priority audit (adapted: no ship mode or
    * receipt date in the schema — l_linestatus stands in as the mode
    * class, and "late" means shipped more than 90 days after the order
    * date): per class, count lines from high- vs low-priority orders.
    * Shape: fact-fact join + CASE-conditional aggregation. */
  private val q12ShipModes = QDef(
    "q12_ship_modes",
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT"
          || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT"
          && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus")),
    Some("SELECT l_linestatus, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY " +
      "GROUP BY l_linestatus ORDER BY l_linestatus")
  )

  /** TPC-H Q15-shaped top supplier: the supplier(s) with maximum revenue
    * over a 3-month window — the view-plus-max-of-aggregate shape. The
    * max lands as a 1-row broadcast; revenue equality is tested on the
    * exact DECIMAL sum (cross-engine-safe, unlike a double ==). */
  private val q15TopSupplier = QDef(
    "q15_top_supplier",
    (s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .as("_rev_dec"))
      val maxRev = rev.agg(max(col("_rev_dec")).as("_max_rev"))
      rev.join(broadcast(maxRev), col("_rev_dec") === col("_max_rev"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("_rev_dec").cast(DoubleType).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("WITH r AS (SELECT l_suppkey, " +
      "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS rd " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) " +
      "SELECT s_suppkey, s_name, CAST(rd AS DOUBLE) AS total_revenue " +
      "FROM r JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE rd = (SELECT max(rd) FROM r) ORDER BY s_suppkey")
  )

  val all: Seq[QDef] = Seq(q7NationVolume, q9Profit, q10Returned,
    q13OrderDist, q16SupplierCnt, q19Disjunctive, q21Waiting, q22Opportunity,
    q8MarketShare, q11ImportantStock, q12ShipModes, q15TopSupplier)
}
