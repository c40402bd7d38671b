package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Frame._
import graft.operators.{Frame, Grouped}

/** One named query per implemented operator (SURVEY.md §2 "query key"
  * column), each with equivalent ANSI SQL for the driver's DuckDB oracle.
  *
  * Oracle-parity conventions (SURVEY §7.4, FIXTURES.md):
  *  - every query ends in an explicit total-order `orderBy` (ties broken by
  *    enough columns that equal rows are interchangeable);
  *  - aggregate sums/means over 2-decimal money columns go through
  *    `DECIMAL(18,2)` in BOTH engines → bit-identical results regardless of
  *    reduction order (plain double summation is reduction-tree-dependent);
  *  - per-row double arithmetic (e.g. `price * (1 - discount)`) is IEEE-
  *    deterministic and needs no rounding;
  *  - int/long sums are cast to BIGINT in DuckDB (its int sums widen to
  *    HUGEINT, Spark's to LONG);
  *  - aliases match exactly between the Spark plan and the SQL (the driver
  *    sorts columns by name before hashing).
  */
object Queries {

  final case class QDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String]
  )

  import Tables._

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- core

  /** §2.1 #1 fromTable / scan: identity read of lineitem. */
  private val scanParquet = QDef(
    "scan_parquet",
    (s, d) => lineitem(s, d).sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber")
  )

  /** §2.1 #1 fromTable — the delimited-text front door, round-tripped
    * through the CSV sink and re-read with the strict FAILFAST parse
    * (reference `dataframe.d:108-126` / `toCsv` `dataframe.d:128-149`).
    * The query WRITES the fixture it reads: nation goes out through
    * [[graft.sources.Io.writeCsv]] to a fixed path and comes back
    * through [[graft.sources.Io.readTable]] with the caller-supplied
    * schema (the reference's "you must know your types" contract); the
    * oracle reads the very same CSV files with DuckDB's `read_csv`
    * under the same explicit column types — so the whole sink→scan
    * round-trip is what the hash gate checks, not just the scan.
    *
    * The fixture path is FIXED within a run because `oracleSql` is a
    * static map (the SQL can't vary with sfDir), but it is derived from
    * ONE config point ([[fixtureRoot]] — `-Dgraft.fixture.dir`, default
    * `<user.dir>/target/graft_fixtures`) and templated into the SQL at
    * QDef construction, so any checkout location works. Publication is
    * write-once-then-atomic-rename ([[publishScanCsvFixture]]): the
    * fixture is staged under a salted sibling name and `ATOMIC_MOVE`d
    * onto the final dir, and an already-published dir is NEVER
    * rewritten — so concurrent runs (Verify racing Bench) can never
    * observe a delete-then-write window; the loser of a publish race
    * discards its staging dir. Content is run-invariant by
    * construction: nation is a fixed-size TPC-H dimension, the same 25
    * rows at every sf, so whichever racer publishes, every reader —
    * including the driver's later DuckDB compare — sees the same
    * logical rows. */
  private val fixtureRoot: String = sys.props.getOrElse(
    "graft.fixture.dir", s"${sys.props("user.dir")}/target/graft_fixtures")

  private[graft] val scanCsvDir = s"$fixtureRoot/scan_csv_fixture"

  /** Publish the nation CSV fixture at [[scanCsvDir]] exactly once per
    * path: stage under a salted sibling, then one `ATOMIC_MOVE` rename
    * onto the final name. If the final dir already exists (this run or
    * a concurrent one won), the staging dir is discarded — committed
    * fixture bytes are immutable for the life of the path. */
  private[graft] def publishScanCsvFixture(
      s: SparkSession, d: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val fin = Paths.get(scanCsvDir)
    if (Files.exists(fin)) return
    val salt = java.util.concurrent.ThreadLocalRandom.current()
      .nextLong(1L, Long.MaxValue)
    val tmp = Paths.get(s"${scanCsvDir}_stage_$salt")
    // best-effort staging reclaim — runs on the lost-race branch AND on
    // every failure path (writeCsv throw, genuine I/O error from the
    // move), so crashed runs never accumulate `_stage_<salt>` debris
    def discardStaging(): Unit =
      if (Files.exists(tmp)) {
        val walk = Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    try {
      val n = nation(s, d)
      graft.sources.Io.writeCsv(n, tmp.toString, sep = ",", writeHeader = true)
      try Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // rename refused: a concurrent publisher landed first. Same-rows
        // content by construction — drop our staging dir and read theirs.
        case e: java.nio.file.FileSystemException =>
          if (!Files.exists(fin)) throw e
          discardStaging()
      }
    } catch {
      case e: Throwable =>
        try discardStaging()
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  private val scanCsv = QDef(
    "scan_csv",
    (s, d) => {
      publishScanCsvFixture(s, d)
      graft.sources.Io
        .readTable(s, scanCsvDir, nation(s, d).schema, sep = ",",
          headerLines = 1)
        .orderBy(col("n_nationkey"))
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM " +
      s"read_csv('$scanCsvDir/*.csv', header=true, " +
      "delim=',', columns={'n_nationkey':'INTEGER','n_name':'VARCHAR'," +
      "'n_regionkey':'INTEGER'}) ORDER BY n_nationkey")
  )

  /** §2.1 #7 length/shape. */
  private val rowCount = QDef(
    "row_count",
    (s, d) => lineitem(s, d).agg(count(lit(1)).as("n_rows")),
    Some("SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem")
  )

  /** §2.1 #4 select!(col,"==") equality filter. */
  private val filterEq = QDef(
    "filter_eq",
    (s, d) => lineitem(s, d).filterCmp("l_returnflag", "==", "R")
      .sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT * FROM lineitem WHERE l_returnflag = 'R' " +
      "ORDER BY l_orderkey, l_linenumber")
  )

  /** §2.1 #4 select!(col,">") ordered-comparison filter. */
  private val filterCmpQ = QDef(
    "filter_cmp",
    (s, d) => lineitem(s, d).filterCmp("l_quantity", ">", 45.0)
      .sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT * FROM lineitem WHERE l_quantity > 45.0 " +
      "ORDER BY l_orderkey, l_linenumber")
  )

  /** §2.1 #20 boolean-mask filter df[mask] — mask and filter collapse into
    * one predicate (`dataframe.d:279-283,366-370`). */
  private val filterMask = QDef(
    "filter_mask",
    (s, d) => lineitem(s, d)
      .maskFilter(col("l_quantity") > 5.0 && col("l_discount") < 0.05)
      .sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT * FROM lineitem WHERE l_quantity > 5.0 AND l_discount < 0.05 " +
      "ORDER BY l_orderkey, l_linenumber")
  )

  /** §2.1 #5 getCol single-column projection. */
  private val projectCol = QDef(
    "project_col",
    (s, d) => lineitem(s, d).projectCol("l_orderkey").sortAsc(Seq("l_orderkey")),
    Some("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey")
  )

  /** §2.1 #15 subset!(cols) projection + reorder. */
  private val projectSubset = QDef(
    "project_subset",
    (s, d) => lineitem(s, d)
      .projectSubset(Seq("l_returnflag", "l_orderkey", "l_quantity"))
      .sortAsc(Seq("l_returnflag", "l_orderkey", "l_quantity")),
    Some("SELECT l_returnflag, l_orderkey, l_quantity FROM lineitem " +
      "ORDER BY l_returnflag, l_orderkey, l_quantity")
  )

  /** §2.1 #6 addNewCol!(int,"flag") — zero-initialized new column. */
  private val addColumn = QDef(
    "add_column",
    (s, d) => region(s, d).addZeroCol("flag", IntegerType)
      .sortAsc(Seq("r_regionkey")),
    Some("SELECT r_regionkey, r_name, 0 AS flag FROM region ORDER BY r_regionkey")
  )

  /** §2.1 #11 sort!(keys…) multi-key ascending sort. */
  private val sortMulti = QDef(
    "sort_multi",
    (s, d) => customer(s, d)
      .sortAsc(Seq("c_nationkey", "c_acctbal", "c_custkey")),
    Some("SELECT * FROM customer ORDER BY c_nationkey, c_acctbal, c_custkey")
  )

  /** §2.1 #12 sort() on every column in declaration order. */
  private val sortAllQ = QDef(
    "sort_all",
    (s, d) => nation(s, d).sortAll(),
    Some("SELECT * FROM nation ORDER BY n_nationkey, n_name, n_regionkey")
  )

  /** §2.1 #13 head(n). Deterministic: total order before limit. */
  private val limitHead = QDef(
    "limit_head",
    (s, d) => orders(s, d).sortAsc(Seq("o_orderkey")).headN(5),
    Some("SELECT * FROM orders ORDER BY o_orderkey LIMIT 5")
  )

  /** §2.1 #16 unique() whole-row distinct, sorted output (on the
    * subset+unique golden shape, `dataframe.d:359-360`). */
  private val distinctRows = QDef(
    "distinct_rows",
    (s, d) => lineitem(s, d)
      .projectSubset(Seq("l_returnflag", "l_linestatus")).distinctSorted(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
      "ORDER BY l_returnflag, l_linestatus")
  )

  /** §2.1 #24 free unique(range) — single-column distinct, sorted. */
  private val distinctCol = QDef(
    "distinct_col",
    (s, d) => orders(s, d).distinctColSorted("o_orderpriority"),
    Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority")
  )

  /** §2.1 #22 opOpAssign!"~" dataframe append = UNION ALL. */
  private val unionAll = QDef(
    "union_all",
    (s, d) => {
      val n = nation(s, d)
      n.filterCmp("n_nationkey", "<", 13)
        .appendAll(n.filterCmp("n_nationkey", ">=", 13))
        .sortAsc(Seq("n_nationkey"))
    },
    Some("SELECT * FROM nation WHERE n_nationkey < 13 " +
      "UNION ALL SELECT * FROM nation WHERE n_nationkey >= 13 " +
      "ORDER BY n_nationkey")
  )

  /** §2.1 #25 free concat(dfs…) — n-ary UNION ALL, duplicates kept. */
  private val concatQ = QDef(
    "concat",
    (s, d) => {
      val r = region(s, d)
      Frame.concat(Seq(
        r.filterCmp("r_regionkey", "<", 2),
        r.maskFilter(col("r_regionkey") >= 2 && col("r_regionkey") < 4),
        r.filterCmp("r_regionkey", ">=", 4)
      )).sortAsc(Seq("r_regionkey"))
    },
    Some("SELECT * FROM region WHERE r_regionkey < 2 " +
      "UNION ALL SELECT * FROM region WHERE r_regionkey >= 2 AND r_regionkey < 4 " +
      "UNION ALL SELECT * FROM region WHERE r_regionkey >= 4 " +
      "ORDER BY r_regionkey")
  )

  /** §2.1 #17 apply!(fun, col) scalar map over one column (reference
    * golden shape "a.pos * 2", `dataframe.d:357-358`) — as a Catalyst
    * expression, never a UDF. Keys kept for a well-defined result set. */
  private val applyCol = QDef(
    "apply_col",
    (s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 2.0).as("qty2"))
      .sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT l_orderkey, l_linenumber, l_quantity * 2.0 AS qty2 " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber")
  )

  /** §2.1 #18 apply!(fun) row-wise scalar map over multiple columns.
    * Per-row IEEE double arithmetic — deterministic, no rounding needed. */
  private val applyRow = QDef(
    "apply_row",
    (s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .sortAsc(Seq("l_orderkey", "l_linenumber")),
    Some("SELECT l_orderkey, l_linenumber, " +
      "l_extendedprice * (1 - l_discount) AS revenue " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber")
  )

  // ------------------------------------------------------------- grouped

  private val liKeys = Seq("l_returnflag", "l_linestatus")

  /** §2.2 #28 Groupby.count() — count column named exactly `count`. */
  private val groupbyCount = QDef(
    "groupby_count",
    (s, d) => Grouped.count(lineitem(s, d), liKeys),
    Some("SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS count " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus")
  )

  /** §2.2 #29 Groupby.first() — earliest row per group under an explicit
    * deterministic order (l_orderkey, l_linenumber). */
  private val groupbyFirst = QDef(
    "groupby_first",
    (s, d) => Grouped.firstRows(lineitem(s, d), liKeys,
      Seq("l_orderkey", "l_linenumber")),
    Some("SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, " +
      "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus " +
      "ORDER BY l_orderkey, l_linenumber) AS rn FROM lineitem) " +
      "WHERE rn = 1 ORDER BY l_returnflag, l_linestatus")
  )

  /** DuckDB rendering of one exact aggregate over a lineitem numeric
    * column, matching Grouped.aggExpr with exactDecimalScale=2. */
  private def liSumSql(c: String): String = c match {
    case "l_quantity" | "l_extendedprice" | "l_discount" | "l_tax" =>
      s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_$c"
    case _ => s"CAST(sum($c) AS BIGINT) AS sum_$c"
  }
  private def liMeanSql(c: String): String = c match {
    case "l_quantity" | "l_extendedprice" | "l_discount" | "l_tax" =>
      s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count($c) AS mean_$c"
    case _ => s"CAST(sum($c) AS DOUBLE) / count($c) AS mean_$c"
  }
  private val liNumeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val liGroupTail =
    "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  /** §2.2 #30/31 numericApply!"sum" over all numeric non-key columns. */
  private val groupbySum = QDef(
    "groupby_sum",
    (s, d) => Grouped.sumNumeric(lineitem(s, d), liKeys, exactScale = Some(2)),
    Some("SELECT l_returnflag, l_linestatus, " +
      liNumeric.map(liSumSql).mkString(", ") + " " + liGroupTail)
  )

  /** §2.2 #30 numericApply!"mean". */
  private val groupbyMean = QDef(
    "groupby_mean",
    (s, d) => Grouped.meanNumeric(lineitem(s, d), liKeys, exactScale = Some(2)),
    Some("SELECT l_returnflag, l_linestatus, " +
      liNumeric.map(liMeanSql).mkString(", ") + " " + liGroupTail)
  )

  /** §2.2 #30 numericApply!"minElement". */
  private val groupbyMin = QDef(
    "groupby_min",
    (s, d) => Grouped.minNumeric(lineitem(s, d), liKeys),
    Some("SELECT l_returnflag, l_linestatus, " +
      liNumeric.map(c => s"min($c) AS min_$c").mkString(", ") + " " + liGroupTail)
  )

  /** §2.2 #30 numericApply!"maxElement". */
  private val groupbyMax = QDef(
    "groupby_max",
    (s, d) => Grouped.maxNumeric(lineitem(s, d), liKeys),
    Some("SELECT l_returnflag, l_linestatus, " +
      liNumeric.map(c => s"max($c) AS max_$c").mkString(", ") + " " + liGroupTail)
  )

  /** §2.2 #30 the generic template on a second schema (orders): numeric
    * non-key column auto-selection mirrors `SubsetByTemplate`
    * (`util.d:52-63`). */
  private val groupbyAggNumeric = QDef(
    "groupby_agg_numeric",
    (s, d) => Grouped.meanNumeric(orders(s, d), Seq("o_orderstatus"),
      exactScale = Some(2)),
    Some("SELECT o_orderstatus, " +
      "CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS mean_o_orderkey, " +
      "CAST(sum(o_custkey) AS DOUBLE) / count(o_custkey) AS mean_o_custkey, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS mean_o_totalprice " +
      "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
  )

  /** Flagship (SURVEY §7.2 slice 0): the reference's signature pipeline
    * `fromTable → groupby → aggregate` (`dataframe.d:108-126,163-174` +
    * `groupby.d:48-90`) shaped like TPC-H Q1 on the testdata. One scan,
    * map-side partial agg, one exchange on the grouping keys, final agg,
    * sort of a 4-row result — the plan shape that holds at 100 TB. */
  private val q1Flagship = QDef(
    "q1_flagship",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1)))
          .as("avg_price"),
        (sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1)))
          .as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("SELECT l_returnflag, l_linestatus, " +
      "CAST(count(*) AS BIGINT) AS count_order, " +
      "sum(l_quantity) AS sum_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, " +
      "sum(l_quantity) / count(*) AS avg_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price, " +
      "CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus")
  )

  val core: Seq[QDef] = Seq(
    scanParquet, scanCsv, rowCount, filterEq, filterCmpQ, filterMask, projectCol,
    projectSubset, addColumn, sortMulti, sortAllQ, limitHead, distinctRows,
    distinctCol, unionAll, concatQ, applyCol, applyRow,
    groupbyCount, groupbyFirst, groupbySum, groupbyMean, groupbyMin,
    groupbyMax, groupbyAggNumeric, q1Flagship
  )

  /** All registered queries: core verbs + relational extensions + EXT tier.
    * Names must be unique — `SparkEntry.queries` is a Map, and a duplicate
    * would silently shadow an earlier query in the driver's gate. */
  def all: Seq[QDef] = {
    val qs = core ++ Rel.all ++ Tpch.all ++ Ext.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }
}
