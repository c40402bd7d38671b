package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational verbs of the reference dataframe, re-expressed as lazy
  * Catalyst plans (reference: `/root/reference/source/koalas/dataframe.d`,
  * `view.d`, `index.d`).
  *
  * Design stance (SURVEY.md §7.1): every verb returns a *plan*, never
  * materialized data — Spark's laziness strictly subsumes the reference's
  * `View`/`Index` row-number machinery (`view.d:28-88`, `index.d:10-36`),
  * and Catalyst adds pushdown/pruning/collapse the reference lacks. No
  * `collect`, no driver-side state: every operator here survives a
  * 1000-executor 100 TB run because it compiles to scan/filter/project/
  * sort/exchange nodes only.
  */
object Frame {

  /** Comparison operators accepted by the reference's `select!(col, cmpOp)`
    * filter (`dataframe.d:73-81`; valid set by construction of the mixin). */
  val cmpOps: Set[String] = Set("==", "!=", "<", "<=", ">", ">=")

  implicit class FrameOps(private val df: DataFrame) extends AnyVal {

    /** Filter rows by `col <op> value` — the reference's
      * `select!(col, cmpOp)(val)` (`dataframe.d:73-81`). The reference
      * requires the literal's type to *statically equal* the column type
      * (`dataframe.d:76`); we mirror that by casting the literal to the
      * column's exact DataType so Catalyst never widens the column side
      * (which would defeat parquet predicate pushdown at scale).
      */
    def filterCmp(colName: String, op: String, value: Any): DataFrame = {
      require(cmpOps(op), s"unsupported cmp op: $op")
      val c = col(colName)
      val v = lit(value).cast(df.schema(colName).dataType)
      val pred = op match {
        case "==" => c === v
        case "!=" => c =!= v
        case "<"  => c < v
        case "<=" => c <= v
        case ">"  => c > v
        case ">=" => c >= v
      }
      df.filter(pred)
    }

    /** Boolean-mask filter — the reference's `df[mask]` `opIndex`
      * (`dataframe.d:279-283`). In Spark the mask *expression* and the
      * filter collapse into one predicate (mask is never materialized as a
      * boolean column — that would be a second pass at 100 TB).
      */
    def maskFilter(mask: Column): DataFrame = df.filter(mask)

    /** Column projection — `getCol` / per-column property
      * (`dataframe.d:86-89,33-44`). Unknown name throws AnalysisException
      * (reference: compile error). */
    def projectCol(colName: String): DataFrame = df.select(col(colName))

    /** Projection / column reorder to exactly `cols` — `subset!(cols)`
      * (`dataframe.d:223-227`, `util.d:33-43`). Column pruning reaches the
      * parquet scan via Catalyst. */
    def projectSubset(cols: Seq[String]): DataFrame =
      df.select(cols.map(col): _*)

    /** Add a column initialized to the type's zero value — `addNewCol!(T,
      * name)` leaves the new column at `T.init` (`dataframe.d:93-103`,
      * exercised `dataframe.d:375-378`). */
    def addZeroCol(name: String, dt: DataType): DataFrame =
      df.withColumn(name, lit(zeroOf(dt)).cast(dt))

    /** Replace a column with a scalar — the reference's writable column
      * views broadcast-assign (`df.other[] = "j"`, `dataframe.d:354`).
      * Under immutable frames, "write" is replacement (SURVEY §1.4
      * documented semantic change); per-row writes are `withColumn` with
      * any expression. */
    def setColScalar(name: String, value: Any): DataFrame = {
      require(df.columns.contains(name), s"unknown column: $name")
      df.withColumn(name, lit(value).cast(df.schema(name).dataType))
    }

    /** Multi-key ascending sort — `sort!(keys…)` via chained `<`
      * comparators (`dataframe.d:177-188`, `index.d:30-36`). Compiles to a
      * range-partitioned SortExec (global total order, sampling-based
      * partitioner — scales where the reference's single-array multiSort
      * cannot). */
    def sortAsc(keys: Seq[String]): DataFrame =
      df.orderBy(keys.map(k => col(k).asc): _*)

    /** Sort by *every* column in declaration order — `sort()`
      * (`dataframe.d:191-195`). */
    def sortAll(): DataFrame = sortAsc(df.columns.toSeq)

    /** First n rows — `head(n)` (`dataframe.d:199-202`). Spark `limit`
      * clamps at length (accepted difference, SURVEY §2.1 #13); a
      * LocalLimit runs per-partition before the single-partition
      * GlobalLimit, so no full-table gather happens. */
    def headN(n: Int): DataFrame = df.limit(n)

    /** Whole-row distinct, output sorted by all columns ascending — the
      * reference's `unique()` sorts then uniq's adjacent rows so its output
      * is inherently sorted (`dataframe.d:230-234`, asserted `:360`).
      * Spark: hash-based partial+final distinct (one shuffle), then sort —
      * strictly cheaper than the reference's global comparison sort. */
    def distinctSorted(): DataFrame = df.distinct().sortAll()

    /** Distinct of one column, sorted — free `unique(range)`
      * (`dataframe.d:307-309`). */
    def distinctColSorted(colName: String): DataFrame =
      df.select(col(colName)).distinct().orderBy(col(colName).asc)

    /** Append another frame — `opOpAssign!"~"` UNION ALL
      * (`dataframe.d:290-293`). Schema must match (reference: same static
      * type). */
    def appendAll(other: DataFrame): DataFrame = df.union(other)
  }

  /** N-ary UNION ALL preserving input order — free `concat(dfs…)`
    * (`dataframe.d:311-318`); duplicates kept. */
  def concat(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ union _)

  /** The reference's `T.init` zero values for supported cell types
    * (`dataframe.d:93-103` leaves new columns default-initialized; D
    * default-init is 0 for integrals, NaN for floats — but the exercised
    * golden uses int 0, `dataframe.d:375-378`. We use numeric zero / empty
    * string across the board: documented intentional choice, NaN would
    * poison downstream aggregates at scale). */
  private def zeroOf(dt: DataType): Any = dt match {
    case IntegerType | LongType | ShortType | ByteType => 0
    case DoubleType | FloatType                        => 0.0
    case StringType                                    => ""
    case BooleanType                                   => false
    case _: DecimalType                                => java.math.BigDecimal.ZERO
    case _                                             => null
  }
}
