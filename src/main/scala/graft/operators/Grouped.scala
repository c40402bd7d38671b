package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group-by / aggregation verbs of the reference
  * (`/root/reference/source/koalas/groupby.d`).
  *
  * The reference's engine is sort-based: sort a row index by the keys, uniq
  * the key tuples, assign rows by adjacency (`groupby.d:30-46`), so its
  * outputs are always *key-sorted ascending*. We keep that output contract
  * (explicit `orderBy(keys)`) but execute with Spark's hash aggregate —
  * partial (map-side combine) → shuffle on keys → final — which is the
  * scalable replacement for a global sort: one exchange, no global order
  * needed until the final small result is sorted.
  */
object Grouped {

  private def cols(names: Seq[String]): Seq[Column] = names.map(col)

  /** Numeric non-key columns, in declaration order — the runtime mirror of
    * the reference's compile-time `SubsetByTemplate!(isNumeric, …)`
    * (`util.d:52-63`) used by `numericApply` (`groupby.d:72-88`). */
  def numericCols(df: DataFrame, keys: Seq[String]): Seq[String] = {
    val ks = keys.toSet
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !ks(f.name) => f.name
    }.toSeq
  }

  /** Per-group row count, key-sorted, count column named exactly `count` —
    * `Groupby.count()` (`groupby.d:48-61`; name at `:49`). */
  def count(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(cols(keys): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))
      .orderBy(cols(keys): _*)

  /** Per-group first row in a *deterministic* order — `Groupby.first()`
    * (`groupby.d:63-70`): the reference returns the earliest original row
    * per group. "Original order" is not a distributed-safe concept, so the
    * caller supplies an explicit total order (`orderCols`); we take the
    * row_number()==1 row per group. Never Spark's `first()` aggregate —
    * that one is partition-order-nondeterministic (SURVEY §2.2 #29).
    */
  def firstRows(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    // min_by over a struct ordered by (orderCols, full row as tie-break):
    // a true aggregate, so partial aggregation collapses each group to one
    // row per map partition BEFORE the shuffle — at scale this moves
    // O(groups) rows instead of the O(n) a window row_number() would.
    val ord = struct((orderCols.map(col) ++ df.columns.map(col)): _*)
    val all = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(cols(keys): _*)
      .agg(min_by(all, ord).as("_first"))
      .select(df.columns.toIndexedSeq.map(c => col(s"_first.$c").as(c)): _*)
      .orderBy(cols(keys): _*)
  }

  /** The aggregate kinds `numericApply` was instantiated with — imports at
    * `groupby.d:8` show the intended set: sum, mean, maxElement,
    * minElement; `sum` is the shipped alias (`groupby.d:90`). */
  sealed trait NumAgg { def name: String }
  case object Sum extends NumAgg { val name = "sum" }
  case object Mean extends NumAgg { val name = "mean" }
  case object Min extends NumAgg { val name = "min" }
  case object Max extends NumAgg { val name = "max" }

  /** Generic per-group aggregate over every numeric non-key column —
    * `numericApply!(fun)` (`groupby.d:72-88`). Output: key columns +
    * `<agg>_<col>` per numeric column, key-sorted.
    *
    * `exactDecimalScale`: when set, double columns are summed/averaged
    * through `DecimalType(18, scale)` and cast back to double. For inputs
    * that are exact at that scale (all money columns in the testdata are
    * 2-decimal), this makes the aggregate *bit-reproducible across engines
    * and across reduction orders* — double summation is otherwise
    * reduction-tree-dependent at the ulp level (SURVEY §7.4), which matters
    * both for the DuckDB oracle and for stable results across cluster
    * sizes. Min/max are exact either way and never pass through decimal.
    */
  def numericApply(
      df: DataFrame,
      keys: Seq[String],
      agg: NumAgg,
      exactDecimalScale: Option[Int] = None
  ): DataFrame = {
    val ncols = numericCols(df, keys)
    val aggs = ncols.map { c => aggExpr(df.schema(c).dataType, c, agg, exactDecimalScale) }
    df.groupBy(cols(keys): _*).agg(aggs.head, aggs.tail: _*).orderBy(cols(keys): _*)
  }

  private def aggExpr(dt: DataType, c: String, agg: NumAgg, scale: Option[Int]): Column = {
    val x = col(c)
    // Exact-sum column: integral types sum exactly as longs; doubles go
    // through decimal when an exact scale is requested.
    def sumCol: Column = (dt, scale) match {
      case (DoubleType | FloatType, Some(s)) =>
        sum(x.cast(DecimalType(18, s))).cast(DoubleType)
      case _ => sum(x)
    }
    agg match {
      case Sum  => sumCol.as(s"sum_$c")
      case Min  => min(x).as(s"min_$c")
      case Max  => max(x).as(s"max_$c")
      case Mean =>
        // mean as exact-sum / count: deterministic given deterministic sum
        // (both operands reproducible → IEEE division reproducible).
        (sumCol.cast(DoubleType) / org.apache.spark.sql.functions.count(x)).as(s"mean_$c")
    }
  }

  /** Per-group mode with DETERMINISTIC tie-break (highest count, then
    * smallest value) — SQL `mode()` leaves ties implementation-defined,
    * which would be an oracle/engine hazard; pinning the order makes the
    * result a pure function of the data. Two-phase: a (key, value) count
    * aggregate (partial-agg combines map-side) then a per-key top-1
    * window over the COUNT table — group-cardinality-sized, not
    * row-sized, so the window input is tiny even at 100 TB. */
  def modeOf(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valCol))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("n_mode").desc, col(valCol))
    counts
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col(valCol).as(s"mode_$valCol"), col("n_mode"))
  }

  def sumNumeric(df: DataFrame, keys: Seq[String], exactScale: Option[Int] = None): DataFrame =
    numericApply(df, keys, Sum, exactScale)
  def meanNumeric(df: DataFrame, keys: Seq[String], exactScale: Option[Int] = None): DataFrame =
    numericApply(df, keys, Mean, exactScale)
  def minNumeric(df: DataFrame, keys: Seq[String]): DataFrame = numericApply(df, keys, Min)
  def maxNumeric(df: DataFrame, keys: Seq[String]): DataFrame = numericApply(df, keys, Max)
}
