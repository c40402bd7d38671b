package graft

import org.apache.spark.sql.functions._
import graft.operators.Frame._
import graft.operators.Grouped

/** Null semantics. The reference lives in a no-null world (parsing throws,
  * `dataframe.d:122`; SURVEY §2.5) and the testdata has no nulls — but
  * parquet permits them, so the engine's behavior must be *defined*, not
  * accidental (SURVEY §7.4). These tests pin the Spark-SQL-standard
  * choices we document as the contract.
  */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(String, java.lang.Integer, java.lang.Double)](
    ("a", 1, 1.5), (null, 2, null), ("b", null, 2.5), ("a", 1, null)
  ).toDF("k", "i", "d")

  test("comparison filters drop null cells (SQL three-valued logic)") {
    assert(df.filterCmp("i", ">", 0).count() == 3)  // null i row excluded
    assert(df.filterCmp("i", "!=", 1).count() == 1) // null is not 'not equal'
    assert(df.filterCmp("k", "==", "a").count() == 2)
  }

  test("sort places nulls first under asc (Spark default), deterministically") {
    val ks = df.sortAsc(Seq("k")).select("k").collect().map(_.getString(0)).toSeq
    assert(ks == Seq(null, "a", "a", "b"))
  }

  test("group-by treats null as a real key group") {
    val got = Grouped.count(df, Seq("k"))
    assert(got.count() == 3) // null, a, b
    assert(got.filter(col("k").isNull).select("count").as[Long].head() == 1L)
  }

  test("aggregates skip null cells, count(*) does not") {
    val s = Grouped.sumNumeric(df, Seq("k"))
    // group 'a' has d values (1.5, null) -> sum 1.5, not null
    assert(s.filter(col("k") === "a").select("sum_d").as[Double].head() == 1.5)
  }

  test("distinct deduplicates null-containing rows") {
    val d2 = df.union(df).distinctSorted()
    assert(d2.count() == df.distinct().count())
  }

  test("groupby_first under explicit order is stable with null order keys") {
    val got = Grouped.firstRows(df, Seq("k"), Seq("i", "d"))
    assert(got.count() == 3)
  }
}
