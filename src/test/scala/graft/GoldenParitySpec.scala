package graft

import org.apache.spark.sql.functions._
import graft.operators.Frame._
import graft.operators.Grouped

/** 1:1 port of the reference's two golden unittest blocks (SURVEY §5,
  * FIXTURES.md §A) — same literal data, same asserted values, including
  * the reference's output-ordering contracts (key-sorted groupby, fully
  * sorted unique).
  *
  * Reference: `/root/reference/source/koalas/dataframe.d:337-382` and
  * `/root/reference/source/koalas/groupby.d:109-121`.
  */
class GoldenParitySpec extends SparkSpec {
  import spark.implicits._

  // A.1 test.tsv fixture (dataframe.d golden test)
  private lazy val tsv = Seq(
    ("1", 2, "hi"), ("1", 2, "his"), ("2", 3, "high"),
    ("q", 7, "no"), ("q", 6, "no")
  ).toDF("chrom", "pos", "other")

  test("shape and columns (dataframe.d:342-343)") {
    assert(tsv.count() == 5 && tsv.columns.length == 3)
    assert(tsv.columns.toSeq == Seq("chrom", "pos", "other"))
  }

  test("groupby count golden [2,1,1,1] key-sorted (dataframe.d:349-351)") {
    val got = Grouped.count(tsv, Seq("chrom", "pos"))
    assert(rows(got) == Seq(
      Seq("1", 2, 2L), Seq("2", 3, 1L), Seq("q", 6, 1L), Seq("q", 7, 1L)))
    assert(got.columns.last == "count") // exact name, groupby.d:49
  }

  test("groupby first golden [hi,high,no,no] (dataframe.d:352-353)") {
    // reference: earliest original row per group; original order made
    // explicit with a row id (SURVEY §2.2 #29)
    val withId = tsv.withColumn("_rid", monotonically_increasing_id())
    val got = Grouped.firstRows(withId, Seq("chrom", "pos"), Seq("_rid"))
      .drop("_rid")
    assert(got.select("other").as[String].collect().toSeq ==
      Seq("hi", "high", "no", "no"))
  }

  test("sort + self-concat keeps duplicates (dataframe.d:355-356)") {
    val sorted = tsv.sortAsc(Seq("chrom", "pos"))
    val cc = operators.Frame.concat(Seq(sorted, sorted))
    assert(cc.count() == 10)
  }

  test("apply row golden pos*2 (dataframe.d:357-358)") {
    val got = tsv.select((col("pos") * 2).as("pos2"))
      .as[Int].collect().toSeq.sorted
    assert(got == Seq(4, 4, 6, 12, 14))
  }

  test("subset + unique golden: sorted distinct of (chrom,pos) (dataframe.d:359-360)") {
    val got = tsv.projectSubset(Seq("chrom", "pos")).distinctSorted()
    assert(rows(got) == Seq(
      Seq("1", 2), Seq("2", 3), Seq("q", 6), Seq("q", 7)))
  }

  test("boolean mask pos>5 golden [6,6,7,7] after sort+self-concat (dataframe.d:366-370)") {
    val sorted = tsv.sortAsc(Seq("chrom", "pos"))
    val cc = operators.Frame.concat(Seq(sorted, sorted))
    val got = cc.maskFilter(col("pos") > 5).select("pos")
      .as[Int].collect().toSeq.sorted
    assert(got == Seq(6, 6, 7, 7))
  }

  test("scalar column broadcast-write golden (dataframe.d:354)") {
    // df.other[] = "j" — replacement under immutability
    val got = tsv.setColScalar("other", "j")
    assert(got.select("other").as[String].collect().forall(_ == "j"))
    assert(got.columns.toSeq == tsv.columns.toSeq)
    intercept[IllegalArgumentException](tsv.setColScalar("nope", 1))
  }

  test("head length (dataframe.d:371)") {
    assert(tsv.headN(5).count() == 5 && tsv.headN(3).count() == 3)
  }

  test("addNewCol zero-init + subset reorder (dataframe.d:375-378)") {
    val added = tsv.addZeroCol("newcol", org.apache.spark.sql.types.IntegerType)
    assert(added.columns.toSeq == Seq("chrom", "pos", "other", "newcol"))
    assert(added.select("newcol").as[Int].collect().forall(_ == 0))
    val reordered = added.projectSubset(Seq("newcol", "chrom"))
    assert(reordered.columns.toSeq == Seq("newcol", "chrom"))
  }

  test("append single row (dataframe.d:379-381)") {
    val appended = tsv.appendAll(Seq(("z", 99, "tail")).toDF("chrom", "pos", "other"))
    assert(appended.count() == 6)
    assert(rows(appended.filterCmp("chrom", "==", "z")) == Seq(Seq("z", 99, "tail")))
  }

  // A.2 groupby.d unittest fixture
  private lazy val gb = Seq(
    ("1", 2, 0.2), ("1", 2, 0.3), ("2", 3, 0.4),
    ("q", 7, 0.5), ("q", 6, 0.6), ("1", 2, 0.2)
  ).toDF("chrom", "pos1", "pos2")

  test("multi-key count golden [3,1,1,1] (groupby.d:118)") {
    assert(Grouped.count(gb, Seq("chrom", "pos1"))
      .select("count").as[Long].collect().toSeq == Seq(3L, 1L, 1L, 1L))
  }

  test("single-key sum golden [0.7,0.4,1.1] (groupby.d:119)") {
    // doubles compared exactly, as the reference does (sums exact in FP)
    val got = Grouped.sumNumeric(gb, Seq("chrom"))
      .select("sum_pos2").as[Double].collect().toSeq
    assert(got == Seq(0.2 + 0.3 + 0.2, 0.4, 0.5 + 0.6))
  }

  test("multi-key sum golden [0.7,0.4,0.6,0.5] (groupby.d:120)") {
    val got = Grouped.sumNumeric(gb, Seq("chrom", "pos1"))
      .select("sum_pos2").as[Double].collect().toSeq
    assert(got == Seq(0.2 + 0.3 + 0.2, 0.4, 0.6, 0.5))
  }
}
