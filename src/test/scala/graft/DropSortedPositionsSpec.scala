package graft

import org.apache.spark.sql.functions._
import graft.plans.DropSortedPositions
import graft.plans.DropSortedPositions.dropSortedPositions

/** The O(n+k) sorted-merge rebuild kernel behind the span-cut operators
  * (`dedup_spans_removed`, `decontaminate_spans`): must be row-identical
  * to the `filter + array_contains` fold it replaced, on every edge the
  * fold handled. */
class DropSortedPositionsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-14 formula, kept as the semantics oracle. */
  private def legacy(tokens: Seq[String], cut: Seq[Int]): Seq[String] =
    tokens.zipWithIndex.collect { case (t, i) if !cut.contains(i + 1) => t }

  private def viaDf(tokens: Seq[String], cut: Seq[Int]): Seq[String] =
    Seq((tokens, cut)).toDF("t", "c")
      .select(dropSortedPositions(col("t"), col("c")).as("out"))
      .as[Seq[String]].head()

  test("matches the array_contains fold on randomized sorted cuts (via codegen)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val n = rnd.nextInt(30)
      val tokens = (1 to n).map(i => s"w$i")
      val cut = (1 to n).filter(_ => rnd.nextBoolean()).toSeq // sorted asc
      assert(viaDf(tokens, cut) == legacy(tokens, cut),
        s"n=$n cut=$cut")
    }
  }

  test("edges: empty cut, full cut, empty tokens, out-of-range, duplicates") {
    assert(viaDf(Seq("a", "b", "c"), Seq.empty) == Seq("a", "b", "c"))
    assert(viaDf(Seq("a", "b", "c"), Seq(1, 2, 3)) == Seq.empty)
    assert(viaDf(Seq.empty, Seq(1, 2)) == Seq.empty)
    // positions outside [1, n] never match a real token — skipped
    assert(viaDf(Seq("a", "b"), Seq(-3, 0, 2, 5, 9)) == Seq("a"))
    // duplicate cut entries are harmless (the merge only advances)
    assert(viaDf(Seq("a", "b", "c"), Seq(2, 2, 2)) == Seq("a", "c"))
  }

  test("interpreted eval matches codegen and passes null tokens through") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("c")))
    val cut = new GenericArrayData(Array[Any](3))
    val e = DropSortedPositions(
      org.apache.spark.sql.catalyst.expressions.Literal(toks,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(cut,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)))
    val out = e.eval(null).asInstanceOf[ArrayData]
    assert(out.numElements() == 2)
    assert(out.getUTF8String(0).toString == "a")
    assert(out.isNullAt(1))
  }
}
