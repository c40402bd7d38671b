package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Frame._
import graft.operators.Grouped

/** Algebraic properties over generated frames (SURVEY §5 item 3).
  * Plain ScalaCheck generators sampled with fixed seeds (the
  * scalatest/scalacheck bridge artifact isn't in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = Gen.listOfN(30,
    Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 5), Gen.choose(-10.0, 10.0)))

  private def samples(n: Int): Seq[List[(String, Int, Double)]] =
    (1 to n).map(i => rowGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("distinct(union(df, df)) == distinct(df)") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      assert(rows(df.appendAll(df).distinctSorted()) == rows(df.distinctSorted()))
    }
  }

  test("groupby counts sum to row count") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val total = Grouped.count(df, Seq("k"))
        .agg(org.apache.spark.sql.functions.sum("count")).as[Long].head()
      assert(total == df.count())
    }
  }

  test("sort is idempotent and a permutation") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val once = rows(df.sortAll())
      assert(rows(df.sortAll().sortAll()) == once)
      assert(once.sortBy(_.toString()) == rows(df).sortBy(_.toString()))
    }
  }

  test("filter(p) and filter(!p) partition the frame") {
    for ((data, pivot) <- samples(5).zip(Seq(0, 1, 3, 5, 2))) {
      val df = data.toDF("k", "i", "d")
      val lo = df.filterCmp("i", "<", pivot).count()
      val hi = df.filterCmp("i", ">=", pivot).count()
      assert(lo + hi == df.count())
    }
  }

  test("first row per group is a member of its group") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val firsts = Grouped.firstRows(df, Seq("k"), Seq("i", "d")).collect()
      val all = df.collect().toSet
      assert(firsts.forall(all.contains))
      assert(firsts.length == df.select("k").distinct().count())
    }
  }

  test("rangeJoin == naive inequality join over random points/intervals/widths") {
    import org.apache.spark.sql.functions._
    val ptGen = Gen.listOfN(40, Gen.choose(-1000L, 1000L))
    val ivGen = Gen.listOfN(15, Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0L, 300L)))
    for (i <- 1 to 5) {
      val pts = ptGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case (p, j) => (j.toLong, p) }.toDF("pid", "p")
      val iv = ivGen.pureApply(Gen.Parameters.default, Seed(100L + i))
        .zipWithIndex.map { case ((lo, len), j) => (j.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val naive = rows(pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .orderBy("pid", "iid"))
      for (w <- Seq(7L, 64L, 5000L)) {
        val banded = rows(graft.operators.Joins
          .rangeJoin(pts, iv, "p", "lo", "hi", w).orderBy("pid", "iid"))
        assert(banded == naive, s"seed=$i width=$w")
      }
    }
  }

  test("intervalOverlapJoin == naive overlap join, keyed and unkeyed") {
    import org.apache.spark.sql.functions._
    val ivGen = Gen.listOfN(25,
      Gen.zip(Gen.oneOf(1L, 2L), Gen.choose(-500L, 500L), Gen.choose(0L, 200L)))
    for (i <- 1 to 5) {
      val a = ivGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case ((k, lo, len), j) => (j.toLong, k, lo, lo + len) }
        .toDF("aid", "k", "a_lo", "a_hi")
      val b = ivGen.pureApply(Gen.Parameters.default, Seed(200L + i))
        .zipWithIndex.map { case ((k, lo, len), j) => (j.toLong, k, lo, lo + len) }
        .toDF("bid", "k", "b_lo", "b_hi")
      val naiveKeyed = rows(a.join(b.withColumnRenamed("k", "k2"),
          col("k") === col("k2") &&
            col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("aid", "bid").orderBy("aid", "bid"))
      val naiveGlobal = rows(a.drop("k").join(b.drop("k"),
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("aid", "bid").orderBy("aid", "bid"))
      for (w <- Seq(13L, 100L, 4000L)) {
        val keyed = rows(graft.operators.Joins.intervalOverlapJoin(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", w, keys = Seq("k"))
          .select("aid", "bid").orderBy("aid", "bid"))
        assert(keyed == naiveKeyed, s"seed=$i width=$w keyed")
        val global = rows(graft.operators.Joins.intervalOverlapJoin(
            a.drop("k"), b.drop("k"), "a_lo", "a_hi", "b_lo", "b_hi", w)
          .select("aid", "bid").orderBy("aid", "bid"))
        assert(global == naiveGlobal, s"seed=$i width=$w global")
      }
    }
  }

  test("packSequences == sequential cumsum over random docs") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(50, Gen.choose(0L, 500L))
    for (i <- 1 to 5) {
      val toks = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .zipWithIndex.map { case (n, j) => (j.toLong * 13 % 997, n) }
        .distinctBy(_._1) // orderKey must be unique
      val df = toks.toDF("k", "n")
      val got = graft.functions.Packing
        .packSequences(df, col("k"), col("n"), budget = 64L, nBuckets = 8)
        .select("k", "stream_offset", "bin")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      var acc = 0L
      val expected = toks.sortBy(_._1).map { case (k, n) =>
        val off = acc; acc += n; (k, off, off / 64L)
      }
      assert(got == expected, s"seed=$i")
    }
  }

  test("chunkDocs covers the stream exactly for random (n, size, stride)") {
    val cfgGen = Gen.zip(Gen.choose(1, 80), Gen.choose(1, 12))
      .flatMap { case (n, size) => Gen.choose(1, size).map(st => (n, size, st)) }
    for (i <- 1 to 10) {
      val (n, size, stride) = cfgGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val toks = (0 until n).map(j => s"t$j")
      val chunks = graft.functions.Text.chunkDocs(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), size, stride)
        .orderBy("chunk_id").select("chunk_text").as[String]
        .collect().map(_.split(" ").toSeq).toSeq
      val wantChunks = if (n <= size) 1 else (n - size + stride - 1) / stride + 1
      assert(chunks.length == wantChunks, s"seed=$i cfg=($n,$size,$stride)")
      // stride-prefixes + the full last chunk rebuild the token stream
      assert(chunks.init.flatMap(_.take(stride)) ++ chunks.last == toks,
        s"seed=$i cfg=($n,$size,$stride)")
      // every chunk but the last is full-width
      assert(chunks.init.forall(_.length == size), s"seed=$i cfg=($n,$size,$stride)")
    }
  }

  test("connectedComponents == union-find over random graphs") {
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    for (i <- 1 to 5) {
      val edges = edgeGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = graft.functions.Clusters.connectedComponents(
          (0L until 20L).toDF("id"), edges.toDF("a", "b"), "id", "a", "b")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val parent = scala.collection.mutable.Map((0L until 20L).map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      assert(got == (0L until 20L).map(n => n -> find(n)), s"seed=$i")
    }
  }
}
