package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{SemDedup, Similarity, Text}

/** SemDedup (clustered embedding dedup) and context-window chunking —
  * small-corpus semantics the sf oracle data can't pin. Oracle parity at
  * sf is covered by `semdedup_pairs` / `chunk_docs` in CORRECTNESS. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Four well-separated direction clusters in R^4 plus planted
    * near-copies; every ≥0.95 pair is within-direction, so clustered
    * comparison must find the full brute-force pair set. */
  private def corpus(): DataFrame = {
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val base = (0 until 40).map { i =>
      val d = dirs(i % 4)
      // small per-index jitter keeps vectors distinct but same-direction
      (i.toLong, d.map(x => x + (i / 4) * 0.004f))
    }
    val planted = (0 until 8).map { i => (100L + i, base(i)._2.clone()) }
    (base ++ planted).toDF("vec_id", "embedding")
  }

  private def brutePairs(df: DataFrame, t: Double): Set[(Long, Long)] = {
    val a = df.select(col("vec_id").as("id_a"),
      Similarity.asDouble(col("embedding")).as("va"))
    val b = df.select(col("vec_id").as("id_b"),
      Similarity.asDouble(col("embedding")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("semanticDupPairs finds the brute-force pair set on clustered data") {
    val df = corpus()
    val got = SemDedup.semanticDupPairs(df, "vec_id", "embedding",
        threshold = 0.95, nCells = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = brutePairs(df, 0.95)
    assert(want.nonEmpty, "fixture must contain duplicate pairs")
    assert(got == want)
  }

  test("semanticDupPairs is always a subset of the brute-force pairs") {
    // generic invariant: clustering only PRUNES comparisons, it can never
    // invent a pair — regardless of cell count or corpus shape
    val df = corpus()
    for (cells <- Seq(2, 8)) {
      val got = SemDedup.semanticDupPairs(df, "vec_id", "embedding",
          threshold = 0.9, nCells = cells)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(brutePairs(df, 0.9)))
    }
  }

  test("semanticSurvivors drops exactly the higher-id side of each pair") {
    val df = corpus()
    val pairs = SemDedup.semanticDupPairs(df, "vec_id", "embedding",
      threshold = 0.95, nCells = 4)
    val dropped = pairs.select("id_b").as[Long].collect().toSet
    val surv = SemDedup.semanticSurvivors(df, "vec_id", "embedding",
        threshold = 0.95, nCells = 4)
      .select("vec_id").as[Long].collect().toSet
    val allIds = df.select("vec_id").as[Long].collect().toSet
    assert(surv == allIds.diff(dropped))
  }

  // ---------------------------------------------------------- chunking

  private def seqChunks(toks: Seq[String], size: Int, stride: Int): Seq[(Int, String, Int)] = {
    val n = toks.length
    val nChunks = if (n <= size) 1 else ((n - size + stride - 1) / stride) + 1
    (0 until nChunks).map { i =>
      val c = toks.slice(i * stride, i * stride + size)
      (i, c.mkString(" "), c.length)
    }
  }

  test("chunkDocs matches the sequential sliding-window definition") {
    // lengths probe the boundaries: under size, exact size, one over,
    // exact multiple-of-stride landing, and a long tail
    for (n <- Seq(1, 7, 8, 9, 14, 20, 23)) {
      val toks = (0 until n).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = Text.chunkDocs(df, sizeTokens = 8, strideTokens = 6)
        .orderBy("chunk_id")
        .select("chunk_id", "chunk_text", "n_chunk_tokens")
        .as[(Int, String, Int)].collect().toSeq
      assert(got == seqChunks(toks, 8, 6), s"n=$n")
    }
  }

  test("chunkDocs covers every token and overlaps by size-stride") {
    val toks = (0 until 100).map(i => s"w$i")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val chunks = Text.chunkDocs(df, 32, 24).orderBy("chunk_id")
      .select("chunk_text").as[String].collect().map(_.split(" ").toSeq)
    // stride-prefixes of each chunk + full last chunk == original stream
    val rebuilt = chunks.init.flatMap(_.take(24)) ++ chunks.last
    assert(rebuilt.toSeq == toks)
    chunks.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a.drop(24) == b.take(a.length - 24)) // the 8-token overlap
    }
  }

  test("chunkDocs rejects degenerate size/stride") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Text.chunkDocs(df, 0, 1))
    intercept[IllegalArgumentException](Text.chunkDocs(df, 8, 0))
    intercept[IllegalArgumentException](Text.chunkDocs(df, 8, 9))
  }

  test("filteredTopK equals brute force over the pre-filtered corpus") {
    val df = corpus().withColumn("label", (col("vec_id") % 2).cast("int"))
    val queries = df.filter(col("vec_id") < 4)
    val got = Similarity.filteredTopK(df, queries, "vec_id", "embedding",
      k = 3, corpusPredicate = col("label") === 0)
    val want = Similarity.bruteForceTopK(df.filter(col("label") === 0),
      queries, "vec_id", "embedding", k = 3)
    assert(rows(got) == rows(want))
  }
}
