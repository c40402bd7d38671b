package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge learning (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909) — the training half of the tokenizer whose encode
  * kernel is [[graft.plans.Bpe]]. [[Text.bpeMerges]] is the pragmatic
  * hybrid (one corpus pass, then a driver loop over the collected
  * vocabulary HEAD); this is the vocabulary-UNBOUNDED version: the word
  * table never reaches the driver, so web-scale vocabularies (typos,
  * URLs, code identifiers — easily 10⁸⁺ distinct words at 100 TB) train
  * without a `maxWords` truncation or a vocab-sized collect.
  *
  * Algorithm, exactly the classic one: ONE corpus pass builds the
  * word-frequency table (vocab-sized shuffle, map-side combined); each
  * merge iteration is then one pass over that table — count adjacent
  * symbol pairs weighted by word frequency (distributed aggregate),
  * take the most frequent pair (ties break lexicographically, so
  * training is deterministic), and merge it everywhere. Only the single
  * winning (pair, count) row ever reaches the driver per iteration;
  * driver state is the merge list itself — the training OUTPUT.
  *
  * Symbol-string representation: a word's symbol sequence is one string
  * with every symbol wrapped `chr(1) s chr(2)`. Wrapping with TWO
  * distinct delimiters (not a shared single separator) means adjacent
  * occurrences of a pair share no characters, so one non-overlapping
  * left-to-right `replace(sym, ⟨a⟩⟨b⟩, ⟨ab⟩)` call IS the kernel's
  * merge-all-occurrences pass — bit-identically in Spark and in the
  * DuckDB oracle (a shared separator would consume the boundary and
  * skip every second occurrence of patterns like `a a a a`).
  * Corpus text must not contain chr(1)/chr(2) (guaranteed for any
  * printable corpus; the tokenizer's own `</w>` marker doesn't either).
  *
  * Iteration i rebuilds symbol strings from the persisted base by
  * chaining the i−1 learned replaces (no per-iteration persist). That
  * is O(k²·vocab·len) for k merges, so every `checkpointEvery` merges
  * the fold is REBASED: the chained result becomes the new persisted
  * base and the pending chain resets — linear total work, bounded
  * lineage, at most two vocab-table copies cached at once. The default
  * (16) only matters for industrial k (a 32 000-merge vocabulary);
  * small-k training never rebases.
  */
object BpeTrain {

  private val O = "\u0001" // symbol open delimiter
  private val C = "\u0002" // symbol close delimiter

  /** `chr(1) c chr(2)` per character plus the wrapped end-of-word
    * marker — the initial symbol string of one word. */
  private def baseSymExpr(word: Column): Column =
    concat(
      array_join(
        transform(sequence(lit(1), length(word)),
          i => concat(lit(O), word.substr(i, lit(1)), lit(C))),
        ""),
      lit(O + graft.plans.Bpe.Marker + C))

  /** Adjacent (a, b) symbol pairs of one symbol string — split on the
    * close delimiter, strip the open delimiter, pair j with j+1. The
    * index range is `filter(sequence(1, n), j -> j < n)` rather than
    * `sequence(1, n-1)`: a fully-merged word has ONE symbol and Spark's
    * `sequence(1, 0)` counts DOWN instead of being empty. */
  private def pairsExpr(sym: Column): Column = {
    val syms = transform(
      filter(split(sym, C), x => x =!= ""),
      x => x.substr(lit(2), length(x) - 1))
    transform(
      filter(sequence(lit(1), size(syms)), j => j < size(syms)),
      j => struct(element_at(syms, j).as("a"), element_at(syms, j + 1).as("b")))
  }

  /** One learned merge applied to a symbol string:
    * `⟨a⟩⟨b⟩ → ⟨ab⟩`, all non-overlapping occurrences left-to-right. */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    replace(sym, lit(O + a + C + O + b + C), lit(O + a + b + C))

  /** Learn up to `nMerges` BPE merges from `docs`' text column.
    *
    * @return one row per learned merge — `(merge_rank, lhs, rhs,
    *         pair_count)`, ordered by rank; fewer than `nMerges` rows iff
    *         the corpus ran out of adjacent pairs (every word fully
    *         merged into a single symbol) first. The (lhs, rhs) sequence
    *         feeds [[graft.plans.Bpe]] / [[Text.bpeEncode]] directly.
    */
  def learnedMerges(
      docs: DataFrame,
      textCol: Column,
      nMerges: Int,
      checkpointEvery: Int = 16): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(checkpointEvery > 0,
      s"checkpointEvery must be positive, got $checkpointEvery")
    val spark = docs.sparkSession

    // one corpus pass: word frequencies, materialized as wrapped symbol
    // strings (word ↔ symstr is bijective, so grouping keys are unchanged)
    var base = docs
      .select(explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(baseSymExpr(col("w")).as("sym"), col("cnt"))
      .persist()

    val merges = ArrayBuffer.empty[(String, String, Long)]
    var pending = List.empty[(String, String)] // merges since last rebase
    def current: Column =
      pending.reverse.foldLeft(col("sym")) { case (c, (a, b)) =>
        applyMerge(c, a, b)
      }

    var exhausted = false
    var i = 0
    while (i < nMerges && !exhausted) {
      // one pass over the vocab table: weighted adjacent-pair counts,
      // map-side combined; TakeOrdered ships exactly one row back
      val top = base
        .select(explode(pairsExpr(current)).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (a, b) = (r.getString(0), r.getString(1))
        merges += ((a, b, r.getLong(2)))
        pending = (a, b) :: pending
        if (pending.length >= checkpointEvery) {
          val rebased = base.select(current.as("sym"), col("cnt")).persist()
          rebased.count() // materialize before dropping the old base
          base.unpersist()
          base = rebased
          pending = Nil
        }
      }
      i += 1
    }
    base.unpersist()

    val rows = merges.zipWithIndex.map { case ((a, b, c), j) =>
      Row(j + 1, a, b, c)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
      .orderBy(col("merge_rank"))
  }
}
