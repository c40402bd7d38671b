package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Snapshot

/** [[graft.functions.Snapshot]] — corpus version diff. */
class SnapshotSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val v1 = corpus(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
  private val v2 = corpus(2L -> "beta", 3L -> "gamma prime", 4L -> "delta")

  test("classifies added / removed / changed / unchanged") {
    val out = Snapshot.diff(v1, v2).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("identical versions are all unchanged; empty old is all added") {
    val same = Snapshot.diff(v1, v1).collect()
    assert(same.forall(_.getString(1) == "unchanged") && same.length === 3)
    val fresh = Snapshot.diff(v1.limit(0), v2).collect()
    assert(fresh.forall(_.getString(1) == "added") && fresh.length === 3)
  }

  test("summary counts match the per-doc statuses") {
    val sum = Snapshot.diffSummary(v1, v2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sum === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("only (id, hash) reaches the join — text is pruned from the scan") {
    // With parquet inputs the diff must not carry document text through
    // the join: the plan's join output schema has only ids + hashes.
    val dir = java.nio.file.Files.createTempDirectory("snapdiff").toString
    v1.write.mode("overwrite").parquet(s"$dir/a")
    v2.write.mode("overwrite").parquet(s"$dir/b")
    val d = Snapshot.diff(spark.read.parquet(s"$dir/a"), spark.read.parquet(s"$dir/b"))
    val joins = d.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    val joinCols = joins.head.output.map(_.name)
    assert(!joinCols.contains("text"), s"join carries text: $joinCols")
  }
}
