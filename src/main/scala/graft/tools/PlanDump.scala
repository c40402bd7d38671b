package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: print executed plans + distinct exchange counts for
  * the queries named in args (default: the PlanAuditSpec offenders). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("retrieval_bm25", "source_overlap", "source_overlap_sketch")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("plandump").getOrCreate()
    val sf = "/root/testdata/sf0.001"
    val ex = "Exchange (?:hash|range)partitioning[^\\n]*plan_id=(\\d+)".r
    names.foreach { n =>
      val q = graft.Queries.all.find(_.name == n).get
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString()
      val ids = ex.findAllMatchIn(p).map(_.group(1)).toSet
      println(s"=== $n: ${ids.size} distinct exchanges ===")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Window") || l.contains("Join")
          || l.contains("Aggregate") || l.contains("Sort")
          || l.contains("Generate") || l.contains("Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
