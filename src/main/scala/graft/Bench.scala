package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is forced through a noop-format write: unlike `count()`,
  * this executes the full physical plan (sorts, projections, windows)
  * without paying sink IO, so the numbers reflect real operator cost.
  * One JIT warm-up pass (flagship query) runs before timing; each query
  * is timed twice and the MINIMUM reported — single-run numbers on this
  * container swing ±50% from CPU contention, min-of-2 keeps round-over-
  * round comparisons meaningful.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // JIT/codegen warm-up on the flagship (not timed)
    try run("q1_flagship") catch { case _: Throwable => () }

    var failed = List.empty[String]
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try run(name) catch { case e: Throwable =>
        if (!failed.contains(name)) {
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> math.min(timeOnce(name), timeOnce(name))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
