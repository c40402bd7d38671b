package graft

import org.apache.spark.sql.types._
import graft.operators.Frame._
import graft.sources.Io

/** Core-verb unit tests beyond the goldens, plus the CSV source/sink
  * round-trip (SURVEY §2.1 #1-3). */
class FrameIoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1, 1.5), ("b", 2, 2.5), ("c", 3, 3.5), ("a", 1, 1.5)
  ).toDF("s", "i", "d")

  test("filterCmp supports all six reference operators") {
    assert(df.filterCmp("i", "==", 2).count() == 1)
    assert(df.filterCmp("i", "!=", 2).count() == 3)
    assert(df.filterCmp("i", "<", 2).count() == 2)
    assert(df.filterCmp("i", "<=", 2).count() == 3)
    assert(df.filterCmp("i", ">", 2).count() == 1)
    assert(df.filterCmp("i", ">=", 2).count() == 2)
    intercept[IllegalArgumentException](df.filterCmp("i", "~", 2))
  }

  test("filterCmp casts the literal to the column type (strict-type mirror)") {
    // int literal against double column: cast on the literal side only
    assert(df.filterCmp("d", ">", 2).count() == 2)
    val plan = df.filterCmp("d", ">", 2).queryExecution.optimizedPlan.toString
    assert(!plan.contains("cast(d#"), s"column side must not be cast:\n$plan")
  }

  test("projectCol / projectSubset / unknown column fails analysis") {
    assert(df.projectCol("s").columns.toSeq == Seq("s"))
    assert(df.projectSubset(Seq("d", "s")).columns.toSeq == Seq("d", "s"))
    intercept[org.apache.spark.sql.AnalysisException](
      df.projectSubset(Seq("nope")).collect())
  }

  test("distinctColSorted") {
    assert(df.distinctColSorted("s").as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("sortAll is a total order over all columns") {
    assert(rows(df.sortAll()).head == Seq("a", 1, 1.5))
  }

  test("concat requires >=1 frame and preserves multiplicity") {
    assert(operators.Frame.concat(Seq(df)).count() == 4)
    assert(operators.Frame.concat(Seq(df, df, df)).count() == 12)
  }

  test("addZeroCol typed zeros per DataType") {
    val out = df.addZeroCol("z1", LongType).addZeroCol("z2", StringType)
      .addZeroCol("z3", BooleanType)
    val r = out.select("z1", "z2", "z3").collect().head
    assert(r.getLong(0) == 0L && r.getString(1) == "" && !r.getBoolean(2))
  }

  test("csv round-trip: writeCsv then readTable with schema (fromTable/toCsv)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Io.writeCsv(df, s"$dir/out", sep = "\t")
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("d", DoubleType)))
    val back = Io.readTable(spark, s"$dir/out", schema, sep = "\t", headerLines = 1)
    assert(rows(back.sortAll()) == rows(df.sortAll()))
  }

  test("scan_csv fixture publish: atomic, write-once, losers leave no debris") {
    import java.nio.file.{Files, Paths}
    val fin = Paths.get(Queries.scanCsvDir)
    val parent = fin.getParent
    // fresh publish (tests own this gitignored path)
    if (Files.exists(fin)) {
      val walk = Files.walk(fin)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    Queries.publishScanCsvFixture(spark, sf0001)
    assert(Files.exists(fin), "fixture not published")
    val firstStamp = Files.getLastModifiedTime(fin)
    // second publish is a no-op: committed fixture bytes are immutable
    Queries.publishScanCsvFixture(spark, sf0001)
    assert(Files.getLastModifiedTime(fin) == firstStamp,
      "an already-published fixture was rewritten")
    // no staging debris survives (winner renamed; repeat calls early-out)
    val debrisStream = Files.list(parent)
    val leftover = new scala.collection.mutable.ArrayBuffer[String]
    try {
      val debris = debrisStream.iterator()
      while (debris.hasNext) {
        val n = debris.next().getFileName.toString
        if (n.contains("_stage_")) leftover += n
      }
    } finally debrisStream.close()
    assert(leftover.isEmpty, s"staging debris left behind: $leftover")
    // and a racer that loses the rename discards its staging dir: simulate
    // by invoking publish with the final dir already present (the early-out
    // and the rename-refused branch are the only two paths)
    Queries.publishScanCsvFixture(spark, sf0001)
    assert(Files.getLastModifiedTime(fin) == firstStamp)
  }

  test("jsonl round-trip with schema; FAILFAST throws on malformed lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Io.writeJsonl(df, s"$dir/out")
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("d", DoubleType)))
    val back = Io.readJsonl(spark, s"$dir/out", schema)
    assert(back.columns.toSeq == Seq("s", "i", "d"))
    assert(rows(back.sortAll()) == rows(df.sortAll()))
    // a malformed line fails the job rather than silently nulling columns
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.jsonl"),
      "{\"s\": \"ok\", \"i\": 1, \"d\": 2.0}\nnot json at all\n".getBytes("UTF-8"))
    intercept[org.apache.spark.SparkException](
      Io.readJsonl(spark, s"$dir/bad.jsonl", schema).collect())
  }

  test("writeCsv writeIndex emits contiguous 0..n-1 row numbers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvi").toString
    Io.writeCsv(df, s"$dir/out", sep = "\t", writeIndex = true,
      indexOrder = Seq("s", "i", "d"))
    val schema = StructType(Seq(
      StructField("index", LongType), StructField("s", StringType),
      StructField("i", IntegerType), StructField("d", DoubleType)))
    val back = Io.readTable(spark, s"$dir/out", schema, sep = "\t", headerLines = 1)
    assert(back.select("index").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // and without an order, writeIndex refuses rather than emitting
    // non-contiguous partition-offset ids
    intercept[IllegalArgumentException](
      Io.writeCsv(df, s"$dir/out2", writeIndex = true))
  }

  test("readTable drops leading index columns (fromTable indexCols)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.tsv"), "0\tx\t10\n1\ty\t20\n")
    val schema = StructType(Seq(
      StructField("idx", IntegerType), StructField("name", StringType),
      StructField("v", IntegerType)))
    val got = Io.readTable(spark, s"$dir/t.tsv", schema, indexCols = 1)
    assert(got.columns.toSeq == Seq("name", "v"))
    assert(got.count() == 2)
  }

  test("readTable skips N>1 header lines per file (fromTable headerLines)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv4").toString
    // two files, each with a 2-line header — the drop must be per-file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.tsv"),
      "# generated by tool vX\ncol_name\tcol_v\nx\t10\ny\t20\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b.tsv"),
      "# generated by tool vY\ncol_name\tcol_v\nz\t30\n")
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("v", IntegerType)))
    val got = Io.readTable(spark, dir, schema, headerLines = 2)
    assert(got.sortAll().collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      == Seq(("x", 10), ("y", 20), ("z", 30)))
  }

  test("readTable FAILFAST throws on type mismatch (strict to!T parse)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv3").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.tsv"), "x\tnotanint\n")
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", IntegerType)))
    intercept[org.apache.spark.SparkException](
      Io.readTable(spark, s"$dir/bad.tsv", schema).collect())
  }

  test("hash sampling: deterministic, stable, near the target fraction") {
    import graft.functions.Sampling
    import org.apache.spark.sql.functions.{col, concat, lit}
    val li = Tables.lineitem(spark, sf0001)
    val key = concat(
      col("l_orderkey").cast("string"), lit("_"), col("l_linenumber").cast("string"))
    val a = Sampling.hashSample(li, key, "1a").count()
    val b = Sampling.hashSample(li, key, "1a").count()
    assert(a == b) // reproducible
    val frac = a.toDouble / li.count()
    assert(frac > 0.07 && frac < 0.14, s"fraction $frac far from 26/256")
    val split = Sampling.trainTestSplit(li, key)
    assert(split.filter(col("split") === "test").count() == a)
    assert(split.count() == li.count())
  }

  test("typed facade: compile-checked lambdas over Dataset[T]") {
    import graft.operators.TypedFrame
    val tf = TypedFrame(df.as[(String, Int, Double)])
    assert(tf.where(_._2 >= 2).shape == (2L, 3))
    assert(tf.uniqueRows().shape._1 == 3L)
    val mapped = tf.mapRows(r => (r._1, r._3 * 2))
    assert(mapped.ds.columns.length == 2)
  }
}
