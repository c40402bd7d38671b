package graft

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import graft.plans.DeflateLen
import graft.plans.DeflateLen.deflateLen

/** The DEFLATE-length kernel behind the compression-ratio quality signal
  * (`compression_quality`): the plan-side value must equal a fresh
  * driver-side Deflater on the same bytes (pinning the ThreadLocal-reuse
  * path — a dirty reused handle would diverge immediately), and the
  * signal must order repetitive < natural < hex-noise text. */
class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: a FRESH Deflater per call, same level/nowrap settings. */
  private def reference(s: String): Int = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(s.getBytes("UTF-8"))
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  private def viaDf(ss: Seq[String]): Seq[Int] =
    ss.toDF("s").select(deflateLen(col("s")).as("n")).as[Int].collect().toSeq

  test("matches a fresh driver-side Deflater on varied inputs (via codegen)") {
    val rnd = new scala.util.Random(11)
    val samples = Seq(
      "", "a", "hello world", "spam " * 1000,
      (1 to 500).map(i => s"tok$i").mkString(" "),
      Array.fill(4096)(rnd.nextPrintableChar()).mkString,
      "héllo wörld ünïcode ✓ 世界") ++
      (1 to 10).map(_ => Array.fill(rnd.nextInt(2000))(
        ('a' + rnd.nextInt(26)).toChar).mkString)
    assert(viaDf(samples) == samples.map(reference))
  }

  test("thread-local reuse is clean across many rows in one task") {
    // 5k rows through one partition exercises the same reused Deflater;
    // any state bleed between rows breaks equality with fresh handles.
    val ss = (1 to 5000).map(i => s"document $i " * (i % 17 + 1))
    val got = ss.toDF("s").repartition(1)
      .select(deflateLen(col("s")).as("n")).as[Int].collect().toSeq
    assert(got == ss.map(reference))
  }

  test("null passes through; interpreted eval matches codegen") {
    val got = Seq(Some("abc"), None).toDF("s")
      .select(deflateLen(col("s")).as("n")).collect()
    assert(got(0).getInt(0) == reference("abc") && got(1).isNullAt(0))
    val e = DeflateLen(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc abc abc"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == reference("abc abc abc"))
  }

  test("orders repetitive < natural < hex-noise as a ratio") {
    val rep = Seq.fill(400)("lorem ipsum dolor").mkString(" ")
    val nat = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through fields of data toward a distant horizon " * 20
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var x = "seed".getBytes("UTF-8")
    val noise = (1 to 64).map { _ =>
      x = md.digest(x); x.map("%02x".format(_)).mkString
    }.mkString
    def ratio(s: String) =
      reference(s).toDouble / s.getBytes("UTF-8").length
    assert(ratio(rep) < 0.05)
    assert(ratio(rep) < ratio(nat) && ratio(nat) < ratio(noise))
  }
}
