package graft

/** The driver contract's flagship smoke, test-ified (was the EntrySmoke
  * dev main): `SparkEntry.entry` must produce the 6-row Q1 shape. */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns the 6-row flagship result") {
    val df = SparkEntry.entry(spark)
    val got = df.collect()
    assert(got.length == 6, s"expected 6 flagship rows, got ${got.length}")
    assert(df.columns.contains("l_returnflag"))
  }
}
