package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[PlanCache]] lifecycle: collision-safe keys, bounded LRU with
  * unpersist-on-evict, durable-vs-shared clearing, and the
  * [[AutoUnpersist]] release-after-first-use contract. */
class PlanCacheSpec extends SparkSpec {
  import spark.implicits._

  private def frame(tag: Int): DataFrame =
    (1 to 3).map(i => (i.toLong, tag)).toDF("id", "tag")

  test("hit on a logically-identical plan, miss on a different one") {
    val cache = new PlanCache[Integer](capacity = 4)
    var computes = 0
    def get(df: DataFrame) = cache.getOrCompute(
      PlanCache.keyOf(df, "p"), { computes += 1; Integer.valueOf(computes) })
    val a1 = get(frame(1))
    val a2 = get(frame(1)) // same logical plan, separately built
    val b = get(frame(2))  // different literal → different plan
    assert(a1 == a2 && computes == 2 && b == 2)
    assert(get(frame(1)) == a1 && computes == 2)
  }

  test("params and key arity distinguish entries") {
    val cache = new PlanCache[Integer](capacity = 8)
    var n = 0
    def get(params: Any*) = cache.getOrCompute(
      PlanCache.keyOf(frame(1), params: _*), { n += 1; Integer.valueOf(n) })
    assert(get(0.5, 3) == 1)
    assert(get(0.5, 4) == 2)
    assert(get(0.5, 3) == 1)
    assert(cache.size == 2)
  }

  test("capacity bound: a corpus past the cap evicts the LRU entry and runs onEvict") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val cache = new PlanCache[String](capacity = 2, onEvict = evicted += _)
    def put(tag: Int) = cache.getOrCompute(PlanCache.keyOf(frame(tag)), s"v$tag")
    put(1); put(2)
    put(1)            // touch 1 → 2 becomes LRU
    put(3)            // over cap → evict 2
    assert(cache.size == 2)
    assert(evicted.toSeq == Seq("v2"))
    var recomputed = false
    cache.getOrCompute(PlanCache.keyOf(frame(2)), { recomputed = true; "v2'" })
    assert(recomputed) // the evicted corpus really left the cache
  }

  test("clearShared drops shared caches but not durable ones; clearAll drops both") {
    val shared = new PlanCache[String](capacity = 4)
    val durable = new PlanCache[String](capacity = 4, durable = true)
    shared.getOrCompute(PlanCache.keyOf(frame(7)), "s")
    durable.getOrCompute(PlanCache.keyOf(frame(7)), "d")
    PlanCache.clearShared()
    assert(shared.size == 0 && durable.size == 1)
    PlanCache.clearAll()
    assert(durable.size == 0)
  }

  test("evicted DataFrame entries are unpersisted") {
    val cache = new PlanCache[DataFrame](capacity = 1, onEvict = PlanCache.unpersist)
    val df1 = frame(11).persist()
    df1.count()
    cache.getOrCompute(PlanCache.keyOf(frame(11), "df"), df1)
    assert(df1.storageLevel.useMemory)
    cache.getOrCompute(PlanCache.keyOf(frame(12), "df"), frame(12).persist())
    // non-blocking unpersist: poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (df1.storageLevel.useMemory && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!df1.storageLevel.useMemory)
  }

  test("two-input keys require one session and differ by either side") {
    val cache = new PlanCache[Integer](capacity = 8)
    var n = 0
    def get(a: DataFrame, b: DataFrame) = cache.getOrCompute(
      PlanCache.keyOf2(a, b, "x"), { n += 1; Integer.valueOf(n) })
    assert(get(frame(1), frame(2)) == 1)
    assert(get(frame(2), frame(1)) == 2) // sides are positional
    assert(get(frame(1), frame(2)) == 1)
  }

  test("AutoUnpersist releases helpers after the result's first action") {
    val helper = frame(21).persist()
    val result = AutoUnpersist.afterFirstUse(
      helper.groupBy(col("tag")).agg(sum(col("id")).as("s")), helper)
    assert(result.count() == 1)
    // listener bus is async; poll for the release
    val deadline = System.nanoTime() + 10e9.toLong
    while (helper.storageLevel.useMemory && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!helper.storageLevel.useMemory)
  }

  test("AutoUnpersist does nothing before the result is used") {
    val helper = frame(22).persist()
    helper.count()
    AutoUnpersist.afterFirstUse(helper.select(col("id")), helper)
    // unrelated action must NOT release the helper
    frame(23).count()
    Thread.sleep(500)
    assert(helper.storageLevel.useMemory)
    helper.unpersist(blocking = true)
  }

  test("AutoUnpersist bounds pending listeners: overflow releases oldest") {
    // Plans that are built but never run (audits, abandoned compositions)
    // must not accumulate listeners forever — every live listener taxes
    // every later action with a plan walk (the unbounded version pushed a
    // full test-suite run from minutes to over an hour).
    AutoUnpersist.releaseAll()
    val first = frame(31).persist()
    AutoUnpersist.afterFirstUse(first.select(col("id")), first)
    first.count()
    for (i <- 0 until 40) { // > MaxPending, none ever materialized
      val h = frame(100 + i)
      AutoUnpersist.afterFirstUse(h.select(col("id")), h)
    }
    assert(AutoUnpersist.pendingCount <= 32)
    // the overflowed-out FIRST helper was force-released (unpersisted)
    val deadline = System.nanoTime() + 10e9.toLong
    while (first.storageLevel.useMemory && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!first.storageLevel.useMemory)
    AutoUnpersist.releaseAll()
    assert(AutoUnpersist.pendingCount == 0)
  }

  test("TempDirs: eviction of a dir-valued cache reclaims the artifact directory") {
    val cache = new PlanCache[String](capacity = 1, onEvict = TempDirs.delete)
    def mk(tag: Int): String = cache.getOrCompute(PlanCache.keyOf(frame(tag)), {
      val d = TempDirs.create("graft_tempdirs_spec")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "payload.parquet"), Array[Byte](1, 2, 3))
      d
    })
    val d1 = mk(41)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1)))
    val d2 = mk(42) // capacity 1 → evicts d1 → TempDirs.delete removes it
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      "evicted store dir must be deleted from disk")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d2)))
    // an unregistered path is never touched by delete()
    val foreign = java.nio.file.Files.createTempDirectory("graft_foreign").toString
    TempDirs.delete(foreign)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(foreign)))
    cache.clear()
  }
}
