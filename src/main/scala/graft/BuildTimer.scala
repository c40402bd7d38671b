package graft

/** Wall-clock accounting for durable-ARTIFACT builds (persisted IVF
  * index, pair/cluster store, signature store, trained quantizers): the
  * builds run once per JVM inside whichever serving query touches the
  * artifact first, so without separate accounting the build cost lands
  * in that query's first timed round and poisons its median
  * (`ann_ivf_appended_recall` recorded min 2.1 s / med 13.5 s in round
  * 11 for exactly this reason). Every build site wraps itself in
  * [[timed]]; [[Bench]] subtracts the per-query build delta from the
  * serve timing and reports the builds as their own `"builds"` map. */
object BuildTimer {

  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `f`, attributing its wall time to build entry `name`
    * (accumulating — a rebuilt artifact adds to its entry). */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(name, Double.box((System.nanoTime() - t0) / 1e9),
      (a, b) => Double.box(a.doubleValue + b.doubleValue))
  }

  /** Accumulated build seconds per artifact. */
  def snapshot: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    acc.forEach((k, v) => b += (k -> v.doubleValue))
    b.result()
  }

  /** Total accumulated build seconds across all artifacts. */
  def totalSeconds: Double = snapshot.values.sum

  def reset(): Unit = acc.clear()
}
