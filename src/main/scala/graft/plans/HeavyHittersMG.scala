package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch — frequent items WITHOUT a vocab-wide
  * shuffle. The exact `groupBy(token).count` moves one row per DISTINCT
  * item through the exchange (web-scale vocab = billions of keys); this
  * aggregate carries at most `capacity` (item, count) entries per
  * partition and merges them associatively, so the cost is
  * capacity-bounded no matter the corpus.
  *
  * Guarantees (classic MG + the mergeable-summaries merge, both
  * implemented exactly):
  *  - estimates NEVER overcount: `est <= true`;
  *  - total undercount is bounded: `true - est <= N/(capacity+1)` for N
  *    items seen — so every item with `true > N/(capacity+1)` is in the
  *    sketch (the heavy-hitter containment guarantee);
  *  - with `capacity >= |distinct items|` no decrement ever fires and the
  *    sketch IS the exact count table — deterministic and
  *    oracle-checkable (the registered `vocab_sketch` query runs in this
  *    regime; sub-capacity mode is order-dependent in which *estimates*
  *    it reports, but the bounds above always hold — unit-asserted on a
  *    zipf stream).
  *
  * State: a HashMap of ≤ capacity (item → count). Update on a miss with
  * a full buffer decrements every counter (the MG step, O(capacity));
  * merge sums counters and, if over capacity, subtracts the
  * (capacity+1)-th largest count from all (Agarwal et al., "Mergeable
  * Summaries").
  */
case class HeavyHittersMG(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters_mg"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow
  ): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      if (buf.containsKey(s)) buf.put(s, buf.get(s) + 1L)
      else if (buf.size < capacity) buf.put(s, 1L)
      else {
        // MG step: decrement every counter, drop zeros, skip the item
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]
  ): java.util.HashMap[String, Long] = {
    b.forEach { (k, v) =>
      if (a.containsKey(k)) a.put(k, a.get(k) + v) else a.put(k, v)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  /** Entries as (item, est) structs, largest-first with item tiebreak —
    * a deterministic function of the sketch contents. */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    scala.util.Sorting.stableSort(entries,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    new GenericArrayData(entries.map { case (s, n) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(s), n)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersMG =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersMG =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHittersMG {
  /** Column-API entry point: value is cast to STRING by the caller. */
  def heavyHitters(value: Column, capacity: Int): Column =
    Bridge.toColumn(HeavyHittersMG(Bridge.toExpression(value), capacity)
      .toAggregateExpression())
}
