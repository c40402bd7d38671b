package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k-by-hash sample aggregate (KMV sketch shape) —
  * the custom `TypedImperativeAggregate` counterpart of the reference's
  * UDAF-shaped `numericApply` hook: arbitrary per-group state that
  * Spark's built-in aggregates can't express.
  *
  * Keeps the k DISTINCT values whose md5 hex digests are smallest — a
  * uniform "random" sample that is a pure function of the value set:
  * reproducible across runs, partitionings, engines (md5 is shared with
  * DuckDB, which makes this custom aggregate ORACLE-CHECKABLE, unlike
  * sketch aggregates with engine-private internals), and mergeable
  * (union of bottom-k sets, re-truncated — the classic KMV property, so
  * partial aggregation works and each partition ships ≤ k entries).
  * The same state doubles as a distinct-count estimator
  * (n̂ ≈ (k-1)/h_(k) for the k-th smallest normalized hash).
  *
  * State per group: a TreeMap of ≤ k (digest → value) entries.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[String, String]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottom_k_by_hash"

  override def createAggregationBuffer(): java.util.TreeMap[String, String] =
    new java.util.TreeMap[String, String]()

  private def md5hex(s: String): String = {
    // per-thread reused digest (the DeflateLen rule): getInstance per row
    // would pay JCA provider lookup + allocation once per scanned row
    val md = BottomKByHash.md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(d(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  private def insert(
      buf: java.util.TreeMap[String, String], h: String, v: String): Unit = {
    if (!buf.containsKey(h) && (buf.size < k || h < buf.lastKey())) {
      buf.put(h, v)
      if (buf.size > k) buf.remove(buf.lastKey())
    }
  }

  override def update(
      buf: java.util.TreeMap[String, String], input: InternalRow
  ): java.util.TreeMap[String, String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      insert(buf, md5hex(s), s)
    }
    buf
  }

  override def merge(
      a: java.util.TreeMap[String, String], b: java.util.TreeMap[String, String]
  ): java.util.TreeMap[String, String] = {
    b.forEach((h, v) => insert(a, h, v))
    a
  }

  /** Values in digest order (TreeMap iterates keys ascending). */
  override def eval(buf: java.util.TreeMap[String, String]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  // Length-prefixed raw UTF-8, NOT writeUTF: modified-UTF-8 caps at 65535
  // bytes and would throw at shuffle/spill time for long values (e.g.
  // sampling documents.text). Digests are fixed 32-hex, but values are
  // arbitrary strings.
  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }
  private def readStr(in: DataInputStream): String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def serialize(buf: java.util.TreeMap[String, String]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.forEach { (h, v) => writeStr(out, h); writeStr(out, v) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(readStr(in), readStr(in)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BottomKByHash {
  private[plans] val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column-API entry point: value is cast to STRING by the caller. */
  def bottomK(value: Column, k: Int): Column =
    Bridge.toColumn(BottomKByHash(Bridge.toExpression(value), k)
      .toAggregateExpression())
}
