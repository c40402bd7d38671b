package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes — the kernel of
  * the compression-ratio quality signal (a near-incompressible document is
  * high-entropy noise; a hyper-compressible one is boilerplate/repetition
  * spam — the standard corpus-filter heuristic alongside the Gopher rules,
  * e.g. RefinedWeb/Dolma-style pipelines). There is no built-in Spark
  * function that exposes a compressor to the plan, and a Scala UDF would
  * pay serialization and break whole-stage codegen — so this is the
  * custom-Expression rung of the SURVEY §7.3 ladder, like
  * [[SortedIntersectCount]]: null-safe, deterministic, codegen'd via a
  * static JVM helper call that stays inside the generated loop.
  *
  * Per-row cost is O(bytes) with zero shuffle; the [[Deflater]] (a native
  * zlib handle) is REUSED per thread via a ThreadLocal + `reset()` —
  * allocating one per row would thrash native memory on a 10⁹-row scan.
  * Level 6 (zlib default), `nowrap` (raw stream, no 6-byte zlib framing)
  * so tiny inputs aren't dominated by header bytes. Empty input deflates
  * to a small positive stub; callers deriving a ratio should guard the
  * zero-length denominator (see `Text.compressionRatio`).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.DeflateLen.deflatedLen($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }

  /** Compressed byte count of `bytes` under raw DEFLATE at level 6. Only
    * the LENGTH is kept, so one fixed 8 KiB scratch buffer is drained
    * repeatedly — no output allocation proportional to the document. With
    * `finish()` set and the full input attached, `deflate` makes forward
    * progress every call until `finished()`, so the loop runs
    * ⌈compressedLen / 8 KiB⌉ times. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column-API entry point (STRING → INT, null-preserving). */
  def deflateLen(s: Column): Column =
    Bridge.toColumn(DeflateLen(Bridge.toExpression(s)))
}
