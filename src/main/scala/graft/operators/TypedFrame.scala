package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Thin typed facade over `Dataset[T]` giving the reference's compile-time-
  * schema ergonomics (`Dataframe!(T1,"n1",…)` / `Dataframe!Row`,
  * `/root/reference/source/koalas/dataframe.d:21-27`): the row type is a
  * case class, so unknown fields are *compile errors* in typed lambdas —
  * the same guarantee the reference gets from D templates.
  *
  * Deliberately contains no engine logic (SURVEY §7.2 item 4): every method
  * delegates to the Dataset/DataFrame API. Typed `filter`/`mapRows`
  * lambdas are opaque to Catalyst (no pushdown through them) — use the
  * untyped [[Frame]] verbs for scan-adjacent predicates at scale, and the
  * typed facade where per-row logic is genuinely imperative; this tradeoff
  * is inherent to typed lambdas, not this wrapper.
  */
final class TypedFrame[T](val ds: Dataset[T]) extends AnyVal {
  /** `select!(col, op)(v)` with a compile-checked predicate. */
  def where(p: T => Boolean): TypedFrame[T] = new TypedFrame(ds.filter(p))

  /** `apply!(fun)` row-wise map with schema derived from `fun`'s return
    * type — the `ApplyView.fuse` analog (`view.d:9-26`). */
  def mapRows[U: Encoder](f: T => U): TypedFrame[U] = new TypedFrame(ds.map(f))

  /** `head(n)`. */
  def headN(n: Int): TypedFrame[T] = new TypedFrame(ds.limit(n))

  /** `unique()` whole-row distinct. */
  def uniqueRows(): TypedFrame[T] = new TypedFrame(ds.distinct())

  /** `~=` append (union all, same static type — enforced by T). */
  def append(other: TypedFrame[T]): TypedFrame[T] = new TypedFrame(ds.union(other.ds))

  /** shape = (rows, cols) (`dataframe.d:51-63`). */
  def shape: (Long, Int) = (ds.count(), ds.columns.length)
}

object TypedFrame {
  def apply[T](ds: Dataset[T]): TypedFrame[T] = new TypedFrame(ds)
}
