package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy profiling for training corpora: k-anonymity over a set of
  * quasi-identifier columns (Sweeney 2002). Re-identification risk in a
  * released training set is driven by the EQUIVALENCE CLASS size — how
  * many rows share a row's full quasi-identifier combination; a class of
  * size < k singles its members out. Two verbs:
  *
  *  - [[kAnonymityProfile]] — the auditor's view: the class-size
  *    histogram (how many classes/rows sit at each size, which sizes
  *    violate k), the one-row decision input "is this release k-anonymous
  *    and how far off is it".
  *  - [[kAnonymize]] — the releaser's view: suppression-based
  *    k-anonymisation — rows in classes ≥ k keep their quasi-identifiers,
  *    rows below k get them replaced by `"*"` (full-domain suppression,
  *    the simplest generalisation lattice point). The output is
  *    k-anonymous by construction for every k' ≤ k: suppressed rows all
  *    join one `(*,…,*)` class, and that class is only published when it
  *    itself reaches k (otherwise those rows are dropped — a size-1
  *    suppressed class would itself be identifying).
  *
  * Scale shape (100 TB): the class size is a partitioned window count —
  * one hash shuffle on the quasi-identifier tuple per counting pass (the
  * profile does one; [[kAnonymize]] does two, the second over the
  * REWRITTEN identifiers to validate the pooled residual class — no
  * self-join anywhere). Suppression is a per-row projection. Skewed classes
  * (one giant demographic bucket) are the SAFE direction for the window
  * sort — and such rows are never suppressed, so the rewrite work
  * concentrates on the small classes by definition.
  */
object Privacy {

  private def classSize(qiCols: Seq[String]) =
    count(lit(1)).over(Window.partitionBy(qiCols.map(col): _*))

  /** Class-size histogram over the quasi-identifier tuple: one row per
    * observed class size — `class_size`, `n_classes`, `n_rows`,
    * `below_k`. Ascending by size, so the head of the result IS the risk
    * report (size-1 classes = unique individuals). */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .select(
        col("class_size"), col("n_classes"), col("n_rows"),
        (col("class_size") < k).as("below_k"))
      .orderBy(col("class_size"))

  /** Suppression-based k-anonymisation: quasi-identifiers of rows whose
    * class has < k members are replaced by `"*"` (all QI columns are
    * stringified in the output so the sentinel is typable); the suppressed
    * rows are then re-checked as ONE residual class and dropped entirely
    * if even that class is below k. Non-QI columns pass through
    * unchanged. `suppressed` marks rewritten rows; `class_size` is the
    * PUBLISHED class's size (the residual class's for suppressed rows).
    * The re-check partitions on the rewritten identifiers AND the
    * `suppressed` flag, so genuine `"*"` data colliding with the sentinel
    * cannot smuggle a sub-k group through: the flag is released, hence
    * it is an identifier, hence it is in the partition key. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    val qiSet = qiCols.toSet
    val raw = df.withColumn("_cs", classSize(qiCols))
    val masked = raw.select(
      df.columns.map { c =>
        if (qiSet(c))
          when(col("_cs") >= k, col(c).cast("string"))
            .otherwise(lit("*")).as(c)
        else col(c)
      } :+ (col("_cs") < k).as("suppressed"): _*)
    // Re-count over the REWRITTEN identifiers PLUS the published
    // `suppressed` flag: the flag is visible in the released table, so it
    // is part of the effective identifier tuple — counting without it
    // would let a genuine (*,…,*) class pad the pooled residual past k
    // while the flag still splits them apart for an attacker. With it,
    // survivors keep their original class size, the residual pool is
    // counted alone, and BOTH must clear k to be published.
    masked
      .withColumn("class_size", classSize(qiCols :+ "suppressed"))
      .filter(col("class_size") >= k)
  }
}
