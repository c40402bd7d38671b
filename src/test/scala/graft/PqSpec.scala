package graft

import org.apache.spark.sql.functions._

import graft.functions.{Pq, Similarity}

/** IVF-PQ: codebook determinism, encode/LUT consistency, recall. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf0001)
  private lazy val q = e.filter(col("vec_id") < 10)

  test("lloyd is deterministic and returns k centers") {
    val pts = Array.tabulate(100)(i =>
      Array.tabulate(4)(j => ((i * 7 + j * 13) % 29).toDouble))
    val a = Pq.lloyd(pts, 8, 8, seed = 1L)
    val b = Pq.lloyd(pts, 8, 8, seed = 1L)
    assert(a.length == 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("probeCells degrades deterministically on an all-NaN score row") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    val halfNorms = centroids.map(c => c.map(x => x * x).sum / 2)
    val nanVec = new GenericArrayData(Array[Any](Double.NaN, Double.NaN))
    // NaN never wins a '>' comparison — the probe must fall back to the
    // lowest-index unused cells instead of used(-1) AIOOBE
    val got = graft.plans.PqKernels
      .probeCells(nanVec, centroids, halfNorms, nProbe = 2)
    assert((0 until got.numElements()).map(got.getInt).toSeq == Seq(0, 1))
    // a healthy vector is unaffected
    val ok = new GenericArrayData(Array[Any](1.0, 0.0))
    val top = graft.plans.PqKernels
      .probeCells(ok, centroids, halfNorms, nProbe = 1)
    assert(top.getInt(0) == 0)
  }

  test("ADC of a vector against its own codes is the quantization floor") {
    // For every corpus vector: the ADC distance between the vector and its
    // own code sequence equals the summed sub-quantization error, which
    // must be < the distance to a random OTHER vector's codes on average.
    val cb = Pq.trainCodebooks(e, "embedding", m = 8, k = 16)
    val v = e.limit(50)
      .select(Similarity.asDouble(col("embedding")).as("raw"))
      .withColumn("_n", Similarity.l2norm(col("raw")))
      .withColumn("nv", transform(col("raw"), x => x / col("_n")))
    val scored = v.select(
      aggregate(
        zip_with(Pq.encodeCol(col("nv"), cb),
          sequence(lit(0), lit(7)),
          (code, mi) => element_at(Pq.lutCol(col("nv"), cb), mi * 16 + code + 1)),
        lit(0.0), (acc, x) => acc + x).as("self_adc"))
      .as[Double].collect()
    // unit vectors: self-quantization error is bounded well below the
    // ~2.0 squared distance of orthogonal unit vectors
    assert(scored.forall(_ >= 0.0))
    assert(scored.sum / scored.length < 1.0,
      s"mean self-ADC ${scored.sum / scored.length} not a quantization floor")
  }

  test("native kernels are bit-identical to the HOF reference forms") {
    val cb = Pq.trainCodebooks(e, "embedding", m = 8, k = 16)
    val centroids = graft.functions.Ivf.centroidsFor(e, "embedding", 16)
    val v = e.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("raw"))
      .withColumn("_n", Similarity.l2norm(col("raw")))
      .withColumn("nv", transform(col("raw"), x => x / col("_n")))
    // encode: HOF takes the normalized vector, native normalizes inside
    val enc = v.select(
      Pq.encodeCol(col("nv"), cb).as("hof"),
      graft.plans.PqNative.encodeNative(col("raw"), cb).as("nat"))
      .collect()
    assert(enc.forall(r => r.getSeq[Int](0) == r.getSeq[Int](1)),
      "native encode diverges from HOF reference")
    val lut = v.select(
      Pq.lutCol(col("nv"), cb).as("hof"),
      graft.plans.PqNative.lutNative(col("raw"), cb).as("nat"))
      .collect()
    assert(lut.forall(r => r.getSeq[Double](0) == r.getSeq[Double](1)),
      "native LUT diverges from HOF reference")
    val probes = v.select(
      graft.functions.Ivf.probeCellsHof(col("raw"), centroids, 4).as("hof"),
      graft.plans.PqNative.probeCellsNative(col("raw"), centroids, 4).as("nat"))
      .collect()
    assert(probes.forall(r => r.getSeq[Int](0) == r.getSeq[Int](1)),
      "native cell probe diverges from HOF reference")
  }

  test("pq ann recall vs brute force on sf0.001 embeddings") {
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = Pq.pqTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // bounded by the IVF probe recall (same 16-cell/4-probe regime as the
    // ivf test); PQ's re-rank cannot lose candidates the probe found
    assert(recall >= 0.4, s"pq recall $recall too low")
  }

  test("full probe + large rerank through PQ equals exact brute force") {
    // nProbe = nCells and a rerank window bigger than any cell's candidate
    // count degenerate IVF-PQ to exact search — pinning the whole
    // candidate/shortlist/re-rank plumbing to the exact answer.
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
    val full = Pq.pqTopK(e, q, "vec_id", "embedding", 3,
      nProbe = 16, rerank = 1000)
    assert(rows(full) == rows(exact))
  }
}
