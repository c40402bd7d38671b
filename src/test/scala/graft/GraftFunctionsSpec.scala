package graft

import org.apache.spark.sql.functions._
import graft.functions.{NearDup, Similarity}

/** SQL surface: the registered functions resolve to the SAME Catalyst
  * expressions as the Scala API (bit-identical results, same plans). */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_cosine from SQL equals the native kernel Column API") {
    val e = Tables.embeddings(spark, sf0001).limit(50).cache()
    e.createOrReplaceTempView("_gf_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_cosine(embedding, embedding) AS c FROM _gf_emb")
      .as[(Long, Double)].collect().toMap
    val viaApi = e.select(col("vec_id"),
      Similarity.cosine(
        Similarity.asDouble(col("embedding")),
        Similarity.asDouble(col("embedding"))).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(viaSql == viaApi)
    viaSql.values.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("graft_simhash64 / graft_shingles / graft_sorted_intersect / graft_dot") {
    val r = spark.sql(
      "SELECT graft_simhash64('the quick brown fox') AS sh, " +
        "graft_shingles('a b c d', 3) AS sg, " +
        "graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS si, " +
        "graft_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d").collect().head
    val expectedSh = Seq(("x", "the quick brown fox")).toDF("k", "t")
      .select(NearDup.simhash64(col("t"))).as[Long].head()
    assert(r.getLong(0) == expectedSh)
    assert(r.getSeq[String](1).toSet == Set("a b c", "b c d"))
    assert(r.getInt(2) == 2)
    assert(r.getDouble(3) == 11.0)
  }

  test("graft_vector_sum / graft_bottom_k aggregates from SQL match the Column API") {
    val df = (1 to 50).map(i => (i % 2, Array(i.toLong, -i.toLong), i.toString))
      .toDF("g", "v", "s")
    df.createOrReplaceTempView("_gf_agg")
    val viaSql = spark.sql(
      "SELECT g, graft_vector_sum(v, 2) AS vs, graft_bottom_k(s, 3) AS bk " +
        "FROM _gf_agg GROUP BY g")
      .as[(Int, Seq[Long], Seq[String])].collect()
      .map(r => r._1 -> ((r._2.toList, r._3.toList))).toMap
    val viaApi = df.groupBy("g").agg(
        graft.plans.VectorSumFixed.vectorSum(col("v"), 2).as("vs"),
        graft.plans.BottomKByHash.bottomK(col("s"), 3).as("bk"))
      .as[(Int, Seq[Long], Seq[String])].collect()
      .map(r => r._1 -> ((r._2.toList, r._3.toList))).toMap
    assert(viaSql == viaApi)
    // dim/k must be literals (the analyzer wraps our AnalysisException)
    val e = intercept[Exception](
      spark.sql("SELECT graft_vector_sum(v, g) FROM _gf_agg GROUP BY g").collect())
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("extensions hook registers the same functions at session build") {
    // exercise the SparkSessionExtensions path directly (the shared test
    // session is already built, so apply the injections to a fresh
    // extensions object and check the registry descriptors)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // injection is only observable through a session build; the contract
    // checked here is that apply() itself wires every declared function
    // without throwing, and names stay in sync with the session-level path
    assert(GraftFunctions.all.map(_._1).toSet == Set(
      "graft_cosine", "graft_sorted_intersect", "graft_simhash64",
      "graft_shingles", "graft_dot", "graft_vector_sum", "graft_bottom_k",
      "graft_heavy_hitters"))
  }
}
