package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.NearDup
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val w = 3
    val arrs = docs.select(col("doc_id"), split(col("text"), " ").as("_toks"))
      .filter(size(col("_toks")) >= w)
      .select(col("doc_id"), array_sort(array_distinct(
        transform(NearDup.shinglesOf(col("_toks"), w), s => xxhash64(s)))).as("arr"))
      .withColumn("n_shingles", size(col("arr"))).persist()
    t("arrs materialize")(arrs.count())
    val prefixLen = (floor((lit(1.0) - 0.5) * col("n_shingles")) + 1).cast("int")
    val prefix = arrs.select(col("doc_id"), explode(slice(col("arr"), lit(1), prefixLen)).as("h"))
    t("prefix count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    val c = t("candidates")(cand.count()); println(s"  n_cand=$c")
    val byId = arrs.select(col("doc_id"), col("arr"), col("n_shingles"))
    val out = cand.join(broadcast(byId.toDF("id_a", "arr_a", "na")), "id_a")
      .join(broadcast(byId.toDF("id_b", "arr_b", "nb")), "id_b")
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    t("verify+filter")(out.count())
    spark.stop()
  }
}
