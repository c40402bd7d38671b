package graft

import org.apache.spark.sql.functions._
import graft.functions.{Clusters, Fuzzy, NearDup, PairStore}

/** Durable pair/cluster store ([[graft.functions.PairStore]]): the
  * persisted pairs and labels must equal a live recompute exactly (the
  * build-once-serve-many contract), singletons must label themselves,
  * and a rebuild must overwrite cleanly. Oracle parity at sf is the
  * `dedup_*_store` / `entity_resolve_store` family in CORRECTNESS. */
class PairStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pairstore_spec").toString

  // Two 3-gram near-dup clusters ({1,2}, {3,4}) + singletons 5, 6.
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "spark catalyst optimizer rewrites logical plans fast"),
    (4L, "spark catalyst optimizer rewrites logical plans slow"),
    (5L, "completely unrelated content lives here alone"),
    (6L, "short")).toDF("doc_id", "text")

  test("stored pairs and labels equal the live recompute") {
    val dir = tmpDir()
    val livePairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    PairStore.build(docs.select(col("doc_id")), livePairs, dir,
      "doc_id", "id_a", "id_b")

    val storedPairs = PairStore.pairs(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(storedPairs == livePairs.as[(Long, Long, Double)].collect().toSet)
    assert(storedPairs.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))

    val storedLabels = PairStore.labels(spark, dir)
      .as[(Long, Long)].collect().toMap
    val liveLabels = Clusters.connectedComponents(
        docs.select(col("doc_id")), livePairs, "doc_id", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(storedLabels == liveLabels)
    // every node present, singletons label themselves
    assert(storedLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L))
  }

  test("rebuild overwrites; label files are node-sorted and 2-column") {
    val dir = tmpDir()
    val pairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    PairStore.build(docs.select(col("doc_id")), pairs, dir,
      "doc_id", "id_a", "id_b")
    // second build on a SHRUNK corpus must fully replace the first
    val less = docs.filter(col("doc_id") <= 2L)
    PairStore.build(less.select(col("doc_id")),
      NearDup.ngramJaccardPairs(less, threshold = 0.5), dir,
      "doc_id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L))
    assert(PairStore.labels(spark, dir).columns.toSeq
      == Seq("doc_id", "cluster_id"))
  }

  test("append == full rebuild, including a batch edge that MERGES old clusters") {
    val dir = tmpDir()
    // old corpus: clusters {1,2} and {3,4}, singleton 5
    val oldNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    PairStore.build(oldNodes, oldPairs, dir, "id", "id_a", "id_b")
    // batch: 6 joins {3,4}; 7 is a singleton; and pair (2,3) MERGES the
    // two old clusters through the quotient graph — the hard case
    val newNodes = Seq(6L, 7L).toDF("id")
    val newPairs = Seq((6L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    PairStore.append(newNodes, newPairs, dir, "id", "id_a", "id_b")

    val incr = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    assert(incr == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      6L -> 1L, 7L -> 7L))
    // row-identical to a from-scratch closure over the union
    val full = graft.functions.Clusters.connectedComponents(
        oldNodes.union(newNodes), oldPairs.union(newPairs),
        "id", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(incr == full)
    // stored pairs accumulated both generations
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 2L), (3L, 4L), (6L, 4L), (2L, 3L)))
    // a second append with NO merging edges (pure growth) also matches
    PairStore.append(Seq(8L, 9L).toDF("id"),
      Seq((8L, 9L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == incr ++ Map(8L -> 8L, 9L -> 8L))
  }

  test("append is idempotent under replay: re-delivering a batch changes nothing") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val nodes = Seq(4L, 5L).toDF("id")
    val batchPairs = Seq((4L, 5L), (2L, 3L)).toDF("id_a", "id_b")
    PairStore.append(nodes, batchPairs, dir, "id", "id_a", "id_b")
    val labels1 = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    val pairs1 = PairStore.pairs(spark, dir).as[(Long, Long)].collect()
    // a restarted ingest loop re-delivers the identical batch
    PairStore.append(nodes, batchPairs, dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == labels1)
    val pairs2 = PairStore.pairs(spark, dir).as[(Long, Long)].collect()
    assert(pairs2.sorted.toSeq == pairs1.sorted.toSeq,
      "replay must not duplicate pair rows")
    assert(labels1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("append with an empty or pair-free batch is the identity on labels") {
    val dir = tmpDir()
    val oldNodes = Seq(1L, 2L, 3L).toDF("id")
    PairStore.build(oldNodes, Seq((1L, 2L)).toDF("id_a", "id_b"), dir,
      "id", "id_a", "id_b")
    val before = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    // batch with new nodes but zero near-dup pairs: pure growth
    PairStore.append(Seq(4L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before + (4L -> 4L))
    // fully empty batch: labels unchanged
    PairStore.append(Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before + (4L -> 4L))
  }

  test("entity store round-trip: fuzzy chain closure with pointer jumping") {
    val dir = tmpDir()
    val terms = Seq("acmee", "acme", "acmees", "bolt", "bolts", "zed")
      .toDF("term")
    PairStore.build(terms, Fuzzy.fuzzyPairs(terms, "term", 1), dir,
      "term", "term_a", "term_b", shortcut = true)
    assert(PairStore.labels(spark, dir).as[(String, String)].collect().toMap
      == Map("acme" -> "acme", "acmee" -> "acme", "acmees" -> "acme",
        "bolt" -> "bolt", "bolts" -> "bolt", "zed" -> "zed"))
  }

  // ---- crash / replay durability ------------------------------------

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)
  /** The store's cluster-residue bucket of a value, computed with the
    * same Catalyst hash the store uses. */
  private def bucketOf(v: Long, buckets: Int = 16): Int =
    Seq(v).toDF("x").select(pmod(hash(col("x")), lit(buckets)).as("b"))
      .collect().head.getInt(0)

  test("replay after a crash between the pairs append and the manifest commit still merges") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    // the crashed half-delivery: the batch's pair files reached pairs/
    // but the process died before committing — exactly the ADVICE window
    val batchPairs = Seq((3L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    batchPairs.write.mode("append").parquet(s"$dir/pairs")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), "precondition: labels still stale")
    assert(PairStore.pairs(spark, dir).count() == 1L,
      "precondition: orphan files are invisible (manifest-addressed reads)")
    // the restarted ingest loop re-delivers the identical batch
    PairStore.append(Seq(4L).toDF("id"), batchPairs, dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      "the batch's merges must survive replay — not be anti-joined away")
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
      == Seq((1L, 2L), (2L, 3L), (3L, 4L)), "and pair rows must not duplicate")
    // vacuum reaps the crashed delivery's orphan files from disk
    PairStore.vacuum(spark, dir, keepLast = 1)
    val onDisk = fs.listStatus(p(s"$dir/pairs"))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val referenced = PairStore.pairs(spark, dir).inputFiles.length
    assert(onDisk == referenced,
      s"vacuum must reap orphans: $onDisk on disk vs $referenced referenced")
  }

  test("recover: uncommitted generations and staging are invisible and removed") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val before = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    // crash mid-commit: a staged write and a renamed-but-never-committed
    // generation dir (manifest v1 was never published)
    Seq((1L, 99L, 0)).toDF("id", "cluster_id", "cbucket")
      .write.partitionBy("cbucket").parquet(s"$dir/labels/_staged_v1")
    Seq((2L, 99L)).toDF("id", "cluster_id")
      .write.parquet(s"$dir/labels/g1b0")
    // even BEFORE recover, readers resolve through the committed
    // manifest and never see the garbage
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap == before)
    PairStore.recover(spark, dir)
    assert(!fs.exists(p(s"$dir/labels/_staged_v1")))
    assert(!fs.exists(p(s"$dir/labels/g1b0")))
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap == before)
    // recover on the healthy store is a no-op
    PairStore.recover(spark, dir)
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap == before)
  }

  test("recover: an uncommitted pairs compaction generation is removed; a committed one serves") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val expected = PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
    // crash mid-compaction: pairs_g1 written but manifest v1 never landed
    spark.read.parquet(s"$dir/pairs").repartition(1)
      .write.parquet(s"$dir/pairs_g1")
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
      == expected, "uncommitted compaction must be invisible")
    PairStore.recover(spark, dir)
    assert(!fs.exists(p(s"$dir/pairs_g1")))
    // a COMMITTED compaction serves the same rows from the new generation
    PairStore.compactPairs(spark, dir)
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
      == expected)
    assert(PairStore.pairs(spark, dir).inputFiles
      .forall(_.contains("pairs_g")), "compacted view must read the generation dir")
  }

  test("append writes ONLY the touched label buckets as a new generation") {
    val dir = tmpDir()
    val nodes = (1L to 40L).toDF("id")
    PairStore.build(nodes, Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"),
      dir, "id", "id_a", "id_b")
    def genDirs(): Set[String] =
      fs.listStatus(p(s"$dir/labels")).map(_.getPath.getName)
        .filter(_.startsWith("g")).toSet
    val before = genDirs()
    // pure-growth singleton: only its own residue bucket gets a new gen
    val nv = 101L
    PairStore.append(Seq(nv).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val added = genDirs() -- before
    // post-CAS generations are salted: g<version>.<salt>b<bucket>
    assert(added.size == 1 &&
      added.head.matches(s"g1\\.\\d+b${bucketOf(nv)}"),
      s"expected one new v1 generation for the fresh node's bucket, got $added")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      .apply(nv) == nv)
  }

  test("append with no effect (full replay of a completed batch) commits nothing") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val nodes = Seq(4L).toDF("id")
    val batch = Seq((3L, 4L)).toDF("id_a", "id_b")
    PairStore.append(nodes, batch, dir, "id", "id_a", "id_b")
    def state(): (Set[String], Set[String]) = (
      fs.listStatus(p(s"$dir/history")).map(_.getPath.getName).toSet,
      fs.listStatus(p(s"$dir/labels")).map(_.getPath.getName).toSet)
    val s1 = state()
    PairStore.append(nodes, batch, dir, "id", "id_a", "id_b")
    assert(state() == s1,
      "a fully-applied replay must take the identity fast path — no new version")
  }

  test("auto-compaction bounds the live pair-file count without changing rows") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    for (i <- 3L to 6L)
      PairStore.append(Seq(i).toDF("id"),
        Seq((i - 1L, i)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b",
        maxPairFiles = 2)
    val live = PairStore.pairs(spark, dir).inputFiles.length
    assert(live <= 2, s"compaction must bound the live file count, got $live")
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
      == (2L to 6L).map(i => (i - 1L, i)))
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == (1L to 6L).map(_ -> 1L).toMap)
    // vacuum then bounds the on-disk count too
    PairStore.vacuum(spark, dir, keepLast = 1)
    val onDisk = fs.listStatus(p(s"$dir/pairs"))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    assert(onDisk <= live, s"superseded pair files must be reaped, got $onDisk")
  }

  test("snapshot: a pinned version stays consistent across racing append + compaction") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L, 4L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val snap = PairStore.snapshot(spark, dir)
    val labels0 = snap.labels.as[(Long, Long)].collect().toMap
    val pairs0 = snap.pairs.as[(Long, Long)].collect().toSet
    // a concurrent reader pinned v0; now the writer merges 3 and 4 into
    // cluster 1 (rewriting several buckets) and compacts the pair files
    PairStore.append(Seq(5L).toDF("id"),
      Seq((2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b"),
      dir, "id", "id_a", "id_b")
    PairStore.compactPairs(spark, dir)
    // the pinned view is bit-stable: same rows as before the race
    assert(snap.labels.as[(Long, Long)].collect().toMap == labels0)
    assert(snap.pairs.as[(Long, Long)].collect().toSet == pairs0)
    // while the live view moved on
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // retention: vacuuming past the pin makes a NEW pin of v0 fail
    // loudly instead of reading half-deleted files — while the LIVE view
    // survives vacuum intact (regression: the live-generation set must
    // be computed per (gen, bucket) PAIR; collapsing it per generation
    // once deleted most of the current version's buckets)
    PairStore.vacuum(spark, dir, keepLast = 1)
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val err = intercept[IllegalArgumentException] {
      PairStore.snapshotAt(spark, dir, snap.version)
    }
    assert(err.getMessage.contains("vacuumed") ||
      err.getMessage.contains("no committed version"))
  }

  // ---- delete (retention / right-to-be-forgotten) ---------------------

  test("delete splits a bridged cluster and re-canonicalizes survivors") {
    val dir = tmpDir()
    // one chain cluster 1-2-3 (2 is the bridge) and one pair {4,5}
    PairStore.build((1L to 6L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b"),
      dir, "id", "id_a", "id_b")
    PairStore.delete(Seq(2L).toDF("id"), dir, "id", "id_a", "id_b")
    // the bridge is gone: 1 and 3 must SPLIT into singletons
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().toSet
      == Set((4L, 5L)), "pairs touching the deleted id are physically gone")
    // deleting a cluster's MINIMUM re-canonicalizes the survivor's label
    PairStore.delete(Seq(4L).toDF("id"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 3L -> 3L, 5L -> 5L, 6L -> 6L))
    assert(PairStore.pairs(spark, dir).count() == 0L)
  }

  test("delete rewrites ONLY the pair files holding a dead pair") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    // second pair file arrives via append; store now has ≥2 pair files
    PairStore.append(Seq(3L, 4L).toDF("id"),
      Seq((3L, 4L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val filesBefore = PairStore.pairs(spark, dir).inputFiles.toSet
    PairStore.delete(Seq(4L).toDF("id"), dir, "id", "id_a", "id_b")
    val filesAfter = PairStore.pairs(spark, dir).inputFiles.toSet
    // the file holding (1,2) is untouched — same physical path survives
    assert(filesBefore.intersect(filesAfter).nonEmpty,
      "files without dead pairs must keep their manifest entries")
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 2L)))
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("delete == full rebuild on the remaining corpus (and replay commits nothing)") {
    val dir = tmpDir()
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    PairStore.build((1L to 8L).toDF("id"), pairs, dir, "id", "id_a", "id_b")
    val dead = Seq(3L, 6L, 99L) // 99 was never stored — must be a no-op
    PairStore.delete(dead.toDF("id"), dir, "id", "id_a", "id_b")
    val got = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    val keepPairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val want = Clusters.connectedComponents(
        Seq(1L, 2L, 4L, 5L, 7L, 8L).toDF("id"), keepPairs,
        "id", "id_a", "id_b").as[(Long, Long)].collect().toMap
    assert(got == want)
    // replay of the same delete batch: identity fast path, no new version
    def state(): (Set[String], Set[String]) = (
      fs.listStatus(p(s"$dir/history")).map(_.getPath.getName).toSet,
      fs.listStatus(p(s"$dir/labels")).map(_.getPath.getName).toSet)
    val s1 = state()
    PairStore.delete(dead.toDF("id"), dir, "id", "id_a", "id_b")
    assert(state() == s1, "replayed delete must commit nothing")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap == got)
  }

  test("a deleted id can be re-ingested cleanly: old pairs never resurrect") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    PairStore.delete(Seq(2L).toDF("id"), dir, "id", "id_a", "id_b")
    // the id returns in a later batch, now near-dup with 3 instead of 1
    PairStore.append(Seq(2L).toDF("id"),
      Seq((2L, 3L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 2L, 3L -> 2L),
      "the pre-delete pair (1,2) must not re-link the re-ingested id")
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().toSet
      == Set((2L, 3L)))
  }

  test("delete: a pinned snapshot keeps the pre-delete view until vacuumed") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val snap = PairStore.snapshot(spark, dir)
    PairStore.delete(Seq(2L).toDF("id"), dir, "id", "id_a", "id_b")
    assert(snap.labels.as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "pinned reader is isolated")
    assert(snap.pairs.as[(Long, Long)].collect().toSet
      == Set((1L, 2L), (2L, 3L)))
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 3L -> 3L))
    // vacuum retires v0 and reaps the superseded pair file from disk
    PairStore.vacuum(spark, dir, keepLast = 1)
    val onDisk = (fs.listStatus(p(s"$dir/pairs")).toSeq ++
        fs.listStatus(p(dir)).toSeq.filter(_.getPath.getName.startsWith("pairs_g"))
          .flatMap(s => fs.listStatus(s.getPath).toSeq))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    assert(onDisk == PairStore.pairs(spark, dir).inputFiles.length,
      "vacuum must reap the pre-delete pair files")
  }

  // ---- randomized invariants (round-11 verdict item 7) ----------------

  test("property: N random appends == full rebuild, and cluster_id is the component min") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n     <- Gen.choose(12, 30)
      edges <- Gen.listOfN(25,
        Gen.zip(Gen.choose(1L, 30L), Gen.choose(1L, 30L)))
      cuts  <- Gen.listOfN(2, Gen.choose(2, 28))
    } yield (n.toLong, edges, cuts)
    for (seed <- 1 to 6) {
      val (n, rawEdges, cuts) =
        gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val universe = (1L to n).toVector
      // pairs must only touch ingested nodes: assign each pair to the
      // batch of its LATEST endpoint (ingest order = id order here)
      val edges = rawEdges.map { case (a, b) => (a.min(n).min(b.min(n)), a.min(n).max(b.min(n))) }
        .filter { case (a, b) => a != b }.distinct
      val bounds = (cuts.map(_.toLong.min(n)).sorted :+ n).distinct
      val batches = (0L +: bounds).distinct.sorted.sliding(2).toSeq.collect {
        case Seq(lo, hi) if hi > lo =>
          (universe.filter(x => x > lo && x <= hi),
            edges.filter { case (a, b) => a.max(b) > lo && a.max(b) <= hi })
      }
      val dir = tmpDir()
      val (n0, e0) = batches.head
      PairStore.build(n0.toDF("id"), e0.toDF("id_a", "id_b"), dir,
        "id", "id_a", "id_b")
      for ((bn, be) <- batches.tail)
        PairStore.append(bn.toDF("id"), be.toDF("id_a", "id_b"), dir,
          "id", "id_a", "id_b")
      val incr = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      val full = Clusters.connectedComponents(
          universe.toDF("id"), edges.toDF("id_a", "id_b"), "id", "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(incr == full, s"seed $seed: incremental != rebuild")
      // canonical-id invariant: every label is its cluster's minimum member
      incr.groupBy(_._2).foreach { case (cid, members) =>
        assert(members.keys.min == cid,
          s"seed $seed: cluster $cid label is not the component min")
      }
    }
  }

  test("property: interleaved appends, deletes, and replays == closure over the survivors") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      edges <- Gen.listOfN(40,
        Gen.zip(Gen.choose(1L, 24L), Gen.choose(1L, 24L)))
      dels  <- Gen.listOfN(3, Gen.listOfN(3, Gen.choose(1L, 24L)))
    } yield (edges, dels)
    // 3 seeds: each runs 3 append(+replay)+delete rounds with 4 closure
    // recomputes — wall-clock-bounded while still exercising merge,
    // split, re-canonicalization, and replay across random graphs
    for (seed <- 1 to 3) {
      val (rawEdges, delPicks) =
        gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val edges = rawEdges.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct
      // batches by id range: (0,8], (8,16], (16,24]; a batch carries the
      // edges whose LATEST endpoint it ingests, restricted to endpoints
      // alive at append time (deletes are removal, not a blocklist — the
      // store's contract filters dead-endpoint pairs out of the closure)
      val batches = Seq((0L, 8L), (8L, 16L), (16L, 24L))
      val dir = tmpDir()
      var alive = Set.empty[Long]
      var liveEdges = Seq.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case ((lo, hi), k) =>
        val nodes = ((lo + 1) to hi).toSeq
        alive ++= nodes
        val be = edges.filter { case (a, b) =>
          a.max(b) > lo && a.max(b) <= hi && alive(a) && alive(b) }
        liveEdges ++= be
        if (k == 0)
          PairStore.build(nodes.toDF("id"), be.toDF("id_a", "id_b"), dir,
            "id", "id_a", "id_b")
        else {
          PairStore.append(nodes.toDF("id"), be.toDF("id_a", "id_b"), dir,
            "id", "id_a", "id_b")
          // whole-batch replay must commit nothing and change nothing
          val before = PairStore.labels(spark, dir)
            .as[(Long, Long)].collect().toMap
          PairStore.append(nodes.toDF("id"), be.toDF("id_a", "id_b"), dir,
            "id", "id_a", "id_b")
          assert(PairStore.labels(spark, dir)
            .as[(Long, Long)].collect().toMap == before,
            s"seed $seed batch $k: replay changed the store")
        }
        val del = delPicks(k).filter(alive).distinct
        if (del.nonEmpty) {
          PairStore.delete(del.toDF("id"), dir, "id", "id_a", "id_b")
          alive --= del
          liveEdges = liveEdges.filter { case (a, b) => alive(a) && alive(b) }
        }
        val got = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
        val want = Clusters.connectedComponents(
            alive.toSeq.toDF("id"), liveEdges.toDF("id_a", "id_b"),
            "id", "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"seed $seed after batch $k: store != rebuild")
      }
    }
  }

  // ---- concurrent writers (manifest CAS) ----------------------------

  test("interleaved appenders: exactly one commits, the loser fails loudly, " +
      "its replay converges") {
    val dir = tmpDir()
    PairStore.build((1L to 6L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    // Appender A reads the v0 manifest and stages its data; at A's CAS
    // window the hook runs appender B's ENTIRE append (which commits
    // v1). A must then abort without touching B's committed state.
    val err = try {
      PairStore.onBeforeAppendCommit = () => {
        PairStore.onBeforeAppendCommit = () => () // B must not recurse
        PairStore.append(Seq(8L).toDF("id"),
          Seq((5L, 8L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
      }
      intercept[java.util.ConcurrentModificationException] {
        PairStore.append(Seq(7L).toDF("id"),
          Seq((3L, 7L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
      }
    } finally PairStore.onBeforeAppendCommit = () => ()
    assert(err.getMessage.contains("concurrent writer"), err.getMessage)
    // exactly B's commit landed: history = {v0, v1}, state = B-only
    assert(fs.listStatus(p(s"$dir/history")).map(_.getPath.getName).toSet
      == Set("v0", "v1"))
    val afterB = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    assert(afterB == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 6L, 8L -> 5L), s"winner's state damaged: $afterB")
    // the loser replays its whole batch against the new head → converges
    PairStore.append(Seq(7L).toDF("id"),
      Seq((3L, 7L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val afterA = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    assert(afterA == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 6L, 7L -> 3L, 8L -> 5L), s"replay diverged: $afterA")
    val pairs = PairStore.pairs(spark, dir).as[(Long, Long)]
      .collect().sorted.toSeq
    assert(pairs == Seq((1L, 2L), (3L, 7L), (5L, 8L)),
      s"pair table wrong after the race + replay: $pairs")
  }

  test("commit CAS: a version published mid-append aborts the commit " +
      "with the store unharmed") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val before = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    val v0 = {
      val in = fs.open(p(s"$dir/history/v0"))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    }
    val err = try {
      PairStore.onBeforeAppendCommit = () => {
        // a competing writer publishes v1 (same content, new version)
        // right inside A's CAS window — the narrowest possible race
        val out = fs.create(p(s"$dir/history/v1"), true)
        try out.write(v0.replace("version 0", "version 1").getBytes("UTF-8"))
        finally out.close()
      }
      intercept[java.util.ConcurrentModificationException] {
        PairStore.append(Seq(4L).toDF("id"),
          Seq((3L, 4L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
      }
    } finally PairStore.onBeforeAppendCommit = () => ()
    assert(err.getMessage.contains("committed by a concurrent writer"),
      err.getMessage)
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before, "aborted commit must leave the committed state untouched")
  }

  test("a losing writer's orphan generation survives recover (same-version) " +
      "and is reaped by vacuum") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    PairStore.append(Seq(3L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    // fabricate a losing v1 attempt's salted generation: same version
    // as the committed head, unreferenced by any manifest
    val orphan = s"$dir/labels/g1.99999b0"
    Seq((42L, 42L)).toDF("id", "cluster_id").write.parquet(orphan)
    val before = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    PairStore.recover(spark, dir)
    assert(fs.exists(p(orphan)),
      "recover must not reap a same-version generation (it cannot tell a " +
        "loser's orphan from a LIVE writer's in-flight data)")
    PairStore.vacuum(spark, dir, keepLast = 2)
    assert(!fs.exists(p(orphan)), "vacuum must reap unreferenced generations")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before, "orphan lifecycle must never leak into the served labels")
  }

  test("an in-flight writer's NEXT-version staging survives a concurrent " +
      "append (writers never auto-recover)") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    // writer A mid-flight at version 1: salted staging root, a renamed
    // salted generation, and a tmp manifest — none committed yet
    val staged = s"$dir/labels/_staged_v1.7777"
    val gen = s"$dir/labels/g1.7777b0"
    val tmpMan = s"$dir/history/.tmp_v1_7777"
    Seq((9L, 9L, 0)).toDF("id", "cluster_id", "cbucket")
      .write.partitionBy("cbucket").parquet(staged)
    Seq((9L, 9L)).toDF("id", "cluster_id").write.parquet(gen)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmpMan), "version 1\n")
    // writer B's whole append runs to a successful commit meanwhile —
    // it must NOT reap A's in-flight state (the old implicit recover
    // did exactly that, turning the one-winner CAS into both-abort)
    PairStore.append(Seq(3L).toDF("id"),
      Seq((2L, 3L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(fs.exists(p(staged)) && fs.exists(p(gen)) && fs.exists(p(tmpMan)),
      "a concurrent append must leave another writer's in-flight data alone")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "B's append must commit normally around A's staging")
    // A's commit now loses the CAS (version 1 was taken by B) — its
    // leftovers become garbage for the EXPLICIT maintenance pass
    PairStore.recover(spark, dir)
    assert(!fs.exists(p(staged)) && !fs.exists(p(tmpMan)),
      "explicit recover (no writer live) reaps staging and tmp manifests")
  }

  test("randomized kill-replay: writes killed in the pre-commit window " +
      "(generations staged, manifest unpublished) replay to convergence; " +
      "recover+vacuum reap the crashed staging with served state unchanged") {
    // three appends + a delete — the verb mix [[PairStore.onBeforeCommit]]
    // covers (the seam fires inside commitManifest for every write verb)
    val appends = Seq(
      (Seq(3L, 4L), Seq((2L, 3L), (3L, 4L))),
      (Seq(5L, 6L), Seq((5L, 6L))),
      (Seq(7L), Seq((1L, 7L))))
    val delIds = Seq(4L)

    def runStore(kills: Seq[Boolean]): String = {
      val dir = tmpDir()
      PairStore.build(Seq(1L, 2L).toDF("id"),
        Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
      def guarded(kill: Boolean)(op: => Unit): Unit =
        if (!kill) op
        else {
          val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
          PairStore.onBeforeCommit = () =>
            if (armed.getAndSet(false))
              throw new RuntimeException("injected crash: pre-commit")
          try intercept[RuntimeException](op)
          finally PairStore.onBeforeCommit = () => ()
          // the caller's at-least-once redelivery: replay the whole verb
          op
        }
      appends.zipWithIndex.foreach { case ((ns, es), i) =>
        guarded(kills(i))(PairStore.append(ns.toDF("id"),
          es.toDF("id_a", "id_b"), dir, "id", "id_a", "id_b"))
      }
      guarded(kills(3))(
        PairStore.delete(delIds.toDF("id"), dir, "id", "id_a", "id_b"))
      dir
    }
    def labelsOf(dir: String): Map[Long, Long] =
      PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    def pairsOf(dir: String): Seq[(Long, Long)] =
      PairStore.pairs(spark, dir).as[(Long, Long)].collect().sorted.toSeq
    def genDirs(dir: String): Int =
      fs.listStatus(p(s"$dir/labels")).count(_.isDirectory)

    // uninterrupted reference run, taken through the same maintenance
    val ref = runStore(Seq(false, false, false, false))
    val refLabels = labelsOf(ref)
    val refPairs = pairsOf(ref)
    PairStore.recover(spark, ref)
    PairStore.vacuum(spark, ref, keepLast = 1)
    val refGens = genDirs(ref)

    val rnd = new scala.util.Random(0xBADC0DE)
    for (scenario <- 1 to 3) {
      var kills = Seq.fill(4)(rnd.nextBoolean())
      if (!kills.exists(identity)) kills = kills.updated(scenario % 4, true)
      val dir = runStore(kills)
      assert(labelsOf(dir) == refLabels,
        s"scenario $scenario (kills=$kills): labels diverged after replay")
      assert(pairsOf(dir) == refPairs,
        s"scenario $scenario (kills=$kills): pair table diverged")
      // killed attempts left staged-but-unreferenced generations behind;
      // the explicit maintenance pass (no writer live) reaps them all —
      // the store's physical layout returns to the uninterrupted run's
      PairStore.recover(spark, dir)
      PairStore.vacuum(spark, dir, keepLast = 1)
      assert(labelsOf(dir) == refLabels && pairsOf(dir) == refPairs,
        s"scenario $scenario: recover+vacuum changed the served state")
      assert(genDirs(dir) == refGens,
        s"scenario $scenario (kills=$kills): crashed staging survived " +
          s"recover+vacuum (${genDirs(dir)} label generations vs $refGens)")
    }
  }
}
