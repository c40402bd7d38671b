package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}

/** The store tier's shared manifest-commit protocol — the mechanics
  * [[PairStore]] proved out (salted immutable data generations, one small
  * versioned manifest file as the single commit point, version CAS,
  * exclusive publish, read-back ownership verify), factored out so
  * [[SignatureStore]] and [[IvfIndex]] commit under the SAME contract
  * instead of re-deriving it. Layout convention under a store `dir`:
  *
  *   - data lands in salted generation dirs no two attempts can collide
  *     on (`<prefix>_g<salt>`), written completely BEFORE any commit;
  *   - `history/v<N>` is the version-N manifest: newline-separated
  *     `key value...` lines, including a per-commit `nonce` line that
  *     makes the published content ownable;
  *   - publishing the manifest IS the commit. A crash before it leaves
  *     unreferenced garbage (reaped by the store's vacuum); a loser of a
  *     racing commit throws `ConcurrentModificationException` with the
  *     store unharmed.
  *
  * '''Exclusive publish.''' HDFS `rename` onto an existing file fails
  * atomically, but POSIX rename(2) REPLACES — so on local filesystems the
  * exists-precheck + rename protocol has a residual window where a
  * stalled loser clobbers a winner that already read-back-verified. Here
  * the local-FS publish goes through `Files.createLink` (hard link,
  * atomic create-exclusive at the kernel level) instead of rename, which
  * closes that window completely: of N same-version publishers, the
  * filesystem itself admits exactly one.
  */
private[graft] object StoreCommit {

  def fsOf(spark: org.apache.spark.sql.SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed manifest versions under `dir/history`. */
  def committedVersions(fs: FileSystem, dir: String): Seq[Long] = {
    val hist = new Path(s"$dir/history")
    if (!fs.exists(hist)) Seq.empty
    else fs.listStatus(hist).toSeq
      .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toLong))
  }

  /** Newest committed version, or a loud failure naming the store. */
  def currentVersion(fs: FileSystem, dir: String, store: String): Long =
    committedVersions(fs, dir).maxOption.getOrElse(
      throw new IllegalStateException(
        s"$dir is not a $store (no committed manifest) — run build() first"))

  /** Non-empty trimmed lines of manifest `v` (throws if never committed).
    * Always a PHYSICAL read — [[commitManifest]]'s read-back ownership
    * verify depends on seeing the actual on-disk bytes. Serve paths go
    * through [[readManifestLinesCached]]. */
  def readManifestLines(fs: FileSystem, dir: String, v: Long): Seq[String] = {
    manifestFileReads.incrementAndGet()
    val in = fs.open(new Path(s"$dir/history/v$v"))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    finally in.close()
  }

  /** Physical manifest-file reads performed by this JVM — the test seam
    * pinning that pinned-version serve reads hit the memo (no second
    * open of `history/vN`), the memo-equivalent of [[onBeforeCommit]]-
    * style seams elsewhere in the store tier. */
  private[graft] val manifestFileReads =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** [[readManifestLines]] through a per-JVM memo — the SERVE path.
    *
    * Committed manifests are immutable by the protocol (publish is
    * create-exclusive; nothing ever rewrites `history/vN` in place), so
    * (dir, version) → lines is a pure function and every query against a
    * pinned or current version can skip the open+read after the first —
    * measured at +0.3–0.6 s/query across the ANN/IVF serve family when
    * each probe re-resolved its manifest (round-14 drift). Three
    * staleness edges, all handled:
    *
    *   - a SAME-JVM rebuild (build() restarts history at v0 in the same
    *     dir) would alias old content under a recycled (dir, v) key —
    *     [[commitManifest]] drops the dir's memo entries on every
    *     commit, and commits are the only in-JVM way (dir, v) content
    *     can change;
    *   - a CROSS-JVM rebuild can recycle (dir, v0) without this JVM ever
    *     seeing a commit — so every memo hit is validated against the
    *     manifest's leading `nonce` line via ONE positional read of its
    *     first bytes ([[validateNonceHit]]): the nonce is minted fresh
    *     per commit (62 random bits), so a recycled (dir, v) can NEVER
    *     serve stale lines — unlike the pre-round-17 (length,
    *     modificationTime) stat compare, which aliased a same-length
    *     rewrite landing within the filesystem's mtime granularity tick.
    *     Cost: an open + ≤64-byte pread instead of a stat — on an object
    *     store a ranged GET in place of a HEAD; still never the full
    *     read+parse the memo exists to avoid. Manifests written before
    *     the nonce-first layout (no leading nonce line) fall back to the
    *     (length, mtime) compare, where a same-length same-tick rewrite
    *     is undetectable — the detector caveat ADVICE r16 flagged, now
    *     confined to the legacy layout;
    *   - a VACUUMED version's entry outlives its file, but the
    *     validating open/stat (and every read path's
    *     `fs.exists(history/vN)` / [[currentVersion]] gate) fails
    *     loudly on the missing file, so retired pins never serve from
    *     memory.
    *
    * Bounded LRU (manifests are small, but a fleet of temp stores in one
    * long JVM must not accumulate forever). */
  def readManifestLinesCached(
      fs: FileSystem, dir: String, v: Long): Seq[String] = {
    val k = (memoDir(fs, dir), v)
    val p = new Path(s"$dir/history/v$v")
    // access-ordered LRU, locked only for the map get/put — the physical
    // read on a miss runs OUTSIDE the lock (a global lock held across a
    // slow-FS open would serialize every concurrent serve path behind
    // one store's manifest I/O). Two racers missing one key both read —
    // committed manifests are immutable, so the duplicate read is
    // harmless and last-put-wins leaves identical content.
    manifestMemo.get(k) match {
      case Some(e) if e.nonceLine.isDefined =>
        // sound path: one positional read of the leading nonce line
        if (validateNonceHit(fs, p, e.nonceLine.get)) e.lines
        else memoizeFresh(fs, dir, v, k)
      case Some(e) =>
        // legacy layout (no leading nonce): best-effort stat compare
        val st = fs.getFileStatus(p)
        if (e.len == st.getLen && e.mtime == st.getModificationTime) e.lines
        else memoizeFresh(fs, dir, v, k)
      case None => memoizeFresh(fs, dir, v, k)
    }
  }

  private def memoizeFresh(
      fs: FileSystem, dir: String, v: Long, k: (String, Long)): Seq[String] = {
    val st = fs.getFileStatus(new Path(s"$dir/history/v$v"))
    val lines = readManifestLines(fs, dir, v)
    val e = ManifestMemoEntry(lines,
      lines.headOption.filter(_.startsWith("nonce ")),
      st.getLen, st.getModificationTime)
    manifestMemo.put(k, e)
    e.lines
  }

  /** ONE positional read deciding whether the on-disk manifest is still
    * the commit the memo captured: true iff the file's first bytes are
    * exactly `<nonceLine>\n`. Nonces are fresh 62-bit draws per commit,
    * so a match identifies the commit (a different commit recycling the
    * same (dir, v) AND drawing the same nonce is a 2^-62 event — the
    * same negligibility class as the salted-staging collision the
    * protocol already accepts). A missing file (vacuumed version)
    * propagates the loud FileNotFoundException; a short file reads as a
    * mismatch → full re-read. */
  private def validateNonceHit(
      fs: FileSystem, p: Path, nonceLine: String): Boolean = {
    manifestNonceChecks.incrementAndGet()
    val expect = (nonceLine + "\n").getBytes("UTF-8")
    val buf = new Array[Byte](expect.length)
    val in = fs.open(p)
    try { in.readFully(0L, buf); java.util.Arrays.equals(buf, expect) }
    catch { case _: java.io.EOFException => false }
    finally in.close()
  }

  /** Positional nonce validations performed — test observability for the
    * hit path (full physical reads count in [[manifestFileReads]]). */
  private[graft] val manifestNonceChecks =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private final case class ManifestMemoEntry(
      lines: Seq[String], nonceLine: Option[String], len: Long, mtime: Long)

  /** Thread-safe bounded access-ordered LRU — the memo's eviction
    * policy, factored out so its semantics are directly unit-testable
    * at a small capacity (the production memo's 1024 is not). `get`
    * marks an entry hot; on overflow the coldest entry alone is
    * evicted. All operations lock only for the map access — callers
    * keep I/O outside. */
  private[graft] final class LruMap[K, V](capacity: Int) {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        this.size() > capacity
    }
    def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
    def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
    def removeIf(p: K => Boolean): Unit = m.synchronized {
      val it = m.keySet().iterator()
      while (it.hasNext) if (p(it.next())) it.remove()
    }
    def size: Int = m.synchronized(m.size())
    def keys: Set[K] = m.synchronized {
      val b = Set.newBuilder[K]
      m.keySet().forEach(k => b += k)
      b.result()
    }
  }

  /** Bounded access-ordered LRU: a fleet of temp stores in one long JVM
    * evicts its coldest (dir, version) entries instead of periodically
    * dropping the whole memo (the pre-round-16 crude bound, which made
    * every live store pay a re-read after any 1025th store appeared). */
  private val manifestMemo = new LruMap[(String, Long), ManifestMemoEntry](1024)

  /** Memo key for a store dir: the FS-qualified path string, so
    * `/a/b`, `/a/b/` and `file:///a/b` address ONE entry set — both the
    * cache key and commit-time invalidation must agree or a reader
    * keyed under a variant spelling would survive a rebuild's
    * invalidation and serve pre-rebuild lines. */
  private def memoDir(fs: FileSystem, dir: String): String =
    fs.makeQualified(new Path(dir)).toString

  private[functions] def invalidateManifestMemo(
      fs: FileSystem, dir: String): Unit = {
    val d = memoDir(fs, dir)
    manifestMemo.removeIf(_._1 == d)
  }

  /** Publish `lines` (plus a generated `nonce` line) as version `v` of
    * the store at `dir` — the CAS commit point. Guards, in order:
    *
    *  1. '''Version CAS''': any committed version ≥ `v` means another
    *     writer advanced the store since this commit's manifest was read
    *     — abort loudly; the caller's batch replays against the new head.
    *  2. '''Referenced-data verify''': every path in `referenced` must
    *     exist on disk — a concurrent vacuum may have reaped this
    *     writer's staged-but-uncommitted generation (it is unreferenced
    *     until the commit lands, which is exactly what a reap set is
    *     computed from); publishing a manifest that points at deleted
    *     data would corrupt the store, so that race dies HERE, loudly,
    *     and the caller replays. (The vacuum side narrows the same
    *     window from its end with [[assertVersionsUnchanged]].)
    *  3. '''Exclusive publish''': full write to a salted tmp name, then
    *     an atomic create-exclusive move onto `history/v<N>`
    *     ([[exclusiveMoveFile]] — hard-link on local FS, refuse-existing
    *     rename elsewhere).
    *  4. '''Read-back ownership verify''': the committed content must
    *     carry OUR nonce — belt-and-braces for filesystems whose rename
    *     semantics we can't prove exclusive.
    *
    * Exactly one of N same-version racers returns; the rest throw
    * `ConcurrentModificationException` with the store unharmed. */
  def commitManifest(
      fs: FileSystem, dir: String, v: Long, lines: Seq[String],
      store: String, referenced: Seq[Path] = Seq.empty): Unit = {
    val latest = committedVersions(fs, dir).maxOption
    if (latest.exists(_ >= v))
      throw new java.util.ConcurrentModificationException(
        s"$store commit v$v aborted: version ${latest.get} was committed " +
          "by a concurrent writer since this batch began — replay the " +
          "batch against the new head")
    referenced.find(!fs.exists(_)).foreach(p =>
      throw new java.util.ConcurrentModificationException(
        s"$store commit v$v aborted: referenced $p is missing (a " +
          "concurrent vacuum reaped this writer's uncommitted " +
          "generation?) — replay the batch"))
    val nonce = java.util.concurrent.ThreadLocalRandom.current()
      .nextLong(1L, Long.MaxValue)
    // the nonce line leads so [[validateNonceHit]] can identify the
    // commit from the file's first bytes alone (manifest parsers are
    // line-order-insensitive)
    val all = s"nonce $nonce" +: lines
    val tmp = new Path(s"$dir/history/.tmp_v${v}_$nonce")
    fs.mkdirs(new Path(s"$dir/history"))
    val out = fs.create(tmp, true)
    try out.write((all.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    try exclusiveMoveFile(fs, tmp, new Path(s"$dir/history/v$v"), store)
    catch { case e: Throwable => fs.delete(tmp, false); throw e }
    val back = readManifestLines(fs, dir, v)
    if (!back.contains(s"nonce $nonce"))
      throw new java.util.ConcurrentModificationException(
        s"$store commit v$v: published manifest content is not ours — " +
          "lost a same-version publish race; replay the batch")
    // every commit drops the dir's memoized manifests: a build() that
    // restarted history at this dir must not serve pre-rebuild content
    // under a recycled (dir, version) key
    invalidateManifestMemo(fs, dir)
  }

  /** Publish strategies [[exclusiveMoveFile]] dispatches between, BY
    * FILESYSTEM SCHEME, because "rename refuses an existing destination
    * atomically" is a per-filesystem guarantee, not a universal one:
    *
    *   - `HardLink` (local `file`): `Files.createLink` is an atomic
    *     O_EXCL-grade create — POSIX rename(2) REPLACES silently, so the
    *     precheck+rename protocol is NOT exclusive there;
    *   - `AtomicRename` (`hdfs`, `viewfs`, `webhdfs`/`swebhdfs`,
    *     `ofs`/`o3fs`, `alluxio` — an explicit ALLOWLIST): these
    *     filesystems implement single-file rename as an atomic
    *     namespace operation that FAILS on an existing destination —
    *     precheck+rename is belt-and-braces on top of that guarantee.
    *     A deployer who can vouch for another filesystem's
    *     refuse-existing rename extends the allowlist via
    *     `graft.store.publish.trust-rename-schemes` (comma-separated);
    *   - `ConditionalPut` (the object-store schemes, OPT-IN via
    *     `graft.store.publish.conditional-put=true`): skip the move
    *     entirely and write the destination directly through
    *     `createFile(dst).overwrite(false)` — on connectors with
    *     conditional-write support the final PUT carries the store's
    *     create-if-absent precondition (S3 `If-None-Match: *` under
    *     Hadoop 3.4.1+ S3A conditional create; GCS
    *     `if-generation-match: 0`), so the OBJECT STORE ITSELF admits
    *     exactly one of N racers at close(). Setting the flag is the
    *     deployer's statement that the connector enforces the
    *     precondition (e.g. `fs.s3a.create.conditional.enabled`);
    *     the caller-side read-back verify (nonce / content — guard 4
    *     of every commit path) remains the final arbiter on top;
    *   - `Unsupported` (those same object-store schemes WITHOUT the
    *     opt-in, and any scheme not allowlisted): object-store "rename"
    *     is COPY+DELETE — two racing publishers can both pass the
    *     exists-precheck and both "succeed", silently clobbering
    *     committed state; and an unknown filesystem's rename semantics
    *     are unprovable, so `exclusiveMoveFile` call sites WITHOUT a
    *     read-back verify (generation-data publishes) would be
    *     protected by nothing at all there (the r16 ADVICE finding on
    *     defaulting unknowns to rename). Publishing throws a documented
    *     error demanding the conditional-put opt-in, the trust-rename
    *     assertion, or external coordination. Failing loudly at the
    *     first publish beats corrupting a manifest history at the
    *     100th. */
  private[graft] sealed trait PublishStrategy
  private[graft] case object HardLink extends PublishStrategy
  private[graft] case object AtomicRename extends PublishStrategy
  private[graft] case object ConditionalPut extends PublishStrategy
  private[graft] case object Unsupported extends PublishStrategy

  /** Opt-in: the deployed object-store connector enforces a
    * create-if-absent precondition on `overwrite(false)` writes. */
  private[graft] val ConditionalPutKey = "graft.store.publish.conditional-put"
  /** Deployer-asserted additional refuse-existing-rename schemes. */
  private[graft] val TrustRenameKey = "graft.store.publish.trust-rename-schemes"

  private val RenameAllowlist = Set(
    "hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs", "alluxio")
  private val ObjectStoreSchemes = Set(
    "s3a", "s3", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss",
    "cos", "swift")

  private[graft] def publishStrategy(scheme: String): PublishStrategy =
    publishStrategy(scheme, conditionalPut = false, trusted = Set.empty)

  private[graft] def publishStrategy(
      scheme: String, conditionalPut: Boolean,
      trusted: Set[String]): PublishStrategy = {
    val s = Option(scheme).map(_.toLowerCase(java.util.Locale.ROOT))
      .getOrElse("file")
    if (s == "file") HardLink
    else if (RenameAllowlist(s) || trusted(s)) AtomicRename
    else if (ObjectStoreSchemes(s) && conditionalPut) ConditionalPut
    else Unsupported
  }

  private def strategyFor(fs: FileSystem): PublishStrategy = {
    val conf = fs.getConf
    publishStrategy(
      fs.getUri.getScheme,
      conditionalPut =
        conf != null && conf.getBoolean(ConditionalPutKey, false),
      trusted =
        if (conf == null) Set.empty
        else conf.getTrimmedStrings(TrustRenameKey).toSet
          .map((x: String) => x.toLowerCase(java.util.Locale.ROOT)))
  }

  private def refusedExisting(
      store: String, src: Path, dst: Path): Nothing =
    throw new java.util.ConcurrentModificationException(
      s"$store: publish $src -> $dst refused — destination already exists " +
        "(concurrent writer?); never overwriting committed state")

  /** Move FILE `src` onto `dst`, failing (never clobbering) if `dst`
    * exists — dispatched per scheme via [[publishStrategy]]: hard link
    * on local FS, exists-precheck + atomic-refusing rename on the
    * allowlisted HDFS-family stores, an opt-in conditional-put direct
    * write on object stores, and a LOUD refusal everywhere else (see
    * [[PublishStrategy]] and SCALING.md's per-scheme guarantee table). */
  def exclusiveMoveFile(
      fs: FileSystem, src: Path, dst: Path, store: String): Unit =
    strategyFor(fs) match {
      case Unsupported =>
        throw new UnsupportedOperationException(
          s"$store: exclusive publish is not implementable on " +
            s"'${fs.getUri.getScheme}' (object-store rename is copy+delete " +
            "and unlisted filesystems' rename semantics are unprovable; " +
            "two racing publishers can both pass the exists check and both " +
            "\"succeed\"). Either opt in to conditional-put publishes where " +
            s"the connector supports create-if-absent ('$ConditionalPutKey'" +
            "=true, e.g. Hadoop 3.4.1+ S3A with conditional create), assert " +
            s"refuse-existing rename via '$TrustRenameKey', or deploy the " +
            "store tier's writers single-writer behind external " +
            "coordination (e.g. a lock service), or use an HDFS-family or " +
            "local staging filesystem for manifests")
      case ConditionalPut =>
        conditionalPutPublish(fs, src, dst, store)
      case HardLink =>
        val s = java.nio.file.Paths.get(src.toUri.getPath)
        val d = java.nio.file.Paths.get(dst.toUri.getPath)
        val linked =
          try { java.nio.file.Files.createLink(d, s); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              refusedExisting(store, src, dst)
            case _: UnsupportedOperationException =>
              // no hard links on this volume — fall back to the precheck path
              if (fs.exists(dst)) refusedExisting(store, src, dst)
              if (!fs.rename(src, dst))
                throw new IllegalStateException(
                  s"$store: rename $src -> $dst failed")
              false
          }
        // link landed; drop the tmp name (via the Hadoop FS so checksum
        // sidecars written by LocalFileSystem go with it)
        if (linked) fs.delete(src, false)
        ()
      case AtomicRename =>
        if (fs.exists(dst)) refusedExisting(store, src, dst)
        if (!fs.rename(src, dst))
          throw new IllegalStateException(s"$store: rename $src -> $dst failed")
    }

  /** The `ConditionalPut` publish: copy the staged FILE's bytes (small
    * by protocol — manifests and `_MODEL` pointers, never data
    * generations, which are salted-unique and need no exclusivity) into
    * a `createFile(dst).overwrite(false)` stream. On a
    * conditional-write-capable connector the precondition rides the
    * final PUT, so of N racers the store itself fails all but one AT
    * CLOSE — the loser surfaces as `FileAlreadyExistsException` or a
    * connector `PathIOException` (S3A's RemoteFileChangedException on a
    * 412), both mapped to the protocol's replay signal
    * (`ConcurrentModificationException`). A genuine I/O failure inside
    * that window maps to the same replay signal — safe: the caller
    * replays, and the read-back verify arbitrates whatever landed. */
  private[graft] def conditionalPutPublish(
      fs: FileSystem, src: Path, dst: Path, store: String): Unit = {
    val in = fs.open(src)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    try {
      val out = fs.createFile(dst).overwrite(false).build()
      try out.write(bytes)
      finally out.close()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        refusedExisting(store, src, dst)
      case _: java.nio.file.FileAlreadyExistsException =>
        refusedExisting(store, src, dst)
      case e: org.apache.hadoop.fs.PathIOException =>
        throw new java.util.ConcurrentModificationException(
          s"$store: conditional-put publish $src -> $dst failed the " +
            s"store's create-if-absent precondition (or I/O) — lost the " +
            s"publish race; replay the batch [${e.getMessage}]")
    }
    fs.delete(src, false)
    ()
  }

  /** Test seam: invoked inside [[assertVersionsUnchanged]] immediately
    * before the re-listing, so a spec can land a full competing publish
    * at exactly the window the guard closes. No-op in production. */
  private[graft] var onBeforeReap: () => Unit = () => ()

  /** Vacuum's publish-race guard. A vacuum computes its reap set from
    * the committed versions it observed at entry; a publish landing
    * AFTER that observation may reference generations the reap set
    * calls garbage (the staged-but-uncommitted window
    * [[commitManifest]]'s referenced-dir exists-check cannot close from
    * the writer's side). Calling this with the entry-time observation
    * AFTER the reap set is computed and BEFORE the first delete turns
    * that silent corruption into a loud abort: if any commit advanced
    * or retired the history since, the vacuum throws with the store
    * untouched (garbage simply waits for the next vacuum). Residual
    * window: a publish landing between this check and the deletes —
    * which is exactly why the store tier's "no writer live during
    * vacuum" rule still stands; this guard is the detector for
    * violations of it, not a license to race. */
  def assertVersionsUnchanged(
      fs: FileSystem, dir: String, observed: Seq[Long], store: String): Unit = {
    onBeforeReap()
    val now = committedVersions(fs, dir).sorted
    if (now != observed.sorted)
      throw new java.util.ConcurrentModificationException(
        s"$store vacuum aborted: committed versions changed while the reap " +
          s"set was being computed (${observed.sorted.mkString(",")} -> " +
          s"${now.mkString(",")}) — a writer is live; nothing was deleted, " +
          "re-run the vacuum once writers are quiesced")
  }

  /** Reap orphaned manifest tmp files (`history/.tmp_v*`): leftovers of
    * publishers that crashed between staging and the exclusive move, of
    * CAS losers that died before their cleanup ran, and of the
    * best-effort tmp delete after a landed hard link (whose return value
    * is advisory). They can never become manifests on their own — only
    * [[exclusiveMoveFile]] publishes — but they accumulate in the one
    * directory the vacuum verbs promise to keep clean. Safe ONLY under
    * the store tier's vacuum contract (no writer live): an in-flight
    * publisher's tmp is indistinguishable from garbage. */
  def reapManifestTmp(fs: FileSystem, dir: String, store: String): Unit = {
    val hist = new Path(s"$dir/history")
    if (!fs.exists(hist)) return
    fs.listStatus(hist).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(".tmp_v"))
      .foreach(s => deleteOrThrow(fs, s.getPath, store))
  }

  /** Salted generation-dir name: unique per attempt, so racing writers
    * stage disjoint paths and a loser's data is unreferenced garbage.
    * 62 bits of salt (the manifest nonce's range): generation staging
    * writes with mode("overwrite"), so a salt collision between two
    * same-version racers would silently replace the first racer's staged
    * files — the collision probability has to be negligible, not merely
    * small (a 20-bit salt's ~1e-6 per race is a real event at fleet
    * scale). */
  def saltedGenDir(prefix: String, v: Long): String = {
    val salt = java.util.concurrent.ThreadLocalRandom.current()
      .nextLong(1L, Long.MaxValue)
    s"${prefix}_g$v.$salt"
  }

  /** Relative paths of the parquet data files directly under `dir/<sub>`
    * (recursing one partition level — `cell=N/part-…` layouts). */
  def listDataFiles(fs: FileSystem, dir: String, sub: String): Seq[String] = {
    val p = new Path(s"$dir/$sub")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.flatMap { s =>
      if (s.isFile && s.getPath.getName.startsWith("part-"))
        Seq(s"$sub/${s.getPath.getName}")
      else if (s.isDirectory && s.getPath.getName.contains("="))
        listDataFiles(fs, dir, s"$sub/${s.getPath.getName}")
      else Seq.empty
    }.sorted
  }

  def deleteOrThrow(fs: FileSystem, p: Path, store: String): Unit =
    if (!fs.delete(p, true) && fs.exists(p))
      throw new IllegalStateException(s"$store: delete $p failed")
}
