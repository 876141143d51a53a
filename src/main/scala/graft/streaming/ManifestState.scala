package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CdcMerge

/** Multi-writer-safe bucketed CDC state: versioned bucket directories
  * committed through a single manifest file — the plain-filesystem
  * approximation of a transactional table format's snapshot +
  * optimistic-commit protocol.
  *
  * [[CdcStream.mergeBatchBucketed]] swaps bucket directories in place,
  * which is only safe under one `synchronized` JVM: a second writer
  * interleaves swaps, and a reader can catch a bucket mid-move. Here:
  *
  *  - Layout: `root/b=<k>/v-<epoch>-<writer>/part-*.parquet` —
  *    versions are immutable once written; `root/MANIFEST` maps each
  *    bucket to its current version.
  *  - Readers load the manifest once and read exactly the listed
  *    version dirs: a consistent snapshot, never a half-committed mix.
  *  - Writers do ALL heavy work (read touched buckets, union delta,
  *    latest-wins, write new versions) outside any lock, then commit
  *    under a short lock: re-read the manifest, and if another writer
  *    committed since the snapshot was taken, abort, clean up, and
  *    retry against the newer state (optimistic concurrency). The
  *    lock guards only the manifest swap, so contention cost is
  *    O(manifest), not O(data).
  *  - GC keeps one superseded version per bucket as a grace window
  *    for readers that loaded the previous manifest, deleting older
  *    generations.
  *
  * The lock is a CREATE_NEW file with stale-age takeover — correct on
  * a POSIX filesystem (atomic exclusive create); an object-store
  * deployment swaps it for the store's conditional-put, with the rest
  * of the protocol unchanged.
  */
object ManifestState {

  /** Every-N-batches archived-manifest retention for the ingest twins'
    * run paths — the automated spelling of the
    * [[pruneArchivedManifests]] operational contract, so a long-lived
    * production stream no longer needs an out-of-band sweep. Attach
    * via the twins' `retention` parameter; after every `everyBatches`
    * micro-batches the twin prunes each of its state roots down to
    * `keepLast` archived epochs.
    *
    * Crash safety: the prune runs AFTER the batch's state commits,
    * deletes only archive files strictly older than the `keepLast`
    * newest, and is idempotent — a crash mid-prune leaves a partial
    * archive that the replayed batch's next prune finishes; the live
    * MANIFEST, data files, and crash recovery never depend on the
    * archive. Pruning only bounds time-travel depth
    * ([[readAt]]/[[changesBetween]]). */
  final case class Retention(everyBatches: Int, keepLast: Int = 8) {
    require(everyBatches >= 1, s"everyBatches must be >= 1, got $everyBatches")
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")

    /** Prune `stateRoots` if this batch count hits the cadence;
      * returns archives removed (0 on off-cadence batches). */
    def maybePrune(batchesDone: Long, stateRoots: Seq[String]): Long =
      if (batchesDone % everyBatches == 0)
        stateRoots.map(pruneArchivedManifests(_, keepLast)).sum
      else 0L
  }

  /** Superseded versions per bucket that survive GC. Shared constant so
    * anything asserting the steady-state file bound (nBuckets ×
    * (1 + keepGenerations), see IncrementalMergeBench) derives it from
    * the same value mergeBatch defaults to, instead of hardcoding it. */
  val DefaultKeepGenerations = 1

  /** Count of parquet DATA files under `root`'s bucket dirs (`b=k/…`)
    * — the scan surface the steady-state bound `nBuckets ×
    * (1 + keepGenerations)` governs; manifest/lock bookkeeping files
    * are excluded. One shared spelling for every probe that asserts
    * the bound (local-filesystem walk: the probes run local). */
  def dataFileCount(root: String): Long = {
    val p = java.nio.file.Path.of(root)
    // committed version dirs only (root/b=<k>/v-.../...): an in-flight
    // or crashed-pre-cleanup write's .stage-<version>/b=<k>/ files also
    // contain "/b=", and a probe sampling during a concurrent commit
    // would spuriously breach the steady-state bound if they counted
    val committed = java.util.regex.Pattern.compile("/b=\\d+/v-[^/]+/")
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(f => java.nio.file.Files.isRegularFile(f) &&
        committed.matcher(f.toString).find() && f.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }

  /** `nBuckets` is part of the state's identity: rows were routed by
    * `pmod(xxhash64(key), nBuckets)`, so reading or patching with a
    * different bucket count silently probes the wrong buckets (missed
    * history) and re-routes read-back rows outside the affected set
    * (permanently dropped at GC). The manifest therefore records the
    * count at first commit and every later commit must match
    * ([[requireBucketCount]] lets readers/writers validate up front).
    * Manifests written before this field exist with `nb = None` and
    * are stamped by their next commit. */
  final case class Manifest(epoch: Long, buckets: Map[Int, String],
                            nb: Option[Int] = None)

  private val writerId = UUID.randomUUID().toString.take(8)

  // -- manifest codec (tiny hand-rolled JSON — no extra deps) ---------

  private def render(m: Manifest): String = {
    val bs = m.buckets.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val nb = m.nb.map(n => s""","nb":$n""").getOrElse("")
    s"""{"epoch":${m.epoch}$nb,"buckets":{$bs}}"""
  }

  private def parse(s: String): Manifest = {
    val epoch = """"epoch":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"bad manifest: $s"))
    val nb = """"nb":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
    val buckets = """"(\d+)":"([^"]+)"""".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    Manifest(epoch, buckets, nb)
  }

  /** Fail fast when `root`'s manifest was committed with a different
    * bucket count (see [[Manifest]]) — call before reading touched
    * buckets or patching, where the mismatch would otherwise corrupt
    * silently. A missing manifest or a pre-`nb` manifest passes. */
  def requireBucketCount(root: String, nBuckets: Int): Unit = {
    val m = readManifest(root)
    m.nb.foreach { n =>
      require(n == nBuckets,
        s"bucketed state at $root was committed with nBuckets=$n; " +
        s"caller passed $nBuckets — reads/patches would route to the wrong buckets")
    }
  }

  def readManifest(root: String): Manifest = {
    val p = Paths.get(root, "MANIFEST")
    if (Files.exists(p))
      parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else Manifest(0L, Map.empty)
  }

  /** Manifest as of a past commit (time travel). Every commit archives
    * its manifest under `manifests/<epoch>` — a few bytes each, kept
    * until [[pruneArchivedManifests]]; whether the DATA a historical
    * manifest references still exists is governed by `keepGenerations`
    * at merge time. */
  def readManifestAt(root: String, epoch: Long): Manifest = {
    val p = Paths.get(root, "manifests", epoch.toString)
    require(Files.exists(p), s"no archived manifest for epoch $epoch at $p")
    parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** Archived-manifest retention: delete `root/manifests/<epoch>`
    * files older than the most recent `keepLast` epochs, returning how
    * many were removed. The archive otherwise grows by one tiny file
    * per commit forever — harmless for weeks, but on a genuinely
    * long-lived stream (millions of commits) the small-file count
    * becomes its own filesystem-pressure problem, so a retention sweep
    * is part of the operational contract (call it at checkpoint-
    * compaction cadence). Pruning only bounds TIME TRAVEL depth
    * ([[readAt]]/[[changesBetween]] need both endpoints' archives);
    * the live MANIFEST, the data, and crash recovery are untouched.
    * Never prunes below keepLast = 1. */
  def pruneArchivedManifests(root: String, keepLast: Int): Long = {
    require(keepLast >= 1, "must keep at least the latest archived manifest")
    val hist = Paths.get(root, "manifests")
    if (!Files.isDirectory(hist)) return 0L
    val listing = Files.list(hist)
    val epochs =
      try listing.toArray.map(_.toString)
        .flatMap(p => scala.util.Try(
          p.substring(p.lastIndexOf('/') + 1).toLong).toOption)
      finally listing.close()
    val doomed = epochs.sorted.dropRight(keepLast)
    doomed.foreach(e => Files.deleteIfExists(hist.resolve(e.toString)))
    doomed.length.toLong
  }

  private def writeManifest(root: String, m: Manifest): Unit = {
    val tmp = Paths.get(root, s"MANIFEST.tmp-$writerId")
    Files.write(tmp, render(m).getBytes(StandardCharsets.UTF_8))
    // archive first, then swap the current pointer: a crash between
    // the two loses only the archive copy of an uncommitted epoch
    val hist = Paths.get(root, "manifests")
    Files.createDirectories(hist)
    Files.write(hist.resolve(m.epoch.toString),
      render(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "MANIFEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // -- lock: atomic exclusive create + stale takeover -----------------

  /** Acquire `root/LOCK`, run `f` with an ownership token, release.
    *
    * Stale takeover cannot be made race-free with delete+create alone:
    * two breakers can both observe staleness, the first re-acquires,
    * and the second would delete a FRESH lock (two holders). Two
    * defenses close this:
    *  - takeover captures the stale file by an ATOMIC_MOVE to a unique
    *    tombstone (only one breaker can capture it) before deleting;
    *  - `f` receives a token and must call [[stillHolds]] immediately
    *    before its irreversible step — if a breaker stole the lock
    *    despite the above (arbitrarily long pause between acquire and
    *    commit), the victim observes foreign lock content and aborts.
    * The residual window (holder verifies, then pauses > staleMs
    * before the manifest move) is the same lease-expiry caveat every
    * lock-without-storage-fencing has; an object-store deployment
    * replaces this file dance with a conditional-put and loses the
    * caveat too.
    */
  private def withLock[T](root: String, timeoutMs: Long = 30000,
                          staleMs: Long = 60000)(f: String => T): T = {
    val lock = Paths.get(root, "LOCK")
    val token = s"$writerId-${UUID.randomUUID().toString.take(8)}"
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      try {
        Files.write(lock,
          s"$token ${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        held = true
      } catch {
        case _: FileAlreadyExistsException =>
          val age = try System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis
          catch { case _: java.io.IOException => 0L } // vanished — retry
          if (age > staleMs) {
            // capture-then-verify-then-delete: the atomic move admits
            // exactly one breaker; if what we captured turns out FRESH
            // (the holder re-acquired between our staleness check and
            // the move) we restore it best-effort — and even when the
            // restore loses a race, the falsely-evicted holder self-
            // detects via stillHolds before committing
            val tomb = Paths.get(root, s"LOCK.broken-$token")
            try {
              Files.move(lock, tomb, StandardCopyOption.ATOMIC_MOVE)
              val content = new String(Files.readAllBytes(tomb), StandardCharsets.UTF_8)
              val heldSince = content.split(" ").lift(1).flatMap(
                t => scala.util.Try(t.toLong).toOption).getOrElse(0L)
              if (System.currentTimeMillis() - heldSince > staleMs)
                Files.deleteIfExists(tomb) // genuinely dead holder
              else
                try Files.move(tomb, lock, StandardCopyOption.ATOMIC_MOVE)
                catch { case _: java.io.IOException => Files.deleteIfExists(tomb) }
            } catch { case _: java.io.IOException => () } // lost the capture race
          } else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(s"lock timeout on $lock")
          else Thread.sleep(20)
      }
    }
    try f(token) finally {
      // delete only our own lock — if a breaker stole it, the current
      // file belongs to someone else
      if (stillHolds(root, token))
        try Files.deleteIfExists(lock) catch { case _: java.io.IOException => () }
    }
  }

  /** True iff `root/LOCK` still carries this holder's token. */
  private def stillHolds(root: String, token: String): Boolean =
    try new String(Files.readAllBytes(Paths.get(root, "LOCK")),
                   StandardCharsets.UTF_8).startsWith(token + " ")
    catch { case _: java.io.IOException => false }

  // -- snapshot reads -------------------------------------------------

  private def versionPath(root: String, bucket: Int, version: String): String =
    s"$root/b=$bucket/$version"

  /** Read the state snapshot a manifest describes. */
  def readSnapshot(spark: SparkSession, root: String,
                   m: Manifest): DataFrame = {
    val paths = m.buckets.toSeq.sortBy(_._1)
      .map { case (k, v) => versionPath(root, k, v) }
    if (paths.isEmpty) spark.emptyDataFrame else spark.read.parquet(paths: _*)
  }

  /** Read the current state (latest committed snapshot). */
  def read(spark: SparkSession, root: String): DataFrame =
    readSnapshot(spark, root, readManifest(root))

  /** Time travel: the state exactly as of commit `epoch`. Valid while
    * the versions that manifest references survive GC — i.e. for the
    * most recent `keepGenerations` commits touching each bucket
    * (older reads fail on the missing version dir). */
  def readAt(spark: SparkSession, root: String, epoch: Long): DataFrame =
    readSnapshot(spark, root, readManifestAt(root, epoch))

  /** Change data feed: the NET row-level changes between two archived
    * epochs, derived by diffing the snapshots (an id that was inserted
    * and deleted between the epochs nets to no change — this is the
    * snapshot delta, not the event log). Emits
    * `(change_type ∈ INSERT|UPDATE|DELETE, id, <row columns from the
    * newer epoch — null for DELETE>, old_lsn, new_lsn)`. One
    * full-outer join on the key; both sides are manifest snapshots, so
    * the diff is consistent regardless of concurrent writers. */
  def changesBetween(spark: SparkSession, root: String,
                     fromEpoch: Long, toEpoch: Long): DataFrame = {
    require(fromEpoch <= toEpoch, s"fromEpoch $fromEpoch > toEpoch $toEpoch")
    def live(e: Long) = readAt(spark, root, e)
      .filter(col("event_type") === CdcStream.Upsert)
    val a = live(fromEpoch).select(
      col("id").as("a_id"), col("lsn").as("old_lsn"))
    val b = live(toEpoch).select(
      col("id").as("b_id"), col("create_time"), col("update_time"),
      col("message"), col("username"), col("lsn").as("new_lsn"))
    a.join(b, a("a_id") === b("b_id"), "full_outer")
      .filter(col("a_id").isNull || col("b_id").isNull ||
              col("old_lsn") =!= col("new_lsn"))
      .select(
        when(col("a_id").isNull, lit("INSERT"))
          .when(col("b_id").isNull, lit("DELETE"))
          .otherwise(lit("UPDATE")).as("change_type"),
        coalesce(col("b_id"), col("a_id")).as("id"),
        col("create_time"), col("update_time"), col("message"),
        col("username"), col("old_lsn"), col("new_lsn"))
  }

  /** The queryable latest-wins view: state minus tombstones. */
  def readView(spark: SparkSession, root: String): DataFrame = {
    val s = read(spark, root)
    if (s.columns.isEmpty) s else s.filter(col("event_type") === CdcStream.Upsert)
  }

  // -- the optimistic merge -------------------------------------------

  /** Merge one micro-batch of decoded changes ([[CdcStream.classify]]
    * schema) into the manifest state. Safe for concurrent writers:
    * lost updates are prevented by the per-bucket check at commit; a
    * loser recomputes against the winner's state and retries.
    * `keepGenerations` superseded versions per bucket survive GC —
    * generation 1 is the reader grace window, more buys time travel
    * depth ([[readAt]]).
    */
  def mergeBatch(batch: DataFrame, root: String, nBuckets: Int,
                 maxRetries: Int = 20,
                 keepGenerations: Int = DefaultKeepGenerations): Unit = {
    require(nBuckets > 0)
    val spark = batch.sparkSession
    val delta = batch.filter(col("event_type") =!= CdcStream.Malformed)
      .withColumn("b", pmod(xxhash64(col("id")), lit(nBuckets)).cast("int"))
      .cache()
    try {
      val affected = delta.select("b").distinct().collect().map(_.getInt(0)).sorted
      if (affected.isEmpty) return
      // partitionBy strips `b` into the directory name, so files read
      // back from a version dir do NOT carry it — merge on the bare
      // change schema and re-derive the bucket before writing
      val bare = delta.drop("b")
      optimisticCommit(spark, root, affected.toIndexedSeq, nBuckets, "id",
        bare, maxRetries, keepGenerations) { current =>
        CdcMerge.latestWins(
          current.unionByName(bare), Seq("id"),
          Seq(col("lsn").desc_nulls_last, col("ts_ms").desc_nulls_last))
      }
    } finally delta.unpersist()
  }

  /** Generic bucketed PATCH — the schema-agnostic core the IVM views
    * (JoinView, Scd2View) use as their production sink: rewrite ONLY
    * the buckets that `touchedKeys` (single-column frame named
    * `keyCol`, O(batch) rows by contract) hash to, committing through
    * the same manifest/lock/GC protocol as [[mergeBatch]].
    *
    * `buildMerged` receives the CURRENT full content of the affected
    * buckets (the `template`'s empty frame when the state is new) and
    * must return their full NEW content — typically
    * `current.anti(touched) ∪ replacement`. It is re-invoked against
    * the fresh snapshot on every commit retry, so a lost race
    * recomputes instead of clobbering. CONTRACT: every returned row's
    * `keyCol` must hash into the affected buckets (i.e. replacement
    * keys ⊆ touchedKeys) — a row outside them would be silently
    * dropped from the state, since only affected buckets commit.
    */
  def patchBuckets(root: String, nBuckets: Int, keyCol: String,
                   touchedKeys: DataFrame, template: DataFrame,
                   maxRetries: Int = 20,
                   keepGenerations: Int = DefaultKeepGenerations)
                  (buildMerged: DataFrame => DataFrame): Boolean = {
    require(nBuckets > 0)
    val affected = bucketsOf(touchedKeys, keyCol, nBuckets)
    // returns whether a commit actually happened — an empty delta is a
    // no-op, and callers instrumenting commit boundaries (crash-prefix
    // replay seams) must not count it as one
    if (affected.isEmpty) return false
    optimisticCommit(touchedKeys.sparkSession, root, affected, nBuckets,
      keyCol, template, maxRetries, keepGenerations)(buildMerged)
    true
  }

  /** The buckets `keys` hash to — O(distinct buckets) driver memory,
    * bounded by min(nBuckets, |keys|). */
  def bucketsOf(keys: DataFrame, keyCol: String, nBuckets: Int): IndexedSeq[Int] =
    keys.select(pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq

  /** Read ONLY the given buckets' current content — the O(touched)
    * lookup the bucketed layout exists for. Version dirs are immutable
    * and `keepGenerations ≥ 1` keeps the superseded generation through
    * the next commit, so the returned frame stays readable across one
    * subsequent patch of the same buckets (the reader grace window).
    */
  def readBucketsOf(spark: SparkSession, root: String, buckets: Seq[Int],
                    template: DataFrame): DataFrame = {
    val m = readManifest(root)
    val paths = buckets.flatMap(k => m.buckets.get(k).map(v => versionPath(root, k, v)))
    if (paths.isEmpty) template.limit(0)
    else spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** The shared optimistic heavy-phase + commit loop: read affected
    * buckets, `buildMerged`, stage, per-bucket atomic move, manifest
    * compare+swap under the lock, GC. */
  private def optimisticCommit(spark: SparkSession, root: String,
                               affected: IndexedSeq[Int], nBuckets: Int,
                               keyCol: String, template: DataFrame,
                               maxRetries: Int, keepGenerations: Int)
                              (buildMerged: DataFrame => DataFrame): Unit = {
    Files.createDirectories(Paths.get(root))
    // distinguishes concurrent merges from the SAME writer object
    // (threads sharing this JVM) — version/stage dirs must be unique
    // per invocation, not per process
    val callId = UUID.randomUUID().toString.take(8)
    var attempt = 0
    var committed = false
    var lastFailure: Throwable = null
    while (!committed) {
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"merge lost the commit race $maxRetries times", lastFailure)
      val base = readManifest(root)
      base.nb.foreach(n => require(n == nBuckets,
        s"bucketed state at $root was committed with nBuckets=$n; " +
        s"this merge passed $nBuckets"))
      val version = s"v-${base.epoch + 1}-$callId-$attempt"
      // drop THIS attempt's on-disk artifacts: the stage tmp dir (a
      // heavy-phase exception can leave it mid-write) and any version
      // dirs already moved into place — orphans would otherwise count
      // against the steady-state file bound forever. Shared by the
      // lost-race retry and the fail-fast rethrow below.
      def dropAttemptArtifacts(): Unit = {
        CdcStream.deleteRecursively(Paths.get(s"$root/.stage-$version"))
        affected.foreach { k =>
          CdcStream.deleteRecursively(Paths.get(versionPath(root, k, version)))
        }
      }
      try {
        // heavy phase — no lock held
        val existing = affected.flatMap(k => base.buckets.get(k).map(v => (k, v)))
        val current =
          if (existing.isEmpty) template.limit(0)
          else spark.read.parquet(existing.map { case (k, v) =>
            versionPath(root, k, v) }.toIndexedSeq: _*)
        val merged = buildMerged(current)
          .withColumn("b", pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int"))
        // one writer task per touched bucket, one immutable version dir
        // per bucket per commit
        val tmp = s"$root/.stage-$version"
        merged.repartition(col("b"))
          .write.mode("overwrite").partitionBy("b").parquet(tmp)
        // a bucket with no surviving rows (cannot happen while
        // tombstones are retained, but don't bake that in) leaves the
        // manifest instead of committing an unreadable empty dir
        val written = affected.filter { k =>
          val src = Paths.get(s"$tmp/b=$k")
          val dst = Paths.get(versionPath(root, k, version))
          Files.createDirectories(dst.getParent)
          if (Files.exists(src)) {
            Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE); true
          } else false
        }
        val emptied = affected.diff(written)
        CdcStream.deleteRecursively(Paths.get(tmp))

        // commit phase — lock guards only the manifest compare+swap.
        // Conflict detection is PER-BUCKET: a concurrent commit to
        // disjoint buckets does not invalidate this one (a global
        // epoch compare would make disjoint writers livelock under
        // load). stillHolds closes the lease-theft edge (withLock doc).
        committed = withLock(root) { token =>
          val now = readManifest(root)
          // re-validate the bucket count UNDER the lock: two
          // simultaneous FIRST writers with different counts and
          // disjoint buckets would both pass the per-bucket conflict
          // check (the pre-loop require saw nb = None for both); the
          // loser must not stamp its count over the winner's state.
          // Returning false sends it around the loop, where the
          // re-read manifest now carries the winner's nb and the
          // require fails loud.
          val nbConflict = now.nb.exists(_ != nBuckets)
          val conflict = nbConflict || affected.exists(k =>
            now.buckets.get(k) != base.buckets.get(k))
          if (!conflict && stillHolds(root, token)) {
            writeManifest(root,
              Manifest(now.epoch + 1,
                now.buckets ++ written.map(k => k -> version) -- emptied,
                Some(nBuckets)))
            true
          } else false
        }
      } catch {
        // a deterministic caller bug is not a race: buildMerged is
        // caller-supplied since the patchBuckets refactor, and a
        // schema/resolution error in it would otherwise re-run the
        // heavy phase maxRetries times and surface as a misleading
        // "lost the commit race" — analysis failures can't be healed
        // by a fresh snapshot, so rethrow them immediately. Cleanup
        // still applies: a lazily-resolved caller plan can fail AFTER
        // the stage dir / per-bucket version dirs were created (the
        // write itself triggers analysis), so run the SAME artifact
        // cleanup the lost-race path runs before propagating.
        case e: org.apache.spark.sql.AnalysisException =>
          dropAttemptArtifacts()
          throw e
        // the heavy phase reads version dirs that concurrent GC may
        // delete once their grace window closes — that's a lost race,
        // not a caller-visible failure; recompute on the new manifest
        case e: Exception => lastFailure = e; committed = false
      }
      // lost the race: drop this attempt's artifacts, then retry on
      // top of the winner's state
      if (!committed) dropAttemptArtifacts()
    }
    // only this commit's buckets can have gained a superseded
    // version — scanning all buckets would pay nBuckets directory
    // listings per merge for nothing
    gc(root, affected, keepGenerations)
  }

  /** Drop version dirs at least two generations behind the manifest in
    * the given buckets. Only versions with an epoch strictly BELOW the
    * live one are candidates — a higher-epoch dir is another writer's
    * in-flight (pre-commit) version and must be left alone (its writer
    * deletes it on race loss, or it becomes live). Of the superseded
    * versions, the newest survives one more merge as a grace window
    * for readers holding the previous manifest. */
  private def gc(root: String, bucketsToScan: Seq[Int],
                 keepGenerations: Int = DefaultKeepGenerations): Unit = {
    val m = readManifest(root)
    bucketsToScan.flatMap(k => m.buckets.get(k).map(k -> _)).foreach { case (k, live) =>
      val dir = Paths.get(s"$root/b=$k")
      if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val versions =
          try listing.toArray.map(_.toString)
            .map(p => p.substring(p.lastIndexOf('/') + 1))
            .filter(_.startsWith("v-"))
          finally listing.close()
        val superseded = versions
          .filter(v => versionEpoch(v) < versionEpoch(live))
          .sortBy(versionEpoch)
        superseded.dropRight(math.max(1, keepGenerations)).foreach(v =>
          CdcStream.deleteRecursively(Paths.get(versionPath(root, k, v))))
      }
    }
  }

  private def versionEpoch(v: String): Long =
    v.split("-").lift(1).flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(0L)
}
