package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.SnapshotDiffView

class SnapshotDiffViewSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (u, ts, id, v) => (u, Timestamp.valueOf(ts), id, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  // Three ts-ordered batches over four keys, with an update (key 1),
  // a no-op late arrival (key 2 in batch 3 carries an OLDER ts than
  // its state), an equal-value update (key 3), and a late birth (4).
  private val b1 = Seq(
    (1L, "2024-01-01 10:00:00", 100L, 10.0),
    (2L, "2024-01-02 10:00:00", 101L, 20.0),
    (3L, "2024-01-03 10:00:00", 102L, 30.0))
  private val b2 = Seq(
    (1L, "2024-01-11 10:00:00", 200L, 15.5), // changed
    (3L, "2024-01-12 10:00:00", 201L, 30.0)) // same value, newer event
  private val b3 = Seq(
    (2L, "2024-01-01 09:00:00", 300L, 99.0), // late, loses -> same
    (4L, "2024-01-21 10:00:00", 301L, 40.0)) // added

  /** Naive latest-wins recompute over every event seen so far. */
  private def naiveView(all: Seq[(Long, String, Long, Double)]): Map[Long, Double] =
    all.groupBy(_._1).map { case (u, rows) =>
      u -> rows.maxBy(r => (r._2, r._3))._4
    }

  test("state tracks the batch recompute; diffs classify added/changed/same") {
    val root = Files.createTempDirectory("snapdiff").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    val batches = Seq(b1, b2, b3)
    var seen = Seq.empty[(Long, String, Long, Double)]
    batches.zipWithIndex.foreach { case (b, i) =>
      SnapshotDiffView.mergeBatch(ev(b), stateDir, diffDir, i.toLong)
      seen ++= b
      val got = SnapshotDiffView.readView(spark, stateDir)
        .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      assert(got == naiveView(seen), s"state drifted after batch $i")
    }

    def diff(i: Long): Map[Long, (Option[Double], Double, String)] =
      SnapshotDiffView.readDiff(spark, diffDir, i)
        .select($"user_id", $"v1_r", $"v2_r", $"status")
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2), r.getString(3)))
        .toMap

    assert(diff(0) == Map(
      1L -> (None, 10.0, "added"),
      2L -> (None, 20.0, "added"),
      3L -> (None, 30.0, "added")))
    assert(diff(1) == Map(
      1L -> (Some(10.0), 15.5, "changed"),
      3L -> (Some(30.0), 30.0, "same")))
    assert(diff(2) == Map(
      2L -> (Some(20.0), 20.0, "same"), // late arrival never regresses
      4L -> (None, 40.0, "added")))
  }

  test("non-same diff rows equal the q150 classification between cutoffs") {
    val root = Files.createTempDirectory("snapdiff2").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatch(ev(b1), stateDir, diffDir, 0L)
    SnapshotDiffView.mergeBatch(ev(b2), stateDir, diffDir, 1L)

    // q150's spelling between cutoff T1 = end of batch 1 and T2 = end
    // of batch 2: one conditional max_by aggregate over ALL events.
    val t1 = lit("2024-01-04").cast("timestamp")
    val t2 = lit("2024-01-14").cast("timestamp")
    val batchStyle = ev(b1 ++ b2)
      .groupBy($"user_id")
      .agg(
        max_by($"value", when($"ts" <= t1, struct($"ts", $"event_id"))).as("v1"),
        max_by($"value", when($"ts" <= t2, struct($"ts", $"event_id"))).as("v2"))
      .filter($"v2".isNotNull)
      .select($"user_id", round($"v1", 4).as("v1_r"), round($"v2", 4).as("v2_r"),
        when($"v1".isNull, lit("added"))
          .when($"v1" === $"v2", lit("same"))
          .otherwise(lit("changed")).as("status"))
      .filter($"status" =!= "same")
      .collect().toSet

    val streaming = SnapshotDiffView.readDiff(spark, diffDir, 1L)
      .filter($"status" =!= "same")
      .select($"user_id", $"v1_r", $"v2_r", $"status")
      .collect().toSet
    assert(streaming == batchStyle)
  }

  test("replaying a batch is idempotent (state and diff slice unchanged)") {
    val root = Files.createTempDirectory("snapdiff3").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatch(ev(b1), stateDir, diffDir, 0L)
    SnapshotDiffView.mergeBatch(ev(b2), stateDir, diffDir, 1L)
    val view = SnapshotDiffView.readView(spark, stateDir)
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    val slice = SnapshotDiffView.readDiff(spark, diffDir, 1L).collect().toSet

    SnapshotDiffView.mergeBatch(ev(b2), stateDir, diffDir, 1L) // replay
    assert(SnapshotDiffView.readView(spark, stateDir)
      .as[(Long, Timestamp, Long, Double)].collect().toSet == view)
    assert(SnapshotDiffView.readDiff(spark, diffDir, 1L).collect().toSet == slice)
  }

  test("a crash between the swap's renames heals: state restores from its backup") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("snapdiff5").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatch(ev(b1), stateDir, diffDir, 0L)
    val view = SnapshotDiffView.readView(spark, stateDir)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
    // simulate dying between swapDirs' two renames: live dir gone,
    // backup present (dot-prefixed so Spark readers skip it)
    JFiles.move(Paths.get(stateDir), Paths.get(s"$root/.state.old"),
      StandardCopyOption.ATOMIC_MOVE)
    val healed = SnapshotDiffView.readView(spark, stateDir)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
    assert(healed == view, "backup was not restored on read")
    // and the next merge proceeds from the healed state, fence intact
    SnapshotDiffView.mergeBatch(ev(b2), stateDir, diffDir, 1L)
    assert(SnapshotDiffView.readView(spark, stateDir)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1 ++ b2))
  }

  test("a stranded bucket backup is invisible to readers (crash after install, before cleanup)") {
    import java.nio.file.{Paths => JPaths}
    val root = Files.createTempDirectory("snapdiffb3").toString
    val (st, df) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatchBucketed(ev(b1), st, df, 0L, nBuckets = 8)
    val live = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("b=")).head
    // Simulate a crash between replace()'s install rename and its
    // backup cleanup: a complete stale copy of the bucket sits beside
    // the live dir under the backup name, carrying rows that
    // contradict live state. Partition discovery must skip it — a
    // visible sibling like `b=5.old` would be read as partition
    // b='5.old' and serve the stale rows (duplicate keys, b column
    // degraded to string).
    val stale = JPaths.get(st, "." + live.getName + ".old")
    Seq((1L, Timestamp.valueOf("1999-01-01 00:00:00"), 1L, -999.0),
        (2L, Timestamp.valueOf("1999-01-01 00:00:00"), 2L, -999.0),
        (3L, Timestamp.valueOf("1999-01-01 00:00:00"), 3L, -999.0))
      .toDF("user_id", "ts", "event_id", "value")
      .write.parquet(stale.toString)

    val view = SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect()
    assert(view.length == view.toMap.size, "duplicate keys served from the backup")
    assert(view.toMap == naiveView(b1), "stale backup rows leaked into the view")

    // merging onward stays correct with the leftover in place
    SnapshotDiffView.mergeBatchBucketed(ev(b2), st, df, 1L, nBuckets = 8)
    assert(SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1 ++ b2))
  }

  test("a bucket stranded mid-swap (live gone, backup left) heals on full-view read") {
    import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}
    val root = Files.createTempDirectory("snapdiffb4").toString
    val (st, df) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatchBucketed(ev(b1), st, df, 0L, nBuckets = 8)
    val live = new java.io.File(st).listFiles()
      .filter(f => f.getName.startsWith("b=") && f.listFiles().exists(_.getName.endsWith(".parquet")))
      .head
    // crash between the swap's two renames: this bucket exists only
    // as its backup; a full-view read must restore it, not skip it
    JFiles.move(live.toPath, JPaths.get(st, "." + live.getName + ".old"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1), "stranded bucket was not healed on read")
  }

  test("a LEGACY (pre-dot-prefix) stranded bucket backup is deleted, not served as a partition") {
    import java.nio.file.{Paths => JPaths}
    val root = Files.createTempDirectory("snapdiffb5").toString
    val (st, df) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatchBucketed(ev(b1), st, df, 0L, nBuckets = 8)
    val live = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("b=")).head
    // a crash under the OLD backup naming stranded `b=N.old` beside a
    // live dir: partition discovery would index it as partition
    // b='N.old' and serve its stale rows — the read path must delete
    // it (current code never writes this name, so it cannot be a
    // racing writer's in-flight backup)
    val stale = JPaths.get(st, live.getName + ".old")
    Seq((1L, Timestamp.valueOf("1999-01-01 00:00:00"), 1L, -999.0))
      .toDF("user_id", "ts", "event_id", "value")
      .write.parquet(stale.toString)

    val view = SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect()
    assert(view.toMap == naiveView(b1), "legacy backup rows leaked into the view")
    assert(!java.nio.file.Files.exists(stale), "legacy backup not cleaned up")
  }

  test("a bucket stranded under the LEGACY backup naming still heals when live is gone") {
    import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}
    val root = Files.createTempDirectory("snapdiffb6").toString
    val (st, df) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatchBucketed(ev(b1), st, df, 0L, nBuckets = 8)
    val live = new java.io.File(st).listFiles()
      .filter(f => f.getName.startsWith("b=") && f.listFiles().exists(_.getName.endsWith(".parquet")))
      .head
    // pre-upgrade crash between the old swap's renames: the bucket
    // survives ONLY as `b=N.old` — restore it rather than losing it
    JFiles.move(live.toPath, JPaths.get(st, live.getName + ".old"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1), "legacy-named stranded bucket was not healed on read")
  }

  test("a batch id below the applied fence is an error, not a silent skip") {
    val root = Files.createTempDirectory("snapdiff6").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    SnapshotDiffView.mergeBatch(ev(b1), stateDir, diffDir, 0L)
    SnapshotDiffView.mergeBatch(ev(b2), stateDir, diffDir, 1L)
    // checkpoint wiped while state survived -> ids restart at 0: the
    // merge must refuse (silently skipping would drop real batches)
    intercept[IllegalStateException] {
      SnapshotDiffView.mergeBatch(ev(b3), stateDir, diffDir, 0L)
    }
  }

  test("bucketed merge equals the plain merge: view and every diff slice") {
    val root = Files.createTempDirectory("snapdiffb").toString
    import spark.implicits._
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      SnapshotDiffView.mergeBatch(ev(b), s"$root/plain_state", s"$root/plain_diff", i.toLong)
      SnapshotDiffView.mergeBatchBucketed(ev(b), s"$root/bkt_state", s"$root/bkt_diff",
        i.toLong, nBuckets = 8)
    }
    val plainView = SnapshotDiffView.readView(spark, s"$root/plain_state")
      .select($"user_id", $"value").as[(Long, Double)].collect().toSet
    val bktView = SnapshotDiffView.readViewBucketed(spark, s"$root/bkt_state")
      .select($"user_id", $"value").as[(Long, Double)].collect().toSet
    assert(bktView == plainView)
    (0 to 2).foreach { i =>
      val p = SnapshotDiffView.readDiff(spark, s"$root/plain_diff", i.toLong).collect().toSet
      val b = SnapshotDiffView.readDiff(spark, s"$root/bkt_diff", i.toLong).collect().toSet
      assert(b == p, s"diff slice $i diverged")
    }
  }

  test("bucketed merge rewrites only touched buckets and replays idempotently") {
    import java.io.File
    val root = Files.createTempDirectory("snapdiffb2").toString
    val (st, df) = (s"$root/state", s"$root/diff")
    import spark.implicits._

    SnapshotDiffView.mergeBatchBucketed(ev(b1), st, df, 0L, nBuckets = 8)
    def bucketFiles(): Map[String, Set[String]] =
      new File(st).listFiles().filter(_.getName.startsWith("b="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = bucketFiles()

    // a single-user batch touches exactly one bucket; parquet part
    // file names are fresh UUIDs per write, so unchanged file names
    // prove untouched buckets were never rewritten
    val one = Seq((1L, "2024-01-15 10:00:00", 500L, 77.0))
    SnapshotDiffView.mergeBatchBucketed(ev(one), st, df, 1L, nBuckets = 8)
    val after = bucketFiles()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size <= 1, s"more than one bucket rewritten: $changed")
    assert(SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1 ++ one))

    // replay: view unchanged AND the committed diff slice survives
    // (a recompute against post-merge state would say "same", not
    // "changed" — the _SUCCESS guard must prevent that)
    val slice = SnapshotDiffView.readDiff(spark, df, 1L).collect().toSet
    SnapshotDiffView.mergeBatchBucketed(ev(one), st, df, 1L, nBuckets = 8)
    assert(SnapshotDiffView.readDiff(spark, df, 1L).collect().toSet == slice)
    assert(SnapshotDiffView.readViewBucketed(spark, st)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
      == naiveView(b1 ++ one))
    assert(slice.exists(_.getString(3) == "changed"),
      "fixture must exercise the changed->same degradation hazard")
  }

  test("streaming run over a file source produces the same final view") {
    val root = Files.createTempDirectory("snapdiff4").toString
    val (stateDir, diffDir) = (s"$root/state", s"$root/diff")
    val inDir = s"$root/in"
    import spark.implicits._

    // One parquet file per batch; maxFilesPerTrigger=1 makes each its
    // own micro-batch under AvailableNow.
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      ev(b).coalesce(1).write.parquet(s"$inDir/f$i")
    }
    val src = spark.readStream
      .schema(ev(b1).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/f*")
    SnapshotDiffView.run(src, s"$root/ckpt", stateDir, diffDir)
      .awaitTermination(60000)

    val got = SnapshotDiffView.readView(spark, stateDir)
      .select($"user_id", $"value").as[(Long, Double)].collect().toMap
    assert(got == naiveView(b1 ++ b2 ++ b3))
  }
}
