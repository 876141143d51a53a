package graft

import java.security.MessageDigest
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.{Row, SparkSession}

/** Concurrent-query stress gate: N threads execute random subsets of
  * the catalog against ONE shared SparkSession for R rounds, and every
  * result must hash-match the single-threaded reference computed
  * first.
  *
  * Why this exists as a standing discipline: the round-8 planner
  * mis-binding of PrefixScan's carry join (a checkpoint keyed per
  * PROCESS being swept by a concurrent query's release) was found by
  * accident under Verify's write pool. Cross-thread isolation of
  * anything keyed outside the plan — Checkpoints pins, cached frames,
  * temp views, session config — is exactly the class of bug a
  * single-threaded gate can never see, so this harness makes "the
  * catalog is safe to run concurrently" a measured claim: same hash
  * under contention as alone, across every (thread, round, query)
  * sample. StressSpec runs a fast subset on every `sbt test`; the
  * main covers the full catalog (evidence log in docs/probes/).
  *
  * The digest mirrors the driver-compare canonicalization (columns
  * sorted by name, rows sorted, signed zero collapsed) but only has
  * to be self-consistent: reference and stress samples hash the same
  * way, so any cross-thread contamination — wrong rows, a stolen
  * checkpoint, config bleed — flips it.
  *
  * Usage: runMain graft.StressRun [sfDir] [threads] [rounds] [perThread] [seed]
  * Defaults: sf0.01, 6 threads, 10 rounds, 24 queries/thread/round —
  * ~1440 samples over the ~174-query surface (full coverage w.h.p.;
  * uncovered names are printed so a run's blind spots are in-band).
  * Exit 0 iff every sample matched the reference.
  */
object StressRun {

  final case class Failure(round: Int, thread: Int, query: String, detail: String)
  final case class Report(samples: Long, covered: Set[String],
                          failures: Seq[Failure], refSec: Double, stressSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val threads = args.lift(1).map(_.toInt).getOrElse(6)
    val rounds = args.lift(2).map(_.toInt).getOrElse(10)
    val perThread = args.lift(3).map(_.toInt).getOrElse(24)
    val seed = args.lift(4).map(_.toLong).getOrElse(11L)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft
      .builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toIndexedSeq.sorted
    val r = run(spark, sfDir, names, threads, rounds, perThread, seed,
      progress = s => println(s"[stress] $s"))

    val uncovered = names.filterNot(r.covered)
    if (uncovered.nonEmpty)
      println(s"[stress] NOT COVERED this run (${uncovered.size}): ${uncovered.mkString(", ")}")
    r.failures.foreach { f =>
      println(s"[stress] FAIL round=${f.round} thread=${f.thread} ${f.query}: ${f.detail}")
    }
    println(s"""{"metric":"stress","sf_dir":"$sfDir","threads":$threads,"rounds":$rounds,"per_thread":$perThread,"seed":$seed,"queries":${names.size},"samples":${r.samples},"covered":${r.covered.size},"failures":${r.failures.size},"ref_sec":${f"${r.refSec}%.1f"},"stress_sec":${f"${r.stressSec}%.1f"}}""")
    spark.stop()
    if (r.failures.nonEmpty) sys.exit(1)
  }

  /** The reusable core: reference pass, then `rounds` pool rounds of
    * `threads × perThread` random samples, each hash-compared. */
  def run(spark: SparkSession, sfDir: String, names: IndexedSeq[String],
          threads: Int, rounds: Int, perThread: Int, seed: Long,
          progress: String => Unit = _ => ()): Report = {
    val t0 = System.nanoTime()
    val reference: Map[String, (Long, String)] = names.map { name =>
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      graft.operators.Checkpoints.release()
      name -> ((rows.length.toLong, digest(rows)))
    }.toMap
    val refSec = (System.nanoTime() - t0) / 1e9
    progress(f"reference pass: ${names.size} queries in $refSec%.1f s")

    val failures = new ConcurrentLinkedQueue[Failure]()
    val covered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    var executed = 0L

    val t1 = System.nanoTime()
    for (round <- 1 to rounds) {
      val pool = Executors.newFixedThreadPool(threads)
      val work = (0 until threads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            // deterministic per-(round, thread) subset: a failure line
            // names its sample, and the same seed replays it exactly
            val rnd = new Random(seed + round * 1000L + t)
            (1 to perThread).foreach { _ =>
              val name = names(rnd.nextInt(names.size))
              covered.add(name)
              try {
                val rows = SparkEntry.queries(name)(spark, sfDir).collect()
                val got = (rows.length.toLong, digest(rows))
                if (got != reference(name))
                  failures.add(Failure(round, t, name,
                    s"rows/hash ${got._1}/${got._2} != reference ${reference(name)._1}/${reference(name)._2}"))
              } catch {
                case e: Throwable =>
                  failures.add(Failure(round, t, name,
                    s"threw ${e.getClass.getSimpleName}: ${e.getMessage}"))
              } finally {
                // thread-scoped: drops THIS worker's plan pins only
                // (Checkpoints is keyed by tracking thread) — running
                // it mid-contention is part of what's under test
                graft.operators.Checkpoints.release()
              }
            }
          }
        })
      }
      pool.shutdown()
      work.foreach(_.get())
      pool.awaitTermination(1, TimeUnit.MINUTES)
      executed += threads.toLong * perThread
      progress(s"round $round/$rounds: ${failures.size} cumulative failures")
    }
    val stressSec = (System.nanoTime() - t1) / 1e9
    Report(executed, covered.asScala.toSet, failures.asScala.toSeq, refSec, stressSec)
  }

  /** Order-insensitive content digest: canonical row strings, sorted,
    * MD5-chained. Column order is canonicalized by sorting the schema
    * names once and projecting each row through that permutation. */
  def digest(rows: Array[Row]): String = {
    if (rows.isEmpty) return "empty"
    val perm = rows.head.schema.fieldNames.zipWithIndex.sortBy(_._1).map(_._2)
    // explicit unit-separator (u0001) between columns: boundary-
    // shifted contamination ((1, 23) vs (12, 3)) must not hash equal
    val lines = rows.map(r => perm.map(i => canon(r.get(i))).mkString("\u0001"))
    java.util.Arrays.sort(lines, java.util.Comparator.naturalOrder[String]())
    val md = MessageDigest.getInstance("MD5")
    lines.foreach { l => md.update(l.getBytes("UTF-8")); md.update(0: Byte) }
    md.digest().map("%02x".format(_)).mkString
  }

  private def canon(v: Any): String = v match {
    case null => "NULL"
    case d: Double => if (d == 0.0) "0.0" else d.toString // collapse -0.0
    case f: Float => if (f == 0.0f) "0.0" else f.toString
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + ":" + canon(x) }.toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case x => x.toString
  }
}
