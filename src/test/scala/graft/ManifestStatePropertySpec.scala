package graft

import java.nio.file.Files
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.{CdcStream, ManifestState}

/** Property test for the manifest-committed state: random op-sequences,
  * randomly batched AND randomly distributed over concurrent writers,
  * must materialize to the naive Map replay in global (lsn) order —
  * the same executable spec as CdcMergePropertySpec, now through the
  * optimistic multi-writer commit path.
  */
class ManifestStatePropertySpec extends SparkSpec {

  private case class Op(id: String, lsn: Long, isDelete: Boolean, payload: String)

  private val genOps: Gen[List[Op]] = for {
    n <- Gen.choose(1, 40)
    ops <- Gen.listOfN(n, for {
      id <- Gen.oneOf("a", "b", "c", "d")
      del <- Gen.prob(0.3)
      pay <- Gen.alphaStr.map(_.take(6))
    } yield (id, del, pay))
  } yield ops.zipWithIndex.map { case ((id, del, pay), i) =>
    Op(id, i.toLong + 1, del, pay)
  }

  private def changes(ops: Seq[Op]): DataFrame = {
    import spark.implicits._
    ops.map(o => (if (o.isDelete) CdcStream.Delete else CdcStream.Upsert,
                  o.id, o.lsn, o.payload))
      .toDF("event_type", "id", "lsn", "payload")
      .select(col("event_type"), col("id"),
        lit(0L).as("create_time"), col("lsn").as("update_time"),
        col("payload").as("message"), lit("u").as("username"),
        col("lsn"), (col("lsn") * 10).as("ts_ms"))
  }

  test("concurrent random-batched merges == naive Map replay") {
    val params = Gen.Parameters.default
    (1 to 6).foreach { i =>
      val seed = 1000L + i
      val ops = genOps.apply(params, Seed(seed)).getOrElse(Nil)

      // naive replay in lsn order; tombstoned ids simply absent
      val model = scala.collection.mutable.Map[String, String]()
      ops.sortBy(_.lsn).foreach { op =>
        if (op.isDelete) model.remove(op.id) else model.update(op.id, op.payload)
      }

      // split ops into 3 writer-streams of random batches; lsn gives
      // the global order regardless of interleaving
      val root = Files.createTempDirectory(s"mprop$i").toString
      val byWriter = ops.zipWithIndex.groupMap(_._2 % 3)(_._1)
      val pool = Executors.newFixedThreadPool(3)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until 3).foreach { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try byWriter.getOrElse(w, Nil).grouped(5).foreach { b =>
              ManifestState.mergeBatch(changes(b), root, nBuckets = 4)
            } catch { case t: Throwable => failures.add(t) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS), s"seed $seed timed out")
      assert(failures.isEmpty, s"seed $seed writer failed: ${failures.peek()}")

      val got = ManifestState.readView(spark, root)
        .select("id", "message").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == model.toMap, s"seed $seed: ops=$ops")
    }
  }
}
