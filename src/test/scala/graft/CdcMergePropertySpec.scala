package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the distributed latest-wins materialization equals a
  * naive in-memory Map replay — the reference's client model
  * (`static/index.html:206-212`) as executable spec.
  *
  * Uses scalacheck Gen directly with fixed seeds (deterministic, no
  * scalatestplus bridge needed offline).
  */
class CdcMergePropertySpec extends SparkSpec {

  private case class Op(id: String, lsn: Long, isDelete: Boolean, payload: String)

  private val genOps: Gen[List[Op]] = for {
    n <- Gen.choose(0, 60)
    ops <- Gen.listOfN(n, for {
      id <- Gen.oneOf("a", "b", "c", "d", "e")
      del <- Gen.prob(0.3)
      pay <- Gen.alphaStr.map(_.take(6))
    } yield (id, del, pay))
  } yield ops.zipWithIndex.map { case ((id, del, pay), i) =>
    Op(id, i.toLong + 1, del, pay)
  }

  test("materialize == naive Map replay for random op sequences") {
    import spark.implicits._
    val params = Gen.Parameters.default
    (1 to 15).foreach { i =>
      val ops = genOps.apply(params, Seed(42L + i)).getOrElse(Nil)

      // naive replay in arrival (= lsn) order
      val model = scala.collection.mutable.LinkedHashMap[String, String]()
      ops.sortBy(_.lsn).foreach { op =>
        if (op.isDelete) model.remove(op.id)
        else model.update(op.id, op.payload)
      }
      val expected = model.toMap

      val got =
        if (ops.isEmpty) Map.empty[String, String]
        else {
          val df = ops.map(o => (o.id, o.lsn, if (o.isDelete) "DELETE" else "UPSERT", o.payload))
            .toDF("id", "lsn", "event_type", "payload")
          graft.operators.CdcMerge.materialize(
              df, Seq("id"), Seq($"lsn".desc), $"event_type" === "DELETE")
            .select("id", "payload").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
        }
      assert(got == expected, s"seed ${42L + i}: ops=$ops")
    }
  }
}
