package graft

import org.apache.spark.sql.functions._

import graft.quality.ConstraintAudit._

class ConstraintAuditSpec extends SparkSpec {

  private def frame = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double, String, java.lang.Long)](
      (1L, 5.0, "A", 10L),
      (2L, 5.0, "N", 10L),
      (3L, -1.0, "R", 20L),   // range violation
      (3L, 2.0, "X", 20L),    // dup key + bad accepted value
      (null, 99.0, "A", 30L), // null key + range violation
      (6L, 1.0, "N", 40L)     // dangling fk (40 not in dim)
    ).toDF("id", "v", "flag", "fk")
  }

  private def dim = {
    import spark.implicits._
    Seq(10L, 20L, 30L).toDF("k")
  }

  test("each constraint type counts its violations exactly") {
    val out = audit(frame, Seq(
      NotNull("id"),
      InRange("v", 0.0, 10.0),
      Accepted("flag", Seq("A", "N", "R")),
      Satisfies("v_lt_fk", col("v") < col("fk")),
      Unique(Seq("id")),
      RefIntegrity("fk", dim, "k")
    )).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(out("not_null(id)") == ((6L, 1L, false)))
    assert(out("range(v,0.0,10.0)") == ((6L, 2L, false)))
    assert(out("accepted(flag)") == ((6L, 1L, false)))
    // v < fk fails for (null id, 99.0, 30) only
    assert(out("satisfies(v_lt_fk)") == ((6L, 1L, false)))
    // ids: 1,2,3,3,null,6 -> one surplus row for key 3; null keys group
    assert(out("unique(id)") == ((6L, 1L, false)))
    // fks checked: all 6 non-null; 40 dangles once
    assert(out("ref(fk)") == ((6L, 1L, false)))
  }

  test("a clean table passes everything, in declaration order") {
    val clean = frame.filter(col("id").isNotNull && col("id") =!= 3 && col("fk") =!= 40)
    val rows = audit(clean, Seq(
      Unique(Seq("id")),          // deliberately NOT alphabetical
      NotNull("id"),
      InRange("v", 0.0, 10.0),
      RefIntegrity("fk", dim, "k")
    )).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("unique(id)", "not_null(id)", "range(v,0.0,10.0)", "ref(fk)"))
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.forall(_.getLong(2) == 0))
  }

  test("row-local constraints share one aggregate pass") {
    val plan = audit(frame, Seq(
      NotNull("id"), InRange("v", 0.0, 10.0), Accepted("flag", Seq("A")),
      Satisfies("p", col("v") > 0)
    )).queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1,
      s"expected ONE shared aggregate for 4 row-local constraints, got ${aggs.size}")
  }

  test("empty constraint list yields an empty report; duplicates are rejected") {
    val empty = audit(frame, Seq.empty)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("constraint", "checked", "violations", "pass"))
    intercept[IllegalArgumentException] {
      audit(frame, Seq(NotNull("id"), NotNull("id")))
    }
  }

  test("an empty table audits as pass for every constraint family") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Long, String)].toDF("id", "status")
    val dim = Seq(1L).toDF("rid")
    val out = audit(empty, Seq(
      NotNull("id"),
      InRange("id", 0, 10),
      Unique(Seq("id")),
      RefIntegrity("id", dim, "rid")))
      .collect()
    // sum over zero rows is null — the row-local lane must coalesce
    // it so a gate reading `pass` gets true, not an NPE
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(3),
        s"empty-table verdict not (0, 0, true): $r")
    }
  }

  test("null keys in Unique group like values (surplus counted once)") {
    import spark.implicits._
    val withNullDups = Seq[java.lang.Long](null, null, 7L, 7L, 7L, 8L).toDF("id")
    val out = audit(withNullDups, Seq(Unique(Seq("id")))).collect().head
    // surplus: one extra null + two extra 7s = 3
    assert(out.getLong(1) == 6L && out.getLong(2) == 3L)
  }
}
