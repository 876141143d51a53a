package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: a set of constraints over a table,
  * evaluated into one (constraint, checked, violations, pass) row
  * each — the contract gate a production pipeline runs before
  * publishing a snapshot (the deequ/great-expectations shape,
  * re-expressed Spark-first).
  *
  * Scale shape: every ROW-LOCAL constraint (not-null, range, accepted
  * values, arbitrary predicate) folds into ONE shared aggregate pass
  * over the table — adding a constraint adds a column to the agg, not
  * a scan. Key-level constraints need their own shape and get it:
  * uniqueness is a key-grain hash-agg (map-side partials), referential
  * integrity is an anti-join probe (broadcast when the dimension
  * fits). Nothing is quadratic, nothing re-scans per constraint.
  */
object ConstraintAudit {

  sealed trait Constraint { def name: String }

  /** `col IS NOT NULL`. */
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }

  /** `lo <= col <= hi` (null counts as a violation). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def name = s"range($col,$lo,$hi)"
  }

  /** `col IN (values)` (null counts as a violation). */
  final case class Accepted(col: String, values: Seq[String]) extends Constraint {
    def name = s"accepted($col)"
  }

  /** Arbitrary row predicate; rows where it is false or null violate. */
  final case class Satisfies(label: String, predicate: Column) extends Constraint {
    def name = s"satisfies($label)"
  }

  /** No two rows share the key; violations = surplus rows beyond the
    * first per duplicated key. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null `col` exists in `refCol` of the dimension;
    * violations = rows whose key misses. */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Constraint {
    def name = s"ref($col)"
  }

  /** One output row per constraint, in declaration order:
    * (constraint, checked, violations, pass).
    */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (constraints.isEmpty)
      return spark.emptyDataset[(String, Long, Long, Boolean)]
        .toDF("constraint", "checked", "violations", "pass")
    require(constraints.map(_.name).distinct.size == constraints.size,
      s"duplicate constraint names: ${constraints.map(_.name)
        .groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(", ")}")

    def rowLocalViolation(c: Constraint): Option[Column] = c match {
      case NotNull(col0) => Some(col(col0).isNull)
      case InRange(col0, lo, hi) =>
        Some(!col(col0).between(lo, hi) || col(col0).isNull)
      case Accepted(col0, vs) =>
        Some(!col(col0).isin(vs: _*) || col(col0).isNull)
      case Satisfies(_, p) => Some(!coalesce(p, lit(false)))
      case _ => None
    }

    val rowLocal = constraints.flatMap(c => rowLocalViolation(c).map(c -> _))
    val rowLocalDf: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        // one shared aggregate pass; melt the single row into the
        // long format with a per-constraint struct explode
        // coalesce: sum over ZERO rows is null, and an empty snapshot
        // must audit as (checked=0, violations=0, pass=true) — the
        // same verdict the key-level constraints already give — not
        // as a null verdict that NPEs a gate reading pass
        val aggs = count(lit(1)).as("__checked") +:
          rowLocal.zipWithIndex.map { case ((_, v), i) =>
            coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val entries = rowLocal.zipWithIndex.map { case ((c, _), i) =>
          struct(lit(c.name).as("constraint"), $"__checked".as("checked"),
            col(s"__v$i").as("violations"))
        }
        Some(one.select(explode(array(entries: _*)).as("e"))
          .select($"e.constraint", $"e.checked", $"e.violations"))
      }

    val keyed: Seq[DataFrame] = constraints.collect {
      case c @ Unique(cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum($"cnt"), lit(0L)).as("checked"),
            coalesce(sum(when($"cnt" > 1, $"cnt" - 1).otherwise(0L)), lit(0L))
              .as("violations"))
          .select(lit(c.name).as("constraint"), $"checked", $"violations")
      case c @ RefIntegrity(col0, ref, refCol) =>
        // one pass: a left join against the distinct dimension keys
        // feeds checked and violations from the same scan — the
        // anti-join + separate count spelling read the fact table
        // twice, doubling the dominant I/O this operator's contract
        // ("nothing re-scans per constraint") forbids
        val probe = df.select(col(col0).as("__k")).filter($"__k".isNotNull)
        val dim = ref.select(col(refCol).as("__k")).distinct()
          .withColumn("__hit", lit(1))
        probe.join(dim, Seq("__k"), "left")
          .agg(count(lit(1)).as("checked"),
            coalesce(sum(when($"__hit".isNull, 1L).otherwise(0L)), lit(0L))
              .as("violations"))
          .select(lit(c.name).as("constraint"), $"checked", $"violations")
    }

    val parts = rowLocalDf.toSeq ++ keyed
    val unioned = parts.reduce(_ unionByName _)
    // re-impose declaration order (union order is rowLocal-first)
    val order = constraints.map(_.name).zipWithIndex.toMap
    val orderUdf = map(order.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }.toSeq: _*)
    unioned
      .withColumn("__ord", element_at(orderUdf, $"constraint"))
      .orderBy($"__ord")
      .select($"constraint", $"checked", $"violations",
        ($"violations" === 0).as("pass"))
  }
}
