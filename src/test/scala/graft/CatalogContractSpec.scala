package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Driver-contract invariants of the query catalog — violations here
  * corrupt the harness outputs silently (duplicate bench short-ids
  * produce an invalid JSON object; duplicate names drop queries from
  * the SparkEntry maps), so they are asserted as a plain unit suite.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct).distinct}")
    names.foreach(n => assert(n.matches("q\\d+[a-z]?_[a-z0-9_]+"), s"bad name: $n"))
  }

  test("bench short ids (prefix before first underscore) are unique") {
    val shorts = Catalog.headline.map(_.name.takeWhile(_ != '_'))
    assert(shorts.distinct.size == shorts.size,
      s"bench JSON key collision: ${shorts.diff(shorts.distinct).distinct}")
  }

  test("oracle SQL, when declared, is non-empty and single-statement") {
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty, s"$n: empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$n: oracle must be a single statement")
    }
  }

  test("SparkEntry adapts the full catalog") {
    assert(SparkEntry.queries.keySet == Catalog.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ==
      Catalog.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }
}
