package graft

import graft.queries.Catalog

/** Dev tool: print a catalog query's executed physical plan (the
  * `.explain("formatted")`-grade view the plan audits iterate on)
  * without spinning up a spec run. Usage:
  *
  *   scripts/runjava.sh graft.PlanDump <queryName> [sfDir]
  *
  * Prints the executedPlan toString — the same text
  * PlanAssertionsSpec asserts against — so a plan pin can be written
  * from exactly what the assertion will see.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName>... [sfDir]")
    val dir = args.find(a => !Catalog.byName.contains(a))
      .getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.Graft.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.filter(Catalog.byName.contains).foreach { name =>
      val df = Catalog.byName(name).run(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
