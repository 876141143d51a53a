package graft

import graft.queries.Catalog

/** Dump `explain("formatted")` for each query (or a named subset) —
  * the plan-review loop: verify PushedFilters reach the parquet scan,
  * dimension joins broadcast, and WholeStageCodegen spans stay wide.
  *
  * Usage: runMain graft.Explain [sfDir] [name1 name2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Catalog.all.map(_.name)
    val spark = graft.engine.Graft.session("local[4]", 4)
    names.foreach { n =>
      Catalog.byName.get(n).foreach { q =>
        println(s"\n=============== ${q.name} ===============")
        try q.run(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
