package graft

import graft.queries.Catalog

/** Dump one catalog query's result to parquet at an arbitrary SF —
  * the dev loop for checking a query's output at a scale the sf0.01
  * Verify gate doesn't cover (e.g. q102's quantized-shortlist recall
  * at sf0.1, compared against DuckDB on the same dir).
  *
  * Usage: runMain graft.Dump <queryName> <sfDir> <outDir>
  */
object Dump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    Catalog.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
