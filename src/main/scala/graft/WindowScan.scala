package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import graft.queries.Catalog

/** Dev tool: list every catalog query whose physical plan contains an
  * unpartitioned WindowExec (the "No Partition Defined" warning
  * source), with the child node feeding it — so the plan audit can
  * separate BOUNDED single-partition windows (child is a
  * TakeOrdered/limit/agg-collapsed frame; the warning is cosmetic)
  * from corpus-grain ones (a scale bug). AQE is disabled for the scan
  * so the executed plan is a plain walkable tree; window partitioning
  * is decided before AQE, so the verdict is the same either way.
  *
  *   scripts/runjava.sh graft.WindowScan [sfDir]
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-windowscan")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.all.foreach { q =>
      try {
        val plan = q.run(spark, dir).queryExecution.executedPlan
        val bare = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        bare.foreach { w =>
          val child = w.child.toString.linesIterator.take(2).mkString(" | ")
          println(s"${q.name}\tUNPARTITIONED\t${w.windowExpression.size} exprs\tchild: ${child.take(220)}")
        }
      } catch {
        case e: Throwable =>
          println(s"${q.name}\tERROR\t${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    spark.stop()
  }
}
