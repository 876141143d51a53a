package graft

import graft.queries.Catalog

/** Measurement harness (optimization rounds): execute each named query
  * into the noop sink, then print the FINAL adaptive physical plan —
  * the runtime truth `Explain`'s pre-execution dump cannot show
  * (ReusedExchange dedup, AQE join-strategy switches, coalesced
  * partition counts). Static plans systematically overstate subplan
  * duplication because identical exchanges are deduplicated only at
  * execution; deciding where a checkpoint pays requires this view.
  *
  * Usage: runMain graft.FinalPlan [sfDir] [name1 name2 ...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Catalog.all.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.engine.Graft.session(s"local[$cpus]", cpus.toInt)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(f"[exec $funcName ${durationNs / 1e9}%.3f s]%n" +
          qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    names.foreach { n =>
      Catalog.byName.get(n).foreach { q =>
        println(s"\n=============== ${q.name} ===============")
        try {
          plans.clear()
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // the listener fires asynchronously on the listener bus;
          // wait until the queue stops growing (3 consecutive stable
          // 200 ms checks) so a late-arriving execution cannot be
          // mis-attributed to the NEXT query's section. Bounded: if
          // the bus drops the event (or a query shape fires none),
          // give up after ~6 s instead of spinning forever.
          var stable = 0
          var last = -1
          var waits = 0
          while (stable < 3 && waits < 30) {
            Thread.sleep(200)
            waits += 1
            val n = plans.size
            if (n == last && n > 0) stable += 1 else stable = 0
            last = n
          }
          if (plans.isEmpty)
            println(s"[finalplan] ${q.name}: no executions captured (listener event lost?)")
          println(f"[finalplan] ${q.name} $sec%.3f s, ${plans.size} executions")
          plans.forEach(p => println(p))
          plans.clear()
        } catch { case e: Throwable => println(s"finalplan failed: ${e.getMessage}") }
        graft.operators.Checkpoints.releaseAll()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
