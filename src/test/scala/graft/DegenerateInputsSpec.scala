package graft

import java.util.concurrent.Executors

import graft.queries.Catalog
import graft.sources.Tables

/** Blanket robustness over the WHOLE declared query surface: every
  * catalog query must plan and execute against fully EMPTY tables and
  * against SINGLE-ROW tables — the shapes of a fresh deployment, a
  * partition with no matching rows, a constant column (zero range), a
  * single source (no "others" to compare against). "Work" means
  * return a (possibly empty or NULL-carrying) result without
  * crashing; a query that throws on degenerate input is a latent
  * production incident, not an edge case. Found live by this spec's
  * first runs, all fixed with value-identical-on-real-data spellings:
  * q95's conversion ratio (ANSI DIVIDE_BY_ZERO at n_view = 0 →
  * try_divide), q129's drift-vs-other-sources denominator (single
  * source → try_divide, NULL statistic), q146's quantization range
  * (constant column → `div greatest(range, 1)`, cell 0).
  *
  * The one documented exception: q145's `Pca.fit` REQUIRES >= 2 rows
  * (a covariance fit has no meaningful output below that) and fails
  * loudly by contract — asserted here so the contract stays loud
  * instead of silently changing.
  */
class DegenerateInputsSpec extends SparkSpec {

  private def shrunk(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"sf_$rows").toString
    // write through the engine's own readers so schema normalization
    // (events' three shipped timestamp encodings) is applied once here
    Tables.all.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, "/root/testdata/sf0.001")
        else Tables(spark, "/root/testdata/sf0.001", t)
      src.limit(rows).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir: String = shrunk(0)
  private lazy val oneRowDir: String = shrunk(1)

  private def runAll(dir: String, label: String): Unit = {
    val pool = Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val tasks = Catalog.all.filterNot(_.name == "q145_pca_project").map { q =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            val out = q.run(spark, dir)
            assert(out.schema.nonEmpty)
            out.collect() // force full execution, not just planning
          } catch {
            case e: Throwable =>
              failures.add(s"${q.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
          }
          graft.operators.Checkpoints.release()
        }
      })
    }
    pool.shutdown()
    tasks.foreach(_.get())
    graft.operators.Checkpoints.releaseAll()
    assert(failures.isEmpty,
      s"queries crashed on $label input:\n${failures.toArray.mkString("\n")}")
  }

  test("every catalog query executes on fully empty tables (q145's loud fit contract excepted)") {
    runAll(emptyDir, "empty")
  }

  test("every catalog query executes on single-row tables (constant columns, one source)") {
    runAll(oneRowDir, "single-row")
  }

  test("q145 (PCA fit) fails LOUDLY below 2 rows, per its contract") {
    Seq(emptyDir, oneRowDir).foreach { dir =>
      val e = intercept[IllegalArgumentException] {
        Catalog.byName("q145_pca_project").run(spark, dir).collect()
      }
      assert(e.getMessage.contains("at least 2 rows"), e.getMessage)
    }
  }
}
