package graft

import java.util.concurrent.Executors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Catalog
import graft.sources.Tables

/** Blanket robustness over the WHOLE declared query surface: every
  * catalog query must plan and execute against fully EMPTY tables,
  * SINGLE-ROW tables, and NULL-BEARING tables — the shapes of a fresh
  * deployment, a partition with no matching rows, a constant column
  * (zero range), a single source (no "others" to compare against),
  * and a feed whose upstream shipped null text/values/embeddings.
  * "Work" means return a (possibly empty or NULL-carrying) result
  * without crashing; a query that throws on degenerate input is a
  * latent production incident, not an edge case. Found live by this
  * spec's first runs, all fixed with value-identical-on-real-data
  * spellings (sf0.01 oracle hashes unchanged):
  *
  *  - q95 conversion ratio: ANSI DIVIDE_BY_ZERO at n_view = 0 →
  *    try_divide;
  *  - q129 drift-vs-other-sources: single source → try_divide (the
  *    statistic is undefined); null source zeroed its own counts
  *    through the plain using-join → null-safe <=> grid match;
  *  - q146 quantization: constant column (zero range) →
  *    `div greatest(range, 1)`;
  *  - null embeddings NPE'd the CosinePairs primitive-array kernels
  *    (q21/q103) → excluded at every entry point, mirroring SQL
  *    aggregate null semantics;
  *  - null vectors made hyperplaneBucket's dim guard itself throw
  *    USER_RAISED_EXCEPTION(null) (q22) → NULL bucket / NULL bucket
  *    ARRAY, excluding the row via explode;
  *  - null text produced a null media payload that NPE'd the decode
  *    kernels mid-task (q164) → excluded at ingest (a media record
  *    without bytes is not a media record).
  *
  * The one documented exception: q145's `Pca.fit` REQUIRES >= 2 rows
  * (a covariance fit has no meaningful output below that) and fails
  * loudly by contract — asserted here so the contract stays loud
  * instead of silently changing.
  */
class DegenerateInputsSpec extends SparkSpec {

  private def write(dir: String, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private def base(t: String): DataFrame =
    // read through the engine's own readers so schema normalization
    // (events' three shipped timestamp encodings) is applied once here
    if (t == "events") Tables.events(spark, "/root/testdata/sf0.001")
    else Tables(spark, "/root/testdata/sf0.001", t)

  private def shrunk(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"sf_$rows").toString
    Tables.all.foreach(t => write(dir, t, base(t).limit(rows)))
    dir
  }

  private lazy val emptyDir: String = shrunk(0)
  private lazy val oneRowDir: String = shrunk(1)

  /** sf0.001 with nulls injected into every plausibly-null column: a
    * fifth of document texts, sevenths of langs/event types, etc. —
    * deterministic (keyed on ids), so failures reproduce. EMPTY and
    * whitespace-only texts are injected too: they are a DIFFERENT
    * failure class from NULL (NULL propagates through arithmetic,
    * but an empty doc yields real ZEROS — 0 BPE tokens, 0 shingles —
    * that reach divisors and ANSI-throw where NULL would quietly
    * skip; q133's DIVIDE_BY_ZERO hid exactly there). */
  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sf_nulls").toString
    def nullify(df: DataFrame, col0: String, keyCol: String, mod: Int): DataFrame =
      df.withColumn(col0,
        when(col(keyCol) % mod === 0, lit(null)).otherwise(col(col0)))
    Tables.all.foreach { t =>
      val df = t match {
        case "documents" =>
          var d = base(t)
          d = nullify(d, "text", "doc_id", 5)
          d = d.withColumn("text",
            when(col("doc_id") % 13 === 1, lit(""))
              .when(col("doc_id") % 17 === 2, lit("  \t "))
              .otherwise(col("text")))
          d = nullify(d, "lang", "doc_id", 7)
          nullify(d, "source", "doc_id", 11)
        case "events" =>
          var d = base(t)
          d = nullify(d, "value", "event_id", 5)
          nullify(d, "event_type", "event_id", 7)
        case "embeddings" =>
          // empty arrays and all-zero vectors are distinct classes from
          // NULL: a zero-norm vector's cosine is an ANSI DIVIDE_BY_ZERO
          // and element_at on an empty array throws — the whole ANN
          // family aborted on exactly these before VF.usableVec
          nullify(base(t), "embedding", "vec_id", 5)
            .withColumn("embedding",
              when(col("vec_id") % 13 === 1,
                array().cast("array<float>"))
              .when(col("vec_id") % 17 === 2,
                transform(col("embedding"), _ => lit(0.0f)))
              .otherwise(col("embedding")))
        case other => base(other)
      }
      write(dir, t, df)
    }
    dir
  }

  private def runAll(dir: String, label: String,
                     except: Set[String] = Set.empty): Unit = {
    val pool = Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val tasks = Catalog.all.filterNot(q => except(q.name)).map { q =>
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
    runAll(emptyDir, "empty", except = Set("q145_pca_project"))
  }

  test("every catalog query executes on single-row tables (constant columns, one source)") {
    runAll(oneRowDir, "single-row", except = Set("q145_pca_project"))
  }

  test("every catalog query executes on null-bearing tables (null text/source/values/embeddings)") {
    runAll(nullDir, "null-bearing")
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
