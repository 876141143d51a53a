package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.queries.Catalog
import graft.sources.Tables

/** Regression guard for the `events.ts` parquet encoding drift.
  *
  * The driver has regenerated `events.parquet` twice with different
  * physical `ts` encodings, and each time a batch of queries broke at
  * analysis time (round 4: TIMESTAMP(NANOS) rejected by the vectorized
  * reader; round 6: timestamp[us] with isAdjustedToUTC=false read as
  * TIMESTAMP_NTZ, failing `unix_millis`). This suite writes a fixture
  * for every encoding seen so far and asserts the loader normalizes all
  * of them to TimestampType with identical instants — so the third
  * regeneration is a no-op.
  */
class SchemaDriftSpec extends SparkSpec {

  private val srcDir = Paths.get("/root/testdata/sf0.001")

  /** Copy the sf0.001 tables into a fresh dir, with `events.parquet`
    * replaced by the given re-encoding of the original events rows. */
  private def fixtureDir(tag: String)(writeEvents: (DataFrame, String) => Unit): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$tag")
    dir.toFile.deleteOnExit()
    Tables.all.filterNot(_ == "events").foreach { t =>
      Files.copy(srcDir.resolve(s"$t.parquet"), dir.resolve(s"$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeEvents(Tables.events(spark, srcDir.toString), s"$dir/events.parquet")
    dir.toString
  }

  // Encoding 1 (round 6, current): parquet timestamp[us] with
  // isAdjustedToUTC=false -> Spark reads TIMESTAMP_NTZ.
  private lazy val ntzDir = fixtureDir("ntz") { (ev, out) =>
    ev.withColumn("ts", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(out)
  }

  // Encoding 2: parquet timestamp[us] UTC-adjusted -> Spark TIMESTAMP.
  // (Save/restore the session conf — the shared test session must not
  // leak a non-default output type into later suites.)
  private lazy val utcDir = fixtureDir("utc") { (ev, out) =>
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try ev.coalesce(1).write.mode("overwrite").parquet(out)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // Encoding 3 (rounds 1-5): parquet TIMESTAMP(NANOS). Spark cannot
  // write that logical type, but the loader reads it via
  // legacy.parquet.nanosAsLong as a raw LongType of epoch-nanos — a
  // plain int64 column of epoch-nanos exercises the identical loader
  // branch (LongType -> `ts div 1000` -> timestamp_micros).
  private lazy val nanosDir = fixtureDir("nanos") { (ev, out) =>
    ev.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .coalesce(1).write.mode("overwrite").parquet(out)
  }

  private lazy val encodings = Seq("ntz" -> ntzDir, "utc" -> utcDir, "nanos" -> nanosDir)

  private def instants(dir: String): Set[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("loader normalizes every historical ts encoding to TimestampType") {
    val want = instants(srcDir.toString)
    encodings.foreach { case (tag, dir) =>
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType == TimestampType,
        s"$tag: loader left ts as ${got.schema("ts").dataType}")
      assert(instants(dir) == want, s"$tag: instants drifted")
    }
  }

  // Queries that read events, detected by building each query against a
  // fixture dir with every table EXCEPT events: `spark.read.parquet`
  // resolves the path eagerly, so exactly the events-readers throw.
  // (Plan-based detection via `inputFiles` misses queries behind an RDD
  // barrier, e.g. q146's GlobalRank zipWithIndex.) The list cannot rot
  // as the catalog grows.
  private lazy val noEventsDir: String = {
    val dir = Files.createTempDirectory("graft-drift-noev")
    dir.toFile.deleteOnExit()
    Tables.all.filterNot(_ == "events").foreach { t =>
      Files.copy(srcDir.resolve(s"$t.parquet"), dir.resolve(s"$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  private lazy val eventsReaders: Seq[String] =
    Catalog.all.filter { q =>
      try { q.run(spark, noEventsDir); false }
      catch { case _: Throwable => true }
    }.map(_.name)

  test("every events-reading query analyzes under all three encodings") {
    assert(Set("q10_tumbling_window", "q40_sessionize", "q146_zorder_layout")
      .subsetOf(eventsReaders.toSet), s"detector lost known readers: $eventsReaders")
    encodings.foreach { case (tag, dir) =>
      eventsReaders.foreach { name =>
        // .schema forces analysis; an encoding regression resurfaces as
        // DATATYPE_MISMATCH here instead of in the driver's verify run.
        val schema = Catalog.byName(name).run(spark, dir).schema
        assert(schema.fieldNames.nonEmpty, s"$tag/$name")
      }
    }
  }
}
