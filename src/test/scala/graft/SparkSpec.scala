package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Graft.session("local[4]", 4)
}
