package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for the whole test JVM (Test/fork := true gives the
  * suite its own JVM; suites share the session to avoid per-suite
  * startup).
  */
object TestSpark {
  lazy val spark: SparkSession = Engine.session(4)
}

/** Base for all specs: shared session + tiny helpers. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** sf0.001 testdata dir (smallest; specs that read testdata use it). */
  val sfDir = "/root/testdata/sf0.001"
}
