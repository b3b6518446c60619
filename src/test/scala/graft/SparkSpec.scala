package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (small core count — unit tests are
  * about semantics, not throughput).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Engine.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
  ).getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (fork := true gives one
    // JVM per test run) — do not stop it here.
    super.afterAll()
  }
}
