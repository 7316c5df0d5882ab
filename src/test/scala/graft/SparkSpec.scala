package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object SparkSpec {
  lazy val spark: SparkSession = {
    // Tests execute registry queries too; without this a test JVM
    // re-executing an ANN query OVERWRITES the fixed-path frozen-model
    // dumps a pending Verify→DuckDB compare reads (observed: a test
    // run clobbered the sf1 gate's dumps mid-compare and the sim_*
    // oracles went red against sf0.001 models). Tests never read the
    // dumps — suppress them, the same way Bench does.
    System.setProperty("graft.oracle.dump", "off")
    val s = GraftSession.builder("local[8]", 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(s)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sfDir: String       = SparkSpec.sfDir
}
