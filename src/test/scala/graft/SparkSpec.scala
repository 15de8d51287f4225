package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared local session for all suites (getOrCreate dedups across suites
  * in one JVM — sbt forks a single test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  val Sf0001 = "/root/testdata/sf0.001"
}
