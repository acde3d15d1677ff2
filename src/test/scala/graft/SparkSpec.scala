package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per JVM (suites run sequentially in the forked
  * test JVM; getOrCreate hands every suite the same session) — mirrors the
  * reference's SparkForAll fixture (runtime/src/test/scala/.../SparkForAll
  * .scala:24-77).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Reference-style micro-models (FIXTURES.md §A): Foo the master, Bar the
  * transaction, nullable keys throughout.
  */
final case class Foo(id: Option[Int], name: String)
final case class Bar(id: Option[Int], fooId: Option[Int], v: Int)
