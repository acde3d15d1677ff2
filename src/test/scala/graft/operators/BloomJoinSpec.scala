package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom pre-filtered joins: superset contract, exact composition,
  * map-side placement.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (0L until 10000L).map(i => (i, i % 7)).toDF("fk", "payload")
  // 50 selective dim keys, disjoint tail beyond most of the fact
  private def dim = (0L until 50L).map(i => (i * 3, s"d$i")).toDF("dk", "name")

  test("prefilter keeps every true match and drops most non-matches") {
    val pre = BloomJoin.prefilter(fact, col("fk"), dim, col("dk"))
    val preKeys = pre.select("fk").as[Long].collect().toSet
    val trueKeys = fact.join(dim.select(col("dk").as("fk")), Seq("fk"), "left_semi")
      .select("fk").as[Long].collect().toSet
    assert(trueKeys.subsetOf(preKeys), "bloom must never drop a true match")
    // 50 of 10000 keys match; ~1% fpp sketch keeps the superset small
    assert(preKeys.size < 1000, s"expected strong reduction, got ${preKeys.size}")
  }

  test("semi and inner equal their exact-join counterparts") {
    val semi = BloomJoin.semi(fact, dim, "fk", "dk")
      .select("fk").as[Long].collect().sorted.toSeq
    val exactSemi = fact.join(dim.select(col("dk").as("fk")), Seq("fk"), "left_semi")
      .select("fk").as[Long].collect().sorted.toSeq
    assert(semi === exactSemi)
    val inner = BloomJoin.inner(fact, dim, "fk", "dk")
      .select(col("fk"), col("name")).as[(Long, String)].collect().sorted.toSeq
    val exactInner = fact.join(dim, col("fk") === col("dk"))
      .select(col("fk"), col("name")).as[(Long, String)].collect().sorted.toSeq
    assert(inner === exactInner)
  }

  test("empty dim yields an empty, well-typed result without a sketch") {
    val out = BloomJoin.semi(fact, dim.filter(lit(false)), "fk", "dk")
    assert(out.columns.contains("fk"))
    assert(out.count() === 0L)
  }

  test("the might-contain probe sits in the fact-side scan filter") {
    // file-backed fact: a LocalRelation would let the optimizer evaluate
    // the probe at plan time and hide it from the physical plan
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomfact").toString
    fact.write.mode("overwrite").parquet(dir)
    val plan = BloomJoin.semi(spark.read.parquet(dir), dim, "fk", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the physical plan:\n$plan")
  }

  test("null fact keys never join but survive the probe pipeline") {
    val withNulls = fact.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], 1L)).toDF("fk", "payload")
        .select(col("fk").cast("long"), col("payload")))
    val out = BloomJoin.semi(withNulls, dim, "fk", "dk")
      .select("fk").as[Long].collect().toSeq
    assert(!out.contains(null) && out.nonEmpty)
  }
}
