package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitters: exact counts, no false positives or negatives") {
    // 100 tokens: "hot" x30, "warm" x20, 50 singletons; k=4 -> threshold 25
    val toks = Seq.fill(30)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 50).map(i => s"t$i")
    val df = spark.sparkContext.parallelize(toks, 8).toDF("t")
    val got = Frequency.heavyHitters(df, col("t"), k = 4)
      .select(col("term"), col("cnt"), col("total"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("hot", 30L, 100L)))
  }

  test("heavyHitters: boundary count == total/k is included") {
    // "x" x25 of 100, k=4: 25 * 4 == 100 -> kept
    val toks = Seq.fill(25)("x") ++ (1 to 75).map(i => s"t$i")
    val df = spark.sparkContext.parallelize(toks, 4).toDF("t")
    val got = Frequency.heavyHitters(df, col("t"), k = 4)
      .select(col("term")).as[String].collect().toSet
    assert(got === Set("x"))
  }

  test("heavyHitters: skewed-partition placement still nominated") {
    // the heavy term lives entirely in ONE partition; pigeonhole still
    // nominates it from that partition's summary
    val part0 = Seq.fill(40)("solo")
    val rest = (1 to 160).map(i => s"t$i")
    val df = spark.sparkContext
      .parallelize(Seq(part0, rest.take(80), rest.drop(80)), 3)
      .flatMap(identity).toDF("t")
    val got = Frequency.heavyHitters(df, col("t"), k = 5)
      .select(col("term"), col("cnt")).as[(String, Long)].collect().toSet
    assert(got === Set(("solo", 40L)))
  }

  test("heavyHitters: empty input yields empty result") {
    val df = Seq.empty[String].toDF("t")
    assert(Frequency.heavyHitters(df, col("t"), k = 4).count() === 0L)
  }
}
