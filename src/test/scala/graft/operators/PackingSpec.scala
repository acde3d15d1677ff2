package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n).select($"id", ($"id" % 97 + 3).as("tokens"))

  test("prefixSumBefore equals the single-window formulation") {
    val df = docs(500)
    val w = Window.orderBy(Sampling.hashBucket($"id", 1 << 30), $"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = df.withColumn("before", coalesce(sum($"tokens").over(w), lit(0L)))
    for (buckets <- Seq(1, 16, 64)) {
      val dist = Packing.prefixSumBefore(df, $"id", $"tokens", "before", buckets)
      assert(dist.select("id", "before").except(naive.select("id", "before")).isEmpty,
        s"buckets=$buckets diverged from the global window")
    }
  }

  test("globalShuffle positions are a permutation of 1..n") {
    val pos = Packing.globalShuffle(docs(300), $"id", buckets = 32)
      .select($"shuffle_pos".as[Long]).collect().sorted
    assert(pos === (1L to 300L).toArray)
  }

  test("globalShuffle order is deterministic and not the identity") {
    val a = Packing.globalShuffle(docs(200), $"id", buckets = 8)
      .orderBy("shuffle_pos").select($"id".as[Long]).collect()
    val b = Packing.globalShuffle(docs(200), $"id", buckets = 64)
      .orderBy("shuffle_pos").select($"id".as[Long]).collect()
    assert(a === b, "bucket count changed the permutation")
    val identity = Array.tabulate(200)(_.toLong)
    assert(!(a sameElements identity), "permutation is the identity")
  }

  test("sequencePack: packs contiguous in shuffle order, capacity respected") {
    val capacity = 512L
    val df = docs(400)
    val packed = Packing.sequencePack(df, $"id", $"tokens", capacity, buckets = 16)
    val stats = packed.groupBy($"pack_id")
      .agg(sum($"tokens").as("tot"), max($"tokens").as("mx"))
      .collect()
    // every pack except possibly the last is filled past nothing-fits
    // (overflow bounded by longest doc - 1)
    stats.foreach { r =>
      val tot = r.getAs[Long]("tot")
      val mx = r.getAs[Long]("mx")
      assert(tot < capacity + mx, s"pack ${r.get(0)} overflowed beyond one document")
    }
    // pack ids are dense 0..max
    val ids = stats.map(_.getAs[Long]("pack_id")).sorted
    assert(ids === ids.indices.map(_.toLong).toArray)
    // total token mass preserved
    assert(packed.agg(sum($"tokens")).as[Long].head ===
      df.agg(sum($"tokens")).as[Long].head)
  }

  test("prefixSumBefore rejects bucket counts that do not divide the ring") {
    intercept[IllegalArgumentException] {
      Packing.prefixSumBefore(docs(10), $"id", $"tokens", "x", buckets = 3)
    }
  }

  test("prefixSumBefore fails fast on a null id instead of pooling a null bucket") {
    val df = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L)).toDF("id", "tokens")
    val e = intercept[Exception] {
      Packing.prefixSumBefore(df, $"id", $"tokens", "before").collect()
    }
    // raise_error surfaces wrapped in Spark's job failure; match the message
    assert(e.getMessage.contains("unique-id contract") ||
      Option(e.getCause).exists(_.getMessage.contains("unique-id contract")))
  }
}
