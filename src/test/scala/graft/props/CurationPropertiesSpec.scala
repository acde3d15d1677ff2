package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.NgramLm
import graft.operators.{Frequency, Sessionize}

/** Property checks for the curation-round operators: each distributed
  * result is compared against a naive driver-side reference on random
  * inputs (Props.samples — explicit seeds, deterministic).
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("sessionize agrees with the naive per-user scan") {
    val evGen = Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 2000L)))
    for (evs <- samples(evGen, 5)) {
      val rows = evs.zipWithIndex.map { case ((u, sec), i) => (u, sec, i.toLong) }
      val df = rows.toDF("user_id", "sec", "event_id")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val gap = 300L
      val got = Sessionize.assign(df, "user_id", "ts", gap, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
      // reference: sort each user's events by (sec, event_id), count breaks
      val want = rows.groupBy(_._1).flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        var seq = 0L
        var prev = Long.MinValue
        sorted.map { case (_, sec, id) =>
          if (prev == Long.MinValue || sec - prev > gap) seq += 1
          prev = sec
          id -> seq
        }
      }.toMap
      assert(got === want, s"events=$rows")
    }
  }

  test("heavyHitters agrees with the exact count over random streams") {
    val tokGen = Gen.listOf(Gen.choose(0, 12).map(i => s"w$i"))
    for ((toks, k) <- samples(Gen.zip(tokGen, Gen.choose(2, 6)), 5) if toks.nonEmpty) {
      val df = spark.sparkContext.parallelize(toks, 4).toDF("t")
      val got = Frequency.heavyHitters(df, col("t"), k)
        .select(col("term"), col("cnt")).as[(String, Long)].collect().toMap
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = counts.filter { case (_, c) => c * k >= toks.size }
      assert(got === want, s"k=$k toks=${toks.take(40)}")
    }
  }

  test("ngram-LM evidence agrees with the naive bigram statistics") {
    val docGen = Gen.listOf(Gen.choose(0, 5).map(i => s"t$i")).map(_.take(8))
    for (docs <- samples(Gen.listOf(docGen).map(_.take(8)), 5) if docs.nonEmpty) {
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }.toDF("doc_id", "toks")
      val minCount = 2L
      val model = NgramLm.train(df, col("toks"), minCount)
      val got = NgramLm.score(df, model, "doc_id", col("toks"))
        .select(col("doc_id"), col("n_bigrams"), col("n_hits"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // reference bigram counts over the whole corpus
      val allPairs = docs.flatMap(ws => ws.zip(ws.drop(1)))
      val big = allPairs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).keySet
      docs.zipWithIndex.foreach { case (ws, i) =>
        val pairs = ws.zip(ws.drop(1))
        val want = (pairs.size.toLong, pairs.count(big).toLong)
        assert(got(i.toLong) === want, s"doc=$ws")
      }
    }
  }
}
