package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spill-safe group buffers: a hot key whose group exceeds the in-memory
  * threshold must stream through disk with identical results — the tiny
  * thresholds here are the in-process equivalent of "multi-GB group under
  * a small heap" (the ratio of group size to heap budget is what the
  * mechanism sees; 50k records over a 64-record budget exercises the
  * same spill/replay paths as 2 B records over a default budget).
  */
class SpillSpec extends graft.SparkSpec {
  import spark.implicits._

  test("SpillBuffer preserves append order across the memory/disk boundary") {
    val b = new SpillBuffer[Int](maxInMemory = 100)
    (0 until 10000).foreach(b.append)
    assert(b.spilled)
    assert(b.size === 10000)
    // repeated traversal (the master-selection access pattern)
    assert(b.iterator.toSeq === (0 until 10000))
    assert(b.iterator.toSeq === (0 until 10000))
  }

  test("SpillBuffer below threshold never touches disk") {
    val b = new SpillBuffer[Int](maxInMemory = 100)
    (0 until 100).foreach(b.append)
    assert(!b.spilled)
    assert(b.iterator.toSeq === (0 until 100))
  }

  test("cogroupN streams an oversized group through the spill buffer unchanged") {
    val hot = 50000
    val a = spark.range(hot).select(lit(1).as("k"), col("id").as("av"))
      .unionAll(Seq((2, 7L)).toDF("k", "av"))
    val b = Seq((1, 100L), (2, 200L)).toDF("k", "bv")
    val before = SpillBuffer.spillsStarted.sum()
    val out = Groups.cogroupN(
      Seq(a, b), keys = Seq("k"), orders = Seq(Seq("av"), Nil),
      outSchema = StructType(Seq(StructField("k", IntegerType),
        StructField("n", LongType), StructField("sum", LongType))),
      spillThreshold = 64) { (key, its) =>
      var n = 0L; var s = 0L
      its(0).foreach { r => n += 1; s += r.getLong(1) }
      its(1).foreach { r => s += r.getLong(1) }
      Iterator.single(Row(key.getInt(0), n, s))
    }.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1 -> ((hot.toLong, (0L until hot).sum + 100L)),
      2 -> ((1L, 207L))))
    assert(SpillBuffer.spillsStarted.sum() > before, "hot group did not spill")
  }

  test("masterJoinSelect replays a spilled master list per transaction") {
    val masters = spark.range(20000)
      .select(lit(1).as("k"), col("id").as("score")).as[(Int, Long)]
    val txs = Seq((1, 3L), (1, 19999L), (1, 20005L), (2, 1L)).toDF("k", "want").as[(Int, Long)]
    val before = SpillBuffer.spillsStarted.sum()
    val (found, missed) = Joins.masterJoinSelect(masters, txs, spillThreshold = 64)(
      _._1, _._1)(
      // hook scans the full (spilled) master list per tx: exact-score match
      (ms, t) => ms.find(_._2 == t._2))(
      (m, t) => (t._1, m._2))
    assert(found.collect().toSet === Set((1, 3L), (1, 19999L)))
    assert(missed.collect().toSet === Set((1, 20005L), (2, 1L)))
    assert(SpillBuffer.spillsStarted.sum() > before, "hot master key did not spill")
  }
}
