package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityLinkSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "alice smith", 10, 100.0),
    (2L, "bob jones", 20, 200.0),
    (3L, "carol wu", 10, 300.0)
  ).toDF("lid", "lname", "lnation", "lbal")

  private val right = Seq(
    (101L, "alice smyth", 10, 100.0), // name typo: pass 2 (nation+bal) catches
    (102L, "bob jones", 20, 999.0),   // balance drift: pass 1 (name) catches
    (103L, "dave kim", 30, 500.0)     // no counterpart
  ).toDF("rid", "rname", "rnation", "rbal")

  private val score =
    when(col("lname") === col("rname"), 60).otherwise(0) +
      when(col("lnation") === col("rnation"), 25).otherwise(0) +
      when(abs(col("lbal") - col("rbal")) <= 1.0, 25).otherwise(0)

  private val blocks = Seq(
    (col("lname"), col("rname")),
    (struct(col("lnation"), floor(col("lbal") / 100)),
      struct(col("rnation"), floor(col("rbal") / 100))))

  test("multi-pass blocking: each pass covers the other's corruption") {
    val links = EntityLink.link(left, right, "lid", "rid", blocks, score, 50)
      .as[(Long, Long, Int)].collect().toSet
    // alice: name differs (pass 1 misses), nation+band agree → 25+25 = 50
    // bob: name agrees (pass 2 misses: band 2 vs 9) → 60+25 = 85
    assert(links === Set((1L, 101L, 50), (2L, 102L, 85)))
  }

  test("threshold drops weak candidates; unmatched right records absent") {
    val links = EntityLink.link(left, right, "lid", "rid", blocks, score, 60)
      .as[(Long, Long, Int)].collect().toSet
    assert(links === Set((2L, 102L, 85)))
    assert(!EntityLink.link(left, right, "lid", "rid", blocks, score, 50)
      .as[(Long, Long, Int)].collect().exists(_._2 == 103L))
  }

  test("bestLinks: one row per right id, (score, leftId)-maximal, deterministic ties") {
    val l2 = Seq((1L, "x", 1), (2L, "x", 1), (3L, "y", 2)).toDF("lid", "lk", "ln")
    val r2 = Seq((9L, "x", 1)).toDF("rid", "rk", "rn")
    val s2 = when(col("lk") === col("rk"), 50).otherwise(0) +
      when(col("ln") === col("rn"), 50).otherwise(0)
    val best = EntityLink.bestLinks(l2, r2, "lid", "rid",
      Seq((col("lk"), col("rk"))), s2, 50).as[(Long, Long, Int)].collect()
    // lids 1 and 2 both score 100 — the greater lid wins the tie
    assert(best.toSeq === Seq((9L, 2L, 100)))
  }

  test("disjoint-column contract is enforced") {
    val e = intercept[IllegalArgumentException] {
      EntityLink.link(left, left, "lid", "lid", blocks, score, 50)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("hot blocks are dropped by the guard, not exploded") {
    // one giant block ("x" × 100 on both sides) over maxBlock=10 → dropped;
    // the small block ("y") still links
    val l3 = ((1L to 100L).map(i => (i, "x")) :+ (200L, "y")).toDF("lid", "lk")
    val r3 = ((1L to 100L).map(i => (i + 1000L, "x")) :+ (900L, "y")).toDF("rid", "rk")
    val links = EntityLink.link(l3, r3, "lid", "rid",
      Seq((col("lk"), col("rk"))), lit(100), 50, maxBlock = 10)
      .as[(Long, Long, Int)].collect()
    assert(links.toSeq === Seq((200L, 900L, 100)))
  }
}
