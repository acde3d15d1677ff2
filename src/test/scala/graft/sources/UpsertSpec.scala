package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_upsert").toString

  private def base = (1L to 40L).map(k => (k, s"n$k", (k % 7).toInt)).toDF("k", "name", "grp")

  test("create + read round-trips the base through bucket generations") {
    val dir = s"${tmp()}/t"
    Upsert.create(base, dir, Seq("k"), 4)
    val back = Upsert.read(spark, dir).as[(Long, String, Int)].collect().sortBy(_._1)
    assert(back === base.as[(Long, String, Int)].collect().sortBy(_._1))
  }

  test("upsert rewrites only dirty buckets and applies I/U/D") {
    val dir = s"${tmp()}/t"
    Upsert.create(base, dir, Seq("k"), 4)
    def genDirs() = new java.io.File(dir).listFiles().filter(_.getName.startsWith("_bucket="))
      .map(b => b.getName -> b.listFiles().map(_.getName).sorted.toSeq).toMap
    val before = genDirs()
    // one changed key (plus one insert): at most two dirty buckets
    val changes = Seq((3L, "updated", 99, "U", 1L), (100L, "new", 1, "I", 1L))
      .toDF("k", "name", "grp", "_op", "_seq")
    val g = Upsert.upsert(changes, dir)
    assert(g === 1)
    val after = genDirs()
    val touched = after.filter { case (b, gens) => gens != before(b) }
    assert(touched.nonEmpty && touched.size <= 2,
      s"only dirty buckets get a new generation: $touched")
    val back = Upsert.read(spark, dir).as[(Long, String, Int)].collect()
      .map { case (k, n, gp) => k -> ((n, gp)) }.toMap
    assert(back(3L) === (("updated", 99)))
    assert(back(100L) === (("new", 1)))
    assert(back.size === 41)
  }

  test("deletes that empty a bucket commit an empty generation, not stale files") {
    val dir = s"${tmp()}/t"
    val two = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Upsert.create(two, dir, Seq("k"), 2)
    val dels = two.withColumn("_op", lit("D")).withColumn("_seq", lit(1L))
    Upsert.upsert(dels, dir)
    assert(Upsert.read(spark, dir).count() === 0)
    // and the table keeps working: a later insert lands normally
    Upsert.upsert(Seq((9L, "z", "I", 1L)).toDF("k", "v", "_op", "_seq"), dir)
    assert(Upsert.read(spark, dir).as[(Long, String)].collect() === Seq((9L, "z")))
  }

  test("uncommitted generations are invisible; vacuum reclaims the shells") {
    val dir = s"${tmp()}/t"
    Upsert.create(base, dir, Seq("k"), 2)
    val expected = Upsert.read(spark, dir).count()
    // simulate a crash: a generation shell with data but no commit marker
    val shell = new java.io.File(s"$dir/_bucket=0/gen=g000000005")
    shell.mkdirs()
    Seq((999L, "ghost", 0)).toDF("k", "name", "grp")
      .write.mode("overwrite").parquet(s"$shell/.attempt-upsert-crashed")
    assert(Upsert.read(spark, dir).count() === expected, "uncommitted gen must be invisible")
    // recover's fast path (nothing in flight) leaves the harmless shell;
    // the maintenance pass reclaims it
    Upsert.recover(spark, dir)
    assert(Upsert.read(spark, dir).count() === expected)
    Upsert.vacuum(spark, dir)
    assert(!shell.exists(), "vacuum reclaims the orphan shell")
    assert(Upsert.read(spark, dir).count() === expected)
  }

  test("asOf time-travel reads the state right after each generation") {
    val dir = s"${tmp()}/t"
    Upsert.create(Seq((1L, "v0")).toDF("k", "v"), dir, Seq("k"), 2)
    val g1 = Upsert.upsert(Seq((1L, "v1", "U", 1L)).toDF("k", "v", "_op", "_seq"), dir)
    val g2 = Upsert.upsert(Seq((2L, "w", "I", 1L)).toDF("k", "v", "_op", "_seq"), dir)
    def at(g: Int) = Upsert.read(spark, dir, asOf = Some(g))
      .as[(Long, String)].collect().toSet
    assert(at(0) === Set((1L, "v0")))
    assert(at(g1) === Set((1L, "v1")))
    assert(at(g2) === Set((1L, "v1"), (2L, "w")))
    assert(Upsert.read(spark, dir).as[(Long, String)].collect().toSet === at(g2))
  }

  test("a live marker rolls the batch FORWARD: staged gens finish committing") {
    val dir = s"${tmp()}/t"
    Upsert.create(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"), 2)
    val before = Upsert.read(spark, dir).as[(Long, String)].collect().toSet
    // simulate a crash right after the commit point: staging written for
    // bucket 0, marker live listing buckets 0 AND 1 (1's new gen is empty)
    val genName = "g%09d".format(7)
    Seq((5L, "staged")).toDF("k", "v")
      .write.parquet(s"$dir/.upsert-stage-$genName/_b=0")
    val txDir = new java.io.File(s"$dir/_tx"); txDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_tx/upsert-$genName"), "0,1".getBytes("UTF-8"))
    Upsert.recover(spark, dir)
    assert(!new java.io.File(s"$dir/_tx/upsert-$genName").exists())
    assert(!new java.io.File(s"$dir/.upsert-stage-$genName").exists())
    // bucket 0 now serves the staged row; bucket 1's gen-7 is empty — its
    // previous contents are gone from the CURRENT view (that is what the
    // crashed batch committed to), while asOf(0) still shows `before`
    val now = Upsert.read(spark, dir).as[(Long, String)].collect().toSet
    assert(now.contains((5L, "staged")) && now.size <= before.size + 1)
    assert(Upsert.read(spark, dir, asOf = Some(0))
      .as[(Long, String)].collect().toSet === before)
  }

  test("reads resolve through ONE manifest file; glob only as fallback") {
    val dir = s"${tmp()}/t"
    Upsert.create(Seq((1L, "v0")).toDF("k", "v"), dir, Seq("k"), 2)
    val g1 = Upsert.upsert(Seq((1L, "v1", "U", 1L)).toDF("k", "v", "_op", "_seq"), dir)
    def state() = Upsert.read(spark, dir).as[(Long, String)].collect().toSet
    assert(state() === Set((1L, "v1")))
    // deleting the batch's manifest rolls readers back to the previous
    // snapshot — read() must FOLLOW the manifest, which a per-bucket glob
    // (that would find gen-1 committed) could not produce
    val m1 = new java.io.File(s"$dir/_manifests/m-g%09d".format(g1))
    assert(m1.exists(), "every committed batch publishes a manifest")
    assert(m1.delete())
    assert(state() === Set((1L, "v0")), "read did not resolve via the manifest")
    // no manifest at all -> authoritative per-bucket glob fallback
    new java.io.File(s"$dir/_manifests").listFiles().foreach(_.delete())
    assert(state() === Set((1L, "v1")), "glob fallback must find the true latest")
    // recover() rebuilds the manifest so later reads are O(1) again
    Upsert.recover(spark, dir)
    assert(new java.io.File(s"$dir/_manifests").listFiles().nonEmpty,
      "recover rebuilds a missing manifest")
    assert(state() === Set((1L, "v1")))
  }

  test("vacuum drops superseded generations without changing contents") {
    val dir = s"${tmp()}/t"
    Upsert.create(base, dir, Seq("k"), 2)
    Upsert.upsert(Seq((1L, "x", 0, "U", 1L)).toDF("k", "name", "grp", "_op", "_seq"), dir)
    Upsert.upsert(Seq((1L, "y", 0, "U", 1L)).toDF("k", "name", "grp", "_op", "_seq"), dir)
    val before = Upsert.read(spark, dir).as[(Long, String, Int)].collect().sortBy(_._1)
    Upsert.vacuum(spark, dir)
    val gensPerBucket = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_bucket="))
      .map(_.listFiles().count(_.getName.startsWith("gen=")))
    assert(gensPerBucket.forall(_ === 1), gensPerBucket.mkString(","))
    val after = Upsert.read(spark, dir).as[(Long, String, Int)].collect().sortBy(_._1)
    assert(after === before)
  }
}
