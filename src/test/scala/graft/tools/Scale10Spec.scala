package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Scale10]] synthesis invariants — the probe's ratios are
  * only evidence if the copies are INDEPENDENT the way 10x organic data
  * would be, so each independence property is machine-checked here on
  * the sf0.001 fixtures.
  */
class Scale10Spec extends SparkSpec {
  import spark.implicits._

  private lazy val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale10_spec_").toString
    Scale10.synth(spark, src, dir)
    dir
  }
  private def base(name: String) = spark.read.parquet(s"$src/$name.parquet")
  private def sf1(name: String) = spark.read.parquet(s"$out/$name.parquet")

  test("fact tables multiply by COPIES; dimensions stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(sf1(t).count() === Scale10.COPIES * base(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(sf1(t).count() === base(t).count(), t)
  }

  test("surrogate keys are copy-disjoint (distinct count multiplies)") {
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id"))
      assert(sf1(t).select(k).distinct().count() ===
        Scale10.COPIES * base(t).select(k).distinct().count(), s"$t.$k")
  }

  test("name copy codes: cross-copy edit distance is exactly 2, blocks split per copy") {
    // every base name vs each of its 9 recodes: levenshtein == 2 (> the
    // dist-1 fuzzy radius), and == 0 only for copy 0
    val c = sf1("customer")
      .select(pmod(col("c_custkey"), lit(Scale10.STRIDE)).as("base_key"),
        (col("c_custkey") / lit(Scale10.STRIDE)).cast("int").as("copy"), col("c_name"))
    val pairs = c.filter(col("copy") === 0)
      .select(col("base_key"), col("c_name").as("n0"))
      .join(c.filter(col("copy") > 0), "base_key")
      .select(levenshtein(col("n0"), col("c_name")).as("d"))
      .groupBy(col("d")).count().as[(Int, Long)].collect().toMap
    assert(pairs.keySet === Set(2), s"cross-copy name distances: $pairs")
    // the entity-resolution blocking prefix splits per copy: distinct
    // 17-char prefixes multiply exactly
    assert(sf1("customer").select(substring(col("c_name"), 1, 17)).distinct().count() ===
      Scale10.COPIES * base("customer").select(substring(col("c_name"), 1, 17)).distinct().count())
  }

  test("document text: per-token bijection — counts preserved, vocabularies disjoint") {
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    // total token count multiplies exactly (bijection preserves counts)
    assert(toks(sf1("documents")).count() === Scale10.COPIES * toks(base("documents")).count())
    // vocabularies are copy-disjoint: distinct tokens multiply exactly
    assert(toks(sf1("documents")).distinct().count() ===
      Scale10.COPIES * toks(base("documents")).distinct().count())
    // hence zero cross-copy shingle sharing at ANY shingle size: a shared
    // k-shingle would need a shared token
  }

  test("embeddings: sign flips preserve norms exactly; copies are not near-duplicates") {
    def norms(df: org.apache.spark.sql.DataFrame) = df
      .select(pmod(col("vec_id"), lit(Scale10.STRIDE)).as("base_key"),
        aggregate(col("embedding"), lit(0.0d), (acc, x) => acc + x * x).as("n2"))
    // every copy's squared norm equals its base's EXACTLY (x² == (−x)²,
    // same summation order)
    val mismatch = norms(sf1("embeddings")).groupBy("base_key")
      .agg(countDistinct(col("n2")).as("k")).filter(col("k") > 1).count()
    assert(mismatch === 0)
    // cross-copy cosine bounded below every clustering threshold the
    // suite uses (dedup_embedding: 0.9), for EVERY copy pair of every
    // base vector: any two masks disagree on >= half the dims' signs
    val e = sf1("embeddings")
      .select(pmod(col("vec_id"), lit(Scale10.STRIDE)).as("base_key"),
        (col("vec_id") / lit(Scale10.STRIDE)).cast("int").as("copy"), col("embedding"))
    val a = e.select(col("base_key"), col("copy").as("ca"), col("embedding").as("ea"))
    val b = e.select(col("base_key"), col("copy").as("cb"), col("embedding").as("eb"))
    val cos = a.join(b, "base_key").filter(col("ca") < col("cb"))
      .select((aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x) /
        (sqrt(aggregate(col("ea"), lit(0.0d), (acc, x) => acc + x * x)) *
          sqrt(aggregate(col("eb"), lit(0.0d), (acc, x) => acc + x * x))))
        .as("cos"))
      .agg(max(col("cos"))).as[Double].head()
    assert(cos < 0.9, s"max cross-copy cosine $cos")
  }
}
