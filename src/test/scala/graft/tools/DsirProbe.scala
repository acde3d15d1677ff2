package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Margin probe for the `dsir_select` adaptive contract: prints base rate,
  * noiseless top-k fraction, and the Gumbel draw's fraction for several
  * seeds at each SF, so the midpoint bar's slack is measured, not assumed.
  * Run: sbt "Test/runMain graft.tools.DsirProbe"
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .withColumn("_toks", TextFunctions.tokens(col("text")))
      val t = graft.operators.Dsir.fit(docs.filter(col("lang") === "en"), col("_toks"))
      val r = graft.operators.Dsir.fit(docs, col("_toks"))
      val scored = graft.operators.Dsir.score(docs, "doc_id", col("_toks"), t, r)
        .persist()
      val lang = docs.select(col("doc_id"), col("lang"))
      def frac(sel: org.apache.spark.sql.DataFrame): Double =
        sel.join(lang, "doc_id")
          .agg(sum(when(col("lang") === "en", 1.0).otherwise(0.0)) / count(lit(1)))
          .head.getDouble(0)
      val base = docs
        .agg(sum(when(col("lang") === "en", 1.0).otherwise(0.0)) / count(lit(1)))
        .head.getDouble(0)
      val topk = frac(scored.orderBy(col("log_w").desc_nulls_last, col("doc_id").asc)
        .limit(100).select("doc_id"))
      val bar = base + 0.5 * (topk - base)
      for (seed <- Seq(11L, 7L, 42L, 1234L)) {
        val sel = frac(graft.operators.Dsir.resample(scored, col("doc_id"),
          k = 100, seed = seed, temperature = 0.25).select("doc_id"))
        println(f"[probe] $sf seed=$seed base=$base%.3f topk=$topk%.3f bar=$bar%.3f sel=$sel%.3f margin=${sel - bar}%.3f pass=${sel >= bar}")
      }
      scored.unpersist()
    }
    spark.stop()
  }
}
