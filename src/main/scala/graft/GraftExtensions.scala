package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSignature, SimHash64, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get the
  * same surface as the Column API.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    val minhashBuilder: FunctionRegistry.FunctionBuilder = exprs => {
      val k = if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue() else 64
      val seed = if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].longValue() else 42L
      MinHashSignature(exprs.head, k, seed)
    }
    val simhashBuilder: FunctionRegistry.FunctionBuilder = exprs => SimHash64(exprs.head)
    val shinglesBuilder: FunctionRegistry.FunctionBuilder = exprs =>
      WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())

    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles[, k[, seed]]) - MinHash sketch"),
      minhashBuilder))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash"), simhashBuilder))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, k) - word k-shingles"), shinglesBuilder))

    e.injectOptimizerRule(_ => graft.plans.TopOneWindowToAggregate)
  }
}

object GraftExtensions {
  /** Enable the graft optimizer rules on an already-built session. */
  def enableOptimizations(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.TopOneWindowToAggregate))
      spark.experimental.extraOptimizations = cur :+ graft.plans.TopOneWindowToAggregate
  }
}
