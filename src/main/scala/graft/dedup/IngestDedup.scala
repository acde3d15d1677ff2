package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable dedup strategy for the streaming ingestion loop
  * ([[graft.streaming.StreamOps.ingestSink]]): one implementation per
  * index kind — exact fingerprint, MinHash bands, SimHash blocks,
  * embedding buckets — so the same transactional data+index commit
  * machinery serves exact AND near-dup ingestion.
  */
trait IngestDedup {

  /** Batch rows surviving dedup against `index` (the RAW read of the
    * index home — implementations select the columns they persist; extra
    * partition columns like `tx` are ignored) and within the batch.
    */
  def dedup(batch: DataFrame, index: DataFrame): DataFrame

  /** Index rows to append for an accepted (surviving) batch. */
  def indexOf(accepted: DataFrame): DataFrame

  /** Zero-row frame with the index schema — the first batch of an empty
    * index home dedups against this.
    */
  def emptyIndex(spark: SparkSession): DataFrame
}

object IngestDedup {

  /** Exact dedup on the 128-bit content fingerprint of `on`. */
  def exact(on: Seq[String], id: String): IngestDedup = new IngestDedup {
    override def dedup(batch: DataFrame, index: DataFrame): DataFrame =
      Dedup.exactIncremental(batch, index.select(col("_h1"), col("_h2")), on, id)
    override def indexOf(accepted: DataFrame): DataFrame =
      Dedup.fingerprintIndex(accepted, on)
    override def emptyIndex(spark: SparkSession): DataFrame =
      spark.range(0).select(col("id").as("_h1"), col("id").as("_h2"))
  }

  /** MinHash near-dup: estimated Jaccard of `shingles` ≥ threshold. */
  def minhash(shingles: Column, id: String, threshold: Double,
      bands: Int = 16, rows: Int = 8, seed: Long = 42L,
      maxBucket: Int = 10000): IngestDedup = new IngestDedup {
    override def dedup(batch: DataFrame, index: DataFrame): DataFrame =
      Dedup.minhashIncremental(batch, index, id, shingles, threshold,
        bands, rows, seed, maxBucket)
    override def indexOf(accepted: DataFrame): DataFrame =
      Dedup.minhashIndex(accepted, id, shingles, bands, rows, seed)
    override def emptyIndex(spark: SparkSession): DataFrame =
      spark.range(0).select(lit(0).as("_band"), lit(0L).as("_bucket"),
        lit(0L).as("_id"), array(lit(0L)).as("_sig"))
  }

  /** SimHash near-dup: Hamming distance of `tokens` sigs ≤ maxHamming. */
  def simhash(tokens: Column, id: String, maxHamming: Int = 3,
      maxBucket: Int = 10000): IngestDedup = new IngestDedup {
    override def dedup(batch: DataFrame, index: DataFrame): DataFrame =
      Dedup.simhashIncremental(batch, index, id, tokens, maxHamming, maxBucket)
    override def indexOf(accepted: DataFrame): DataFrame =
      Dedup.simhashIndex(accepted, id, tokens, maxHamming)
    override def emptyIndex(spark: SparkSession): DataFrame =
      spark.range(0).select(lit(0).as("_band"), lit(0L).as("_bucket"),
        lit(0L).as("_id"), lit(0L).as("_sig"))
  }

  /** Benchmark decontamination as an ingest gate: batch docs sharing any
    * word n-gram with the indexed benchmark suite are dropped. Unlike the
    * dedup strategies the index is STATIC — seed the index home once with
    * [[Decontaminate.benchGrams]] (e.g. under `tx=benchmark`); accepted
    * batches append nothing ([[indexOf]] is empty), and batch docs never
    * check against each other (documents don't contaminate one another).
    */
  def decontaminate(toks: Column, id: String, n: Int,
      broadcastBench: Boolean = true): IngestDedup = new IngestDedup {
    override def dedup(batch: DataFrame, index: DataFrame): DataFrame =
      Decontaminate.cleanIndexed(batch, id, toks, index, n, broadcastBench)
    override def indexOf(accepted: DataFrame): DataFrame =
      accepted.sparkSession.range(0).select(col("id").as("_g"))
    override def emptyIndex(spark: SparkSession): DataFrame =
      spark.range(0).select(col("id").as("_g"))
  }

  /** Embedding near-dup: cosine of `vec` ≥ threshold (int8 index). */
  def embedding(vec: Column, id: String, threshold: Double,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 7L,
      maxBucket: Int = 10000): IngestDedup = new IngestDedup {
    override def dedup(batch: DataFrame, index: DataFrame): DataFrame =
      Dedup.embeddingIncremental(batch, index, id, vec, threshold,
        nPlanes, dim, seed, maxBucket)
    override def indexOf(accepted: DataFrame): DataFrame =
      Dedup.embeddingIndex(accepted, id, vec, nPlanes, dim, seed)
    override def emptyIndex(spark: SparkSession): DataFrame =
      spark.range(0).select(lit(0L).as("_id"), lit(0L).as("_bucket"),
        struct(lit(0.0).as("scale"),
          array(lit(0).cast("tinyint")).as("codes")).as("_q"))
  }
}
