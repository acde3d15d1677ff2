package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query set
  * against the full corpus — one pass over the corpus, no shuffle of the
  * corpus itself, O(|Q|·|C|·dim) math inside codegen. Correct at any
  * corpus size as long as |Q| is broadcast-able, which is the realistic
  * 100 TB shape (a handful of probes against a huge corpus).
  *
  * `lshTopK` is the scale path when |Q| is also large: hyperplane-bucket
  * both sides and only score within buckets (multi-probe via `nTables`
  * independent plane sets to recover recall), then rank per query.
  */
object Ann {

  /** Exact top-k cosine neighbors per query vector.
    * Output: (query_id, neighbor_id, rank); deterministic tie-break on
    * neighbor id. `queries`/`corpus`: (id, vec) frames.
    */
  def bruteForce(queries: DataFrame, corpus: DataFrame, qId: String, qVec: String,
      cId: String, cVec: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).cast("array<double>").as("_qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).cast("array<double>").as("_cv"))
    val scored = c.crossJoin(q)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("_cos", cosineFused(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Contrastive hard-negative mining: for each labeled query vector, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the pairs
    * a contrastive trainer wants (close in embedding space, wrong class).
    * Same scale shape as [[bruteForce]]: the query set broadcasts, the
    * corpus never shuffles, the label-mismatch filter rides inside the
    * scoring pass. Output: (query_id, neighbor_id, neighbor_label, rank).
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, qId: String,
      qVec: String, qLabel: String, cId: String, cVec: String, cLabel: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(qVec).cast("array<double>").as("_qv"), col(qLabel).as("_ql")))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(cVec).cast("array<double>").as("_cv"), col(cLabel).as("neighbor_label"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(!(col("neighbor_label") <=> col("_ql")))
      .withColumn("_cos", cosineFused(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "neighbor_label", "rank")
  }

  /** Approximate top-k: candidates share a hyperplane-signature bucket in
    * at least one of `nTables` plane sets; exact cosine re-rank within the
    * candidate set. Recall grows with nTables and shrinking nPlanes.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, qId: String, qVec: String,
      cId: String, cVec: String, k: Int, nPlanes: Int = 6, nTables: Int = 4,
      dim: Int = 64, seed: Long = 7L, excludeSelf: Boolean = true): DataFrame = {
    def sig(df: DataFrame, id: String, vec: String, idOut: String, vecOut: String): DataFrame = {
      val tables = (0 until nTables).map { t =>
        val ps = planes(seed + t * 1000L, nPlanes, dim)
        struct(lit(t).as("t"), hyperplaneSig(col(vec), ps).as("h")).as(s"_sig$t")
      }
      df.select(col(id).as(idOut), col(vec).cast("array<double>").as(vecOut),
        explode(array(tables: _*)).as("_bucket"))
    }
    val q = sig(queries, qId, qVec, "query_id", "_qv")
    val c = sig(corpus, cId, cVec, "neighbor_id", "_cv")
    val cands = c.join(q, "_bucket")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("_cos", cosineFused(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
