package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe for the [[graft.functions.StripLinesByHash]] membership
  * structure (round-13 verdict ask): time `stripLinesBroadcast` over the
  * sf0.1 documents table with the hot-line index scaled from its organic
  * size to 10⁵ and 10⁶ synthetic entries. The round-12 shape (whole
  * index copied + linearly scanned per document row) was
  * O(doc_lines × index); the sorted binary-search broadcast must keep
  * per-document cost FLAT in index size (the only growing term is the
  * one-time executor decode).
  *
  * `runMain graft.tools.StripProbe [sfDir]` — prints one line per index
  * size: entries, wall seconds (min of 3 after warmup).
  */
object StripProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Scale10.probeSession()
    val docs = graft.GraftSession.tableSpread(spark, dir, "documents")
    // a REAL hot index (so some lines actually strip) over a synthetic
    // multi-line text column shared by the corpus and the batch
    val mtext = concat_ws("\n", col("text"), lit("COOKIE BANNER"), col("source"))
    val real = graft.dedup.Dedup.lineIndex(
      docs.filter(col("doc_id") < 400), "doc_id", mtext, minDocs = 10)
    for (noise <- Seq(0L, 100000L, 1000000L)) {
      val idx =
        if (noise == 0) real
        else real.unionByName(spark.range(noise)
          .select(xxhash64(concat(lit("na_"), col("id"))).as("_h1"),
            xxhash64(concat(lit("nb_"), col("id"))).as("_h2")))
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val out = graft.dedup.Dedup.stripLinesBroadcast(docs, idx, "doc_id", mtext)
        val n = out.agg(sum(col("n_removed"))).collect()(0).getLong(0)
        require(n > 0, "probe must actually strip lines")
        (System.nanoTime() - t0) / 1e9
      }
      // drop the warmup run, report the min of the rest
      println(f"[stripprobe] entries=${noise}%8d min=${times.tail.min}%.3fs runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
