package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy explosion — the transitive closure of a
  * parent→child edge table with an integral per-edge multiplicity
  * MULTIPLIED along paths and SUMMED across paths: the bill-of-materials
  * semantics ("how many of leaf part X go into one assembly Y"), equally
  * the org-chart rollup and the category-tree flattening. This is the
  * arithmetic-carrying recursion BFS/PageRank don't cover (they propagate
  * distances/mass, not per-path products).
  *
  * Scale shape: level-synchronous joins — round k joins the depth-k
  * frontier (ancestor, node, product) against the edge frame on the
  * frontier's node, so an iteration is ONE equi-join + the frontier
  * shuffle; per-round plan-truncating checkpoints (the Graphs/Cluster
  * rounds discipline) keep analysis cost flat and release predecessor
  * blocks, and `checkpointDir` upgrades them to reliable checkpoints for
  * long hierarchies on real clusters. Per-level frontiers accumulate as
  * a flat union of checkpointed legs, never a nested plan — and because
  * the final rollup is associative, completed levels fold into ONE
  * accumulated closure frame every `foldEvery` rounds, releasing their
  * blocks mid-loop: peak cached storage is O(closure) plus a bounded
  * window of frontiers, not every level of a 32-deep hierarchy at once.
  *
  * Cycles make a BOM undefined (a part containing itself explodes
  * forever); `maxDepth` bounds the loop and the method fails by name if
  * the frontier is still non-empty when the bound is hit.
  */
object Hierarchy {

  /** Full closure rows (ancestor, descendant, total_qty, min_depth):
    * total_qty = Σ over distinct ancestor→descendant paths of the
    * product of edge quantities along the path; min_depth = shortest
    * such path. Edges: one row per (parent, child) with an integral
    * quantity ≥ 1.
    */
  def explode(edges: DataFrame, parent: String, child: String, qty: String,
      maxDepth: Int = 32, checkpointDir: Option[String] = None,
      foldEvery: Int = 8): DataFrame = {
    require(maxDepth >= 1, s"explode: maxDepth must be >= 1 (got $maxDepth)")
    require(foldEvery >= 1, s"explode: foldEvery must be >= 1 (got $foldEvery)")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    val e = graft.Caches.track(edges.select(
        col(parent).cast("long").as("_p"),
        col(child).cast("long").as("_c"),
        col(qty).cast("long").as("_q"))
      .persist())
    e.count() // fill before the loop re-reads it every round
    val lcp = Checkpoints.truncating(checkpointDir.isDefined) _
    var frontier = e.select(col("_p").as("ancestor"),
      col("_c").as("descendant"), col("_q").as("total_qty"),
      lit(1L).as("depth"))
    // every level feeds the final union, but the union is an ASSOCIATIVE
    // aggregate (sum across paths, min depth) — so completed levels fold
    // into ONE accumulated (ancestor, descendant, total_qty, depth)
    // frame every `foldEvery` rounds and release their blocks then.
    // Peak storage is O(closure) + foldEvery frontiers, not
    // O(closure + every frontier of a 32-level hierarchy). The NEWEST
    // level never folds mid-loop: its blocks still feed the next
    // frontier join (and the maxDepth cycle probe), and a released
    // local checkpoint has no lineage to recompute from.
    var acc: Option[DataFrame] = None
    var accRelease: () => Unit = () => ()
    val pending =
      scala.collection.mutable.ArrayBuffer.empty[(DataFrame, () => Unit)]
    def foldAllButNewest(): Unit = {
      val (fold, keep) = pending.splitAt(pending.size - 1)
      val folded = (acc.toSeq ++ fold.map(_._1)).reduce(_ unionByName _)
        .groupBy(col("ancestor"), col("descendant"))
        .agg(sum(col("total_qty")).as("total_qty"),
          min(col("depth")).as("depth"))
      val (ck, rel) = lcp(folded)
      // materialize THE fold before releasing the legs it reads
      ck.queryExecution.toRdd.count()
      accRelease()
      fold.foreach(_._2())
      pending.clear()
      pending ++= keep
      acc = Some(ck)
      accRelease = rel
    }
    var depth = 1
    var exhausted = false
    while (!exhausted) {
      // pending levels except the newest are fully materialized (the
      // newest's isEmpty probe read its predecessor) and feed nothing
      // but the final aggregate — fold them once enough accumulate
      if (pending.size > foldEvery) foldAllButNewest()
      val (level, levelRelease) = lcp(frontier)
      pending += ((level, levelRelease))
      if (level.isEmpty) exhausted = true
      else if (depth == maxDepth) {
        val more = level
          .join(e.withColumnRenamed("_p", "descendant"), "descendant")
        if (!more.isEmpty)
          throw new IllegalStateException(
            s"Hierarchy.explode: frontier still non-empty at maxDepth=" +
              s"$maxDepth — cyclic edges or a deeper hierarchy than bounded")
        exhausted = true
      } else {
        frontier = level
          .join(e.withColumnRenamed("_p", "descendant"), "descendant")
          .select(col("ancestor"), col("_c").as("descendant"),
            (col("total_qty") * col("_q")).as("total_qty"),
            (col("depth") + 1).as("depth"))
        depth += 1
      }
    }
    // what's left (the accumulator + at most foldEvery+1 live levels)
    // releases at the session-level post-consumption clear as before
    pending.foreach(p => graft.Caches.trackRelease(p._2))
    graft.Caches.trackRelease(() => accRelease())
    (acc.toSeq ++ pending.map(_._1)).reduce(_ unionByName _)
      .groupBy(col("ancestor"), col("descendant"))
      .agg(sum(col("total_qty")).as("total_qty"),
        min(col("depth")).as("min_depth"))
  }
}
