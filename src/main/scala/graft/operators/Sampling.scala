package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines: deterministic
  * train/validation/test splits, per-group caps, and stratified sampling.
  *
  * Splits and caps use an EXPLICIT multiplicative hash (Knuth's 2654435761
  * over a 2^32 ring) written in plain integer Column arithmetic rather than
  * an engine-native hash function, for two scale-critical reasons:
  * assignment is reproducible across engines and releases (a re-run or a
  * different engine assigns every record to the same split — required for
  * dataset versioning), and it is pure narrow arithmetic — no shuffle, no
  * RNG state, fully inside WholeStageCodegen.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from an integral id.
    *
    * Computes (lo32(id) * 2654435761) mod 2^32 with the multiply SPLIT
    * into 16-bit halves: a direct 64-bit product overflows Long for ids
    * above ~3.4e9 (snowflake-style ids), which throws under Spark's ANSI
    * mode and errors in DuckDB. The split keeps every intermediate below
    * 2^50 and the masked lo32 makes negative ids well-defined — the same
    * expression evaluates identically in any engine with 64-bit integers.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(hashRing32(id), lit(buckets.toLong))

  /** The full 32-bit ring value behind [[hashBucket]] (the hash before
    * the final modulus). Exposed for multi-round chains: one round is
    * AFFINE in the low 16 input bits modulo any power of two, so two
    * coordinates derived by additive salts alone stay perfectly
    * correlated — chain rounds through [[swapHalves]] to mix the high
    * half back into the low bits before re-bucketing.
    */
  def hashRing32(id: Column): Column = {
    val lo = id.cast("long").bitwiseAND(lit(4294967295L))
    val h = shiftright(lo, 16)
    val l = lo.bitwiseAND(lit(65535L))
    (pmod(h * lit(2654435761L), lit(4294967296L)) * 65536L + l * lit(2654435761L)) % 4294967296L
  }

  /** Swap the 16-bit halves of a 32-bit ring value — the cheap
    * engine-replayable permutation that feeds a ring value's HIGH bits
    * into the next round's low-bit-sensitive multiply.
    */
  def swapHalves(m: Column): Column =
    shiftright(m, 16) + m.bitwiseAND(lit(65535L)) * lit(65536L)

  /** Deterministic percentage split: `weights` maps label -> percent
    * (must sum to 100); every record gets a `split` label from its id —
    * stable under re-runs, insertions, and engine changes.
    */
  def deterministicSplit(df: DataFrame, id: Column,
      weights: Seq[(String, Int)], out: String = "split"): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val b = hashBucket(id, 100)
    val expr = weights.tail.foldLeft((weights.head._2, when(b < weights.head._2, weights.head._1))) {
      case ((cum, acc), (label, pct)) => (cum + pct, acc.when(b < cum + pct, label))
    }._2
    df.withColumn(out, expr)
  }

  /** [[deterministicSplit]] that is LEAKAGE-SAFE under near-duplication:
    * all members of a duplicate cluster land in the SAME split. Splitting
    * by per-document hash silently leaks — a train document's near-copy
    * in the test split is exactly the contamination the dedup pass
    * exists to prevent, and a 100 TB corpus at a few percent duplication
    * leaks millions of documents that way. Here the split hash runs on
    * the cluster CANONICAL id (connected components over the near-dup
    * pair graph, min member id), so near-dups co-travel by construction;
    * unclustered documents hash their own id — identical to
    * [[deterministicSplit]] for them.
    *
    * Scale shape: the pair graph is already sparse (a dedup candidate
    * output); CC is the pointer-jumping rounds of
    * [[graft.dedup.Cluster.connectedComponents]]; the assignment join is
    * a left join on 8-byte ids. Output adds `group_id` (the hash
    * domain) and `out` (the split label).
    */
  def dedupSafeSplit(df: DataFrame, id: String, pairs: DataFrame,
      a: String, b: String, weights: Seq[(String, Int)],
      out: String = "split"): DataFrame = {
    val comp = graft.dedup.Cluster.connectedComponents(pairs, a, b)
      .select(col("id").as(id), col("comp").as("_comp"))
    val grouped = df.join(comp, Seq(id), "left")
      .withColumn("group_id", coalesce(col("_comp"), col(id).cast("long")))
      .drop("_comp")
    deterministicSplit(grouped, col("group_id"), weights, out)
  }

  /** Deterministic NEGATIVE sampling — the contrastive-training staple:
    * for each user, `k` pseudo-random item ids the user has NOT
    * interacted with, drawn from the engine-stable ring (no RNG state:
    * candidate j of user u is `hashBucket(u·1000003 + j, nItems)`), so
    * the same negatives reproduce on any engine, any partitioning, any
    * rerun — a dataset VERSION, not a draw. Oversampling absorbs
    * positive collisions and duplicate candidates; survivors keep their
    * draw order (rank 1..k, fewer only if the oversample budget ran
    * out — deterministic either way).
    *
    * Scale shape: candidates are generated per user row (k·oversample
    * rows, no join against the item catalog); the positives anti-join is
    * keyed (user, item); the final per-user rank windows over ≤
    * k·oversample rows, pruned map-side by WindowGroupLimit. A user's
    * full interaction history is never buffered.
    */
  def negativeSamples(interactions: DataFrame, user: String, item: String,
      nItems: Int, k: Int, oversample: Int = 3): DataFrame = {
    require(k > 0 && oversample > 0, "negativeSamples: k and oversample must be positive")
    val pos = interactions.select(col(user).as("_u"), col(item).as("_i")).distinct()
    val cand = pos.select(col("_u")).distinct()
      .select(col("_u"),
        explode(sequence(lit(0L), lit((k * oversample - 1).toLong))).as("_j"))
      .select(col("_u"), col("_j"),
        hashBucket(col("_u") * lit(1000003L) + col("_j"), nItems).as("_i"))
    val neg = cand.join(pos, Seq("_u", "_i"), "left_anti")
      .groupBy(col("_u"), col("_i")).agg(min(col("_j")).as("_j"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_u")).orderBy(col("_j").asc, col("_i").asc)
    neg.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_u").as(user), col("_i").as(item), col("rank"))
  }

  /** At most `k` records per group, chosen deterministically by hash order
    * (a uniform sample, not "first k in storage order"). One shuffle on the
    * group keys; Spark's WindowGroupLimit prunes to k per group map-side
    * before the exchange, so the shuffle carries O(k·groups) rows.
    */
  def capPerGroup(df: DataFrame, keys: Seq[String], k: Int, id: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(hashBucket(id, 1 << 30).asc, id.asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Stratified sample: per-stratum fractions via Bernoulli sampling
    * (seeded, so locally reproducible; assignment is NOT stable under
    * engine changes — use [[deterministicSplit]] where that matters).
    */
  def stratifiedSample(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)

  /** Temperature-weighted mixture sampling — the multilingual/multi-source
    * corpus-balancing step: a global `budget` of records is allocated
    * across sources ∝ count^(1/temperature) (T=1 keeps the natural
    * distribution, larger T flattens toward uniform — the mT5 recipe),
    * each source's allocation then taken deterministically by hash order
    * ([[capPerGroup]]'s uniform-sample ordering), capped at the source's
    * actual count (a starved source contributes everything it has).
    *
    * Determinism across engines: weights are IEEE `sqrt` when T == 2
    * (correctly rounded, unlike `pow`) and quantized to integers at 1e-9
    * relative precision, so the weight SUM is exact long arithmetic (no
    * float-summation order sensitivity) and every remaining operation is
    * a single correctly-rounded IEEE op — the allocation, and therefore
    * the sampled row SET, is bit-reproducible anywhere. Other
    * temperatures go through `pow`, which is only ~1-ulp reproducible
    * across libms: fine in production, not oracle-bit-stable.
    *
    * Scale shape: one tiny per-source aggregate (broadcast back), one
    * row_number window per source — the same single shuffle
    * [[capPerGroup]] pays, with WindowGroupLimit pruning map-side.
    */
  def temperatureMix(df: DataFrame, source: String, id: Column, budget: Long,
      temperature: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(temperature > 0, "temperature must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = if (temperature == 2.0) sqrt(col("_n").cast("double"))
      else pow(col("_n").cast("double"), lit(1.0 / temperature))
    val alloc = df.groupBy(col(source)).agg(count(lit(1)).as("_n"))
      .withColumn("_wi", floor(w * lit(1e9)).cast("long"))
      .withColumn("_alloc", least(col("_n"),
        floor(lit(budget.toDouble) * col("_wi") /
          sum(col("_wi")).over(Window.partitionBy()).cast("double")).cast("long")))
      .select(col(source), col("_alloc"))
    val rank = Window.partitionBy(col(source))
      .orderBy(hashBucket(id, 1 << 30).asc, id.asc)
    df.withColumn("_rn", row_number().over(rank))
      // no allocation exceeds the global budget, so this CONSTANT bound is
      // a no-op on results — but it is what lets Catalyst infer a
      // WindowGroupLimit and prune each source to `budget` rows map-side
      // BEFORE the window shuffle (the data-dependent _alloc bound below
      // can't); without it the window moves the whole corpus
      .filter(col("_rn") <= budget)
      .join(broadcast(alloc), source)
      .filter(col("_rn") <= col("_alloc"))
      .drop("_rn", "_alloc")
  }

  /** Token-budget mixture sampling — [[temperatureMix]] with the budget
    * in TOKENS, which is what a training run actually provisions (a
    * 100-doc allocation means nothing when one source's documents are
    * 100× longer than another's): each source gets a token allocation
    * ∝ total_tokens^(1/temperature), then contributes whole documents in
    * deterministic hash order until the NEXT document would cross its
    * allocation. Same integer-quantized weight algebra as
    * [[temperatureMix]], so the selected document SET is bit-reproducible
    * across engines for T = 2.
    *
    * Scale shape: the running token sum is a window over a METADATA
    * projection — (source, id, token count) rows, never document text —
    * and the selected ids semi-join back to the corpus, so the only
    * full-width movement is the final join's build side of selected ids.
    * A running-sum window admits no WindowGroupLimit prune (every row's
    * cumsum depends on all predecessors), which is exactly why the frame
    * it sorts must be the 24-byte metadata row, not the document.
    */
  def tokenBudgetMix(df: DataFrame, source: String, idCol: String, tokens: Column,
      budgetTokens: Long, temperature: Double): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(temperature > 0, "temperature must be positive")
    import org.apache.spark.sql.expressions.Window
    val meta = df.select(col(source), col(idCol), tokens.cast("long").as("_tok"))
    val w = if (temperature == 2.0) sqrt(col("_n").cast("double"))
      else pow(col("_n").cast("double"), lit(1.0 / temperature))
    val alloc = meta.groupBy(col(source)).agg(sum(col("_tok")).as("_n"))
      .withColumn("_wi", floor(w * lit(1e9)).cast("long"))
      .withColumn("_alloc", least(col("_n"),
        floor(lit(budgetTokens.toDouble) * col("_wi") /
          sum(col("_wi")).over(Window.partitionBy()).cast("double")).cast("long")))
      .select(col(source), col("_alloc"))
    val cum = Window.partitionBy(col(source))
      .orderBy(hashBucket(col(idCol), 1 << 30).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = meta.withColumn("_cum", sum(col("_tok")).over(cum))
      .join(broadcast(alloc), source)
      .filter(col("_cum") <= col("_alloc"))
      .select(col(idCol))
    // broadcast-pinned by construction: without the hint a conservative
    // size estimate could plan a sort-merge join and shuffle the full-
    // width corpus (text included) — the exact movement the metadata
    // window exists to avoid. `picked` is ≤ budget/min-doc-tokens ids.
    df.join(broadcast(picked), idCol)
  }
}
