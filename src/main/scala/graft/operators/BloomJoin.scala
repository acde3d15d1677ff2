package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pre-filtering — the explicit form of the runtime
  * sideways-information-passing pattern (Spark's own InjectRuntimeFilter
  * applies it opportunistically; semi-join reduction via filters goes
  * back to Bloom-join literature, e.g. Mackert & Lohman 1986).
  *
  * The 100 TB shape it targets: joining a huge fact stream to a dim set
  * that is SELECTIVE but too large to broadcast as an exact hash table
  * (10⁷-10⁸ keys with payload → tens of GB broadcast; the bloom sketch of
  * the same keys → a few MB at ~1 % fpp). Shipping the sketch to the fact
  * scan drops non-matching fact rows MAP-SIDE, before they are shuffled
  * for the join — when the join selects 1 % of the fact, the exchange
  * moves ~1 % (+ fpp) of the bytes instead of all of them.
  *
  * The sketch is built with map-side partial merge (one
  * `TypedImperativeAggregate` sketch per task, merged once) and collected
  * to the driver as ONE bounded binary object (`numBits/8` bytes — the
  * same driver-side cost Spark's runtime filter pays through its scalar
  * subquery), then embedded as a literal so the might-contain probe is
  * codegen'd into the fact scan's filter.
  *
  * Bloom positives are probabilistic, so every public entry point
  * composes the EXACT join after the pre-filter: the sketch changes how
  * many rows travel, never the answer.
  */
object BloomJoin {

  /** `fact` reduced to rows whose `factKey` might match a `dimKey` — a
    * SUPERSET of the true matches (fpp-bounded overshoot). Compose any
    * exact join downstream. `expectedItems` sizes the sketch; `numBits`
    * caps its memory (default 8 Mbit = 1 MB, fpp ≈ 1 % at 10⁶ items).
    * An empty/all-null dim yields a constant-false filter (no sketch).
    */
  def prefilter(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val agg = Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(dimKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val sketch = dim.select(agg.as("_bf")).head.getAs[Array[Byte]](0)
    if (sketch == null) fact.filter(lit(false))
    else fact.filter(Bridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType), Bridge.expression(xxhash64(factKey)))))
  }

  /** Exact inner equi-join with bloom pre-filtering on the fact side. */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame =
    prefilter(fact, col(factKey), dim, col(dimKey), expectedItems, numBits)
      .join(dim, col(factKey) === dim(dimKey))

  /** Exact left-semi equi-join (fact rows with ≥1 dim match) with bloom
    * pre-filtering — the purest "shuffle only what joins" form.
    */
  def semi(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame =
    prefilter(fact, col(factKey), dim, col(dimKey), expectedItems, numBits)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
}
