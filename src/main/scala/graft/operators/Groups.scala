package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Group-level operators: CoGroup / GroupSort / Fold / Summarize
  * (reference: runtime/.../graph/CoGroup.scala:44-78,
  * fragment/user/CoGroupOperatorFragment.scala:28-116,
  * operator/aggregation/FoldAggregationCompiler.scala:35-169,
  * SummarizeAggregationCompiler.scala:106-235).
  *
  * Scale notes (100 TB): every entry point here groups by key — a shuffle.
  * The iterator-based forms (`cogroup`, `groupSort`) never materialize a
  * per-key collection unless the user function does, mirroring the
  * reference's VOLATILE one-pass buffer strategy
  * (CoGroupOperatorCompiler.scala:122-130); huge groups therefore stream.
  * Fold/Summarize compile to Catalyst hash aggregation with automatic
  * map-side partial reduction — the reference gates this on the operator
  * declaring PARTIAL reduction (SubPlanAnalyzer.java:182-191); for us it is
  * always on.
  */
object Groups {

  /** n=2 sort-merge cogroup: user function over the per-key streams of both
    * inputs. Mirrors `smcogroup` (reference runtime/.../rdd/package.scala:71-143)
    * without pre-serialized shuffle keys — Tungsten sorts UnsafeRows.
    */
  def cogroup[K: Encoder, L, R, O: Encoder](left: Dataset[L], right: Dataset[R])(
      leftKey: L => K, rightKey: R => K)(
      f: (K, Iterator[L], Iterator[R]) => IterableOnce[O]): Dataset[O] =
    left.groupByKey(leftKey).cogroup(right.groupByKey(rightKey)) { (k, ls, rs) =>
      f(k, ls, rs).iterator
    }

  /** CoGroup with per-input secondary sort — each input's group iterator
    * arrives ordered by its sort expressions (reference GroupOrdering /
    * SortOrdering: compiler/.../ordering/SortOrderingClassBuilder.scala:41-110).
    */
  def cogroupSorted[K: Encoder, L, R, O: Encoder](left: Dataset[L], right: Dataset[R])(
      leftKey: L => K, rightKey: R => K)(leftOrder: Seq[Column], rightOrder: Seq[Column])(
      f: (K, Iterator[L], Iterator[R]) => IterableOnce[O]): Dataset[O] =
    left.groupByKey(leftKey).cogroupSorted(right.groupByKey(rightKey))(leftOrder: _*)(rightOrder: _*) {
      (k, ls, rs) => f(k, ls, rs).iterator
    }

  /** n-ary sort-merge cogroup (the reference's `smcogroup` is n-ary,
    * runtime/.../rdd/package.scala:71-143; our typed [[cogroup]] stops at
    * n=2 because Spark's KeyValueGroupedDataset.cogroup does). One shuffle
    * for ALL inputs: tag each input, union, group by key, secondary-sort by
    * (tag, per-input order), then slice the single sorted stream back into
    * per-input iterators.
    *
    * Contract: every input must carry the `keys` columns under the same
    * names (rename first); `orders(i)` names sort columns of input i. The
    * user function receives per-input iterators in declaration order —
    * inputs 0..n-2 are buffered per group (they must be: one physical
    * stream can only be consumed in tag order), the LAST input streams
    * without materialization, so put the biggest input last. Buffers hold
    * at most `spillThreshold` records on heap and spill the rest to
    * executor-local disk ([[SpillBuffer]]) — a pathological hot key
    * degrades to disk streaming instead of OOMing the task, mirroring the
    * reference's HEAP-then-SPILL buffer strategy
    * (CoGroupOperatorCompiler.scala:122-130, BufferType.SPILL).
    */
  def cogroupN(inputs: Seq[DataFrame], keys: Seq[String], orders: Seq[Seq[String]],
      outSchema: StructType, spillThreshold: Int = -1)(
      f: (Row, IndexedSeq[Iterator[Row]]) => IterableOnce[Row]): DataFrame = {
    require(inputs.size >= 2, s"cogroupN needs >= 2 inputs (got ${inputs.size})")
    require(orders.size == inputs.size, "one (possibly empty) order list per input")
    val n = inputs.size
    val tagged = inputs.zipWithIndex.map { case (df, i) =>
      df.select(keys.map(col) ++ Seq(lit(i).as("_tag"),
        struct(df.columns.map(col).toSeq: _*).as(s"_rec_$i")): _*)
    }
    val u = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    val uSchema = u.schema
    val keyIdx = keys.map(uSchema.fieldIndex)
    val tagIdx = uSchema.fieldIndex("_tag")
    val recIdx = (0 until n).map(i => uSchema.fieldIndex(s"_rec_$i"))
    val keyEnc: Encoder[Row] = Encoders.row(StructType(keys.map(uSchema(_))))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    // sort by tag first, then input i's own columns (null constants for
    // rows of other tags, so they never perturb the within-tag order)
    val sortCols = col("_tag") +:
      orders.zipWithIndex.flatMap { case (os, i) => os.map(o => col(s"_rec_$i").getField(o)) }
    u.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapSortedGroups(sortCols: _*) { (k: Row, it: Iterator[Row]) =>
        val limit = if (spillThreshold > 0) spillThreshold else SpillBuffer.defaultThreshold
        val bit = it.buffered
        val buffered: IndexedSeq[Iterator[Row]] = (0 until n - 1).map { i =>
          val b = new SpillBuffer[Row](limit)
          while (bit.hasNext && bit.head.getInt(tagIdx) == i) b.append(bit.next().getStruct(recIdx(i)))
          b.iterator
        }
        val last: Iterator[Row] = bit.map(r => r.getStruct(recIdx(n - 1)))
        f(k, buffered :+ last).iterator
      }(outEnc)
  }

  /** GroupSort: user function over each key's records delivered in sort
    * order — one pass, nothing buffered by the framework.
    */
  def groupSort[K: Encoder, T, O: Encoder](ds: Dataset[T])(key: T => K)(order: Column*)(
      f: (K, Iterator[T]) => IterableOnce[O]): Dataset[O] =
    ds.groupByKey(key).flatMapSortedGroups(order: _*)((k, it) => f(k, it).iterator)

  /** Fold: key-wise fold where the accumulator is a record of the same type
    * (reference asserts same in/out type, FoldAggregationCompiler.scala:52-57).
    * `reduceGroups` plans as a Catalyst aggregate with partial merge, i.e.
    * map-side combine for free.
    */
  def fold[K: Encoder, T: Encoder](ds: Dataset[T])(key: T => K)(f: (T, T) => T): Dataset[(K, T)] =
    ds.groupByKey(key).reduceGroups(f)

  /** Summarize: declarative per-column aggregation over a grouping key.
    * Ops are exactly the reference vocabulary: ANY, SUM, COUNT, MAX, MIN
    * (SummarizeAggregationCompiler.scala:106-145). Widening follows the
    * reference (ValueOptionOps.scala:97-125): SUM over integral types →
    * long, over float/double → double, decimal → decimal; Spark's
    * `sum`/`count` already widen identically, we only pin integral sums to
    * long explicitly.
    *
    * `strictNulls = true` reproduces the reference's null-input error for
    * SUM/COUNT/MAX/MIN (`checkNull` → NullPointerException with the
    * property name, ValueOptionOps.scala:125-190); default is off (SQL
    * null-skipping semantics) because the guard blocks codegen fusion.
    */
  object SummarizeOp extends Enumeration {
    val Any, Sum, Count, Max, Min = Value
  }

  final case class SummarizeSpec(op: SummarizeOp.Value, src: String, out: String)

  def summarize(df: DataFrame, keys: Seq[String], specs: Seq[SummarizeSpec],
      strictNulls: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    def guarded(name: String): Column =
      if (!strictNulls) col(name)
      else when(col(name).isNull,
        raise_error(concat(lit(s"null value in aggregation input: $name")))).otherwise(col(name))
    val aggs = specs.map { s =>
      val c = guarded(s.src)
      val a = s.op match {
        case SummarizeOp.Any   => first(c, ignoreNulls = false)
        case SummarizeOp.Count => count(c)
        case SummarizeOp.Max   => max(c)
        case SummarizeOp.Min   => min(c)
        case SummarizeOp.Sum =>
          df.schema(s.src).dataType match {
            case ByteType | ShortType | IntegerType | LongType => sum(c.cast(LongType))
            case FloatType => sum(c.cast(DoubleType))
            case other => sum(c)
          }
      }
      a.as(s.out)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
