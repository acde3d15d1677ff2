package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATES (TypedImperativeAggregate) — the aggregate
  * counterpart of the scalar sketch expressions in
  * [[HashExpressions]]/[[TextExpressions]]: they run inside
  * ObjectHashAggregate with full map-side partial aggregation and
  * executor-side merge, so the shuffle carries one bounded buffer per
  * group per partition instead of rows.
  *
  * Reference capability: SURVEY §4 names the Fold/first-match family as
  * the one place a custom aggregate pays (the reference compiles operator
  * bodies into its Aggregate vertex driver,
  * runtime/src/main/scala/com/asakusafw/spark/runtime/graph/Aggregate.scala:47-89);
  * here the same slot is a Catalyst-native aggregate function.
  */
object AggExpressions {

  /** Column-API entry: `topkAgg(col("v"), 5)` in an `agg(...)`. */
  def topkAgg(value: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(BoundedTopK(expression(value), k).toAggregateExpression())
  }

  /** Column-API entry for the arg-top-k:
    * `topkPairAgg(col("score"), col("id"), 3)`.
    */
  def topkPairAgg(score: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(BoundedTopKPair(expression(score), expression(id), k)
      .toAggregateExpression())
  }

  /** The shared min-heap buffer: keeps the k LARGEST longs seen. Merge
    * and update are both O(log k); memory is exactly k longs per group
    * per partition — a per-group top-k that never sorts the group and
    * never materializes it.
    */
  final class TopKBuffer(val k: Int) {
    val heap = new java.util.PriorityQueue[java.lang.Long](k max 1)
    def add(v: Long): Unit = {
      if (heap.size < k) { heap.add(v); () }
      else if (heap.peek() < v) { heap.poll(); heap.add(v); () }
    }
  }

  /** Pair buffer for the arg-top-k: keeps the k best (score, id) pairs
    * under the total order (score DESC, id ASC). The heap's head is the
    * WORST kept pair — smallest score, largest id among score-ties — so
    * eviction is O(log k) and the result is fully deterministic.
    */
  final class TopKPairBuffer(val k: Int) {
    val heap = new java.util.PriorityQueue[(Long, Long)](k max 1,
      new java.util.Comparator[(Long, Long)] {
        // ascending by score, then DESCENDING by id: head = worst
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(b._2, a._2)
        }
      })
    def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def add(p: (Long, Long)): Unit = {
      if (heap.size < k) { heap.add(p); () }
      else if (better(p, heap.peek())) { heap.poll(); heap.add(p); () }
    }
  }
}

/** `bounded_topk(value, k)`: the k largest values of a LONG column per
  * group, as an array sorted descending — the window-free top-k. A
  * `row_number() OVER (ORDER BY v DESC) <= k` plan shuffles and sorts
  * every row of the group (WindowGroupLimit prunes to k·partitions, but
  * the sort and the exchange remain row-sized); this aggregate
  * partial-aggregates map-side, so the exchange carries ≤ k longs per
  * group per input partition regardless of group size — the shape a
  * 100 TB top-k wants. Ties: value-multiset semantics (the k largest
  * values with duplicates), deterministic because equal values are
  * indistinguishable. Nulls are ignored; a group of only nulls yields an
  * empty array.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AggExpressions.TopKBuffer] {

  require(k > 0, s"bounded_topk: k must be positive (got $k)")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_topk requires a BIGINT value column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): AggExpressions.TopKBuffer =
    new AggExpressions.TopKBuffer(k)

  override def update(buffer: AggExpressions.TopKBuffer,
      input: InternalRow): AggExpressions.TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: AggExpressions.TopKBuffer,
      other: AggExpressions.TopKBuffer): AggExpressions.TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: AggExpressions.TopKBuffer): Any = {
    val arr = new Array[Long](buffer.heap.size)
    var i = 0
    val it = buffer.heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: AggExpressions.TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.heap.size)
    bb.putInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): AggExpressions.TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new AggExpressions.TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

/** `bounded_topk_pair(score, id, k)`: the k best (score, id) pairs per
  * group under (score DESC, id ASC), as an array of structs sorted that
  * way — the arg-top-k ("which ids have the k highest scores"), i.e. the
  * aggregate form of `row_number() OVER (ORDER BY score DESC, id ASC)
  * <= k`, with the same map-side k-bounded buffer scale shape as
  * [[BoundedTopK]] and a fully deterministic result (the id tie-break
  * totals the order). Rows where score OR id is null are ignored.
  */
case class BoundedTopKPair(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AggExpressions.TopKPairBuffer] {

  require(k > 0, s"bounded_topk_pair: k must be positive (got $k)")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_topk_pair requires BIGINT (score, id), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_topk_pair"

  override def createAggregationBuffer(): AggExpressions.TopKPairBuffer =
    new AggExpressions.TopKPairBuffer(k)

  override def update(buffer: AggExpressions.TopKPairBuffer,
      input: InternalRow): AggExpressions.TopKPairBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add((s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buffer
  }

  override def merge(buffer: AggExpressions.TopKPairBuffer,
      other: AggExpressions.TopKPairBuffer): AggExpressions.TopKPairBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: AggExpressions.TopKPairBuffer): Any = {
    val arr = new Array[(Long, Long)](buffer.heap.size)
    var i = 0
    val it = buffer.heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // best-first: score desc, id asc
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    new GenericArrayData(arr.map { case (s, d) =>
      InternalRow(s, d)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: AggExpressions.TopKPairBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.heap.size)
    bb.putInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): AggExpressions.TopKPairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new AggExpressions.TopKPairBuffer(k)
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKPair =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKPair =
    copy(score = newChildren(0), id = newChildren(1))
}
