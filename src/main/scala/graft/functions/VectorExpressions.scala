package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two double arrays, one fused pass (dot product and
  * both norms in a single loop), codegen'd as a static call.
  *
  * The composable form (zip_with + aggregate ×3) runs on the interpreted
  * higher-order-function path with per-element allocations — this is the
  * ANN / embedding-dedup hot path, O(|pairs|·dim) at corpus scale. Null or
  * length-mismatched inputs → null; zero-norm inputs → null (no cosine
  * defined).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $r = graft.functions.CosineSimilarity.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CosineSimilarity = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Returns null (boxed) when lengths differ or either norm is zero. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Order-preserving bijection DOUBLE → BIGINT (the IEEE-754 sortable-bits
  * transform: identity on non-negatives, flip the non-sign bits for
  * negatives): `a < b ⇔ key(a) < key(b)` for all non-NaN doubles, and
  * key ties are exactly bit-identical doubles. Lets integer-keyed
  * machinery — [[BoundedTopKPair]] and its streaming state buffers —
  * rank float scores with NO precision loss and no float comparator:
  * the per-group top-k under (key DESC, id ASC) is the top-k under the
  * double order. Codegen'd, null-preserving.
  */
case class DoubleSortKey(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    DoubleSortKey.key(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.DoubleSortKey.key($d)")

  override protected def withNewChildInternal(c: Expression): DoubleSortKey =
    copy(child = c)
}

object DoubleSortKey {
  def key(d: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(d)
    if (b >= 0L) b else b ^ Long.MaxValue
  }
}

object VectorExprFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Fused cosine similarity over `array<double>` columns (cast float
    * arrays up front with `.cast("array<double>")`).
    */
  def cosine_fused(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** The [[DoubleSortKey]] order-preserving DOUBLE → BIGINT key. */
  def double_sort_key(d: Column): Column =
    column(DoubleSortKey(expression(d)))
}
