package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math over
  * `ArrayType(FloatType)` embedding columns.
  *
  * Why an Expression and not a UDF / higher-order function: the inner
  * product is the innermost loop of similarity search — at 100 TB it runs
  * O(rows × dim) times. A Scala UDF deserializes each array to
  * `Seq[Float]` per call; `aggregate(zip_with(...))` allocates a lambda
  * frame per element. This expression reads the columnar `ArrayData`
  * in place and participates in whole-stage codegen via `doGenCode`.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** `cosine_similarity(a, b)` = dot(a,b) / (|a|·|b|); null on length
  * mismatch or zero norm. Accumulates in double for stability. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // null elements (containsNull arrays) would read as 0.0 via
      // getFloat — a silently wrong score; null the result instead
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / math.sqrt(nx * ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      final double $xi = (double) $x.getFloat($i);
         |      final double $yi = (double) $y.getFloat($i);
         |      $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_product(a, b)`; null on length mismatch. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i); }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_norm_sq(a)` via DotProduct(a, a) is enough; no separate node. */
object VectorFunctions {
  def cosine_similarity(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpression(a), toExpression(b)))
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
