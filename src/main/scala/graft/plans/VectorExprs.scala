package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector kernels for the similarity operators.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback: every element pays an interpreted lambda call with
  * boxing. These expressions inline the same strict left-to-right
  * double fold into whole-stage codegen — ONE loop over the two
  * ArrayDatas, no allocation — while producing BIT-IDENTICAL doubles
  * to the HOF composition (same per-step IEEE ops in the same order),
  * so the DuckDB oracles (`list_reduce` renderings) keep hash-matching.
  * VectorExprsSpec asserts the equivalence on random vectors.
  *
  * Inputs may be array<float> or array<double> on either side
  * (embeddings are float; k-means centroids are double averages);
  * elements are widened to double exactly as the HOF `.cast("double")`
  * did. Null semantics mirror the HOF composition: length mismatch or
  * any null element → NULL (zip_with pads the shorter side with
  * nulls; a null poisons the fold).
  */
abstract class FloatVecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline protected final def elem(dt: DataType, a: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _) => a.getFloat(i).toDouble
      case _                       => a.getDouble(i)
    }

  /** Java accessor expression for one element, widened to double. */
  protected final def elemJava(dt: DataType, a: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $a.getFloat($i)"
      case _                       => s"$a.getDouble($i)"
    }

  /** Combine the three accumulators (Σxy, Σx², Σy²) into the result. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  protected def finishJava(dot: String, na: String, nb: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(left.dataType, a, i)
      val y = elem(right.dataType, b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${elemJava(left.dataType, a, i)};
         |    double $y = ${elemJava(right.dataType, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${finishJava(dot, na, nb)};
         |  }
         |}
       """.stripMargin
    })
}

/** cosine_sim(a, b) = Σxy / (√Σx² · √Σy²). Empty inputs give 0/0 =
  * NaN, exactly as the HOF fold does. */
case class CosineSim(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "cosine_sim"
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishJava(dot: String, na: String, nb: String): String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** dot_product(a, b) = Σxy, strict left fold. */
case class DotProduct(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "dot_product"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishJava(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** l2_sq(a, b) = Σ(x−y)². Per-step op is acc + (x−y)·(x−y), matching
  * the HOF rendering used by the IVF oracles. */
case class L2Sq(left: Expression, right: Expression) extends FloatVecFold {
  override def prettyName: String = "l2_sq"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishJava(dot: String, na: String, nb: String): String = dot

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(left.dataType, a, i) - elem(right.dataType, b, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${elemJava(left.dataType, a, i)} - ${elemJava(right.dataType, b, i)};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
    copy(left = l, right = r)
}
