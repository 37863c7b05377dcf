package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-vector kernels for the similarity operators.
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
  * Null semantics mirror the HOF composition exactly: length mismatch
  * or any null element → NULL (zip_with pads the shorter side with
  * nulls; a null poisons the fold).
  */
abstract class FloatVecFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Combine the three accumulators (Σxy, Σx², Σy²) — or for distance
    * ops, whichever the loop fills — into the final double. */
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
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
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
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
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

/** l2_sq(a, b) = Σ(x−y)². The loop accumulates the squared difference
  * in the `dot` slot — per-step op is acc + (x−y)·(x−y), matching the
  * HOF rendering used by the IVF oracles. */
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
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
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
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
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
