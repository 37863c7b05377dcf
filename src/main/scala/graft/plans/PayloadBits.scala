package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Typed-payload codec expressions: the engine stores opaque
  * fixed-size byte payloads (kdb parity, dbase/dbase.go:41-42); the
  * typed VIEW decodes them without a UDF. 8-byte big-endian IEEE-754
  * double ↔ binary, inlined into codegen — no boxing, no per-row
  * virtual calls. The pair (DoubleFromPayload here, encode on the
  * write side) keeps payload bytes the source of truth: zero bytes —
  * the engine's NULL (dblock/dblock.go:249-297) — decode to 0.0.
  */
case class DoubleFromPayload(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_from_payload"
  // A payload that is not exactly 8 bytes decodes to NULL, never to a
  // garbage double assembled from misaligned bits — nullable even when
  // the child column is not.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DoubleFromPayload.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      s"""
         |if ($c.length != 8) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bits = 0L;
         |  for (int $i = 0; $i < 8; $i++) {
         |    $bits = ($bits << 8) | ($c[$i] & 0xffL);
         |  }
         |  ${ev.value} = Double.longBitsToDouble($bits);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleFromPayload =
    copy(child = newChild)
}

object DoubleFromPayload {
  /** Interpreted twin of the generated branch (must stay identical). */
  def decode(bytes: Array[Byte]): Any = {
    if (bytes.length != 8) return null
    var bits = 0L
    var i = 0
    while (i < 8) {
      bits = (bits << 8) | (bytes(i) & 0xffL); i += 1
    }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Driver-side encoder (test fixtures, Point construction). */
  def encode(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >>> (8 * (7 - i))) & 0xffL).toByte).toArray
  }
}
