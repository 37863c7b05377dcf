package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

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

/** Vector-payload decode: a fixed-size binary payload of big-endian
  * IEEE-754 float32s → ARRAY<FLOAT> (dim = payloadSize / 4). The
  * typed view behind the engine's persisted ANN index: embeddings
  * ride the same opaque-payload Put/Get path as every other write,
  * and the index build/probe decodes them without a UDF. Bit-exact
  * round trip with [[FloatsFromPayload.encode]]. A payload whose
  * length is not a positive multiple of 4 decodes to NULL — never a
  * garbage vector assembled from misaligned bytes (the
  * [[DoubleFromPayload]] contract). Zero payloads — the engine's
  * NULL — decode to the zero vector, the gap-fill semantic of the
  * byte view. */
case class FloatsFromPayload(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "floats_from_payload"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FloatsFromPayload.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      val b = ctx.freshName("b")
      s"""
         |if ($c.length == 0 || $c.length % 4 != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $c.length / 4;
         |  float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $bits = 0;
         |    for (int $b = 0; $b < 4; $b++) {
         |      $bits = ($bits << 8) | ($c[4 * $i + $b] & 0xff);
         |    }
         |    $out[$i] = Float.intBitsToFloat($bits);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatsFromPayload =
    copy(child = newChild)
}

object FloatsFromPayload {
  /** Interpreted twin of the generated branch (must stay identical). */
  def decode(bytes: Array[Byte]): Any = {
    if (bytes.length == 0 || bytes.length % 4 != 0) return null
    val n = bytes.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val bits = ((bytes(4 * i) & 0xff) << 24) | ((bytes(4 * i + 1) & 0xff) << 16) |
        ((bytes(4 * i + 2) & 0xff) << 8) | (bytes(4 * i + 3) & 0xff)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side encoder (ingest helpers, test fixtures): float32s →
    * big-endian payload bytes; decode(encode(v)) == v bit-exactly. */
  def encode(v: Seq[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 4)
    var i = 0
    while (i < v.length) {
      val bits = java.lang.Float.floatToIntBits(v(i))
      out(4 * i) = (bits >>> 24).toByte
      out(4 * i + 1) = (bits >>> 16).toByte
      out(4 * i + 2) = (bits >>> 8).toByte
      out(4 * i + 3) = bits.toByte
      i += 1
    }
    out
  }
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
