package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native 64-bit FNV-1a over a binary column — the engine's cheap
  * content hash (media fingerprints, shard routing). A custom Catalyst
  * `Expression` with `doGenCode`: the hash loop is inlined into
  * whole-stage codegen, so hot paths pay no UDF serialization, no
  * boxing, and no virtual call per row — the preference order the
  * engine follows everywhere (built-in > native Expression > UDF).
  * Not used in oracle-verified queries (DuckDB has no FNV); exposed to
  * SQL as `fnv64(binary)` via [[GraftExtensions]].
  */
case class Fnv64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $h ^= ($c[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  /** Interpreted twin of the generated loop (must stay identical). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
  }
}

/** Engine extensions, installed with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Registers the
  * native function surface plus the [[InferBucketPruning]] optimizer
  * rule (partition pruning for users who only constrain slot_ns). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => InferBucketPruning)
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (children: Seq[Expression]) => Fnv64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("double_from_payload"),
      new ExpressionInfo(classOf[DoubleFromPayload].getName, "double_from_payload"),
      (children: Seq[Expression]) => DoubleFromPayload(children.head)))
    ext.injectFunction((
      FunctionIdentifier("floats_from_payload"),
      new ExpressionInfo(classOf[FloatsFromPayload].getName, "floats_from_payload"),
      (children: Seq[Expression]) => FloatsFromPayload(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Sq].getName, "l2_sq"),
      (children: Seq[Expression]) => L2Sq(children(0), children(1))))
    // Spark ships codegen'd bloom-filter expressions but only wires
    // them into its internal runtime-filter rewrite — the SQL surface
    // has no bloom_filter_agg/might_contain. Re-export them under
    // graft_ names: the mergeable 8 KB filter that screens an arriving
    // batch against a billion-row corpus WITHOUT shuffling the corpus
    // is exactly the incremental-dedup primitive a 100 TB pipeline
    // wants (build once, broadcast, exact-verify only the hits).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
  }
}
