package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Optimizer rule: derive bucket_ts partition predicates from slot_ns
  * predicates.
  *
  * The engine's table layout partitions by bucket_ts = slot_ns −
  * slot_ns % bucketDuration (dbase/dbase.go:388-389's bucket routing,
  * §1.2). The engine's own read path adds both predicates, but a user
  * querying the table directly (SQL, ad-hoc DataFrame) naturally
  * writes only the slot_ns range — and without a bucket_ts predicate
  * the scan lists EVERY partition. This rule closes that gap: any
  * conjunct bounding slot_ns implies a (floored) bound on bucket_ts,
  * which Spark's PruneFileSourcePartitions then turns into
  * metadata-only partition pruning. At 100 TB this is the difference
  * between listing 30 bucket directories and listing 10 years of them.
  *
  * Enabled by setting `spark.graft.bucket.duration.ns` to the table's
  * bucket duration (the rule is a no-op otherwise) and installing
  * [[GraftExtensions]]. When tables with different durations share a
  * session, set `spark.graft.bucket.duration.ns.path.<root path>` per
  * table — the path-keyed value wins over the session-global one, and
  * a non-positive override disables the rule for that table. The derived bounds use the floor of
  * the slot bound — a superset of the exact bucket set, so rows are
  * never lost; the original slot_ns predicate still filters exactly.
  * Nothing is added when the filter already constrains bucket_ts
  * (also what makes the rule idempotent under fixed-point batches).
  */
object InferBucketPruning extends Rule[LogicalPlan] with PredicateHelper {

  private def floorBucket(v: Long, d: Long): Long = v - java.lang.Math.floorMod(v, d)

  /** Literal in the bucket column's own type: ns-scale partition
    * values discover as LongType, but small test fixtures (and any
    * sub-int-range epoch) discover as IntegerType — the derived
    * predicate must match the column type or it never prunes. A bound
    * outside Int range is clamped (not truncated): every Int bucket
    * value satisfies the clamped bound, so the derived predicate stays
    * a safe superset instead of wrapping to an unrelated value that
    * would prune live partitions. */
  private def bucketLit(v: Long, dt: DataType): Literal = dt match {
    case IntegerType =>
      Literal(java.lang.Math.max(Int.MinValue.toLong, java.lang.Math.min(Int.MaxValue.toLong, v)).toInt)
    case _ => Literal(v)
  }

  private def fits(v: Long, dt: DataType): Boolean = dt match {
    case IntegerType => v >= Int.MinValue.toLong && v <= Int.MaxValue.toLong
    case _           => true
  }

  /** Duration for the table a Filter sits over: a path-keyed override
    * `spark.graft.bucket.duration.ns.path.<root path>` wins over the
    * session-global `spark.graft.bucket.duration.ns`, so two tables
    * with different bucket durations can coexist in one session; an
    * override of 0 (or any non-positive value) disables the rule for
    * that table. */
  private def durationFor(child: LogicalPlan): Option[Long] = {
    val perPath = child.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
        case _                    => None
      }
    }.flatten.flatMap { p =>
      conf.getConfString(s"spark.graft.bucket.duration.ns.path.$p", "").toLongOption
    }
    perPath
      .orElse(conf.getConfString("spark.graft.bucket.duration.ns", "").toLongOption)
      .filter(_ > 0)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.transform {
      case f @ Filter(cond, child) =>
        durationFor(child) match {
          case Some(d) =>
          val slot = child.output.find(a => a.name == "slot_ns" && a.dataType == LongType)
          val bucket = child.output.find(a => a.name == "bucket_ts" &&
            (a.dataType == LongType || a.dataType == IntegerType))
          (slot, bucket) match {
            case (Some(s), Some(b)) =>
              val conjuncts = splitConjunctivePredicates(cond)
              val alreadyBounded = conjuncts.exists(_.references.exists(_.semanticEquals(b)))
              if (alreadyBounded) f
              else {
                val derived = conjuncts.flatMap {
                  // lower bounds on slot_ns → lower bound on bucket_ts
                  case GreaterThanOrEqual(a: AttributeReference, Literal(v: Long, LongType))
                      if a.semanticEquals(s) => Some(GreaterThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case GreaterThan(a: AttributeReference, Literal(v: Long, LongType))
                      if a.semanticEquals(s) => Some(GreaterThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case LessThanOrEqual(Literal(v: Long, LongType), a: AttributeReference)
                      if a.semanticEquals(s) => Some(GreaterThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case LessThan(Literal(v: Long, LongType), a: AttributeReference)
                      if a.semanticEquals(s) => Some(GreaterThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  // upper bounds on slot_ns → upper bound on bucket_ts
                  // (floor of the bound is a safe superset for both < and <=)
                  case LessThanOrEqual(a: AttributeReference, Literal(v: Long, LongType))
                      if a.semanticEquals(s) => Some(LessThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case LessThan(a: AttributeReference, Literal(v: Long, LongType))
                      if a.semanticEquals(s) => Some(LessThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case GreaterThanOrEqual(Literal(v: Long, LongType), a: AttributeReference)
                      if a.semanticEquals(s) => Some(LessThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case GreaterThan(Literal(v: Long, LongType), a: AttributeReference)
                      if a.semanticEquals(s) => Some(LessThanOrEqual(b, bucketLit(floorBucket(v, d), b.dataType)))
                  // exact slot → exact bucket (skipped when the floored
                  // bucket does not fit the column type: clamping an
                  // equality would compare against a different value)
                  case EqualTo(a: AttributeReference, Literal(v: Long, LongType))
                      if a.semanticEquals(s) && fits(floorBucket(v, d), b.dataType) =>
                    Some(EqualTo(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case EqualTo(Literal(v: Long, LongType), a: AttributeReference)
                      if a.semanticEquals(s) && fits(floorBucket(v, d), b.dataType) =>
                    Some(EqualTo(b, bucketLit(floorBucket(v, d), b.dataType)))
                  case _ => None
                }.distinct
                if (derived.isEmpty) f
                else Filter((cond +: derived).reduce(And), child)
              }
            case _ => f
          }
          case None => f
        }
    }
  }
}
