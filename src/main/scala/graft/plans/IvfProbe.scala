package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.operators.IvfIndex

/** Declarative IVF probing (SURVEY §4 "nprobe probing → dynamic partition
  * pruning", the optional custom-rule variant of step 5):
  *
  * `ivf_probe(list_id)` is a PREDICATE over the coarse-assignment column.
  * Row-wise it evaluates "is this row's list among the nprobe lists
  * nearest to the query?" — always correct, but it runs per row and the
  * scan can't skip anything.
  *
  * [[RewriteIvfProbe]] (an optimizer `Rule[LogicalPlan]`) folds it at
  * plan time into `list_id IN (<computed list ids>)` — static literals
  * that Catalyst pushes into the source as partition filters, so a
  * `partitionBy(list_id)` table skips (ncentroids − nprobe)/ncentroids of
  * its files before any IO. Register via [[GraftExtensions]]
  * (`spark.sql.extensions`) or `Graft.session` (experimental methods).
  *
  * This is the engine-side equivalent of the reference's inverted-list
  * selection (gamma_index_ivfflat.cc:42-95): the quantizer probe happens
  * once per query, the data scan touches only the probed lists.
  */
case class IvfProbe(
    listId: Expression,
    centroids: Array[Array[Float]],
    query: Seq[Float],
    nprobe: Int)
  extends UnaryExpression with Predicate {

  override def child: Expression = listId
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ivf_probe"

  @transient lazy val probedLists: Set[Int] =
    IvfIndex.Model(centroids, "l2").nearestCentroids(query, nprobe).toSet

  override def nullSafeEval(l: Any): Any = l match {
    // externally assigned coarse columns may be bigint — accept any
    // integral id rather than ClassCastException-ing per row
    case i: Int   => probedLists.contains(i)
    case j: Long  => j >= Int.MinValue && j <= Int.MaxValue && probedLists.contains(j.toInt)
    case s: Short => probedLists.contains(s.toInt)
    case other    => throw new IllegalArgumentException(
      s"ivf_probe expects an integral list_id, got ${other.getClass.getName}")
  }

  /** Row-wise membership for generated code (keeps the integral-type
    * tolerance of [[nullSafeEval]]).
    */
  def containsId(l: Long): Boolean =
    l >= Int.MinValue && l <= Int.MaxValue && probedLists.contains(l.toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probe", this, classOf[IvfProbe].getName)
    nullSafeCodeGen(ctx, ev, l =>
      s"${ev.value} = $ref.containsId((long) $l);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(listId = c)
}

/** Optimizer rule: fold ivf_probe into a static IN over list ids. The
  * literals take the child's integral type — Int literals against a
  * bigint column would make In's ordering throw at execution.
  */
object RewriteIvfProbe extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case p: IvfProbe =>
        val mk: Int => Literal = p.listId.dataType match {
          case org.apache.spark.sql.types.LongType  => i => Literal(i.toLong)
          case org.apache.spark.sql.types.ShortType => i => Literal(i.toShort)
          case _                                    => i => Literal(i)
        }
        In(p.listId, p.probedLists.toSeq.sorted.map(mk))
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — production wiring
  * for the probe-folding rule (SURVEY §4's optional SparkStrategy slot;
  * a rule suffices because the rewrite is expression-local).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteIvfProbe)
  }
}
