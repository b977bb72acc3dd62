package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan IR → DataFrame program.
  *
  * The deterministic replacement for the reference's LLM code-generator +
  * `exec()` pipeline (agentic_workflow_transformation.py:57-101, 105-154):
  * instead of generating pandas *source text* and executing it, each IR node
  * folds into one lazy DataFrame transformation. Catalyst performs all
  * optimization on the resulting logical plan (predicate pushdown, column
  * pruning, `TakeOrderedAndProject` for Sort+Limit, two-phase hash
  * aggregation) — no hand-scheduling, per SURVEY.md §4.2.
  */
object Compiler {

  def compile(plan: Plan, input: DataFrame): DataFrame =
    plan.ops.foldLeft(input)(applyOp)

  /** Resolve a column name against the frame, tolerating the reference's
    * loose plural phrasing ("count names" over a `name` column —
    * agentic_workflow_transformation.py:345 vs input.csv header). */
  private def resolve(df: DataFrame, name: String): String = {
    val cols = df.columns
    if (cols.contains(name)) name
    else if (name.endsWith("s") && cols.contains(name.dropRight(1))) name.dropRight(1)
    else name // leave as-is; Spark's analyzer raises the error with context
  }

  def applyOp(df: DataFrame, op: Op): DataFrame = op match {
    case Op.Filter(p)          => df.filter(predicate(df, p))
    case Op.Select(cs)         => df.select(cs.map(c => col(resolve(df, c))): _*)
    case Op.DeriveBool(n, p)   => df.withColumn(n, predicate(df, p))
    case Op.Rename(from, to)   => df.withColumnRenamed(from, to)
    case Op.Drop(cs)           => df.drop(cs.map(resolve(df, _)): _*)
    case Op.Sort(keys)         =>
      df.orderBy(keys.map { case (c, asc) =>
        val k = col(resolve(df, c)); if (asc) k.asc else k.desc
      }: _*)
    case Op.Limit(k)           => df.limit(k)
    case Op.GroupAgg(keys, as) =>
      val aggCols = as.map(a => aggColumn(df, a))
      df.groupBy(keys.map(c => col(resolve(df, c))): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    case Op.Having(p)          => df.filter(predicate(df, p))
  }

  private def aggColumn(df: DataFrame, a: AggSpec): Column = {
    val c = col(resolve(df, a.col))
    val base = a.func match {
      case AggFunc.Count => count(c)
      case AggFunc.Avg   => avg(c)
      case AggFunc.Sum   => sum(c)
      case AggFunc.Min   => min(c)
      case AggFunc.Max   => max(c)
    }
    base.as(a.alias)
  }

  def predicate(df: DataFrame, p: Pred): Column = p match {
    case Pred.Cmp(op, c, v) =>
      val l = col(resolve(df, c)); val r = litOf(v)
      op match {
        case Pred.Gt => l > r
        case Pred.Ge => l >= r
        case Pred.Lt => l < r
        case Pred.Le => l <= r
        case Pred.Eq => l === r
        case Pred.Ne => l =!= r
      }
    case Pred.Between(c, lo, hi) => col(resolve(df, c)).between(litOf(lo), litOf(hi))
    case Pred.StartsWith(c, s)   => col(resolve(df, c)).startsWith(s)
    case Pred.Contains(c, s)     => col(resolve(df, c)).contains(s)
    case Pred.In(c, vs)          => col(resolve(df, c)).isin(vs.map(litAny): _*)
    case Pred.And(l, r)          => predicate(df, l) && predicate(df, r)
    case Pred.Or(l, r)           => predicate(df, l) || predicate(df, r)
    case Pred.Not(ch)            => !predicate(df, ch)
  }

  private def litOf(l: Lit): Column = lit(litAny(l))
  private def litAny(l: Lit): Any = l match {
    case n: Lit.Num => n.asAny
    case Lit.Str(s) => s
  }
}
