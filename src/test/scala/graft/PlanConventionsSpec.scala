package graft

import org.apache.spark.sql.catalyst.expressions.{EqualTo, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Mechanical pin of the CLAUDE.md plan conventions over EVERY registered
  * query — future operators inherit the guard instead of relying on ad-hoc
  * per-operator explain audits:
  *
  *   - no `CartesianProduct`, ever (an unbroadcast cross product is never
  *     the right 100 TB plan);
  *   - a `BroadcastNestedLoopJoin` only when its broadcast side is provably
  *     BOUNDED — a scalar aggregate (no grouping ⇒ exactly one row), a
  *     point-lookup filter on a literal key (the 1-row query-vector frames),
  *     a tiny LocalTableScan, or a small LIMIT — i.e. the audited
  *     `crossJoin(broadcast(scalar))` pattern and nothing else;
  *   - a single-partition shuffle only directly above a partial scalar
  *     aggregate (the bounded final-agg exchange); global windows or sorts
  *     funneling DATA through one partition fail.
  *
  * Runs on the physical plan with AQE off so the tree is traversable as
  * planned (AQE re-plans at runtime but starts from this exact tree).
  */
class PlanConventionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Unwrap codegen packaging so structural checks see the real operator. */
  private def strip(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter => strip(i.child)
    case other => other
  }

  private def isScalarAgg(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case _ => false
  }

  /** A node that proves its subtree's row count is bounded independent of
    * input scale. */
  private def boundedNode(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case f: FilterExec if f.condition.exists {
      case EqualTo(_, _: Literal) | EqualTo(_: Literal, _) => true
      // A literal IN-list (≤ 1000 keys) bounds rows the same way a
      // point lookup does — the multi-anchor frame of x48.
      case In(_, list) if list.nonEmpty && list.size <= 1000 &&
        list.forall(_.isInstanceOf[Literal]) => true
      case s: InSet if s.hset.size <= 1000 => true
      case _ => false
    } => true
    case l: LocalTableScanExec if l.rows.size <= 1000 => true
    case g: GlobalLimitExec if g.limit <= 1000 => true
    case t: TakeOrderedAndProjectExec if t.limit <= 1000 => true
    // A reused broadcast: its defining exchange appears elsewhere in the
    // same plan and is checked at its own join site.
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
    case _ => false
  }

  /** A broadcast side is acceptable iff some node in it proves the row
    * count is bounded independent of input scale. */
  private def boundedBroadcast(side: SparkPlan): Boolean =
    side.collectFirst { case p if boundedNode(p) => true }.getOrElse(false)

  test("every registered query plan honors the no-cartesian / bounded-broadcast / no-single-partition conventions") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val violations = Seq.newBuilder[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        plan.foreach {
          case _: CartesianProductExec =>
            violations += s"$name: CartesianProduct"
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            if (!boundedBroadcast(build))
              violations += s"$name: BroadcastNestedLoopJoin with unbounded broadcast side\n$build"
          case e: ShuffleExchangeExec
              if e.outputPartitioning == SinglePartition && !isScalarAgg(strip(e.child)) =>
            violations += s"$name: Exchange SinglePartition over ${strip(e.child).nodeName}"
          case _ =>
        }
      }
      val found = violations.result()
      assert(found.isEmpty,
        s"plan-convention violations:\n${found.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** The join-heaviest registry entries, re-audited with AQE ON and the
    * query EXECUTED: AQE can demote a planned broadcast join at runtime
    * (e.g. when its size estimate crosses the threshold mid-flight), so the
    * planned-tree audit above is necessary but not sufficient. The final
    * adaptive plan must still contain no CartesianProduct and no
    * unbounded BroadcastNestedLoopJoin. (r6 ask #4) */
  private val joinHeavy = Seq(
    "j3_region_nation_revenue", "j4_bucketed_top_orders", "j7_salted_revenue",
    "q13_leaderboard_rank", "q21_asof_enrich", "q22_session_attribution",
    "q2_visible_channel_totals", "x12_embed_neardup",
    "x38_incremental_neardup", "x40_knn_join")

  /** All physical nodes reachable through AQE packaging: the final plan of
    * an AdaptiveSparkPlanExec, the materialized plan inside each query
    * stage, and the subtree behind a reused stage/exchange. */
  private def adaptiveNodes(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive._
    val self = p match {
      case a: AdaptiveSparkPlanExec => adaptiveNodes(a.executedPlan)
      case s: QueryStageExec => s +: adaptiveNodes(s.plan)
      case other => other +: other.children.flatMap(adaptiveNodes)
    }
    self
  }

  test("AQE-final plans of the join-heaviest entries stay cartesian-free") {
    val registered = SparkEntry.queries
    val violations = Seq.newBuilder[String]
    joinHeavy.foreach { name =>
      val df = registered(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save() // materialize all stages
      adaptiveNodes(df.queryExecution.executedPlan).foreach {
        case _: CartesianProductExec =>
          violations += s"$name: CartesianProduct in AQE-final plan"
        case j: BroadcastNestedLoopJoinExec =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          if (!adaptiveNodes(build).exists(boundedNode))
            violations += s"$name: unbounded BroadcastNestedLoopJoin in AQE-final plan"
        case _ =>
      }
    }
    val found = violations.result()
    assert(found.isEmpty, s"AQE-final violations:\n${found.mkString("\n")}")
  }
}
