package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the whole-operator extension path from the brief:
  * a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, planned through
  * Catalyst, for an operator Spark's built-ins can't express directly
  * (SURVEY §2.3 "Not present: … as-of joins"; the reference's pipelines
  * enrich events with point-in-time dimension state the same way a
  * kdb/QuestDB/Flink temporal join would).
  *
  * Semantics: for each left row, the most recent right row with the same
  * key and `right.time <= left.time`; right payload columns are null when
  * no such row exists. Ties (equal time) resolve to the right row — a
  * payload is visible at its own timestamp. Equal to
  * [[graft.operators.AsOfJoin.asOf]] (the composed union+window
  * realization); AsOfJoinNativeSpec pins the equivalence and q38/q102
  * pin both against DuckDB's native ASOF JOIN.
  *
  * Why a physical operator at 100 TB: the composed form unions both
  * sides and runs `last(_, ignoreNulls)` windows — one shuffle of
  * left+right COMBINED plus per-payload-column window state. This exec
  * declares `ClusteredDistribution` on the keys and per-partition
  * (key, time) ordering, so Catalyst co-partitions the sides (exchange
  * reuse applies when inputs are already bucketed/partitioned), and the
  * merge itself is a streaming O(|L|+|R|) pass per partition holding ONE
  * buffered right row — no window buffer, no per-column state, and the
  * right side never rewrites left columns through a window projection.
  * Spark's own logical `AsOfJoin` (pandas mergeAsof, rewritten by
  * `RewriteAsOfJoin` into join+min_by aggregation) materializes every
  * (left, earlier-right) candidate pair before aggregating; this exec
  * never forms pairs.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    /** right-side columns carried to the output (the non-key/non-time
      * right attributes), nullable in the result. */
    payload: Seq[Attribute],
    /** false = backward (latest right at-or-before — the default asof);
      * true = forward (earliest right at-or-after — pandas
      * merge_asof direction='forward'). */
    forward: Boolean = false,
    /** max |left.time − right.time| for a match, in the time column's
      * UNDERLYING unit (µs for timestamp, days for date, raw for
      * integral) — pandas merge_asof `tolerance`. The nearest candidate
      * outside it yields null (all farther ones are worse). */
    tolerance: Option[Long] = None,
    /** true = nearest (pandas merge_asof direction='nearest'): the
      * smaller of |Δ| to the latest at-or-before and the earliest
      * strictly-after right row; ties prefer the backward (at-or-before)
      * candidate. Mutually exclusive with `forward`. */
    nearest: Boolean = false,
    /** false = pandas merge_asof allow_exact_matches=False: a right row
      * at EXACTLY the left time never matches — backward becomes
      * strictly-before, forward strictly-after, nearest excludes the
      * exact instant on both sides. */
    allowExactMatches: Boolean = true) extends BinaryNode {

  require(!(forward && nearest),
    "as-of direction is one of backward/forward/nearest")

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTime.dataType == rightTime.dataType,
    "as-of join key/time column types must match across sides")
  require(tolerance.isEmpty || (leftTime.dataType match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }), s"as-of tolerance needs a timestamp/date/integral time column, " +
    s"got ${leftTime.dataType} (the raw |Δ| read would be garbage)")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (`Rule[LogicalPlan]`, registered via
  * `spark.experimental.extraOptimizations`): push Filter conjuncts
  * through [[AsOfJoinPlan]]. Output rows are 1:1 with left rows, so any
  * deterministic predicate over left columns commutes with the join; a
  * predicate over the join KEYS additionally restricts the right side
  * identically (a right row whose key fails it can only match left rows
  * that were filtered out), so it is rewritten onto the right keys and
  * pushed there too. Predicates touching payload columns stay above.
  * The pushed Filters land directly in the children, where
  * `PhysicalOperation` folds them into the scan (`PushedFilters` /
  * partition pruning) at planning — AsOfJoinNativeSpec pins a filter
  * reaching BOTH parquet scans through the custom node. */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val keyMap: Map[Attribute, Expression] =
          j.leftKeys.zip(j.rightKeys).collect {
            case (l: Attribute, r) => l -> r
          }.toMap
        val leftKeyAttrs = AttributeSet(keyMap.keys)
        val rightPreds = pushable
          .filter(_.references.subsetOf(leftKeyAttrs))
          .map(_.transform {
            case a: Attribute if keyMap.contains(a) => keyMap(a)
          })
        val newLeft = Filter(pushable.reduce(And), j.left)
        val newRight =
          if (rightPreds.isEmpty) j.right
          else Filter(rightPreds.reduce(And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; registered on the session
  * via `spark.experimental.extraStrategies` (see
  * [[graft.operators.AsOfJoin.asOfNative]] / GraftSession). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, fwd, tol, near, ax) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload,
        fwd, tol, near, ax) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children are co-partitioned on the keys
  * (Catalyst inserts/reuses exchanges to satisfy the
  * `ClusteredDistribution` pair) and sorted by (keys…, time) within each
  * partition; the merge advances both iterators once, remembering only
  * the latest visible right row. Null keys group together (window
  * semantics, matching the composed realization); null times sort first,
  * so a null-time right row is visible to every left row of its key.
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    nearest: Boolean = false,
    allowExactMatches: Boolean = true) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // rows stream out in the left child's (key, time) order, one partition
  // per left partition — downstream sorts on the same keys are free
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // right side binds nullable: a miss substitutes an all-null row, so
      // the generated projection must null-check even originally
      // non-nullable right columns
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // one-row lookahead on the right side; the projections reuse their
      // buffers, so anything that survives past the next advance is copied
      var rHead: InternalRow = null
      var rHeadKey: UnsafeRow = null
      var rHeadTime: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next()
          rHeadKey = rKeyProj(rHead)
          rHeadTime = rTimeProj(rHead)
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      advanceRight()

      // tolerance needs the raw time difference, not just an ordering —
      // read the single projected field by its physical storage type
      val timeAsLong: InternalRow => Long = leftTime.dataType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
        case _ => r => r.getLong(0) // timestamp (µs) and integral longs
      }
      def withinTol(lt: InternalRow, rt: InternalRow): Boolean =
        tolerance.forall(t => !lt.isNullAt(0) && !rt.isNullAt(0) &&
          math.abs(timeAsLong(lt) - timeAsLong(rt)) <= t)
      // |Δ| for the nearest-candidate comparison; an incomparable (null)
      // time is infinitely far, so a real candidate always beats it
      def dist(lt: InternalRow, rt: InternalRow): Long =
        if (lt.isNullAt(0) || rt.isNullAt(0)) Long.MaxValue
        else math.abs(timeAsLong(lt) - timeAsLong(rt))

      var matched: InternalRow = null // latest visible right row (copied)
      var matchedKey: UnsafeRow = null
      var matchedTime: InternalRow = null
      // strict-nearest only: right rows at EXACTLY the current left time
      // are parked here so the true strictly-after head stays visible to
      // the forward candidate; they become backward candidates as soon
      // as the left time moves past them. Holds the equal-time run of
      // ONE instant of one key — bounded by the duplicate-timestamp
      // count, not the partition.
      val parked = scala.collection.mutable.Queue
        .empty[(InternalRow, UnsafeRow, InternalRow)]

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        // a match from an earlier key is dead once the left key moves on
        if (matchedKey != null && keyOrd.compare(matchedKey, lk) != 0) {
          matched = null; matchedKey = null; matchedTime = null
        }
        val lt = lTimeProj(lRow)
        if (parked.nonEmpty) {
          if (keyOrd.compare(parked.head._2, lk) != 0) parked.clear()
          else if (timeOrd.compare(parked.head._3, lt) < 0)
            while (parked.nonEmpty) { // drain in order: the last one wins
              val (r, k, t) = parked.dequeue()
              matched = r
              if (matchedKey == null) matchedKey = k
              matchedTime = t
            }
        }
        var scan = rHead != null
        while (scan) {
          val kc = keyOrd.compare(rHeadKey, lk)
          if (kc < 0) { // right key behind every remaining left row: skip
            advanceRight(); scan = rHead != null
          } else if (kc == 0) {
            val tc = timeOrd.compare(rHeadTime, lt)
            // backward/nearest: consume visible rows, remember the
            // latest (at-or-before, or strictly-before when exact
            // matches are disallowed). forward: rows that can't match
            // this or any later left row are skipped without
            // remembering (strictly before; at-or-before when strict —
            // an equal-time row can never match strictly-forward).
            val consume =
              if (forward) { if (allowExactMatches) tc < 0 else tc <= 0 }
              else { if (allowExactMatches) tc <= 0 else tc < 0 }
            if (consume) {
              if (!forward) {
                matched = rHead.copy() // each right row copied at most once
                if (matchedKey == null) matchedKey = rHeadKey.copy()
                if (tolerance.isDefined || nearest) matchedTime = rHeadTime.copy()
              }
              advanceRight(); scan = rHead != null
            } else if (nearest && !allowExactMatches && tc == 0) {
              parked.enqueue((rHead.copy(), rHeadKey.copy(), rHeadTime.copy()))
              advanceRight(); scan = rHead != null
            } else scan = false // right head is at/after this row's time
          } else scan = false
        }
        // forward match = the (unconsumed) right head itself, if same key
        val (m, mt) =
          if (forward)
            (if (rHead != null && keyOrd.compare(rHeadKey, lk) == 0) rHead else null,
              rHeadTime)
          else if (nearest) {
            // backward candidate = latest consumed at-or-before row;
            // forward candidate = the unconsumed head (strictly after,
            // same key). Equal-time rows were consumed backward, so a
            // tie in |Δ| can only be backward-vs-forward at the same
            // distance — prefer backward, the pandas tie-break.
            val fCand =
              if (rHead != null && keyOrd.compare(rHeadKey, lk) == 0) rHead
              else null
            val bOk = matched != null && withinTol(lt, matchedTime)
            val fOk = fCand != null && withinTol(lt, rHeadTime)
            if (bOk && (!fOk || dist(lt, matchedTime) <= dist(lt, rHeadTime)))
              (matched, matchedTime)
            else if (fOk) (fCand, rHeadTime)
            else (null, null)
          } else (matched, matchedTime)
        numOutputRows += 1
        resultProj(joined(lRow,
          if (m != null && withinTol(lt, mt)) m else nullRight))
      }
    }
  }
}
