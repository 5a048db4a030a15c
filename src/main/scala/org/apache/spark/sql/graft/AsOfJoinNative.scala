// Lives under org.apache.spark.sql because Dataset.ofRows (the
// LogicalPlan → DataFrame bridge) is private[sql] — the standard
// pattern for third-party native operators (see QuantizedDot.scala
// for the expression-level equivalent).
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** WHOLE-OPERATOR native as-of join: a custom `LogicalPlan` node, a
  * `SparkStrategy`, and a `SparkPlan` that merge-joins two streams
  * sorted by (key, ts) — the extension tier above a custom expression
  * (QuantizedDot) for semantics no single expression can carry.
  *
  * Semantics are identical to [[graft.operators.AsOfJoin.asofJoin]]
  * (for each left row, the right row with the greatest
  * `rightTs <= leftTs` on the same key; `prior_*` columns, null when
  * nothing precedes; right side unique per (key, ts) for determinism)
  * — and `AsOfJoinNativeSpec` pins the two formulations equal on
  * random inputs, while the x_asof_native query pins this one against
  * the DuckDB ASOF JOIN oracle.
  *
  * Physical shape: `requiredChildDistribution` clusters both children
  * by key and `requiredChildOrdering` sorts them by (key, ts), so
  * EnsureRequirements plants exactly the exchanges/sorts a
  * SortMergeJoin would get; the exec then consumes both sorted
  * streams in ONE forward pass per partition holding a single
  * remembered right row — no window state, no union fan-in, the same
  * O(1)-state linear scan as the declarative formulation but without
  * materializing the unioned stream.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: AttributeReference,
    leftTs: AttributeReference,
    rightKey: AttributeReference,
    rightTs: AttributeReference,
    payload: Seq[AttributeReference],
    priorAttrs: Seq[AttributeReference])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ priorAttrs
  // priorAttrs are MINTED here, not consumed from a child — without
  // this the analyzer counts them as dangling references (they appear
  // in the node's expression fields) and fails MISSING_ATTRIBUTES
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(priorAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.payload, j.priorAttrs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: AttributeReference,
    leftTs: AttributeReference,
    rightKey: AttributeReference,
    rightTs: AttributeReference,
    payload: Seq[AttributeReference],
    priorAttrs: Seq[AttributeReference])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ priorAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(priorAttrs)

  // same contract as ShuffledJoin: cluster both children on the key;
  // EnsureRequirements co-partitions them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) :: Nil)

  // output order: still (key, ts) within each partition
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  // the merge is 1:1 with the left stream and zipPartitions preserves
  // its partitioning — advertise it, or every downstream key operation
  // re-shuffles what the children just exchanged
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], left.output)
    val lTsB = BindReferences.bindReference(leftTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], left.output)
    val rKeyB = BindReferences.bindReference(rightKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], right.output)
    val rTsB = BindReferences.bindReference(rightTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val payloadExprs = (rightTs +: payload)
      .map(a => BindReferences.bindReference(a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], right.output))
    val nPrior = priorAttrs.length
    val outSchema = output
    val leftOut = left.output
    val priorOut = priorAttrs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs)
      val outProj = UnsafeProjection.create(outSchema, leftOut ++ priorOut)
      val joined = new JoinedRow
      val nullPrior = new GenericInternalRow(nPrior)
      // null keys order FIRST and equal each other — the same
      // asc-nulls-first total order requiredChildOrdering asks for, so
      // a null-key left row matches null-key rights exactly like the
      // declarative window formulation (which partitions nulls
      // together); only null-TS rows are excluded (no event time =
      // never "the most recent at or before t").
      def cmpKeys(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else keyOrd.compare(a, b)
      // buffer-backed values (UTF8String, unsafe array/map/struct)
      // alias the row buffer their iterator reuses; anything
      // REMEMBERED across rows must be deep-copied or it silently
      // mutates under us. Primitives/Decimal/etc. are immutable.
      def copyKey(k: Any): Any = k match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case r: InternalRow => r.copy()
        case o => o
      }
      var rRow: InternalRow = null
      var rKey: Any = null
      var rTs: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val c = rIter.next()
          val t = rTsB.eval(c)
          if (t != null) { rRow = c; rKey = rKeyB.eval(c); rTs = t }
        }
      }
      advanceRight()
      var priorKey: Any = null
      var priorSet = false
      var prior: InternalRow = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lt != null) {
          // consume every right row at or before (lk, lt); the last one
          // with a matching key is the as-of match
          var continue = rRow != null
          while (continue) {
            val ck = cmpKeys(rKey, lk)
            if (ck < 0 || (ck == 0 && tsOrd.compare(rTs, lt) <= 0)) {
              if (ck == 0) {
                prior = payloadProj(rRow).copy()
                priorKey = copyKey(lk)
                priorSet = true
              }
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
        }
        val p = if (priorSet && cmpKeys(priorKey, lk) == 0) prior else nullPrior
        outProj(joined(lRow, p))
      }
    }
  }
}

object AsOfJoinNative {

  /** DataFrame-level API mirroring
    * [[graft.operators.AsOfJoin.asofJoin]]: emits every left column
    * plus `prior_<ts>` and `prior_<c>` for each payload column.
    * Registers [[AsOfJoinStrategy]] into the session's experimental
    * strategies (idempotent) so no session rebuild is needed.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    require(!rightCols.contains(ts),
      s"asofJoinNative: rightCols must not repeat the ts column '$ts'")
    // same fail-fast guard as the declarative AsOfJoin: the emitted
    // prior_* names must be free on the left or the output schema
    // silently carries duplicate column names
    val emitted = (ts +: rightCols).map("prior_" + _).toSet
    val lClash = left.columns.filter(emitted)
    require(lClash.isEmpty,
      s"asofJoinNative: left columns collide with emitted names: ${lClash.mkString(", ")}")
    val spark = left.sparkSession
    // synchronized: the check-then-prepend is otherwise racy on
    // concurrent first calls (double registration is harmless to
    // planning — the first match wins — but keeps the list clean)
    AsOfJoinNative.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          AsOfJoinStrategy +: spark.experimental.extraStrategies
      }
    }
    // Re-alias the right side through a fresh Project so a self-join
    // (both sides scanning the same table) cannot carry duplicate
    // expression ids into one binary node.
    val rFresh = right.select(right.columns.map(c => right.col(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): AttributeReference =
      plan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalArgumentException(
        s"asofJoinNative: no column '$name' on the $side side"))
    val lk = attr(lPlan, key, "left")
    val lt = attr(lPlan, ts, "left")
    val rk = attr(rPlan, key, "right")
    val rt = attr(rPlan, ts, "right")
    require(lk.dataType == rk.dataType, "key types differ between sides")
    require(lt.dataType == rt.dataType, "ts types differ between sides")
    val pay = rightCols.map(c => attr(rPlan, c, "right"))
    val priors = (rt +: pay).map(a =>
      AttributeReference(s"prior_${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt, pay, priors)
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], node)
  }
}
