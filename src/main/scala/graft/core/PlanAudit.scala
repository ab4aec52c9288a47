package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Physical-plan anti-pattern audit as a LIBRARY surface — the check
  * PlanAuditSpec runs over every registered gate query, exposed so a
  * user of the engine can gate their OWN queries the same way (in a
  * CI test, or as a pre-submit guard in front of a 100 TB run).
  *
  * The patterns are the three scale-killers a declarative plan can
  * silently pick up:
  *  - `CartesianProduct` — an unkeyed join exploded to |A|·|B|;
  *  - `BroadcastNestedLoopJoin` — a non-equi join whose cost is
  *    |big| · |broadcast| rows; intended only when one side is a
  *    genuine dim/1-row frame (the allowlist carries the why);
  *  - `Exchange SinglePartition` — the whole dataset funneled through
  *    ONE task (global window/sort without a partition key).
  *
  * `audit` returns the findings instead of throwing, so callers
  * decide severity; `require` is the assert-style wrapper. An empty
  * `allowed` set means "no tolerated patterns". */
object PlanAudit {

  val Patterns: Seq[String] = Seq(
    "CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")

  final case class Finding(pattern: String)

  /** Scan `df`'s formatted physical plan for the patterns, minus the
    * explicitly tolerated ones. Planning only — nothing executes. */
  def audit(df: DataFrame, allowed: Set[String] = Set.empty): Seq[Finding] = {
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    Patterns.filterNot(allowed)
      .filter(plan.contains).map(Finding)
  }

  /** Gate-SCHEMA rule: no `DecimalType` column (top-level or nested)
    * in a query's FINAL output. Wide exact integers are fine inside a
    * plan (GramAgg's spill buffer, the decimal-price silver path), but
    * a decimal that reaches the published result hash-canonicalizes
    * differently across engines/hashers even when every value is
    * bit-identical (the round-8 q224/q229/q232 pathology) — route it
    * through a canonical integer VARCHAR or BIGINT instead. Planning
    * only; nothing executes. */
  def auditSchema(df: DataFrame): Seq[Finding] = {
    def dec(t: DataType): Boolean = t match {
      case _: DecimalType     => true
      case a: ArrayType       => dec(a.elementType)
      case m: MapType         => dec(m.keyType) || dec(m.valueType)
      case s: StructType      => s.fields.exists(f => dec(f.dataType))
      case _                  => false
    }
    df.schema.fields.toSeq.collect {
      case f if dec(f.dataType) =>
        Finding(s"DecimalType in output column '${f.name}'")
    }
  }

  /** Throw `IllegalArgumentException` listing any non-allowed pattern
    * in `df`'s plan — the pre-submit guard form. */
  def require(df: DataFrame, allowed: Set[String] = Set.empty): Unit = {
    val bad = audit(df, allowed)
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"plan contains scale anti-patterns: ${bad.map(_.pattern).mkString(", ")}")
  }
}
