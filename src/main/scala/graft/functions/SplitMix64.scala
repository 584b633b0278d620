package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** splitmix64 of a 64-bit key as a native Catalyst expression — the
  * deterministic scrambler behind hash-based dataset routing (train/val/
  * test splits, stratified sampling, shard assignment). A keyed split must
  * be (a) stable across runs and engines, (b) uncorrelated with the key's
  * natural order; `pmod(key, 100)` fails (b) badly for sequential ids,
  * while rand() fails (a). splitmix64 is the standard statelessly-seeded
  * mixer (Steele et al., "Fast splittable pseudorandom number
  * generators", OOPSLA 2014) and — like [[SimHash64]]'s token hash — is
  * deliberately portable: wrapping-Long arithmetic is mod-2^64, so the
  * DuckDB oracle reproduces it exactly with HUGEINT arithmetic.
  *
  * Native expression (not a UDF) with a static-kernel `doGenCode`, so
  * routing stays inside whole-stage codegen at the scan.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"splitmix64 requires bigint, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SplitMix64.kernel(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SplitMix64.kernel($a);")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
  override def prettyName: String = "splitmix64"
}

object SplitMix64 {
  import org.apache.spark.sql.graftshim.ColumnShim

  def kernel(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column API: `splitmix64(keyCol)`. */
  def splitmix64(key: Column): Column =
    ColumnShim.column(SplitMix64(ColumnShim.expression(key)))
}
