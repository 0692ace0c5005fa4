package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of common elements of two SORTED-ascending, distinct,
  * null-free `array<bigint>` columns — a two-pointer merge scan.
  *
  * Why: `size(array_intersect(a, b))` builds a hash set from one side
  * per ROW — in d4's verify join that is one set build + n probes per
  * candidate PAIR (the same document's array is rebuilt for each of
  * its pairs), plus the materialized intersection array that `size`
  * immediately throws away. With the persisted trigram table sorted
  * once per document (`array_sort` in the projection; every other
  * consumer — MinHash minima, `size` — is order-invariant), the merge
  * scan is allocation-free O(|a|+|b|) inside whole-stage codegen.
  *
  * Value parity: for sorted distinct null-free inputs this equals
  * `size(array_intersect(a, b))` (the spelling the d4 DuckDB oracle
  * uses via `len(list_intersect(..))`), which its spec asserts on real
  * corpus data. Inputs violating the precondition (unsorted /
  * duplicated elements) are NOT detected — callers own the sort.
  * Null handling matches the built-in chain: null if either input
  * array is null. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectHelper.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedIntersectHelper.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Static helper (Janino-callable): allocation-free two-pointer merge. */
object SortedIntersectHelper {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
