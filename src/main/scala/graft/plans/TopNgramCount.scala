package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Occurrence count of a token array's MOST FREQUENT n-gram — the
  * t9 `max(cnt)` over the per-document bigram census, computed
  * IN-ROW (round 17): gram identity is the space-joined token
  * string, exactly what [[NgramGenerate]] emits and the DuckDB
  * oracle compares, and the per-document state is one small
  * count map. NULL for arrays shorter than `n` (the explode
  * spelling's left join produced NULL there — no gram rows).
  *
  * Why an expression: the census spelling exploded one row per
  * gram through a (doc, gram) count aggregate, a doc-keyed max/sum
  * aggregate, and a join back to the document row — two full
  * exchanges and a join for a per-row statistic whose denominator
  * is just `size(toks) − n + 1` (the [[RepetitionStats]] /
  * [[CharEntropyTermSum]] collapse; TopBigramSpec pins value
  * equality against the retired spelling). */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_ngram_count expects array<string>, got $t")
  }

  override protected def nullSafeEval(toks: Any): Any = {
    val a = toks.asInstanceOf[ArrayData]
    if (a.numElements() < n) null
    else TopNgramCountHelper.compute(a, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |if ($a.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.TopNgramCountHelper.compute($a, $n);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TopNgramCount =
    copy(child = newChild)

  override def prettyName: String = "top_ngram_count"
}

object TopNgramCount {
  def of(tokens: Column, n: Int): Column =
    ColumnBridge.column(TopNgramCount(ColumnBridge.expression(tokens), n))
}

/** Static helper (Janino-callable). Space-joined String keys — the
  * [[RepStatsHelper]] gram-identity precedent (String equality is
  * code-point equality, matching UTF8String byte equality and the
  * DuckDB `||` join). */
object TopNgramCountHelper {
  def compute(toks: ArrayData, n: Int): Long = {
    val L = toks.numElements()
    val strs = new Array[String](L)
    var i = 0
    while (i < L) {
      // NULL array elements are skipped concat_ws-style, exactly as
      // [[NgramGenerate]] renders them (r17 advice: the previous
      // StringBuilder.append(null) spelled them as the literal
      // "null", silently diverging for any caller whose token arrays
      // can carry nulls — unreachable from t9's cleanTokens, but the
      // two gram identities must agree by definition, not by luck)
      val u = toks.getUTF8String(i)
      strs(i) = if (u == null) null else u.toString
      i += 1
    }
    val m = new java.util.HashMap[String, Array[Long]]()
    var max = 0L
    var start = 0
    while (start + n <= L) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      var appended = 0
      while (k < n) {
        val s = strs(start + k)
        if (s != null) {
          if (appended > 0) sb.append(' ')
          sb.append(s)
          appended += 1
        }
        k += 1
      }
      val key = sb.toString
      var slot = m.get(key)
      if (slot == null) { slot = Array(0L); m.put(key, slot) }
      slot(0) += 1L
      if (slot(0) > max) max = slot(0)
      start += 1
    }
    max
  }
}
