package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher repetition-signal NUMERATORS of one document in a single
  * pass over its token array: returns
  * `struct<tok_chars, c2, c3, c4, d5..d10>` where `cN` is the
  * occurrence char mass of the most frequent N-gram (ties on count
  * break to the larger gram char mass) and `dN` the position-union
  * char coverage of duplicated N-grams — the exact semantics of
  * `CorpusOps.repetitionSignals`, which documents them.
  *
  * Why an expression: every one of these statistics is a function of
  * ONE document, yet the compositional spelling (explode each n-gram
  * family, count per (doc, n, gram), join coverage positions back)
  * shuffles ~180 rows per document across seven stages to compute
  * per-row state that fits in a small hash map. Evaluated here, the
  * whole query collapses to one narrow projection — no exchange at
  * any scale, the same collapse `CleanTokens` applied to the
  * tokenizer chain.
  *
  * Gram identity is the space-joined token string (what the explode
  * spelling and the DuckDB oracle both compare), char length is
  * `UTF8String.numChars` (Spark's `length`), and the per-window char
  * mass is maintained by a rolling add/subtract. Tokens must be
  * non-null (the tokenizer contract). */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got $t")
  }

  override protected def nullSafeEval(toks: Any): Any =
    RepStatsHelper.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.RepStatsHelper.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(
    StructField("tok_chars", LongType, nullable = false) +:
      Seq(2, 3, 4).map(n => StructField(s"c$n", LongType, nullable = false)) ++:
      (5 to 10).map(n => StructField(s"d$n", LongType, nullable = false)))

  def of(toks: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(toks)))
}

/** Static helper (Janino-callable). */
object RepStatsHelper {
  def compute(toks: ArrayData): InternalRow = {
    val L = toks.numElements()
    val strs = new Array[String](L)
    val lens = new Array[Int](L)
    var tokChars = 0L
    var t = 0
    while (t < L) {
      val s = toks.getUTF8String(t)
      strs(t) = s.toString
      lens(t) = s.numChars()
      tokChars += lens(t)
      t += 1
    }
    val out = new Array[Any](10)
    out(0) = tokChars
    // top family (n = 2..4): most frequent n-gram's cnt * gchars,
    // ties on cnt to the larger gchars
    var n = 2
    while (n <= 4) {
      var best = 0L
      if (L >= n) {
        // value = cnt * 2^32 + gchars: lexicographic (cnt, gchars)
        // max as one long compare (cnt <= L, gchars < 2^31)
        val m = new java.util.HashMap[String, Long]()
        var wchars = 0L
        var j = 0
        while (j < n) { wchars += lens(j); j += 1 }
        var i = 0
        while (i + n <= L) {
          if (i > 0) { wchars += lens(i + n - 1) - lens(i - 1) }
          val key = joinWindow(strs, i, n)
          val prev = m.get(key)
          // same key => same gchars, so the packed low bits never vary
          // within an entry and +2^32 increments the count alone
          m.put(key, if (prev == 0L) (1L << 32) | wchars
            else prev + (1L << 32))
          i += 1
        }
        val it = m.values().iterator()
        while (it.hasNext) { val v = it.next(); if (v > best) best = v }
        best = (best >>> 32) * (best & 0xffffffffL)
      }
      out(n - 1) = best
      n += 1
    }
    // dup family (n = 5..10): union coverage of duplicated n-grams
    n = 5
    while (n <= 10) {
      var dchars = 0L
      if (L >= n) {
        // first occurrence start kept per gram; -1 once marked dup
        val m = new java.util.HashMap[String, Integer]()
        val covered = new Array[Boolean](L)
        var i = 0
        while (i + n <= L) {
          val key = joinWindow(strs, i, n)
          val first = m.get(key)
          if (first == null) m.put(key, Integer.valueOf(i))
          else {
            if (first.intValue() >= 0) {
              mark(covered, first.intValue(), n)
              m.put(key, Integer.valueOf(-1))
            }
            mark(covered, i, n)
          }
          i += 1
        }
        var p = 0
        while (p < L) { if (covered(p)) dchars += lens(p); p += 1 }
      }
      out(n - 2 + 1) = dchars // slots 4..9
      n += 1
    }
    new GenericInternalRow(out)
  }

  private def joinWindow(strs: Array[String], start: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(strs(start + k))
      k += 1
    }
    sb.toString
  }

  private def mark(covered: Array[Boolean], start: Int, n: Int): Unit = {
    var k = 0
    while (k < n) { covered(start + k) = true; k += 1 }
  }
}
