package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ over a document's DISTINCT characters of the quantized unigram
  * entropy term `c · round(ln(c / n), 6)::DECIMAL(18,6)` — the whole
  * per-document body of t11_char_entropy in ONE compiled pass over
  * the text's UTF-8 bytes (n = `length(text)`, c = the character's
  * occurrence count). Returns DECIMAL(38,6) — a widened superset of
  * the retired census aggregation's sum type (Spark's sum over
  * DECIMAL(18,6) yields DECIMAL(28,6)); values are identical after
  * the downstream double cast, and 38,6 is headroom, not parity.
  *
  * Why an expression: the census spelling exploded one row PER
  * CHARACTER through two aggregates and a window (a Generate and two
  * full exchanges); the r17 higher-order-function fold removed the
  * exchanges but ArrayAggregate is CodegenFallback — per-character
  * interpreted eval measured SLOWER than the explode (3.1 s vs
  * 2.1 s at sf0.1). This is the [[RepetitionStats]] /
  * [[CleanTokens]] collapse: per-document state is a tiny
  * character-count map, so the whole query is one narrow projection
  * with no exchange at any scale and a compiled per-byte loop.
  *
  * Exactness contract (CharEntropySpec pins it against the census
  * spelling): character identity is the UTF-8 byte slice under
  * UTF8String's lead-byte stepping — IDENTICAL to what
  * `substring(text, i, 1)` yields per position and to what
  * `length(text)` counts, malformed bytes degrading the same way
  * ([[Utf8Scan.cpLen]]); `round` replicates Spark's Round-on-double
  * (`BigDecimal.valueOf(d).setScale(6, HALF_UP).doubleValue()`), the
  * double→DECIMAL(18,6) cast replicates Cast's
  * `valueOf(r).setScale(6, HALF_UP)`, and the long·decimal multiply
  * and decimal sum are exact integer-scaled arithmetic in both
  * engines. */
case class CharEntropyTermSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 6)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_term_sum expects string, got $t")
  }

  override protected def nullSafeEval(text: Any): Any =
    CharEntropyHelper.termSum(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharEntropyHelper.termSum($a);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyTermSum =
    copy(child = newChild)

  override def prettyName: String = "char_entropy_term_sum"
}

object CharEntropyTermSum {
  def of(text: Column): Column =
    ColumnBridge.column(CharEntropyTermSum(ColumnBridge.expression(text)))
}

/** Static helper (Janino-callable). */
object CharEntropyHelper {
  def termSum(text: UTF8String): Decimal = {
    val bytes = text.getBytes
    // count occurrences per character; key = the code point's bytes
    // packed big-endian into one int (lead-byte ranges make packed
    // values of different lengths disjoint: 1-byte ≤ 0xFF, 2-byte in
    // [0xC080, 0xDFBF], 3-byte in [0xE08080, 0xEFBFBF], 4-byte
    // wraps negative — never colliding across lengths)
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var off = 0
    var n = 0L
    while (off < bytes.length) {
      val len = Utf8Scan.cpLen(bytes(off))
      val end = math.min(off + len, bytes.length)
      var key = 0
      var k = off
      while (k < end) { key = (key << 8) | (bytes(k) & 0xFF); k += 1 }
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
      n += 1L
      off = end
    }
    var sum = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      // Spark Round(double, 6): valueOf → setScale(6, HALF_UP) → double
      val d = math.log(c.toDouble / n.toDouble)
      val r = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // Spark Cast(double → DECIMAL(18,6)): valueOf → setScale HALF_UP
      val t = java.math.BigDecimal.valueOf(r)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      sum = sum.add(t.multiply(java.math.BigDecimal.valueOf(c)))
    }
    Decimal(sum.setScale(6), 38, 6)
  }
}
