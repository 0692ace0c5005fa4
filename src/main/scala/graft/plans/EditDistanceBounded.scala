package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein distance via Myers' bit-parallel algorithm
  * (Myers, JACM 1999; blocked form after Hyyrö 2003): the distance if
  * it is <= `threshold`, else -1 — the exact contract of the built-in
  * `levenshtein(l, r, threshold)`, which is kept as this expression's
  * value-parity oracle (and the spelling the DuckDB oracle checks).
  *
  * Why: the built-in threshold variant runs a banded dynamic program —
  * O(len * threshold) cells with per-cell branching. At d6's
  * maxDist=100 over ~300-char documents that band covers most of the
  * DP matrix, and the q-gram lower bounds that would prune candidate
  * pairs cannot fire at these text lengths (a trigram bound certifies
  * at most len/3 distance). Myers instead encodes a whole DP column in
  * bit-vectors — O(ceil(min_len/64) * max_len) word ops, ~40x fewer
  * operations per pair — and an O(1) per-column early exit keeps the
  * far-apart pairs cheap. Distance semantics are identical: unit-cost
  * insert/delete/substitute over code points.
  *
  * Null handling matches the built-in: null if either input is null. */
case class EditDistanceBounded(left: Expression, right: Expression,
                               threshold: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if threshold >= 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"edit_distance_bounded threshold must be >= 0, got $threshold")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"edit_distance_bounded expects (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceHelper.bounded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.EditDistanceHelper.bounded($a, $b, $threshold);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistanceBounded =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "edit_distance_bounded"
}

object EditDistanceBounded {
  def of(a: Column, b: Column, threshold: Int): Column =
    ColumnBridge.column(EditDistanceBounded(
      ColumnBridge.expression(a), ColumnBridge.expression(b), threshold))
}

/** Static helper (Janino-callable). Blocked Myers bit-parallel
  * Levenshtein with common prefix/suffix stripping, a length-difference
  * early exit, and a per-column best-possible-score cutoff. */
object EditDistanceHelper {

  def bounded(a: UTF8String, b: UTF8String, k: Int): Int = {
    // code points, matching the built-in levenshtein's unit of edit
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    var lo = 0
    var aHi = s.length
    var bHi = t.length
    // common prefix/suffix never changes the distance
    while (lo < aHi && lo < bHi && s(lo) == t(lo)) lo += 1
    while (aHi > lo && bHi > lo && s(aHi - 1) == t(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val m = aHi - lo
    val n = bHi - lo
    if (m == 0) return if (n <= k) n else -1
    if (n == 0) return if (m <= k) m else -1
    if (math.abs(m - n) > k) return -1
    // pattern = shorter remainder (fewer blocks)
    val d =
      if (m <= n) myers(s, lo, m, t, lo, n, k)
      else myers(t, lo, n, s, lo, m, k)
    if (d >= 0 && d <= k) d else -1
  }

  /** Myers/Hyyrö blocked bit-parallel global edit distance of
    * pattern p[pOff, pOff+m) vs text t[tOff, tOff+n), m <= n. Returns
    * -1 as soon as the final distance provably exceeds `k` (the score
    * can drop by at most 1 per remaining text column). */
  private def myers(p: Array[Int], pOff: Int, m: Int,
                    t: Array[Int], tOff: Int, n: Int, k: Int): Int = {
    val w = (m + 63) >>> 6
    // per-block pattern-character membership masks
    val peq = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    while (i < m) {
      val c = Integer.valueOf(p(pOff + i))
      var masks = peq.get(c)
      if (masks == null) { masks = new Array[Long](w); peq.put(c, masks) }
      masks(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val zero = new Array[Long](w)
    val pv = Array.fill(w)(-1L)
    val mv = new Array[Long](w)
    // bottom-row bit of each block: 63 for full blocks, (m-1)%64 for the last
    val lastBit = 1L << ((m - 1) & 63)
    var score = m
    var j = 0
    while (j < n) {
      var eqA = peq.get(Integer.valueOf(t(tOff + j)))
      if (eqA == null) eqA = zero
      var hin = 1 // global boundary D(0, j) = j: +1 enters the top row
      var b = 0
      while (b < w) {
        val pv0 = pv(b)
        val mv0 = mv(b)
        var eq = eqA(b)
        val xv = eq | mv0
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv0) + pv0) ^ pv0) | eq
        var ph = mv0 | ~(xh | pv0)
        var mh = pv0 & xh
        val hb = if (b == w - 1) lastBit else 0x8000000000000000L
        val hout = (if ((ph & hb) != 0L) 1 else 0) -
          (if ((mh & hb) != 0L) 1 else 0)
        ph <<= 1
        mh <<= 1
        if (hin > 0) ph |= 1L
        else if (hin < 0) mh |= 1L
        pv(b) = mh | ~(xv | ph)
        mv(b) = ph & xv
        hin = hout
        b += 1
      }
      score += hin
      // each remaining column lowers the bottom-row score by at most 1
      if (score - (n - 1 - j) > k) return -1
      j += 1
    }
    score
  }
}
