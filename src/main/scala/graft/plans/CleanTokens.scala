package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass spelling of the reference's clean+tokenize chain
  * (`consumer_local.py:46-48`):
  *
  *   `re.sub(r"[^A-Za-z\n ]|(http\S+)|(www.\S+)", "", s).split()`
  *
  * i.e. exactly `filter(split(regexp_replace(s, CleanRegex, ""),
  * "\\s+"), length > 0)` — the [[graft.functions.TextOps]] built-in
  * chain — but as ONE allocation-light byte scan instead of a
  * backtracking `java.util.regex` pass plus a second regex split.
  * The caller still applies `lower(trim(...))` first (built-ins), so
  * this expression only owns the regex-delete + whitespace-split +
  * empty-drop stages and must equal them byte-for-byte on ANY input.
  *
  * Why: a round-8 throughput decomposition showed the m5 scoring
  * chain is tokenization-BOUND — the regex chain ran ~32k docs/s on
  * 32 cores (~1k docs/s/core) at sf0.1 scale-up, an order under
  * BASELINE.md's ≥10⁴ docs/s/core engine target, while the LR scoring
  * UDF added nothing measurable. Every t/d/m-family query pays this
  * scan; the fused pass removes the regex engine from the hottest
  * loop in the engine.
  *
  * Semantics reproduced exactly (spec-pinned against the regex chain
  * on the real corpus plus adversarial strings):
  *  - alternation order: the single-char delete can never match where
  *    a URL alternative starts (URLs start with letters), so at each
  *    position at most one alternative applies;
  *  - `http\S+`: literal "http" then >=1 non-whitespace
  *    (Java `\S` = not [ \t\n\x0B\f\r], ASCII-only), greedy to the
  *    next whitespace — a bare trailing "http" stays;
  *  - `www.\S+`: literal "www", then `.` = any ONE code point except
  *    the five Java line terminators (\n \r U+0085 U+2028 U+2029 —
  *    note it DOES match a space), then >=1 non-whitespace, greedy;
  *  - deletions JOIN fragments ("ca:t" -> token "cat"); only kept
  *    ' '/'\n' (and string ends) break tokens;
  *  - all other non-[A-Za-z\n ] code points delete (byte-wise: every
  *    non-ASCII lead/continuation byte individually, which deletes
  *    exactly the same spans);
  *  - tokens are the maximal letter runs of the cleaned string
  *    (post-clean the string holds only letters, ' ', '\n', so the
  *    `\s+` split with empty-drop degenerates to that).
  */
case class CleanTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"clean_tokens expects string, got $t")
  }

  override protected def nullSafeEval(in: Any): Any =
    CleanTokensHelper.eval(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.CleanTokensHelper.eval($in);")

  override protected def withNewChildInternal(newChild: Expression): CleanTokens =
    copy(child = newChild)

  override def prettyName: String = "clean_tokens"
}

object CleanTokens {
  def of(c: Column): Column =
    ColumnBridge.column(CleanTokens(ColumnBridge.expression(c)))
}

/** Static helper (Janino-callable): the byte scanner. */
object CleanTokensHelper {

  // Java regex \s (ASCII-only): [ \t\n\x0B\f\r]
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** End (exclusive) of the `http\S+` match starting at `i`, or -1. */
  private def httpEnd(bytes: Array[Byte], i: Int, n: Int): Int = {
    if (i + 4 >= n) return -1
    if (bytes(i) != 'h' || bytes(i + 1) != 't' || bytes(i + 2) != 't' ||
        bytes(i + 3) != 'p') return -1
    if (isWs(bytes(i + 4))) return -1 // \S+ needs >= 1
    var j = i + 5
    while (j < n && !isWs(bytes(j))) j += 1
    j
  }

  /** UTF-8 code point (value, byteLen) at `i`; malformed or truncated
    * lead bytes degrade to (byte, 1) — regex behavior on invalid
    * UTF-8 is not a contract anyone holds (UTF8String.toString would
    * have replaced the sequence before the regex even saw it).
    * Lengths come from the shared [[Utf8Scan]] table. */
  private def cpAt(bytes: Array[Byte], i: Int, n: Int): Long = {
    val b0 = bytes(i) & 0xFF
    val len = Utf8Scan.cpLen(bytes(i))
    if (len == 1 || i + len > n) (b0.toLong << 32) | 1L
    else len match {
      case 2 =>
        ((((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)).toLong << 32) | 2L
      case 3 =>
        ((((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F)).toLong << 32) | 3L
      case _ =>
        ((((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)).toLong << 32) | 4L
    }
  }

  // the five code points Java's default-mode `.` refuses
  private def isLineTerm(cp: Int): Boolean =
    cp == 0x0A || cp == 0x0D || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  /** End (exclusive) of the `www.\S+` match starting at `i`, or -1. */
  private def wwwEnd(bytes: Array[Byte], i: Int, n: Int): Int = {
    if (i + 3 >= n) return -1
    if (bytes(i) != 'w' || bytes(i + 1) != 'w' || bytes(i + 2) != 'w') return -1
    val cl = cpAt(bytes, i + 3, n)
    val cp = (cl >>> 32).toInt
    val len = (cl & 0xFFFFFFFFL).toInt
    if (isLineTerm(cp)) return -1 // `.` refuses line terminators
    val s = i + 3 + len // \S+ start
    if (s >= n || isWs(bytes(s))) return -1 // \S+ needs >= 1
    var j = s + 1
    while (j < n && !isWs(bytes(j))) j += 1
    j
  }

  def eval(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    val buf = new Array[Byte](n)
    var bl = 0
    def flush(): Unit = if (bl > 0) {
      out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, bl)))
      bl = 0
    }
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == 'h') {
        val e = httpEnd(bytes, i, n)
        if (e >= 0) i = e // URL deleted; token buffer continues across
        else { buf(bl) = b; bl += 1; i += 1 }
      } else if (b == 'w') {
        val e = wwwEnd(bytes, i, n)
        if (e >= 0) i = e
        else { buf(bl) = b; bl += 1; i += 1 }
      } else if (isLetter(b)) { buf(bl) = b; bl += 1; i += 1 }
      else if (b == 0x20 || b == 0x0A) { flush(); i += 1 } // kept separators
      else i += 1 // any other byte: deleted (joins, never separates)
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}
