package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-document gram-hash emission for the ExactSubstr span
  * family's generators: resolves the token array to UTF-8 byte arrays
  * ONCE, then streams one 16-byte MD5 fingerprint per window position
  * with a single reused digest — never materializing the per-document
  * gram ARRAY that the built-in spelling
  * `posexplode(transform(sequence(0, len-W), i ->
  * unhex(md5(concat_ws(' ', slice(toks, i+1, W))))))` allocates
  * before the Generate can stream it (a 10⁶-token document builds
  * ~30 MB (one window) to ~90 MB (the d33 sweep's Σ_W) in ONE row
  * buffer under that spelling — the r14 verdict's bounded-row-size
  * item). Value parity is byte-exact: MD5 over the UTF-8 bytes of the
  * window's tokens joined by single spaces, null tokens skipped like
  * `concat_ws` (the tokenizer's arrays are null-free; the skip is for
  * general inputs).
  */
private[plans] object GramHashEmit {
  private val Space: Byte = ' '

  /** Token array → per-token UTF-8 byte arrays (null-preserving). */
  def tokenBytes(a: ArrayData): Array[Array[Byte]] = {
    val len = a.numElements()
    val out = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      out(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    out
  }

  /** MD5 of tokens[start, start+w) joined by single spaces with nulls
    * skipped — `md.digest()` resets the instance for the next call. */
  def gramMd5(md: MessageDigest, toks: Array[Array[Byte]],
              start: Int, w: Int): Array[Byte] = {
    var appended = false
    var i = 0
    while (i < w) {
      val t = toks(start + i)
      if (t != null) {
        if (appended) md.update(Space)
        md.update(t)
        appended = true
      }
      i += 1
    }
    md.digest()
  }
}

/** Generator emitting the (pos, gh) gram table of a token array —
  * 0-based window start and the 16-byte MD5 fingerprint of the
  * space-joined window — streamed row-by-row (see [[GramHashEmit]]).
  * Replaces the materializing built-in spelling inside
  * [[graft.operators.DedupOps.exactSubstringSpans]]'s shared gram
  * table (d27/d31/d32 and the census probe). Fewer than `window`
  * tokens (or a null array) emits no rows. */
case class GramHashGenerate(child: Expression, window: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(window >= 1, s"gram_hash_generate window must be >= 1, got $window")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gh", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hash_generate expects array<string>, got $t")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val len = a.numElements()
      if (len < window) Nil
      else {
        val toks = GramHashEmit.tokenBytes(a)
        val md = MessageDigest.getInstance("MD5")
        (0 to len - window).iterator.map { start =>
          InternalRow(start, GramHashEmit.gramMd5(md, toks, start, window))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashGenerate =
    copy(child = newChild)

  override def prettyName: String = "gram_hash_generate"
}

object GramHashGenerate {
  /** Column spelling: `of(col("toks"), 20).as(Seq("pos", "gh"))`. */
  def of(tokens: Column, window: Int): Column =
    ColumnBridge.column(GramHashGenerate(ColumnBridge.expression(tokens), window))
}

/** Multi-window variant for the d33 window sweep: emits (w, pos, gh)
  * for EVERY window size in one generator over one token resolution —
  * the sweep's one-text-pass contract without the
  * `flatten(array(perWindow))` buffer that materialized Σ_W
  * (len−W+1) structs per document before exploding. Windows shorter
  * than the document emit their full start range; longer ones emit
  * nothing (matching the built-in per-window `when(size >= w, ...)
  * otherwise(empty)` guards). */
case class GramHashSweepGenerate(child: Expression, windows: Seq[Int])
    extends UnaryExpression with Generator with CodegenFallback {

  require(windows.nonEmpty && windows.forall(_ >= 1),
    s"gram_hash_sweep windows must be >= 1, got $windows")
  require(windows.distinct.size == windows.size,
    "duplicate window sizes would double-count the census")

  override def elementSchema: StructType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("gh", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hash_sweep expects array<string>, got $t")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val len = a.numElements()
      val live = windows.filter(_ <= len)
      if (live.isEmpty) Nil
      else {
        val toks = GramHashEmit.tokenBytes(a)
        val md = MessageDigest.getInstance("MD5")
        live.iterator.flatMap { w =>
          (0 to len - w).iterator.map { start =>
            InternalRow(w, start, GramHashEmit.gramMd5(md, toks, start, w))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashSweepGenerate =
    copy(child = newChild)

  override def prettyName: String = "gram_hash_sweep"
}

object GramHashSweepGenerate {
  /** Column spelling: `of(col("toks"), Seq(10, 20, 40)).as(Seq("w",
    * "pos", "gh"))`. */
  def of(tokens: Column, windows: Seq[Int]): Column =
    ColumnBridge.column(
      GramHashSweepGenerate(ColumnBridge.expression(tokens), windows))
}
