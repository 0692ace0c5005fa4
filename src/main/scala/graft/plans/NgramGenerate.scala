package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting the space-joined word n-grams of a token array —
  * one output row per window, streamed, without ever materializing the
  * per-document gram ARRAY that the built-in spelling
  * `explode(transform(sequence(1, size(toks)-n+1), i ->
  * concat_ws(' ', slice(toks, i, n))))` allocates per row (that
  * spelling is kept as the value-parity oracle in the spec; the DuckDB
  * oracles keep their equivalent `list_transform` form).
  *
  * This is the engine's custom-GENERATOR surface (SURVEY §2j): scalar
  * expressions and a TypedImperativeAggregate exist elsewhere; this
  * covers the exec-rule path `ExtractGenerator` → `GenerateExec`.
  * Generators run outside whole-stage codegen in Spark
  * (`GenerateExec` evaluates the generator per row), so the win is
  * allocation shape, not codegen: one reused builder per window
  * instead of an n-gram array per document.
  *
  * Semantics: fewer than n tokens (or a null array) emits no rows;
  * null tokens inside a window are concatenated like `concat_ws`
  * (skipped by the separator join) — the d8/d9/t9 inputs are
  * null-free token arrays from the tokenizer, which drops empties. */
case class NgramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngram_generate window must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_generate expects array<string>, got $t")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val len = a.numElements()
      if (len < n) Nil
      else {
        // resolve tokens once; each window re-joins a moving slice
        val toks = new Array[UTF8String](len)
        var i = 0
        while (i < len) {
          toks(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
          i += 1
        }
        val sep = NgramGenerate.Space
        (0 to len - n).iterator.map { start =>
          val window = new Array[UTF8String](n)
          System.arraycopy(toks, start, window, 0, n)
          InternalRow(UTF8String.concatWs(sep, window: _*))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramGenerate =
    copy(child = newChild)

  override def prettyName: String = "ngram_generate"
}

object NgramGenerate {
  private val Space = UTF8String.fromString(" ")

  /** Column spelling: `of(col("toks"), 5).as("gram")` inside a
    * `select` plans through `ExtractGenerator` like `explode`. */
  def of(tokens: Column, n: Int): Column =
    ColumnBridge.column(NgramGenerate(ColumnBridge.expression(tokens), n))
}
