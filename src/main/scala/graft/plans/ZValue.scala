package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeBlock, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of D long dimensions into one sort key —
  * the clustering key behind multi-column data skipping (the technique
  * popularized by Delta Lake's `OPTIMIZE ZORDER BY` and the classic
  * Morton-order literature): sorting by the interleaved key places rows
  * close in EVERY dimension into the same files, so parquet min/max
  * stats prune on all dimensions at once, where a lexicographic sort
  * only ever prunes on its leading column.
  *
  * Inputs are already-binned dimension values in `[0, 2^bits)` — the
  * caller normalizes (bin width, ntile, clamp) because only the caller
  * knows each dimension's domain; higher bits are ignored by the
  * interleave, so out-of-range input degrades locality, never
  * correctness. Bit `i` of dimension `d` lands at interleaved position
  * `i*D + d`, so `bits * D <= 63` is required (the key stays a
  * non-negative long for in-range input).
  *
  * Value-identical composable spelling (the spec's parity oracle):
  *   `aggregate(sequence(0, bits*D-1), 0L, (acc, p) ->
  *      acc | shiftleft(shiftright(dims[p % D], p div D) & 1, p))`
  * — interpreted per bit; this compiles to one primitive loop per
  * dimension inside whole-stage codegen. Null in any dimension → null
  * key (callers order nulls explicitly if they keep them).
  */
case class ZValue(children: Seq[Expression], bits: Int) extends Expression {

  require(children.nonEmpty, "z_value needs at least one dimension")
  require(bits >= 1 && bits * children.size <= 63,
    s"z_value: bits ($bits) * dims (${children.size}) must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_value expects bigint dimensions, got ${children.map(_.dataType).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val d = children.size
    var z = 0L
    var dim = 0
    while (dim < d) {
      val v = children(dim).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (i * d + dim)
        i += 1
      }
      dim += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = children.size
    val z = ctx.freshName("zv")
    val evals = children.map(_.genCode(ctx))
    val interleave = evals.zipWithIndex.map { case (c, dim) =>
      val i = ctx.freshName("i")
      // null-propagation emitted only for nullable children: a
      // non-nullable child's isNull is the literal `false`, and
      // `false = true` would not parse
      val nullProp =
        if (children(dim).nullable) s"if (${c.isNull}) { ${ev.isNull} = true; }"
        else ""
      s"""
         |${c.code}
         |$nullProp
         |if (${if (nullable) s"!${ev.isNull}" else "true"}) {
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $z |= ((${c.value} >>> $i) & 1L) << ($i * $d + $dim);
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    val nullDecl = if (nullable) s"boolean ${ev.isNull} = false;" else ""
    val src =
      s"""
         |$nullDecl
         |long $z = 0L;
         |$interleave
         |long ${ev.value} = $z;
       """.stripMargin
    val out = ev.copy(code = CodeBlock(Seq(src), Seq.empty))
    // non-nullable: never declare/assign isNull — hand parents the
    // literal instead (the Literal-expression convention)
    if (nullable) out else out.copy(isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue =
    copy(children = newChildren)

  override def prettyName: String = "z_value"
}

object ZValue {
  /** Column-level entry point: `of(16, colA, colB)` interleaves the low
    * 16 bits of each pre-binned dimension. */
  def of(bits: Int, dims: Column*): Column =
    ColumnBridge.column(ZValue(dims.map(ColumnBridge.expression), bits))
}
