package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection (Carbonell & Goldstein
  * 1998) over ONE query's bounded candidate pool: picks `k` of the
  * candidates, at each step the one maximizing
  * `lambda * sim(q, c) - mu * max_{s in selected} sim(c, s)`
  * (ties on score break to the smaller id; an empty selection
  * contributes 0 to the penalty term, so step 1 is pure relevance).
  *
  * Input: `array<struct<sim:double, vec_id:bigint, emb:array<double>>>`
  * — the query-relevance score and vector per candidate, in ANY order
  * (collect_list order is nondeterministic; selection depends only on
  * values). Output: `array<struct<sel_rank, vec_id, sim, mmr>>` with
  * `mmr` the winning score rounded to 6 dp.
  *
  * Pairwise candidate similarity is cosine rounded to 6 dp with the
  * [[VectorDotProduct]] fold order and Spark's HALF_UP rounding, so a
  * SQL oracle spelling the same arithmetic reproduces every double
  * bit-for-bit. `lambda` and `mu` are independent parameters rather
  * than `1 - lambda` precisely for that reason: `1 - 0.7` is not the
  * double `0.3`, and the oracle writes literals.
  *
  * Scale shape: the expression runs per GROUP after the candidate
  * pool is bounded (top-`poolK` ANN/brute-force stage), so the greedy
  * O(k * poolK) + O(poolK^2) pairwise work never touches more than
  * one pool at a time — the quadratic term rides the pool bound, not
  * the corpus. */
case class MmrSelect(child: Expression, k: Int, lambda: Double, mu: Double)
    extends UnaryExpression {

  override def dataType: DataType = MmrSelect.OutSchema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _),
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mmr_select expects array<struct<sim:double, id:bigint, " +
        s"emb:array<double>>>, got $t")
  }

  override protected def nullSafeEval(arr: Any): Any =
    MmrHelper.select(arr.asInstanceOf[ArrayData], k, lambda, mu)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MmrHelper.select($a, $k, $lambda, $mu);")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)

  override def prettyName: String = "mmr_select"
}

object MmrSelect {
  val OutSchema: DataType = ArrayType(StructType(Seq(
    StructField("sel_rank", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))))

  def of(cands: Column, k: Int, lambda: Double, mu: Double): Column =
    ColumnBridge.column(
      MmrSelect(ColumnBridge.expression(cands), k, lambda, mu))
}

/** Static helper (Janino-callable). */
object MmrHelper {
  def select(arr: ArrayData, k: Int, lambda: Double, mu: Double): ArrayData = {
    val n = arr.numElements()
    val sims = new Array[Double](n)
    val ids = new Array[Long](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      sims(i) = row.getDouble(0)
      ids(i) = row.getLong(1)
      embs(i) = row.getArray(2).toDoubleArray()
      i += 1
    }
    val used = new Array[Boolean](n)
    // true max over the selected set — may be NEGATIVE (a candidate
    // anti-correlated with every pick gets a bonus, per the MMR
    // formula); only step 1 has no penalty term at all
    val maxSel = new Array[Double](n)
    val steps = math.min(k, n)
    val out = new Array[Any](steps)
    var step = 0
    while (step < steps) {
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val score =
            if (step == 0) lambda * sims(j)
            else lambda * sims(j) - mu * maxSel(j)
          if (best < 0 || score > bestScore ||
            (score == bestScore && ids(j) < ids(best))) {
            best = j; bestScore = score
          }
        }
        j += 1
      }
      used(best) = true
      out(step) = new GenericInternalRow(Array[Any](
        (step + 1).toLong, ids(best), sims(best), round6(bestScore)))
      j = 0
      while (j < n) {
        if (!used(j)) {
          val s = cos6(embs(j), embs(best))
          if (step == 0 || s > maxSel(j)) maxSel(j) = s
        }
        j += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine rounded to 6 dp — the [[VectorDotProduct]] left-to-right
    * fold per accumulator, then Spark round() semantics. */
  def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Half-away-from-zero on the BINARY double (what DuckDB's
    * round(DOUBLE, 6) does), NOT Spark round()'s decimal-string
    * HALF_UP: MMR scores are 6-dp-valued doubles scaled by 0.7/0.3,
    * which lands on 7th-decimal half points constantly — the one
    * place the two rounding readings actually diverge (raw cosines
    * never sit on a representational half point, which is why the
    * s-family's round() parity holds). `scaled + 0.5` is exact for
    * |scaled| <= 2^20, which covers any |v| <= 1 score. */
  private def round6(v: Double): Double = {
    val scaled = v * 1e6
    val r = if (scaled >= 0) math.floor(scaled + 0.5)
      else math.ceil(scaled - 0.5)
    r / 1e6
  }
}
