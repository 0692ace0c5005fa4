package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Generator emitting the block-combination band keys of a 64-bit
  * signature — one (band_id, key_bits) row per
  * (blocks−maxDist)-subset of the hash's bit blocks (the
  * Manku/Jain/Sarma WWW'07 §3 table scheme behind
  * [[graft.multimodal.MultimodalOps.hammingNearDupPairs]]).
  *
  * Why an expression and not the `explode(array(struct…))` spelling:
  * the declarative form materializes C(blocks, maxDist) struct columns
  * — 210 at blocks=10/d=6 — and the generated `doConsume` for that
  * projection grows past the JVM's 64 KB method limit, knocking the
  * whole stage out of codegen (measured: Janino
  * "Code grows beyond 64 KB" at B≥9 in the round-13 hm probe, silent
  * interpreted fallback). A Generator runs per-row inside
  * `GenerateExec` regardless, so this loop costs O(subsets) ALU ops
  * with zero per-row array allocation and leaves the surrounding
  * stage's codegen intact at every geometry.
  *
  * Deterministic layout (identical to the declarative spelling it
  * replaces): 64 bits split into `blocks` runs, first `64 % blocks`
  * runs one bit wider; subset si is the si-th
  * `(blocks−maxDist)`-combination in lexicographic order; key bits
  * concatenated high-to-low in subset order (total width
  * 64·(blocks−d)/blocks < 64 always). */
case class HammingBandKeys(child: Expression, maxDist: Int, blocks: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(maxDist >= 0 && maxDist < 64, "maxDist in [0, 63]")
  require(blocks > maxDist && blocks <= 64,
    s"blocks must be in (maxDist, 64], got $blocks")

  override def elementSchema: StructType = StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hamming_band_keys expects bigint, got $t")
  }

  // per-instance tables, built once at planning (not per row)
  @transient private lazy val widths: Array[Int] = {
    val base = 64 / blocks
    val extra = 64 % blocks
    Array.tabulate(blocks)(b => base + (if (b < extra) 1 else 0))
  }
  @transient private lazy val offsets: Array[Int] =
    widths.scanLeft(0)(_ + _).dropRight(1)
  @transient private lazy val masks: Array[Long] =
    widths.map(w => if (w == 64) -1L else (1L << w) - 1L)
  @transient private lazy val subsets: Array[Array[Int]] =
    (0 until blocks).combinations(blocks - maxDist)
      .map(_.toArray).toArray

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = child.eval(input)
    if (h == null) Nil
    else {
      val hv = h.asInstanceOf[Long]
      val n = subsets.length
      (0 until n).iterator.map { si =>
        val s = subsets(si)
        var v = 0L
        var i = 0
        while (i < s.length) {
          val b = s(i)
          v = (v << widths(b)) | ((hv >>> offsets(b)) & masks(b))
          i += 1
        }
        InternalRow(si, v)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HammingBandKeys =
    copy(child = newChild)

  override def prettyName: String = "hamming_band_keys"
}

object HammingBandKeys {
  /** Column spelling: `of(col("h"), 6, 8)` inside a `select` plans
    * through `ExtractGenerator` into `GenerateExec`, expanding to
    * columns `b` (subset id) and `v` (key bits). */
  def of(hash: Column, maxDist: Int, blocks: Int): Column =
    ColumnBridge.column(
      HammingBandKeys(ColumnBridge.expression(hash), maxDist, blocks))
}
