package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd batch hash for shingle arrays: every element of an
  * array<string> → the integer value of the first 8 hex chars of its
  * md5 (the engine's cross-system 32-bit hash; see
  * [[graft.operators.DedupOps.md5Hash32]] for the built-in spelling
  * this must stay value-identical to, and OracleSql.hash32 for the
  * DuckDB twin).
  *
  * Why: the built-in spelling wraps `conv(substr(md5(s),1,8),16,10)`
  * in a `transform` lambda — interpreted per element with UTF8String
  * hex round-trips. This expression runs one primitive loop per row,
  * hashing element bytes directly and assembling the 32-bit prefix
  * from the first 4 digest bytes (== first 8 hex chars). MinHash
  * signatures sit on every document at corpus scale; this is their
  * inner loop. Null elements map to null (matching transform). */
case class Md5Hash32Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash32_array expects array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash32Helper.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5Hash32Helper.hashAll($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Array =
    copy(child = newChild)

  override def prettyName: String = "md5_hash32_array"
}

object Md5Hash32Array {
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Hash32Array(ColumnBridge.expression(c)))
}

/** Static helper (Janino-callable). A thread-local digest avoids
  * per-element allocation. */
object Md5Hash32Helper {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val digestOut = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def hashAll(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = digest.get()
    val d = digestOut.get() // reused output buffer (r8: was per-element)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        md.digest(d, 0, 16)
        // first 8 hex chars == first 4 digest bytes, big-endian unsigned
        out(i) = java.lang.Long.valueOf(
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
