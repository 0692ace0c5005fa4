package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.plans.VectorDotProduct

/** Session-extension registration for the engine's custom Catalyst
  * machinery, so SQL users get the functions too:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions) ...      // builder path
  * or
  *   spark.sql.extensions=graft.GraftExtensions      // config path
  * or
  *   GraftExtensions.register(spark)                 // live session
  *
  * Currently: `vec_dot(array<float|double>, array<float|double>)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vecDot)
}

object GraftExtensions {

  private val vecDot = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDotProduct].getName, "vec_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "vec_dot takes exactly 2 arguments")
      VectorDotProduct(children.head, children(1))
    })

  /** Idempotent registration into an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(vecDot._1, vecDot._2, vecDot._3)
}
