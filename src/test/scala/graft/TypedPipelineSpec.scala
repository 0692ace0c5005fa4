package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.TypedPipeline

class TypedPipelineSpec extends AnyFunSuite with SparkSessionFixture {

  test("typed scoring preserves the untyped plan's results and stays narrow") {
    val docs = TypedPipeline.readDocs(spark, "/root/testdata/sf0.001")
    val scored = TypedPipeline.score(docs, SparkEntry.scorer(spark))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"typed view must not add shuffles:\n$plan")
    val rows = scored.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.prediction == 0.0 || r.prediction == 1.0))
    assert(rows.forall(r =>
      (r.prediction == 0.0 && r.label == "4") ||
      (r.prediction == 1.0 && r.label == "0")))
    assert(rows.forall(_.cleaned_data.nonEmpty))
  }
}
