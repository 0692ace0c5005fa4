package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, DetParams}

/** Config-parameterized helpers behind the d16/m16 sweeps must agree
  * with the fixed-config originals they generalize — a drifted
  * spelling would silently change d2/d2b/d7/d10/... semantics. */
class SweepConfigSpec extends AnyFunSuite with SparkSessionFixture {

  test("bandKeysCfg at (MinhashBands, MinhashRows) == bandKeys") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val sig = DedupOps.withMinhashSignature(docs, "doc_id", "text")
    val a = sig.select(col("doc_id"),
      array(DedupOps.bandKeys(col("sig")): _*).as("k"))
    val b = sig.select(col("doc_id"),
      array(DedupOps.bandKeysCfg(col("sig"),
        DetParams.MinhashBands, DetParams.MinhashRows): _*).as("k"))
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)
  }

  test("every sweep config tiles the whole signature") {
    Seq((2, 6), (3, 4), (4, 3), (6, 2)).foreach { case (b, r) =>
      assert(b * r == DetParams.MinhashK,
        s"($b x $r) does not tile the ${DetParams.MinhashK}-slot signature")
    }
  }

  test("m16 subsample folds nest and the eval fold is disjoint") {
    val f = QuerySupport.lrFitFeaturesSplit(spark, "/root/testdata/sf0.001")
      .select(col("r"), col("sub")).collect()
    val evalN = f.count(_.getLong(0) == 0)
    val t25 = f.filter(x => x.getLong(0) != 0 && x.getLong(1) < 25).toSet
    val t50 = f.filter(x => x.getLong(0) != 0 && x.getLong(1) < 50).toSet
    assert(evalN > 0 && t25.nonEmpty)
    assert(t25.subsetOf(t50), "25% fold must nest inside 50%")
    // residues are deterministic: a second read yields the same split
    val g = QuerySupport.lrFitFeaturesSplit(spark, "/root/testdata/sf0.001")
      .select(col("r"), col("sub")).collect()
    assert(f.map(_.toSeq).toSeq == g.map(_.toSeq).toSeq)
  }
}
