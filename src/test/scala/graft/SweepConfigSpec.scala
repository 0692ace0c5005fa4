package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, DetParams}

/** Config-parameterized helpers behind the d16/m16 sweeps, pinned
  * against an INDEPENDENT plain-Scala re-derivation (not against each
  * other — `bandKeys` delegates to `bandKeysCfg`, so engine-vs-engine
  * comparison would be vacuous). A drifted spelling in the shared
  * builder now fails against the hand-rolled md5/minhash math below.
  */
class SweepConfigSpec extends AnyFunSuite with SparkSessionFixture {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** Hand-rolled signature: distinct char trigrams of lower(text),
    * sig_i = min over trigrams of (h32(t)*a_i + b_i) mod P. */
  private def refSig(text: String): Seq[Long] = {
    val tgs = text.toLowerCase.sliding(3).toSeq.distinct
    (0 until DetParams.MinhashK).map { i =>
      tgs.map(t =>
        (h32(t) * DetParams.minhashA(i) + DetParams.minhashB(i))
          % DetParams.MinhashP).min
    }
  }

  private def refKeys(sig: Seq[Long], bands: Int, rows: Int): Seq[String] =
    (0 until bands).map { b =>
      val slots = (0 until rows).map(r => sig(b * rows + r))
      md5hex((b.toString +: slots.map(_.toString)).mkString("_"))
    }

  test("bandKeysCfg matches an independent md5/minhash re-derivation") {
    import spark.implicits._
    val text = "spark graft sweep pin"
    val base = Seq((1L, text)).toDF("doc_id", "text")
    val sig = DedupOps.withMinhashSignature(base, "doc_id", "text")
    Seq((2, 6), (3, 4), (4, 3), (6, 2)).foreach { case (b, r) =>
      val got = sig.select(
          array(DedupOps.bandKeysCfg(col("sig"), b, r): _*).as("k"))
        .collect()(0).getSeq[String](0)
      assert(got == refKeys(refSig(text), b, r),
        s"($b x $r) band keys drifted from the reference spelling")
    }
  }

  test("every sweep config tiles the whole signature") {
    Seq((2, 6), (3, 4), (4, 3), (6, 2)).foreach { case (b, r) =>
      assert(b * r == DetParams.MinhashK,
        s"($b x $r) does not tile the ${DetParams.MinhashK}-slot signature")
    }
  }

  test("m16 folds are deterministic, non-degenerate, and strictly grow") {
    val f = QuerySupport.lrFitFeaturesSplit(spark, "/root/testdata/sf0.001")
      .select(col("r"), col("sub")).collect()
    val evalN = f.count(_.getLong(0) == 0)
    def trainN(frac: Int) =
      f.count(x => x.getLong(0) != 0 && x.getLong(1) < frac)
    assert(evalN > 0, "eval fold empty")
    assert(trainN(25) > 0, "25% fold empty")
    // strict growth is a real data property (sub residues spread),
    // not a tautology of the predicate
    assert(trainN(25) < trainN(50) && trainN(50) < trainN(100),
      s"folds did not strictly grow: ${trainN(25)}/${trainN(50)}/${trainN(100)}")
    val g = QuerySupport.lrFitFeaturesSplit(spark, "/root/testdata/sf0.001")
      .select(col("r"), col("sub")).collect()
    assert(f.map(_.toSeq).toSeq == g.map(_.toSeq).toSeq,
      "split residues not deterministic across reads")
  }
}
