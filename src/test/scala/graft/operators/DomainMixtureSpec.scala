package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the DoReMi-style domain-mixture table: a proper softmax over
  * non-negative excess losses, covering every domain, with the weight
  * order exactly the excess order (exp is monotone and the denominator
  * is shared — a violation means the softmax mixed up its rows). */
class DomainMixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mixture covers every domain, weights sum to 1, order follows excess") {
    val out = Registry.byName("text_domain_mixture").run(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val nDomains = Tables(spark, dir, "documents")
      .select(countDistinct("source")).collect()(0).getLong(0)
    assert(out.length.toLong == nDomains)
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-4,
      s"weights sum to ${out.map(_._5).sum}")
    out.foreach { case (src, ref, own, ex, w) =>
      assert(ex >= 0.0, s"$src excess $ex negative")
      // own model fits its own domain at least as well as the generalist
      assert(own <= ref + 1e-6, s"$src own_loss $own above ref_loss $ref")
      assert(w > 0.0, s"$src weight $w not positive")
    }
    // softmax monotonicity: sort by excess (desc) must equal sort by
    // weight (desc), modulo exact ties collapsing on the 6-decimal grid
    val byExcess = out.sortBy(r => (-r._4, r._1)).map(_._1).toSeq
    val byWeight = out.sortBy(r => (-r._5, r._1)).map(_._1).toSeq
    assert(byExcess == byWeight,
      s"weight order diverges from excess order:\n$byExcess\n$byWeight")
  }
}
