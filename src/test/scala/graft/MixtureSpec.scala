package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Contract of [[Mixture.temperatureWeights]] (q148 covers cross-engine
  * parity): weights are a proper distribution, alpha flattens toward
  * uniform, alpha = 1 is the identity mixture, and low-resource strata
  * are boosted above 1. */
class MixtureSpec extends AnyFunSuite with SparkFixture {

  private def fixture = {
    import spark.implicits._
    // 3 strata with mass 100 / 400 / 500
    (Seq.fill(10)(("lo", 10L)) ++ Seq.fill(20)(("mid", 20L)) ++
      Seq.fill(25)(("hi", 20L))).toDF("stratum", "sz")
  }

  test("weights sum to 1 and allocations to ~budget") {
    val out = Mixture.temperatureWeights(fixture, "stratum", "sz",
      alpha = 0.5, budget = 10000L).collect()
    val wSum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum $wSum")
    val alloc = out.map(_.getAs[Long]("alloc")).sum
    assert(math.abs(alloc - 10000L) <= out.length, s"alloc sum $alloc")
  }

  test("alpha = 1 reproduces natural shares; lower alpha moves toward uniform") {
    val nat = Mixture.temperatureWeights(fixture, "stratum", "sz", alpha = 1.0)
      .collect().map(r => r.getAs[String]("stratum") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(nat("lo") - 0.1) < 1e-9)
    assert(math.abs(nat("hi") - 0.5) < 1e-9)
    val flat = Mixture.temperatureWeights(fixture, "stratum", "sz", alpha = 0.5)
      .collect().map(r => r.getAs[String]("stratum") -> r.getAs[Double]("weight")).toMap
    // flattening: lo gains, hi loses, order preserved
    assert(flat("lo") > nat("lo"))
    assert(flat("hi") < nat("hi"))
    assert(flat("lo") < flat("mid") && flat("mid") < flat("hi"))
  }

  test("boost marks up-sampled strata (>1) and down-sampled ones (<1)") {
    val out = Mixture.temperatureWeights(fixture, "stratum", "sz", alpha = 0.5)
      .collect().map(r => r.getAs[String]("stratum") -> r.getAs[Double]("boost")).toMap
    assert(out("lo") > 1.0, s"low-resource stratum must be boosted: $out")
    assert(out("hi") < 1.0, s"dominant stratum must shrink: $out")
  }

  test("fraction budget equals the absolute budget it denotes") {
    val total = 1000L // fixture mass
    val abs = Mixture.temperatureWeights(fixture, "stratum", "sz",
        alpha = 0.5, budget = total * 3 / 10)
      .orderBy("stratum").collect().toSeq
    val frac = Mixture.temperatureWeightsFraction(fixture, "stratum", "sz",
        alpha = 0.5, num = 3, den = 10)
      .orderBy("stratum").collect().toSeq
    assert(abs == frac)
  }

  test("result is independent of input partitioning (in-order normalizer fold)") {
    val a = Mixture.temperatureWeights(fixture.repartition(1), "stratum", "sz")
      .orderBy("stratum").collect().toSeq
    val b = Mixture.temperatureWeights(fixture.repartition(7), "stratum", "sz")
      .orderBy("stratum").collect().toSeq
    assert(a == b)
  }

  test("negativeSampleTable: every draw lands where the replicated md5 " +
      "walk says; partition-invariant") {
    import spark.implicits._
    // f = [a->9, b->4, c->1] -> w = [3, 2, 1], cum ladder [3, 5, 6]
    val toks = Seq.fill(9)("a") ++ Seq.fill(4)("b") ++ Seq.fill(1)("c")
    val df = toks.toDF("tok")
    val got = Mixture.negativeSampleTable(df, "tok", 50, "sp")
      .collect().map(r => r.getAs[Long]("draw") -> r.getAs[String]("tok"))
      .toMap
    assert(got.size == 50)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0L until 50L).foreach { j =>
      val r = (BigInt(md5hex(s"sp:$j").substring(0, 12), 16) % 6).toLong + 1
      val exp = if (r <= 3) "a" else if (r <= 5) "b" else "c"
      assert(got(j) == exp, s"draw $j: r=$r got ${got(j)} want $exp")
    }
    val again = Mixture.negativeSampleTable(df.repartition(5), "tok",
        50, "sp")
      .collect().map(r => r.getAs[Long]("draw") -> r.getAs[String]("tok"))
      .toMap
    assert(again == got)
  }
}
