package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{DetHash, Vec}

/** Property-style tests: scalacheck generators driven deterministically
  * (fixed seeds) so runs are reproducible in CI. */
class PropertySpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("h60Local is non-negative, bounded, and equals the column version") {
    import spark.implicits._
    val ws = samples(word, 40).distinct
    val local = ws.map(DetHash.h60Local)
    assert(local.forall(h => h >= 0L && h < (1L << 60)))
    val viaSpark = ws.toDF("s").select(DetHash.h60(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSpark == local)
  }

  test("native dot equals the plain Scala sum for arbitrary float vectors") {
    import spark.implicits._
    val vec = Gen.listOfN(16, Gen.chooseNum(-100.0f, 100.0f))
    val pairs = samples(Gen.zip(vec, vec), 25)
    val df = pairs.toDF("a", "b")
    val got = df.select(Vec.dotNative(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"dot mismatch: $g vs $w") }
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val lists = samples(Gen.listOfN(5, word), 20)
      .filter(ws => ws.distinct.length == ws.length)
    assert(lists.nonEmpty)
    val texts = lists.flatMap(ws => Seq(ws.mkString(" "), ws.reverse.mkString(" ")))
    val fps = texts.toDF("text")
      .select(aggregate(split(col("text"), " "), lit(0L),
        (acc, w) => (acc * 31L + DetHash.h56(concat(lit("fp:"), w)) % 1000000007L)
          % 1000000007L))
      .collect().map(_.getLong(0))
    fps.grouped(2).foreach { case Array(f, r) =>
      assert(f != r, "order change should change the fingerprint")
    }
  }
}
