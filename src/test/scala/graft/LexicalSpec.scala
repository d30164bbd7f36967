package graft

import org.apache.spark.sql.functions._

import graft.rag.Lexical
import graft.dedup.Dedup

class LexicalSpec extends SparkSpec {

  test("B14: BM25 returns ranked, positively-scored, deterministic top-k") {
    val r = Lexical.r14Bm25TopK(spark, Sf).collect()
    assert(r.nonEmpty, "BM25 must surface candidates on the test corpus")
    val byQuery = r.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to ranked.length))
      // scores non-increasing in rank, ties broken by doc_id ascending
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getLong(2), b.getLong(2))
          assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)))
        case _ =>
      }
      assert(ranked.forall(_.getLong(2) > 0L), "BM25 e6 scores are positive")
    }
    val again = Lexical.r14Bm25TopK(spark, Sf).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("B15: RRF fusion bounds scores and draws from both rankers") {
    val fused = Lexical.r15HybridRrf(spark, Sf)
    val rows = fused.collect()
    assert(rows.nonEmpty)
    // each contribution is <= 1e6/61; two rankers cap the fused score
    val cap = 2 * (1000000L / (Lexical.RrfK + 1))
    rows.foreach { f =>
      assert(f.getLong(2) > 0L && f.getLong(2) <= cap)
      assert(f.getInt(3) >= 1 && f.getInt(3) <= Lexical.TopK)
    }
    // a doc ranked #1 by BOTH rankers would hit ratio6e(1,61)*2; assert the
    // fused top beats any single-ranker-only maximum => fusion really sums
    val maxFused = rows.map(_.getLong(2)).max
    assert(maxFused > 1000000L / (Lexical.RrfK + 1),
      "top fused score must exceed the single-ranker maximum")
  }

  test("B19: PRF expansion keeps rank contract and reuses pass-1 scoring") {
    val prf = Lexical.r19PrfSearch(spark, Sf).collect()
    assert(prf.nonEmpty)
    prf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to ranked.length))
      // expanded term set is a superset of pass 1's, so every doc's score
      // can only grow or stay equal vs its r14 score
      assert(ranked.forall(_.getLong(2) > 0L))
    }
    val r14 = Lexical.r14Bm25TopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    prf.foreach { r =>
      r14.get((r.getLong(0), r.getLong(1))).foreach { s14 =>
        assert(r.getLong(2) >= s14, "PRF adds terms; scores cannot shrink")
      }
    }
    val again = Lexical.r19PrfSearch(spark, Sf).collect()
    assert(prf.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("C10: decontamination flags eval-overlapping training docs only") {
    val r = Dedup.d10Decontamination(spark, Sf).collect()
    r.foreach { row =>
      val (train, eval) = (row.getLong(0), row.getLong(1))
      assert(train % Dedup.D10EvalMod != 0, "train side excludes eval docs")
      assert(eval % Dedup.D10EvalMod == 0, "eval side only eval docs")
      assert(row.getLong(2) >= Dedup.D10MinShared)
      assert(row.getLong(2) <= row.getLong(3), "shared <= total grams")
      assert(row.getLong(4) >= 0L && row.getLong(4) <= 1000000L)
    }
    // the sf0.001 corpus contains near-dup groups spanning the eval split,
    // so at least one contaminated pair must surface
    assert(r.nonEmpty, "expected at least one contaminated pair")
  }
}
