package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.rag.Chunking

class PipelineSpec extends SparkSpec {

  test("P2: balanced sampling moves the token mix toward equal shares") {
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_words"))
    val before = docs.groupBy("lang").agg(sum("n_words").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Pipeline.p2BalancedSample(spark, Sf).collect()
    assert(sampled.nonEmpty)
    val after = sampled.groupBy(_.getString(1))
      .map { case (l, rows) => l -> rows.map(_.getLong(2)).sum }
    // every language survives, nothing is upsampled, and the dominant
    // language's share shrinks (the whole point of proportional capping)
    assert(after.keySet == before.keySet)
    after.foreach { case (l, t) => assert(t <= before(l)) }
    def share(m: Map[String, Long], l: String): Double =
      m(l).toDouble / m.values.sum
    val dominant = before.maxBy(_._2)._1
    assert(share(after.toMap, dominant) <= share(before, dominant) + 1e-9,
      "dominant language share must not grow")
    // determinism: the hash-threshold sample is identical across runs
    val again = Pipeline.p2BalancedSample(spark, Sf).collect()
    assert(sampled.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("B17: chunking covers every word with stride/overlap invariants") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Chunking.r17Chunking(spark, Sf).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc must chunk")
    byDoc.foreach { case (d, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // chunk ids are dense from 0; starts follow the stride
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { c =>
        assert(c.getLong(2) == c.getLong(1) * Chunking.Stride)
        assert(c.getLong(3) >= 1 && c.getLong(3) <= Chunking.ChunkWords)
      }
      // coverage: last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == docs(d),
        s"doc $d: chunks must cover through the last word")
      // overlap: consecutive chunks share words whenever the earlier one
      // extends past the next start (stride < chunk width)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) + a.getLong(3) >= b.getLong(2),
            s"doc $d: gap between chunks ${a.getLong(1)} and ${b.getLong(1)}")
        case _ =>
      }
    }
  }
}
