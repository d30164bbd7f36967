package graft

import org.apache.spark.sql.functions._

/** a13z (VERDICT r7 §next-round #6): the IVFPQ probe over the Z-ORDERED
  * FLAT code layout must be bit-identical to the dir-per-list probe (a13)
  * while pruning through parquet footer stats instead of Hive partition
  * dirs — the layout that holds up at nlists where dir-per-list
  * degenerates into tiny files.
  */
class ZLayoutSpec extends SparkSpec {

  test("a13z results are bit-identical to a13 (same index, new layout)") {
    val a = graft.ann.Pq.a13IvfPqTopK(spark, Sf).collect().toSeq
    val z = graft.ann.Pq.a13zIvfPqTopK(spark, Sf).collect().toSeq
    assert(z == a, s"a13z diverged: ${z.size} rows vs ${a.size}")
  }

  test("a13z pushes the probed-list IN predicate to the parquet scan") {
    val plan = graft.ann.Pq.a13zIvfPqTopK(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(list_id"),
      s"probe IN-list must reach the scan as a pushed filter:\n${plan.take(2000)}")
  }

  test("z-layout file stats skip files outside the probed list set") {
    // force the artifact to exist, then locate it the way the probe does
    graft.ann.Pq.a13zIvfPqTopK(spark, Sf).count()
    val base = spark.conf.get("spark.sql.warehouse.dir").replaceFirst("^file:", "")
    val dir = new java.io.File(base).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_ivfpqz_"))
      .maxBy(_.lastModified).getPath
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, s"need multiple files to demonstrate skipping ($dir)")
    // per-file min/max on list_id (what the parquet footer stores): a probe
    // of ONE list must overlap strictly fewer files than the total — the
    // z-order bounded each file's list_id box
    val boxes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("list_id")).cast("long"), max(col("list_id")).cast("long"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val probeList = boxes.head._1 // a list id that exists
    val overlapping = boxes.count { case (lo, hi) => lo <= probeList && probeList <= hi }
    assert(overlapping < boxes.length,
      s"list_id=$probeList overlaps all ${boxes.length} files — no stat pruning possible")
  }
}
