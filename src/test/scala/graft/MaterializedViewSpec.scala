package graft

import org.apache.spark.sql.functions._

import graft.sources.{MaterializedView, TxParquetTable}

/** X110 — incremental materialized-view maintenance, plus the two
  * primitives it stands on: the bucket-pruned keyed point-lookup read
  * ([[TxParquetTable.snapshotForIds]]) and the txn-guarded upsert
  * (the replay double-count guard).
  */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  test("snapshotForIds returns exactly the requested keys' rows, reading only their bucket files") {
    val dir = s"${freshDir("lookup")}/t"
    val rows = (1L to 400L).map(i => (i, s"v$i", i * 10.0))
    // bucket-disjoint layout: one upsert per bucket, so every staged
    // file carries exactly one bucket's rows (each later upsert's ids
    // affect no earlier bucket's files) and a k-id lookup touches ≤ k
    // files
    val withB = rows.toDF("id", "v", "x")
      .withColumn("__b", pmod(xxhash64(col("id")), lit(8)).cast("int"))
    (0 until 8).foreach { b =>
      val slice = withB.filter(col("__b") === b).drop("__b")
      if (!slice.isEmpty) TxParquetTable.upsert(slice, dir, "id", buckets = 8)
    }
    val hit = TxParquetTable.snapshotForIds(
      spark, dir, "id", Seq(7L, 300L).toDF("id"))
    assert(hit.select("id", "v").as[(Long, String)].collect().toSet ===
      Set((7L, "v7"), (300L, "v300")))
    val total = TxParquetTable.snapshot(spark, dir).inputFiles.length
    assert(total >= 4, s"fixture should be multi-file, got $total")
    assert(hit.inputFiles.length <= 2,
      s"point lookup opened ${hit.inputFiles.length} of $total files")
    // absent ids: empty frame, full schema
    val miss = TxParquetTable.snapshotForIds(
      spark, dir, "id", Seq(99999L).toDF("id"))
    assert(miss.count() === 0 && miss.columns.toSeq === Seq("id", "v", "x"))
    // stored-domain mismatch fails loudly (the delete contract): under
    // ANSI the cast itself throws CAST_INVALID_INPUT; values that cast
    // cleanly but cannot represent hit the in-plan raise_error instead
    val e = intercept[Exception] {
      TxParquetTable.snapshotForIds(
        spark, dir, "id", Seq("not-a-long").toDF("id")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(msgs.contains("does not represent") ||
      msgs.contains("CAST_INVALID_INPUT"), msgs.take(300))
  }

  test("upsert with a recorded txn id is a no-op: the replayed-epoch double-count guard") {
    val dir = s"${freshDir("txn")}/t"
    val v1 = TxParquetTable.upsert(
      Seq((1L, 10.0)).toDF("id", "x"), dir, "id", buckets = 4,
      txn = Some(("app", 5L)))
    // same app, same epoch: discarded before any rewrite
    val v2 = TxParquetTable.upsert(
      Seq((1L, 999.0)).toDF("id", "x"), dir, "id", buckets = 4,
      txn = Some(("app", 5L)))
    assert(v2 === v1)
    assert(TxParquetTable.snapshot(spark, dir).as[(Long, Double)]
      .collect().toSeq === Seq((1L, 10.0)))
    // older epoch: also discarded
    val v3 = TxParquetTable.upsert(
      Seq((1L, 888.0)).toDF("id", "x"), dir, "id", buckets = 4,
      txn = Some(("app", 3L)))
    assert(v3 === v1)
    // NEWER epoch commits
    val v4 = TxParquetTable.upsert(
      Seq((1L, 11.0)).toDF("id", "x"), dir, "id", buckets = 4,
      txn = Some(("app", 6L)))
    assert(v4 > v1)
    assert(TxParquetTable.snapshot(spark, dir).as[(Long, Double)]
      .collect().toSeq === Seq((1L, 11.0)))
  }

  test("maintainAggView equals the full GROUP BY after every drain and never double-counts a replayed merge") {
    val dir = freshDir("mv")
    val bronze = s"$dir/bronze"
    val mv = s"$dir/mv"
    val all = (1L to 300L).map(i => (s"k${i % 7}", i))
    def expect(upTo: Int) = all.take(upTo).groupBy(_._1).map { case (k, g) =>
      (k, g.size.toLong, g.map(_._2).sum, g.map(_._2).min, g.map(_._2).max)
    }.toSet
    def view() = TxParquetTable.snapshot(spark, mv)
      .select("k", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().toSet

    TxParquetTable.append(all.take(100).toDF("k", "v"), bronze)
    val r1 = MaterializedView.maintainAggView(
      spark, bronze, mv, s"$dir/ckpt", Seq("k"), "v")
    assert(view() === expect(100) && r1.rowsIn === 100L)

    TxParquetTable.append(all.slice(100, 300).toDF("k", "v"), bronze)
    val r2 = MaterializedView.maintainAggView(
      spark, bronze, mv, s"$dir/ckpt", Seq("k"), "v")
    assert(view() === expect(300))
    assert(r2.rowsIn === 200L, s"drain 2 read ${r2.rowsIn} rows, not the increment")

    // replayed epoch (restart recovery re-delivers a committed batch):
    // the merge is recomputed but the txn pre-check discards it
    val vReplay = MaterializedView.mergeIncrement(
      all.slice(100, 300).toDF("k", "v"), mv, Seq("k"), "v",
      txn = Some(("graft-mv", 0L)))
    assert(vReplay === r2.mvVersion)
    assert(view() === expect(300), "replayed merge double-counted")

    // a drain with nothing unseen applies no epochs and commits nothing
    val r3 = MaterializedView.maintainAggView(
      spark, bronze, mv, s"$dir/ckpt", Seq("k"), "v")
    assert(r3.epochsApplied === 0L && r3.mvVersion === r2.mvVersion)
  }

  test("null group keys fail loudly (the concat_ws aliasing hazard)") {
    val dir = freshDir("nullkey")
    val e = intercept[Exception] {
      MaterializedView.mergeIncrement(
        Seq((Option.empty[String], 1L)).toDF("k", "v"),
        s"$dir/mv", Seq("k"), "v")
    }
    assert(e.getMessage.contains("null group key"))
  }
}
