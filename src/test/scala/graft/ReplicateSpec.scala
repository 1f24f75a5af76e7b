package graft

import org.apache.spark.sql.functions._

import graft.sources.{Replicate, TxParquetTable}

/** X111 — incremental commit-log replication between Tx tables. */
class ReplicateSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_repl_$tag").toString

  private def rows(dir: String) =
    TxParquetTable.snapshot(spark, dir).as[(Long, String)].collect().toSet

  test("append train replicates content-exactly; re-runs are no-ops; compactions are skipped") {
    val dir = freshDir("train")
    val (src, dst) = (s"$dir/src", s"$dir/dst")
    TxParquetTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    TxParquetTable.append(Seq((3L, "c")).toDF("id", "v"), src)
    val r1 = Replicate.replicate(spark, src, dst)
    assert(r1.appendsApplied === 2 && r1.rowsCopied === 3 && !r1.noop)
    assert(rows(dst) === rows(src))

    // layout-only commit: skipped, replica rows unchanged
    TxParquetTable.compact(spark, src, "id", targetFiles = 1)
    val r2 = Replicate.replicate(spark, src, dst)
    assert(r2.layoutSkipped === 1 && r2.noop)
    assert(rows(dst) === rows(src))

    // incremental: only the new commit ships
    TxParquetTable.append(Seq((4L, "d")).toDF("id", "v"), src)
    val r3 = Replicate.replicate(spark, src, dst)
    assert(r3.appendsApplied === 1 && r3.rowsCopied === 1)
    assert(rows(dst) === rows(src))
    assert(Replicate.replicate(spark, src, dst).noop)
  }

  test("a crash-resumed run skips already-applied versions (txn cursor), never double-copies") {
    val dir = freshDir("resume")
    val (src, dst) = (s"$dir/src", s"$dir/dst")
    TxParquetTable.append(Seq((1L, "a")).toDF("id", "v"), src)
    TxParquetTable.append(Seq((2L, "b")).toDF("id", "v"), src)
    // simulate a run that crashed after applying version 0: its commit
    // carries the cursor
    TxParquetTable.append(Seq((1L, "a")).toDF("id", "v"), dst,
      txn = Some(("graft-replica", 0L)))
    val r = Replicate.replicate(spark, src, dst)
    assert(r.appendsApplied === 1, "resume must apply only version 1")
    assert(rows(dst) === rows(src))
  }

  test("deletes replicate via CDC; missing idCol and in-place rewrites fail loudly") {
    val dir = freshDir("delete")
    val (src, dst) = (s"$dir/src", s"$dir/dst")
    TxParquetTable.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), src)
    TxParquetTable.delete(Seq(3L, 7L).toDF("id"), src, "id")
    val noKey = intercept[IllegalArgumentException] {
      Replicate.replicate(spark, src, dst)
    }
    assert(noKey.getMessage.contains("pass idCol"))
    val r = Replicate.replicate(spark, src, dst, Some("id"))
    assert(r.deletesApplied === 1)
    assert(rows(dst) === rows(src) && !rows(dst).exists(_._1 == 3L))

    // an upsert commit (in-place rewrite) refuses with the remedy named
    TxParquetTable.upsert(Seq((1L, "A")).toDF("id", "v"), src, "id")
    val e = intercept[IllegalStateException] {
      Replicate.replicate(spark, src, dst, Some("id"))
    }
    assert(e.getMessage.contains("re-running their maintenance"))
  }
}
