package graft

import graft.sources.{Manifest, TxParquetTable}

/** X112 — snapshot-consistent multi-table reads through the manifest. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_man_$tag").toString

  test("readers through the manifest never see a torn multi-table state; replayed publish is a no-op") {
    val dir = freshDir("torn")
    val (a, b, man) = (s"$dir/a", s"$dir/b", s"$dir/man")
    val paths = Map("a" -> a, "b" -> b)
    // epoch 0: both lanes land, published
    val va0 = TxParquetTable.append(Seq((1L, "a0")).toDF("id", "v"), a)
    val vb0 = TxParquetTable.append(Seq((2L, "b0")).toDF("id", "v"), b)
    val vPub = Manifest.publish(spark, man, 0L, Map("a" -> va0, "b" -> vb0))
    // epoch 1 "crash": lane a lands, lane b and the publish do not
    TxParquetTable.append(Seq((3L, "a1")).toDF("id", "v"), a)
    val (e, frames) = Manifest.snapshotAll(spark, man, paths)
    assert(e === 0L)
    assert(frames("a").as[(Long, String)].collect().toSet === Set((1L, "a0")),
      "the unpublished epoch-1 append must be invisible through the manifest")
    assert(frames("b").count() === 1L)
    // replayed publish: log-level no-op
    assert(Manifest.publish(spark, man, 0L,
      Map("a" -> va0, "b" -> vb0)) === vPub)
    // epoch 1 completes and publishes; the cut moves forward
    val vb1 = TxParquetTable.append(Seq((4L, "b1")).toDF("id", "v"), b)
    Manifest.publish(spark, man, 1L,
      Map("a" -> TxParquetTable.latestVersion(a), "b" -> vb1))
    val (e2, frames2) = Manifest.snapshotAll(spark, man, paths)
    assert(e2 === 1L && frames2("a").count() === 2L && frames2("b").count() === 2L)
    // cross-table time travel: the epoch-0 cut is still resolvable
    val (_, cut0) = Manifest.snapshotAll(spark, man, paths, epoch = Some(0L))
    assert(cut0("a").count() === 1L && cut0("b").count() === 1L)
  }

  test("resolve fails loudly on an empty manifest, an unpublished epoch, and a lane missing from the cut") {
    val dir = freshDir("loud")
    val man = s"$dir/man"
    val a = s"$dir/a"
    val e1 = intercept[IllegalArgumentException] {
      Manifest.resolve(spark, man)
    }
    assert(e1.getMessage.contains("publish an epoch first"))
    val va = TxParquetTable.append(Seq((1L, "x")).toDF("id", "v"), a)
    Manifest.publish(spark, man, 7L, Map("a" -> va))
    val e2 = intercept[IllegalArgumentException] {
      Manifest.resolve(spark, man, epoch = Some(3L))
    }
    assert(e2.getMessage.contains("not published"))
    val e3 = intercept[IllegalArgumentException] {
      Manifest.snapshotAll(spark, man, Map("a" -> a, "ghost" -> s"$dir/ghost"))
    }
    assert(e3.getMessage.contains("not in manifest epoch"))
  }
}
