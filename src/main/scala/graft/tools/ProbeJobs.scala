package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Job-level attribution for one bench query (r18 optimization round):
  * runs the named queries once (after a warmup iteration, optional) with
  * a listener recording every Spark job's wall time and call site, then
  * prints jobs sorted by duration plus the gap between total query wall
  * time and the sum of job times (driver-side work: planning, log I/O,
  * commit bookkeeping). Args: sfDir warmups q1 q2 ...
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warmups = args.lift(1).map(_.toInt).getOrElse(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.cache(); df.count()
      } catch { case _: Throwable => () }
    }
    case class Job(id: Int, callSite: String, desc: String,
        start: Long, var end: Long = -1L, var tasks: Int = 0)
    val jobs = new scala.collection.concurrent.TrieMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the first engine frame in the stage call stack names the job
        // far better than the thread-pool call site Spark records for
        // AQE/broadcast subjobs
        val fromStack = e.stageInfos.lastOption.flatMap(si =>
          si.details.split('\n').find(l => l.contains("graft.")))
          .map(_.trim)
        val cs = fromStack
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .filter(_.nonEmpty))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, cs, d, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (0 until warmups).foreach(_ => fn(spark, sfDir).count())
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val done = jobs.values.toSeq.filter(_.end > 0).sortBy(j => -(j.end - j.start))
      val jobSum = done.map(j => (j.end - j.start) / 1e3).sum
      println(f"== $n wall=$wall%.2fs jobs=${done.size} jobSum=$jobSum%.2fs driverGap=${wall - jobSum}%.2fs")
      done.take(40).foreach { j =>
        println(f"  ${(j.end - j.start) / 1e3}%7.3fs tasks=${j.tasks}%4d  ${j.callSite}  ${j.desc.take(80)}")
      }
      // histogram by call site for the long tail
      val bySite = done.groupBy(_.callSite).map { case (cs, js) =>
        (cs, js.size, js.map(j => (j.end - j.start) / 1e3).sum)
      }.toSeq.sortBy(-_._3)
      println("  -- by call site --")
      bySite.take(25).foreach { case (cs, cnt, s) =>
        println(f"  $s%7.3fs n=$cnt%4d  $cs")
      }
    }
    spark.stop()
  }
}
