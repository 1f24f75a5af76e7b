package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Dev probe for the r11 item-5 lint: find every partition-less logical
  * Window in the registered queries and check the tiny-frame contract —
  * every root-to-leaf path under the window must cross a reducing node
  * (Aggregate / limit / local relation), so the single-partition sort
  * only ever sees an already-collapsed frame.
  */
object ProbeWindows {

  def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation |
        _: OneRowRelation | _: Range => true
    case other => other.children.nonEmpty && other.children.forall(reduced)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val globals = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
        globals.foreach { w =>
          if (!reduced(w.child)) {
            bad += 1
            println(s"[VIOLATION] $name: partition-less Window over an unreduced frame")
            println(w.child.treeString.linesIterator.take(20).mkString("\n"))
          }
        }
        if (globals.nonEmpty)
          println(s"[ok] $name: ${globals.length} partition-less window(s), all reduced")
      } catch {
        case e: Throwable => println(s"[ERR] $name: ${e.getMessage.take(200)}")
      }
    }
    println(f"[done] violations=$bad in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
