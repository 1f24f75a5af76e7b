package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the aggregate Spark lacks for scalable
  * "top k rows per group". The standard window form
  * (`row_number() over (partition by g order by s desc) <= k`) shuffles
  * EVERY input row to its group's task before discarding all but k; this
  * aggregate keeps a k-bounded heap per group in the partial (map-side)
  * aggregate, so only |groups| * k entries cross the wire — the same
  * partial/merge shape as sum/min/max, applied to a ranked set. At
  * 10^10 scored candidate rows and k=10 that is a ~10^9-fold shuffle
  * reduction for a single-group query.
  *
  * Ranking: score DESC, then payload ASC (deterministic tie-break).
  * Output: array<struct<score double, id bigint>> in rank order.
  * Nulls in either child are ignored (SQL aggregate convention).
  */
case class BoundedTopK(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, payload.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k requires (double, bigint) inputs, got (${s.sql}, ${p.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): BoundedTopK.TopKBuffer =
    new BoundedTopK.TopKBuffer(k)

  override def update(buf: BoundedTopK.TopKBuffer, input: InternalRow): BoundedTopK.TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) buf.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.TopKBuffer, other: BoundedTopK.TopKBuffer): BoundedTopK.TopKBuffer = {
    other.foreach(buf.insert)
    buf
  }

  override def eval(buf: BoundedTopK.TopKBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(buf: BoundedTopK.TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedTopK.TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(score = newLeft, payload = newRight)

  override def prettyName: String = "bounded_top_k"
}

object BoundedTopK {

  /** Min-heap of at most k (score, id) entries, worst-ranked at the root
    * so inserts beyond capacity evict in O(log k). "Better" = higher
    * score, then lower id.
    */
  final class TopKBuffer(k: Int) {
    private val heap = new java.util.PriorityQueue[(Double, Long)](
      math.min(k, 1024),
      (a: (Double, Long), b: (Double, Long)) => {
        // worst-first: ascending score, then DESCENDING id
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def insert(score: Double, id: Long): Unit = {
      if (heap.size < k) heap.add((score, id))
      else {
        val worst = heap.peek()
        // Double.compare, NOT primitive > / ==: the primitive ops are
        // false for NaN on both sides, which would make a NaN's fate
        // depend on arrival order (seated NaN never evicted, late NaN
        // never seated). Double.compare ranks NaN above every score on
        // both insert and eviction — the same total order Spark and the
        // SQL window-rank oracle use for ORDER BY score DESC.
        val c = java.lang.Double.compare(score, worst._1)
        val better = c > 0 || (c == 0 && id < worst._2)
        if (better) { heap.poll(); heap.add((score, id)) }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      heap.iterator().forEachRemaining(e => f(e._1, e._2))

    /** Entries in final rank order: score DESC (NaN first, as in ORDER BY
      * score DESC), id ASC. Explicit Double.compare — negating through
      * sortBy would send NaN to the wrong end.
      */
    def sortedEntries: Seq[(Double, Long)] = {
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.toSeq.sortWith { case ((sa, ia), (sb, ib)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ia < ib)
      }
    }
  }

  /** Aggregate Column: top `k` (score, id) pairs per group, rank order. */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      BoundedTopK(
        org.apache.spark.sql.graft.bridge.expression(score),
        org.apache.spark.sql.graft.bridge.expression(id), k)
        .toAggregateExpression())
}
