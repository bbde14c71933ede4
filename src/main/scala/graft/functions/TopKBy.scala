package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) entries, kept by the total
  * order (score DESC, id ASC). Insertion keeps the set of the k best seen
  * — a total order makes that set unique, so update/merge are order- and
  * partitioning-independent by construction. k is small (a ranking
  * cutoff), so eviction scans linearly instead of heapifying. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** is (s1, i1) a WORSE candidate than (s2, i2)? */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) { scores(size) = s; ids(size) = id; size += 1 }
    else {
      var w = 0
      var i = 1
      while (i < size) {
        if (worse(scores(i), ids(i), scores(w), ids(w))) w = i
        i += 1
      }
      if (worse(scores(w), ids(w), s, id)) { scores(w) = s; ids(w) = id }
    }
  }
}

/** Bounded top-k aggregate — the scale-correct form of "top k per key by
  * score": where a rank window must shuffle EVERY candidate row to its
  * key's partition and sort it, this aggregate's map-side partials keep
  * only k entries per (key, task), so the shuffle carries ≤ k rows per
  * partial instead of the full candidate set. For a k-NN join that is the
  * difference between shuffling n²/blocks candidate pairs and shuffling
  * k·tasks rows per vector. Runs on Spark's ObjectHashAggregate path with
  * full partial aggregation (guide preference (b): a custom Catalyst
  * aggregate beats any UDAF).
  *
  * Result: array<struct<score double, id bigint>> sorted by
  * (score DESC, id ASC) — a TOTAL order, so the retained set and its
  * rendering are unique regardless of row arrival or merge order
  * (partition-invariance by construction, asserted in spec). Null score
  * or id rows are skipped, matching a rank window's treatment of rows the
  * ordering drops. */
case class TopKBy(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_k_by requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires (double, bigint) inputs, got ${score.dataType.sql} / ${id.dataType.sql}")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val idx = (0 until buffer.size).sortBy(i => (-buffer.scores(i), buffer.ids(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(buffer.scores(i), buffer.ids(i))).toArray[Any])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKBy {
  /** Column-API form: `top_k_by(score, id, k)` aggregates to the k best
    * (score, id) structs by (score DESC, id ASC). */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      TopKBy(GraftSqlBridge.toExpression(score), GraftSqlBridge.toExpression(id), k)
        .toAggregateExpression(isDistinct = false))

  /** `ArrayData` returned by eval is rendered by the struct schema in
    * [[TopKBy.dataType]]; exposed for specs. */
  private[graft] def render(a: ArrayData): Seq[(Double, Long)] =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getDouble(0), r.getLong(1))
    }
}
