package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer: the k smallest DISTINCT hash values
  * seen, kept sorted ascending. The retained set is a pure function of
  * the input SET (smallest-k is order-independent, duplicates collapse on
  * insert), so update and merge commute — partition-invariance by
  * construction, same argument as [[TopKBuffer]]. k is a sketch size
  * (64–1024), so inserts shift linearly instead of heapifying. */
final class KmvBuffer(val k: Int) {
  val hs = new Array[Double](k)
  var size = 0

  def insert(h: Double): Unit = {
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && hs(lo) == h) return // already in the sketch
    if (size < k) {
      var i = size
      while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
      hs(lo) = h
      size += 1
    } else if (lo < k) { // evict the current largest
      var i = k - 1
      while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
      hs(lo) = h
    }
  }
}

/** Native KMV (theta-sketch) distinct-count aggregate — the
  * SCALE-CORRECT form of [[graft.ops.Aggs.aggDistinctKmv]]'s query
  * spelling: the query form must shuffle every distinct hash to one
  * partition and sort it to find the k smallest; this aggregate's
  * map-side partials each keep ≤ k values, so the exchange carries
  * k·tasks doubles no matter how many billions of rows feed it — the
  * same partial/final contract `approx_count_distinct`'s HLL runs on,
  * but with a portable, exactly-reproducible estimator (pure md5-derived
  * arithmetic — no engine-internal sketch format, so a DuckDB oracle can
  * rebuild it bit-for-bit; the HLL sibling [[graft.ops.Aggs]]
  * `aggDistinctApprox` is the one declared query WITHOUT an oracle for
  * exactly that reason). Runs on the ObjectHashAggregate path with full
  * partial aggregation (guide preference (b)).
  *
  * Input: an already-hashed uniform [0,1) double (the caller picks the
  * hash family; [[graft.ops.Aggs.kmvHash]] is the library's md5-based
  * one). Result: struct<m: bigint, theta: double, est_distinct: double>
  * with θ = 1.0 and est = m (EXACT) while fewer than k distinct hashes
  * exist, else θ = k-th smallest hash and est = (k−1)/θ. Null inputs are
  * skipped (SQL COUNT DISTINCT semantics). */
case class KmvDistinct(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 1, s"kmv_distinct requires k > 1, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("m", LongType, nullable = false),
    StructField("theta", DoubleType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a double hash input, got ${hash.dataType.sql}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buffer.insert(h.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.hs(i)); i += 1 }
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val m = buffer.size.toLong
    val theta = if (buffer.size < k) 1.0 else buffer.hs(k - 1)
    val est = if (buffer.size < k) m.toDouble else (k - 1).toDouble / theta
    InternalRow(m, theta, est)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = newChildren(0))
}

object KmvDistinct {
  /** Column-API form: `kmv_distinct(h, k)` over a uniform [0,1) hash. */
  def kmv_distinct(hash: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvDistinct(GraftSqlBridge.toExpression(hash), k)
        .toAggregateExpression(isDistinct = false))

  /** SQL registration pieces for [[GraftExtensions]]: `kmv_distinct(h, k)`
    * with k a foldable integer literal. */
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvDistinct].getName, "kmv_distinct")

  def builder(args: Seq[Expression]): Expression = args match {
    case Seq(h, Literal(k: Int, IntegerType)) =>
      KmvDistinct(h, k).toAggregateExpression(isDistinct = false)
    case _ => throw new IllegalArgumentException(
      "kmv_distinct(hash, k) requires a double hash column and an integer literal k")
  }
}
