package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Mergeable sketch aggregates as native `TypedImperativeAggregate`s — the
 * Catalyst API for aggregation state that is an arbitrary object rather
 * than a fixed-width row. Both sketches are MERGEABLE (associative
 * partial-merge), which is the property that makes them work at 100 TB:
 * each task folds its partition into a small fixed-size state, ONE sketch
 * per group crosses the exchange (serialized by `serialize`/`deserialize`),
 * and the final aggregation merges states instead of re-seeing rows. The
 * plan is ObjectHashAggregate(partial) -> Exchange -> ObjectHashAggregate
 * (final) — exactly the shape PlanSpec pins.
 *
 * The reference ships no sketch operators; these follow the published
 * algorithms (Flajolet et al. 2007 HyperLogLog; Karnin/Lang/Liberty 2016
 * KLL) re-expressed against Spark's aggregate contract, the same niche
 * Spark's own approx_count_distinct/approx_percentile fill. They exist
 * here as library operators so pipelines can keep sketch STATE (store /
 * merge across ingests) rather than only scalar estimates.
 */
object SketchAggregates {

  // ---------------------------------------------------------------- HLL

  /** Register-update shared by every HLL variant: hash the value, index by
   *  the top `precision` bits, rank-of-first-one over the rest. */
  private def hllUpdate(buf: Array[Byte], v: Any, dt: DataType, precision: Int): Unit = {
    val h = XxHash64Function.hash(v, dt, 42L)
    val idx = (h >>> (64 - precision)).toInt
    val rest = h << precision
    val rank = if (rest == 0L) (64 - precision + 1)
      else java.lang.Long.numberOfLeadingZeros(rest) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
  }

  /** Estimate from a register array (standard HLL with linear-counting
   *  small-range correction; 64-bit hashes need no large-range term). */
  private def hllEstimate(buf: Array[Byte]): Long = {
    val m = buf.length
    if (m == 0) return 0L
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -buf(i)) // 2^-register, exact
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    var est = alpha * m.toDouble * m.toDouble / sum
    if (est <= 2.5 * m && zeros > 0) est = m * math.log(m.toDouble / zeros)
    math.rint(est).toLong
  }

  private def hllMergeInto(b1: Array[Byte], b2: Array[Byte]): Unit = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
  }

  /**
   * HyperLogLog distinct-count estimate. State: 2^precision one-byte
   * registers (4 KB at the default precision 12; standard error
   * 1.04/sqrt(2^p) ~ 1.6%). Hash: XxHash64 of the child's internal value,
   * the same 64-bit hash family the engine's own hash functions use —
   * deterministic across runs and partitions, so the estimate for a given
   * dataset is a FIXED number, not a distribution.
   */
  case class HllDistinct(
      child: Expression,
      precision: Int = 12,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(precision >= 4 && precision <= 18,
      s"graft_hll precision must be in [4,18], got $precision")
    private val m = 1 << precision

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) hllUpdate(buf, v, child.dataType, precision)
      buf
    }

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      hllMergeInto(b1, b2); b1
    }

    override def eval(buf: Array[Byte]): Any = hllEstimate(buf)

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllDistinct =
      copy(child = newChild)
    override def prettyName: String = "graft_hll"
  }

  /**
   * graft_hll_state: the same aggregation, returning the raw REGISTER
   * ARRAY (binary) instead of the estimate — the persistable sketch
   * state. Store one state per shard/ingest (a 2^p-byte column value),
   * then fold any subset with [[HllMergeEstimate]] in any later session:
   * distinct counts compose across ingests without re-seeing rows, the
   * same economics as the dedup signature index. Max-merge is
   * associative, commutative and idempotent, so merged estimates are
   * EXACTLY the estimate of the union's sketch, regardless of how the
   * data was sharded.
   */
  case class HllState(
      child: Expression,
      precision: Int = 12,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(precision >= 4 && precision <= 18,
      s"graft_hll_state precision must be in [4,18], got $precision")

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << precision)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) hllUpdate(buf, v, child.dataType, precision)
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      hllMergeInto(b1, b2); b1
    }
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): HllState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllState =
      copy(child = newChild)
    override def prettyName: String = "graft_hll_state"
  }

  /**
   * graft_hll_merge: fold a column of persisted HLL states (binary
   * register arrays from [[HllState]]) into one estimate. States must
   * share one precision (register length) — a mixed-precision merge is
   * a loud error, not a silently-wrong count. An empty input (no
   * states) estimates 0.
   */
  case class HllMergeEstimate(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    // empty until the first state arrives (which fixes the precision)
    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

    private def fold(buf: Array[Byte], state: Array[Byte]): Array[Byte] =
      if (state.length == 0) buf
      else if (buf.length == 0) state.clone()
      else {
        require(buf.length == state.length,
          s"graft_hll_merge: mixed register sizes ${buf.length} vs ${state.length} " +
            "— all states must come from the same graft_hll_state precision")
        hllMergeInto(buf, state); buf
      }

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf else fold(buf, v.asInstanceOf[Array[Byte]])
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = fold(b1, b2)
    override def eval(buf: Array[Byte]): Any = hllEstimate(buf)
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): HllMergeEstimate =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllMergeEstimate =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllMergeEstimate =
      copy(child = newChild)
    override def prettyName: String = "graft_hll_merge"
  }

  // ---------------------------------------------------------------- KLL

  /** KLL quantile-sketch state: levels of sorted-on-compaction buffers;
   *  items at level h carry weight 2^h. Level 0 receives raw doubles;
   *  a level reaching `k` items compacts — sort, keep alternate items
   *  (deterministic alternating offset, not a random coin, so a given
   *  partition folds to the same state every run), promote survivors one
   *  level up. Total state is O(k log(n/k)) doubles regardless of n. */
  final class KllBuffer(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    var compactions: Long = 0L

    def insert(x: Double): Unit = { levels(0) += x; compactIfNeeded() }

    def mergeIn(other: KllBuffer): Unit = {
      while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
      var h = 0
      while (h < other.levels.length) { levels(h) ++= other.levels(h); h += 1 }
      compactions += other.compactions
      compactIfNeeded()
    }

    private def compactIfNeeded(): Unit = {
      var h = 0
      while (h < levels.length) {
        if (levels(h).length >= k) {
          val sorted = levels(h).sortInPlace()
          // alternate-survivor compaction: the parity flips with the
          // running compaction count — deterministic, and unbiased across
          // the sketch's lifetime (each parity is used half the time)
          val offset = (compactions & 1L).toInt
          compactions += 1
          if (h + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
          val promoted = levels(h + 1)
          var i = offset
          while (i < sorted.length) { promoted += sorted(i); i += 2 }
          levels(h) = ArrayBuffer.empty[Double]
        }
        h += 1
      }
    }

    /** True when no item was ever inserted (merge identity element). */
    def isEmptySketch: Boolean = compactions == 0L && levels.forall(_.isEmpty)

    /** Weighted items: (value, weight = 2^level). */
    def weighted(): Array[(Double, Long)] = {
      val out = ArrayBuffer.empty[(Double, Long)]
      var h = 0
      while (h < levels.length) {
        val w = 1L << h
        levels(h).foreach(x => out += ((x, w)))
        h += 1
      }
      out.toArray
    }

    /** Quantile estimates at the given ranks, by cumulative weighted walk. */
    def quantiles(phis: Seq[Double]): Array[Double] = {
      val items = weighted().sortBy(_._1)
      if (items.isEmpty) return phis.map(_ => Double.NaN).toArray
      val total = items.map(_._2).sum
      phis.map { phi =>
        val target = phi * total
        var cum = 0L
        var i = 0
        var res = items.last._1
        var done = false
        while (i < items.length && !done) {
          cum += items(i)._2
          if (cum >= target) { res = items(i)._1; done = true }
          i += 1
        }
        res
      }.toArray
    }
  }

  /** Wire form shared by the in-flight aggregation buffer and the
   *  persistable state column: k, compaction count, then per-level
   *  lengths + doubles. */
  private[graft] def kllSerialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.compactions)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  private[graft] def kllDeserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.compactions = in.readLong()
    val nLevels = in.readInt()
    buf.levels.clear()
    var h = 0
    while (h < nLevels) {
      val n = in.readInt()
      val lvl = new ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { lvl += in.readDouble(); i += 1 }
      buf.levels += lvl
      h += 1
    }
    buf
  }

  /**
   * KLL quantile sketch aggregate: returns the estimated quantiles at the
   * requested ranks as array<double>. `k` trades state for accuracy —
   * k=200 keeps rank error well under 1% at any input size. Estimates can
   * vary slightly run-to-run (partial-merge order is not deterministic
   * under shuffle fetch), so correctness checks should verify the RANK of
   * each estimate against its error bound, not hash the raw values — the
   * k2 catalog query is the worked example.
   */
  case class KllQuantiles(
      child: Expression,
      phis: Seq[Double],
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

    require(k >= 8, s"graft_kll k must be >= 8, got $k")
    require(phis.nonEmpty && phis.forall(p => p >= 0.0 && p <= 1.0),
      s"graft_kll ranks must be in [0,1], got $phis")

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Number].doubleValue)
      buf
    }

    override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = {
      b1.mergeIn(b2); b1
    }

    override def eval(buf: KllBuffer): Any =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.quantiles(phis))

    override def serialize(buf: KllBuffer): Array[Byte] = kllSerialize(buf)
    override def deserialize(bytes: Array[Byte]): KllBuffer = kllDeserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
      copy(child = newChild)
    override def prettyName: String = "graft_kll"
  }

  /**
   * graft_kll_state: the same KLL aggregation, returning the serialized
   * sketch (binary) instead of quantiles — the persistable state. Unlike
   * HLL's registers, KLL merge is not bit-order-free (compaction depends
   * on fold order), so re-merged estimates can differ from a single-pass
   * sketch by up to the RANK ERROR — exact downstream checks must verify
   * ranks against the error budget, as catalog query k4 does.
   */
  case class KllState(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

    require(k >= 8, s"graft_kll_state k must be >= 8, got $k")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Number].doubleValue)
      buf
    }
    override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = { b1.mergeIn(b2); b1 }
    override def eval(buf: KllBuffer): Any = kllSerialize(buf)
    override def serialize(buf: KllBuffer): Array[Byte] = kllSerialize(buf)
    override def deserialize(bytes: Array[Byte]): KllBuffer = kllDeserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): KllState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KllState =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_state"
  }

  /**
   * graft_kll_merge: fold a column of persisted KLL states (binary, from
   * [[KllState]]) into quantile estimates at the requested ranks. States
   * must share one `k`; an empty input yields NaNs (no data, no ranks).
   */
  case class KllMergeQuantiles(
      child: Expression,
      phis: Seq[Double],
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

    require(phis.nonEmpty && phis.forall(p => p >= 0.0 && p <= 1.0),
      s"graft_kll_merge ranks must be in [0,1], got $phis")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    // empty identity sketch; the first folded state fixes k
    override def createAggregationBuffer(): KllBuffer = new KllBuffer(Int.MaxValue)

    private def fold(b: KllBuffer, s: KllBuffer): KllBuffer =
      if (s.isEmptySketch) b
      else if (b.isEmptySketch) s // states arrive deserialized-fresh: safe to adopt
      else {
        require(b.k == s.k,
          s"graft_kll_merge: mixed k ${b.k} vs ${s.k} — all states must " +
            "come from the same graft_kll_state parameter")
        b.mergeIn(s); b
      }

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v == null) buf
      else fold(buf, kllDeserialize(v.asInstanceOf[Array[Byte]]))
    }
    override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = fold(b1, b2)
    override def eval(buf: KllBuffer): Any =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.quantiles(phis))
    override def serialize(buf: KllBuffer): Array[Byte] = kllSerialize(buf)
    override def deserialize(bytes: Array[Byte]): KllBuffer = kllDeserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantiles =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeQuantiles =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KllMergeQuantiles =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_merge"
  }

  // ----------------------------------------------------- bottom-k sample

  /** JVM mirror of the SQL oracle hash `Hashing.oracleHash`:
   *  conv(substring(md5(s),1,15),16,10) — first 60 bits of the MD5 of the
   *  value's string form, bit-identical in any engine with standard MD5.
   *  Chosen over xxhash so per-group samples are EXACTLY reproducible in
   *  the DuckDB correctness oracle, not just verdict-bounded. */
  private[graft] def oracleHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits = first 7 bytes + high nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Bottom-k state: distinct (hash -> value-string) pairs, k smallest
   *  hashes kept. Union-then-trim merge is associative, commutative and
   *  idempotent, so sharding/micro-batching cannot change the sample. */
  final class BottomKBuffer(val k: Int) {
    val entries = new java.util.TreeMap[Long, String]()
    def insert(s: String): Unit = {
      val h = oracleHash60(s)
      if (!entries.containsKey(h)) {
        if (entries.size < k) entries.put(h, s)
        else if (h < entries.lastKey()) { entries.put(h, s); entries.remove(entries.lastKey()) }
      }
    }
    def mergeIn(o: BottomKBuffer): Unit = {
      val it = o.entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (!entries.containsKey(e.getKey)) entries.put(e.getKey, e.getValue)
      }
      while (entries.size > k) entries.remove(entries.lastKey())
    }
  }

  private def bottomKSerialize(b: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.entries.size)
    val it = b.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeUTF(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  private def bottomKDeserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new BottomKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.entries.put(in.readLong(), in.readUTF()); i += 1 }
    b
  }

  /**
   * graft_bottomk(col, k): deterministic distinct sample — the k values
   * with the smallest oracle-hash, returned hash-ordered as
   * array<string>. The per-GROUP sampling shape at 100 TB: as an
   * aggregate, each task folds its partition into <= k entries per group
   * and only those cross the exchange — where the window
   * row_number-over-hash alternative shuffles EVERY row to rank it.
   * Union-then-trim merge is order-free and idempotent, so the sample is
   * a fixed function of the group's distinct value set: stable across
   * partitioning, re-runs, micro-batch slicing, and engines (the hash is
   * md5-derived, mirrorable in the DuckDB oracle — c7 hash-matches the
   * whole sample, not a verdict bound). Doubles as KMV state: the k-th
   * smallest hash estimates distinct counts (t12's estimator).
   */
  case class BottomKSample(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] with UnaryLike[Expression] {

    require(k >= 1 && k <= 100000, s"graft_bottomk k must be in [1,100000], got $k")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

    override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.toString)
      buf
    }
    override def merge(b1: BottomKBuffer, b2: BottomKBuffer): BottomKBuffer = {
      b1.mergeIn(b2); b1
    }
    override def eval(buf: BottomKBuffer): Any = {
      val vals = new Array[org.apache.spark.unsafe.types.UTF8String](buf.entries.size)
      val it = buf.entries.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        vals(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next().getValue)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
    }
    override def serialize(buf: BottomKBuffer): Array[Byte] = bottomKSerialize(buf)
    override def deserialize(bytes: Array[Byte]): BottomKBuffer = bottomKDeserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKSample =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BottomKSample =
      copy(child = newChild)
    override def prettyName: String = "graft_bottomk"
  }

  /** Top-k (value, id) pairs under (value DESC, id ASC) — first = best.
   *  A TreeSet of long pairs; duplicates of an identical pair collapse
   *  (the aggregate is a function of the DISTINCT pair set). */
  final class TopKPairsBuffer(val k: Int) {
    val entries = new java.util.TreeSet[Array[Long]](
      new java.util.Comparator[Array[Long]] {
        override def compare(a: Array[Long], b: Array[Long]): Int = {
          val c = java.lang.Long.compare(b(0), a(0)) // value DESC
          if (c != 0) c else java.lang.Long.compare(a(1), b(1)) // id ASC
        }
      })
    def insert(v: Long, id: Long): Unit = {
      entries.add(Array(v, id))
      if (entries.size > k) entries.remove(entries.last())
    }
    def mergeIn(o: TopKPairsBuffer): Unit = {
      val it = o.entries.iterator()
      while (it.hasNext) entries.add(it.next())
      while (entries.size > k) entries.remove(entries.last())
    }
  }

  private def topKPairsSerialize(b: TopKPairsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.entries.size)
    val it = b.entries.iterator()
    while (it.hasNext) { val e = it.next(); out.writeLong(e(0)); out.writeLong(e(1)) }
    out.flush(); bos.toByteArray
  }

  private def topKPairsDeserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKPairsBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.insert(in.readLong(), in.readLong()); i += 1 }
    b
  }

  /**
   * graft_topk_pairs(value, id, k): the k best (value, id) pairs per
   * group under (value DESC, id ASC), returned best-first as
   * array<struct<v, id>> — so element position + 1 IS the dense rank.
   * The per-group TOP-K-BY-VALUE shape at 100 TB: as an aggregate, each
   * task folds its partition into <= k pairs per group and only those
   * cross the exchange — where the window row_number alternative
   * shuffles EVERY row to rank it (same argument as [[BottomKSample]],
   * with an explicit value instead of the oracle hash). Union-then-trim
   * merge is order-free and idempotent over the distinct pair set, so
   * the result is stable across partitioning, re-runs, micro-batch
   * slicing, and engines (plain integer comparisons — mirrored by any
   * SQL oracle's ORDER BY v DESC, id ASC LIMIT k).
   */
  case class TopKPairs(
      value: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsBuffer]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

    require(k >= 1 && k <= 100000, s"graft_topk_pairs k must be in [1,100000], got $k")

    override def left: Expression = value
    override def right: Expression = id
    // The buffer ranks LONGS: a fractional value column would be silently
    // truncated (wrong order vs the documented ORDER BY v DESC parity) and
    // a string/decimal one would ClassCastException mid-execution. The
    // function is SQL-exposed, so reject non-integral inputs at ANALYSIS
    // time like the sibling sketch aggregates do.
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def integral(dt: DataType): Boolean = dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!integral(value.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_topk_pairs requires an INTEGRAL value column (tinyint/smallint/" +
            s"int/bigint); got ${value.dataType.catalogString}. Fractional values " +
            "would be truncated and rank wrongly — scale to integer units first " +
            "(e.g. micro-units: cast(round(v * 1e6) as bigint)).")
      else if (!integral(id.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_topk_pairs requires an INTEGRAL id column (tinyint/smallint/" +
            s"int/bigint); got ${id.dataType.catalogString}. Key non-integral ids " +
            "by a 64-bit surrogate (e.g. graft.ml.Hashing.oracleHash) and join back.")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("v", LongType, nullable = false),
        StructField("id", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

    override def update(buf: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
      val v = value.eval(input)
      val i = id.eval(input)
      if (v != null && i != null)
        buf.insert(v.asInstanceOf[Number].longValue(), i.asInstanceOf[Number].longValue())
      buf
    }
    override def merge(b1: TopKPairsBuffer, b2: TopKPairsBuffer): TopKPairsBuffer = {
      b1.mergeIn(b2); b1
    }
    override def eval(buf: TopKPairsBuffer): Any = {
      val rows = new Array[Any](buf.entries.size)
      val it = buf.entries.iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        rows(i) = InternalRow(e(0), e(1))
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows)
    }
    override def serialize(buf: TopKPairsBuffer): Array[Byte] = topKPairsSerialize(buf)
    override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = topKPairsDeserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKPairs =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): TopKPairs =
      copy(value = newLeft, id = newRight)
    override def prettyName: String = "graft_topk_pairs"
  }

  // -------------------------------------------------------------- Bloom

  /** Bloom-filter state layout: [int numHashes][bit bytes]. Bit count is
   *  implied by the array length. Kept as raw bytes end-to-end — update,
   *  merge (bitwise OR) and probe all index into the same layout, and the
   *  aggregation buffer doubles as the persistable state column value. */
  private val BloomHeaderBytes = 4

  private def bloomNewState(numBits: Int, numHashes: Int): Array[Byte] = {
    val st = new Array[Byte](BloomHeaderBytes + ((numBits + 7) >>> 3))
    st(0) = (numHashes >>> 24).toByte; st(1) = (numHashes >>> 16).toByte
    st(2) = (numHashes >>> 8).toByte; st(3) = numHashes.toByte
    st
  }

  private def bloomNumHashes(st: Array[Byte]): Int =
    ((st(0) & 0xff) << 24) | ((st(1) & 0xff) << 16) | ((st(2) & 0xff) << 8) | (st(3) & 0xff)

  /** Kirsch–Mitzenmacher double hashing: k bit positions derived from two
   *  XxHash64 passes (seeds fixed, h2 forced odd) — deterministic across
   *  runs/partitions, so a dataset's filter is a FIXED byte array. */
  private def bloomSet(st: Array[Byte], v: Any, dt: DataType): Unit = {
    val nBits = (st.length - BloomHeaderBytes).toLong << 3
    val k = bloomNumHashes(st)
    val h1 = XxHash64Function.hash(v, dt, 41L)
    val h2 = XxHash64Function.hash(v, dt, 97L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      st(BloomHeaderBytes + (pos >>> 3).toInt) =
        (st(BloomHeaderBytes + (pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Membership probe against a serialized Bloom state. Public and
   *  static-shaped: [[BloomContains]]'s generated code calls it per row. */
  def bloomProbe(st: Array[Byte], v: Any, dt: DataType): Boolean = {
    val nBits = (st.length - BloomHeaderBytes).toLong << 3
    val k = bloomNumHashes(st)
    val h1 = XxHash64Function.hash(v, dt, 41L)
    val h2 = XxHash64Function.hash(v, dt, 97L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
      if ((st(BloomHeaderBytes + (pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  private def bloomMergeInto(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    require(b1.length == b2.length && bloomNumHashes(b1) == bloomNumHashes(b2),
      s"graft_bloom merge: incompatible states (${b1.length}B/k=${bloomNumHashes(b1)} " +
        s"vs ${b2.length}B/k=${bloomNumHashes(b2)}) — all states must share numBits and numHashes")
    var i = BloomHeaderBytes
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  /**
   * graft_bloom_state: fold a column into a Bloom filter, returned as the
   * persistable binary state. The 100 TB decontamination shape: build the
   * filter over the EVAL side (one fixed-size state regardless of eval
   * rows), broadcast that single row, and probe the corpus with
   * [[BloomContains]] — the corpus side never joins, never shuffles for
   * the membership test, and the broadcast payload is `numBits/8` bytes
   * where a set-join would broadcast every distinct eval value. No false
   * negatives ever; false-positive rate ~ (1-e^(-k·n/m))^k, so size
   * `numBits` ≥ ~10× expected distinct insertions for < 1%. OR-merge is
   * associative, commutative and idempotent — sharded builds fold to
   * byte-identical states in any order ([[BloomMergeState]]).
   */
  case class BloomState(
      child: Expression,
      numBits: Int = 1 << 22,
      numHashes: Int = 5,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(numBits >= 64 && (numBits & 7) == 0,
      s"graft_bloom_state numBits must be >= 64 and a multiple of 8, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"graft_bloom_state numHashes must be in [1,16], got $numHashes")

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = bloomNewState(numBits, numHashes)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) bloomSet(buf, v, child.dataType)
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = bloomMergeInto(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): BloomState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomState =
      copy(child = newChild)
    override def prettyName: String = "graft_bloom_state"
  }

  /**
   * graft_bloom_merge: OR-fold a column of persisted Bloom states into one
   * state (binary). Mixed sizes/hash counts are a loud error. An empty
   * input yields an empty byte array (the identity — probes return false).
   */
  case class BloomMergeState(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

    private def fold(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      if (s.length == 0) b
      else if (b.length == 0) s.clone()
      else bloomMergeInto(b, s)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf else fold(buf, v.asInstanceOf[Array[Byte]])
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = fold(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): BloomMergeState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomMergeState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomMergeState =
      copy(child = newChild)
    override def prettyName: String = "graft_bloom_merge"
  }

  // ---------------------------------------------------------- Count-Min

  /** Count-Min state layout: [int depth][int width][depth*width long
   *  counters, row-major]. Update adds 1 at one hashed column per row;
   *  estimate is the min over rows — counts are OVERestimates only
   *  (collisions add, never subtract): est >= true, and
   *  est <= true + eps*N with eps = e/width at the standard depth-vs-
   *  confidence tradeoff (Cormode & Muthukrishnan 2005). */
  private val CmsHeaderBytes = 8

  private def cmsNewState(depth: Int, width: Int): Array[Byte] = {
    val st = new Array[Byte](CmsHeaderBytes + depth * width * 8)
    writeIntBE(st, 0, depth); writeIntBE(st, 4, width)
    st
  }

  private def writeIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def readIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def cmsCell(st: Array[Byte], row: Int, col0: Int): Long = {
    val off = CmsHeaderBytes + (row * readIntBE(st, 4) + col0) * 8
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (st(off + i) & 0xffL); i += 1 }
    v
  }

  private def cmsCellAdd(st: Array[Byte], row: Int, col0: Int, delta: Long): Unit = {
    val off = CmsHeaderBytes + (row * readIntBE(st, 4) + col0) * 8
    var v = cmsCell(st, row, col0) + delta
    var i = 7
    while (i >= 0) { st(off + i) = v.toByte; v >>>= 8; i -= 1 }
  }

  /** Per-row column index: double hashing like Bloom, one position per
   *  sketch row — deterministic across runs and partitions. */
  private def cmsUpdate(st: Array[Byte], v: Any, dt: DataType): Unit = {
    val depth = readIntBE(st, 0); val width = readIntBE(st, 4)
    val h1 = XxHash64Function.hash(v, dt, 131L)
    val h2 = XxHash64Function.hash(v, dt, 271L) | 1L
    var r = 0
    while (r < depth) {
      cmsCellAdd(st, r, java.lang.Long.remainderUnsigned(h1 + r * h2, width).toInt, 1L)
      r += 1
    }
  }

  /** Point estimate: min over the value's cells. Public and static-shaped
   *  for [[CmsCount]]'s generated code. */
  def cmsEstimate(st: Array[Byte], v: Any, dt: DataType): Long = {
    if (st.length <= CmsHeaderBytes) return 0L
    val depth = readIntBE(st, 0); val width = readIntBE(st, 4)
    val h1 = XxHash64Function.hash(v, dt, 131L)
    val h2 = XxHash64Function.hash(v, dt, 271L) | 1L
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = cmsCell(st, r, java.lang.Long.remainderUnsigned(h1 + r * h2, width).toInt)
      if (c < est) est = c
      r += 1
    }
    est
  }

  private def cmsMergeInto(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    require(b1.length == b2.length && readIntBE(b1, 0) == readIntBE(b2, 0) &&
      readIntBE(b1, 4) == readIntBE(b2, 4),
      s"graft_cms merge: incompatible states (depth/width " +
        s"${readIntBE(b1, 0)}x${readIntBE(b1, 4)} vs ${readIntBE(b2, 0)}x${readIntBE(b2, 4)}) " +
        "— all states must share depth and width")
    val depth = readIntBE(b1, 0); val width = readIntBE(b1, 4)
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { cmsCellAdd(b1, r, c, cmsCell(b2, r, c)); c += 1 }
      r += 1
    }
    b1
  }

  /**
   * graft_cms_state: fold a column into a Count-Min frequency sketch,
   * returned as the persistable binary state. The fixed-memory frequency
   * shape at 100 TB: exact per-value counts need a value-cardinality
   * shuffle; the sketch folds each partition into depth*width counters
   * and SUM-merges across the exchange. One-sided error — the estimate
   * never undercounts, and overcounts by at most eps*N (eps ~ e/width)
   * with probability 1 - (1/2)^depth — so "estimated count >= threshold"
   * never misses a true heavy hitter. SUM-merge is associative and
   * commutative but NOT idempotent: never fold the same state twice
   * (unlike HLL/Bloom max/OR-merges, a double-merge double-counts).
   */
  case class CmsState(
      child: Expression,
      depth: Int = 5,
      width: Int = 2048,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(depth >= 1 && depth <= 16,
      s"graft_cms_state depth must be in [1,16], got $depth")
    require(width >= 16,
      s"graft_cms_state width must be >= 16, got $width")

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = cmsNewState(depth, width)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) cmsUpdate(buf, v, child.dataType)
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = cmsMergeInto(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): CmsState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmsState =
      copy(child = newChild)
    override def prettyName: String = "graft_cms_state"
  }

  /**
   * graft_cms_merge: SUM-fold a column of persisted Count-Min states into
   * one state (binary). Mixed depth/width is a loud error; an empty input
   * yields the empty byte array (estimates 0 for everything). Each input
   * state must be folded exactly once — sum-merge is not idempotent.
   */
  case class CmsMergeState(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

    private def fold(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      if (s.length == 0) b
      else if (b.length == 0) s.clone()
      else cmsMergeInto(b, s)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf else fold(buf, v.asInstanceOf[Array[Byte]])
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = fold(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): CmsMergeState =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmsMergeState =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmsMergeState =
      copy(child = newChild)
    override def prettyName: String = "graft_cms_merge"
  }

  /**
   * graft_cms_count(state, value): scalar point-frequency estimate — min
   * over the value's hashed cells, inside whole-stage codegen. An empty
   * state (merge identity) estimates 0.
   *
   * The probe value's TYPE must match the build column's type: the hash
   * is computed over the internal representation, so probing a
   * long-built sketch with the string '1' (or vice versa) silently
   * estimates a different key. The binary state cannot carry the build
   * type, so this is a caller contract — CAST the probe to the build
   * column's type.
   */
  case class CmsCount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (left.dataType != BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_count state argument must be binary, got ${left.dataType.sql}")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override protected def nullSafeEval(state: Any, v: Any): Any =
      cmsEstimate(state.asInstanceOf[Array[Byte]], v, right.dataType)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (st, v) => {
        val dtRef = ctx.addReferenceObj("cmsValDt", right.dataType)
        s"${ev.value} = graft.functions.SketchAggregates.cmsEstimate($st, $v, $dtRef);"
      })
    override def prettyName: String = "graft_cms_count"
  }

  /**
   * graft_bloom_contains(state, value): scalar membership probe — the
   * corpus-side half of the decontamination shape. Stays inside
   * whole-stage codegen (generated code calls [[SketchAggregates.bloomProbe]]
   * directly); the state argument is typically a broadcast-crossJoined
   * 1-row column, so the per-row cost is k hash probes into an in-memory
   * byte array, no join machinery. An empty state (merge identity, no
   * insertions) contains nothing.
   *
   * As with [[CmsCount]], the probe value's TYPE must match the build
   * column's type (the hash is computed over the internal
   * representation) — a mismatched probe silently never matches.
   */
  case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = left.nullable || right.nullable
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (left.dataType != BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains state argument must be binary, got ${left.dataType.sql}")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override protected def nullSafeEval(state: Any, v: Any): Any = {
      val st = state.asInstanceOf[Array[Byte]]
      st.length > BloomHeaderBytes && bloomProbe(st, v, right.dataType)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (st, v) => {
        val dtRef = ctx.addReferenceObj("bloomValDt", right.dataType)
        s"""${ev.value} = $st.length > $BloomHeaderBytes &&
           |  graft.functions.SketchAggregates.bloomProbe($st, $v, $dtRef);""".stripMargin
      })
    override def prettyName: String = "graft_bloom_contains"
  }

  // ------------------------------------------------------------ Column API

  /** Distinct-count estimate of `c` (HyperLogLog, 2^precision registers). */
  def hllDistinct(c: Column, precision: Int = 12): Column =
    GraftSqlBridge.column(
      HllDistinct(GraftSqlBridge.expression(c), precision).toAggregateExpression())

  /** Quantile estimates of `c` at ranks `phis` (KLL sketch, parameter k). */
  def kllQuantiles(c: Column, phis: Seq[Double], k: Int = 200): Column =
    GraftSqlBridge.column(
      KllQuantiles(GraftSqlBridge.expression(c), phis, k).toAggregateExpression())

  /** Persistable KLL sketch state of `c` (binary). */
  def kllState(c: Column, k: Int = 200): Column =
    GraftSqlBridge.column(
      KllState(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Fold persisted KLL states into quantile estimates at `phis`. */
  def kllMerge(c: Column, phis: Seq[Double]): Column =
    GraftSqlBridge.column(
      KllMergeQuantiles(GraftSqlBridge.expression(c), phis).toAggregateExpression())

  /** Persistable HLL register state of `c` (binary, 2^precision bytes). */
  def hllState(c: Column, precision: Int = 12): Column =
    GraftSqlBridge.column(
      HllState(GraftSqlBridge.expression(c), precision).toAggregateExpression())

  /** Fold persisted HLL states (binary) into one distinct estimate. */
  def hllMerge(c: Column): Column =
    GraftSqlBridge.column(
      HllMergeEstimate(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Persistable Bloom-filter state of `c` (binary; numBits/8 + 4 bytes). */
  def bloomState(c: Column, numBits: Int = 1 << 22, numHashes: Int = 5): Column =
    GraftSqlBridge.column(
      BloomState(GraftSqlBridge.expression(c), numBits, numHashes).toAggregateExpression())

  /** OR-fold persisted Bloom states (binary) into one state. */
  def bloomMerge(c: Column): Column =
    GraftSqlBridge.column(
      BloomMergeState(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Membership probe of `v` against Bloom state `state`. */
  def bloomContains(state: Column, v: Column): Column =
    GraftSqlBridge.column(
      BloomContains(GraftSqlBridge.expression(state), GraftSqlBridge.expression(v)))

  /** Deterministic distinct sample of `c`: k smallest-oracle-hash values,
   *  hash-ordered array<string>. */
  def bottomK(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      BottomKSample(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** SQL builder for graft_bottomk(col, k). */
  private[graft] def bottomKBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 2) throw new IllegalArgumentException(
      s"graft_bottomk expects (col, k), got ${es.length} arguments")
    BottomKSample(es.head, foldedInt(es(1), "graft_bottomk k")).toAggregateExpression()
  }

  /** Per-group top-k (value, id) pairs under (value DESC, id ASC),
   *  best-first (position + 1 = dense rank). Integral columns only. */
  def topKPairs(value: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKPairs(GraftSqlBridge.expression(value), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())

  /** SQL builder for graft_topk_pairs(value, id, k). */
  private[graft] def topKPairsBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 3) throw new IllegalArgumentException(
      s"graft_topk_pairs expects (value, id, k), got ${es.length} arguments")
    TopKPairs(es(0), es(1), foldedInt(es(2), "graft_topk_pairs k")).toAggregateExpression()
  }

  /** Persistable Count-Min frequency state of `c` (binary; depth*width longs). */
  def cmsState(c: Column, depth: Int = 5, width: Int = 2048): Column =
    GraftSqlBridge.column(
      CmsState(GraftSqlBridge.expression(c), depth, width).toAggregateExpression())

  /** SUM-fold persisted Count-Min states (binary) into one state. */
  def cmsMerge(c: Column): Column =
    GraftSqlBridge.column(
      CmsMergeState(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Point-frequency estimate of `v` against Count-Min state `state`. */
  def cmsCount(state: Column, v: Column): Column =
    GraftSqlBridge.column(
      CmsCount(GraftSqlBridge.expression(state), GraftSqlBridge.expression(v)))

  /** SQL builder for graft_cms_state(col[, depth[, width]]). */
  private[graft] def cmsStateBuilder(es: Seq[Expression]): Expression = {
    if (es.isEmpty || es.length > 3) throw new IllegalArgumentException(
      s"graft_cms_state expects (col[, depth[, width]]), got ${es.length} arguments")
    val d = if (es.length >= 2) foldedInt(es(1), "graft_cms_state depth") else 5
    val w = if (es.length == 3) foldedInt(es(2), "graft_cms_state width") else 2048
    CmsState(es.head, d, w).toAggregateExpression()
  }

  /** SQL builder for graft_cms_merge(stateCol). */
  private[graft] def cmsMergeBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 1) throw new IllegalArgumentException(
      s"graft_cms_merge expects (stateCol), got ${es.length} arguments")
    CmsMergeState(es.head).toAggregateExpression()
  }

  /** SQL builder for graft_cms_count(stateCol, value). */
  private[graft] def cmsCountBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 2) throw new IllegalArgumentException(
      s"graft_cms_count expects (stateCol, value), got ${es.length} arguments")
    CmsCount(es(0), es(1))
  }

  /** SQL builder for graft_bloom_state(col[, numBits[, numHashes]]). */
  private[graft] def bloomStateBuilder(es: Seq[Expression]): Expression = {
    if (es.isEmpty || es.length > 3) throw new IllegalArgumentException(
      s"graft_bloom_state expects (col[, numBits[, numHashes]]), got ${es.length} arguments")
    val bits = if (es.length >= 2) foldedInt(es(1), "graft_bloom_state numBits") else 1 << 22
    val k = if (es.length == 3) foldedInt(es(2), "graft_bloom_state numHashes") else 5
    BloomState(es.head, bits, k).toAggregateExpression()
  }

  /** SQL builder for graft_bloom_merge(stateCol). */
  private[graft] def bloomMergeBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 1) throw new IllegalArgumentException(
      s"graft_bloom_merge expects (stateCol), got ${es.length} arguments")
    BloomMergeState(es.head).toAggregateExpression()
  }

  /** SQL builder for graft_bloom_contains(stateCol, value). */
  private[graft] def bloomContainsBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 2) throw new IllegalArgumentException(
      s"graft_bloom_contains expects (stateCol, value), got ${es.length} arguments")
    BloomContains(es(0), es(1))
  }

  /** SQL builder for graft_hll(col[, precision]) — precision must fold. */
  private[graft] def hllBuilder(es: Seq[Expression]): Expression = {
    if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
      s"graft_hll expects (col[, precision]), got ${es.length} arguments")
    val p = if (es.length == 2) foldedInt(es(1), "graft_hll precision") else 12
    HllDistinct(es.head, p).toAggregateExpression()
  }

  /** SQL builder for graft_hll_state(col[, precision]). */
  private[graft] def hllStateBuilder(es: Seq[Expression]): Expression = {
    if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
      s"graft_hll_state expects (col[, precision]), got ${es.length} arguments")
    val p = if (es.length == 2) foldedInt(es(1), "graft_hll_state precision") else 12
    HllState(es.head, p).toAggregateExpression()
  }

  /** SQL builder for graft_hll_merge(stateCol). */
  private[graft] def hllMergeBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 1) throw new IllegalArgumentException(
      s"graft_hll_merge expects (stateCol), got ${es.length} arguments")
    HllMergeEstimate(es.head).toAggregateExpression()
  }

  /** SQL builder for graft_kll_state(col[, k]). */
  private[graft] def kllStateBuilder(es: Seq[Expression]): Expression = {
    if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
      s"graft_kll_state expects (col[, k]), got ${es.length} arguments")
    val k = if (es.length == 2) foldedInt(es(1), "graft_kll_state k") else 200
    KllState(es.head, k).toAggregateExpression()
  }

  /** SQL builder for graft_kll_merge(stateCol, array(ranks...)). */
  private[graft] def kllMergeBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 2) throw new IllegalArgumentException(
      s"graft_kll_merge expects (stateCol, ranks), got ${es.length} arguments")
    if (!es(1).foldable) throw new IllegalArgumentException(
      "graft_kll_merge ranks must be a literal array of doubles")
    val phis = es(1).eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(
        s"graft_kll_merge ranks must be array<double>, got $other")
    }
    KllMergeQuantiles(es.head, phis).toAggregateExpression()
  }

  /** SQL builder for graft_kll(col, array(ranks...)[, k]) — ranks fold. */
  private[graft] def kllBuilder(es: Seq[Expression]): Expression = {
    if (es.length < 2 || es.length > 3) throw new IllegalArgumentException(
      s"graft_kll expects (col, ranks[, k]), got ${es.length} arguments")
    if (!es(1).foldable) throw new IllegalArgumentException(
      "graft_kll ranks must be a literal array of doubles")
    val phis = es(1).eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(
        s"graft_kll ranks must be array<double>, got $other")
    }
    val k = if (es.length == 3) foldedInt(es(2), "graft_kll k") else 200
    KllQuantiles(es.head, phis, k).toAggregateExpression()
  }

  private def foldedInt(e: Expression, what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}
