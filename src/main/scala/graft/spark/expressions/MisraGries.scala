package graft.spark.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native Catalyst
  * `TypedImperativeAggregate` — the engine's first-class mergeable
  * aggregate (usable in any `agg(...)`, partial-aggregated map-side like
  * every built-in):
  *
  * state = at most `k` (item, counter) pairs. update: increment if
  * present; insert at 1 if room; else decrement ALL counters (dropping
  * zeros) — the classic frequent-items algorithm (Misra & Gries 1982).
  * merge: sum counterpart counters, then restore the k-bound by
  * subtracting the (k+1)-th largest counter from all and dropping
  * non-positives (Agarwal et al., mergeable-summaries) — associative
  * error composition, so executor partials merge like any hash agg.
  *
  * Guarantee (order-independent even though counter VALUES are merge-
  * order-dependent): every item with true frequency > N/(k+1) is present
  * in the final state. The operator contract therefore treats the sketch
  * as a CANDIDATE GENERATOR: `Frequent.heavyHitters` re-counts the ≤ k
  * candidates exactly (a broadcast-sliver second pass) and filters to
  * the deterministic true-heavy-hitter set — same sketch-then-certify
  * shape as the ANN recall gates (q37/q38).
  *
  * eval returns the candidate items sorted lexically
  * (`ArrayType(StringType)`).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "Misra-Gries needs k > 0")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all; drop zeros (amortized O(1) per stream item)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { kk =>
            val nc = buf(kk) - 1
            if (nc <= 0) dead += kk else buf.update(kk, nc)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (kk, c) =>
      buf.update(kk, buf.getOrElse(kk, 0L) + c)
    }
    if (buf.size > k) {
      val sorted = buf.values.toArray.sortBy(-_)
      val offset = sorted(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { kk =>
        val nc = buf(kk) - offset
        if (nc <= 0) dead += kk else buf.update(kk, nc)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val b = kk.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "misra_gries"
}
