package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consistent-hash ring sharding — the classic "only K/n keys move when a
  * node joins" assignment (Karger et al. 1997), complementing the
  * rendezvous-hash resharder (q190): rendezvous recomputes max-weight per
  * key; the ring stores V virtual points per node and assigns each key to
  * its clockwise successor. At 100 TB the ring (nodes × vnodes rows, a few
  * thousand) is a BROADCAST dimension: keys join to the ring sliver with a
  * range condition and take min(successor) — no shuffle of the key side
  * beyond its own aggregation, no per-key driver loop.
  *
  * Hashes are exact 32-bit multiplicative (Knuth 2654435761 mod 2^32) so a
  * SQL oracle reproduces every placement bit-for-bit.
  */
object HashRing {

  private def h32(c: org.apache.spark.sql.Column) =
    pmod(c * lit(2654435761L), lit(4294967296L))

  /** Ring of `nodes` × `vnodes` virtual points: (node, vhash). */
  def ring(spark: SparkSession, nodes: Int, vnodes: Int): DataFrame = {
    spark.range(nodes.toLong * vnodes)
      .select((col("id") / vnodes).cast("long").as("node"),
        h32(col("id") * 7919L + 13L).as("vhash"))
  }

  /** keys(keyCol) → (keyCol, khash, node): each key's clockwise successor
    * on the ring, wrapping past the top to the global minimum vhash. */
  def assign(keys: DataFrame, keyCol: String, ringDf: DataFrame): DataFrame = {
    val hashed = keys.withColumn("khash", h32(col(keyCol)))
    // successor = min vhash >= khash; fall back to the ring's first point.
    // ordering key vhash·2^16 + node: total order with deterministic
    // node tie-break on vhash collisions (node count < 2^16 by contract)
    val ord = col("vhash") * 65536L + col("node")
    val succ = hashed.join(broadcast(ringDf), col("vhash") >= col("khash"))
      .groupBy(keyCol, "khash")
      .agg(min_by(col("node"), ord).as("node"))
    val wrap = broadcast(ringDf
      .select(min_by(col("node"), ord).as("wrap_node")))
    hashed.join(succ.select(col(keyCol), col("node")), Seq(keyCol), "left")
      .crossJoin(wrap)
      .select(col(keyCol), col("khash"),
        coalesce(col("node"), col("wrap_node")).as("node"))
  }
}
