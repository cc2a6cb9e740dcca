package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr
import graft.text.WeightedSample.hexValSql

/** Rendezvous (highest-random-weight) hashing for STABLE shard
  * assignment: every (key, shard) pair gets a content-free score and the
  * key lives on the arg-max shard. Growing the fleet from N to N+1
  * shards moves only the keys whose new shard wins — ~1/(N+1) of them in
  * expectation — where a mod-N assignment reshuffles almost everything.
  * That stability is what makes sharded incremental processing
  * (per-shard checkpoints, per-shard dedup state) survive a resize.
  *
  * The score is the portable md5 character arithmetic the sampling
  * operators already use ([[graft.text.WeightedSample.hexValSql]]) — no
  * engine-specific hash builtin, so any SQL engine replays assignments
  * exactly. The whole assignment is one narrow per-row expression
  * (transform + array_max), no shuffle and no UDF. */
object Sharding {

  /** Arg-max shard in `0 until shards` for `keyCol` (ties impossible in
    * practice at 24-bit scores, broken toward the smaller shard id —
    * `array_position` returns the FIRST maximum). */
  def hrwShard(keyCol: String, shards: Int): Column = {
    require(shards >= 1 && shards <= 4096, s"shards out of range: $shards")
    val score = hexValSql(
      s"concat(CAST($keyCol AS STRING), '#', CAST(sh AS STRING))")
    expr(
      s"""CAST(array_position(
         |  transform(sequence(0, ${shards - 1}), sh -> $score),
         |  array_max(transform(sequence(0, ${shards - 1}), sh -> $score)))
         |  - 1 AS INT)""".stripMargin)
  }
}
