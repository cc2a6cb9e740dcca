package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-center greedy (Gonzalez 1985) diverse-subset selection — the classic
  * coreset recipe for training-data diversity: repeatedly pick the point
  * FARTHEST from everything chosen so far (2-approximation of the k-center
  * optimum). Over int8-quantized embeddings every distance is an exact
  * long, so the selection trace is bit-reproducible on any engine.
  *
  * Scale shape: the selected set is k rows (driver-side by construction —
  * that's the output); each round is ONE narrow map over the corpus
  * (update running min-distance against the single new center, broadcast
  * as a literal) + one argmax aggregate. k rounds total; the corpus never
  * shuffles — the min-distance column lives with the vectors.
  */
object Coreset {

  /** df(idCol, vecCol float[]) → (sel_order, id, dist_sq): the greedy
    * trace — dist_sq is the point's min distance² to the previously
    * selected set at pick time (0 for the seed = min id). Ties broken by
    * min id. */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val q = Quantize.int8(df, idCol, vecCol).localCheckpoint(true)

    def d2(other: Array[Int]) =
      expr(s"aggregate(zip_with(q8, array(${other.mkString(",")})," +
        " (a, b) -> cast((a - b) * (a - b) as bigint)), 0L," +
        " (acc, x) -> acc + x)")

    val seed = q.orderBy("id").limit(1)
      .select(col("id"), col("q8")).head
    var picks = List((seed.getLong(0), 0L))
    var cur = seed.getSeq[Int](1).toArray
    var md = q.withColumn("md", d2(cur)).localCheckpoint(true)
    var round = 1
    while (round < k) {
      val top = md.where(!col("id").isin(picks.map(_._1): _*))
        .orderBy(col("md").desc, col("id").asc).limit(1)
        .select(col("id"), col("md"), col("q8")).head
      picks ::= (top.getLong(0), top.getLong(1))
      cur = top.getSeq[Int](2).toArray
      md = md.withColumn("md", least(col("md"), d2(cur)))
        .localCheckpoint(true)
      round += 1
    }
    picks.reverse.zipWithIndex
      .map { case ((id, d), i) => (i, id, d) }
      .toDF("sel_order", "id", "dist_sq")
  }
}
