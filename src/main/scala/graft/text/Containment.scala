package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Asymmetric containment dedup: |shingles(A) ∩ shingles(B)| / |shingles(A)|
  * over word n-grams — the clone/subsumption detector Jaccard misses (a
  * paragraph quoted inside a 10× longer page has low Jaccard but
  * containment ≈ 1, and the SHORTER side is the one a dedup pass drops).
  *
  * Plan: distinct (id, shingle) postings → self equi-join ON THE SHINGLE
  * (the inverted-index candidate generation — never an all-pairs product)
  * → per ordered pair shared count → divide by |A| in milli-units
  * (integer, engine-exact). Hot boilerplate shingles are the quadratic
  * risk at crawl scale, so `maxDf` drops shingles appearing in more than
  * that many docs BEFORE the self-join — the PPJoin-style frequency
  * pruning; a dropped shingle can only LOWER a containment estimate, and
  * boilerplate is exactly what containment should not score on. */
object Containment {

  /** Ordered pairs (id_a, id_b, cont_milli) with
    * cont_milli = 1000·shared div |shingles(a)| ≥ tauMilli. Word n-grams
    * (default trigrams); docs with fewer than n tokens have no shingles
    * and never appear. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, tauMilli: Int = 800,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    require(n >= 1 && tauMilli >= 0, s"bad n=$n tauMilli=$tauMilli")
    val idx = (0 until n).map(i => s"toks[i + $i]").mkString(", ")
    val shingles = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(toks) - $n), " +
          s"i -> concat_ws(' ', $idx)))")).as("sh"))
      .transform(graft.spark.PersistTracker.persist) // sizes + join below
    val pruned =
      if (maxDf == Long.MaxValue) shingles
      else {
        val hot = shingles.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDf).select("sh")
        shingles.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val sizes = shingles.groupBy("id").agg(count(lit(1)).as("sa"))
    pruned.alias("x")
      .join(pruned.alias("y"),
        col("x.sh") === col("y.sh") && col("x.id") =!= col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a"), "id_a")
      .select(col("id_a"), col("id_b"),
        expr("(1000 * shared) div sa").as("cont_milli"))
      .where(col("cont_milli") >= tauMilli)
  }
}
