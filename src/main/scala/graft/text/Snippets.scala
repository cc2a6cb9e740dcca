package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-result snippet extraction: for each (query, retrieved doc), the
  * fixed-width token window containing the MOST query-term occurrences
  * (ties → earliest window) plus its reconstructed text — the highlight
  * step a retrieval stack runs over its top-k, not the corpus.
  *
  * Shape: the corpus is first semi-joined to the top-k ids (snippets are
  * per retrieved doc — the scan never tokenizes the full corpus), then
  * per-doc work is a position explode, a keyed (id) equi-join with the
  * window-start rows filtered by the in-window range predicate, and one
  * (qid, id) keyed struct-min argmax — NO window function, no sort, so
  * the plan has no single-partition risk at any corpus size. */
object Snippets {

  /** `topk` = (qid, id, …) retrieved pairs; `queries` = (qid, terms).
    * Returns (qid, id, start, n_hits, snippet) — `start` the 0-based token
    * index of the best `width`-token window. */
  def bestWindows(docs: DataFrame, idCol: String, textCol: String,
                  topk: DataFrame, queries: Seq[(Int, Seq[String])],
                  width: Int = 8): DataFrame = {
    require(width > 0, s"width must be positive (got $width)")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "w")
    val hits = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .join(topk.select("id").distinct(), Seq("id"), "left_semi")
      .transform(graft.spark.PersistTracker.persist) // hit scan + snippet join
    val toks = hits.select(col("id"), size(col("toks")).as("n"),
      posexplode(col("toks")))
    // query-term occurrence positions: tiny after the broadcast term filter
    val qpos = toks.join(broadcast(qterms), toks("col") === qterms("w"))
      .select(col("qid"), col("id"), col("pos").as("p"))
    // candidate window starts: every token index that can begin a full
    // window (clipped so short docs still expose start 0)
    val starts = toks
      .where(col("pos") <= greatest(col("n") - width, lit(0)))
      .select(col("id"), col("pos").as("st"))
    val scored = qpos
      .join(starts, Seq("id"))
      .where(col("p") >= col("st") && col("p") < col("st") + width)
      .groupBy("qid", "id", "st")
      .agg(count(lit(1)).as("n_hits"))
    // argmax (n_hits desc, st asc) via one struct min — the KMeansInt
    // tie-break discipline, a keyed aggregate instead of a rank window
    val best = scored
      .groupBy("qid", "id")
      .agg(min(struct((-col("n_hits")).as("neg"), col("st"))).as("m"))
      .select(col("qid"), col("id"), col("m.st").as("start"),
        (-col("m.neg")).as("n_hits"))
    best
      .join(topk.select(col("qid"), col("id")), Seq("qid", "id"), "left_semi")
      .join(hits, "id")
      .select(col("qid"), col("id"), col("start").cast("long").as("start"),
        col("n_hits"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(width)))
          .as("snippet"))
  }
}
