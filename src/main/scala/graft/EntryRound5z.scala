package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TextFixtures

/** Round-5 twenty-sixth batch: contamination closure over near-dup
  * clusters — the governance rule that a benchmark hit anywhere in a
  * near-duplicate cluster taints EVERY member (a paraphrased copy of a
  * contaminated document is just as contaminated), composed from the
  * exact-Jaccard pair join and connected components and gated by a
  * recursive-CTE oracle. */
object EntryRound5z {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q219_contamination_closure" -> ((s, dir) => {
      import graft.text.TextOps
      val corpus = TextFixtures.nearDupCorpus(s, dir,
        " graftmark near dup copy")
      val comps = TextOps.dedupComponents(corpus, "doc_id", "text",
        n = 3, tau = 0.5)
      val flagged = corpus.select(col("doc_id"),
        (col("doc_id") % 19 === 0).as("direct"))
      val cl = comps.join(flagged, "doc_id")
        .transform(graft.spark.PersistTracker.persist)
      val dirty = cl.groupBy("rep_id")
        .agg(max(when(col("direct"), 1).otherwise(0)).as("dirty"))
      cl.join(dirty, "rep_id")
        .select(col("doc_id"), col("rep_id"), col("direct"),
          (col("dirty") === 1).as("contaminated"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(

    "q219_contamination_closure" -> {
      val corpusSql = TextFixtures.nearDupCorpusSql(" graftmark near dup copy")
      s"""WITH RECURSIVE
         |nodes AS (SELECT doc_id AS id FROM ($corpusSql) c0),
         |p AS (SELECT id_a, id_b FROM (
         |  ${EntryText.jaccardPairsSql(corpusSql, 0.5)}) jp),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         |          UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |r AS (
         |  SELECT id AS u, id AS v FROM nodes
         |  UNION
         |  SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u),
         |cc AS (SELECT u AS doc_id, min(v) AS rep_id FROM r GROUP BY u),
         |fl AS (SELECT doc_id, doc_id % 19 = 0 AS direct FROM ($corpusSql) c1),
         |dr AS (SELECT rep_id,
         |         max(CASE WHEN direct THEN 1 ELSE 0 END) AS dirty
         |       FROM cc JOIN fl USING (doc_id) GROUP BY 1)
         |SELECT cc.doc_id, cc.rep_id, fl.direct,
         |  dr.dirty = 1 AS contaminated
         |FROM cc JOIN fl USING (doc_id) JOIN dr USING (rep_id)
         |ORDER BY doc_id""".stripMargin
    }
  )
}
