package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TextFixtures

/** Round-5 sixteenth batch: gazetteer-dictionary geotagging from page
  * TEXT (the north star's "geotagged from page metadata" step done from
  * content, not url arithmetic) and the language-ID confusion matrix —
  * each gated by a closed-form DuckDB oracle. */
object EntryRound5p {

  private def hv(e: String) = graft.text.WeightedSample.hexValSql(e)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gazetteer geotagging: a broadcast (place-name → cell) dictionary
    // (established vocabulary, deterministic md5 cell assignment) matched
    // against document text; the document's cell is the majority vote
    // (count DESC, col ASC, row ASC). One narrow explode + broadcast
    // join + two keyed aggs — the geotag stage a content-based pipeline
    // runs where q02/q21 use url-derived coordinates.
    "q196_gazetteer_geotag" -> ((s, dir) => {
      import graft.text.Bpe
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val gaz = Bpe.wordDict(docs, "text")
        .where(col("freq") >= 20)
        .select(col("w"),
          expr(s"CAST(${hv("w")} % 8 + 1 AS INT)").as("gcol"),
          expr(s"CAST((${hv("w")} div 8) % 8 + 1 AS INT)").as("grow"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(broadcast(gaz), "w")
        .groupBy("doc_id", "gcol", "grow").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(min(struct((-col("c")).as("nc"), col("gcol"), col("grow")))
          .as("m"), sum("c").as("n_hits"))
        .select(col("doc_id"), col("m.gcol").as("col"),
          col("m.grow").as("row"), col("n_hits"))
        .orderBy("doc_id")
    }),

    // language-ID confusion matrix: the n-gram classifier's prediction
    // (q13's operator) against the table's label — the eval a lang
    // filter change reads before shipping
    "q197_langid_confusion" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"),
          graft.text.TextOps.langId(col("text"), TextFixtures.langProfiles)
            .as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"))
  )

  /** DuckDB stopword count (the q13 oracle's kernel). */
  private def stopCnt(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> x IN (${
      words.map(w => s"'$w'").mkString(", ")})))"

  def oracles: Map[String, String] = Map(

    "q196_gazetteer_geotag" ->
      s"""WITH wd AS (SELECT w, count(*) AS freq FROM
         |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]{2,20}$$') GROUP BY 1),
         |gaz AS (SELECT w, CAST(${hv("w")} % 8 + 1 AS INT) AS gcol,
         |          CAST((${hv("w")} // 8) % 8 + 1 AS INT) AS grow
         |        FROM wd WHERE freq >= 20),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents),
         |h AS (SELECT doc_id, gcol, grow, count(*) AS c
         |      FROM tok JOIN gaz USING (w) GROUP BY 1, 2, 3),
         |r AS (SELECT doc_id, gcol, grow,
         |        sum(c) OVER (PARTITION BY doc_id) AS nh,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY c DESC, gcol, grow) AS rn FROM h)
         |SELECT doc_id, gcol AS col, grow AS "row",
         |  CAST(nh AS BIGINT) AS n_hits
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q197_langid_confusion" -> {
      val scores = TextFixtures.langProfiles.zipWithIndex.map {
        case ((lang, words), pos) =>
          s"SELECT doc_id, '$lang' AS lp, $pos AS pos, ${stopCnt(words)} AS score FROM documents"
      }.mkString("\nUNION ALL ")
      s"""WITH s AS ($scores),
         |r AS (SELECT doc_id, lp, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, pos) AS rn FROM s),
         |p AS (SELECT doc_id, lp AS lang_pred FROM r WHERE rn = 1)
         |SELECT d.lang, p.lang_pred, count(*) AS n
         |FROM documents d JOIN p USING (doc_id)
         |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin
    }
  )
}
