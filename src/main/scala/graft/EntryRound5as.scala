package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 forty-fifth batch: rich-club connectivity of the link graph
  * (do hubs link each other more than chance), Fellegi–Sunter record
  * linkage with blocking (integer log-odds agreement weights), and a
  * prefix-free URL audit via the sorted-adjacent-pair trick (a set is
  * prefix-free iff no element prefixes its lexicographic successor). */
object EntryRound5as {

  /** The q150 undirected link graph: src/dst over 97 hosts. */
  private def linkEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
      .select((col("doc_id") % 97).as("src"),
        ((col("doc_id") * 31 + col("p")) % 97).as("dst"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // rich-club: for k = 1..max, phi(k) in micro-units = 1e6 · 2·E_k /
    // (N_k·(N_k−1)) where N_k = hubs with degree > k and E_k = edges among
    // them — degree join + one aggregation per side, never an N_k² product
    "q273_rich_club" -> ((s, dir) => {
      val und = linkEdges(s, dir)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct()
        .transform(graft.spark.PersistTracker.persist)
      val deg = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .transform(graft.spark.PersistTracker.persist)
      val ks = s.range(1, 13).select(col("id").as("k"))
      val nk = ks.join(deg, col("deg") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_k"))
      val ek = und
        .join(deg.withColumnsRenamed(Map("id" -> "a", "deg" -> "da")), "a")
        .join(deg.withColumnsRenamed(Map("id" -> "b", "deg" -> "db")), "b")
        .crossJoin(broadcast(ks))
        .where(col("da") > col("k") && col("db") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("e_k"))
      nk.join(ek, Seq("k"), "left")
        .select(col("k"), col("n_k"),
          coalesce(col("e_k"), lit(0L)).as("e_k"))
        .where(col("n_k") >= 2)
        .withColumn("phi_e6",
          expr("(2000000 * e_k) div (n_k * (n_k - 1))"))
    }),

    // record linkage: candidate pairs from host blocking, agreement
    // vector on (lang, length bucket, source), Fellegi–Sunter score as
    // fixed integer log-odds (agree: +m_i, disagree: −u_i), classify at
    // the review/match thresholds — ≤ block² pairs, never corpus²
    "q274_record_linkage" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), (col("doc_id") % 97).as("blk"),
          col("lang"), col("source"),
          expr("n_chars div 50").as("lb"))
      val a = recs.toDF("id_a", "blk", "lang_a", "src_a", "lb_a")
      val b = recs.toDF("id_b", "blk", "lang_b", "src_b", "lb_b")
      a.join(b, "blk").where(col("id_a") < col("id_b"))
        .withColumn("score",
          when(col("lang_a") === col("lang_b"), 24).otherwise(-8) +
          when(col("lb_a") === col("lb_b"), 30).otherwise(-6) +
          when(col("src_a") === col("src_b"), 11).otherwise(-13))
        .withColumn("cls",
          when(col("score") >= 50, "match")
            .when(col("score") >= 20, "review").otherwise("nonmatch"))
        .groupBy("blk", "cls").agg(count(lit(1)).as("n_pairs"))
    }),

    // prefix-free audit: sort URLs once (distributed rank), test ONLY
    // adjacent pairs — a URL set has a prefix violation iff some element
    // prefixes its immediate lexicographic successor; O(n log n), not n²
    "q275_prefix_audit" -> ((s, dir) => {
      val urls = fixtures.Pages.pages(s, dir).select("url")
        .unionAll(s.read.parquet(s"$dir/documents.parquet")
          .where(col("doc_id") % 10 === 0) // inject real prefix parents
          .select(concat(lit("https://host"),
            (col("doc_id") % 97).cast("string"),
            lit(".example.org/doc/"), col("doc_id").cast("string"),
            lit("/amp")).as("url")))
        .distinct()
      val ranked = graft.operators.StrPack.groupedRank(
        urls, Nil, "url", "url", "r")
      val succ = ranked.select(col("url").as("next_url"),
        (col("r") - 1).as("r"))
      ranked.join(succ, "r")
        .where(col("next_url").startsWith(col("url")))
        .select(col("url").as("prefix_url"), col("next_url"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q273_rich_club" ->
      """WITH e0 AS (SELECT DISTINCT doc_id % 97 AS a0,
        |    (doc_id * 31 + p) % 97 AS b0
        |  FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
        |  WHERE doc_id % 5 <> 0),
        |e AS (SELECT DISTINCT least(a0, b0) AS a, greatest(a0, b0) AS b
        |      FROM e0 WHERE a0 <> b0),
        |deg AS (SELECT id, count(*) AS deg FROM
        |    (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY id),
        |ks AS (SELECT unnest(range(1, 13)) AS k),
        |nk AS (SELECT k, count(*) AS n_k
        |       FROM ks JOIN deg ON deg.deg > ks.k GROUP BY k),
        |ek AS (SELECT k, count(*) AS e_k
        |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
        |  CROSS JOIN ks
        |  WHERE da.deg > ks.k AND db.deg > ks.k GROUP BY k)
        |SELECT CAST(nk.k AS BIGINT) AS k, CAST(n_k AS BIGINT) AS n_k,
        |  CAST(coalesce(e_k, 0) AS BIGINT) AS e_k,
        |  CAST((2000000 * coalesce(e_k, 0)) // (n_k * (n_k - 1))
        |    AS BIGINT) AS phi_e6
        |FROM nk LEFT JOIN ek ON ek.k = nk.k
        |WHERE n_k >= 2""".stripMargin,

    "q274_record_linkage" ->
      """WITH r AS (SELECT doc_id, doc_id % 97 AS blk, lang, source,
        |    n_chars // 50 AS lb FROM documents),
        |p AS (SELECT a.blk,
        |    (CASE WHEN a.lang = b.lang THEN 24 ELSE -8 END)
        |    + (CASE WHEN a.lb = b.lb THEN 30 ELSE -6 END)
        |    + (CASE WHEN a.source = b.source THEN 11 ELSE -13 END)
        |      AS score
        |  FROM r a JOIN r b ON b.blk = a.blk AND a.doc_id < b.doc_id)
        |SELECT CAST(blk AS BIGINT) AS blk,
        |  CASE WHEN score >= 50 THEN 'match'
        |       WHEN score >= 20 THEN 'review' ELSE 'nonmatch' END AS cls,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1, 2""".stripMargin,

    "q275_prefix_audit" ->
      """WITH u AS (
        |  SELECT concat('https://host', CAST(doc_id % 97 AS VARCHAR),
        |    '.example.org/doc/', CAST(doc_id AS VARCHAR)) AS url
        |  FROM documents
        |  UNION
        |  SELECT concat('https://host', CAST(doc_id % 97 AS VARCHAR),
        |    '.example.org/doc/', CAST(doc_id AS VARCHAR), '/amp')
        |  FROM documents WHERE doc_id % 10 = 0),
        |l AS (SELECT url, lead(url) OVER (ORDER BY url) AS next_url
        |      FROM u)
        |SELECT url AS prefix_url, next_url
        |FROM l
        |WHERE next_url IS NOT NULL AND starts_with(next_url, url)""".stripMargin
  )
}
