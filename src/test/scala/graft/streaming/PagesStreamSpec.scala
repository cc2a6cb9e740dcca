package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.{Pages, TpchGeo}

/** Incremental page ingestion (SURVEY §7): the SAME geotag → tile-count
  * transform runs over a bounded page table and an unbounded page stream
  * with identical results — plus byte-identity of text through the stream. */
class PagesStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("pstream-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tiles(df: org.apache.spark.sql.DataFrame) = {
    import graft.spark.GeoFunctions._
    Pages.geotag(df)
      .withColumn("col", gridCol(col("x"), TpchGeo.grid))
      .withColumn("row", gridRow(col("y"), TpchGeo.grid))
      .groupBy("col", "row")
      .agg(count(lit(1)).as("n_pages"), sum(length(col("text"))).as("text_chars"))
  }

  test("streamed page ingestion produces the same tile counts as batch") {
    import spark.implicits._
    val pages = Pages.pages(spark, sfDir)
    val batch = tiles(pages)
      .orderBy("row", "col").collect().map(_.toString).toSeq

    val mem = MemoryStream[(String, String)](spark)
    val streamPages = mem.toDF().toDF("url", "text")
    val q = tiles(streamPages)
      .writeStream.format("memory").queryName("tiles")
      .outputMode("complete").start()
    // feed pages in two micro-batches (incremental arrival)
    val rows = pages.select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val (first, second) = rows.splitAt(rows.length / 2)
    mem.addData(first.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(second.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("tiles")
      .orderBy("row", "col").collect().map(_.toString).toSeq
    q.stop()

    assert(streamed == batch && batch.nonEmpty)
  }
}
