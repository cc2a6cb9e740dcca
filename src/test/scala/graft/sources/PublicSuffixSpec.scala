package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PublicSuffixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("psl-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val sfx = Seq("com", "uk", "co.uk", "io", "github.io")

  private def etld1(hosts: String*): Map[String, Option[String]] = {
    val s = spark
    import s.implicits._
    PublicSuffix.registrable(hosts.toDF("host"), "host", sfx)
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
  }

  test("longest suffix wins: co.uk beats uk, github.io beats io") {
    val m = etld1("a.b.site.co.uk", "deep.www.site.uk",
      "user.github.io", "plain.io")
    assert(m("a.b.site.co.uk") === Some("site.co.uk"))
    assert(m("deep.www.site.uk") === Some("site.uk"))
    assert(m("user.github.io") === Some("user.github.io"))
    assert(m("plain.io") === Some("plain.io"))
  }

  test("a bare public suffix and an unmatched host map to null") {
    val m = etld1("co.uk", "com", "example.dev")
    assert(m("co.uk") === None)
    assert(m("com") === None)
    assert(m("example.dev") === None)
  }

  test("suffix match is label-aligned, not substring: notcom is unmatched") {
    val m = etld1("site.notcom", "sitecom")
    assert(m("site.notcom") === None)
    assert(m("sitecom") === None)
  }
}
