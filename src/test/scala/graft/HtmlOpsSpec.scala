package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.HtmlOps

/** Gates for HTML boilerplate extraction (q95): parser unit vectors
  * (entities, comments, raw-text tags, malformed input), the planted-chrome
  * end-to-end test with BYTE-EXACT body reconstruction, the zero-shuffle
  * plan gate, and the golden-freshness gate — SQL cannot parse HTML, so
  * the driver compares q95 against a checked-in parquet; this spec
  * recomputes against LIVE sf0.01 testdata (the AudioDedupSpec contract).
  */
class HtmlOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("html-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q95_boilerplate.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  test("parser: blocks, chrome context, link density, entities, comments") {
    val html = "<html><head><title>T</title><style>p{}</style>" +
      "<script>if(1<2){x()}</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<!-- hidden --><p>Real content words here</p>" +
      "<div><a href=\"/r\">Link</a> <a href=\"/s\">List</a></div>" +
      "<p>Tom &amp; Jerry &#169; now</p>" +
      "<footer><p>Copyright words galore for test</p></footer></body></html>"
    val bs = HtmlOps.blocks(html)
    // title/style/script/comment text never appears
    assert(!bs.exists(b => b.text.contains("T") && b.text.length == 1))
    assert(!bs.exists(_.text.contains("p{}")))
    assert(!bs.exists(_.text.contains("x()")))
    assert(!bs.exists(_.text.contains("hidden")))
    val nav = bs.find(_.text.contains("Home")).get
    assert(nav.inChrome && nav.linkWords == nav.words)
    val content = bs.find(_.text.startsWith("Real")).get
    assert(content.isContent && content.words == 4 && content.linkWords == 0)
    val linkList = bs.find(_.text.contains("Link")).get
    assert(!linkList.inChrome && !linkList.isContent, "link-dense div must be dropped")
    val entity = bs.find(_.text.contains("Jerry")).get
    assert(entity.text == "Tom & Jerry © now")
    val footer = bs.find(_.text.contains("Copyright")).get
    assert(footer.inChrome && !footer.isContent,
      "footer prose passes the density rule — only the tag context catches it")
  }

  test("parser: '>' inside quoted attribute values does not close the tag") {
    val bs = HtmlOps.blocks(
      "<p><a href=\"/x?a>b\" title='y>z'>link text</a> tail words here</p>")
    assert(bs.length == 1)
    assert(bs.head.text == "link text tail words here")
    assert(bs.head.linkWords == 2, "only the anchor's words count as link words")
  }

  test("parser: mixed-case raw-text tags are skipped case-insensitively") {
    val bs = HtmlOps.blocks(
      "<SCRIPT>var leaked=1;</ScRiPt><p>visible content here</p>" +
        "<STYLE>p{color:red}</style><p>more visible words</p>")
    assert(!bs.exists(_.text.contains("leaked")))
    assert(!bs.exists(_.text.contains("color")))
    assert(bs.map(_.text) == Vector("visible content here", "more visible words"))
  }

  test("parser: numeric entities — hex, supplementary plane, out-of-range verbatim") {
    // hex reference
    assert(HtmlOps.blocks("<p>a &#xA9; b</p>").head.text == "a © b")
    // supplementary plane (emoji) must not truncate to the low 16 bits
    assert(HtmlOps.blocks("<p>hi &#128512; yo</p>").head.text
      == "hi " + new String(Character.toChars(128512)) + " yo")
    assert(HtmlOps.blocks("<p>hx &#x1F600; yo</p>").head.text
      == "hx " + new String(Character.toChars(0x1F600)) + " yo")
    // out-of-range / malformed pass through verbatim, never wrap
    assert(HtmlOps.blocks("<p>bad &#9999999; x</p>").head.text == "bad &#9999999; x")
    assert(HtmlOps.blocks("<p>bad &#xZZ; x</p>").head.text == "bad &#xZZ; x")
    // surrogate code points are valid-per-isValidCodePoint but would emit
    // unpaired UTF-16 — verbatim pass-through, not a lone surrogate
    assert(HtmlOps.blocks("<p>s &#xD800; y</p>").head.text == "s &#xD800; y")
    assert(HtmlOps.blocks("<p>s &#57343; y</p>").head.text == "s &#57343; y")
  }

  test("parser survives random tag soup without throwing or leaking raw text") {
    val rng = new scala.util.Random(7)
    val pieces = Seq("<div>", "</div>", "<p ", "a=\">\"", ">", "<", "&", "&#x",
      "&#", ";", "<script>", "</ScRiPt>", "<!--", "-->", "text ", "&amp;",
      "\"", "'", "<style", "LEAKME", "</style>", "&#x1F600;", "&#999999999;")
    (0 until 300).foreach { _ =>
      val s = Vector.fill(rng.nextInt(40))(pieces(rng.nextInt(pieces.length))).mkString
      HtmlOps.blocks(s) // must never throw, whatever the soup
    }
    // a well-formed raw-text region never leaks, regardless of close-tag case
    val bs = HtmlOps.blocks("<script>var LEAKME=1;</SCRIPT><p>ok words</p>")
    assert(!bs.exists(_.text.contains("LEAKME")))
  }

  test("parser: malformed input degrades, never throws") {
    assert(HtmlOps.blocks("no tags at all").nonEmpty)
    assert(HtmlOps.blocks("<p>unclosed everything").head.text == "unclosed everything")
    assert(HtmlOps.blocks("stray < bracket").nonEmpty)
    assert(HtmlOps.blocks("<script>never closed").isEmpty)
    assert(HtmlOps.blocks("").isEmpty)
    assert(HtmlOps.blocks("&badentity; x").head.text == "&badentity; x")
  }

  test("planted chrome is removed; body reconstructs byte-exactly") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    (0L until 20L).foreach { id =>
      val content = HtmlOps.contentBlocks(HtmlOps.syntheticPage(id, text))
      assert(content.mkString(" ") == text,
        s"id=$id body must reconstruct byte-exactly, got: ${content.mkString(" ")}")
    }
    val all = HtmlOps.blocks(HtmlOps.syntheticPage(3L, text))
    val chromeTexts = all.filterNot(_.isContent).map(_.text)
    assert(chromeTexts.exists(_.contains("Home")), "nav must be present but dropped")
    assert(chromeTexts.exists(_.contains("Copyright")), "footer present but dropped")
    assert(chromeTexts.exists(_.contains("Related")), "link-dense div present but dropped")
    assert(chromeTexts.exists(_.contains("Trending")), "aside present but dropped")
  }

  test("q95 extraction reconstructs every sf0.01 document byte-exactly") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val got = SparkEntry.queries("q95_boilerplate")(spark, sfDir)
      .join(docs, "doc_id")
      .filter(col("body") =!= col("text"))
      .count()
    assert(got == 0L, s"$got documents failed byte-exact body reconstruction")
  }

  test("plan shape: extraction is a zero-shuffle projection") {
    val df = {
      import spark.implicits._
      Seq((1L, "a b c d e f")).toDF("doc_id", "text").as[(Long, String)]
        .mapPartitions(_.map { case (id, t) =>
          (id, HtmlOps.contentBlocks(HtmlOps.syntheticPage(id, t)).mkString(" "))
        }).toDF("doc_id", "body")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("q95 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File(goldenPath).exists(), s"$goldenPath not generated yet")
    val live = SparkEntry.queries("q95_boilerplate")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q95 golden is STALE — regenerate per the q95 oracle comment in " +
        "PipelineQueries before the driver's compare runs")
  }
}
