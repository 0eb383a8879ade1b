package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.UrlOps

/** Gates for URL canonicalization (q96): hand-computed canonical forms for
  * every rule, idempotence (canonicalizing a canonical URL is the
  * identity), registrable-domain extraction, and the zero-shuffle plan
  * shape — canonicalization must ride the scan projection.
  */
class UrlOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("url-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).head().getString(0)
  }

  test("each canonicalization rule, hand-computed") {
    // scheme + host case, www alias, https default port, trailing slash,
    // tracking strip, param sort, fragment
    assert(canon("HTTPS://WWW.Site.Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag")
      == "https://site.example.com/a/b?a=1&b=2")
    // http default port dropped; non-default port kept
    assert(canon("http://h.example.com:80/p") == "http://h.example.com/p")
    assert(canon("http://h.example.com:8080/p") == "http://h.example.com:8080/p")
    // :443 is NOT default for http — kept
    assert(canon("http://h.example.com:443/p") == "http://h.example.com:443/p")
    // root path: single trailing slash collapses to empty
    assert(canon("https://h.example.com/") == "https://h.example.com")
    assert(canon("https://h.example.com") == "https://h.example.com")
    // all params tracking → no '?' survives
    assert(canon("https://h.example.com/p?utm_campaign=x&fbclid=1&gclid=2&ref=a")
      == "https://h.example.com/p")
    // 'utmX' is NOT a tracking prefix ('utm_' is) — exact prefix, not LIKE
    assert(canon("https://h.example.com/p?utmx=1&zz=2")
      == "https://h.example.com/p?utmx=1&zz=2")
    // only ONE leading www. is stripped
    assert(canon("https://www.www.h.example.com/p")
      == "https://www.h.example.com/p")
    // query on root path, no slash
    assert(canon("http://h.example.com?b=1&a=2") == "http://h.example.com?a=2&b=1")
  }

  test("userinfo is stripped (RFC 3986 §3.2.1 — dedup must not split on credentials)") {
    assert(canon("https://u:pw@h.example.com/p") == "https://h.example.com/p")
    // multi-'@' (phishing-style user@trusted.com@evil.com): the LAST '@'
    // delimits (WHATWG), so ONE pass reaches the real host — anything else
    // breaks idempotence and splits dedup keys by application count
    assert(canon("http://user@trusted.example.com@evil.example.org/x")
      == "http://evil.example.org/x")
    assert(canon(canon("http://a@b@evil.example.org/"))
      == canon("http://a@b@evil.example.org/"))
    // userinfo + www + explicit port: the port is the one AFTER the '@'
    assert(canon("http://u:pw@WWW.h.example.com:8080/p")
      == "http://h.example.com:8080/p")
    // userinfo only (no path): authority parse still clean
    assert(canon("https://alice@h.example.com") == "https://h.example.com")
  }

  test("host percent-escapes: decode unreserved, verbatim fallback when escapes remain") {
    // %2E-obfuscated host dedups with the plain form
    assert(canon("https://site%2Eexample.com/p") == "https://site.example.com/p")
    assert(canon("https://SITE%2Eexample.com/p") == "https://site.example.com/p")
    // a host still escaped after normalization (reserved %2F) is kept
    // verbatim (lowercased), never half-normalized
    assert(canon("https://h%2Fexample.com/p") == "https://h%2fexample.com/p")
  }

  test("staged and single-Column canonicalization agree on the fixture corpus") {
    import spark.implicits._
    val urls = (0L until 500L).toDF("doc_id")
      .select(col("doc_id"), UrlOps.syntheticUrl(col("doc_id")).as("url"))
    val staged = UrlOps.withCanonicalUrl(urls, col("url"), "curl")
    assert(staged.columns.toSeq == Seq("doc_id", "url", "curl"),
      "no staging temporaries may leak into the output schema")
    val diff = staged
      .withColumn("inline", UrlOps.canonicalizeUrl(col("url")))
      .filter(col("curl") =!= col("inline")).count()
    assert(diff == 0L, "the two evaluation strategies must be byte-identical")
  }

  test("percent-escape normalization: decode unreserved, uppercase reserved") {
    import graft.spark.expressions.PercentKernel
    import org.apache.spark.unsafe.types.UTF8String
    def n(s: String) = PercentKernel.normalize(UTF8String.fromString(s)).toString
    assert(n("/a%7eb") == "/a~b", "unreserved escape decodes")
    assert(n("/a%5A%5ab") == "/aZZb", "hex case does not matter for decoding")
    assert(n("/x%3fq=%2Fv") == "/x%3Fq=%2Fv", "reserved escapes stay, hex uppercased")
    assert(n("/plain") == "/plain")
    assert(n("100%") == "100%", "trailing bare percent copied verbatim")
    assert(n("%zz5") == "%zz5", "malformed escape copied verbatim")
    assert(n("%7e%3f%7e") == "~%3F~", "mixed run")
    assert(n(n("/a%7e%3f")) == n("/a%7e%3f"), "idempotent")
    // Column path agrees with the kernel (exercises codegen evaluation)
    import spark.implicits._
    val via = Seq("/a%7eb", "/x%3fq", "100%", "%zz5").toDF("s")
      .select(graft.pipeline.UrlOps.normalizePercent(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(via == Seq("/a~b", "/x%3Fq", "100%", "%zz5"))
  }

  test("canonicalization applies escape normalization to path and query") {
    assert(canon("https://h.example.com/a%7eb?c%5a=1&b=2")
      == "https://h.example.com/a~b?b=2&cZ=1")
    assert(canon("https://h.example.com/x%3fq") == "https://h.example.com/x%3Fq")
  }

  test("canonicalization is idempotent") {
    import spark.implicits._
    val urls = (0L until 400L).toDF("doc_id")
      .select(UrlOps.canonicalizeUrl(UrlOps.syntheticUrl(col("doc_id"))).as("c1"))
      .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
    assert(urls.filter(col("c1") =!= col("c2")).count() == 0L)
  }

  test("registrable domain: last two labels; short hosts pass through") {
    import spark.implicits._
    val got = Seq("a.b.site.example.com", "example.com", "localhost")
      .toDF("h").select(UrlOps.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "example.com", "localhost"))
  }

  test("registrable domain: second-level public suffixes take three labels") {
    import spark.implicits._
    val got = Seq("shop.example.co.uk", "example.co.uk", "co.uk",
      "a.b.news.com.au", "x.co.jp", "plain.org.nz",
      // government / academic families (the r12 gap): must take THREE labels
      "dept.uni.ac.uk", "portal.hmrc.gov.uk", "lab.usp.edu.br",
      "x.y.agency.gov.br", "tax.gob.mx", "eng.snu.ac.kr", "dmv.gov.in",
      // ccTLD long tail added with the ICANN-core extension
      "a.firm.com.np", "news.co.tz", "shop.com.ve", "uni.edu.pl",
      // NOT suffixes: two-label rule applies
      "sub.gov.example", "deep.co.us")
      .toDF("h").select(UrlOps.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.co.uk", "example.co.uk", "co.uk",
      "news.com.au", "x.co.jp", "plain.org.nz",
      "uni.ac.uk", "hmrc.gov.uk", "usp.edu.br",
      "agency.gov.br", "tax.gob.mx", "snu.ac.kr", "dmv.gov.in",
      "firm.com.np", "news.co.tz", "shop.com.ve", "uni.edu.pl",
      "gov.example", "co.us"))
  }

  test("registrable domain: PSL private-section suffixes (github.io family) take three labels") {
    import spark.implicits._
    val got = Seq(
      // 2-label private suffixes: one level deeper, like co.uk
      "user.github.io", "proj.user.github.io", "github.io",
      "author.blogspot.com", "cdn.author.blogspot.com",
      "myapp.herokuapp.com", "site.netlify.app", "docs.readthedocs.io",
      // 3-label private suffixes: registrable is the last FOUR labels
      "media.s3.amazonaws.com", "bucket.media.s3.amazonaws.com",
      "author.blogspot.co.uk", "page.author.blogspot.co.uk",
      // NOT private suffixes: two-label rule applies
      "www.github.com", "a.blogspot.example")
      .toDF("h").select(UrlOps.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "user.github.io", "user.github.io", "github.io",
      "author.blogspot.com", "author.blogspot.com",
      "myapp.herokuapp.com", "site.netlify.app", "docs.readthedocs.io",
      "media.s3.amazonaws.com", "media.s3.amazonaws.com",
      "author.blogspot.co.uk", "author.blogspot.co.uk",
      "github.com", "blogspot.example"))
  }

  test("registrable domain: PSL wildcard families take five labels; 4-label hosts pass through") {
    import spark.implicits._
    val got = Seq(
      // wildcard suffix = <label>.compute.amazonaws.com → registrable is
      // the last FIVE labels
      "app.ec2-3.compute.amazonaws.com",
      "vm1.app.ec2-3.compute.amazonaws.com",
      "deep.vm1.app.ec2-3.compute.amazonaws.com",
      "x.y.us-east-1.compute-1.amazonaws.com",
      "svc.lb.eu-west-2.elb.amazonaws.com",
      // a 4-label host IS the public suffix itself: pass through whole,
      // never pooled into amazonaws.com
      "ec2-3.compute.amazonaws.com",
      // NOT wildcard families: existing rules apply unchanged
      "bucket.media.s3.amazonaws.com", "www.amazonaws.com")
      .toDF("h").select(UrlOps.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "app.ec2-3.compute.amazonaws.com",
      "app.ec2-3.compute.amazonaws.com",
      "app.ec2-3.compute.amazonaws.com",
      "y.us-east-1.compute-1.amazonaws.com",
      "lb.eu-west-2.elb.amazonaws.com",
      "ec2-3.compute.amazonaws.com",
      "media.s3.amazonaws.com", "amazonaws.com"))
  }

  test("hostOf strips scheme, userinfo, port, path, query") {
    import spark.implicits._
    val got = Seq("https://h.example.com:8080/p?a=1", "http://x.org",
      // embedded URL in the query must NOT shadow the real host
      "http://a.example.com/?r=http://b.example.com/x",
      "https://u:pw@h.example.com/p",
      // scheme-less input starts at the authority — never truncated
      "example.com/path",
      // multi-'@': the LAST one delimits
      "http://u@t.example.com@evil.example.org/x")
      .toDF("u").select(UrlOps.hostOf(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("h.example.com", "x.org", "a.example.com", "h.example.com",
      "example.com", "evil.example.org"))
  }

  test("withCanonicalUrl rejects colliding __urlc_ input columns loudly") {
    import spark.implicits._
    val df = Seq(("http://h.example.com/p", "x")).toDF("u", "__urlc_host")
    val e = intercept[IllegalArgumentException] {
      UrlOps.withCanonicalUrl(df, col("u"), "curl")
    }
    assert(e.getMessage.contains("__urlc_"))
  }

  test("canonicalization never yields null and is idempotent on adversarial inputs") {
    import spark.implicits._
    // deterministic pseudo-random messy URLs: escaped userinfo, %-hosts,
    // ccTLD hosts, mixed case, default/odd ports, escapes in path/query,
    // fragments with stray '%' — well beyond the q96 fixture's shapes
    val rng = new scala.util.Random(99)
    def randUrl(): String = {
      val sb = new StringBuilder
      sb.append(Seq("http", "HTTP", "https", "HtTpS")(rng.nextInt(4))).append("://")
      if (rng.nextBoolean()) sb.append("u%40ser:p@")
      if (rng.nextBoolean()) sb.append("WWW.")
      sb.append(Seq("ex%2Eample.com", "EXAMPLE.co.uk", "h%2Fost.org",
        "a.b.c.example.com")(rng.nextInt(4)))
      if (rng.nextBoolean()) sb.append(":" + Seq("80", "443", "8080")(rng.nextInt(3)))
      if (rng.nextBoolean()) sb.append("/p%7Eath/" + rng.nextInt(10))
      if (rng.nextBoolean()) sb.append("/")
      if (rng.nextBoolean()) sb.append("?b=2&utm_source=x&a=%5a1")
      if (rng.nextBoolean()) sb.append("#frag%ment")
      sb.toString
    }
    val urls = Vector.fill(300)(randUrl())
    val once = urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(once.forall(c => c != null && c.nonEmpty))
    val twice = once.toDF("c").select(UrlOps.canonicalizeUrl(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once, "canonical output must be a fixed point")
  }

  test("plan shape: canonicalization is a zero-shuffle projection") {
    import spark.implicits._
    val df = (0L until 100L).toDF("doc_id")
      .select(UrlOps.canonicalizeUrl(UrlOps.syntheticUrl(col("doc_id"))).as("curl"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
