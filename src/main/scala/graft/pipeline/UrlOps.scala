package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale dedup rollups: the normalization
  * every web pipeline runs before URL-level dedup (scheme/host case, the
  * `www.` alias, default ports, trailing slash, fragment, query-parameter
  * order, tracking parameters). Rules follow RFC 3986 §6 syntax-based
  * normalization plus the standard tracking-parameter strip.
  *
  * 100 TB posture: every function here is a pure `Column` expression tree
  * (substring_index/CASE/array_sort — all codegen'd inside
  * WholeStageCodegen), so canonicalization rides the scan projection with
  * ZERO shuffle and ZERO UDF boundary — the plan-gate contract of the text
  * operators. Each rule is deliberately expressible in ANSI-ish string SQL
  * so an independent engine (the DuckDB oracle) reproduces the result
  * byte-for-byte — the q96 strict gate.
  *
  * Scope: HTTP(S) URLs with a `scheme://` prefix, no userinfo, no percent
  * re-encoding (case-normalizing %XX escapes needs a per-char loop —
  * a later Expression if real corpora demand it).
  */
object UrlOps {

  /** Query parameters dropped wholesale: click-tracking keys that change
    * per share/visit without changing the resource (the public list every
    * crawler strips — utm_* campaign tags, Facebook/Google click ids, and
    * bare `ref` referrals). */
  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("fbclid=") ||
      p.startsWith("gclid=") || p.startsWith("ref=")

  /** RFC 3986 §6.2.2 percent-escape normalization: decode escapes of
    * UNRESERVED characters (`%7E` ≡ `~`), uppercase the hex of every other
    * escape (`%3f` → `%3F`), copy malformed percents verbatim. A native
    * codegen'd kernel ([[graft.spark.expressions.NormalizePercentEscapes]])
    * — the per-character scan no built-in string function composition can
    * express. Safe to apply to a whole path?query region: reserved escapes
    * (`%26` = `&`, `%3F` = `?`, `%2F` = `/`) never decode, so no new
    * delimiter can appear. */
  def normalizePercent(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.spark.expressions.NormalizePercentEscapes(
        org.apache.spark.sql.GraftShim.expression(c)))

  /** `url` → canonical form:
    * lower(scheme) `://` lower(host minus one leading `www.`) [`:port`
    * unless it is the scheme default] path-minus-one-trailing-slash
    * [`?` sorted surviving params]. The fragment never reaches the server
    * and is always dropped.
    *
    * NOTE — single-expression form: every intermediate (`rest`,
    * `hostport`, ...) is INLINED at each use site, so the tree grows
    * multiplicatively with nesting depth. Fine for literals and spec
    * vectors; corpus-scale callers use [[withCanonicalUrl]], which
    * materializes each intermediate once per projection stage (measured
    * 28 s → sub-second on 5k rows). */
  def canonicalizeUrl(url: Column): Column = {
    val nofrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(nofrag, "://", 1))
    // everything after the first "://" (instr is 1-based; +3 skips it)
    val rest = nofrag.substr(instr(nofrag, "://") + lit(3), length(nofrag))
    val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = normalizePercent(rest.substr(length(hostport) + lit(1), length(rest)))
    val hostRaw = lower(substring_index(hostport, ":", 1))
    val host = when(hostRaw.startsWith("www."), hostRaw.substr(lit(5), length(hostRaw)))
      .otherwise(hostRaw)
    val port = when(instr(hostport, ":") > 0, substring_index(hostport, ":", -1))
      .otherwise(lit(""))
    val portKeep = when(
      port === "" || (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = substring_index(pathq, "?", 1)
    val pathNorm = when(path.endsWith("/"), path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val query = when(instr(pathq, "?") > 0,
      pathq.substr(instr(pathq, "?") + lit(1), length(pathq))).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= "" && !isTracking(p)))
    val queryNorm = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, portKeep, pathNorm, queryNorm)
  }

  /** Multi-stage [[canonicalizeUrl]]: SAME rules, each intermediate
    * materialized ONCE per row in its own projection stage. The
    * single-Column variant inlines every intermediate at every use site,
    * so the expression tree grows multiplicatively with nesting depth —
    * measured 28 s for 5k rows at sf0.1 (codegen + duplicated per-row
    * subtree evaluation) vs sub-second staged. CollapseProject keeps
    * multiply-referenced non-cheap aliases in separate stages, so the
    * split survives optimization. UrlOpsSpec pins both paths equal on the
    * fixture corpus. */
  def withCanonicalUrl(df: org.apache.spark.sql.DataFrame, url: Column,
                       out: String): org.apache.spark.sql.DataFrame = {
    val p = "__urlc_"
    def c(n: String) = col(p + n)
    val staged = df
      .withColumn(p + "nofrag", substring_index(url, "#", 1))
      .withColumn(p + "scheme", lower(substring_index(c("nofrag"), "://", 1)))
      .withColumn(p + "rest",
        c("nofrag").substr(instr(c("nofrag"), "://") + lit(3), length(c("nofrag"))))
      .withColumn(p + "hostport",
        substring_index(substring_index(c("rest"), "/", 1), "?", 1))
      .withColumn(p + "pathq", normalizePercent(
        c("rest").substr(length(c("hostport")) + lit(1), length(c("rest")))))
      .withColumn(p + "hostraw", lower(substring_index(c("hostport"), ":", 1)))
      .withColumn(p + "host",
        when(c("hostraw").startsWith("www."),
          c("hostraw").substr(lit(5), length(c("hostraw")))).otherwise(c("hostraw")))
      .withColumn(p + "port",
        when(instr(c("hostport"), ":") > 0, substring_index(c("hostport"), ":", -1))
          .otherwise(lit("")))
      .withColumn(p + "portkeep",
        when(c("port") === "" || (c("scheme") === "http" && c("port") === "80") ||
          (c("scheme") === "https" && c("port") === "443"), lit(""))
          .otherwise(concat(lit(":"), c("port"))))
      .withColumn(p + "path", substring_index(c("pathq"), "?", 1))
      .withColumn(p + "pathnorm",
        when(c("path").endsWith("/"), c("path").substr(lit(1), length(c("path")) - 1))
          .otherwise(c("path")))
      .withColumn(p + "query",
        when(instr(c("pathq"), "?") > 0,
          c("pathq").substr(instr(c("pathq"), "?") + lit(1), length(c("pathq"))))
          .otherwise(lit("")))
      .withColumn(p + "kept",
        array_sort(filter(split(c("query"), "&"), x => x =!= "" && !isTracking(x))))
      .withColumn(out, concat(c("scheme"), lit("://"), c("host"), c("portkeep"),
        c("pathnorm"),
        when(size(c("kept")) > 0, concat(lit("?"), array_join(c("kept"), "&")))
          .otherwise(lit(""))))
    staged.drop(staged.columns.filter(_.startsWith(p)).toIndexedSeq: _*)
  }

  /** Host (minus any explicit port) of a `scheme://`-prefixed URL. */
  def hostOf(url: Column): Column = {
    val rest = substring_index(url, "://", -1)
    substring_index(substring_index(substring_index(rest, "/", 1), "?", 1), ":", 1)
  }

  /** Last two host labels — the registrable-domain approximation every
    * rollup that lacks the public-suffix list uses (`a.b.site.example.com`
    * → `example.com`). Hosts with fewer than two labels pass through. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 2, host)
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Deterministic messy-URL FIXTURE for a bigint id column (this corpus
    * carries no URL field): mixed-case schemes and hosts, `www.` aliases,
    * default and explicit ports, trailing slashes, shuffled query params
    * with planted tracking keys, fragments. The same arithmetic is
    * restated in the q96 oracle SQL, so the strict gate covers exactly the
    * canonicalization rules, not the fixture. */
  def syntheticUrl(id: Column): Column = {
    val idStr = (n: Column) => n.cast("string")
    val scheme = when(id % 4 === 0, "HTTPS").when(id % 4 === 1, "http")
      .when(id % 4 === 2, "https").otherwise("HTTP")
    val hostBase = concat(lit("site"), idStr(id % 5), lit(".example"),
      idStr(id % 3), lit(".com"))
    val hostCased = when(id % 6 === 0, upper(hostBase)).otherwise(hostBase)
    val host = when(id % 5 < 2, concat(lit("WWW."), hostCased)).otherwise(hostCased)
    val port = when(id % 7 === 0, ":443").when(id % 7 === 1, ":8080").otherwise("")
    // planted percent escapes: %7e decodes (unreserved ~), %3f stays but
    // uppercases (reserved ?), %5a decodes (unreserved Z)
    val esc = when(id % 8 === 0, "%7ehome").when(id % 8 === 1, "x%3fq")
      .when(id % 8 === 5, "y%5a").otherwise("")
    val path = concat(lit("/p"), idStr(id % 10), esc,
      when(id % 3 === 0, "/").otherwise(""))
    val query = when(id % 4 === 0,
      concat(lit("?b="), idStr(id % 11), lit("&utm_source=feed&a=1")))
      .when(id % 4 === 1, concat(lit("?a=1&b="), idStr(id % 11)))
      .when(id % 4 === 2, "?utm_campaign=x&fbclid=abc123")
      .otherwise("")
    val frag = when(id % 6 === 0, "#sec").otherwise("")
    concat(scheme, lit("://"), host, port, path, query, frag)
  }
}
