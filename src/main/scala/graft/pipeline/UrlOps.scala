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
  * Scope: HTTP(S) URLs with a `scheme://` prefix. Userinfo
  * (`user:pass@host` — RFC 3986 §3.2.1) is stripped: dedup must not split
  * on credentials. Percent normalization applies to the host as well as
  * the path?query region; a host still carrying an escape AFTER
  * normalization (only reserved/non-ASCII escapes survive — a legal host
  * never needs those) is kept verbatim (lowercased) rather than
  * half-normalized, so obfuscated hosts stay distinguishable for
  * downstream flagging.
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
    // authority = [userinfo "@"] host [":" port]; the LAST '@' delimits —
    // WHATWG semantics, and the only choice that keeps canonicalization
    // idempotent on multi-'@' inputs ('u@x@evil.com' must not leave a
    // partial '@' for a second pass to strip differently).
    // substring_index(-1) returns the whole string when no '@' exists.
    val auth = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = normalizePercent(rest.substr(length(auth) + lit(1), length(rest)))
    val hostport = substring_index(auth, "@", -1)
    val hostRaw = lower(substring_index(hostport, ":", 1))
    // %2E-obfuscated hosts must dedup with their plain form; a host where
    // escapes REMAIN after normalization is malformed/suspicious — keep it
    // verbatim (lowercased) instead of emitting a half-normalized mix
    val hostDec = normalizePercent(hostRaw)
    val hostSafe = when(instr(hostDec, "%") > 0, hostRaw).otherwise(hostDec)
    val host = when(hostSafe.startsWith("www."), hostSafe.substr(lit(5), length(hostSafe)))
      .otherwise(hostSafe)
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
    // collisions with caller columns must fail loudly — the final drop
    // removes EVERY __urlc_* column, so a pre-existing one would silently
    // vanish from the output
    require(!df.columns.exists(_.startsWith(p)),
      s"input already carries $p* columns — rename them before calling withCanonicalUrl")
    def c(n: String) = col(p + n)
    val staged = df
      .withColumn(p + "nofrag", substring_index(url, "#", 1))
      .withColumn(p + "scheme", lower(substring_index(c("nofrag"), "://", 1)))
      .withColumn(p + "rest",
        c("nofrag").substr(instr(c("nofrag"), "://") + lit(3), length(c("nofrag"))))
      .withColumn(p + "auth",
        substring_index(substring_index(c("rest"), "/", 1), "?", 1))
      .withColumn(p + "pathq", normalizePercent(
        c("rest").substr(length(c("auth")) + lit(1), length(c("rest")))))
      .withColumn(p + "hostport", substring_index(c("auth"), "@", -1))
      .withColumn(p + "hostraw", lower(substring_index(c("hostport"), ":", 1)))
      .withColumn(p + "hostdec", normalizePercent(c("hostraw")))
      .withColumn(p + "hostsafe",
        when(instr(c("hostdec"), "%") > 0, c("hostraw")).otherwise(c("hostdec")))
      .withColumn(p + "host",
        when(c("hostsafe").startsWith("www."),
          c("hostsafe").substr(lit(5), length(c("hostsafe")))).otherwise(c("hostsafe")))
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

  /** Host (minus any userinfo or explicit port) of a URL. Splits on the
    * FIRST `://` — mirroring [[canonicalizeUrl]] — so a URL whose query
    * embeds another URL (`http://a.com/?r=http://b.com/x`) still reports
    * `a.com`; scheme-less input is treated as starting at the authority
    * (`example.com/x` → `example.com`), never silently truncated. */
  def hostOf(url: Column): Column = {
    val rest = when(instr(url, "://") > 0,
      url.substr(instr(url, "://") + lit(3), length(url))).otherwise(url)
    val auth = substring_index(substring_index(rest, "/", 1), "?", 1)
    substring_index(substring_index(auth, "@", -1), ":", 1)
  }

  /** Second-level public suffixes (the ccTLD core of the public-suffix
    * list — the registries under which names are registered one level
    * deeper, e.g. `example.co.uk` not `co.uk`). A static literal set, not
    * the full Mozilla PSL: these few dozen cover the ccTLD families that
    * dominate real crawls; everything else falls back to the two-label
    * rule. Shared with the q96/q99 oracle SQL, which interpolates this
    * same constant. */
  val secondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz", "school.nz", "gen.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "com.tr", "com.tw", "com.hk", "com.sg", "com.my",
    "co.kr", "or.kr", "co.id", "co.th", "com.vn", "com.ph", "com.pk",
    "com.eg", "com.sa", "co.il", "org.il", "ac.il", "co.ke", "co.tz",
    "com.ng", "com.gh")

  /** Registrable domain: last two host labels, EXCEPT when those two
    * labels are themselves a second-level public suffix (`co.uk` family) —
    * then the last three (`shop.example.co.uk` → `example.co.uk`, never
    * `co.uk`, which would pool every UK site into one bucket). Hosts with
    * too few labels pass through. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    when(size(labels) <= 2, host)
      .when(last2.isInCollection(secondLevelSuffixes),
        array_join(slice(labels, -3, 3), "."))
      .otherwise(last2)
  }

  /** Deterministic messy-URL FIXTURE for a bigint id column (this corpus
    * carries no URL field): mixed-case schemes and hosts, `www.` aliases,
    * planted userinfo, `%2E`-obfuscated hosts, `co.uk`-family hosts
    * (exercising the public-suffix rule), default and explicit ports,
    * trailing slashes, shuffled query params with planted tracking keys,
    * fragments. The same arithmetic is restated in the q96 oracle SQL, so
    * the strict gate covers exactly the canonicalization rules, not the
    * fixture. */
  def syntheticUrl(id: Column): Column = {
    val idStr = (n: Column) => n.cast("string")
    val scheme = when(id % 4 === 0, "HTTPS").when(id % 4 === 1, "http")
      .when(id % 4 === 2, "https").otherwise("HTTP")
    val hostBase =
      when(id % 10 === 7, // %2E-obfuscated: must dedup with the plain form
        concat(lit("site"), idStr(id % 5), lit("%2Eexample"), idStr(id % 3), lit(".com")))
      .when(id % 10 === 3, // ccTLD family: registrable = example{k}.co.uk
        concat(lit("shop"), idStr(id % 5), lit(".example"), idStr(id % 3), lit(".co.uk")))
      .otherwise(concat(lit("site"), idStr(id % 5), lit(".example"),
        idStr(id % 3), lit(".com")))
    val hostCased = when(id % 6 === 0, upper(hostBase)).otherwise(hostBase)
    val hostWww = when(id % 5 < 2, concat(lit("WWW."), hostCased)).otherwise(hostCased)
    val host = when(id % 9 === 4, concat(lit("u:pw@"), hostWww)).otherwise(hostWww)
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
