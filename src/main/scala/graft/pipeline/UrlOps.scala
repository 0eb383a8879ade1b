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

  /** Second-level public suffixes — the ICANN ccTLD core of the
    * public-suffix list (the registries under which names are registered
    * one level deeper, e.g. `example.co.uk` not `co.uk`). A static literal
    * set covering the government/academic/commercial families of every
    * major ccTLD registry, drawn from the ICANN section of the public
    * suffix list; exotic third-level and private-section entries fall back
    * to the two-label rule. Shared with the q96/q99 oracle SQL, which
    * interpolates this same constant. Compiles to an `InSet` hash probe
    * (Catalyst switches In → InSet above 10 items), so membership is O(1)
    * per row regardless of list size. */
  val secondLevelSuffixes: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia / New Zealand / Pacific
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz", "school.nz", "gen.nz",
    "geek.nz", "maori.nz", "iwi.nz", "health.nz", "mil.nz", "cri.nz",
    "com.fj", "net.fj", "org.fj", "ac.fj", "gov.fj", "biz.fj", "info.fj",
    "com.pg", "net.pg", "org.pg", "ac.pg", "gov.pg", "mil.pg",
    // Japan / Korea / Greater China
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "gr.jp",
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "game.tw",
    "ebiz.tw", "club.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    // South / Southeast Asia
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "edu.in",
    "res.in", "ac.in", "gov.in", "mil.in", "nic.in",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "co.id", "or.id", "net.id", "ac.id", "web.id", "sch.id", "go.id",
    "mil.id", "biz.id", "my.id", "desa.id",
    "co.th", "or.th", "net.th", "ac.th", "go.th", "in.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "ngo.ph",
    "i.ph",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk", "ac.lk", "sch.lk",
    "int.lk", "ltd.lk", "assn.lk", "grp.lk", "hotel.lk", "ngo.lk",
    "soc.lk", "web.lk",
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np", "biz.np",
    "coop.np", "info.np", "name.np", "pro.np",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "mil.kh", "per.kh",
    "com.la", "net.la", "org.la", "edu.la", "gov.la", "int.la", "info.la",
    "per.la",
    "com.bt", "net.bt", "org.bt", "edu.bt", "gov.bt",
    "com.mv", "net.mv", "org.mv", "edu.mv", "gov.mv", "biz.mv", "coop.mv",
    "info.mv", "int.mv", "mil.mv", "name.mv", "pro.mv",
    "com.af", "net.af", "org.af", "edu.af", "gov.af",
    "com.kz", "net.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz",
    "com.uz", "co.uz", "net.uz", "org.uz",
    // Middle East / Central Asia
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "idf.il", "k12.il",
    "muni.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa",
    "sch.qa",
    "com.kw", "net.kw", "org.kw", "edu.kw", "gov.kw", "ind.kw", "emb.kw",
    "com.om", "net.om", "org.om", "edu.om", "gov.om", "co.om", "med.om",
    "pro.om",
    "com.bh", "net.bh", "org.bh", "edu.bh", "gov.bh",
    "com.jo", "net.jo", "org.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo",
    "sch.jo",
    "com.lb", "net.lb", "org.lb", "edu.lb", "gov.lb",
    "com.iq", "net.iq", "org.iq", "edu.iq", "gov.iq", "mil.iq",
    "com.ir", "net.ir", "org.ir", "ac.ir", "co.ir", "gov.ir", "id.ir",
    "sch.ir",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr", "bbs.tr",
    "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr", "mil.tr",
    "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "com.ge", "net.ge", "org.ge", "edu.ge", "gov.ge", "mil.ge", "pvt.ge",
    "com.am", "net.am", "org.am", "co.am",
    "com.az", "net.az", "org.az", "edu.az", "gov.az", "mil.az", "int.az",
    "biz.az", "info.az", "name.az", "pro.az", "pp.az",
    // Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za", "edu.za",
    "mil.za", "nom.za",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "mil.eg", "sci.eg",
    "name.eg",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz", "hotel.tz",
    "info.tz", "me.tz", "mil.tz", "mobi.tz", "tv.tz",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng", "sch.ng",
    "mil.ng", "mobi.ng", "i.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    "com.tn", "net.tn", "org.tn", "gov.tn", "ens.tn", "fin.tn", "ind.tn",
    "info.tn", "intl.tn", "nat.tn", "perso.tn", "tourism.tn",
    "com.dz", "net.dz", "org.dz", "edu.dz", "gov.dz", "asso.dz", "art.dz",
    "pol.dz", "soc.dz", "tm.dz",
    "com.et", "gov.et", "org.et", "edu.et", "net.et", "biz.et", "name.et",
    "info.et",
    "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
    "org.ug",
    "com.zm", "co.zm", "org.zm", "gov.zm", "ac.zm", "edu.zm", "net.zm",
    "mil.zm", "info.zm", "biz.zm", "sch.zm",
    "co.zw", "ac.zw", "gov.zw", "org.zw", "mil.zw", "school.zw",
    "co.mz", "net.mz", "org.mz", "ac.mz", "edu.mz", "gov.mz", "adv.mz",
    "co.bw", "org.bw",
    "com.na", "co.na", "org.na", "edu.na",
    "co.rw", "gov.rw", "net.rw", "ac.rw", "org.rw", "int.rw", "mil.rw",
    "com.mu", "net.mu", "org.mu", "co.mu", "or.mu", "ac.mu", "gov.mu",
    "com.sn", "edu.sn", "org.sn", "gouv.sn", "perso.sn", "univ.sn",
    "art.sn",
    "com.ci", "net.ci", "org.ci", "co.ci", "ed.ci", "ac.ci", "edu.ci",
    "go.ci", "int.ci",
    "com.cm", "co.cm", "net.cm", "gov.cm",
    // Latin America / Caribbean
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "adv.br", "eco.br", "esp.br", "ind.br", "inf.br", "jus.br", "leg.br",
    "med.br", "mus.br", "not.br", "odo.br", "psi.br", "rec.br", "srv.br",
    "tur.br", "tv.br", "vet.br", "agr.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "gov.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "gob.cl", "gov.cl", "co.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "web.ve",
    "co.ve", "info.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "gov.bo", "mil.bo",
    "int.bo", "tv.bo", "web.bo",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr", "ac.cr",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "mil.gt", "ind.gt",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "web.do", "sld.do", "art.do",
    "com.cu", "net.cu", "org.cu", "edu.cu", "gov.cu", "inf.cu",
    "com.ni", "net.ni", "org.ni", "edu.ni", "gob.ni", "mil.ni", "ac.ni",
    "biz.ni", "info.ni", "int.ni", "in.ni", "nom.ni", "web.ni", "co.ni",
    "com.hn", "net.hn", "org.hn", "edu.hn", "gob.hn", "mil.hn",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.pa", "net.pa", "org.pa", "edu.pa", "gob.pa", "ac.pa", "sld.pa",
    "abo.pa", "ing.pa", "med.pa", "nom.pa",
    "com.tt", "net.tt", "org.tt", "edu.tt", "gov.tt", "co.tt", "biz.tt",
    "info.tt", "pro.tt", "name.tt",
    "com.jm", "net.jm", "org.jm", "edu.jm", "gov.jm", "mil.jm",
    "com.bb", "net.bb", "org.bb", "edu.bb", "gov.bb", "biz.bb", "co.bb",
    "info.bb", "store.bb", "tv.bb",
    "com.bs", "net.bs", "org.bs", "edu.bs", "gov.bs",
    "co.gy", "com.gy", "edu.gy", "gov.gy", "net.gy", "org.gy",
    "com.ag", "net.ag", "org.ag", "co.ag", "nom.ag",
    "com.bz", "net.bz", "org.bz", "edu.bz", "gov.bz",
    // Europe
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
    "waw.pl",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "gouv.fr", "asso.fr", "com.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "aeroport.fr",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt", "publ.pt",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro",
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "co.hu", "org.hu", "info.hu", "priv.hu", "tm.hu",
    "com.cy", "net.cy", "org.cy", "ac.cy", "gov.cy", "biz.cy", "ltd.cy",
    "mil.cy", "name.cy", "press.cy", "pro.cy", "tm.cy",
    "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
    "com.ba", "net.ba", "org.ba", "edu.ba", "gov.ba", "mil.ba",
    "com.mk", "net.mk", "org.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "com.al", "net.al", "org.al", "edu.al", "gov.al", "mil.al",
    "com.ee", "org.ee", "edu.ee", "gov.ee", "fie.ee", "med.ee", "pri.ee",
    "riik.ee", "lib.ee", "aip.ee",
    "com.lv", "net.lv", "org.lv", "edu.lv", "gov.lv", "mil.lv", "asn.lv",
    "conf.lv", "id.lv",
    "com.by", "net.by", "org.by", "gov.by", "mil.by", "of.by",
    "gov.ie", "gc.ca", "gov.sk", "gov.lt", "aland.fi")

  /** PRIVATE-section public suffixes (PSL private section core): hosting
    * platforms under which unrelated parties register names one level
    * deeper — `user.github.io` and `author.blogspot.com` are different
    * sites the way `example.co.uk` sites are. Without these, a per-domain
    * quota (q99) pools ALL of github.io into one bucket and mis-throttles
    * crawl data. Static high-traffic core of the PSL private section;
    * shared with the q96/q99 oracle SQL, which interpolates the same
    * constants. */
  val privateSuffixes: Seq[String] = Seq(
    // code / docs hosting
    "github.io", "githubusercontent.com", "gitlab.io", "readthedocs.io",
    "neocities.org", "repl.co", "glitch.me", "surge.sh",
    // blog platforms (ccTLD blogspot mirrors with TWO labels live here;
    // three-label mirrors are in [[privateThirdLevelSuffixes]])
    "blogspot.com", "blogspot.de", "blogspot.fr", "blogspot.in",
    "blogspot.jp", "blogspot.mx", "blogspot.ca", "blogspot.it",
    "blogspot.nl", "blogspot.se", "wordpress.com",
    // cloud / PaaS app hosting
    "netlify.app", "vercel.app", "herokuapp.com", "appspot.com",
    "firebaseapp.com", "web.app", "azurewebsites.net", "cloudfront.net",
    "elasticbeanstalk.com", "pages.dev", "workers.dev", "fly.dev",
    "onrender.com",
    // dynamic-DNS families
    "duckdns.org", "dyndns.org")

  /** Three-label private-section suffixes: the registrable domain is the
    * last FOUR labels (`media.s3.amazonaws.com` under `s3.amazonaws.com`).
    * Wildcarded region families (`*.compute.amazonaws.com`) are a
    * documented cut — they need per-region matching, not a static set. */
  val privateThirdLevelSuffixes: Seq[String] = Seq(
    "s3.amazonaws.com", "blogspot.co.uk", "blogspot.com.br",
    "blogspot.com.au", "blogspot.co.nz", "blogspot.co.za")

  /** PSL WILDCARD-family tails (the `*.compute.amazonaws.com` class,
    * closing the r16 documented cut): the public suffix is ONE arbitrary
    * label (the region/zone) plus this static 3-label tail, so the
    * registrable domain is the last FIVE labels
    * (`x.app.ec2.compute.amazonaws.com` → `app.ec2.compute.amazonaws.com`)
    * — a label-count rule keyed on the trailing three labels, no full PSL
    * parser needed. A 4-label host IS a public suffix itself and passes
    * through whole (the shortest-matching-rule convention below). Shared
    * with the q96/q99 oracle SQL. */
  val wildcardSuffixTails: Seq[String] = Seq(
    "compute.amazonaws.com", "compute-1.amazonaws.com", "elb.amazonaws.com")

  /** Registrable domain: last two host labels, EXCEPT when a trailing
    * segment is itself a public suffix — a second-level ICANN suffix
    * (`co.uk` family) or a PRIVATE-section suffix (`github.io` family)
    * takes the last three labels (`shop.example.co.uk` → `example.co.uk`,
    * `user.github.io` → `user.github.io` stays); a three-label private
    * suffix (`s3.amazonaws.com`) takes the last four; a WILDCARD-family
    * tail (`*.compute.amazonaws.com`) makes the suffix four labels, so
    * the registrable domain is the last five. Hosts with too few labels
    * (or equal to a suffix itself) pass through on the shortest matching
    * rule. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(size(labels) <= 2, host)
      .when(size(labels) >= 5 && last3.isInCollection(wildcardSuffixTails),
        array_join(slice(labels, -5, 5), "."))
      .when(size(labels) === 4 && last3.isInCollection(wildcardSuffixTails), host)
      .when(size(labels) >= 4 && last3.isInCollection(privateThirdLevelSuffixes),
        array_join(slice(labels, -4, 4), "."))
      .when(last2.isInCollection(secondLevelSuffixes ++ privateSuffixes), last3)
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
      .when(id % 10 === 9, // academic family: registrable = uni{k}.ac.uk
        concat(lit("dept"), idStr(id % 5), lit(".uni"), idStr(id % 3), lit(".ac.uk")))
      .when(id % 10 === 5, // government family: registrable = agency{k}.gov.br
        concat(lit("unit"), idStr(id % 5), lit(".agency"), idStr(id % 3), lit(".gov.br")))
      .when(id % 10 === 1, // PSL private section: registrable = user{k}.github.io
        concat(lit("proj"), idStr(id % 5), lit(".user"), idStr(id % 3), lit(".github.io")))
      .when(id % 10 === 8, // 3-label private suffix: registrable = author{k}.blogspot.co.uk
        concat(lit("page"), idStr(id % 5), lit(".author"), idStr(id % 3), lit(".blogspot.co.uk")))
      .when(id % 10 === 4, // 3-label private suffix: registrable = media{k}.s3.amazonaws.com
        concat(lit("bucket"), idStr(id % 5), lit(".media"), idStr(id % 3), lit(".s3.amazonaws.com")))
      .when(id % 10 === 6, // PSL wildcard family: registrable = app{k}.ec2.compute.amazonaws.com
        concat(lit("vm"), idStr(id % 5), lit(".app"), idStr(id % 3), lit(".ec2.compute.amazonaws.com")))
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
