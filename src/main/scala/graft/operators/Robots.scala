package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Robots Exclusion Protocol (RFC 9309) — the crawl-politeness layer
  * a frontier needs BEFORE it fetches: which paths a given product
  * token may crawl, at what delay, and where the sitemaps are. A
  * pipeline re-crawling or auditing a 100 TB corpus evaluates these
  * rules per (host, path) at corpus scale, so the evaluator is a
  * pure function usable inside a map (no driver state, no regex
  * compilation per row — patterns are matched by a hand-rolled
  * wildcard walk).
  *
  * Semantics implemented from the RFC (+ the two de-facto extensions
  * every major crawler honors):
  *  - groups: consecutive `User-agent` lines open a group; rules
  *    attach to it; rules before any group are ignored; groups with
  *    the same agent merge (evaluation just scans all of them).
  *  - agent selection: the group whose agent token is the LONGEST
  *    case-insensitive substring of the crawler's product token
  *    wins; `*` groups apply only when no named group matched.
  *  - path rules: `Allow`/`Disallow` values with `*` wildcards and
  *    a `$` end anchor; the matching rule with the LONGEST pattern
  *    wins; equal-length tie → Allow; empty Disallow allows all;
  *    no match → allowed (crawl-by-default).
  *  - `Crawl-delay` (de-facto): seconds, surfaced as exact millis.
  *  - `Sitemap` (de-facto): global, order-preserving.
  * Unknown fields and malformed lines are skipped, not fatal — a
  * robots.txt that fails to parse entirely yields None and the
  * caller applies its own policy; matching is byte-literal (no
  * percent-decoding normalization — documented scope).
  *
  * Reference behavior studied: pytrousse has no crawl layer
  * (/root/reference/src/trousse/dataset.py:1); beyond-parity
  * crawl-curation surface like [[Http]]/[[Sniff]].
  */
object Robots {

  /** One rule: allow?, raw pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One group: lowercased agent tokens + ordered rules. */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelayMillis: Option[Long])

  /** A parsed robots.txt. */
  final case class RobotsFile(groups: Seq[Group],
      sitemaps: Seq[String])

  private val MaxSize = 1 << 20 // 1 MiB, > Google's 500 KiB cap

  /** Parse robots.txt bytes (UTF-8 read, BOM tolerated). None only
    * for null/oversized input — a text file full of junk lines
    * parses to an empty rule set, which is the crawl-by-default
    * contract.
    */
  def parse(b: Array[Byte]): Option[RobotsFile] = {
    if (b == null || b.length > MaxSize) return None
    var s = new String(b, StandardCharsets.UTF_8)
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s = s.substring(1)
    val groups = Seq.newBuilder[Group]
    val sitemaps = Seq.newBuilder[String]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var delay: Option[Long] = None
    var inGroup = false // an open group with at least one agent
    var agentsOpen = false // last line was a user-agent line
    def flush(): Unit = {
      val as = agents.result()
      if (as.nonEmpty) groups += Group(as, rules.result(), delay)
      agents = Seq.newBuilder[String]
      rules = Seq.newBuilder[Rule]
      delay = None
      inGroup = false
      agentsOpen = false
    }
    for (line0 <- s.split("\n", -1)) {
      val line = {
        val noCr = if (line0.endsWith("\r")) line0.dropRight(1)
          else line0
        val hash = noCr.indexOf('#')
        (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (inGroup && !agentsOpen) flush()
            agents += value.toLowerCase(java.util.Locale.ROOT)
            inGroup = true
            agentsOpen = true
          case "allow" | "disallow" if inGroup =>
            agentsOpen = false
            rules += Rule(field == "allow", value)
          case "crawl-delay" if inGroup =>
            agentsOpen = false
            try {
              val secs = java.lang.Double.parseDouble(value)
              if (secs >= 0 && secs < 1e6)
                delay = Some(math.round(secs * 1000.0))
            } catch { case _: NumberFormatException => () }
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ => () // unknown field / rules outside any group
        }
      }
    }
    flush()
    Some(RobotsFile(groups.result(), sitemaps.result()))
  }

  /** `pattern` matches a prefix of `path`, with `*` spanning any
    * run and `$` (only meaningful at pattern end) anchoring to the
    * path end. Iterative greedy-with-backtrack, linear-ish on the
    * short patterns robots files carry.
    */
  private[graft] def pathMatches(pattern: String, path: String)
      : Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else return false
      // pattern consumed: prefix match unless anchored
      if (pi == pat.length && !anchored) return true
    }
    // path consumed: remaining pattern must be all '*'
    var k = pi
    while (k < pat.length && pat.charAt(k) == '*') k += 1
    k == pat.length
  }

  /** The groups that govern `agentToken` (RFC agent selection, the
    * reference-parser reading): the product token is the agent
    * string up to the first `/`, and a group applies when its agent
    * value is a case-insensitive PREFIX of that token ("googlebot"
    * governs "Googlebot-News/1.0", but "bot" does NOT govern
    * "elsebot"); the longest matching value wins, `*` only when
    * nothing matched.
    */
  private def groupsFor(r: RobotsFile, agentToken: String)
      : Seq[Group] = {
    val tok = {
      val t = agentToken.toLowerCase(java.util.Locale.ROOT)
      val slash = t.indexOf('/')
      if (slash >= 0) t.substring(0, slash) else t
    }
    var bestLen = -1
    for (g <- r.groups; a <- g.agents if a != "*" && a.nonEmpty)
      if (tok.startsWith(a) && a.length > bestLen) bestLen = a.length
    if (bestLen >= 0)
      r.groups.filter(_.agents.exists(a =>
        a != "*" && a.length == bestLen && tok.startsWith(a)))
    else r.groups.filter(_.agents.contains("*"))
  }

  /** May `agentToken` fetch `path`? Longest-pattern rule wins,
    * equal-length tie → allow, empty-pattern Disallow and no-match
    * both allow.
    */
  def allowed(r: RobotsFile, agentToken: String, path: String)
      : Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (g <- groupsFor(r, agentToken); rule <- g.rules) {
      // empty Disallow = allow all, empty Allow is meaningless —
      // neither constrains anything
      if (rule.pattern.nonEmpty && pathMatches(rule.pattern, path)) {
        val len = rule.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = rule.allow }
        else if (len == bestLen && rule.allow) bestAllow = true
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** Crawl delay for the governing groups (first declared wins). */
  def crawlDelayMillis(r: RobotsFile, agentToken: String)
      : Option[Long] =
    groupsFor(r, agentToken).flatMap(_.crawlDelayMillis).headOption

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val robotsSchema: StructType = StructType(Seq(
    StructField("n_groups", IntegerType),
    StructField("n_rules", IntegerType),
    StructField("crawl_delay_ms", LongType),
    StructField("sitemap", StringType),
    StructField("graft_private", BooleanType),
    StructField("graft_ok", BooleanType),
    StructField("graft_pdf", BooleanType),
    StructField("graft_pdfx", BooleanType),
    StructField("graft_public", BooleanType),
    StructField("other_public", BooleanType)))

  /** Decode kernel: parse + evaluate the six probe decisions the
    * oracle replays (agent "graftbot/1.1" vs an unmatched agent).
    */
  def decodeRobots(bytes: Array[Byte]): Seq[Any] =
    parse(bytes) match {
      case Some(r) =>
        Seq[Any](r.groups.length,
          r.groups.map(_.rules.length).sum,
          crawlDelayMillis(r, "graftbot/1.1")
            .map(java.lang.Long.valueOf).orNull,
          r.sitemaps.headOption.orNull,
          allowed(r, "graftbot/1.1", "/private/x.html"),
          allowed(r, "graftbot/1.1", "/private/ok/page"),
          allowed(r, "graftbot/1.1", "/files/doc.pdf"),
          allowed(r, "graftbot/1.1", "/files/doc.pdfx"),
          allowed(r, "graftbot/1.1", "/public/index"),
          allowed(r, "otherbot/2.0", "/public/index"))
      case None => Seq.fill[Any](10)(null)
    }

  /** Fixture writer: a real robots.txt whose decisions replay
    * closed-form from the seed. Mode varies formatting noise only
    * (comments, CRLF, case, blank lines) — decisions are
    * mode-invariant.
    */
  def robotsWrite(seed: Long, mode: Int): Array[Byte] = {
    val m = math.floorMod(mode, 3)
    val nl = if (m == 1) "\r\n" else "\n"
    val ua = if (m == 2) "USER-AGENT" else "User-agent"
    val sb = new StringBuilder
    if (m == 0) sb.append("# graft fixture ").append(seed).append(nl)
    sb.append(s"$ua: GraftBot$nl")
    sb.append(s"Disallow: /private/$nl")
    sb.append(s"Allow: /private/ok$nl")
    sb.append(s"Disallow: /*.pdf$$$nl")
    if (m == 1) sb.append(nl) // blank line inside a group is fine
    sb.append(s"Crawl-delay: ${seed % 7 + 1}$nl")
    sb.append(s"$ua: *$nl")
    sb.append(s"Disallow: /$nl")
    sb.append(s"Sitemap: https://example.org/sm$seed.xml$nl")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Per-row synthesizer. */
  def synthRobots(df: DataFrame, idCol: String, modeCol: String,
      outCol: String): DataFrame = {
    val (ii, mi) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(modeCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ robotsWrite(r.getLong(ii),
          r.getInt(mi)))
      }
    }(enc)
  }
}
