package graft.tools

/** Textual rounding/width-hazard lint over the registry's oracle SQL
  * — the r16 ratchet that keeps the r15 driver-red class from ever
  * shipping again.
  *
  * What shipped red in r15 (q218/q242/q244) and what this catches:
  *
  *  - R1 `ROUND`-of-double emission: `ROUND(expr[, n])` in the
  *    OUTERMOST SELECT whose result is hashed as a DOUBLE.
  *    `ROUND(double, n)` is the one operation whose result differs
  *    across engine versions/implementations (scaled-multiply C
  *    rounding vs shortest-decimal-representation rounding diverge at
  *    representation boundaries). The house-legal form is the e-grid
  *    emission `CAST(ROUND(x * 1eK) AS BIGINT)` (q210/q257): an
  *    integer leaves no representation to disagree about.
  *  - R2 bare integer-aggregate emission: `SUM(int)` in the outermost
  *    SELECT returns HUGEINT in DuckDB — surfacing as float64 in the
  *    driver's pandas compare and rendering `78.0` — while the engine
  *    emits a BIGINT rendering `78`. Hash-red with rows+schema green,
  *    exactly the r15 signature. The house-legal form is
  *    `CAST(SUM(...) AS BIGINT)` (or `AS DOUBLE` when the engine side
  *    genuinely emits a double).
  *
  * Enforcement is a RATCHET: oracles that were already driver-green
  * in r15 are grandfathered in
  * `src/test/resources/oracle_grandfather.tsv`, pinned by md5 of the
  * SQL — any EDIT to a grandfathered oracle re-triggers the lint, and
  * every NEW oracle must be clean. The textual rule is a tripwire,
  * not the gate: the executable gate is `scripts/check_oracle.py`'s
  * strict full-precision compare (a CTE could smuggle a rounded
  * double past any regex; it cannot pass the strict mirror).
  *
  * `main` regenerates the grandfather table from the current
  * registry — run it ONLY when intentionally blessing the current
  * corpus (e.g. after a driver round proved it green).
  */
object OracleLint {

  /** Paren depth before each character (depth 0 = top level). */
  private def depths(s: String): Array[Int] = {
    val out = new Array[Int](s.length)
    var d = 0
    var i = 0
    while (i < s.length) {
      out(i) = d
      if (s.charAt(i) == '(') d += 1
      else if (s.charAt(i) == ')') d = math.max(0, d - 1)
      i += 1
    }
    out
  }

  /** The outermost projection: text between the LAST depth-0 SELECT
    * and the first depth-0 FROM after it (to end-of-string when the
    * query has no top-level FROM). */
  def outermostProjection(sql: String): String = {
    val dp = depths(sql)
    val sel = "(?i)\\bSELECT\\b".r.findAllMatchIn(sql)
      .filter(m => dp(m.start) == 0).toSeq.lastOption
    sel match {
      case None => ""
      case Some(s) =>
        val from = "(?i)\\bFROM\\b".r.findAllMatchIn(sql)
          .find(m => m.start > s.end && dp(m.start) == 0)
        sql.substring(s.end, from.map(_.start).getOrElse(sql.length))
    }
  }

  /** (start, end, targetType) of every CAST(...) segment, where
    * targetType is the LAST `AS <type>` inside the segment (so a
    * nested `CAST(CAST(x AS DOUBLE) AS BIGINT)` reports BIGINT). */
  private def casts(proj: String): Seq[(Int, Int, String)] =
    "(?i)CAST\\s*\\(".r.findAllMatchIn(proj).toSeq.flatMap { m =>
      var d = 0
      var i = m.end - 1 // the open paren
      var close = -1
      while (i < proj.length && close < 0) {
        if (proj.charAt(i) == '(') d += 1
        else if (proj.charAt(i) == ')') { d -= 1; if (d == 0) close = i }
        i += 1
      }
      if (close < 0) Nil
      else {
        val seg = proj.substring(m.end, close)
        val tpe = "(?i)\\bAS\\s+([A-Za-z0-9()]+)".r
          .findAllMatchIn(seg).toSeq.lastOption.map(_.group(1))
        tpe.map(t => (m.end, close, t.toUpperCase)).toSeq
      }
    }

  private val IntTypes = Set("BIGINT", "INTEGER", "INT", "HUGEINT",
    "SMALLINT", "TINYINT")

  /** Hazards in one oracle's outermost projection (empty = clean). */
  def violations(sql: String): Seq[String] = {
    val proj = outermostProjection(sql)
    val cs = casts(proj)
    def wrappedIn(pos: Int, ok: String => Boolean): Boolean =
      cs.exists { case (s, e, t) => s <= pos && pos < e && ok(t) }
    // ROUND over an explicitly DECIMAL-cast argument is exact-decimal
    // arithmetic in both engines — allowed (e.g. TPC-H revenue sums)
    def argIsDecimal(m: scala.util.matching.Regex.Match): Boolean = {
      val argStart = proj.indexWhere(!_.isWhitespace, m.end)
      argStart >= 0 &&
        cs.exists { case (s, _, t) =>
          // the CAST's open paren sits right after "CAST" at argStart
          t.startsWith("DECIMAL") && s > argStart &&
            proj.substring(argStart, s).matches("(?is)CAST\\s*\\(") }
    }
    val r1 = "(?i)\\bROUND\\s*\\(".r.findAllMatchIn(proj).toSeq
      .filterNot(m => wrappedIn(m.start, t => IntTypes(t)) ||
        argIsDecimal(m))
      .map(m => s"R1 ROUND-of-double emission at projection " +
        s"offset ${m.start} — emit an e-grid integer " +
        s"(CAST(ROUND(x * 1eK) AS BIGINT)) or exact integer " +
        s"arithmetic instead")
    val r2 = "(?i)\\bSUM\\s*\\(".r.findAllMatchIn(proj).toSeq
      .filterNot(m =>
        wrappedIn(m.start, t => IntTypes(t) || t.startsWith("DOUBLE")
          || t.startsWith("DECIMAL")))
      .map(m => s"R2 bare SUM emission at projection offset " +
        s"${m.start} — DuckDB returns HUGEINT (renders 78.0) vs the " +
        s"engine's BIGINT (renders 78); wrap in CAST(... AS BIGINT)")
    r1 ++ r2
  }

  def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The grandfather pin: md5 of the SQL with path-like quoted
    * strings masked. Several oracles interpolate a per-JVM artifact
    * directory (`read_parquet('<tmp>/q92_codebook/STAR.parquet')`),
    * so a raw-text hash would differ between the generating JVM and
    * the test JVM; masking only quoted strings CONTAINING '/' keeps
    * every semantic literal (dates, segment names, thresholds)
    * pinned. */
  def pinHash(sql: String): String = {
    // quote-parity scan (NOT a regex: a division '/' sitting between
    // two unrelated literals would let '...'[^']*/[^']*'...' swallow
    // real SQL) — only the CONTENT of literals containing '/' is
    // masked, everything else hashes verbatim
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val close = sql.indexOf('\'', i + 1)
        val end = if (close < 0) sql.length - 1 else close
        val lit = sql.substring(i + 1, math.max(i + 1, end))
        out.append('\'')
          .append(if (lit.contains('/')) "<path>" else lit)
          .append('\'')
        i = end + 1
      } else {
        out.append(sql.charAt(i)); i += 1
      }
    }
    md5(out.toString)
  }

  /** Regenerate the grandfather table on stdout (name\tmd5 for every
    * currently-violating oracle). Redirect into
    * src/test/resources/oracle_grandfather.tsv only when blessing a
    * driver-proven-green corpus. */
  def main(args: Array[String]): Unit =
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach {
      case (name, sql) =>
        if (violations(sql).nonEmpty) println(s"$name\t${pinHash(sql)}")
    }
}
