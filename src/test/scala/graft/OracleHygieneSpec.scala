package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.OracleLint

/** The r16 rounding/width-hazard ratchet over the registry's oracle
  * SQL (see [[graft.tools.OracleLint]] for the rules and the r15
  * post-mortem). Every NEW or EDITED oracle must emit integer grids
  * (`CAST(ROUND(x * 1eK) AS BIGINT)`, `CAST(SUM(..) AS BIGINT)`, or
  * pure integer arithmetic) in its outermost SELECT; the oracles that
  * were already driver-green in r15 are grandfathered by md5 in
  * `oracle_grandfather.tsv` — changing one re-triggers the lint, so
  * the corpus can only get cleaner. The EXECUTABLE gate remains
  * `scripts/check_oracle.py`'s strict full-precision compare; this
  * spec is the in-suite tripwire that fires at `sbt test` time,
  * before a dump ever reaches DuckDB. */
class OracleHygieneSpec extends AnyFunSuite {

  private def grandfather: Map[String, String] = {
    val in = getClass.getResourceAsStream("/oracle_grandfather.tsv")
    assert(in != null, "oracle_grandfather.tsv missing from resources")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(n, h) = l.split("\t"); n -> h
      }.toMap
  }

  test("every registry oracle is hazard-clean or grandfathered " +
      "verbatim (md5-pinned — an edit re-lints)") {
    val gf = grandfather
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val v = OracleLint.violations(sql)
        if (v.isEmpty) None
        else if (gf.get(name).contains(OracleLint.pinHash(sql))) None
        else Some(s"$name: ${v.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      "hazardous terminal emission in oracle SQL (the r15 driver-red " +
        "class). Emit integer grids instead — or, if this oracle is " +
        "historically driver-green and unchanged, its grandfather " +
        "hash is stale:\n" + offenders.mkString("\n"))
  }

  test("grandfather table refers only to live queries (no rot)") {
    val dead = grandfather.keySet -- SparkEntry.oracleSql.keySet
    assert(dead.isEmpty, s"grandfathered oracles no longer in the " +
      s"registry — regen via graft.tools.OracleLint: $dead")
  }

  test("planted R1: a gated ROUND-of-double in the outermost SELECT " +
      "fires (the q242/q244 r15 shape)") {
    val v = OracleLint.violations(
      """WITH c AS (SELECT COUNT(*) n FROM t)
         SELECT ROUND(CAST(n AS DOUBLE) / 7, 4) AS chi2,
                ROUND(CAST(n AS DOUBLE) / 7, 4) > 10.828 AS alarm
         FROM c""")
    assert(v.exists(_.startsWith("R1")), v.mkString("; "))
  }

  test("planted R1: ROUND of a window product (the q218 r15 shape) " +
      "fires when emitted as a double, passes as an e-grid integer") {
    assert(OracleLint.violations(
      "SELECT ROUND(1e6 * PERCENT_RANK() OVER w) AS pr6 FROM t")
      .exists(_.startsWith("R1")))
    assert(OracleLint.violations(
      "SELECT CAST(ROUND(x * 1e9) AS BIGINT) AS x9 FROM t").isEmpty)
  }

  test("planted R2: a bare SUM in the outermost SELECT fires; " +
      "CAST AS BIGINT / DOUBLE / DECIMAL forms pass") {
    assert(OracleLint.violations(
      """WITH a AS (SELECT 1 AS b FROM t)
         SELECT g, SUM(b) AS n FROM a GROUP BY g""")
      .exists(_.startsWith("R2")))
    assert(OracleLint.violations(
      "SELECT g, CAST(SUM(b) AS BIGINT) AS n FROM a GROUP BY g").isEmpty)
    assert(OracleLint.violations(
      "SELECT g, CAST(SUM(b) AS DOUBLE) AS n FROM a GROUP BY g").isEmpty)
    assert(OracleLint.violations(
      "SELECT ROUND(CAST(SUM(r) AS DECIMAL(18,2)), 2) AS rev " +
        "FROM a").isEmpty,
      "ROUND over an explicit DECIMAL is exact — allowed")
  }

  test("the lint is scoped to the outermost SELECT (a CTE ROUND is " +
      "the strict mirror's job, not the regex's)") {
    assert(OracleLint.violations(
      """WITH a AS (SELECT ROUND(x, 4) AS r FROM t)
         SELECT g FROM a""").isEmpty)
  }

  test("the ratchet bites: an edited grandfathered oracle loses its " +
      "exemption (hash mismatch)") {
    val gf = grandfather
    // take any live grandfathered query and perturb its SQL — the
    // perturbed text must not hash to the pinned value
    val (name, sql) = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .find(kv => gf.contains(kv._1)).get
    assert(gf(name) == OracleLint.pinHash(sql),
      s"$name is pinned but its live SQL differs from the pin")
    assert(gf(name) != OracleLint.pinHash(sql + " "),
      "an edit must invalidate the pin")
  }
}
