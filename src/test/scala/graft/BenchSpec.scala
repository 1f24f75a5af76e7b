package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts the bench stdout line depends on (no Spark session needed).
  *
  * Bench emits a SHORT stdout line keyed by the `qNN` prefix of each
  * query name so the whole line survives the harness's log-tail window
  * (the full-name line at 107 queries lost q01-q38 to truncation in r5).
  * That compression is only lossless if the prefixes are unique.
  */
class BenchSpec extends AnyFunSuite {

  test("qNN prefixes of SparkEntry.queries are unique (short bench keys are lossless)") {
    val names = SparkEntry.queries.keys.toSeq
    val prefixes = names.map(_.takeWhile(_ != '_'))
    val dups = prefixes.groupBy(identity).collect { case (p, g) if g.size > 1 => p }
    assert(dups.isEmpty, s"duplicate short bench keys: ${dups.mkString(", ")}")
    assert(names.forall(_.matches("q\\d+.*")), "query names must start with qNN")
  }

  test("every oracleSql key names a query (oracle_total sums real entries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: ${orphans.mkString(", ")}")
  }

  test("short stdout line fits a 2000-char tail window at WORST-CASE widths") {
    // worst-case render (r6 advice): with the 2-decimal trimmed form a
    // slow query renders "999.99" — 6 chars — so budget every entry at
    // that width and totals at 5 integer digits. Budgeted for the
    // CURRENT suite plus 10 queries of growth; when this fails again,
    // drop the per-query map from stdout entirely (the artifact file
    // carries it) rather than raising the bound.
    val n = SparkEntry.queries.size + 10
    val entry = "\"q999\":999.99,".length
    val overhead = """{"metric":"total","unit":"sec","sf":"/root/testdata/sf0.1","iters":2,"queries":{},"oracle_total":99999.999,"value":99999.999}""".length
    assert(n * entry + overhead < 2000,
      s"$n worst-case entries x $entry chars + $overhead overhead >= 2000")
  }

  test("f2t trims trailing zeros, keeps locale-pinned dots, never emits a bare dot") {
    assert(Bench.f2t(0.3) === "0.3")
    assert(Bench.f2t(12.0) === "12")
    assert(Bench.f2t(999.99) === "999.99")
    assert(Bench.f2t(0.0) === "0")
    assert(Bench.f2t(1.005) === "1" || Bench.f2t(1.005) === "1.01") // %.2f half-even on the repr
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.f2t(1.5) === "1.5")
    } finally java.util.Locale.setDefault(prev)
  }

  test("numeric renders are locale-pinned (parseable JSON under any default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // comma decimal
      assert(Bench.f3(1.5) === "1.500")
    } finally java.util.Locale.setDefault(prev)
  }
}
