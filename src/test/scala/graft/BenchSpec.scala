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

  test("short stdout line for 130 queries fits a 2000-char tail window") {
    // worst-case render: every key 4 chars + quotes/colon + 0.000 value
    val n = 130
    val entry = "\"q999\":0.000,".length
    val overhead = """{"metric":"total","unit":"sec","sf":"/root/testdata/sf0.1","iters":2,"queries":{},"oracle_total":0.000,"value":0.000}""".length
    assert(n * entry + overhead < 2000)
  }
}
