package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Bench's dependency-free detail-file parsing: the
  * regression baseline must come ONLY from the "queries" object, never
  * from metadata keys that happen to hold numbers.
  */
class BenchSpec extends AnyFunSuite {

  test("parseFlatNumbers reads only the queries object") {
    val detail =
      """{"metric":"total","value":101.714,"unit":"sec","n_queries":117,""" +
        """"sf":"/root/testdata/sf0.1",""" +
        """"regressions_vs_prior":{"dedup_minhash":{"prior":2.171,"now":3.4}},""" +
        """"queries":{"q1_agg":0.63,"dedup_minhash":2.171,"text_bm25":0.844}}"""
    val m = Bench.parseFlatNumbers(detail)
    assert(m === Map("q1_agg" -> 0.63, "dedup_minhash" -> 2.171, "text_bm25" -> 0.844))
    assert(!m.contains("value") && !m.contains("n_queries") &&
      !m.contains("prior") && !m.contains("now"))
  }

  test("parseFlatNumbers is empty on files without a queries object") {
    assert(Bench.parseFlatNumbers("""{"value":1.0}""") === Map.empty)
    assert(Bench.parseFlatNumbers("") === Map.empty)
  }

  test("parseFlatNumbers tolerates whitespace after colons (externally rewritten detail)") {
    // the r10 round-close detail was rewritten by an external JSON
    // serializer that emits `"queries": {` — the parse must not depend
    // on the exact byte layout Bench itself writes
    val detail =
      """{"metric": "total", "value": 777.3, "n_queries": 2, """ +
        """"regressions_vs_frozen": {"q1_agg": {"prior": 0.5, "now": 0.9}}, """ +
        """"queries": {"q1_agg": 0.72, "q7_topk": 0.148}}"""
    assert(Bench.parseFlatNumbers(detail) === Map("q1_agg" -> 0.72, "q7_topk" -> 0.148))
  }
}
