package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench transient self-healer ([[Bench.parsePriorQueries]] /
  * [[Bench.needsRemeasure]]): prior-record parsing keeps only registered
  * query cells, and the 3× trigger fires strictly above the threshold. */
class BenchRemeasureSpec extends AnyFunSuite {

  private val record =
    """{"metric":"total","value":263.2,"unit":"sec","batch_total":200.11,
      |"streaming_total":63.09,"queries":{"q1_agg":0.15,"llm_winnow_dedup":4.54,
      |"t11_dedup_bounded":2.5e0},"failed":[],"runs":2,"stat":"min",
      |"load_ambient":1.05,"load_before":1.2,"load_after":3.4,
      |"comparable":true,"sf":"/root/testdata/sf1"}""".stripMargin

  test("parsePriorQueries keeps query cells, drops record numerics") {
    val prior = Bench.parsePriorQueries(record,
      Set("q1_agg", "llm_winnow_dedup", "t11_dedup_bounded", "absent_query"))
    assert(prior === Map("q1_agg" -> 0.15, "llm_winnow_dedup" -> 4.54,
      "t11_dedup_bounded" -> 2.5))
    // non-query numerics (value, load_*, totals) never leak through
    assert(!prior.contains("value") && !prior.contains("load_ambient"))
  }

  test("needsRemeasure fires strictly above 3x prior, never without a prior") {
    val prior = Map("llm_winnow_dedup" -> 4.54)
    assert(Bench.needsRemeasure(prior, "llm_winnow_dedup", 16.0))
    assert(!Bench.needsRemeasure(prior, "llm_winnow_dedup", 4.54 * 3.0))
    assert(!Bench.needsRemeasure(prior, "llm_winnow_dedup", 5.0))
    assert(!Bench.needsRemeasure(prior, "never_seen", 1000.0))
    assert(!Bench.needsRemeasure(Map("z" -> 0.0), "z", 1000.0))
  }
}
