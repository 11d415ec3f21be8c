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

  // the three cells the r15b canonical run's per-cell healer actually
  // fired on (quiet-window priors -> ambient first readings): the >3x
  // class the cell trigger exists for
  private val r15bHealed = Seq(
    ("w10_obv_1m", 0.14, 0.52), ("w12_roll_corr_30m", 0.24, 0.98),
    ("w14_volume_profile", 0.27, 1.05))

  test("the r15b per-cell fixtures still fire the cell trigger") {
    val prior = r15bHealed.map { case (n, p, _) => n -> p }.toMap
    r15bHealed.foreach { case (n, _, t) =>
      assert(Bench.needsRemeasure(prior, n, t), s"$n should re-measure")
    }
  }

  test("parsePriorSf reads the record's sf field") {
    assert(Bench.parsePriorSf(record) === Some("/root/testdata/sf1"))
    assert(Bench.parsePriorSf("""{"queries":{}}""") === None)
  }

  test("familyOf groups by the leading alphabetic run") {
    assert(Bench.familyOf("u5_macd_1m") === "u")
    assert(Bench.familyOf("w11_vwap_1h") === "w")
    assert(Bench.familyOf("llm_winnow_fp") === "llm")
    assert(Bench.familyOf("s8j_incremental_grid") === "s")
    assert(Bench.familyOf("e2e_live_pipeline") === "e")
    assert(Bench.familyOf("q17_small_qty_revenue") === "q")
  }

  // the r15b ambient band: u/w indicator cells inflated 2-3x vs their
  // quiet-window priors — every cell UNDER the per-cell 3x trigger, so
  // only the family-median pass catches the drift
  test("familiesToHeal catches the r15b u-band drift the cell trigger missed") {
    val prior = Map("u5_macd_1m" -> 0.41, "u7_atr_14_1m" -> 0.47,
      "u9_williams_r_14_1m" -> 0.30, "w11_vwap_1h" -> 0.16,
      "q1_pricing_summary" -> 0.50)
    val now = Seq("u5_macd_1m" -> 1.15, "u7_atr_14_1m" -> 1.40,
      "u9_williams_r_14_1m" -> 0.75, "w11_vwap_1h" -> 0.46,
      "q1_pricing_summary" -> 0.52)
    // no single u cell crosses 3x...
    now.foreach { case (n, t) => assert(!Bench.needsRemeasure(prior, n, t)) }
    // ...but the u family's median ratio (2.80, 2.98, 2.5 -> 2.80) does
    assert(Bench.familiesToHeal(prior, now) === Set("u"))
  }

  test("familiesToHeal needs >= minCells prior-matched cells and median > 2x") {
    val prior = Map("w11_vwap_1h" -> 0.16, "w12_roll_corr_30m" -> 0.24)
    // only two w cells matched: below minCells, never healed as a family
    assert(Bench.familiesToHeal(prior,
      Seq("w11_vwap_1h" -> 0.49, "w12_roll_corr_30m" -> 0.70)) === Set.empty)
    // three cells but median exactly 2.0: strictly-above threshold holds
    val p3 = Map("a1_x" -> 1.0, "a2_y" -> 1.0, "a3_z" -> 1.0)
    assert(Bench.familiesToHeal(p3,
      Seq("a1_x" -> 2.0, "a2_y" -> 2.0, "a3_z" -> 2.0)) === Set.empty)
    assert(Bench.familiesToHeal(p3,
      Seq("a1_x" -> 2.1, "a2_y" -> 2.1, "a3_z" -> 2.1)) === Set("a"))
  }
}
