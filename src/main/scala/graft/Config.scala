package graft

/** P12: config-driven parameter expansion with fail-fast validation —
  * env-var-overridable defaults for the indicator/signal fan-out, mirroring
  * the reference's config semantics (reference: src/config/config.py:24-113;
  * tests/config/test_config.py:21-75): unset → default, set-but-invalid →
  * immediate error (never a silent fallback). These values drive *plan
  * construction* (which periods × timeframes to union), not row-level
  * computation.
  *
  * `env` is injectable so specs can exercise the validation without
  * mutating the process environment. */
final class Config(env: Map[String, String] = sys.env) {

  private def str(name: String, default: String): String =
    env.get(name) match {
      case None => default
      case Some(v) =>
        val s = v.trim
        require(s.nonEmpty, s"$name must not be empty")
        s
    }

  private def int(name: String, default: Int): Int =
    env.get(name) match {
      case None => default
      case Some(v) => v.toIntOption
        .getOrElse(throw new IllegalArgumentException(s"$name must be an integer: '$v'"))
    }

  private def intList(name: String, default: Seq[Int]): Seq[Int] =
    env.get(name) match {
      case None => default
      case Some(v) =>
        val items = v.split(",", -1).map(_.trim).toSeq
        require(items.nonEmpty && items.forall(_.nonEmpty),
          s"$name must be a comma-separated list of integers")
        items.map(i => i.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"$name must be a comma-separated list of integers: '$v'")))
    }

  private def strList(name: String, default: Seq[String]): Seq[String] =
    env.get(name) match {
      case None => default
      case Some(v) =>
        val items = v.split(",", -1).map(_.trim).toSeq
        require(items.nonEmpty && items.forall(_.nonEmpty),
          s"$name must be a comma-separated list of strings")
        items
    }

  val period: Int = int("DEFAULT_PERIOD", 14)
  val currencyPairCode: String = str("DEFAULT_CURRENCY_PAIR_CODE", "USD/JPY")
  val timeframeCode: String = str("DEFAULT_TIMEFRAME_CODE", "1m")
  val periods: Seq[Int] = intList("DEFAULT_PERIODS", Seq(14, 28, 56))
  val timeframes: Seq[String] = strList("DEFAULT_TIMEFRAMES", Seq("1m", "5m", "30m", "1h", "4h"))
  val shortPeriod: Int = int("DEFAULT_SHORT_PERIOD", 14)
  val longPeriod: Int = int("DEFAULT_LONG_PERIOD", 28)

  require(shortPeriod < longPeriod,
    s"DEFAULT_SHORT_PERIOD ($shortPeriod) must be < DEFAULT_LONG_PERIOD ($longPeriod)")
  require(periods.forall(_ >= 2), s"DEFAULT_PERIODS must all be >= 2: $periods")
}

object Config {
  /** Process-environment instance (validated at first use). */
  lazy val default: Config = new Config()
}
