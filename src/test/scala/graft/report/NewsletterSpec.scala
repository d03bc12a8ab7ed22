package graft.report

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** N2/N3 text parity (`tests/test_newsletter*` behavior of
  * `utils/newsletter.py:18-77`).
  */
class NewsletterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("color stats text: same-category two rows") {
    import spark.implicits._
    val stats = Seq(
      ("blitz", "black", 0.25, 0.25, 0.5),
      ("blitz", "white", 0.5, 0.0, 0.5)
    ).toDF("time_control_category", "player_color", "Win", "Draw", "Loss")
    assert(Newsletter.colorStatsText(stats) ==
      "You had a 25.00% win rate with black in blitz" +
        " and a 50.00% win rate with white.")
  }

  test("color stats text: cross-category second row") {
    import spark.implicits._
    val stats = Seq(
      ("blitz", "black", 0.25, 0.25, 0.5),
      ("bullet", "white", 1.0, 0.0, 0.0)
    ).toDF("time_control_category", "player_color", "Win", "Draw", "Loss")
    assert(Newsletter.colorStatsText(stats) ==
      "You had a 25.00% win rate with black in blitz" +
        " and a 100.00% win rate with white in bullet.")
  }

  test("color stats text: single row") {
    import spark.implicits._
    val stats = Seq(("blitz", "white", 0.5, 0.25, 0.25))
      .toDF("time_control_category", "player_color", "Win", "Draw", "Loss")
    assert(Newsletter.colorStatsText(stats) ==
      "You had a 50.00% win rate with white in blitz.")
  }

  test("elo by weekday text") {
    import spark.implicits._
    val elo = Seq((0L, 1500.0, 0.0, 1400.0, 1600.0), (1L, 1520.0, 10.0, 1450.0, 1700.0))
      .toDF("weekday_played", "mean", "std", "min", "max")
    assert(Newsletter.eloByWeekdayText(elo, "blitz") ==
      "This week, your highest elo in blitz was 1700 and your lowest elo was 1400.")
  }
}
