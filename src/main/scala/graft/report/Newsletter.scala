package graft.report

import org.apache.spark.sql.{DataFrame, Row}

/** Newsletter text assembly (reference N2/N3,
  * `src/utils/newsletter.py:18-77`): driver-side formatting of collected
  * aggregate rows. The aggregates themselves (A2-A6) are computed
  * distributed in [[graft.etl.ChessEtl.colorStats]] /
  * [[graft.etl.ChessEtl.eloByWeekday]]; only the few result rows are
  * collected here. Plots (N3/N4) are out of engine scope per SURVEY.md §2.7.
  */
object Newsletter {

  /** `get_color_stats_text` parity (`newsletter.py:18-56`): first row's
    * win rate, then either the same category's last row or the second
    * category's first row.
    */
  def colorStatsText(colorStats: DataFrame): String = {
    val rows = colorStats.collect()
    if (rows.isEmpty) return ""
    def cat(r: Row) = r.getString(r.fieldIndex("time_control_category"))
    def color(r: Row) = r.getString(r.fieldIndex("player_color"))
    def win(r: Row) = r.getDouble(r.fieldIndex("Win")) * 100

    val first = rows.head
    val firstStr =
      f"You had a ${win(first)}%.2f%% win rate with ${color(first)} in ${cat(first)}"
    val secondStr =
      if (rows.length > 1) {
        val sameCat = rows.filter(cat(_) == cat(first))
        val (row, catSubstr) =
          if (sameCat.length > 1) (sameCat.last, "")
          else (rows(1), " in " + cat(rows(1)))
        f" and a ${win(row)}%.2f%% win rate with ${color(row)}$catSubstr"
      } else ""
    firstStr + secondStr + "."
  }

  /** `generate_elo_by_weekday_text` parity (`newsletter.py:59-77`), minus
    * the plot embed.
    */
  def eloByWeekdayText(elo: DataFrame, category: String): String = {
    val rows = elo.collect()
    if (rows.isEmpty) return "\n"
    val maxElo = rows.map(r => r.getDouble(r.fieldIndex("max"))).max.toInt
    val minElo = rows.map(r => r.getDouble(r.fieldIndex("min"))).min.toInt
    s"This week, your highest elo in $category was $maxElo " +
      s"and your lowest elo was $minElo."
  }
}
