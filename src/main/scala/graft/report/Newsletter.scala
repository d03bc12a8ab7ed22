package graft.report

import org.apache.spark.sql.{DataFrame, Row}

/** Newsletter assembly (reference N2–N5, `src/utils/newsletter.py`):
  * driver-side formatting of collected aggregate rows, plot rendering via
  * [[Plots]] (java.awt, no external deps), and the HTML email structure
  * with inline base64 PNG attachments. The aggregates themselves (A2-A6)
  * are computed distributed in [[graft.etl.ChessEtl.colorStats]] /
  * [[graft.etl.ChessEtl.eloByWeekday]]; only the few result rows are
  * collected here. Sending stays behind an injectable [[NewsletterSender]]
  * (the reference's one SendGrid call, `newsletter.py:101-105`).
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

  /** `generate_win_ratio_by_color_text` parity (`newsletter.py:80-98`):
    * renders the stacked-bar plot to `ioDir/graphs/win-by-color-{player}
    * .png` and returns the text with the cid image embed; empty weekly
    * data returns the reference's easter-egg string.
    */
  def winRatioByColorHtml(colorStats: DataFrame, player: String, ioDir: String): String = {
    val rows = colorStats.collect()
    if (rows.isEmpty) return "Wait a second, no you didn't!"
    val plotRows = rows.map { r =>
      def d(n: String) = r.getDouble(r.fieldIndex(n))
      Plots.ColorStatsRow(
        r.getString(r.fieldIndex("time_control_category")),
        r.getString(r.fieldIndex("player_color")),
        d("Win"), d("Draw"), d("Loss"))
    }.toSeq
    Plots.colorStatsPlot(plotRows,
      new java.io.File(s"$ioDir/graphs/win-by-color-$player.png"))
    colorStatsText(colorStats) +
      " <br> <img alt='Win rate by color played' src='cid:win-by-color'><br>"
  }

  /** `generate_elo_by_weekday_text` parity (`newsletter.py:59-77`) with the
    * plot render + cid embed; empty data returns "\n".
    */
  def eloByWeekdayHtml(
      elo: DataFrame, category: String, player: String, ioDir: String): String = {
    val rows = elo.collect()
    if (rows.isEmpty) return "\n"
    val plotRows = rows.map { r =>
      def d(n: String) = r.getDouble(r.fieldIndex(n))
      Plots.EloRow(r.getLong(r.fieldIndex("weekday_played")).toInt,
        d("mean"), d("std"), d("min"), d("max"))
    }.toSeq
    Plots.eloByWeekdayPlot(plotRows,
      new java.io.File(s"$ioDir/graphs/elo-by-weekday-$player.png"))
    val maxElo = rows.map(r => r.getDouble(r.fieldIndex("max"))).max.toInt
    val minElo = rows.map(r => r.getDouble(r.fieldIndex("min"))).min.toInt
    s"This week, your highest elo in $category was $maxElo " +
      s"and your lowest elo was $minElo. <br>" +
      "<img alt='Elo by weekday' src='cid:elo-by-weekday'><br>"
  }

  /** Inline attachment, base64-encoded like the reference's
    * `mail.Attachment` (`newsletter.py:113-131`).
    */
  final case class Attachment(
      fileName: String, contentBase64: String, fileType: String,
      disposition: String, contentId: String) extends Serializable

  final case class Email(
      fromEmail: String, toEmails: String, subject: String,
      htmlContent: String, attachments: Seq[Attachment]) extends Serializable

  /** `create_newsletter` parity (`newsletter.py:108-140`): subject line,
    * every png under `graphs/` whose stem contains the player attached
    * inline with its stem as content id, and the html body frame.
    */
  def createNewsletter(
      texts: Seq[String], player: String, receiver: String,
      ioDir: String, sender: String = "graft@localhost"): Email = {
    val graphs = new java.io.File(s"$ioDir/graphs")
    val attachments = Option(graphs.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".png") &&
        f.getName.stripSuffix(".png").contains(player))
      .sortBy(_.getName)
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        Attachment(
          fileName = f.getName,
          contentBase64 = java.util.Base64.getEncoder.encodeToString(bytes),
          fileType = "image/png",
          disposition = "inline",
          contentId = f.getName.stripSuffix(".png"))
      }.toSeq
    val message =
      Seq(s"<html><body> Hi $player,<br><br>" +
        "This week you played chess! Here's your performance:") ++
        texts :+ "Hope you do well this upcoming week!</body></html>"
    Email(sender, receiver, s"Chess Newsletter - $player",
      message.mkString("<br>"), attachments)
  }

  /** `send_newsletter` parity: one injectable call, 202 == accepted. */
  trait NewsletterSender { def send(email: Email): Int }

  def sendNewsletter(email: Email, sender: NewsletterSender): Boolean =
    sender.send(email) == 202
}
