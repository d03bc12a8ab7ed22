package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.report.Newsletter

/** Entry point 3.2 end-to-end: weekly extract (predicate pushed over
  * JDBC), plot-carrying html fragments, email assembly with inline base64
  * PNG attachments, and the injectable send — the reference's five-step
  * registry driven through the CLI argument surface against a live Derby.
  */
class NewsletterCliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("five steps: get_data → texts+plots → create_email → send_email") {
    val io = Files.createTempDirectory("newsletter").toString
    val url = "jdbc:derby:memory:newsletter;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE chess_games (
        |  player VARCHAR(64), game_link VARCHAR(128),
        |  time_control_category VARCHAR(16), player_color VARCHAR(8),
        |  player_result VARCHAR(8), player_elo DOUBLE,
        |  datetime_played TIMESTAMP)""".stripMargin)
    val ins = conn.prepareStatement(
      "INSERT INTO chess_games VALUES (?, ?, ?, ?, ?, ?, ?)")
    def row(player: String, link: String, cat: String, color: String,
        result: String, elo: Double, ts: String): Unit = {
      ins.setString(1, player); ins.setString(2, link); ins.setString(3, cat)
      ins.setString(4, color); ins.setString(5, result); ins.setDouble(6, elo)
      ins.setTimestamp(7, java.sql.Timestamp.valueOf(ts)); ins.executeUpdate()
    }
    row("thibault", "g1", "blitz", "white", "Win", 1500, "2026-08-09 12:00:00")
    row("thibault", "g2", "blitz", "white", "Loss", 1492, "2026-08-09 13:00:00")
    row("thibault", "g3", "blitz", "black", "Win", 1505, "2026-08-10 12:00:00")
    row("thibault", "g4", "bullet", "black", "Win", 1450, "2026-08-10 14:00:00")
    row("thibault", "g0", "blitz", "white", "Win", 1400, "2026-01-01 12:00:00") // too old
    row("someone", "g9", "blitz", "white", "Win", 1600, "2026-08-09 12:00:00") // other player
    conn.close()

    val recorded = scala.collection.mutable.ArrayBuffer.empty[Newsletter.Email]
    NewsletterCli.senderOverride = Some(new Newsletter.NewsletterSender {
      def send(email: Newsletter.Email): Int = { recorded += email; 202 }
    })

    val base = Array("--player", "thibault", "--category", "blitz",
      "--receiver", "someone@example.invalid", "--io_dir", io,
      "--jdbc_url", url, "--since", "2026-08-05")
    Seq("get_data", "win_ratio_by_color", "elo_by_weekday",
      "create_email", "send_email")
      .foreach(step => NewsletterCli.run(spark, base ++ Array("--step", step)))

    // weekly extract: only this player's recent games crossed the wire
    val week = spark.read.parquet(s"$io/week-data-thibault.parquet")
    assert(week.count() == 4)

    // text fragments carry the reference wording + cid embeds
    val winText = new String(Files.readAllBytes(
      Paths.get(s"$io/win-by-color-thibault.txt")), "UTF-8")
    assert(winText.contains("% win rate with"))
    assert(winText.contains("src='cid:win-by-color'"))
    val eloText = new String(Files.readAllBytes(
      Paths.get(s"$io/elo-by-weekday-thibault.txt")), "UTF-8")
    assert(eloText.contains("your highest elo in blitz was 1505"))
    assert(eloText.contains("your lowest elo was 1492"))
    assert(eloText.contains("src='cid:elo-by-weekday'"))

    // plots rendered and decodable
    Seq("win-by-color-thibault.png", "elo-by-weekday-thibault.png").foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.File(s"$io/graphs/$f"))
      assert(img != null && img.getWidth == 640 && img.getHeight == 480, f)
    }

    // email structure + send contract
    assert(recorded.size == 1)
    val email = recorded.head
    assert(email.subject == "Chess Newsletter - thibault")
    assert(email.toEmails == "someone@example.invalid")
    assert(email.htmlContent.startsWith("<html><body> Hi thibault,<br><br>"))
    assert(email.htmlContent.contains("Hope you do well this upcoming week!</body></html>"))
    assert(email.attachments.map(_.contentId).sorted ==
      Seq("elo-by-weekday-thibault", "win-by-color-thibault"))
    assert(email.attachments.forall(a =>
      a.fileType == "image/png" && a.disposition == "inline" &&
        a.contentBase64.nonEmpty))
  }
}
