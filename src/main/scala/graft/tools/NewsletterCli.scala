package graft.tools

import java.io.{File, FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.etl.ChessEtl
import graft.report.Newsletter
import graft.sources.JdbcUpsert

/** Entry point 3.2 — the newsletter runner
  * (`src/newsletter_entrypoint.py:21-105`): the five-step registry
  * (get_data → win_ratio_by_color → elo_by_weekday → create_email →
  * send_email) with parquet/file handoff through `--io_dir`, the
  * reference's argument surface (player / category / receiver), and a
  * serialized newsletter artifact between create and send (the reference
  * pickles; this writes Java serialization of the same structure).
  */
object NewsletterCli {

  final case class Args(
      player: String = "thibault",
      category: String = "blitz",
      receiver: String = "",
      ioDir: String = "",
      jdbcUrl: Option[String] = None,
      step: String = "",
      since: Option[LocalDate] = None)

  /** Test/deployment seam for the one outbound call. */
  @volatile var senderOverride: Option[Newsletter.NewsletterSender] = None

  private object StdoutSender extends Newsletter.NewsletterSender {
    def send(email: Newsletter.Email): Int = {
      println(s"[newsletter] to=${email.toEmails} subject='${email.subject}' " +
        s"html=${email.htmlContent.length}B attachments=${email.attachments.size}")
      202
    }
  }

  def parseArgs(argv: Array[String]): Args = {
    def loop(rest: List[String], a: Args): Args = rest match {
      case "--player" :: v :: t => loop(t, a.copy(player = v))
      case "--category" :: v :: t =>
        require(CopyGames.perfTypes(v), s"category must be one of ${CopyGames.perfTypes}")
        loop(t, a.copy(category = v))
      case "--receiver" :: v :: t => loop(t, a.copy(receiver = v))
      case "--io_dir" :: v :: t => loop(t, a.copy(ioDir = v))
      case "--jdbc_url" :: v :: t => loop(t, a.copy(jdbcUrl = Some(v)))
      case "--step" :: v :: t => loop(t, a.copy(step = v))
      case "--since" :: v :: t => loop(t, a.copy(since = Some(LocalDate.parse(v))))
      case Nil => a
      case other => sys.error(s"unrecognized arguments: $other")
    }
    val a = loop(argv.toList, Args())
    require(a.step.nonEmpty && a.ioDir.nonEmpty, "--step and --io_dir are required")
    require(steps.contains(a.step), s"--step must be one of ${steps.keys.toSeq.sorted}")
    a
  }

  private def weekData(a: Args): String = s"${a.ioDir}/week-data-${a.player}.parquet"

  /** SQL string literal for the pushed-down predicate: single quotes
    * doubled so a player value can never break out of the literal (the
    * value arrives from the CLI).
    */
  private[tools] def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** STEPS parity (`newsletter_entrypoint.py:98-103`). */
  val steps: Map[String, (SparkSession, Args) => Unit] = Map(
    // N1 weekly extract (`transforms.py:443-457`): last 7 days of
    // chess_games for the player, predicate pushed into the database
    "get_data" -> ((s, a) => {
      val cutoff = a.since.getOrElse(LocalDate.now().minusDays(7))
      val pred = s"player = ${sqlLit(a.player)} AND " +
        s"datetime_played >= {ts '$cutoff 00:00:00'}" // JDBC escape: portable
      JdbcUpsert.readWhere(s, a.jdbcUrl.getOrElse(sys.error("get_data requires --jdbc_url")),
        "chess_games", pred)
        .write.mode("overwrite").parquet(weekData(a))
    }),
    "win_ratio_by_color" -> ((s, a) => {
      val df = s.read.parquet(weekData(a))
      val text = Newsletter.winRatioByColorHtml(
        ChessEtl.colorStats(df), a.player, a.ioDir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"${a.ioDir}/win-by-color-${a.player}.txt"),
        text.getBytes("UTF-8"))
      ()
    }),
    "elo_by_weekday" -> ((s, a) => {
      val df = s.read.parquet(weekData(a))
      val text = Newsletter.eloByWeekdayHtml(
        ChessEtl.eloByWeekday(df, a.category), a.category, a.player, a.ioDir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"${a.ioDir}/elo-by-weekday-${a.player}.txt"),
        text.getBytes("UTF-8"))
      ()
    }),
    "create_email" -> ((_, a) => {
      val texts = Seq(s"win-by-color-${a.player}.txt", s"elo-by-weekday-${a.player}.txt")
        .map(f => new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"${a.ioDir}/$f")), "UTF-8"))
      val email = Newsletter.createNewsletter(texts, a.player, a.receiver, a.ioDir)
      val oos = new ObjectOutputStream(
        new FileOutputStream(new File(s"${a.ioDir}/newsletter-${a.player}.bin")))
      try oos.writeObject(email) finally oos.close()
    }),
    "send_email" -> ((_, a) => {
      val ois = new ObjectInputStream(
        new FileInputStream(new File(s"${a.ioDir}/newsletter-${a.player}.bin")))
      val email = try ois.readObject().asInstanceOf[Newsletter.Email] finally ois.close()
      val ok = Newsletter.sendNewsletter(email, senderOverride.getOrElse(StdoutSender))
      require(ok, "newsletter send was not accepted")
    }))

  def run(spark: SparkSession, argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    steps(a.step)(spark, a)
  }

  def main(argv: Array[String]): Unit = {
    val spark = Sessions.local()
    try run(spark, argv) finally spark.stop()
  }
}
