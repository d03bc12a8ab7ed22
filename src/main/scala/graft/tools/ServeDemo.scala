package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.DriverManager

import graft.Sessions
import graft.streaming.EventStream

/** Demo main for the streaming serve path: events parquet replayed as a
  * stream → watermarked hourly aggregate → transactional JDBC upsert sink
  * (embedded Derby stands in for the serving database). Prints the served
  * row count and a sample so the wiring can be driven from the CLI:
  *
  *   sbt "runMain graft.tools.ServeDemo /root/testdata/sf0.001"
  */
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local()
    val url = "jdbc:derby:memory:servedemo;create=true"
    val setup = DriverManager.getConnection(url)
    setup.createStatement().executeUpdate(
      """CREATE TABLE hourly_serve (
        |  bucket_start BIGINT NOT NULL,
        |  event_type VARCHAR(64) NOT NULL,
        |  n BIGINT,
        |  total_value DOUBLE)""".stripMargin)
    setup.close()

    val dir = Files.createDirectories(Paths.get("target/serve_demo_events"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val checkpoint = Files.createTempDirectory("serve_demo_ckpt").toString

    val q = EventStream.toJdbc(
      EventStream.hourlyCounts(spark, dir.toString),
      url, "hourly_serve", Seq("bucket_start", "event_type"), checkpoint)
    try q.processAllAvailable() finally q.stop()

    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery(
      "SELECT bucket_start, event_type, n, total_value FROM hourly_serve " +
        "ORDER BY bucket_start, event_type")
    var count = 0
    while (rs.next()) {
      if (count < 5)
        println(s"served: ${rs.getLong(1)} ${rs.getString(2)} " +
          s"n=${rs.getLong(3)} total=${rs.getDouble(4)}")
      count += 1
    }
    conn.close()
    println(s"SERVED_ROWS=$count")
    spark.stop()
  }
}
