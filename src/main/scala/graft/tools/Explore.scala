package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch profiling main (not part of the driver contract). */
object Explore {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[explore] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm-up

    val docs = Tables.documents(spark, dir).repartition(32)
      .select($"doc_id", $"lang", $"source", $"text")
    val rows = graft.operators.Dedup.shingleRows(spark, docs)
    time("shingleRows count")(rows.count())
    time("shingleRows+md5")(
      rows.select(pmod(graft.operators.Dedup.portableHash($"shingle"), lit(97L)).as("m"))
        .agg(sum("m")).collect())
    time("q27 full")(graft.operators.Dedup.q27MinhashSig(spark, dir).count())
    time("q27 again")(graft.operators.Dedup.q27MinhashSig(spark, dir).count())
    time("q26 full")(graft.operators.Dedup.q26ShingleJaccard(spark, dir).count())
    time("q28 full")(graft.operators.Dedup.q28MinhashPairs(spark, dir).count())

    // chess parse throughput: random legal games rendered to PGN with
    // clock/eval comments, then the full parse + 7-visitor fold
    val nGames = 4000
    def genGame(seed: Int): String = {
        val rnd = new scala.util.Random(seed)
        val b = graft.chess.Board.initial
        val sb = new StringBuilder(s"[Site \"https://lichess.org/g$seed\"]\n\n")
        var ply = 0
        var done = false
        while (ply < 80 && !done) {
          val moves = b.legalMoves
          if (moves.isEmpty) done = true
          else {
            val (f, t, p) = moves(rnd.nextInt(moves.length))
            val pre = b.copyBoard(); val post = b
            post.applyMove(f, t, p)
            val kingside = if (pre.piece(f).toUpper == 'K' && math.abs(t % 8 - f % 8) == 2)
              Some(t % 8 == 6) else None
            val cap = pre.piece(t) != 0 ||
              (pre.piece(f).toUpper == 'P' && t % 8 != f % 8)
            val san = graft.chess.San.render(pre, post,
              graft.chess.SanMove(f, t, pre.piece(f).toUpper, cap, p, kingside))
            if (ply % 2 == 0) sb.append(s"${ply / 2 + 1}. ")
            sb.append(san)
              .append(s" { [%eval 0.${ply % 100}] [%clk 0:0${ply % 10}:0${ply % 6}] } ")
            ply += 1
          }
        }
        sb.append("1-0").toString
    }
    println("[explore] driver-side gen: " + genGame(0).take(160))
    import spark.implicits._
    val ds = time(s"generate $nGames games") {
      val d = spark.range(nGames).repartition(64)
        .map(i => genGame(i.toInt)).cache()
      d.count(); d
    }
    println("[explore] sample pgn: " + ds.first().take(300))
    val t0 = System.nanoTime()
    val parsed = graft.etl.ChessEtl.parse(spark, ds)
    println("[explore] parsed games: " + parsed.count())
    val total = parsed.map(_.moves.length).reduce(_ + _)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[explore] chess parse: $nGames games / $total plies in $secs%.2f s = " +
      f"${nGames / secs}%.0f games/s, ${total / secs}%.0f plies/s (32 threads)")
    spark.stop()
  }
}
