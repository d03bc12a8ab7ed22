package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC upsert sink with the reference's exact semantics
  * (`src/pipeline_import/postgres_templates.py:160-214`): bulk-load the
  * batch into a staging table, then in ONE driver-side transaction delete
  * target rows whose id-tuple appears in staging and insert everything from
  * staging. Spark has no built-in JDBC upsert; the staging write is the
  * distributed part (executors stream partitions into the table), the
  * delete+insert is metadata-scale work on the driver.
  *
  * The SQL is deliberately portable (no Postgres `USING`, no `ON CONFLICT`)
  * so it runs against Postgres, Derby, etc.; the transactional
  * delete+insert keeps the reference's atomicity guarantee
  * (SURVEY.md §7.4 item 6).
  */
object JdbcUpsert {

  /** Row-count guard (S8, `postgres_templates.py:175-178`): skip the load
    * entirely for an empty batch.
    */
  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      idCols: Seq[String],
      props: Properties = new Properties()): Unit = {
    if (df.isEmpty) return
    // per-run unique staging name: a fixed shared name would let two
    // concurrent loads into the same target (e.g. the streaming
    // foreachBatch sink racing a batch loadAll) overwrite each other's
    // staging rows between the overwrite-write and the delete/insert
    // transaction. The reference gets this isolation from a
    // connection-scoped TEMPORARY table (postgres_templates.py); plain
    // JDBC across Spark's writer and the txn connection needs a unique
    // permanent name instead, dropped in the finally below.
    val staging =
      s"${table}_stg_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    // column reconciliation against the live table BEFORE the staging
    // write, like the reference reads information_schema and ingests only
    // matching columns (`postgres_templates.py:187-203`) — the source frame
    // may carry array/map columns the serving table doesn't store.
    val preCols = {
      val c = DriverManager.getConnection(url, props)
      try tableColumns(c, table) finally c.close()
    }
    val projected = df.select(
      df.columns.filter(dc => preCols.exists(_.equalsIgnoreCase(dc))).map(df.col): _*)
    // Spark's generic dialects map StringType to CLOB/TEXT, which some
    // databases (Derby) refuse to compare against VARCHAR keys — pin
    // string columns to VARCHAR in the staging DDL.
    val stringCols = projected.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(4096)")
    val writer = projected.write.mode("overwrite")
    val withTypes =
      if (stringCols.nonEmpty)
        writer.option("createTableColumnTypes", stringCols.mkString(", "))
      else writer
    // ONE try/finally spans the staging write AND the delete/insert
    // transaction: a failure in the Spark write itself (mid-write executor
    // death, constraint violation) must not leak the uniquely-named staging
    // table — unlike the old fixed name, leaked unique tables would
    // accumulate across runs.
    try {
      withTypes.jdbc(url, staging, props)

      val conn = DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        // identifiers quoted with each table's catalog-exact case (Spark
        // writes the staging table with quoted lower-case names; a hand-made
        // target table may be upper-cased by the database)
        val targetCols = tableColumns(conn, table)
        val stagingCols = tableColumns(conn, staging)
        def q(c: String) = "\"" + c + "\""
        val shared = targetCols.flatMap { tc =>
          stagingCols.find(_.equalsIgnoreCase(tc)).map(sc => (tc, sc))
        }.filter { case (tc, _) => df.columns.exists(_.equalsIgnoreCase(tc)) }
        val keyMatch = idCols.map { k =>
          val (tc, sc) = shared.find(_._1.equalsIgnoreCase(k)).getOrElse(
            throw new IllegalArgumentException(s"id column $k missing from $table/$staging"))
          s"$table.${q(tc)} = $staging.${q(sc)}"
        }.mkString(" AND ")
        val st = conn.createStatement()
        st.executeUpdate(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $staging WHERE $keyMatch)")
        st.executeUpdate(
          s"INSERT INTO $table (${shared.map(c => q(c._1)).mkString(", ")}) " +
            s"SELECT ${shared.map(c => q(c._2)).mkString(", ")} FROM $staging")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally {
        conn.close()
      }
    } finally {
      // best-effort drop on a fresh connection so it runs no matter where
      // the write or the transaction failed
      try {
        val c = DriverManager.getConnection(url, props)
        try c.createStatement().executeUpdate(s"DROP TABLE $staging")
        finally c.close()
      } catch { case _: Throwable => () }
    }
  }

  private def tableColumns(conn: Connection, table: String): Seq[String] = {
    val md = conn.getMetaData
    val rs = md.getColumns(null, null, table.toUpperCase, null)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (rs.next()) buf += rs.getString("COLUMN_NAME")
    if (buf.nonEmpty) buf.toSeq
    else { // lower-case catalogs (Postgres)
      val rs2 = md.getColumns(null, null, table.toLowerCase, null)
      while (rs2.next()) buf += rs2.getString("COLUMN_NAME")
      buf.toSeq
    }
  }

  /** S5-style pushdown read: the predicate travels to the database as a
    * dbtable subquery, so only matching rows cross the wire
    * (`src/vendors/stockfish.py:44-50`).
    */
  def readWhere(
      spark: SparkSession,
      url: String,
      table: String,
      predicate: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, s"(SELECT * FROM $table WHERE $predicate) pushed", props)

  /** Typed wrappers mirroring `postgres_templates.py:13-157`'s seven
    * loaders: each table with its upsert key.
    */
  val tableKeys: Map[String, Seq[String]] = Map(
    "chess_games" -> Seq("player", "game_link"),
    "game_moves" -> Seq("game_link", "half_move"),
    "game_clocks" -> Seq("game_link", "half_move"),
    "game_positions" -> Seq("game_link", "half_move"),
    "game_materials" -> Seq("game_link", "half_move"),
    "position_evals" -> Seq("fen"),
    "win_probabilities" -> Seq("game_link", "half_move"))

  def upsertNamed(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    upsert(df, url, table, tableKeys(table), props)
}
