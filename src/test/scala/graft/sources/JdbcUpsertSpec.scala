package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Upsert-sink semantics against an embedded Derby database: staging load,
  * transactional delete+insert, idempotent re-load, update-in-place —
  * exactly the reference's `_load_to_table` contract
  * (`postgres_templates.py:160-214`).
  */
class JdbcUpsertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val url = "jdbc:derby:memory:upserttest;create=true"

  test("upsert: insert, idempotent replay, update by key, append new keys") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE position_evals (
        |  fen VARCHAR(128) NOT NULL,
        |  evaluation DOUBLE,
        |  eval_depth INT)""".stripMargin)
    conn.close()

    def readAll(): Map[String, (Double, Int)] = {
      val c = DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery(
        "SELECT fen, evaluation, eval_depth FROM position_evals")
      val buf = scala.collection.mutable.Map.empty[String, (Double, Int)]
      while (rs.next()) buf(rs.getString(1)) = (rs.getDouble(2), rs.getInt(3))
      c.close()
      buf.toMap
    }

    val batch1 = Seq(("fen_a", 0.5, 20), ("fen_b", -1.2, 20))
      .toDF("fen", "evaluation", "eval_depth")
    JdbcUpsert.upsertNamed(batch1, url, "position_evals")
    assert(readAll() == Map("fen_a" -> ((0.5, 20)), "fen_b" -> ((-1.2, 20))))

    // replaying the same batch must not duplicate
    JdbcUpsert.upsertNamed(batch1, url, "position_evals")
    assert(readAll().size == 2)

    // overlapping keys update, new keys append — atomically
    val batch2 = Seq(("fen_b", 3.3, 22), ("fen_c", 0.0, 20))
      .toDF("fen", "evaluation", "eval_depth")
    JdbcUpsert.upsertNamed(batch2, url, "position_evals")
    assert(readAll() == Map(
      "fen_a" -> ((0.5, 20)), "fen_b" -> ((3.3, 22)), "fen_c" -> ((0.0, 20))))

    // empty batch short-circuits (S8 row-count guard)
    JdbcUpsert.upsertNamed(batch2.limit(0), url, "position_evals")
    assert(readAll().size == 3)

    // no staging table survives a load (per-run unique names, dropped in
    // the finally — two concurrent loads can no longer clobber each other)
    val c2 = DriverManager.getConnection(url)
    val rs = c2.getMetaData.getTables(null, null, "%", Array("TABLE"))
    val tables = scala.collection.mutable.ArrayBuffer.empty[String]
    while (rs.next()) tables += rs.getString("TABLE_NAME")
    c2.close()
    assert(!tables.exists(_.toLowerCase.contains("_stg")), tables)
  }

  test("pushdown read returns only matching rows") {
    val df = JdbcUpsert.readWhere(spark, url, "position_evals", "evaluation > 0")
    val fens = df.collect().map(_.getString(0)).toSet
    assert(fens == Set("fen_a", "fen_b"))
  }
}
