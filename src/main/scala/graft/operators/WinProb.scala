package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Closed-form multinomial logistic-regression scoring (reference M1/M2:
  * `src/pipeline_import/models.py:102-121` scores a pickled sklearn LR; we
  * export the idea as a softmax column expression — deterministic, codegen'd,
  * no MLlib runtime needed).
  *
  * Features mirror the reference's shapes: a clipped linear feature
  * (`np.clip`, `models.py:63-80`), a log feature (reverse-sigmoid analog),
  * and a binary flag (`has_increment`, `inference.py:31`). Probabilities
  * are rounded to 6dp exactly like `predict_wp` (`models.py:118-120`).
  */
object WinProb {

  /** 3-class coefficient matrix over [x1, x2, x3] + intercept. */
  val coef: Seq[Seq[Double]] = Seq(
    Seq(0.8, -1.2, 0.5, -0.3), // class win
    Seq(-0.2, 0.4, -0.9, 0.1), // class draw
    Seq(-0.6, 0.8, 0.4, 0.2))  // class loss

  def q33WpSoftmax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x1 = least(greatest($"value", lit(1.0)), lit(500.0)) / 100.0
    val x2 = log(least(greatest($"value", lit(1.0)), lit(500.0)))
    val x3 = ($"user_id" % 2).cast("double")
    val zs = coef.map { case Seq(a, b, c, d) => exp(x1 * a + x2 * b + x3 * c + d) }
    val denom = zs.reduce(_ + _)
    Tables.events(spark, dir)
      .select(
        $"event_id",
        round(zs(0) / denom, 6).as("p_win"),
        round(zs(1) / denom, 6).as("p_draw"),
        round(zs(2) / denom, 6).as("p_loss"),
        lit("wp_v1").as("model_version"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_wp_softmax" -> (q33WpSoftmax _))

  val oracles: Map[String, String] = Map(
    "q33_wp_softmax" -> {
      val x1 = "least(greatest(value, 1.0), 500.0) / 100.0"
      val x2 = "ln(least(greatest(value, 1.0), 500.0))"
      val x3 = "CAST(user_id % 2 AS DOUBLE)"
      val zs = coef.map { case Seq(a, b, c, d) =>
        s"exp(($x1) * $a + ($x2) * $b + ($x3) * $c + $d)"
      }
      val denom = zs.mkString(" + ")
      s"""SELECT event_id,
         |  round((${zs(0)}) / ($denom), 6) AS p_win,
         |  round((${zs(1)}) / ($denom), 6) AS p_draw,
         |  round((${zs(2)}) / ($denom), 6) AS p_loss,
         |  'wp_v1' AS model_version
         |FROM events ORDER BY event_id""".stripMargin
    })
}
