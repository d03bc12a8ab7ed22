package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** SCALE.md lever probe: times the fixed-parameter quadratic growers next
  * to their scale-levered variants at one scale factor, so the sf0.1 /
  * sf1p / sf3p table can show the growth returning to ~linear when the
  * lever tracks the corpus (bits ≈ log2(N / target-density)).
  *
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_LSH_BITS (the sf-scaled bits; default 6 = the oracle pin).
  * Output: one JSON line, min of two measured passes per entry.
  */
object LeverBench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val bits = sys.env.getOrElse("SPARK_GRAFT_LSH_BITS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // this VM's kernel serializes the mmap/munmap churn of NIO
      // transferTo shuffle-file merges (mmap_lock + TLB-shootdown storms:
      // 27 of 31 task threads stuck in FileChannelImpl.map0/unmap0 while
      // the box sat 97% idle); plain stream copy avoids mmap entirely
      .config("spark.file.transferTo", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def emb() = Tables.spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding",
        expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))").as("nn"))

    val nVecs = Tables.embeddings(spark, sfDir).count()
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "q62_semdedup_fixed_k8" -> (() => Similarity.q62Semdedup(spark, sfDir)),
      "semdedup_lsh_bits6_fixed" -> (() =>
        Similarity.semdedupLsh(emb(), bands = 2, bits = 6, tau = Similarity.semdedupTau)),
      s"semdedup_lsh_bits${bits}_scaled" -> (() =>
        Similarity.semdedupLsh(emb(), bands = 2, bits = bits, tau = Similarity.semdedupTau)),
      "q45_lsh_neardup_bits6_fixed" -> (() => Similarity.q45LshNearDup(spark, sfDir)),
      // q45's contract (bands=2, bits=6, tau=0.3) with the q80 bits lever
      // applied — the pair the sf10p table shows as contract-vs-lever
      s"q45_lsh_neardup_bits${bits}_scaled" -> (() =>
        Similarity.q45LshNearDupScaled(spark, sfDir, bits))
    )
    // SPARK_GRAFT_LEVER_ONLY=substr[,substr...] restricts the probe set —
    // at sf10p the fixed-density growers take hundreds of seconds EACH and
    // the full suite already times them; the lever run only needs the
    // scaled rows
    val onlyF = sys.env.get("SPARK_GRAFT_LEVER_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = onlyF match {
      case Some(pats) => probes.filter { case (n, _) => pats.exists(n.contains) }
      case None => probes
    }
    // a filter that matches nothing is a typo, not a valid empty run
    // (ADVICE r15) — fail loudly instead of emitting an empty artifact
    if (selected.isEmpty) {
      System.err.println(
        s"[lever] SPARK_GRAFT_LEVER_ONLY=${onlyF.map(_.mkString(",")).getOrElse("")} " +
          s"selected zero probes of ${probes.map(_._1).mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    // warm pass (JIT + codegen), then two measured passes, min per entry
    selected.foreach { case (_, fn) => try force(fn()) catch { case _: Throwable => () } }
    // a probe that dies (OOM on a fixed-density grower is exactly what
    // this tool exists to catch) records -1 instead of aborting the run
    // and losing every other probe's timing
    def pass(): Map[String, Double] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn()); name -> (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[lever] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }.toMap
    val p1 = pass(); val p2 = pass()
    val qs = selected.map { case (name, _) =>
      "\"" + name + "\":" + f"${math.min(p1(name), p2(name))}%.3f"
    }.mkString("{", ",", "}")
    // the filter (and the names it selected) are part of the artifact
    // (ADVICE r15): a committed lever JSON must show whether it was a
    // restricted run
    val filterJson = onlyF
      .map(p => "\"" + p.mkString(",") + "\"").getOrElse("null")
    val selJson = selected.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"lever_bench":$qs,"n_vecs":$nVecs,"bits_scaled":$bits,""" +
      s""""only_filter":$filterJson,"selected":$selJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
