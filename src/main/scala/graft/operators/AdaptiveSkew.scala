package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adaptive skew spelling (VERDICT r15 "do this" #1): the operator-level
  * chooser that closes the gap between "the engine MEASURES skew"
  * (tools/SkewProbe's max-task columns) and "the engine ACTS on it".
  * Instead of a human pinning plain-vs-salted per query (the former
  * q37/q166 spellings), [[decide]] consumes exactly the SkewProbe-style
  * stats — dimension size vs the session's broadcast threshold, hot-key
  * share of the fact — and picks one of the three spellings SkewProbe
  * showed the winning regimes for:
  *
  *   - [[JoinSpelling.Broadcast]] — the dimension fits the broadcast
  *     threshold. Spark's FIRST line of skew defense: a broadcast probe
  *     never shuffles the fact on the join key, and the downstream
  *     aggregate's map-side partials absorb any key distribution (a
  *     partial emits one row per key per partition, hot or not).
  *   - [[JoinSpelling.Plain]] — the dimension outgrows broadcast but no
  *     key is hot enough to straggle a reducer: a shuffled hash join
  *     (pinned, so the planner's size estimate can't misfire either way)
  *     is the plan a 100 TB deployment wants.
  *   - [[JoinSpelling.Salted]] — big dimension AND a hot key: the q166
  *     two-phase spelling, with the salt count sized from the stats
  *     (ceil(hotKeyRows / targetRowsPerTask)) instead of a constant, so
  *     the hot key spreads over exactly as many reducers as it needs.
  *
  * The stats come FREE when the dimension is itself a per-key aggregate
  * of the fact (the twins' shape — `user_total` IS the per-key fact row
  * count): [[statsFromDim]] is one k-row aggregate over the (cached)
  * dimension, no extra pass over the fact. For a dimension that does not
  * carry fact counts, the caller supplies the count column from whatever
  * stats source it has (a prior aggregate, ANALYZE output, a sample).
  *
  * Result equality across all three spellings is pinned by the shared
  * DuckDB oracle hash of q165/q166 (and q37's own oracle): the spelling
  * only reshapes the shuffle, never the rows. Reference anchor: SURVEY
  * §4's AQE-skew row; AQE's skew-join split cannot rescue the plain
  * spelling here because the aggregate consumes the join's hash
  * partitioning (see [[ScaleOps.q165SkewJoinPlain]]).
  */
object AdaptiveSkew {

  /** SkewProbe-style inputs to the decision: dimension row count, fact
    * row count, and the hottest key's fact row count.
    */
  final case class SkewStats(dimRows: Long, factRows: Long, hotKeyRows: Long)

  sealed trait JoinSpelling
  object JoinSpelling {
    case object Broadcast extends JoinSpelling
    case object Plain extends JoinSpelling
    final case class Salted(salts: Int) extends JoinSpelling
  }
  import JoinSpelling._

  /** The decision's tunables, all defaulted from the session.
    *
    * @param broadcastBytesLimit the session's autoBroadcastJoinThreshold
    *        (-1 = broadcast disabled, matching Spark's own sentinel)
    * @param dimRowBytes conservative per-row estimate of the dimension's
    *        BroadcastHashJoin build side (HashedRelation overhead
    *        included — two longs of data cost ~3× their width built)
    * @param hotShare a key owning more than this fraction of the fact is
    *        "hot" (a straggler candidate) once the join must shuffle
    * @param parallelism reducer count the salt spreads over (the
    *        cluster's defaultParallelism)
    * @param maxSalts cap on dimension replication (salting replicates
    *        the dim ×salts; past the reducer count more salt buys
    *        nothing and only inflates the dim exchange)
    * @param minTaskRows floor on one reducer's "fair share": a hot key
    *        below this many rows is sub-second work on any executor, so
    *        salting it pays the replicated-dim exchange for nothing —
    *        keeps the chooser from salting toy-sized facts whose
    *        factRows/parallelism rounds toward zero
    */
  final case class SkewPolicy(
      broadcastBytesLimit: Long,
      dimRowBytes: Long = 96L,
      hotShare: Double = 0.25,
      parallelism: Int = 32,
      maxSalts: Int = 64,
      minTaskRows: Long = 65536L)

  /** Policy from the live session: the REAL broadcast threshold and
    * parallelism, so the chooser and the planner agree on what fits.
    */
  def policyFor(spark: SparkSession): SkewPolicy =
    SkewPolicy(
      broadcastBytesLimit = spark.sessionState.conf.autoBroadcastJoinThreshold,
      parallelism = spark.sparkContext.defaultParallelism)

  /** The decision boundary, pure and spec-pinned (AdaptiveSkewSpec):
    * broadcast if the dim fits; else salt iff a key is hot enough to
    * straggle (owns > hotShare of the fact AND more rows than one
    * reducer's fair share); else plain shuffled hash.
    */
  def decide(stats: SkewStats, policy: SkewPolicy): JoinSpelling = {
    val dimBytes = stats.dimRows * policy.dimRowBytes
    val broadcastable =
      policy.broadcastBytesLimit > 0 && dimBytes <= policy.broadcastBytesLimit
    if (broadcastable) Broadcast
    else if (stats.factRows <= 0) Plain
    else {
      val targetRowsPerTask = math.max(
        policy.minTaskRows, stats.factRows / math.max(1, policy.parallelism))
      val share = stats.hotKeyRows.toDouble / stats.factRows
      if (share <= policy.hotShare || stats.hotKeyRows <= targetRowsPerTask) Plain
      else {
        val raw = math.ceil(stats.hotKeyRows.toDouble / targetRowsPerTask)
        Salted(math.max(2L, math.min(policy.maxSalts.toLong, raw.toLong)).toInt)
      }
    }
  }

  /** Stats from a dimension that carries per-key fact counts (the twins'
    * `user_total`): ONE aggregate over the k-row dim — dim cardinality,
    * total fact rows, hottest key's rows. The dim should be cached by
    * the caller (it is also the join's build side).
    */
  def statsFromDim(dim: DataFrame, countCol: String): SkewStats = {
    val r = dim.agg(
      count(lit(1)).as("d"),
      coalesce(sum(col(countCol)), lit(0L)).as("f"),
      coalesce(max(col(countCol)), lit(0L)).as("h")).head()
    SkewStats(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The twins' shared dim-join + aggregate contract under a CHOSEN
    * spelling: events ⋈ per-user dim, then per-user (count, dim total,
    * decimal-exact value sum). All three spellings return row-identical
    * results (the shared oracle hash pins it):
    *
    *   - Broadcast/Plain: single-level aggregate with [[Relational.dsum]]
    *     (map-side partials absorb the key distribution).
    *   - Salted(n): BOTH halves two-phase — join probes on (key, salt),
    *     partial aggregate per (key, salt) fused in-stage with the join
    *     (the join output is already hash-partitioned on exactly those
    *     keys, zero extra exchange), final merge over |keys|×n tiny
    *     partial rows. Partials merge in scaled-long integer arithmetic,
    *     bit-equal to dsum's single-phase spelling (the former
    *     q166_skew_join_salted in-line proof: |value| ≤ 1e4·100 keeps
    *     the merged long far inside 2^63).
    */
  def userDimJoinAgg(
      spark: SparkSession,
      events: DataFrame,
      dim: DataFrame,
      spelling: JoinSpelling): DataFrame = {
    import spark.implicits._
    def finish(joined: DataFrame): DataFrame = joined
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        first($"user_total").as("user_total"),
        Relational.dsum($"value").as("total_value"))
    val out = spelling match {
      case Broadcast =>
        finish(events.join(broadcast(dim), Seq("user_id")))
      case Plain =>
        finish(events.join(dim.hint("shuffle_hash"), Seq("user_id")))
      case Salted(salts) =>
        val se = events
          .withColumn("salt", pmod($"event_id", lit(salts)).cast("int"))
        val sd = dim.crossJoin(
          spark.range(salts).select($"id".cast("int").as("salt")))
        val d = graft.functions.DecScaledLong.decScaledLong($"value", 2)
        se.join(sd.hint("shuffle_hash"), Seq("user_id", "salt"))
          .groupBy($"user_id", $"salt")
          .agg(count(lit(1)).as("n_p"), first($"user_total").as("ut_p"),
            sum(d).as("v_p"))
          .groupBy($"user_id")
          .agg(
            sum($"n_p").as("n_events"),
            first($"ut_p").as("user_total"),
            (sum($"v_p").cast("double") / 100).as("total_value"))
    }
    out.transform(Relational.presentRanged(_, $"user_id"))
  }

  /** End-to-end adaptive spelling: build (and cache) the per-user dim,
    * probe its stats, [[decide]], run [[userDimJoinAgg]] under the
    * chosen spelling. The dim cache (ArtifactStore.frameCached, keyed by
    * the input files) makes the stats probe and the join share ONE
    * computed dimension — the probe costs one k-row aggregate job, never
    * a second fact scan.
    */
  def adaptiveUserDimJoinAgg(
      spark: SparkSession,
      events: => DataFrame,
      dimCacheName: String,
      inputs: Seq[String],
      policy: SkewPolicy): DataFrame = {
    import spark.implicits._
    val dim = graft.ArtifactStore.frameCached(spark, dimCacheName, 1, inputs) {
      events.groupBy($"user_id").agg(count(lit(1)).as("user_total"))
    }
    val spelling = decide(statsFromDim(dim, "user_total"), policy)
    userDimJoinAgg(spark, events, dim, spelling)
  }
}
