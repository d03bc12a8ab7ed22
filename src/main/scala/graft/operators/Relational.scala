package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators (SURVEY.md §2.2/§2.3/§2.4/§2.5) expressed over
  * the driver's synthetic tables.
  *
  * Determinism notes for the DuckDB oracle: floating-point SUM/AVG are
  * order-dependent, and Spark's partial-aggregation order differs from
  * DuckDB's sequential scan. Every money/quantity aggregate therefore runs
  * over `DECIMAL(18,2)` (exact, associative) and casts the final result to
  * double, which is bit-identical in both engines. Non-associative stats
  * (avg, stddev) are computed from exact decimal moments with an explicit
  * double-arithmetic formula evaluated in the same operation order on both
  * sides. Timestamps are surfaced as epoch BIGINTs (parquet ns vs µs units
  * would otherwise make the frames dtype-mismatch).
  *
  * Scale notes (100 TB): every aggregate here is map-side partial (shuffle
  * carries |groups|, not |rows|); dimension joins broadcast the small side;
  * window functions partition by high-cardinality keys (user_id, game-like
  * ids), never a constant; no driver-side collect anywhere.
  */
object Relational {

  /** Presentation sort for DIMENSION-BOUNDED results ONLY: one partition,
    * in-partition sort. A global `orderBy` plans a range exchange whose
    * SAMPLING pass re-executes every post-shuffle operator feeding it —
    * a window- or object-aggregate-heavy final stage runs TWICE to sort
    * a handful of rows (measured +0.32 s on q147's 75-row output at
    * sf1p). For results bounded by a dimension (brands, priorities,
    * event types, weekdays, languages, cluster count k) the
    * single-partition sort is strictly cheaper and sampling-free.
    * Results whose row count grows with the DATA must use
    * [[presentRanged]] instead — a single task sorting a corpus-grain
    * frame is a 2 GB-partition wall at 100 TB.
    */
  def presentSorted(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Presentation sort for CORPUS-GRAIN results — per-document,
    * per-customer, per-user, per-event, per-part rows that grow with the
    * data. The contract is CLUSTERED presentation: rows sort by key
    * within each partition, with no cross-partition total order. That is
    * the only spelling with zero scale cost — a single-partition sort
    * ([[presentSorted]]) funnels the whole result through one task (a
    * 2 GB wall at 100 TB), and a global range sort (`orderBy`) plans a
    * sampling pass that RE-EXECUTES the entire query pipeline once
    * before sorting it (measured +6.5 s across the sf0.1 suite when
    * these ~50 call sites briefly used it). A distributed engine writes
    * corpus-grain results partitioned anyway; a consumer that needs a
    * total order pays `orderBy` at its own (visible) cost, and the
    * driver's correctness gate compares row-sorted. In-partition order
    * is deterministic per plan; partition assignment follows the plan's
    * existing partitioning, exactly what the parquet sink preserves.
    */
  def presentRanged(df: DataFrame, cols: Column*): DataFrame =
    df.sortWithinPartitions(cols: _*)

  /** Exact global `ntile(n)` under a total order, WITHOUT the
    * single-task global window: `ntile(n).over(Window.orderBy(...))`
    * plans one unpartitioned WindowExec — the entire input sorts in ONE
    * task, a hard wall at corpus grain (q102 ran 1M rows through it at
    * sf1p; 100 TB would never finish). This spelling is the classic
    * parallel rank decomposition:
    *
    *   1. range-repartition + in-partition sort on the total order
    *      (scales out; partitions are ordered ranges),
    *   2. `monotonically_increasing_id` encodes (partition, local row)
    *      — ids are assigned ABOVE the sort, so local order is the key
    *      order (the optimizer never reorders a nondeterministic
    *      project through a sort),
    *   3. per-partition row counts (a ≤-|partitions| aggregate) prefix-
    *      sum into global offsets on a bounded single-partition window,
    *   4. global rank = offset + local index + 1, and the tile is the
    *      standard SQL ntile formula over (rank, N): the first N mod n
    *      buckets carry ⌈N/n⌉ rows, the rest ⌊N/n⌋ — bit-identical to
    *      the window function (NtileSpec pins it on uneven and N<n
    *      corpora across partition layouts).
    *
    * The order must be TOTAL (include a tiebreaker key) — this library's
    * determinism convention for every ranking anyway.
    */
  /** Bucket-offset parallel rank (r13) — the deterministic,
    * checkpoint-free successor of [[withGlobalNtile]] / [[withGroupedRank]]
    * for NUMERIC order keys over slowly-changing inputs: exact global (or
    * per-group) rank under the (value, tie) total order, with the bucket
    * EDGES (interpolated percentiles per group, balance only) and the
    * exact per-(group, bucket) COUNTS computed once per dataset state
    * through fingerprint-keyed scalarCached pre-passes. The per-run plan
    * is then fully deterministic — assign buckets in-row through a
    * codegen'd binary-search when-tree (no RangePartitioner boundary
    * sampling, hence no pinning localCheckpoint — the r12 lesson), hash-
    * exchange on (group, bucket), row_number within each bucket, and
    * global rank = cached prefix offset + local row number. Edges split
    * on VALUE, so equal values never straddle a bucket and the rank is
    * exact; a degenerate all-equal group collapses to one bucket
    * (correct, serial for that group).
    *
    * Contract: `value` numeric and NON-NULL (null sorts are not defined
    * here); (value.cast(double), tie) total within each group; `group`
    * low-cardinality (its distinct values live in the cached maps).
    * Falls back conceptually to [[withGroupedRank]] for non-numeric
    * orders or once-only inputs.
    */
  def withBucketedGroupRank(
      df: DataFrame, group: Column, value: Column, tie: Column,
      rankOut: String, sizeOut: String,
      cacheName: String, inputs: Seq[String], nEdges: Int = 31): DataFrame = {
    val base = df.withColumn("_g", group.cast("string"))
      .withColumn("_v", value.cast("double"))
    def tree(es: Seq[(Double, Int)]): Column =
      if (es.isEmpty) lit(0)
      else {
        val (lo, hi) = es.splitAt(es.length / 2)
        val (edge, idx) = hi.head
        when(col("_v") < edge, if (lo.isEmpty) lit(idx) else tree(lo))
          .otherwise(if (hi.tail.isEmpty) lit(idx + 1) else tree(hi.tail))
      }
    def bucketExpr(e: Map[String, Seq[Double]]): Column = {
      val gs = e.keys.toSeq.sorted
      gs.tail.foldLeft(tree(e(gs.head).zipWithIndex)) { (acc, g) =>
        when(col("_g") === g, tree(e(g).zipWithIndex)).otherwise(acc)
      }
    }
    val (edges, offsets, totals, bucketCounts):
        (Map[String, Seq[Double]], Map[String, Long], Map[String, Long],
          Map[String, Long]) =
      graft.ArtifactStore.scalarCached(cacheName, 2, inputs) {
        val qs = (1 to nEdges).map(i => i.toDouble / (nEdges + 1))
        val e: Map[String, Seq[Double]] = base.groupBy(col("_g"))
          .agg(expr(s"percentile(_v, array(${qs.mkString(",")}))").as("es"))
          .collect().map(r => r.getString(0) ->
            Option(r.getSeq[Double](1)).map(_.toSeq).getOrElse(Nil)).toMap
        val cnts = base.withColumn("_b", bucketExpr(e))
          .groupBy(col("_g"), col("_b")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        val offs: Map[String, Long] = cnts.groupBy(_._1).toSeq.flatMap {
          case (g, rows) =>
            val sorted = rows.sortBy(_._2)
            sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map {
              case ((_, b, _), off) => s"$g|$b" -> off
            }.toSeq
        }.toMap
        val tots: Map[String, Long] = cnts.groupBy(_._1).toSeq.map {
          case (g, rows) => g -> rows.map(_._3).sum
        }.toMap
        val bCnts: Map[String, Long] =
          cnts.map { case (g, b, c) => s"$g|$b" -> c }.toMap
        (e, offs, tots, bCnts)
      }
    val wB = Window.partitionBy(col("_g"), col("_b")).orderBy(value, tie)
    // Caller-contract guard (VERDICT r13 #5): the cached edges/offsets are
    // valid ONLY if `df` is the deterministic function of `inputs` that was
    // fingerprinted — a caller that filters/samples df first would get
    // offsets from the unfiltered corpus and silently wrong ranks. Two
    // conditions together are the exactness condition (ADVICE r14: the
    // per-bucket check alone misses a filter that elides an ENTIRE bucket,
    // leaving no rows to fail the comparison while later buckets inherit
    // the vanished bucket's cached offset):
    //  1. per-(group, bucket): LIVE window count == cached count. The count
    //     window shares wB's partitioning (no extra exchange, no sort —
    //     unordered frame).
    //  2. per-group: LIVE total == cached total. Sum-of-live-buckets equals
    //     the cached grand total only when no cached bucket vanished, so
    //     (1) + (2) ⇒ the live (g,b) key set IS the cached key set. The
    //     live totals come from a map-side-combined groupBy (≤ |groups|
    //     rows shuffled) broadcast-joined back — no per-group window, which
    //     would re-serialize each group through one partition and recreate
    //     the straggler this operator exists to avoid; the cost is one
    //     extra (projected, filtered) scan of the input lineage.
    // Both are fused into the rank column itself so column pruning can
    // never elide the check. Residual: a caller that drops EVERY row of a
    // group leaves no rows to check for that group — but offsets are
    // per-group self-contained, so surviving groups still rank exactly.
    val bKey = concat_ws("|", col("_g"), col("_b"))
    val liveCnt = count(lit(1)).over(Window.partitionBy(col("_g"), col("_b")))
    val liveGroupTotals = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("_live_tot"))
    base
      .withColumn("_b", bucketExpr(edges))
      .join(broadcast(liveGroupTotals), Seq("_g"), "left")
      .repartition(col("_g"), col("_b"))
      .withColumn(rankOut,
        when(liveCnt === element_at(typedLit(bucketCounts), bKey) &&
            col("_live_tot") === element_at(typedLit(totals), col("_g")),
          element_at(typedLit(offsets), bKey) + row_number().over(wB))
          .otherwise(raise_error(concat(lit(
            s"bucketed-rank cache drift [$cacheName]: live rows in bucket "),
            bKey, lit(" or group total "), col("_live_tot").cast("string"),
            lit(" != cached counts — the input frame is not the " +
              "fingerprinted function of its inputs (filtered/sampled " +
              "caller?); rebuild the cache or rank the live frame directly")))))
      .withColumn(sizeOut, element_at(typedLit(totals), col("_g")))
      .drop("_g", "_v", "_b", "_live_tot")
  }

  def withGlobalNtile(
      df: DataFrame, n: Int, order: Seq[Column], out: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val localMask = (1L << 33) - 1 // monotonic id layout: pid«33 | idx
    // The (row, id) assignment is PINNED by an eager localCheckpoint
    // BEFORE it fans out to the offsets branch and the ranked branch.
    // Without it the two branches re-plan the range exchange
    // independently, and RangePartitioner's boundary SAMPLING seeds off
    // the (per-plan) RDD id — different boundaries per branch means
    // offsets computed against one layout applied to another: silently
    // wrong ranks (caught by the q150 sf1p hash the first time three of
    // these were chained). The checkpoint also stops the branches
    // re-executing the whole upstream pipeline. Partitioning metadata
    // loss under AQE is irrelevant here — the only join below is a
    // broadcast, and the ranks ride the materialized ids.
    val sorted = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint()
    val offs = sorted
      .groupBy(shiftright(col("_mid"), 33).as("_pid"))
      .agg(count(lit(1)).as("_c"))
    val wAll = Window.orderBy(col("_pid"))
    val offsCum = offs
      .withColumn("_off", coalesce(
        sum(col("_c")).over(wAll.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_n", sum(col("_c")).over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_pid"), col("_off"), col("_n"))
    sorted
      .join(broadcast(offsCum), shiftright(col("_mid"), 33) === col("_pid"))
      .withColumn("_r", col("_off") + col("_mid").bitwiseAND(localMask) + 1L)
      .withColumn(out, ntileFromRank("_r", "_n", n))
      .drop("_mid", "_pid", "_off", "_n", "_r")
  }

  /** The SQL-standard ntile assignment from (rank, total): the first
    * `total mod k` buckets carry ⌈total/k⌉ rows, the rest ⌊total/k⌋.
    * All-INTEGER arithmetic (`div`, never `/` — Column./ is IEEE);
    * total < k keeps every row in the first branch, so the div-by-zero
    * base never evaluates (if() is lazy per-branch). `rankCol`/`nCol`
    * are COLUMN NAMES (the expr needs them addressable).
    */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = expr(
    s"""cast(if($rankCol <= ($nCol % $k) * (($nCol div $k) + 1),
                ($rankCol - 1) div (($nCol div $k) + 1) + 1,
                ($nCol % $k) + ($rankCol - ($nCol % $k) * (($nCol div $k) + 1) - 1)
                  div ($nCol div $k) + 1) as int)""")

  /** GROUPED sibling of [[withGlobalNtile]]: exact per-group rank and
    * group size under a total order, for LOW-CARDINALITY group keys
    * where `Window.partitionBy(g)` is a scale wall (q115: 5 event types
    * → 5 tasks each sorting a fifth of the corpus, forever). Same
    * parallel decomposition — range-repartition on (group ++ order)
    * keeps each group's rows contiguous per partition, so a
    * (partition, group)-block aggregate (counts + first id) prefix-sums
    * into per-group offsets on a tiny window, and every rank function
    * that needs no peer handling (the total order makes rank =
    * row_number) derives in-row from (rank, groupSize):
    * percent_rank = (r−1)/(n−1), cume_dist = r/n, ntile via the
    * [[withGlobalNtile]] formula.
    *
    * Contract: `order` must be total within a group, and the block
    * frame is |partitions|·|groups| rows — use this for dimension-
    * bounded group keys; HIGH-cardinality keys should keep the plain
    * partitioned window (its per-task state is already bounded).
    */
  def withGroupedRank(
      df: DataFrame, group: Seq[String], order: Seq[Column],
      rankOut: String, sizeOut: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val localMask = (1L << 33) - 1
    val keys = group.map(col) ++ order
    // eager checkpoint pins (row, id) before the two-branch fan-out —
    // see withGlobalNtile for why this is a CORRECTNESS requirement,
    // not a cache: range-boundary sampling is per-plan
    val sorted = df
      .repartitionByRange(p, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint()
    val blocks = sorted
      .groupBy((shiftright(col("_mid"), 33).as("_pid") +: group.map(col)): _*)
      .agg(count(lit(1)).as("_c"), min(col("_mid")).as("_m0"))
    val wg = Window.partitionBy(group.map(col): _*).orderBy(col("_pid"))
    val blocksCum = blocks
      .withColumn("_goff", coalesce(
        sum(col("_c")).over(wg.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(sizeOut, sum(col("_c")).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select((col("_pid") +: col("_m0") +: col("_goff") +: col(sizeOut) +:
        group.map(col)): _*)
    val joinCond = ((shiftright(col("_mid"), 33) === blocksCum("_pid")) +:
      group.map(g => sorted(g) <=> blocksCum(g))).reduce(_ && _)
    val joined = sorted.join(broadcast(blocksCum), joinCond)
      .withColumn(rankOut,
        col("_goff") + (col("_mid").bitwiseAND(localMask)
          - col("_m0").bitwiseAND(localMask)) + 1L)
    // keep the left (data-side) group columns; drop the block side's
    val dupDropped = group.foldLeft(joined)((d, g) => d.drop(blocksCum(g)))
    dupDropped.drop("_mid", "_pid", "_m0", "_goff")
  }

  /** Exact decimal(18,scale) sum of a double column, surfaced as double —
    * computed in fixed point: each value quantizes to its exact unscaled
    * long (the same shortest-repr HALF_UP quantization as
    * `cast(DECIMAL(18,s))`, with the same NULL on non-finite / >18-digit
    * input), the longs sum exactly in a primitive buffer, and one division
    * rounds the same rational the decimal→double cast would. Bit-identical
    * to `sum(c.cast(DecimalType(18,s))).cast("double")` (the round-3
    * formulation) and ~7× cheaper per row — Spark's Decimal aggregation
    * buffer was the whole marginal-cost gap vs DuckDB's vectorized decimal
    * on the aggregate family (SCALE.md sf1 run).
    *
    * Overflow canary: a 64-bit sum of unscaled longs wraps silently where
    * the old decimal(28,s) buffer surfaced overflow as NULL — at scale 4
    * with ~1e9-unscaled rows that is only ~1e9 rows/group of headroom. The
    * aggregate therefore also tracks count and max|unscaled| (primitive
    * map-side buffers, negligible next to the sum) and RAISES when
    * count·max|v| could reach 2⁶³ — the conservative sufficient bound under
    * which wraparound is impossible. Silent-wrong becomes a visible error
    * with ~2% false-positive margin at the boundary.
    */
  def dsumScaled(c: Column, scale: Int): Column = {
    val d = graft.functions.DecScaledLong.decScaledLong(c, scale)
    val maxAbs = greatest(abs(coalesce(max(d), lit(0L))), abs(coalesce(min(d), lit(0L))))
    val safe = count(d).cast("double") * maxAbs.cast("double") < lit(9.0e18)
    when(safe, sum(d).cast("double") / math.pow(10.0, scale))
      .otherwise(raise_error(lit(
        s"dsum overflow canary: count*max|unscaled| may exceed 2^63 at scale $scale; " +
          "re-aggregate this group family with a decimal buffer")))
  }

  def dsum(c: Column): Column = dsumScaled(c, 2)

  /** Deterministic avg: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column =
    (dsum(c) / count(c)).as("avg")

  /** Pricing-summary aggregate (reference A2/A5-style multi-stat groupBy;
    * shape of TPC-H Q1).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .transform(presentSorted(_, $"l_returnflag", $"l_linestatus"))
  }

  /** P1 projection + P19 filter + top-k (pushdown-friendly: only 3 columns
    * reach the scan, filter reaches parquet).
    */
  def q2TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      .filter($"o_orderstatus" =!= "F")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** Scalar-transform suite: P2 rename, P3 literal, P4 concat, P6 label map,
    * P10 regexp extract, P12 cast with sentinel repair.
    */
  def q3Scalar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .withColumn("cust_url", concat(lit("https://example.org/c/"), $"c_custkey"))
      .withColumn("cust_num", regexp_extract($"c_name", "(\\d+)", 1))
      .withColumn("balance_band",
        when($"c_acctbal" < 0, lit("debt"))
          .when($"c_acctbal" < 5000, lit("low"))
          .otherwise(lit("high")))
      .withColumn("segment_code",
        when($"c_mktsegment" === "BUILDING", 1)
          .when($"c_mktsegment" === "AUTOMOBILE", 2)
          .otherwise(0))
      .select(
        $"c_custkey".as("custkey"), $"cust_url", $"cust_num",
        $"balance_band", $"segment_code", lit("etl_v1").as("pipeline_tag"))
      .transform(presentRanged(_, $"custkey"))
  }

  /** P13 clock→seconds with the -1 sentinel on malformed input. Clock
    * strings are minted deterministically from o_orderkey so both engines
    * see identical inputs (reference `transforms.py:236-243`).
    */
  def q4Clock(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withClock = Tables.orders(spark, dir)
      .withColumn("clock_str",
        when($"o_orderkey" % 7 === 0, lit("junk"))
          .otherwise(format_string("%d:%02d:%02d",
            $"o_orderkey" % 3, $"o_orderkey" % 60, ($"o_orderkey" * 7) % 60)))
    val parts = split($"clock_str", ":")
    withClock
      .withColumn("clock_seconds",
        coalesce(
          when(size(parts) === 3,
            parts.getItem(0).cast("int") * 3600 +
              parts.getItem(1).cast("int") * 60 +
              parts.getItem(2).cast("int")),
          lit(-1)))
      .select($"o_orderkey", $"clock_str", $"clock_seconds")
      .transform(presentRanged(_, $"o_orderkey"))
  }

  /** P14 drop-last-token canonicalization (FEN-cleaning shape) via
    * split/slice/join — the array formulation, not a regex.
    */
  def q5DropLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = split($"text", " ")
    Tables.documents(spark, dir)
      .withColumn("clean_text",
        array_join(slice(words, lit(1), greatest(size(words) - 1, lit(0))), " "))
      .select($"doc_id", $"clean_text")
      .transform(presentRanged(_, $"doc_id"))
  }

  /** Dimension-join rollup (J1/J5 analog; TPC-H Q5 shape). region/nation
    * are broadcast; the lineitem⋈orders fact-fact join rides the
    * co-partitioned okey-clustered views ([[ScaleOps.factByOrder]] /
    * [[ScaleOps.ordersByOkey]] — the bucketed-by-join-key layout
    * SCALE.md prescribes at 100 TB, realized through frameCached), so
    * the big join plans with NO exchange on either side; customer is
    * AQE-sized (broadcast at these SFs, shuffle when it outgrows the
    * threshold), and the region rollup is a |regions|-row partial.
    */
  def q6JoinDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = ScaleOps.factByOrder(spark, dir)
    // shuffle_hash, not broadcast: both views are co-partitioned on the
    // key, so the SHJ plans with ZERO exchange and a distributed
    // per-partition build — the un-hinted plan broadcast the 1.5M-row
    // orders view (under the 64 MB deployment threshold), paying a
    // driver-side HashedRelation build on every run for a join that is
    // already co-located (the q9 lesson at the fact-fact seam)
    val o = ScaleOps.ordersByOkey(spark, dir).hint("shuffle_hash")
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        dsumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .transform(presentSorted(_, $"r_name"))
  }

  /** J3 left join + P16 null fill: every customer with order stats. */
  def q7LeftJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orderStats = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_spent"))
    Tables.customer(spark, dir)
      .join(orderStats, $"c_custkey" === $"o_custkey", "left")
      .select(
        $"c_custkey",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"total_spent", lit(0.0)).as("total_spent"))
      .transform(presentRanged(_, $"c_custkey"))
  }

  /** J7 anti-join: customers with no orders. shuffle_hash for the same
    * reason as [[q9Semi]]: the existence side is a fact-table key column,
    * so sort-merge pays two full sorts (15 M order keys + 1.5 M customers
    * at sf10p, 6.4 s measured) where a shuffled hash anti probes
    * per-partition key sets (no sort at all — anti join only asks "key
    * present?", never an order). The hint displaces BOTH the size-based
    * broadcast and the SMJ fallback (JoinSelection gives a SHUFFLE_HASH
    * hint precedence over everything but a BROADCAST hint): the sf0.01
    * AQE-final plan is ShuffledHashJoin LeftAnti BuildRight (verified
    * r16 via ExplainQ) — the same shape at every SF, which is the
    * point: the small-SF timing measures the plan the 100 TB run gets.
    */
  def q8Anti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select($"o_custkey").hint("shuffle_hash"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .transform(presentRanged(_, $"c_custkey"))
  }

  /** Semi-join: parts that were actually ordered. shuffle_hash, not
    * broadcast: the probe side is a dimension but the EXISTENCE side is
    * the fact table's key column — at the deployment's 64 MB threshold
    * the planner broadcast all 6M lineitem keys (a driver-side
    * HashedRelation build, measured 2.7 s at sf1p and simply wrong at
    * 100 TB); the shuffled semi builds per-partition key sets instead.
    */
  def q9Semi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir).select($"l_partkey").hint("shuffle_hash"),
        $"p_partkey" === $"l_partkey", "left_semi")
      .select($"p_partkey", $"p_brand")
      .transform(presentRanged(_, $"p_partkey"))
  }

  /** E1/A1: posexplode with explicit ordinal (the half_move pattern —
    * ordering is explicit, never partition-order-dependent).
    */
  def q10ExplodeWords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos0", "word")))
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"word")
      .transform(presentRanged(_, $"doc_id", $"pos"))
  }

  /** E5: aligned multi-array explode via arrays_zip (positional lockstep). */
  def q11ZipExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = split($"text", " ")
    Tables.documents(spark, dir)
      .withColumn("zipped",
        arrays_zip(words, transform(words, w => length(w))))
      .select($"doc_id", posexplode($"zipped").as(Seq("pos0", "pair")))
      .select(
        $"doc_id", ($"pos0" + 1).cast("long").as("pos"),
        $"pair".getField("0").as("word"),
        $"pair".getField("1").cast("long").as("wlen"))
      .transform(presentRanged(_, $"doc_id", $"pos"))
  }

  /** A2: count-distinct aggregation per group. */
  def q12CountDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        dsum($"value").as("total_value"))
      .transform(presentSorted(_, $"event_type"))
  }

  /** A3/A4: pivot + row normalization with a fixed value list. */
  def q13Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statuses = Seq("F", "O", "P")
    val counts = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
    val filled = statuses.foldLeft(counts) { (df, s) =>
      df.withColumn(s, coalesce(col(s), lit(0L)))
    }
    val total = $"F" + $"O" + $"P"
    filled
      .select(
        $"o_orderpriority",
        $"F", $"O", $"P",
        ($"F".cast("double") / total).as("f_share"),
        ($"O".cast("double") / total).as("o_share"),
        ($"P".cast("double") / total).as("p_share"))
      .transform(presentSorted(_, $"o_orderpriority"))
  }

  /** A5/A6: multi-stat per weekday, reference 0=Sunday encoding. stddev is
    * computed from exact decimal moments with a fixed double-op order so it
    * is bit-identical to the oracle's same formula; single-row groups
    * produce null → filled with 0 (the reference's NaN→0 repair).
    */
  def q14WeekdayStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val moments = Tables.orders(spark, dir)
      .withColumn("weekday", (dayofweek($"o_orderdate") - 1).cast("long"))
      .groupBy($"weekday")
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(28, 2))).cast("double").as("sx"),
        sum(($"o_totalprice" * $"o_totalprice").cast(DecimalType(28, 4)))
          .cast("double").as("sxx"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
    moments
      .select(
        $"weekday",
        round($"sx" / $"n", 6).as("mean_price"),
        coalesce(
          when($"n" > 1,
            round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6)),
          lit(0.0)).as("std_price"),
        $"min_price", $"max_price")
      .transform(presentSorted(_, $"weekday"))
  }

  /** A7/A8: lead + lag-fill cascade within a (user) stream — the
    * opponent-clock pattern from reference `models.py:25-30`.
    */
  def q15LeadLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("next_value", lead($"value", 1).over(w))
      .withColumn("cascade_value",
        coalesce(lead($"value", 1).over(w), lag($"value", 2).over(w), $"value"))
      .select($"event_id", $"user_id", $"next_value", $"cascade_value")
      .transform(presentRanged(_, $"event_id"))
  }

  /** A9: first-row-per-group (initial clock pattern, `models.py:37-48`). */
  def q16FirstPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("first_event_id"), $"value".as("first_value"))
      .transform(presentRanged(_, $"user_id"))
  }

  /** A11-style deterministic dedup: first event per (user, type). Spark's
    * bare dropDuplicates keeps an arbitrary row, so the window formulation
    * is the one that survives distribution.
    */
  def q17Dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id")
      .transform(presentRanged(_, $"user_id", $"event_type"))
  }

  /** unionByName with a missing column (pandas concat parity,
    * `vendors/stockfish.py:94,109`).
    */
  def q18Union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.orders(spark, dir)
      .filter($"o_totalprice" >= 200000)
      .select($"o_orderkey", $"o_totalprice", lit("big").as("bucket"))
    val smallNoBucket = Tables.orders(spark, dir)
      .filter($"o_totalprice" < 1000)
      .select($"o_orderkey", $"o_totalprice")
    big.unionByName(smallNoBucket.withColumn("bucket", lit(null: String)), allowMissingColumns = true)
      .transform(presentRanged(_, $"o_orderkey"))
  }

  /** q103 — set operations (INTERSECT / EXCEPT), the two relational
    * algebra members q18's union left uncovered: the audience segments
    * "viewed AND purchased" (intersect) and "clicked but NEVER
    * purchased" (except), labeled and unioned. Both ops are distinct
    * aggregates under the hood — one user_id exchange each, map-side
    * combined; no joins.
    */
  def q103SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def users(t: String) = Tables.events(spark, dir)
      .filter($"event_type" === t).select($"user_id").distinct()
    val both = users("view").intersect(users("purchase"))
      .withColumn("segment", lit("view_and_purchase"))
    val lapsed = users("click").except(users("purchase"))
      .withColumn("segment", lit("click_no_purchase"))
    both.unionByName(lapsed).transform(presentRanged(_, $"segment", $"user_id"))
  }

  /** q104 — unpivot (wide → long): per-returnflag totals melted from
    * columns into (metric, value) rows with the `stack` table generator,
    * the inverse of q13's pivot. In-row fan-out — rows multiply by the
    * metric count with no shuffle beyond the feeding aggregate.
    */
  def q104Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"))
      .select($"l_returnflag",
        expr("stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (metric, value)"))
      .transform(presentSorted(_, $"l_returnflag", $"metric"))
  }

  /** MERGE INTO semantics as a composable operator: apply a typed
    * changeset (op ∈ I/U/D keyed like the snapshot) to a snapshot in
    * one full-outer join — matched 'U' rewrites, matched 'D' drops,
    * unmatched 'I' inserts, untouched rows pass through. This is the
    * CDC-apply / SCD-1 upsert a warehouse runs nightly; Spark has no
    * MERGE over plain parquet (that's a Delta/Iceberg verb), so the
    * join spelling IS the operator — and it scales as one co-keyed
    * shuffle join (changeset side is usually small → AQE broadcasts
    * it; the snapshot is never read twice).
    */
  def applyChangeSet(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    import snapshot.sparkSession.implicits._
    val dataCols = snapshot.columns.filterNot(_ == key)
    val joined = snapshot.as("s").join(changes.as("c"),
      col(s"s.$key") === col(s"c.$key"), "full_outer")
    joined
      .filter(!(col(s"c.op") <=> lit("D"))) // matched deletes drop
      .filter(col(s"s.$key").isNotNull || col(s"c.op") === "I") // stray U/D ignored
      .select(
        coalesce(col(s"s.$key"), col(s"c.$key")).as(key) +:
          dataCols.map { dc =>
            when(col(s"c.op").isNotNull, col(s"c.$dc"))
              .otherwise(col(s"s.$dc")).as(dc)
          }: _*)
  }

  /** q108 — [[applyChangeSet]] driven by a deterministic changeset
    * derived from orders: every ordering customer gets 'U' (account
    * balance += their spend) except custkey % 10 == 0 which get 'D';
    * custkey % 13 == 0 additionally spawn an 'I' under key + 1,000,000.
    * The oracle replays the same FULL OUTER JOIN + CASE semantics —
    * the merged snapshot must match row for row.
    */
  def q108MergeApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val spend = Tables.orders(spark, dir)
      .groupBy($"o_custkey").agg(dsum($"o_totalprice").as("spend"))
    val base = spend.join(cust, $"o_custkey" === $"c_custkey")
    // r13: the U/D row and the optional I row emit from ONE in-row
    // explode over a single execution of the base subtree — the former
    // unionByName of two base-derived branches re-ran the orders
    // aggregation and the customer join per branch (the dominant cost;
    // exchange reuse did not hold across the branches' differing
    // projections). Identical changeset rows, one pass.
    val changes = base
      .select(explode(when($"o_custkey" % 13 === 0, array(
        struct(
          $"o_custkey".as("c_custkey"),
          when($"o_custkey" % 10 === 0, "D").otherwise("U").as("op"),
          $"c_name".as("c_name"), $"c_nationkey".as("c_nationkey"),
          round($"c_acctbal" + $"spend", 2).as("c_acctbal"),
          $"c_mktsegment".as("c_mktsegment")),
        struct(
          ($"o_custkey" + 1000000L).as("c_custkey"), lit("I").as("op"),
          concat(lit("NEW#"), $"o_custkey").as("c_name"),
          ($"o_custkey" % 25).cast("int").as("c_nationkey"),
          round($"spend", 2).as("c_acctbal"),
          lit("NEW").as("c_mktsegment"))
      )).otherwise(array(
        struct(
          $"o_custkey".as("c_custkey"),
          when($"o_custkey" % 10 === 0, "D").otherwise("U").as("op"),
          $"c_name".as("c_name"), $"c_nationkey".as("c_nationkey"),
          round($"c_acctbal" + $"spend", 2).as("c_acctbal"),
          $"c_mktsegment".as("c_mktsegment"))
      ))).as("r"))
      .select($"r.c_custkey", $"r.op", $"r.c_name", $"r.c_nationkey",
        $"r.c_acctbal", $"r.c_mktsegment")
    applyChangeSet(cust, changes, "c_custkey")
      .transform(presentRanged(_, $"c_custkey"))
  }

  /** Hourly tumbling-window aggregate (batch twin of the Structured
    * Streaming query in graft.streaming). `events.ts` arrives as epoch-nanos
    * LongType (see Sessions); the bucket is surfaced as epoch seconds.
    */
  def q19TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("bucket_start", expr("(ts div 3600000000000) * 3600"))
      .groupBy($"bucket_start", $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .transform(presentSorted(_, $"bucket_start", $"event_type"))
  }

  /** q20 — fixed-arity wide expansion (the E4 "materials → 10 fixed
    * columns" shape, reference `src/pipeline_import/postgres_templates.py`
    * game_materials + `src/feature_engineering.py:145-182` material
    * counts, expressed over testdata): each
    * order's lineitems spread into seven fixed per-line-number columns
    * keyed by l_linenumber — the same array-to-fixed-columns derivation
    * the chess pipeline does per FEN (qc45, where the in-row ARRAY
    * spelling lives), with a DuckDB-expressible oracle.
    *
    * Plan shape: seven conditional aggregates beside the line count in
    * ONE hash aggregate — primitive buffers, fully codegen'd — riding
    * [[ScaleOps.factByOrder]]'s okey clustering, so the aggregate fuses
    * in-stage with zero exchange. The former spelling collected each
    * order's lines into a sorted in-row array first (`collect_list` →
    * ObjectHashAggregate: object buffers, no codegen, array churn per
    * row) and shuffled the arrays corpus-grain — 2× the oracle at sf1p
    * for what IS the oracle's own max(CASE) plan; line numbers are
    * neither dense nor unique per order, so MAX per line number (NULL
    * when absent) is the exact shared semantics.
    */
  def q20WideMaterials(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ScaleOps.factByOrder(spark, dir)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        (1 to 7).map(i =>
          max(when($"l_linenumber" === i, $"l_quantity")).as(s"qty_$i")): _*)
      .transform(presentRanged(_, $"l_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_wide_materials" -> (q20WideMaterials _),
    "q103_setops" -> (q103SetOps _),
    "q104_unpivot" -> (q104Unpivot _),
    "q108_merge_apply" -> (q108MergeApply _),
    "q1_agg" -> (q1Agg _),
    "q2_topk" -> (q2TopK _),
    "q3_scalar" -> (q3Scalar _),
    "q4_clock" -> (q4Clock _),
    "q5_droplast" -> (q5DropLast _),
    "q6_join_dims" -> (q6JoinDims _),
    "q7_left_join" -> (q7LeftJoin _),
    "q8_anti" -> (q8Anti _),
    "q9_semi" -> (q9Semi _),
    "q10_explode_words" -> (q10ExplodeWords _),
    "q11_zip_explode" -> (q11ZipExplode _),
    "q12_count_distinct" -> (q12CountDistinct _),
    "q13_pivot" -> (q13Pivot _),
    "q14_weekday_stats" -> (q14WeekdayStats _),
    "q15_lead_lag" -> (q15LeadLag _),
    "q16_first_per_group" -> (q16FirstPerGroup _),
    "q17_dedup" -> (q17Dedup _),
    "q18_union" -> (q18Union _),
    "q19_time_window" -> (q19TimeWindow _)
  )

  val oracles: Map[String, String] = Map(
    "q20_wide_materials" ->
      """SELECT l_orderkey, count(*) AS n_lines,
        |  max(CASE WHEN l_linenumber = 1 THEN l_quantity END) AS qty_1,
        |  max(CASE WHEN l_linenumber = 2 THEN l_quantity END) AS qty_2,
        |  max(CASE WHEN l_linenumber = 3 THEN l_quantity END) AS qty_3,
        |  max(CASE WHEN l_linenumber = 4 THEN l_quantity END) AS qty_4,
        |  max(CASE WHEN l_linenumber = 5 THEN l_quantity END) AS qty_5,
        |  max(CASE WHEN l_linenumber = 6 THEN l_quantity END) AS qty_6,
        |  max(CASE WHEN l_linenumber = 7 THEN l_quantity END) AS qty_7
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,
    "q103_setops" ->
      """SELECT user_id, 'view_and_purchase' AS segment FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'click_no_purchase' AS segment FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY segment, user_id""".stripMargin,
    "q108_merge_apply" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY 1),
        |base AS (SELECT * FROM spend JOIN customer ON o_custkey = c_custkey),
        |ch AS (
        |  SELECT o_custkey AS k,
        |    CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    c_name, c_nationkey,
        |    round(c_acctbal + spend, 2) AS c_acctbal, c_mktsegment
        |  FROM base
        |  UNION ALL
        |  SELECT o_custkey + 1000000 AS k, 'I' AS op,
        |    'NEW#' || CAST(o_custkey AS VARCHAR) AS c_name,
        |    CAST(o_custkey % 25 AS INT) AS c_nationkey,
        |    round(spend, 2) AS c_acctbal, 'NEW' AS c_mktsegment
        |  FROM base WHERE o_custkey % 13 = 0),
        |m AS (
        |  SELECT coalesce(s.c_custkey, c.k) AS c_custkey,
        |    CASE WHEN c.op IS NOT NULL THEN c.c_name ELSE s.c_name END AS c_name,
        |    CASE WHEN c.op IS NOT NULL THEN c.c_nationkey ELSE s.c_nationkey END AS c_nationkey,
        |    CASE WHEN c.op IS NOT NULL THEN c.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
        |    CASE WHEN c.op IS NOT NULL THEN c.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment,
        |    c.op AS op, s.c_custkey AS sk
        |  FROM customer s FULL OUTER JOIN ch c ON s.c_custkey = c.k)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM m
        |WHERE (op IS DISTINCT FROM 'D') AND (sk IS NOT NULL OR op = 'I')
        |ORDER BY c_custkey""".stripMargin,
    "q104_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_scalar" ->
      """SELECT c_custkey AS custkey,
        |  'https://example.org/c/' || c_custkey AS cust_url,
        |  COALESCE(regexp_extract(c_name, '(\d+)', 1), '') AS cust_num,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1 WHEN c_mktsegment = 'AUTOMOBILE' THEN 2 ELSE 0 END AS segment_code,
        |  'etl_v1' AS pipeline_tag
        |FROM customer ORDER BY custkey""".stripMargin,
    "q4_clock" ->
      """WITH c AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'junk'
        |         ELSE printf('%d:%02d:%02d', o_orderkey % 3, o_orderkey % 60, (o_orderkey * 7) % 60)
        |    END AS clock_str
        |  FROM orders)
        |SELECT o_orderkey, clock_str,
        |  COALESCE(CASE WHEN len(string_split(clock_str, ':')) = 3 THEN
        |    TRY_CAST(string_split(clock_str, ':')[1] AS INT) * 3600 +
        |    TRY_CAST(string_split(clock_str, ':')[2] AS INT) * 60 +
        |    TRY_CAST(string_split(clock_str, ':')[3] AS INT) END, -1) AS clock_seconds
        |FROM c ORDER BY o_orderkey""".stripMargin,
    "q5_droplast" ->
      """SELECT doc_id,
        |  array_to_string(string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 1, 0)], ' ') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q6_join_dims" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q7_left_join" ->
      """SELECT c_custkey,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(total_spent, 0.0) AS total_spent
        |FROM customer
        |LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |  FROM orders GROUP BY o_custkey) s ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q8_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q9_semi" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q10_explode_words" ->
      """SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |  unnest(string_split(text, ' ')) AS word
        |FROM documents ORDER BY doc_id, pos""".stripMargin,
    "q11_zip_explode" ->
      """SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |  unnest(string_split(text, ' ')) AS word,
        |  unnest(list_transform(string_split(text, ' '), w -> CAST(len(w) AS BIGINT))) AS wlen
        |FROM documents ORDER BY doc_id, pos""".stripMargin,
    "q12_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q13_pivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, F, O, P,
        |  CAST(F AS DOUBLE) / (F + O + P) AS f_share,
        |  CAST(O AS DOUBLE) / (F + O + P) AS o_share,
        |  CAST(P AS DOUBLE) / (F + O + P) AS p_share
        |FROM p ORDER BY o_orderpriority""".stripMargin,
    "q14_weekday_stats" ->
      """WITH m AS (
        |  SELECT dayofweek(o_orderdate) AS weekday, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |    MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |  FROM orders GROUP BY weekday)
        |SELECT weekday, round(sx / n, 6) AS mean_price,
        |  COALESCE(CASE WHEN n > 1 THEN round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) END, 0.0) AS std_price,
        |  min_price, max_price
        |FROM m ORDER BY weekday""".stripMargin,
    "q15_lead_lag" ->
      """SELECT event_id, user_id,
        |  LEAD(value, 1) OVER w AS next_value,
        |  COALESCE(LEAD(value, 1) OVER w, LAG(value, 2) OVER w, value) AS cascade_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q16_first_per_group" ->
      """SELECT user_id, event_id AS first_event_id, value AS first_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q17_dedup" ->
      """SELECT user_id, event_type, event_id
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q18_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, 'big' AS bucket FROM orders WHERE o_totalprice >= 200000
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_totalprice, NULL AS bucket FROM orders WHERE o_totalprice < 1000)
        |ORDER BY o_orderkey""".stripMargin,
    "q19_time_window" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin
  )
}
