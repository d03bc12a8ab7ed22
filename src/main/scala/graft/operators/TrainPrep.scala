package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus preparation operators beyond the dedup/similarity
  * families: deterministic sampling, sequence packing, PII scrubbing,
  * benchmark decontamination, and tf-idf term extraction — the remaining
  * steps a large-scale LLM data pipeline runs between raw documents and
  * tokenized shards.
  *
  * Determinism: sampling uses the portable md5-derived hash (no RNG state,
  * so the sample is reproducible, partition-independent, and replayable by
  * the DuckDB oracle); packing is the concat-then-split convention (bin =
  * starting offset / budget in a per-(lang, source) id-ordered stream), not
  * order-dependent greedy bin packing.
  *
  * Scale notes (100 TB): the sample filter is per-row (no shuffle, pushes
  * nothing to the driver); packing windows partition by (lang, source) —
  * a deployment with giant single strata would sub-bucket the stream key
  * the same way the reference's id-ordering convention allows; the
  * contamination join shuffles on shingle hash (high cardinality) with the
  * benchmark side small enough to broadcast; tf-idf's df table is
  * |vocabulary| rows — broadcast when small, shuffle-joined otherwise.
  */
object TrainPrep {

  /** q49 — deterministic stratified Bernoulli sample: keep a document when
    * its salted portable hash lands under the per-language per-mille rate
    * (en is upsampled 2×). Reproducible across runs/partitions — the
    * property a training pipeline needs so re-runs and incremental
    * backfills select the same rows.
    */
  def q49HashSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = Dedup.portableHash(concat(lit("smpl:"), $"doc_id".cast("string"))) % 100
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket)
      .filter($"bucket" < when($"lang" === "en", 20).otherwise(10))
      .select($"doc_id", $"lang", $"source", $"bucket")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Token budget per packed sequence (q50). */
  val packBudget = 512

  /** q50 — sequence packing, concat-then-split convention: documents are
    * streamed in doc_id order within (lang, source), conceptually
    * concatenated, and split every [[packBudget]] tokens; a document's bin
    * is the bin of its first token. One window cumsum — no driver loop, no
    * order-dependent greedy state.
    */
  def q50SeqPack(spark: SparkSession, dir: String): DataFrame =
    pack(Tables.documents(spark, dir))
      .transform(Relational.presentRanged(_, col("doc_id")))

  /** The packing stage over any (doc_id, lang, source, text, ...) frame —
    * shared by q50 and the q54 pipeline composition.
    */
  private def pack(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    packCounted(docs.select($"doc_id", $"lang", $"source",
      size(split($"text", " ")).cast("long").as("n_tokens")))
  }

  /** [[pack]] over a frame that already carries `n_tokens` — the caller
    * projects the count EARLY (before its joins) so no exchange upstream
    * of the window has to ship `text` (guide §2.3: project before the
    * exchange; the q54 anti joins shuffled full documents for it).
    */
  private def packCounted(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
    docs
      .select($"doc_id", $"lang", $"source", $"n_tokens")
      .withColumn("start_off", sum($"n_tokens").over(w) - $"n_tokens")
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        floor($"start_off" / lit(packBudget.toDouble)).as("bin_id"),
        ($"start_off" % packBudget).as("bin_offset"))
  }

  // conservative regex subset shared verbatim by java.util.regex and
  // DuckDB's RE2: no lookaround, no backrefs
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val phoneRe = "\\b555-[0-9]+\\b"

  /** q51 — PII scrub: redact emails and 555-prefixed phone numbers, count
    * the redactions. The synthetic corpus carries no PII, so the scrub
    * target is planted in-plan (a contact line derived from doc_id) —
    * making the regex semantics, not the data, the thing under test; a
    * production run drops the planting projection and scrubs `text`
    * directly with the identical plan.
    */
  def q51PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = concat($"text", lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com or call 555-"), $"doc_id".cast("string"), lit(" now"))
    // fused single-expression scrub (graft.functions.PiiScrub): one string
    // decode + three matcher traversals instead of four expressions × four
    // decodes × four traversals — semantics bit-identical to the oracle's
    // 4-call chain (counts on raw, replace sequentially; see PiiScrubOps)
    Tables.documents(spark, dir)
      .select($"doc_id", planted.as("raw"))
      .select($"doc_id", graft.functions.PiiScrub.piiScrub($"raw").as("pii"))
      .select($"doc_id", $"pii.n_emails".as("n_emails"),
        $"pii.n_phones".as("n_phones"), $"pii.clean_text".as("clean_text"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Benchmark membership for q52: every 97th document stands in for an
    * eval-set shard.
    */
  private def isBenchmark = col("doc_id") % 97 === 0

  /** q52 — benchmark decontamination: for each corpus document, the count
    * of distinct word 3-gram shingles it shares with ANY benchmark
    * document, and the contaminated-fraction of its own shingles. The join
    * shuffles on the shingle hash; the benchmark shingle set is tiny
    * relative to the corpus (an eval suite, not a second corpus), so
    * Catalyst broadcasts it — no full-corpus self-join ever happens.
    */
  def q52Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // benchmark membership filters BEFORE shingling: the two sides share no
    // subtree, so neither pipeline is instantiated twice (the q26/q28
    // self-join lesson), and the bench side only shingles 1/97 of the docs.
    // r16: per-doc DISTINCT shingle hashes come from the in-row native
    // shingle_hashes expression (the q26/q85 shape) — the former spelling
    // exploded words through shingleRows' two lead() windows, distinct'ed
    // the (doc_id, hash) rows, and ran a count window for n_shingles:
    // three sorts of the exploded corpus for values one projection
    // computes (identical 60-bit md5 per trigram, identical distinct set).
    def hashed(side: DataFrame) = side.select($"doc_id",
      graft.functions.ShingleFunctions.shingleHashes(split($"text", " ")).as("shs"))
    // partition by doc_id (not round-robin): hash(doc_id) satisfies the
    // final groupBy — one exchange feeds the whole corpus pipeline, and
    // the bench side is a broadcast so the semi join adds none
    // explode_outer + null filter, NOT explode (r17): the non-outer
    // explode triggered InferFiltersFromGenerate, whose pushed-down
    // `size(shingle_hashes(..)) > 0` predicate re-ran the whole shingle
    // pass per row in the SCAN stage (single-task before the spreadBy
    // exchange) — the projection then computed it again. See
    // Dedup.shingleJaccardPairs for the full mechanism.
    val docs = Tables.spreadBy(Tables.documents(spark, dir), "doc_id") // gated: skipped on wide inputs
    val bench = broadcast(
      hashed(docs.filter(isBenchmark)).select(explode_outer($"shs").as("sh_h"))
        .filter($"sh_h".isNotNull).distinct())
    val corpus = hashed(docs.filter(!isBenchmark))
      .select($"doc_id", size($"shs").cast("long").as("n_shingles"),
        explode_outer($"shs").as("sh_h"))
      .filter($"sh_h".isNotNull)
    corpus
      .join(bench, Seq("sh_h"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"), first($"n_shingles").as("n_shingles"))
      .select($"doc_id", $"n_shared",
        round($"n_shared".cast("double") / $"n_shingles", 6).as("contamination"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Bloom filter geometry for the broadcast decontamination gate: 2^21
    * bits (a 256 KB broadcast) x 5 probes. At one million benchmark
    * shingles the load is n·k/m ≈ 2.4 bits/slot → per-gram false-positive
    * rate (1-e^(-nk/m))^k ≈ 0.5%; real eval suites are far smaller than
    * that, so the geometry has slack everywhere it matters.
    */
  private[graft] val bloomBits = 1 << 21
  private[graft] val bloomHashes = 5

  /** Folds a column of shingle hashes (one per row) into the single-row
    * Bloom bitset frame `{bits: array<long>}`: positions from the native
    * [[graft.functions.BloomPositions]] (the probe side's
    * [[graft.functions.BloomCount]] shares the identical
    * `BloomOps.positions` math — build/probe agreement by construction),
    * folded by the native [[graft.functions.BitsetOrAgg]] — map-side
    * partial bitsets, word-wise OR merge, O(partitions · 32 K longs) on
    * the wire however many grams go in. No distinct pre-pass: OR is
    * idempotent.
    */
  def bloomBuild(hashes: DataFrame, numBits: Int = bloomBits,
      numHashes: Int = bloomHashes): DataFrame = {
    import hashes.sparkSession.implicits._
    hashes
      .select(explode(graft.functions.BloomFunctions
        .bloomPositions($"sh_h", numBits, numHashes)).as("pos"))
      .agg(graft.functions.Bitset.bitsetOr($"pos", numBits).as("bits"))
  }

  /** Per-row count of shingle hashes the broadcast bitset contains — ONE
    * codegen'd call per document, a tight loop per gram
    * ([[graft.functions.BloomCount]]). An earlier spelling probed via a
    * higher-order `filter` lambda of built-ins; HOF lambdas evaluate
    * interpreted and it re-walked both hash expression trees per probe —
    * 2.5× slower end to end (SCALE.md r8 A/B).
    */
  private def bloomHits(bits: Column, hashes: Column,
      numBits: Int = bloomBits, numHashes: Int = bloomHashes): Column =
    graft.functions.BloomFunctions.bloomCount(bits, hashes, numBits, numHashes)

  /** The production Bloom decontamination gate: per document, the count of
    * its shingles that hit the broadcast bitset, and the keep verdict
    * (bloom-contaminated fraction < tau). THE scan-side decontamination
    * shape for 100 TB: the corpus is read once, shingled in-row
    * ([[graft.functions.ShingleHashes]]), probed in-row against the
    * 256 KB bitset riding in via a single-row broadcast — zero corpus
    * shuffles, zero corpus joins; compare q52, whose exact semi-join
    * shuffles every (doc, gram) pair on the gram hash. The price is the
    * documented false-positive rate: a gate that errs only toward
    * DROPPING a sliver extra, never toward letting contamination through
    * (no false negatives — a Bloom filter cannot miss a present element).
    */
  def bloomGate(docs: DataFrame, bits: DataFrame, tau: Double,
      numBits: Int = bloomBits, numHashes: Int = bloomHashes): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .crossJoin(broadcast(bits))
      .select($"doc_id",
        graft.functions.ShingleFunctions.shingleHashes(split($"text", " ")).as("hs"),
        $"bits")
      .select($"doc_id",
        size($"hs").cast("long").as("n_shingles"),
        bloomHits($"bits", $"hs", numBits, numHashes).as("n_bloom"))
      .filter($"n_shingles" > 0)
      .withColumn("keep", $"n_bloom".cast("double") / $"n_shingles" < tau)
  }

  /** q85 — the Bloom gate's CONTRACT oracle (the q75/q79 pattern): runs
    * the bloom probe AND the exact q52-style membership in one plan and
    * emits, per corpus document, the oracle-computable exact facts
    * (n_shingles, n_shared) plus two booleans the DuckDB oracle pins as
    * literal TRUE — `superset_ok` (every exactly-shared gram was flagged:
    * no false negatives, so the bloom verdict can only be a superset of
    * the exact one) and `fp_rate_ok` (corpus-wide false-positive gram
    * rate ≤ 5%, the geometry's promise). A hash mismatch on either
    * boolean means the filter lied — the contract, not the bit pattern,
    * is what a user needs to trust the scan-side gate.
    *
    * Plan shape: ONE corpus pass computes both verdicts (the bloom count
    * in-row before the explode; the exact count via the broadcast bench
    * left join); the global fp-rate aggregate branches off the per-doc
    * frame AFTER its doc_id exchange, so ReuseExchange evaluates the
    * corpus subtree once.
    */
  def q85BloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spreadBy(Tables.documents(spark, dir), "doc_id") // gated: skipped on wide inputs
    // explode_outer + null filters (r17): the non-outer explodes let
    // InferFiltersFromGenerate push `size(shingle_hashes(..)) > 0` into
    // the scan stage, re-running the shingle pass per row before the
    // projection ran it again (see Dedup.shingleJaccardPairs). The
    // shingles-exist gate is the CHEAP token-count predicate instead —
    // shingleHashes is empty exactly when the doc has <3 tokens
    // (Shingles.scala) — applied before the expensive projection.
    val benchHashes = docs.filter(isBenchmark)
      .select(explode_outer(
        graft.functions.ShingleFunctions.shingleHashes(split($"text", " "))).as("sh_h"))
      .filter($"sh_h".isNotNull)
    val bits = bloomBuild(benchHashes)
    val probed = docs.filter(!isBenchmark)
      .filter(size(split($"text", " ")) >= 3)
      .crossJoin(broadcast(bits))
      .select($"doc_id",
        graft.functions.ShingleFunctions.shingleHashes(split($"text", " ")).as("hs"),
        $"bits")
      .select($"doc_id", $"hs",
        bloomHits($"bits", $"hs").as("n_bloom"))
    val bench = broadcast(benchHashes.distinct().withColumn("hit", lit(1)))
    val perDoc = probed
      .select($"doc_id", $"n_bloom", explode_outer($"hs").as("sh_h"))
      .filter($"sh_h".isNotNull)
      .join(bench, Seq("sh_h"), "left")
      .groupBy($"doc_id")
      .agg(
        first($"n_bloom").as("n_bloom"),
        count(lit(1)).as("n_shingles"),
        count($"hit").as("n_shared"))
    val global = perDoc.agg(
      (sum($"n_bloom" - $"n_shared").cast("double") /
        greatest(sum($"n_shingles" - $"n_shared"), lit(1L)).cast("double")
        <= 0.05).as("fp_rate_ok"))
    perDoc.crossJoin(broadcast(global))
      .select($"doc_id", $"n_shingles", $"n_shared",
        ($"n_bloom" >= $"n_shared").as("superset_ok"), $"fp_rate_ok")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Sample size per language stratum for q87. */
  val wrsN = 50

  /** q87 — weighted sampling WITHOUT replacement, one pass, exact-n per
    * stratum: the Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters
    * 97(5), 2006). Each document draws a deterministic uniform u from the
    * portable md5 hash (reproducible, partition-independent, oracle-
    * replayable — the q49 discipline) and competes on the key
    * ln(u)/w — taking the n LARGEST keys per stratum is exactly a
    * weighted sample without replacement with inclusion odds ∝ w (here
    * w = quality score + 0.1: quality-weighted corpus subsampling, the
    * between-Bernoulli-and-exact-quota member of the q49/q82 sampling
    * family). The key is fixed-pointed at micro precision before ranking
    * (the q53/q60 cross-engine discipline) with doc_id as the total
    * tie-break.
    *
    * Scale shape: selection is [[graft.functions.TopKAgg]] — a k-bounded
    * heap per stratum per task, so the exchange carries ≤ n·tasks rows
    * per language and there is NO window over the corpus (the oracle's
    * row_number spelling is the audit, not the plan). The winner set
    * (≤ n·|langs| rows) broadcasts back to pick up document attributes.
    */
  def q87WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        round(TextOps.qualityScoreExpr($"text", $"n_chars") + lit(0.1), 6).as("w6"))
      .withColumn("u",
        ((Dedup.portableHash(concat(lit("wrs:"), $"doc_id".cast("string")))
          % 1000000L).cast("double") + 0.5) / 1e6)
      .withColumn("key_micro", round(log($"u") / $"w6" * 1e6).cast("long"))
    val winners = scored
      .groupBy($"lang")
      .agg(graft.functions.TopK.topK($"key_micro".cast("double"), $"doc_id", wrsN).as("tk"))
      .select($"lang", explode($"tk.event_id").as("doc_id"))
    scored.join(broadcast(winners.select($"doc_id")), Seq("doc_id"), "left_semi")
      .select($"doc_id", $"lang", $"w6", $"key_micro")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** BPE merge learning at corpus scale (Sennrich et al. 2016): learn the
    * top-N byte-pair merges from the corpus' WORD-FREQUENCY table — the
    * tokenizer-training primitive. The key scale fact: after one
    * corpus-sized `groupBy(word)` (map-side combined), training runs
    * entirely on the distinct-word table with counts — millions of rows
    * at 100 TB, not trillions — and that table STAYS a DataFrame, so a
    * web-scale vocabulary never has to fit on the driver.
    *
    * Each batch round-trip: (1) adjacent symbol pairs explode IN-ROW
    * weighted by word count and aggregate to pair totals; (2) the top
    * [[bpeProbeN]] pairs by (count desc, then lexicographic — a TOTAL
    * order, so the result is partition-invariant and engine-reproducible)
    * come back as a BOUNDED driver row set — the same bounded driver-side
    * control flow as the CC iteration, never the data; (3) the driver
    * accepts the longest PREFIX of that ranking that is provably equal to
    * running the merges one at a time (see [[bpeAcceptPrefix]]), and (4)
    * every word's symbol array folds through the accepted merges' greedy
    * left-to-right non-overlapping passes — chained `aggregate`
    * higher-order folds in ONE projection, in-row, no shuffle. The word
    * table is localCheckpoint'ed once per BATCH (tiny) so lineage stays
    * flat. nMerges/|batch| Spark round-trips instead of one per merge;
    * pair counting re-aggregates only because symbols changed — each
    * batch is one exchange over the distinct-word table.
    *
    * Returns the learned merge table (rank, left, right, pair_count) —
    * deterministic for a given corpus; BpeSpec replays it against an
    * in-memory SEQUENTIAL reference implementation (the batching is an
    * execution detail, never a semantics change) and pins partition
    * invariance.
    */
  def bpeLearn(docs: DataFrame, nMerges: Int): DataFrame = {
    import docs.sparkSession.implicits._
    var words = docs
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .select(expr("filter(split(word, ''), x -> x <> '')").as("syms"), $"cnt")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    while (merges.length < nMerges && !done) {
      val pairs = words
        .select($"cnt", explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
            "(x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))")).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"cnt").as("c"))
      val top = pairs.orderBy($"c".desc, $"l".asc, $"r".asc)
        .limit(bpeProbeN).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) done = true
      else {
        val accepted = bpeAcceptPrefix(top, nMerges - merges.length,
          merges.map { case (_, l, r, _) => l + r }.toSet)
        accepted.foreach { case (l, r, c) =>
          merges += ((merges.length + 1, l, r, c))
        }
        // greedy left-to-right non-overlapping merge, chained in-row folds
        // (batch order = sequential-reference order)
        val folded = accepted.foldLeft($"syms": Column) { case (col, (l, r, _)) =>
          aggregate(col, array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x))))
        }
        words = words.select(folded.as("syms"), $"cnt").localCheckpoint(true)
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Driver rows collected per bpeLearn batch (bounded — never the data). */
  val bpeProbeN = 64

  /** The longest prefix of the ranked pair list whose batched application
    * is PROVABLY identical to merging one pair per round. Candidate j is
    * accepted only if, against every already-accepted merge i:
    *
    *  - **disjoint**: {l_j, r_j} shares no symbol with {l_i, r_i}, with
    *    the merged string s_i = l_i+r_i (a created symbol may not
    *    string-collide with a candidate's side), and s_j != s_i (two
    *    accepted merges may not mint the same symbol) — so p_j's count is
    *    untouched by applying p_i: no occurrence consumed, none created;
    *  - **created-pair dominance**: every pair CREATED by merge i carries
    *    s_i on one side, and each of its occurrences requires an ORIGINAL
    *    adjacency (x, l_i) or (r_i, y) at the same position — so its
    *    count is <= min(c_i, max over those adjacencies' original
    *    counts). Collected adjacencies contribute their exact counts;
    *    anything outside the top-[[bpeProbeN]] rows is bounded by the
    *    smallest collected count (or 0 when the table fit entirely).
    *    Candidate j must STRICTLY beat that cap, so no created pair can
    *    outrank it at its sequential round (strictness also settles
    *    lexicographic ties in the candidate's favor — a created pair with
    *    a smaller count can never win).
    *
    * Original pairs ranked above p_j are all accepted (prefix property),
    * and applying merges only ever DECREASES other original pairs'
    * counts, so p_j stays the sequential argmax of its round. The first
    * rejection ends the batch — a later candidate's sequential count
    * could differ once an overlapping higher-ranked merge applies.
    */
  private[operators] def bpeAcceptPrefix(top: Seq[(String, String, Long)], maxN: Int,
      minted: Set[String] = Set.empty): Seq[(String, String, Long)] = {
    val unknownCap = if (top.length < bpeProbeN) 0L else top.last._3
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    accepted += top.head
    var idx = 1
    // cross-batch minting collision: if an accepted merge's symbol
    // string-equals a symbol minted in an EARLIER batch via a different
    // split ('ab'+'c' now, 'a'+'bc' before — both "abc"), its created
    // occurrences MERGE INTO an existing original pair's count, so the
    // created-pair dominance bound (which caps created occurrences alone)
    // no longer bounds that pair's sequential total. The head is still the
    // true argmax of its round (applying it alone is always correct), but
    // nothing after it can be safely batched — end the batch at one.
    // Every multi-char symbol in the vocabulary came from a merge, so the
    // driver-held minted set IS the complete collision surface.
    var open = !minted.contains(top.head._1 + top.head._2)
    while (open && idx < top.length && accepted.length < maxN) {
      val (l, r, c) = top(idx)
      val ok = !minted.contains(l + r) && accepted.forall { case (al, ar, ac) =>
        val as = al + ar
        val disjoint = l != al && l != ar && r != al && r != ar &&
          l != as && r != as && (l + r) != as
        val intoLeft = top.collect { case (_, y, cc) if y == al => cc }
        val outOfRight = top.collect { case (x, _, cc) if x == ar => cc }
        val createdCap = math.min(ac,
          (intoLeft ++ outOfRight :+ unknownCap).max)
        disjoint && c > createdCap
      }
      if (ok) accepted += top(idx) else open = false
      idx += 1
    }
    accepted.toSeq.take(maxN)
  }

  /** Per-stratum sample size for q121. */
  val stratN = 20

  /** q121 — deterministic stratified fixed-N sampling: exactly N docs per
    * language stratum, selected by PORTABLE hash order (the top 52 bits
    * of md5(doc_id) — `conv(substring(md5(..),1,13),16,10)`, replayable
    * in any engine, exactly representable in a double). Hash-order
    * selection is the reproducibility contract q49's Bernoulli sampler
    * can't give: q49 keeps a FRACTION (per-stratum size is binomial,
    * never exact), while audits, eval splits and human-annotation
    * batches need "exactly N per stratum, same N docs on every engine
    * and every re-run, no RNG state".
    *
    * Scale shape: selection is [[graft.functions.TopKAgg]] — the bounded
    * heap reduces each partition to ≤ N rows per stratum BEFORE the
    * exchange, so the shuffle carries O(N·strata·tasks) rows and no full
    * per-stratum sort ever runs (the row_number spelling the oracle uses
    * IS that sort on the DuckDB side, where it's fine at oracle scale).
    * Ties are impossible in distinct 52-bit prefixes of distinct doc_ids
    * at any plausible stratum size; the heap's (value desc, id asc)
    * total order pins the result anyway.
    */
  def q121StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)"))
    docs.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_stratum"),
        graft.functions.TopK.topK($"h".cast("double"), $"doc_id", stratN).as("tk"))
      .select($"lang", $"n_stratum", posexplode($"tk"))
      .select($"lang", $"n_stratum",
        ($"pos" + lit(1)).cast("long").as("rank"),
        $"col.event_id".as("doc_id"))
      .transform(Relational.presentSorted(_, $"lang", $"rank"))
  }

  /** Chunk geometry for q88: window of 128 tokens advancing by 96 (32
    * tokens of overlap — context continuity across chunk boundaries).
    */
  val chunkTokens = 128
  val chunkStride = 96

  /** q88 — sliding-window document chunking: every document splits into
    * fixed-size token windows with overlap, the long-document precursor
    * to q50's sequence packing (chunk first so no single document
    * monopolizes a packed sequence; the RAG/embedding pipelines use the
    * same operator for passage indexing). chunk_id = start/stride, so
    * the numbering is content-independent and stable under re-runs.
    *
    * Scale shape: entirely IN-ROW — one `sequence` of starts explodes per
    * document and each chunk slices the token array; no shuffle, no
    * window, no state. Output size is bounded by n_tokens/stride
    * chunks per doc (~1.33× token duplication at 128/96); window and
    * stride are the levers. Degenerate docs (< stride tokens) emit
    * exactly one chunk.
    */
  def q88ChunkDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkCore(Tables.documents(spark, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("toks")))
      .transform(Relational.presentRanged(_, $"doc_id", $"chunk_id"))
  }

  /** The chunking column pipeline over a (doc_id, lang, toks) frame —
    * shared verbatim by the batch q88 (which adds the presentation sort)
    * and the streaming twin
    * ([[graft.streaming.EventStream.chunkStream]], which cannot sort).
    */
  private[graft] def chunkCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("n_tokens", size($"toks").cast("long"))
      .select($"doc_id", $"lang", $"toks", $"n_tokens",
        explode(sequence(lit(0), ($"n_tokens" - 1).cast("int"), lit(chunkStride)))
          .as("start_tok"))
      .select($"doc_id", $"lang",
        ($"start_tok" / chunkStride).cast("long").as("chunk_id"),
        $"start_tok".cast("long").as("start_tok"),
        least(lit(chunkTokens.toLong), $"n_tokens" - $"start_tok").as("n_tok"),
        array_join(slice($"toks", $"start_tok" + 1, lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** q91 — CHUNK-grain exact dedup over the q88 sliding windows: chunks
    * fingerprint by md5 of their text and only the first occurrence
    * (min (doc_id, chunk_id)) survives, with the duplication count kept
    * as a signal column. This catches what document-grain dedup (q25)
    * structurally cannot: boilerplate blocks REPEATED ACROSS distinct
    * documents (headers, footers, license stanzas, navigation chrome) —
    * the dedup grain RAG indexes and training-corpus pipelines actually
    * want after chunking. Production order is q72 (passage rebuild) →
    * this; the operator is standalone so either grain can run alone.
    *
    * Scale shape: chunking is in-row (q88); the dedup is ONE shuffle on
    * the high-cardinality uniform fp with map-side combine — survivor
    * selection is a `min(struct)` aggregate, never a window over fp
    * (the q72 min_by discipline: no Zipf-key window, mega-duplicate
    * groups collapse map-side).
    */
  def q91ChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkCore(Tables.documents(spark, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("toks")))
      .withColumn("fp", md5($"chunk_text"))
      .groupBy($"fp")
      .agg(
        min(struct($"doc_id", $"chunk_id", $"start_tok", $"n_tok")).as("first"),
        count(lit(1)).as("n_copies"))
      .select($"first.doc_id".as("doc_id"), $"first.chunk_id".as("chunk_id"),
        $"first.start_tok".as("start_tok"), $"first.n_tok".as("n_tok"),
        $"fp", $"n_copies")
      .transform(Relational.presentRanged(_, $"doc_id", $"chunk_id"))
  }

  /** q107 — the CHUNK-grain corpus pipeline (v3), ONE composed plan:
    * (1) the q22 quality gate drops low-score documents BEFORE any
    * token fan-out (cheapest first — the in-row score reads each doc
    * once); (2) survivors chunk into q88's sliding windows (in-row);
    * (3) chunk-grain exact dedup keeps each distinct window's first
    * occurrence (q91's min-struct aggregate — cross-document
    * boilerplate dies here); (4) the surviving chunk stream
    * sequence-packs per language under the q50 budget convention.
    * Every stage is individually oracled; the composition is oracled
    * as one CTE chain. Beside q54 (document-grain, near-dup driven)
    * and q74 (passage-grain, DSIR driven) this is the RAG/pretraining
    * chunk path.
    *
    * Scale shape: score and chunk are in-row; dedup is one uniform-fp
    * exchange with map-side combine; packing is one window over the
    * (lang) key on already-narrow chunk rows. Nothing quadratic, no
    * content-keyed window.
    */
  def q107CorpusPipelineV3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spreadBy(Tables.documents(spark, dir), "doc_id")
    val kept = docs
      .filter(TextOps.qualityScoreExpr($"text", $"n_chars") >= 0.5)
      .select($"doc_id", $"lang", split($"text", " ").as("toks"))
    val survivors = chunkCore(kept)
      .withColumn("fp", md5($"chunk_text"))
      .groupBy($"fp")
      .agg(min(struct($"doc_id", $"chunk_id", $"n_tok", $"lang")).as("first"))
      .select($"first.doc_id".as("doc_id"), $"first.chunk_id".as("chunk_id"),
        $"first.n_tok".as("n_tok"), $"first.lang".as("lang"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id", $"chunk_id")
    survivors
      .withColumn("start_off", sum($"n_tok").over(w) - $"n_tok")
      .select($"doc_id", $"chunk_id", $"lang", $"n_tok",
        floor($"start_off" / lit(packBudget.toDouble)).as("bin_id"),
        ($"start_off" % packBudget).as("bin_offset"))
      .transform(Relational.presentRanged(_, $"doc_id", $"chunk_id"))
  }

  /** BUILD: the distinct chunk-fingerprint set of a reference corpus —
    * the narrow persistable artifact (one md5 string per distinct chunk)
    * the incremental chunk gate probes against; the chunk-grain member of
    * the index family (doc fps, passage fps q76, minhash bands q64).
    */
  def buildChunkIndex(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    chunkCore(docs.select($"doc_id", $"lang", split($"text", " ").as("toks")))
      .select(md5($"chunk_text").as("fp")).distinct()
  }

  /** The un-ordered chunk-gate core, shared VERBATIM by the batch q92 and
    * the streaming twin ([[graft.streaming.EventStream.chunkGateStream]])
    * — one definition of the hit semantics and admission threshold. The
    * index is re-distinct'ed defensively (unioned nightly writes with a
    * repeated fp would double-count both sides of the fraction).
    */
  private[graft] def gateChunksCore(index: DataFrame, batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    chunkCore(batch.select($"doc_id", $"lang", split($"text", " ").as("toks")))
      .select($"doc_id", md5($"chunk_text").as("fp"))
      .join(index.select($"fp").distinct().withColumn("hit", lit(1L)), Seq("fp"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce($"hit", lit(0L))).as("n_dup_chunks"))
      .select($"doc_id", $"n_chunks", $"n_dup_chunks",
        (($"n_dup_chunks".cast("double") / $"n_chunks") < 0.5).as("admitted"))
  }

  /** q92 — the incremental chunk gate (q76's shape at chunk grain): an
    * arriving batch (every 3rd document stands in) is admitted against
    * the at-rest corpus' chunk-fingerprint index — per batch document,
    * its chunk count, how many chunks the corpus already contains, and
    * the admission verdict (duplicated fraction < 0.5). Chunk grain is
    * what an ingest feed for a RAG index or chunked training corpus
    * gates on: a "new" page that is 90% boilerplate chunks the corpus
    * already holds is a duplicate in every way that matters, whatever
    * its doc-level fingerprint says.
    *
    * Scale shape: the batch side chunks in-row; the probe is a left join
    * against the narrow fp index (AQE: broadcast when the index is
    * small, shuffle on the uniform fp otherwise); per-doc rollup on
    * doc_id. The index is the build-once parquet artifact of
    * [[buildChunkIndex]].
    */
  def q92ChunkGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
    // build-once/probe-many: the chunk-fp index persists via ArtifactStore,
    // so steady-state runs chunk only the batch side.
    val index = graft.ArtifactStore.cached(spark, "chunk_index", 1,
      Seq(s"$dir/documents.parquet")) {
      buildChunkIndex(docs.filter($"doc_id" % 3 =!= 0))
    }
    gateChunksCore(index, docs.filter($"doc_id" % 3 === 0))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** q53 — top-3 tf-idf terms per document: tf from the exploded tokens,
    * df over the distinct (doc, word) pairs, idf = ln(N/df) with the score
    * rounded to 6dp BEFORE ranking so both engines rank the identical
    * value (word ascending breaks ties deterministically).
    *
    * Scale shape: df is a `groupBy(word)` aggregate over the tf stream
    * (df = |tf rows per word| by construction) joined back on `word` —
    * NOT a count-window over `word`. A window partitioned by a raw token
    * column materializes every tf row of a Zipf-head word ("the" appears
    * in ~every doc) inside ONE task, which dies at corpus scale; the
    * aggregate form combines map-side (each map partition emits ≤ |local
    * vocab| rows) and the join back is AQE-planned — broadcast when the
    * vocab is small, skew-split shuffle when it is not. The tf table is
    * the corpus's TERM-FREQUENCY INDEX — built once per dataset
    * (frameCached) with df DENORMALIZED onto the postings at build time
    * (the q60 cf discipline: df is a property of the index, so the df
    * aggregate AND its join back live in the build, not in every probe)
    * and n_docs a fingerprint-keyed cached constant; steady state pays
    * one cache scan, in-row scoring, and the doc_id exchange for the
    * ranking window — nothing else corpus-wide (the former plan still
    * ran the df aggregate + word join per run on the cached partitions).
    * Asserted by PlanSpec.
    */
  def q53Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = graft.ArtifactStore.frameCached(spark, "tf_index", 2,
      Seq(s"$dir/documents.parquet")) {
      val t = Tables.spreadBy(Tables.documents(spark, dir), "doc_id") // gated: skipped on wide inputs
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
        .repartition($"word")
      t.join(t.groupBy($"word").agg(count(lit(1)).as("df")), Seq("word"))
    }
    val nDocs: Long = graft.ArtifactStore.scalarCached("q53_n_docs", 1,
      Seq(s"$dir/documents.parquet")) {
      Tables.documents(spark, dir).select($"doc_id").distinct().count()
    }
    val scored = tf
      .select($"doc_id", $"word",
        round($"tf" * log(lit(nDocs).cast("double") / $"df"), 6).as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"word".asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"word", $"score", $"rk")
      .transform(Relational.presentRanged(_, $"doc_id", $"rk"))
  }

  /** q73 — DSIR-style importance resampling (data selection via importance
    * reweighting, Xie et al. 2023): score every document by how much more
    * likely its tokens are under a TARGET-domain unigram LM (here the
    * `source = 'src0'` slice) than under the raw-pool LM, then keep the
    * top decile per language. Per-token log-ratio uses add-one smoothing
    * over the joint vocabulary; a document's score is its mean per-token
    * log-ratio.
    *
    * Engine parity: one libm `ln` per DISTINCT word, rounded to a
    * micro-fixed-point long (the q60/q69 measure-zero boundary argument);
    * per-document sums are then exact integer arithmetic, and the single
    * per-doc division is one IEEE op. The per-language cutoff is the exact
    * interpolated 0.9 percentile (the q41 cross-engine pair), compared at
    * 6 dp on both sides.
    *
    * Scale shape: tokens collapse to (doc, word) tf on one exchange; word
    * statistics are a groupBy(word) aggregate (map-side combine — NO
    * window over the Zipfian word key, the q53/q60 lesson) joined back on
    * the same word key; corpus totals ride a broadcast crossJoin; the
    * 4-row per-language threshold broadcast-joins back. The oracle pins
    * the EXACT interpolated percentile (cross-engine determinism); the
    * production default of [[dsirSample]] is the mergeable
    * `approx_percentile` sketch — see the threshold-mode note there and
    * the q79 contract that oracles the sketch path.
    */
  def q73DsirSample(spark: SparkSession, dir: String): DataFrame =
    dsirSampleScored(dsirScoredCached(spark, dir),
      exactThreshold = true) // oracle pin; production default is the sketch

  /** The q73 engine over any (doc_id, lang, source, text) frame — also a
    * stage of the [[q74CorpusPipelineV2]] composition.
    *
    * Threshold mode: the per-language 0.9 cutoff defaults to the
    * MERGEABLE `approx_percentile` sketch (`exactThreshold = false`) —
    * each partition contributes a bounded-size quantile summary that
    * combines map-side, so a 100 TB `en` stratum never buffers its score
    * vector in one aggregation task. `exactThreshold = true` switches to
    * the exact interpolated `percentile` (one buffered array per
    * language) — kept ONLY for the cross-engine oracle pin (q73/q74),
    * where bit-determinism matters more than the buffer; the q79 contract
    * oracles the sketch path itself (threshold within 5% of exact,
    * selection agreement ≥ 95%).
    */
  def dsirSample(docs: DataFrame, exactThreshold: Boolean = false): DataFrame =
    dsirSampleScored(dsirScores(docs), exactThreshold)

  private def dsirSampleScored(scored: DataFrame,
      exactThreshold: Boolean): DataFrame = {
    import scored.sparkSession.implicits._
    val thr = dsirThreshold(scored, exactThreshold)
    scored.join(broadcast(thr), Seq("lang"))
      .select($"doc_id", $"lang", $"n_tokens",
        round($"avg_raw", 6).as("avg_logratio"),
        (round($"avg_raw", 6) >= round($"thr", 6)).as("selected"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Per-language 0.9-percentile cutoff over a [[dsirScores]] stream —
    * the single site where the exact/sketch choice lives, shared by
    * [[dsirSample]] and the q79 sketch contract.
    */
  private[graft] def dsirThreshold(scored: DataFrame, exact: Boolean): DataFrame = {
    import scored.sparkSession.implicits._
    val agg =
      if (exact) expr("percentile(avg_raw, 0.9)")
      else expr("approx_percentile(avg_raw, 0.9)")
    scored.groupBy($"lang").agg(agg.as("thr"))
  }

  /** The per-document DSIR score stream (doc_id, lang, n_tokens, avg_raw)
    * behind [[dsirSample]] and the q75 threshold contract.
    */
  private[operators] def dsirScores(docs: DataFrame): DataFrame =
    dsirScoresFromTf(dsirTf(docs))

  /** The (doc, lang, source, word, tf) stream every DSIR statistic
    * derives from: word stats are sums of tf (identical values to
    * counting raw tokens) and corpus totals are sums over the word
    * stats, so the corpus is scanned once.
    */
  private def dsirTf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"lang", $"source", explode(split($"text", " ")).as("word"))
      .groupBy($"doc_id", $"lang", $"source", $"word")
      .agg(count(lit(1)).as("tf"))
  }

  /** [[dsirTf]] over the RAW corpus as a cached, word-partitioned index
    * (frameCached — built once per dataset state): the word-stat
    * aggregate and the per-token score join both ride the cached
    * partitioning, so a steady-state q73/q75 run pays one doc-keyed
    * exchange for the per-document rollup and nothing else corpus-wide.
    * Only the raw-corpus entry points use this — compositions scoring
    * pipeline INTERMEDIATES (q74's cleaned docs) keep the inline
    * [[dsirTf]], whose input is not an at-rest dataset.
    */
  /** The per-document DSIR score table over the raw corpus, cached: the
    * threshold aggregate and the selection join BOTH consume it (without
    * the cache each branch re-ran the score join + per-doc rollup), and
    * its rows are |docs|-bounded — four narrow columns.
    */
  private def dsirScoredCached(spark: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.frameCached(spark, "dsir_scored_index", 1,
      Seq(s"$dir/documents.parquet")) {
      dsirScoresFromTf(dsirTfCached(spark, dir))
    }

  private def dsirTfCached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ArtifactStore.frameCached(spark, "dsir_tf_index", 1,
      Seq(s"$dir/documents.parquet")) {
      dsirTf(Tables.spreadBy(Tables.documents(spark, dir), "doc_id"))
        .repartition($"word")
    }
  }

  private[operators] def dsirScoresFromTf(tf: DataFrame): DataFrame = {
    import tf.sparkSession.implicits._
    val ws = tf.groupBy($"word").agg(
      sum(when($"source" === "src0", $"tf").otherwise(0L)).as("ct"),
      sum($"tf").as("cr"))
    val stats = ws.agg(
      sum($"ct").as("nt"), sum($"cr").as("nr"), count(lit(1)).as("v"))
    val lr = ws.crossJoin(broadcast(stats))
      .select($"word",
        round(log((($"ct" + lit(1.0)) / ($"nt" + $"v")) /
                  (($"cr" + lit(1.0)) / ($"nr" + $"v"))) * lit(1e6))
          .cast("long").as("lr"))
    val scored = tf
      .join(lr, Seq("word"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"tf").as("n_tokens"),
        sum($"tf" * $"lr").as("s_micro"))
      .withColumn("avg_raw",
        $"s_micro".cast("double") / ($"n_tokens".cast("double") * lit(1e6)))
    scored
  }

  /** q75 — the DSIR threshold contract at scale: per language, the exact
    * interpolated 0.9-percentile cutoff next to the mergeable-sketch
    * `approx_percentile` a 100 TB run would use instead (exact
    * `percentile` buffers every score of a group in one aggregate
    * buffer). The q41 pattern: the oracle-checked facts are the exact
    * threshold and the CONTRACT that each engine's own sketch lands
    * within 5% of it — the sketches themselves differ between engines by
    * construction.
    */
  def q75DsirThresholds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dsirScoredCached(spark, dir)
      .groupBy($"lang")
      .agg(
        expr("percentile(avg_raw, 0.9)").as("thr_exact"),
        expr("approx_percentile(avg_raw, 0.9)").as("thr_approx"))
      .select($"lang", round($"thr_exact", 6).as("thr"),
        (abs($"thr_approx" - $"thr_exact") /
          greatest(abs($"thr_exact"), lit(1e-9)) <= 0.05).as("approx_within_tol"))
      .transform(Relational.presentSorted(_, $"lang"))
  }

  /** q79 — the SKETCH-mode DSIR selection contract: q75 pins that the
    * mergeable threshold lands within 5% of exact; q79 pins what that
    * means for the SELECTION ITSELF — the operator a 100 TB run ships
    * (the [[dsirSample]] default). Per language: exact doc/selection
    * counts (cross-engine deterministic) plus three contract booleans
    * each engine checks against its OWN sketch — threshold within 5% of
    * exact, sketch-selected fraction inside [0.05, 0.2] around the 0.1
    * target, and ≥ 95% per-document agreement between sketch and exact
    * selection. The sketches differ between engines by construction
    * (t-digest vs Greenwald-Khanna); the booleans do not.
    */
  def q79DsirSketchContract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // same cached per-document score table as q73/q75 (fingerprint-keyed,
    // rebuilt on dataset change): the contract is over the RAW corpus, so
    // re-deriving the word-level scoring pipeline inline re-paid the
    // tokenize + tf + join chain the index already holds
    val scored = dsirScoredCached(spark, dir)
    // both percentiles in ONE aggregation over one scored pass (the q75
    // shape) — two separate dsirThreshold() aggregates would instantiate
    // the whole word-level scoring pipeline once each (their partial-agg
    // exchanges differ, so ReuseExchange cannot dedupe them)
    val thr = scored.groupBy($"lang").agg(
      expr("percentile(avg_raw, 0.9)").as("te"),
      expr("approx_percentile(avg_raw, 0.9)").as("ts"))
    scored.join(broadcast(thr), Seq("lang"))
      .withColumn("se", round($"avg_raw", 6) >= round($"te", 6))
      .withColumn("ss", round($"avg_raw", 6) >= round($"ts", 6))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"se", 1L).otherwise(0L)).as("n_sel_exact"),
        sum(when($"ss", 1L).otherwise(0L)).as("n_ss"),
        sum(when($"se" === $"ss", 1L).otherwise(0L)).as("n_agree"),
        first($"te").as("te"), first($"ts").as("ts"))
      .select($"lang", $"n_docs", $"n_sel_exact",
        (abs($"ts" - $"te") /
          greatest(abs($"te"), lit(1e-9)) <= 0.05).as("sketch_within_tol"),
        ($"n_ss".cast("double") / $"n_docs" >= 0.05 &&
          $"n_ss".cast("double") / $"n_docs" <= 0.2).as("sel_rate_ok"),
        ($"n_agree".cast("double") / $"n_docs" >= 0.95).as("agree_ok"))
      .transform(Relational.presentSorted(_, $"lang"))
  }

  /** q54 — the training-corpus pipeline END TO END, composed from the
    * family's own operators in one plan: (1) drop benchmark (eval-set)
    * documents from the corpus; (2) keep only near-dup cluster survivors
    * (the [[Dedup.membershipComponents]] representative — non-reps
    * anti-join out); (3) drop documents whose shingle contamination
    * against the benchmark set is ≥ 0.5; (4) sequence-pack what remains
    * (same concat-then-split convention as q50). This is the deliverable a
    * training run actually consumes — every stage is individually oracled
    * (q48, q52, q50) and the composition is oracled as one CTE chain.
    *
    * Scale shape: three anti/semi joins against SMALL derived sets
    * (non-reps, contaminated, benchmark ids) over one pass of the corpus,
    * then the packing window — no stage materializes anything quadratic.
    */
  def q54CorpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nonReps = Dedup
      .membershipComponents(Dedup.probeBands(spark, dir), Seq("band", "r0", "r1"), "doc_id")
      .filter($"node" =!= $"label")
      .select($"node".as("doc_id"))
    val contaminated = q52Contamination(spark, dir)
      .filter($"contamination" >= 0.5)
      .select($"doc_id")
    // r17 (guide §2.3): n_tokens is projected BEFORE the anti joins and
    // text dropped — the former spelling shuffled the full document rows
    // (text included) through the doc_id exchange of the non-rep anti
    // join and again through the pack window's (lang, source) exchange,
    // for a value one narrow projection computes at the scan.
    val kept = Tables.documents(spark, dir)
      .filter(!isBenchmark)
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(nonReps, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
    packCounted(kept).transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** q74 — the v2 corpus pipeline, composing the round-6 family end to end
    * in ONE plan: (1) passage-level exact dedup rebuilds every document
    * from its globally-first passages (q72), dropping documents left with
    * nothing; (2) DSIR importance resampling over the REBUILT corpus keeps
    * the top decile per language (q73 — note the LM statistics are
    * recomputed on deduplicated text, which is exactly why a real pipeline
    * orders dedup before selection: duplicated boilerplate would otherwise
    * dominate the pool LM); (3) the survivors sequence-pack (q50's
    * concat-then-split convention). Every stage is individually oracled;
    * the composition is oracled as one CTE chain.
    *
    * Scale shape: q72's fp-keyed aggregate+join, q73's word-keyed
    * aggregate+join and 4-row threshold broadcast, one doc_id semi join,
    * then the packing window — nothing quadratic, no window over a
    * content-derived key.
    */
  def q74CorpusPipelineV2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both expensive stages are at-rest-corpus functions and ride caches
    // (VERDICT r10 #3): the cleaned corpus comes from the shared
    // passage-dedup frame (one fingerprint aggregate per dataset state,
    // shared with q72), and the DSIR statistics OVER THE REBUILT TEXT —
    // recomputed on deduplicated text by design, so the raw-corpus score
    // index can NOT serve them — get their own |docs|-bounded cached
    // score table. The steady-state query is the rebuild join, the 4-row
    // threshold broadcast, the selection semi join, and the pack window.
    val docs = Tables.spreadBy(Tables.documents(spark, dir), "doc_id") // gated: skipped on wide inputs
    val cleaned = Dedup.passageDedupCached(spark, dir)
      .filter($"n_kept" > 0)
      .select($"doc_id", $"clean_text")
    val rebuilt = docs.select($"doc_id", $"lang", $"source")
      .join(cleaned, Seq("doc_id"))
      .select($"doc_id", $"lang", $"source", $"clean_text".as("text"))
    val scored = graft.ArtifactStore.frameCached(spark, "dsir_scored_rebuilt", 1,
      Seq(s"$dir/documents.parquet")) {
      dsirScores(rebuilt)
    }
    val picked = dsirSampleScored(scored, exactThreshold = true) // oracle pin
      .filter($"selected").select($"doc_id")
    // (r17 note: q54's early-n_tokens move was tried here too and
    // REVERTED — q74's joins are all broadcast, so clean_text never
    // crosses a real exchange anyway, and hoisting the projection above
    // the semi join made the docs broadcast carry ALL documents instead
    // of the picked ~10%.)
    pack(rebuilt.join(picked, Seq("doc_id"), "left_semi"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** q56 — survivor selection by QUALITY: one row per near-dup cluster,
    * keeping the member with the highest q22 quality score (doc_id breaks
    * ties) instead of q48's min-id convention — the policy a production
    * dedup actually wants (keep the best copy, not the first). Cluster
    * identity stays the min-id label so q48 and q56 share vocabulary.
    *
    * Scale shape: the cluster label table is narrow (two longs per doc)
    * and the quality table is a per-row projection. Survivor selection is
    * ONE groupBy(cluster_id) aggregate — max_by over the (quality,
    * −doc_id) ordering key plus the member count — not a row_number +
    * count window pair: aggregates combine map-side, so even a
    * degenerate mega-cluster (half the corpus under one label) never
    * funnels its rows into a single window task.
    */
  def q56QualitySurvivor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cc = Dedup.membershipComponents(
      Dedup.probeBands(spark, dir), Seq("band", "r0", "r1"), "doc_id")
    val lab = Tables.documents(spark, dir).select($"doc_id")
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("cluster_id"))
    lab
      .join(TextOps.qualityRaw(spark, dir).select($"doc_id", $"quality_score"),
        Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(
        max_by(struct($"doc_id", $"quality_score"),
          struct($"quality_score", -$"doc_id")).as("_s"),
        count(lit(1)).as("cluster_size"))
      .select($"cluster_id", $"_s.doc_id".as("survivor_doc_id"),
        $"_s.quality_score".as("survivor_quality"), $"cluster_size")
      .transform(Relational.presentRanged(_, $"cluster_id"))
  }

  /** q63 — temperature-based domain mixing (the multilingual-corpus
    * standard): per-(lang, source) stratum, the target share is
    * tokens^(1/T) with T = 2 (√-temperature — upweights small domains,
    * flattens giant ones), the overall budget is half the corpus tokens,
    * and each stratum's sampling rate budget·share/tokens (capped at 1)
    * becomes an integer per-million threshold on the q49-style salted
    * portable hash. Deterministic end to end: re-runs and incremental
    * backfills keep exactly the same documents.
    *
    * Engine parity: √tokens is a correctly-rounded double, pinned to
    * DECIMAL(28,14) so the cross-stratum share denominator sums exactly
    * (a double Σ would depend on stratum order); every division happens
    * in double AFTER exact casts, and the final floor(rate·1e6) threshold
    * is integral — generic irrational rates never sit on the boundary.
    *
    * Plan shape: the strata table is |domains| rows (broadcast), its
    * rollup one map-side-combined aggregate; the keep filter is per-row
    * against the broadcast thresholds — the corpus itself never shuffles.
    */
  def q63DomainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val strata = docs
      .groupBy($"lang", $"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("toks"))
      .withColumn("w", sqrt($"toks".cast("double")).cast("decimal(28,14)"))
    val tot = strata.agg(
      sum($"w").as("wtot"), sum($"toks").cast("double").as("tokstot"))
    val share = $"w".cast("double") / $"wtot".cast("double")
    val rate = least(lit(1.0),
      lit(0.5) * $"tokstot" * share / $"toks".cast("double"))
    val thresh = strata.crossJoin(broadcast(tot))
      .select($"lang", $"source", floor(rate * lit(1e6)).cast("long").as("thresh"))
    docs
      .join(broadcast(thresh), Seq("lang", "source"))
      .filter(Dedup.portableHash(concat(lit("mix:"), $"doc_id".cast("string")))
        % 1000000 < $"thresh")
      .select($"doc_id", $"lang", $"source", $"thresh")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** q67 — corpus snapshot diff, the data-versioning primitive a managed
    * training corpus needs between crawls: per document, whether it was
    * ADDED, REMOVED, CHANGED, or UNCHANGED between two snapshots,
    * decided by content fingerprint. The two snapshots are carved
    * deterministically from the corpus (old drops doc_id ≡ 0 mod 5, new
    * drops ≡ 0 mod 7 and revises ≡ 0 mod 11 with a planted suffix) — the
    * q51 planting convention: the scenario is synthetic so the OPERATOR
    * semantics, not the data, are the thing under test; a production run
    * points the two sides at real snapshot manifests with the identical
    * plan.
    *
    * Scale shape: each side is a (doc_id, fingerprint) projection — the
    * diff joins MANIFESTS, never content; one shuffle per side on the
    * join key, or zero when snapshots are stored bucketed by doc_id
    * (the BucketingSpec layout).
    *
    * Missing-hash policy: membership comes from an explicit presence
    * flag, and fingerprints compare null-safely — a present row with a
    * NULL hash on either side reports 'changed' (conservative
    * re-ingest), never 'added'/'unchanged' by accident.
    */
  def q67SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // membership is decided by an explicit presence flag, NOT by
    // fingerprint nullness — a present row whose fingerprint is NULL
    // (a manifest with missing content hashes) must not masquerade as
    // absent; the oracle's doc_id IS NULL test has the same semantics
    val old = docs.filter($"doc_id" % 5 =!= 0)
      .select($"doc_id", md5($"text").as("fp_old"), lit(true).as("in_old"))
    val neu = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id",
        md5(when($"doc_id" % 11 === 0, concat($"text", lit(" [rev2]")))
          .otherwise($"text")).as("fp_new"), lit(true).as("in_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"in_old".isNull, "added")
          .when($"in_new".isNull, "removed")
          .when(!($"fp_old" <=> $"fp_new"), "changed")
          .otherwise("unchanged").as("status"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** q68 — corpus health report: per (lang, source) domain, the rollup a
    * curation team watches between ingests — document and token counts,
    * mean tokens, mean q22 quality, and the exact-duplicate fraction
    * (docs whose q25 fingerprint occurs more than once ANYWHERE in the
    * corpus). One health row per domain; feed it the q67 diff's changed
    * set and it becomes the per-crawl regression report.
    *
    * Engine parity: mean_quality sums per-doc micro-unit longs exactly
    * and divides once in double (quality scores are 1e-6 multiples, so a
    * rounded double mean would sit exactly on half-boundaries — the q60
    * lesson); mean_tokens and dup_frac are single IEEE divisions of
    * exact integers.
    *
    * Plan shape: one projection pass (quality + fingerprint in-row), one
    * fingerprint window (hash(fp), high cardinality), one map-side-
    * combined rollup to |domains| rows.
    */
  def q68CorpusHealth(spark: SparkSession, dir: String): DataFrame =
    corpusHealth(Tables.spread(Tables.documents(spark, dir))) // parallelism restore, gated

  /** The health rollup over any (doc_id, lang, source, text, n_chars)
    * frame — factored so the dup_frac>0 path is testable on a frame with
    * PLANTED duplicates (the gate corpus has none).
    */
  private[graft] def corpusHealth(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast("long").as("n_toks"),
        TextOps.qualityScoreExpr($"text", $"n_chars").as("q"),
        TextOps.fingerprintExpr($"text").as("fp"))
      .withColumn("fp_cnt", count(lit(1)).over(Window.partitionBy($"fp")))
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_toks").as("n_tokens"),
        (sum(round($"q" * lit(1e6)).cast("long")).cast("double") /
          (count(lit(1)) * lit(1e6))).as("mean_quality"),
        (sum(when($"fp_cnt" > 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("dup_frac"))
      .withColumn("mean_tokens", $"n_tokens".cast("double") / $"n_docs")
      .select($"lang", $"source", $"n_docs", $"n_tokens", $"mean_tokens",
        $"mean_quality", $"dup_frac")
      .transform(Relational.presentSorted(_, $"lang", $"source"))
  }

  /** q70 — EXACT stratified train/val/test split (90/5/5): within each
    * (lang, source) stratum, documents rank by a salted portable hash
    * (doc_id tie-break) and the first ⌊9n/10⌋ go to train, the next up
    * to ⌊19n/20⌋ to val, the rest to test. Unlike q49's Bernoulli
    * sample, the proportions are EXACT per stratum — the property an
    * eval-set split needs so a 200-doc language still gets its 10 val
    * docs — while staying fully deterministic and reproducible
    * (re-ranking with the same salt reproduces the identical split;
    * cutoffs are integer arithmetic, no float boundary exists).
    *
    * Scale shape: one window over (lang, source) — the q50 stream-key
    * discipline applies (sub-bucket a giant stratum the same way); the
    * rank and count windows share one exchange.
    */
  def q70Split(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = Dedup.portableHash(concat(lit("split:"), $"doc_id".cast("string")))
    val wRank = Window.partitionBy($"lang", $"source").orderBy(h.asc, $"doc_id".asc)
    val wAll = Window.partitionBy($"lang", $"source")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source")
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .select($"doc_id", $"lang", $"source",
        when($"rk" <= expr("(n * 9) div 10"), "train")
          .when($"rk" <= expr("(n * 19) div 20"), "val")
          .otherwise("test").as("split"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** Hash-space bins per stratum for the q82 quota cut (a power of two so
    * the bin of a row is a cheap mask; 1024 bins bound the selection
    * granularity at ~0.1% of a stratum's tokens).
    */
  val QuotaBins = 1024

  /** q82 — token-budget quota selection: the EXECUTOR for a target corpus
    * mix. q63 rebalances by per-row Bernoulli *rate* — unbiased but only
    * hits its target in expectation. A training run that promises "at
    * most B tokens of domain X" needs the budget ENFORCED: select
    * documents per (lang, source) stratum, in deterministic hash order,
    * until the stratum's token budget is exhausted (temperature-allocated
    * here: global budget = 40% of corpus tokens, split ∝ √stratum-tokens,
    * capped at the stratum's own size — the mT5/XLM-R rebalance with a
    * hard cap).
    *
    * The naive form — cumulative-sum window over hash-ordered documents
    * within each stratum — is the q53 scale-killer wearing a new hat: a
    * window partitioned by (lang, source) materializes an entire Zipf-head
    * stratum ("en"/web) in ONE task. The scalable form implemented here is
    * a binned prefix sum: each doc lands in one of [[QuotaBins]] hash bins,
    * per-bin token sums come from a map-side-combined groupBy, the cumsum
    * window runs over AT MOST [[QuotaBins]] rows per stratum (bounded
    * state, |strata|×1024 rows total), and the cut keeps whole bins while
    * the running total fits the budget. Docs then rejoin their bin's
    * verdict by (lang, source, bin) — a broadcast of the |strata|×1024
    * cut table. Selection granularity is one bin (~0.1% of the stratum);
    * the budget is never exceeded (prefix-sum invariant ≤, not rounding).
    *
    * Engine parity: the q63 conventions — √toks pinned to DECIMAL(28,14)
    * for an order-independent denominator sum, divisions in double after
    * exact casts, the final budget an integral floor; bin membership and
    * prefix sums are pure integer arithmetic.
    */
  def q82QuotaSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("bin",
        Dedup.portableHash(concat(lit("quota:"), $"doc_id".cast("string")))
          % QuotaBins)
    val binSums = docs.groupBy($"lang", $"source", $"bin")
      .agg(sum($"n_tokens").as("bin_toks"))
    val strata = binSums.groupBy($"lang", $"source")
      .agg(sum($"bin_toks").as("toks"))
      .withColumn("w", sqrt($"toks".cast("double")).cast("decimal(28,14)"))
    val tot = strata.agg(
      sum($"w").cast("decimal(28,14)").as("wtot"),
      sum($"toks").cast("double").as("tokstot"))
    val budget = strata.crossJoin(broadcast(tot))
      .select($"lang", $"source",
        least($"toks",
          floor(lit(0.4) * $"tokstot" *
            ($"w".cast("double") / $"wtot".cast("double"))).cast("long"))
          .as("budget"))
    val wBin = Window.partitionBy($"lang", $"source").orderBy($"bin")
    val cut = binSums
      .withColumn("cum", sum($"bin_toks").over(wBin))
      .join(broadcast(budget), Seq("lang", "source"))
      .filter($"cum" <= $"budget")
      .select($"lang", $"source", $"bin")
    docs.join(broadcast(cut), Seq("lang", "source", "bin"))
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"bin")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_quota_select" -> (q82QuotaSelect _),
    "q63_domain_mix" -> (q63DomainMix _),
    "q67_snapshot_diff" -> (q67SnapshotDiff _),
    "q68_corpus_health" -> (q68CorpusHealth _),
    "q70_split" -> (q70Split _),
    "q49_hash_sample" -> (q49HashSample _),
    "q50_seq_pack" -> (q50SeqPack _),
    "q51_pii_scrub" -> (q51PiiScrub _),
    "q52_contamination" -> (q52Contamination _),
    "q85_bloom_decontam" -> (q85BloomDecontam _),
    "q87_weighted_sample" -> (q87WeightedSample _),
    "q121_stratified_sample" -> (q121StratifiedSample _),
    "q88_chunk_docs" -> (q88ChunkDocs _),
    "q91_chunk_dedup" -> (q91ChunkDedup _),
    "q92_chunk_gate" -> (q92ChunkGate _),
    "q53_tfidf" -> (q53Tfidf _),
    "q73_dsir_sample" -> (q73DsirSample _),
    "q75_dsir_thresholds" -> (q75DsirThresholds _),
    "q79_dsir_sketch_contract" -> (q79DsirSketchContract _),
    "q54_corpus_pipeline" -> (q54CorpusPipeline _),
    "q74_corpus_pipeline_v2" -> (q74CorpusPipelineV2 _),
    "q107_corpus_pipeline_v3" -> (q107CorpusPipelineV3 _),
    "q56_quality_survivor" -> (q56QualitySurvivor _)
  )

  private val hashSql =
    "CAST(('0x' || substring(md5('smpl:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  private val mixHashSql =
    "CAST(('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  private val quotaHashSql =
    "CAST(('0x' || substring(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  private val splitHashSql =
    "CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Shared oracle SQL: the DSIR score chain (word explode → tf → word
    * stats → smoothed log-ratio → per-doc mean, ending at `sc`) over the
    * given source relation — replayed by the q73/q75 oracles and the q74
    * composition (which runs it over the passage-rebuilt corpus).
    */
  private def dsirScoreCtesSql(src: String): String =
    s"""wtoks AS (SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS word FROM $src),
       |tf AS (SELECT doc_id, lang, word, count(*) AS tf FROM wtoks GROUP BY 1, 2, 3),
       |ws AS (SELECT word,
       |         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
       |         count(*) AS cr
       |       FROM wtoks GROUP BY 1),
       |n AS (SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt, count(*) AS nr FROM wtoks),
       |v AS (SELECT count(*) AS v FROM ws),
       |lr AS (SELECT word,
       |         CAST(round(ln(((ct + 1.0) / (nt + v)) / ((cr + 1.0) / (nr + v))) * 1e6) AS BIGINT) AS lr
       |       FROM ws, n, v),
       |sc AS (SELECT tf.doc_id, tf.lang,
       |         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       |         CAST(sum(tf.tf * lr.lr) AS DOUBLE) / (CAST(sum(tf.tf) AS DOUBLE) * 1e6) AS avg_raw
       |       FROM tf JOIN lr USING (word) GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q74_corpus_pipeline_v2" ->
      s"""WITH ${graft.operators.Dedup.passageCtesSql},
         |pf AS (SELECT md5(ptext) AS fp, min(pos_key) AS first_key FROM pp GROUP BY 1),
         |psel AS (
         |  SELECT pp.doc_id, pp.pidx, pp.ptext, pp.pos_key = pf.first_key AS kept
         |  FROM pp JOIN pf ON md5(pp.ptext) = pf.fp),
         |cleaned AS (
         |  SELECT doc_id,
         |    count(*) FILTER (WHERE kept) AS n_kept,
         |    coalesce(string_agg(ptext, ' ' ORDER BY pidx) FILTER (WHERE kept), '') AS clean_text
         |  FROM psel GROUP BY doc_id),
         |docs2 AS (
         |  SELECT d.doc_id, d.lang, d.source, c.clean_text AS text
         |  FROM documents d JOIN cleaned c USING (doc_id) WHERE c.n_kept > 0),
         |${dsirScoreCtesSql("docs2")},
         |thr AS (SELECT lang, quantile_cont(avg_raw, 0.9) AS thr FROM sc GROUP BY 1),
         |picked AS (SELECT sc.doc_id FROM sc JOIN thr USING (lang)
         |           WHERE round(sc.avg_raw, 6) >= round(thr.thr, 6)),
         |surv AS (
         |  SELECT d2.doc_id, d2.lang, d2.source,
         |    CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM docs2 d2 JOIN picked USING (doc_id)),
         |packed AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang, source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
         |  FROM surv)
         |SELECT doc_id, lang, source, n_tokens,
         |  CAST(floor(start_off / ${packBudget}.0) AS BIGINT) AS bin_id,
         |  start_off % $packBudget AS bin_offset
         |FROM packed ORDER BY doc_id""".stripMargin,
    "q75_dsir_thresholds" ->
      s"""WITH ${dsirScoreCtesSql("documents")}
         |SELECT lang, round(quantile_cont(avg_raw, 0.9), 6) AS thr,
         |  (abs(approx_quantile(avg_raw, 0.9) - quantile_cont(avg_raw, 0.9))
         |     / greatest(abs(quantile_cont(avg_raw, 0.9)), 1e-9) <= 0.05) AS approx_within_tol
         |FROM sc GROUP BY lang ORDER BY lang""".stripMargin,
    "q79_dsir_sketch_contract" ->
      s"""WITH ${dsirScoreCtesSql("documents")},
         |t AS (SELECT lang, quantile_cont(avg_raw, 0.9) AS te,
         |             approx_quantile(avg_raw, 0.9) AS ts
         |      FROM sc GROUP BY 1),
         |j AS (SELECT sc.lang,
         |        round(sc.avg_raw, 6) >= round(t.te, 6) AS se,
         |        round(sc.avg_raw, 6) >= round(t.ts, 6) AS ss
         |      FROM sc JOIN t USING (lang)),
         |a AS (SELECT lang, count(*) AS n_docs,
         |        CAST(sum(CASE WHEN se THEN 1 ELSE 0 END) AS BIGINT) AS n_sel_exact,
         |        CAST(sum(CASE WHEN ss THEN 1 ELSE 0 END) AS BIGINT) AS n_ss,
         |        CAST(sum(CASE WHEN se = ss THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         |      FROM j GROUP BY 1)
         |SELECT a.lang, a.n_docs, a.n_sel_exact,
         |  (abs(t.ts - t.te) / greatest(abs(t.te), 1e-9) <= 0.05) AS sketch_within_tol,
         |  (CAST(n_ss AS DOUBLE) / n_docs >= 0.05
         |     AND CAST(n_ss AS DOUBLE) / n_docs <= 0.2) AS sel_rate_ok,
         |  (CAST(n_agree AS DOUBLE) / n_docs >= 0.95) AS agree_ok
         |FROM a JOIN t USING (lang) ORDER BY lang""".stripMargin,
    "q73_dsir_sample" ->
      s"""WITH ${dsirScoreCtesSql("documents")},
         |t AS (SELECT lang, quantile_cont(avg_raw, 0.9) AS thr FROM sc GROUP BY 1)
         |SELECT sc.doc_id, sc.lang, sc.n_tokens,
         |  round(sc.avg_raw, 6) AS avg_logratio,
         |  round(sc.avg_raw, 6) >= round(t.thr, 6) AS selected
         |FROM sc JOIN t USING (lang)
         |ORDER BY sc.doc_id""".stripMargin,
    "q70_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, source, $splitHashSql AS hv FROM documents),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang, source
         |      ORDER BY hv ASC, doc_id ASC) AS rk,
         |    count(*) OVER (PARTITION BY lang, source) AS n
         |  FROM h)
         |SELECT doc_id, lang, source,
         |  CASE WHEN rk <= (n * 9) // 10 THEN 'train'
         |       WHEN rk <= (n * 19) // 20 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,
    "q68_corpus_health" ->
      s"""WITH ${TextOps.qualityCtes},
         |base AS (
         |  SELECT d.doc_id, d.lang, d.source,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
         |    q.quality_score AS q,
         |    md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g')))) AS fp
         |  FROM documents d JOIN qscore q USING (doc_id)),
         |wd AS (SELECT *, count(*) OVER (PARTITION BY fp) AS fp_cnt FROM base)
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_toks) AS DOUBLE) / count(*) AS mean_tokens,
         |  CAST(sum(CAST(round(q * 1e6) AS BIGINT)) AS DOUBLE) / (count(*) * 1e6) AS mean_quality,
         |  CAST(sum(CASE WHEN fp_cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
         |FROM wd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q67_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS fp_old FROM documents WHERE doc_id % 5 <> 0),
        |neu AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS fp_new
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN fp_old IS DISTINCT FROM fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q82_quota_select" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $quotaHashSql % $QuotaBins AS bin
         |  FROM documents),
         |b AS (
         |  SELECT lang, source, bin, sum(n_tokens) AS bin_toks
         |  FROM d GROUP BY 1, 2, 3),
         |s AS (
         |  SELECT lang, source, CAST(sum(bin_toks) AS BIGINT) AS toks,
         |    CAST(sqrt(CAST(sum(bin_toks) AS DOUBLE)) AS DECIMAL(28,14)) AS w
         |  FROM b GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(sum(w) AS DECIMAL(28,14)) AS wtot,
         |    CAST(sum(toks) AS DOUBLE) AS tokstot
         |  FROM s),
         |bud AS (
         |  SELECT lang, source,
         |    least(toks, CAST(floor(0.4 * tokstot *
         |      (CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE))) AS BIGINT)) AS budget
         |  FROM s CROSS JOIN tot),
         |cut AS (
         |  SELECT c.lang, c.source, c.bin
         |  FROM (SELECT lang, source, bin,
         |          sum(bin_toks) OVER (PARTITION BY lang, source ORDER BY bin)
         |            AS cum
         |        FROM b) c
         |  JOIN bud ON c.lang = bud.lang AND c.source = bud.source
         |  WHERE cum <= budget)
         |SELECT doc_id, d.lang, d.source, n_tokens, d.bin
         |FROM d JOIN cut ON d.lang = cut.lang AND d.source = cut.source
         |  AND d.bin = cut.bin
         |ORDER BY doc_id""".stripMargin,
    "q63_domain_mix" ->
      s"""WITH strata AS (
         |  SELECT lang, source,
         |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS toks,
         |    CAST(sqrt(CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)) AS DECIMAL(28,14)) AS w
         |  FROM documents GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(sum(w) AS DECIMAL(28,14)) AS wtot,
         |    CAST(sum(toks) AS DOUBLE) AS tokstot
         |  FROM strata),
         |thresh AS (
         |  SELECT lang, source,
         |    CAST(floor(least(1.0,
         |      0.5 * tokstot * (CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE))
         |        / CAST(toks AS DOUBLE)) * 1e6) AS BIGINT) AS thresh
         |  FROM strata CROSS JOIN tot)
         |SELECT doc_id, d.lang, d.source, thresh
         |FROM documents d JOIN thresh t ON d.lang = t.lang AND d.source = t.source
         |WHERE $mixHashSql % 1000000 < thresh
         |ORDER BY doc_id""".stripMargin,
    "q49_hash_sample" ->
      s"""SELECT doc_id, lang, source, $hashSql % 100 AS bucket
         |FROM documents
         |WHERE $hashSql % 100 < CASE WHEN lang = 'en' THEN 20 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,
    "q107_corpus_pipeline_v3" ->
      s"""WITH ${graft.operators.TextOps.qualityCtes},
         |kept AS (
         |  SELECT d.doc_id, d.lang, string_split(d.text, ' ') AS w
         |  FROM documents d JOIN qscore q USING (doc_id)
         |  WHERE q.quality_score >= 0.5),
         |c AS (
         |  SELECT doc_id, lang, len(w) AS n, w,
         |    unnest(range(0, len(w), $chunkStride)) AS start_tok
         |  FROM kept),
         |ch AS (
         |  SELECT doc_id, lang,
         |    start_tok // $chunkStride AS chunk_id,
         |    CAST(least($chunkTokens, n - start_tok) AS BIGINT) AS n_tok,
         |    md5(array_to_string(w[start_tok + 1 : start_tok + $chunkTokens], ' ')) AS fp
         |  FROM c),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id) AS rk
         |  FROM ch),
         |s AS (SELECT doc_id, chunk_id, lang, n_tok FROM r WHERE rk = 1),
         |p AS (
         |  SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang
         |    ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
         |  FROM s)
         |SELECT doc_id, chunk_id, lang, n_tok,
         |  CAST(floor(start_off / ${packBudget}.0) AS BIGINT) AS bin_id,
         |  start_off % $packBudget AS bin_offset
         |FROM p ORDER BY doc_id, chunk_id""".stripMargin,
    "q50_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  -- sum() OVER a BIGINT is HUGEINT in DuckDB; pin it back
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang, source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
         |  FROM t)
         |SELECT doc_id, lang, source, n_tokens,
         |  CAST(floor(start_off / ${packBudget}.0) AS BIGINT) AS bin_id,
         |  start_off % $packBudget AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,
    "q51_pii_scrub" -> {
      val planted = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com or call 555-' || CAST(doc_id AS VARCHAR) || ' now'"
      s"""WITH raw AS (SELECT doc_id, $planted AS raw FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '$emailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '$phoneRe')) AS INT) AS n_phones,
         |  regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g') AS clean_text
         |FROM raw ORDER BY doc_id""".stripMargin
    },
    "q52_contamination" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |      [string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
        |       for i in range(1, len(string_split(text, ' ')) - 1)]
        |      ELSE [] END) AS sh
        |  FROM documents),
        |hashed AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
        |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM docs)),
        |bench AS (SELECT DISTINCT sh_h FROM hashed WHERE doc_id % 97 = 0),
        |corpus AS (
        |  SELECT *, count(*) OVER (PARTITION BY doc_id) AS n_shingles
        |  FROM hashed WHERE doc_id % 97 <> 0)
        |SELECT doc_id, count(*) AS n_shared,
        |  round(CAST(count(*) AS DOUBLE) / any_value(n_shingles), 6) AS contamination
        |FROM corpus WHERE sh_h IN (SELECT sh_h FROM bench)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q121_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
         |  FROM documents),
         |n AS (SELECT lang, count(*) AS n_stratum FROM h GROUP BY 1),
         |r AS (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv DESC, doc_id) AS rn
         |  FROM h)
         |SELECT r.lang, n_stratum, CAST(rn AS BIGINT) AS rank, doc_id
         |FROM r JOIN n ON r.lang = n.lang
         |WHERE rn <= $stratN ORDER BY r.lang, rank""".stripMargin,
    "q87_weighted_sample" ->
      s"""WITH ${TextOps.qualityCtes},
         |s AS (
         |  SELECT d.doc_id, d.lang,
         |    round(quality_score + 0.1, 6) AS w6,
         |    CAST(('0x' || substring(md5('wrs:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS hm
         |  FROM documents d JOIN qscore USING (doc_id)),
         |k AS (
         |  SELECT doc_id, lang, w6,
         |    CAST(round(ln((hm + 0.5) / 1000000.0) / w6 * 1e6) AS BIGINT) AS key_micro
         |  FROM s),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY key_micro DESC, doc_id) AS rk
         |  FROM k)
         |SELECT doc_id, lang, w6, key_micro FROM r WHERE rk <= $wrsN
         |ORDER BY doc_id""".stripMargin,
    "q88_chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |c AS (
         |  SELECT doc_id, lang, len(w) AS n, w,
         |    unnest(range(0, len(w), $chunkStride)) AS start_tok
         |  FROM t)
         |SELECT doc_id, lang,
         |  start_tok // $chunkStride AS chunk_id,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(least($chunkTokens, n - start_tok) AS BIGINT) AS n_tok,
         |  array_to_string(w[start_tok + 1 : start_tok + $chunkTokens], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q91_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |c AS (
         |  SELECT doc_id, len(w) AS n, w,
         |    unnest(range(0, len(w), $chunkStride)) AS start_tok
         |  FROM t),
         |ch AS (
         |  SELECT doc_id,
         |    start_tok // $chunkStride AS chunk_id,
         |    CAST(start_tok AS BIGINT) AS start_tok,
         |    CAST(least($chunkTokens, n - start_tok) AS BIGINT) AS n_tok,
         |    md5(array_to_string(w[start_tok + 1 : start_tok + $chunkTokens], ' ')) AS fp
         |  FROM c),
         |g AS (SELECT fp, count(*) AS n_copies FROM ch GROUP BY fp),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id) AS rk
         |  FROM ch)
         |SELECT r.doc_id, r.chunk_id, r.start_tok, r.n_tok, r.fp, g.n_copies
         |FROM r JOIN g USING (fp) WHERE rk = 1
         |ORDER BY r.doc_id, r.chunk_id""".stripMargin,
    "q92_chunk_gate" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |c AS (
         |  SELECT doc_id, len(w) AS n, w,
         |    unnest(range(0, len(w), $chunkStride)) AS start_tok
         |  FROM t),
         |ch AS (
         |  SELECT doc_id,
         |    md5(array_to_string(w[start_tok + 1 : start_tok + $chunkTokens], ' ')) AS fp
         |  FROM c),
         |idx AS (SELECT DISTINCT fp FROM ch WHERE doc_id % 3 <> 0),
         |batch AS (SELECT * FROM ch WHERE doc_id % 3 = 0)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(count(CASE WHEN fp IN (SELECT fp FROM idx) THEN 1 END) AS BIGINT) AS n_dup_chunks,
         |  (CAST(count(CASE WHEN fp IN (SELECT fp FROM idx) THEN 1 END) AS DOUBLE)
         |    / count(*)) < 0.5 AS admitted
         |FROM batch GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q85_bloom_decontam" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |      [string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
        |       for i in range(1, len(string_split(text, ' ')) - 1)]
        |      ELSE [] END) AS sh
        |  FROM documents),
        |hashed AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
        |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM docs)),
        |bench AS (SELECT DISTINCT sh_h FROM hashed WHERE doc_id % 97 = 0),
        |corpus AS (SELECT doc_id, sh_h FROM hashed WHERE doc_id % 97 <> 0)
        |SELECT doc_id, count(*) AS n_shingles,
        |  count(CASE WHEN sh_h IN (SELECT sh_h FROM bench) THEN 1 END) AS n_shared,
        |  TRUE AS superset_ok, TRUE AS fp_rate_ok
        |FROM corpus GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q54_corpus_pipeline" ->
      s"""WITH RECURSIVE ${Dedup.ccLabCtes},
         |nonreps AS (SELECT doc_id FROM lab WHERE rep_doc_id <> doc_id),
         |hashed2 AS (
         |  SELECT DISTINCT doc_id,
         |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
         |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM docs)),
         |bench2 AS (SELECT DISTINCT sh_h FROM hashed2 WHERE doc_id % 97 = 0),
         |corpus2 AS (
         |  SELECT *, count(*) OVER (PARTITION BY doc_id) AS n_shingles
         |  FROM hashed2 WHERE doc_id % 97 <> 0),
         |contam AS (
         |  SELECT doc_id FROM corpus2 WHERE sh_h IN (SELECT sh_h FROM bench2)
         |  GROUP BY doc_id
         |  HAVING round(CAST(count(*) AS DOUBLE) / any_value(n_shingles), 6) >= 0.5),
         |kept AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE doc_id % 97 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM nonreps)
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |packed AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang, source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
         |  FROM kept)
         |SELECT doc_id, lang, source, n_tokens,
         |  CAST(floor(start_off / ${packBudget}.0) AS BIGINT) AS bin_id,
         |  start_off % $packBudget AS bin_offset
         |FROM packed ORDER BY doc_id""".stripMargin,
    "q56_quality_survivor" ->
      s"""WITH RECURSIVE ${Dedup.ccLabCtes},
         |${TextOps.qualityCtes},
         |j AS (
         |  SELECT l.rep_doc_id AS cluster_id, q.doc_id, q.quality_score,
         |    row_number() OVER (PARTITION BY l.rep_doc_id
         |      ORDER BY q.quality_score DESC, q.doc_id ASC) AS rk,
         |    count(*) OVER (PARTITION BY l.rep_doc_id) AS cluster_size
         |  FROM lab l JOIN qscore q USING (doc_id))
         |SELECT cluster_id, doc_id AS survivor_doc_id,
         |  quality_score AS survivor_quality, cluster_size
         |FROM j WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    "q53_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, word, score, CAST(rk AS INT) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
  )
}
