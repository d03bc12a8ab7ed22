package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Deduplication operators over `documents`: exact (hash groupBy), word
  * n-gram Jaccard, MinHash + banded LSH, and SimHash.
  *
  * Portability: every hash is derived from md5 (identical in Spark and
  * DuckDB) — `g(s) = int(md5(s)[0:15], 16)` — so the oracle can replay the
  * exact pipeline. Spark's xxhash64/hash would be faster but untestable
  * against the oracle; at 100 TB you'd swap `portableHash` for xxhash64
  * behind the same column signature.
  *
  * Scale notes: shingle→doc inverted-index joins shuffle on the shingle
  * hash (high cardinality, well distributed); candidate generation is
  * blocked (lang/source or LSH band) so no full cross-join ever happens;
  * minhash signatures are fixed-width columns (no row explosion kept
  * after the aggregate).
  */
object Dedup {

  /** Portable 60-bit string hash: first 15 hex chars of md5 as a long.
    * Backed by the native codegen'd [[graft.functions.PortableHash60]]
    * expression — bit-identical to the built-in formulation
    * `conv(substring(md5(c), 1, 15), 16, 10)` that the DuckDB oracle
    * replays, without the hex-string round-trip.
    */
  def portableHash(c: Column): Column =
    graft.functions.PortableHash60.portableHash60(c)

  private val P = 2147483647L // 2^31-1, modulus for minhash permutations

  /** (a, b) parameters of the 8 minhash "permutations" (canonical copy
    * lives with the in-row implementation).
    */
  val minhashParams: Seq[(Long, Long)] = graft.functions.ShingleOps.minhashParams

  /** Word 3-gram shingles from a MATERIALIZED word-array column (kept for
    * in-row uses; the exploded pipelines below use [[shingleRows]] which is
    * strictly linear).
    */
  def shinglesFromWords(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** One row per word 3-gram shingle: posexplode the words, then stitch
    * 3-grams with lead() windows. This formulation is linear and fully
    * codegen'd — the array-lambda variant re-evaluated its word-array
    * subtree per element after optimizer project-collapsing, which measured
    * ~10× slower on the profiler. Output: input columns + `shingle`.
    *
    * The per-doc window shuffles on doc_id (high cardinality) — the same
    * plan shape scales to arbitrarily many documents.
    */
  def shingleRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(docs.columns.map(col) :+ posexplode(split(col("text"), " ")).as(Seq("pos", "word")): _*)
      .withColumn("w1", lead(col("word"), 1).over(w))
      .withColumn("w2", lead(col("word"), 2).over(w))
      .filter(col("w2").isNotNull)
      .withColumn("shingle", concat_ws(" ", col("word"), col("w1"), col("w2")))
      .drop("pos", "word", "w1", "w2", "text")
  }

  /** Per-row bound (elements) on posting-list arrays in the pair-expansion
    * operators below. Buckets larger than this are transparently chunked by
    * [[boundedPairs]] — output is identical, only the row shape changes —
    * so a pathologically hot shingle / LSH bucket can no longer materialize
    * one giant array row in an aggregation buffer (the round-3 scale risk
    * documented in SCALE.md, now implemented).
    */
  val hotBucketCap = 256

  /** Token width of a passage / exact-substring window — the ONE
    * definition behind [[passages]] (disjoint cut), the scan-side
    * n_passages recompute in [[passageDedupFrame]], q77's overlapping
    * windows, [[q78ExactSubstrRewrite]]'s span merge, and (interpolated)
    * the [[passageCtesSql]] / q77 oracles. A width change that missed one
    * of those sites would corrupt results silently; now there is only
    * this site.
    */
  val PassageTokens = 16

  /** All unordered value pairs within each key group, with every
    * materialized array bounded by `cap` elements (cross-chunk rows carry
    * two arrays ≤ cap).
    *
    * Shape: values are chunked by a per-group `row_number` (sort-based, so
    * a hot group spills instead of buffering), each chunk's sorted list is
    * collected ONCE, and every chunk row then fans out in-row to the pair
    * groups it participates in: the (c, c) "self" group expands the
    * triangular within-chunk pairs, and each (i, j) i<j cross group gets
    * exactly two rows — chunk i as the left list, chunk j as the right —
    * whose in-row cross product is the cross-chunk pairs. Every pair is
    * emitted exactly once, and because chunks are value-ordered, `a < b`
    * holds without a filter. The whole expansion reads the upstream
    * pipeline ONCE (no self-join — the q26/q28 round-2 lesson); total work
    * stays Σ|bucket|² like the self-join shape, but spread across
    * O(|bucket|²/cap²) bounded rows, with the role fan-out duplicating each
    * chunk row only |bucket|/cap times.
    *
    * PRECONDITION: `rows` must carry `keys` plus a `valueCol` whose values
    * are DISTINCT within each key group — duplicates would silently emit
    * wrong/duplicate pairs (every in-repo caller satisfies this: q28/q44/
    * q45 posting lists are built per-doc distinct, q31's values are the
    * distinct doc_ids themselves). New callers enable `validate` (default:
    * `-Dgraft.validate=true`) to turn a violation into a raise instead;
    * the check is a window count over (keys, value) — one extra shuffle,
    * so it is opt-in, not an always-on cost. With cnt ≤ cap per group, the
    * plan degenerates to exactly the single-collect round-3 shape plus the
    * counting window.
    *
    * Output: `keys` + (`a`, `b`) value pairs.
    */
  def boundedPairs(
      rows: DataFrame, keys: Seq[String], valueCol: String,
      cap: Int = hotBucketCap,
      validate: Boolean = java.lang.Boolean.getBoolean("graft.validate")): DataFrame = {
    import rows.sparkSession.implicits._
    val kcols = keys.map(col)
    val checked = if (!validate) rows else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((keys.map(col) :+ col(valueCol)): _*)
      rows
        .withColumn("_dupcnt", count(lit(1)).over(w))
        .withColumn(valueCol,
          when($"_dupcnt" > 1, raise_error(concat(
            lit("boundedPairs precondition violated: duplicate value within key group: "),
            col(valueCol).cast("string"))))
            .otherwise(col(valueCol)))
        .drop("_dupcnt")
    }
    val lists = chunkedPostingLists(checked, keys, valueCol, cap)
    val emptyRoles = array().cast("array<struct<lo:int,hi:int,isL:boolean>>")
    val selfRole =
      array(struct($"_chunk".as("lo"), $"_chunk".as("hi"), lit(true).as("isL")))
    val leftRoles = when($"_chunk" < $"_nch" - 1,
      transform(sequence(($"_chunk" + 1).cast("int"), ($"_nch" - 1).cast("int")),
        j => struct($"_chunk".as("lo"), j.cast("int").as("hi"), lit(true).as("isL"))))
      .otherwise(emptyRoles)
    val rightRoles = when($"_chunk" > 0,
      transform(sequence(lit(0), ($"_chunk" - 1).cast("int")),
        i => struct(i.cast("int").as("lo"), $"_chunk".as("hi"), lit(false).as("isL"))))
      .otherwise(emptyRoles)
    val roles = lists.select(
      (kcols :+ $"_vs" :+ explode(concat(selfRole, leftRoles, rightRoles)).as("_r")): _*)
    val grouped = roles
      .groupBy((kcols :+ $"_r.lo".as("_lo") :+ $"_r.hi".as("_hi")): _*)
      .agg(max(when($"_r.isL", $"_vs")).as("_lvs"),
        max(when(!$"_r.isL", $"_vs")).as("_rvs"))
    grouped
      .select((kcols :+ $"_lo" :+ $"_hi" :+ $"_lvs" :+ $"_rvs" :+
        posexplode($"_lvs").as(Seq("_i", "a"))): _*)
      .select((kcols :+ $"a" :+ explode(
        when($"_lo" === $"_hi", slice($"_lvs", $"_i" + lit(2), size($"_lvs")))
          .otherwise($"_rvs")).as("b")): _*)
  }

  /** The chunk stage of [[boundedPairs]], exposed for the bound assertion
    * in its spec: per (keys, `_chunk`) one sorted value list `_vs` of AT
    * MOST `cap` elements (row_number chunking is sort-based, so a hot
    * group spills to disk instead of buffering one giant aggregation row),
    * plus `_nch` = the group's total chunk count. Groups with fewer than 2
    * values are dropped (no pairs to emit).
    */
  private[graft] def chunkedPostingLists(
      rows: DataFrame, keys: Seq[String], valueCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import rows.sparkSession.implicits._
    val kcols = keys.map(col)
    val wOrd = Window.partitionBy(kcols: _*).orderBy(col(valueCol))
    val wKeys = Window.partitionBy(kcols: _*)
    // one full-data pass: the row_number window and the (keys, _chunk)
    // aggregate share the window's hash(keys) exchange (partitioning by a
    // subset satisfies the aggregate's clustering), so chunking costs one
    // shuffle + one sort; `_nch` and the singleton filter run over the
    // already-collapsed list rows, not the full data
    rows
      .withColumn("_chunk", ((row_number().over(wOrd) - 1) / cap).cast("int"))
      .groupBy((kcols :+ $"_chunk"): _*)
      .agg(sort_array(collect_list(col(valueCol))).as("_vs"))
      .withColumn("_nch", (max($"_chunk").over(wKeys) + 1).cast("int"))
      .filter($"_nch" > 1 || size($"_vs") >= 2)
  }

  /** Exact dedup via content fingerprint: survivor = min doc_id per
    * fingerprint, plus the cluster size (hash-groupBy dedup — the shuffle
    * carries one row per distinct fingerprint after map-side combine).
    */
  def q25ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", TextOps.fingerprintExpr($"text").as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("survivor_doc_id"), count(lit(1)).as("cluster_size"))
      .select($"survivor_doc_id", $"cluster_size")
      .transform(Relational.presentRanged(_, $"survivor_doc_id"))
  }

  /** Passage-level exact dedup (the CCNet/C4 "line dedup" move
    * re-expressed for token streams — cf. chess-pipeline has no analogue;
    * this is part of the LLM-corpus extension family): each document is
    * cut into consecutive 16-token passages (ragged tail kept as its own
    * passage), every passage is fingerprinted, only the globally-FIRST
    * occurrence of each fingerprint survives (order = (doc_id,
    * passage_idx)), and each document is rebuilt from its surviving
    * passages. Output: per document, the passage count, the survivor
    * count, and the deduplicated text.
    *
    * Scale shape: the passage explode is map-side (~tokens/16 rows/doc);
    * first-occurrence is a groupBy(fp) min — map-side combine collapses a
    * boilerplate passage that occurs a million times to one row per map
    * partition BEFORE the shuffle, where a window over fp would drag the
    * entire million-row group into one task (the q53/q60 Zipf lesson);
    * the keep test joins back on fp (same shuffle key → co-partitioned,
    * no extra exchange); the rebuild is a groupBy(doc_id) with an
    * in-group sort_array, not a window. First-occurrence order is the
    * (doc_id, passage_idx) struct (exact at any document length); the
    * oracle compares the same order as a HUGEINT doc_id·2^64 + pidx key.
    */
  /** doc_id × (pidx, ptext, fp) 16-token passage explode — the in-row,
    * stateless front half of q72, shared with the streaming twin
    * [[graft.streaming.EventStream.passageDedupStream]].
    */
  def passages(docs: DataFrame): DataFrame = passagesKeeping(docs, Nil)

  /** [[passages]] with extra columns carried through the explode — the
    * watermarked streaming gate needs the ingest-time column to survive
    * to its aggregation so state can be watermark-evicted.
    */
  private[graft] def passagesKeeping(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val P = PassageTokens
    val toks = split(col("text"), " ")
    val nP = floor((size(toks) + lit(P - 1)) / lit(P)).cast("int")
    docs.select((col("doc_id") +: carry.map(col)) :+
        posexplode(transform(sequence(lit(0), nP - 1),
          i => concat_ws(" ", slice(toks, i * P + 1, lit(P))))).as(Seq("pidx", "ptext")): _*)
      .withColumn("fp", md5(col("ptext")))
  }

  def q72PassageDedup(spark: SparkSession, dir: String): DataFrame =
    passageDedupCached(spark, dir)

  /** [[passageDedupFrame]] over the RAW corpus as a cached frame (the
    * cleaned-corpus stage every downstream consumer reuses): built once
    * per dataset state, served to q72 directly and to the q74 pipeline's
    * rebuild join — re-deriving the fingerprint aggregate per query paid
    * the full passage explode + min_by exchange every run. The rows are
    * |docs|-grain (doc_id, n_passages, n_kept, clean_text).
    */
  private[operators] def passageDedupCached(spark: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.frameCached(spark, "passage_dedup_frame", 1,
      Seq(s"$dir/documents.parquet")) {
      passageDedupFrame(Tables.spreadBy(Tables.documents(spark, dir), "doc_id"))
    }

  /** The q72 engine over any (doc_id, text, ...) frame — also a stage of
    * the [[TrainPrep.q74CorpusPipelineV2]] composition.
    *
    * Single-pass algebra: the survivor per fingerprint is `min_by` over
    * the passage stream — ONE instantiation of the explode (an
    * aggregate-then-rejoin on fp would re-run the scan+explode for the
    * probe side; identical-subtree exchange reuse cannot save it because
    * the two branches differ below the exchange). The per-document
    * passage count never needs the explode at all — it is
    * ceil(tokens/16) computed scan-side — so the left join back to
    * documents is the only second read, and it reads no exploded rows.
    */
  def passageDedupFrame(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // first-occurrence order is the (doc_id, pidx) struct itself
    // (lexicographic, exact at ANY document length — an arithmetic
    // doc_id*K + pidx key silently corrupts order past K passages);
    // the oracle replays it as a HUGEINT doc_id*2^64 + pidx key
    val kept = Dedup.passages(docs)
      .groupBy($"fp")
      .agg(min_by(struct($"doc_id", $"pidx", $"ptext"),
        struct($"doc_id", $"pidx")).as("first"))
      .select($"first.doc_id".as("doc_id"), $"first.pidx".as("pidx"),
        $"first.ptext".as("ptext"))
    val perDoc = kept.groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct($"pidx", $"ptext"))),
          s => s.getField("ptext"))).as("clean_text"))
    docs
      .select($"doc_id",
        floor((size(split($"text", " ")) + lit(PassageTokens - 1)) / lit(PassageTokens))
          .cast("long").as("n_passages"))
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_passages",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  /** q76 — incremental passage-dedup gate (the daily-ingest twin of q72,
    * the same pattern as the q64 band gate): new documents are admitted
    * by how much of their content already exists PASSAGE-wise in the
    * reference corpus — a doc that is half boilerplate-by-passage is held
    * back even when its whole-document fingerprint is novel. Index side =
    * `doc_id % 3 != 0`, batch side = `% 3 == 0` (the q64 split
    * convention, so the oracle replays it).
    */
  def q76PassageGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
    // build-once/probe-many: the distinct-fingerprint index persists via
    // ArtifactStore (single long column — exact round trip), so steady
    // state fingerprints only the batch side.
    val index = graft.ArtifactStore.cached(spark, "passage_index", 1,
      Seq(s"$dir/documents.parquet")) {
      buildPassageIndex(docs.filter($"doc_id" % 3 =!= 0))
    }
    gatePassages(index, docs.filter($"doc_id" % 3 === 0))
  }

  /** q77 — duplicate-substring profile (the exact-substring dedup
    * diagnostic of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", expressed over token windows): every
    * OVERLAPPING 16-token window of every document is fingerprinted, a
    * window is duplicated when it appears in MORE THAN ONE document, and
    * each document reports its window count, duplicated-window count,
    * and duplicated fraction. Where q72's disjoint passages cut on fixed
    * boundaries (and so miss shifted copies), the overlapping windows
    * catch a duplicated span at ANY alignment — the detection half of
    * suffix-array ExactSubstr; [[q78ExactSubstrRewrite]] is the
    * cut/rewrite half that consumes the same window stream.
    *
    * Plan shape: windows collapse to (fp, doc_id, w_in_doc) in ONE
    * map-side-combining aggregation whose result is a MATERIALIZED,
    * fp-partitioned corpus index (frameCached — see the body comment
    * for why subtree reuse alone cannot keep the explode single); the
    * per-fp document count and the join back both ride the cached
    * partitions. Rows are ~1 per token (linear); the fp shuffle is
    * high-cardinality and uniform, keyed on two longs.
    */
  def q77DupSubstrings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // The collapsed (fp, doc) window table IS an index over a
    // slowly-changing corpus — built once per dataset (frameCached) and
    // probed by every consumer. Without the cache, the per-fp doc count
    // and the join-back read two column-pruned COPIES of the same
    // subtree (one keeps w_in_doc, one doesn't), the pruning difference
    // defeats exchange reuse, and the explode+md5 scan — the dominant
    // cost — runs TWICE (measured: 2 × ~45 task-cpu-s at sf1p). The
    // build keeps the map-side combine (documents repeat windows
    // internally — a bare repartition of raw windows shipped severalfold
    // more rows and measured slower), then lands the collapsed rows
    // hash(fp1, fp2)-partitioned, so the doc-count aggregate and the
    // join both ride the cache with zero further fp exchanges.
    val dw = graft.ArtifactStore.frameCached(spark, "substr_window_index", 1,
      Seq(s"$dir/documents.parquet")) {
      substrWindows(docs)
        .groupBy($"fp1", $"fp2", $"doc_id")
        .agg(count(lit(1)).as("w_in_doc"))
        .repartition($"fp1", $"fp2")
    }
    val fps = dw.groupBy($"fp1", $"fp2").agg(count(lit(1)).as("n_docs"))
    // shuffle_hash, not merge: the cache is hash-partitioned but not
    // sorted, so a merge join would add two in-partition sorts; the
    // hash build is the per-partition fps slice
    val perDoc = dw.join(fps.hint("shuffle_hash"), Seq("fp1", "fp2"))
      .groupBy($"doc_id")
      .agg(sum($"w_in_doc").as("n_windows"),
        sum(when($"n_docs" > 1, $"w_in_doc").otherwise(0L)).as("n_dup_windows"))
    docs.select($"doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_windows", lit(0L)).as("n_windows"),
        coalesce($"n_dup_windows", lit(0L)).as("n_dup_windows"),
        when(coalesce($"n_windows", lit(0L)) === 0, lit(0.0))
          .otherwise(round($"n_dup_windows".cast("double") / $"n_windows", 6))
          .as("dup_fraction"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** The overlapping [[PassageTokens]]-token window stream (doc_id, widx,
    * fp) — the shared front half of q77 (profile) and q78 (cut/rewrite).
    *
    * Two-stage explode bounds per-row memory: one row per 1024-window
    * CHUNK first, then the (widx, hash) structs within a chunk — a single
    * 10M-token document would otherwise materialize its ~10M 32-char
    * hashes as ONE in-row array (gigabytes) before posexplode could
    * stream it.
    */
  private[graft] def substrWindows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val W = PassageTokens
    val toks = split($"text", " ")
    val nW = (size(toks) - lit(W - 1)).cast("int")
    // one codegen'd Generate over the window-index range, fingerprints as
    // a TOP-LEVEL projection: the former spelling built per-chunk struct
    // arrays through an interpreted transform lambda (measured 124
    // task-cpu-s at sf1p — 8 µs per window, mostly lambda machinery);
    // this emits the identical md5 stream inside whole-stage codegen,
    // where Generate streams rows to the projection without copying the
    // parent token array per window.
    //
    // The fingerprint is TWO LONGS (120 bits of the window md5, parsed
    // once at the scan), not the 32-char hex string: every downstream
    // aggregation and join keys on 16 fixed bytes instead of a 45-byte
    // UTF8 string — the fp exchanges carry ~3× fewer bytes and the
    // hash-agg probes compare longs (measured: the string spelling spent
    // 46 task-cpu-s at sf1p on the two fp-keyed exchanges alone). 120
    // bits keeps the false-duplicate probability negligible at 100 TB
    // window counts, where a single 60-bit half would collide; DuckDB
    // replays the identical parse with CAST(('0x' || substring) AS
    // BIGINT), so both engines see the same keys.
    val m = md5(concat_ws(" ", slice($"t", $"widx" + lit(1), lit(W))))
    docs
      .select($"doc_id", toks.as("t"), nW.as("nw"))
      .select($"doc_id", $"t",
        explode(when($"nw" > 0, sequence(lit(0), $"nw" - 1))
          .otherwise(array().cast("array<int>"))).as("widx"))
      .select($"doc_id", $"widx",
        conv(substring(m, 1, 15), 16, 10).cast("long").as("fp1"),
        conv(substring(m, 17, 15), 16, 10).cast("long").as("fp2"))
  }

  def q78ExactSubstrRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // the per-fingerprint FIRST OCCURRENCE table is the ExactSubstr
    // index over a slowly-changing corpus: built once per dataset (one
    // explode+md5 pass + one fp-keyed exchange — the dominant cost),
    // probed by every rewrite run. Two narrow columns, exact longs/ints
    // — steady state pays a cache scan + the doc_id-keyed span
    // assembly, never the window fingerprinting.
    val firsts = graft.ArtifactStore.frameCached(spark, "substr_first_window",
      1, Seq(s"$dir/documents.parquet")) {
      substrWindows(docs)
        .groupBy($"fp1", $"fp2")
        .agg(min(struct($"doc_id", $"widx")).as("first"))
        .select($"first.doc_id".as("doc_id"), $"first.widx".as("widx"))
    }
    exactSubstrRewriteFromFirsts(docs, firsts)
  }

  /** q78 — ExactSubstr cut/rewrite (the deliverable half of Lee et al.
    * 2022's exact-substring dedup, composed from q77's detection): every
    * overlapping [[PassageTokens]]-token window is fingerprinted, only
    * the globally-FIRST occurrence of each fingerprint survives (order =
    * (doc_id, widx), the q72 convention), surviving windows of a
    * document merge into maximal contiguous spans, and the document is
    * re-emitted as the concatenation of its span texts. A duplicated
    * run is cut at ANY alignment — the shifted-copy case q72's fixed
    * passage boundaries structurally miss — while the unique text
    * around it survives via the straddling windows (which contain novel
    * context and therefore fingerprint as unique). Documents shorter
    * than one window carry no duplication evidence at this granularity
    * and pass through whole.
    *
    * Scale shape: the window stream is ~1 row per token (linear); the
    * first-occurrence survivor is a groupBy(fp) min — NO window over
    * the content-derived fp key (the q53/q60 lesson) — and the kept
    * windows ARE those per-fp minima, so there is no probe join back to
    * the window stream: the explode is evaluated ONCE (where a
    * keep-flag join would re-run the scan+explode for the probe side —
    * the q72 single-instantiation argument). Span merging is an in-row
    * fold over each document's sorted survivor starts (row size ~ the
    * document itself, which the rebuild row carries anyway); the
    * rebuild join is doc_id-keyed.
    */
  def exactSubstrRewriteFrame(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    exactSubstrRewriteFromFirsts(docs,
      substrWindows(docs)
        .groupBy($"fp1", $"fp2")
        .agg(min(struct($"doc_id", $"widx")).as("first"))
        .select($"first.doc_id".as("doc_id"), $"first.widx".as("widx")))
  }

  /** The rewrite half of q78 given the (doc_id, widx) first-occurrence
    * survivor table (inline for the generic frame entry, cached via
    * ArtifactStore for the q78 query).
    */
  private def exactSubstrRewriteFromFirsts(docs: DataFrame,
      firsts: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val W = PassageTokens
    // survivors → per-doc sorted starts → maximal contiguous spans
    // ([s, s+W-1] windows merge when the next start is <= hi+1): an
    // in-row fold, not a window — span state never leaves the row
    val spans = firsts
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"widx")).as("starts"))
      .withColumn("spans", expr(
        s"""aggregate(
           |  starts,
           |  cast(array() as array<struct<lo:int,hi:int>>),
           |  (acc, s) -> CASE
           |    WHEN size(acc) > 0 AND s <= element_at(acc, -1).hi + 1
           |    THEN concat(slice(acc, 1, size(acc) - 1),
           |      array(named_struct('lo', element_at(acc, -1).lo, 'hi', s + ${W - 1})))
           |    ELSE concat(acc, array(named_struct('lo', s, 'hi', s + ${W - 1})))
           |  END)""".stripMargin))
      .select($"doc_id", $"spans")
    docs
      .select($"doc_id", split($"text", " ").as("toks"),
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        when($"n_tokens" < W, $"n_tokens")
          .otherwise(coalesce(
            expr("aggregate(spans, 0L, (a, sp) -> a + sp.hi - sp.lo + 1)"),
            lit(0L))).as("n_kept_tokens"),
        when($"n_tokens" < W, lit(1L))
          .otherwise(coalesce(size($"spans").cast("long"), lit(0L))).as("n_spans"),
        when($"n_tokens" < W, concat_ws(" ", $"toks"))
          .otherwise(coalesce(
            expr("concat_ws(' ', transform(spans, sp -> concat_ws(' ', slice(toks, sp.lo + 1, sp.hi - sp.lo + 1))))"),
            lit(""))).as("clean_text"))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** BUILD-ONCE passage-fingerprint index: the distinct 16-token passage
    * fingerprints of a reference corpus as one narrow column — the
    * at-rest artifact an incremental pipeline persists and probes daily
    * (J7 anti-join pattern; [[buildBandIndex]] is the near-dup sibling).
    */
  def buildPassageIndex(docs: DataFrame): DataFrame =
    passages(docs).select(col("fp")).distinct()

  /** PROBE: per batch document, its passage count, how many of those
    * passages already exist in the index, and the admission verdict
    * (duplicated fraction < 0.5). Every batch doc gets a verdict — any
    * text yields at least one passage, so there is no signature-less
    * case here (contrast [[gateAgainst]]'s <3-token band gap).
    */
  def gatePassages(index: DataFrame, batch: DataFrame): DataFrame =
    gatePassagesCore(index, batch).transform(Relational.presentRanged(_, col("doc_id")))

  /** The un-ordered gate core, shared VERBATIM by the batch q76 and the
    * streaming twin [[graft.streaming.EventStream.passageGateStream]]
    * (a streaming plan cannot global-sort; the batch wrapper adds the
    * orderBy) — one definition of the hit semantics and the admission
    * threshold, so the two surfaces cannot drift. The index is
    * re-distinct'ed defensively: unioned nightly index writes with a
    * repeated fingerprint would otherwise emit one joined row per
    * duplicate, double-counting BOTH n_passages and n_dup_passages and
    * flipping verdicts.
    */
  private[graft] def gatePassagesCore(index: DataFrame, batch: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    import batch.sparkSession.implicits._
    passagesKeeping(batch, carry)
      .join(index.select($"fp").distinct().withColumn("hit", lit(1L)), Seq("fp"), "left")
      .groupBy(($"doc_id" +: carry.map(col)): _*)
      .agg(count(lit(1)).as("n_passages"),
        sum(coalesce($"hit", lit(0L))).as("n_dup_passages"))
      .select($"doc_id", $"n_passages", $"n_dup_passages",
        (($"n_dup_passages".cast("double") / $"n_passages") < 0.5).as("admitted"))
  }

  /** N-gram Jaccard near-dup pairs, blocked by (lang, source): inverted
    * index on shingle → pair intersection counts → |∩| / (|A|+|B|−|∩|).
    * The block keys bound the candidate set; the shingle join shuffles on
    * the shingle string (high cardinality).
    */
  def q26ShingleJaccard(spark: SparkSession, dir: String): DataFrame =
    shingleJaccardPairs(spark, dir, minJaccard = 0.5, maxDf = None)

  /** q26's engine with the scale knobs explicit.
    *
    * @param maxDf optional stop-shingle cap: shingles appearing in more
    *   than this many documents of a (lang, source) block are dropped from
    *   BOTH the inverted index and each document's shingle count before
    *   pairing — the standard stop-word move for a 100 TB corpus where one
    *   boilerplate 3-gram ("all rights reserved") would otherwise pair
    *   every page with every other. Changes semantics (Jaccard is then over
    *   the sub-cap shingle sets), so the oracled q26 leaves it None.
    */
  def shingleJaccardPairs(
      spark: SparkSession, dir: String, minJaccard: Double,
      maxDf: Option[Int]): DataFrame = {
    import spark.implicits._
    // per-doc DISTINCT shingle hashes and their count are computed IN-ROW
    // by the native shingle_hashes expression — the round-3 pipeline paid
    // four full-data wide operators (explode + two lead() windows,
    // distinct, per-doc count window) for the same values. Joining on the
    // 60-bit hash keeps fixed-width shuffle keys, and the oracle applies
    // the same hash so any (vanishingly unlikely) collision changes both
    // sides identically. n_sh = |distinct shingle hashes| per doc.
    // explode_outer, NOT explode (r17, guide §1.2/§4.4 duplication): a
    // non-outer explode lets InferFiltersFromGenerate add
    // `size(shs) > 0 AND isnotnull(shs)`, and filter pushdown substitutes
    // the shingle_hashes expression through the projection — the whole
    // shingle+md5 pass re-ran per row inside the SCAN stage (single-task
    // for a one-file parquet, BEFORE the parallelizing exchange) and then
    // again in the projection. Outer generates are exempt from the
    // inference; <3-token docs yield an empty array → one null sh_h row,
    // dropped by the post-generate filter (which cannot push below it).
    val hashed = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
      .select($"doc_id", $"lang", $"source",
        graft.functions.ShingleFunctions.shingleHashes(split($"text", " ")).as("shs"))
      .select($"doc_id", $"lang", $"source", size($"shs").as("n_sh"),
        explode_outer($"shs").as("sh_h"))
      .filter($"sh_h".isNotNull)
    val inv = maxDf match {
      case Some(cap) =>
        // stop-shingle df filter ALSO shrinks each doc's shingle set, so
        // n_sh must be recounted over the survivors
        hashed.withColumn("_df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang", $"source", $"sh_h")))
          .filter($"_df" <= cap).drop("_df", "n_sh")
          .withColumn("n_sh", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      case None => hashed
    }
    // one pass: bucket the inverted index by (block, shingle hash) and
    // expand co-occurrence pairs in-row from sorted posting lists, chunked
    // to hotBucketCap elements per row — the round-1 self-join evaluated
    // the whole shingle pipeline once per join side, and the round-3
    // unchunked collect_list made a hot shingle one giant array row.
    boundedPairs(
      inv.select($"lang", $"source", $"sh_h", struct($"doc_id", $"n_sh").as("v")),
      Seq("lang", "source", "sh_h"), "v")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n_sh".as("n_a"), $"b.n_sh".as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round($"inter".cast("double") / ($"n_a" + $"n_b" - $"inter"), 6))
      .filter($"jaccard" >= minJaccard)
      .select($"doc_a", $"doc_b", $"jaccard")
      .transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  /** MinHash signatures: 8 permutations h_i(s) = (a_i·(g(s) mod P) + b_i)
    * mod P minimized over the document's shingles. One row per doc, fixed
    * signature columns — the LSH-ready sketch.
    */
  def q27MinhashSig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the whole signature is ONE in-row native expression per document
    // (shingle hashing + all 8 permutation minima in a single pass; the
    // multiset minimum equals the distinct-set minimum) — zero shuffles,
    // where the round-3 shape exploded every shingle through a groupBy.
    // Docs with <3 words have no shingles and drop, as the explode did.
    minhashSigRaw(spark, dir).transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** [[q27MinhashSig]] without the presentation sort (band construction
    * doesn't need it).
    */
  private[operators] def minhashSigRaw(spark: SparkSession, dir: String): DataFrame =
    sigRows(Tables.spread(Tables.documents(spark, dir))) // parallelism restore, gated

  /** MinHash signature columns (h0..h7) for any (doc_id, text, ...) frame
    * — batch or streaming (the signature is one in-row native expression,
    * so it is streaming-safe by construction). Docs with <3 words have no
    * shingles and drop.
    */
  private[graft] def sigRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val sig = graft.functions.ShingleFunctions.minhashSig(split($"text", " "))
    docs
      // signature-less docs drop on the CHEAP token-count predicate, which
      // is exactly minhash_sig's null condition (Shingles.scala: <3 tokens
      // → null). Filtering on sig.isNotNull instead let the optimizer push
      // isnotnull(minhash_sig(text)) into the parquet scan, where it
      // re-ran the whole shingle+minhash pass per row BEFORE the
      // projection ran it again — the round-6 q64 1.02→1.25 s regression
      // (the scan's Condition in the formatted plan showed it verbatim).
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", sig.as("sig"))
      .select($"doc_id" +: (0 until 8).map(i => $"sig" (i).as(s"h$i")): _*)
  }

  /** LSH band membership rows (doc_id, band, r0, r1) from signature rows —
    * the in-row posexplode shared by batch and streaming band pipelines.
    */
  private[graft] def bandRowsFromSigs(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    val bandStructs = (0 until 4).map { bnd =>
      struct(col(s"h${2 * bnd}").as("r0"), col(s"h${2 * bnd + 1}").as("r1"))
    }
    sigs
      .select($"doc_id", posexplode(array(bandStructs: _*)).as(Seq("band", "b")))
      .select($"doc_id", $"band", $"b.r0".as("r0"), $"b.r1".as("r1"))
  }

  /** LSH band membership rows (doc_id, band, r0, r1): 4 bands × 2 rows via
    * ONE posexplode over an in-row struct array — a 4-way union of selects
    * from the signature table re-instantiates the whole signature pipeline
    * once per branch (PlanSpec counts the instances). Shared by the q28
    * pair expansion and the q48 membership-graph clustering.
    */
  /** Dev-profiling alias for [[minhashBands]] (Prof lives outside this
    * package).
    */
  private[graft] def probeBands(spark: SparkSession, dir: String): DataFrame =
    minhashBands(spark, dir)

  private[operators] def minhashBands(spark: SparkSession, dir: String): DataFrame =
    bandRowsFromSigs(minhashSigRaw(spark, dir))

  /** MinHash LSH candidate pairs: 4 bands × 2 rows over the 8-long
    * signature; docs sharing any full band become candidates. Output is
    * the distinct candidate pair set — the input to a verify pass.
    */
  def q28MinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // bucket docs by full band value and expand pairs WITHIN each bucket:
    // the signature pipeline (the expensive md5 shingle pass) runs ONCE —
    // the round-1 band self-join evaluated it twice, once per join side.
    // LSH buckets are small by construction (and a pathologically hot one
    // is chunked to bounded rows by boundedPairs); the value-ordered
    // chunks guarantee doc_a < doc_b without a filter.
    lshCandidatePairs(spark, dir).transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  /** SimHash over tokens at any width: bit j of the sketch is the sign of
    * the sum over tokens of ±1 according to bit j of the token hash.
    *
    * One in-row pass via the native [[graft.functions.SimHash]] expression —
    * |docs| rows in, |docs| rows out, zero shuffles (the round-3 shape
    * exploded every token through a wide groupBy; integer counters make the
    * two formulations exactly equal, so the oracle SQL is untouched).
    */
  def simhashSketch(spark: SparkSession, dir: String, bits: Int): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
      .select($"doc_id",
        graft.functions.SimHash.simhash(split($"text", " "), bits).as("simhash"))
  }

  /** 16-bit SimHash (the compact sketch the reference-era q29 contract
    * pins; [[q44SimhashPairs]] uses a wider one for pairing).
    */
  def q29Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashSketch(spark, dir, 16).transform(Relational.presentRanged(_, col("doc_id")))

  /** SimHash near-dup pairs: Hamming distance ≤ 3 on 32-bit sketches.
    * Candidate generation blocks on the four bytes of the sketch — by
    * pigeonhole, ≤3 differing bits leave at least one byte intact, so
    * band blocking has FULL recall at this radius. Pairs expand in-row
    * from sorted per-(band, byte) posting lists carrying both sketches
    * (one sketch pass, no self-join — the q26/q28 shape), then the exact
    * `bit_count(xor)` verify.
    *
    * 32 bits rather than q29's 16: a 16-bit sketch at 5k docs floods the
    * nibble buckets (measured 7s at sf0.1); byte bands over 32 bits cut
    * candidates by orders of magnitude with the identical plan shape — a
    * 100 TB deployment widens to 64 bits the same way.
    */
  def q44SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sk = simhashSketch(spark, dir, 32)
    val nibbles = (0 until 4).map { b =>
      struct(lit(b).as("band"), shiftright($"simhash", 8 * b).bitwiseAND(255).as("key"))
    }
    boundedPairs(
      sk.select($"doc_id", $"simhash", explode(array(nibbles: _*)).as("bk"))
        .select($"bk.band".as("band"), $"bk.key".as("key"),
          struct($"doc_id", $"simhash").as("v")),
      Seq("band", "key"), "v")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .filter($"hamming" <= 3)
      .distinct()
      .transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  /** One frontier step of min-label propagation: nodes whose label just
    * dropped push it to their neighbors; a node adopts the smallest
    * incoming candidate if it beats the current label. Returns the new
    * label table and the new frontier (nodes that changed).
    *
    * Exposed for the PlanSpec scale assertion: the only data shuffled per
    * iteration are the narrow (node, label) frontier messages and the
    * label table — `sym` is read from its hash-partitioned cache, never
    * re-shuffled and never recomputed from the pair pipeline.
    */
  private[operators] def ccStep(
      sym: DataFrame, labels: DataFrame, frontier: DataFrame): DataFrame = {
    import sym.sparkSession.implicits._
    val msgs = sym.join(frontier.withColumnRenamed("node", "u")
        .withColumnRenamed("label", "flabel"), Seq("u"))
      .groupBy($"v".as("node")).agg(min($"flabel").as("cand"))
    labels.join(msgs, Seq("node"), "left")
      .select($"node",
        least($"label", coalesce($"cand", $"label")).as("label"),
        coalesce($"cand" < $"label", lit(false)).as("_moved"))
  }

  /** Connected components of an undirected edge list (columns `u`, `v`)
    * via frontier min-label propagation to a fixpoint — the DataFrame-only
    * formulation (no GraphX): converges in O(component diameter)
    * iterations, and after the first one only the frontier (nodes whose
    * label changed) emits messages, so late iterations shuffle a
    * vanishing fraction of the graph. The symmetrized edge list is
    * repartitioned by source ONCE and cached — every iteration's message
    * join reuses that partitioning instead of re-shuffling the edges.
    * Output: (node, label) with label = min node id of the component, for
    * nodes that appear in at least one edge.
    *
    * Every iteration's label table is eagerly localCheckpoint'ed
    * (disk-backed blocks): without lineage truncation, iteration N's
    * logical plan nests all N−1 predecessors and Catalyst analysis time
    * explodes combinatorially — the standard iterative-DataFrame trap. A
    * cluster deployment would use a reliable checkpoint directory for
    * fault tolerance; the per-iteration truncation is the same.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    import org.apache.spark.storage.StorageLevel
    val sym = edges.select($"u", $"v")
      .union(edges.select($"v".as("u"), $"u".as("v")))
      .repartition($"u")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select($"u".as("node")).distinct()
      .withColumn("label", $"node")
      .localCheckpoint(true)
    var frontier = labels
    var frontierSize = frontier.count()
    while (frontierSize > 0) {
      val step = ccStep(sym, labels, frontier).localCheckpoint(true)
      frontierSize = step.filter($"_moved").count()
      if (java.lang.Boolean.getBoolean("graft.cc.log"))
        println(s"[cc] edge round: moved=$frontierSize")
      labels = step.select($"node", $"label")
      frontier = step.filter($"_moved").select($"node", $"label")
    }
    sym.unpersist()
    labels
  }

  /** Connected components over a bipartite membership list (node ∈ bucket)
    * WITHOUT materializing the pair graph: nodes sharing a bucket are
    * connected, exactly the LSH candidate-pair semantics, but each
    * iteration's messages are the Σk bucket memberships rather than the
    * Σk² expanded pairs — for a hot bucket (the 100 TB boilerplate case,
    * k in the millions) that is the difference between a linear shuffle
    * and an impossible quadratic one. Alternating min-label rounds: changed
    * nodes push labels into their buckets (min per bucket), every member of
    * a touched bucket pulls the bucket minimum; a node's label only ever
    * decreases, and an untouched bucket's minimum was already offered to
    * all its members, so the frontier restriction loses nothing. Converges
    * in O(component diameter in bucket-hops) iterations, same as the edge
    * formulation.
    *
    * Two narrow copies of the (≥2-member) membership list are cached, one
    * hash-partitioned by node for the push join, one by bucket for the pull
    * join — every iteration reuses those partitionings instead of
    * re-shuffling the memberships. Size-1 buckets carry no connectivity and
    * are dropped up front by the same per-bucket aggregate that seeds round
    * 1 (see the body comment). Labels are localCheckpoint'ed per iteration
    * — the same lineage-truncation requirement documented on
    * [[connectedComponents]].
    *
    * Output: (node, label) for every node appearing in a ≥2-member bucket,
    * label = min node id of the component.
    */
  def membershipComponents(
      m: DataFrame, bucketCols: Seq[String], nodeCol: String): DataFrame = {
    import m.sparkSession.implicits._
    import org.apache.spark.storage.StorageLevel
    val bc = bucketCols.map(col)
    // r16: ONE map-side-combining aggregate serves both the ≥2-member
    // filter and the whole FIRST propagation round. Per bucket it yields
    // the member count and the minimum node id `_bm` — exactly the value
    // the former loop's iteration 1 pushed to every member from the
    // identity labels — so the seed `labels` below (per node, min `_bm`
    // over its buckets) IS round 1, computed without the old sizing
    // window (a full sort of the membership), without the identity
    // `distinct` pass, and without round 1's two frontier joins. The
    // loop then continues from round 2 with the frontier = nodes whose
    // seed label differs from their id; the fixpoint (min node id per
    // component) is unchanged — CcProps pins equality against the edge
    // formulation on random bipartite graphs.
    val sc = m.sparkSession.sparkContext
    def labeled[T](desc: String)(body: => T): T = {
      sc.setJobDescription(desc); try body finally sc.setJobDescription(null)
    }
    // r17 (guide §1.2/§2.4): ONE pass of the upstream band pipeline. The
    // r16 shape aggregated `m` into bstats and then joined `m` against it
    // — two full instantiations of the expensive signature pipeline
    // (StageProbe: 9.9 s + 6.5 s cpu of the q48 seed at sf0.1). The
    // narrow (bucket, node) membership rows are now cached ONCE,
    // hash-partitioned by bucket, and everything upstream rides that
    // cache: bstats' groupBy fuses in-stage (same clustering), the sized
    // join is co-partitioned on both sides (zero exchange), and the pull
    // side of every propagation round (`byBucket`) IS the same cache —
    // its extra size-1-bucket rows never match `bmin` (whose keys come
    // from byNode's ≥2-member rows), so the pull join result is
    // unchanged.
    val bands = m
      .select(bc :+ col(nodeCol).as("node"): _*)
      .repartition(bc: _*).persist(StorageLevel.MEMORY_AND_DISK)
    val bstats = bands.groupBy(bc: _*)
      .agg(count(lit(1)).as("_sz"), min($"node").as("_bm"))
      .filter($"_sz" >= 2)
      .select(bc :+ $"_bm": _*)
    // shuffle_hash: both sides are already hash(bc)-partitioned, so the
    // SHJ is exchange-free AND sort-free — the default sort-merge paid
    // two full sorts of the membership table for a join that only asks
    // "is this bucket in the ≥2 set" (the q8Anti rationale); the build
    // side (bstats, one row per ≥2 bucket) is the per-partition hash map
    val sized = bands.join(bstats.hint("shuffle_hash"), bucketCols)
      .select(bc :+ $"node" :+ $"_bm": _*)
    val byNode = sized.repartition($"node").persist(StorageLevel.MEMORY_AND_DISK)
    val byBucket = bands
    var labels = labeled("cc: seed labels (byNode build + round 1)") {
      byNode.groupBy($"node").agg(min($"_bm").as("label"))
        .localCheckpoint(true)
    }
    var frontier = labels.filter($"label" < $"node")
    var moved = labeled("cc: seed frontier count")(frontier.count())
    var round = 2
    while (moved > 0) {
      // (r17 note: shuffle_hash hints on these three co-partitioned loop
      // joins were tried and REVERTED — they split round 2 into two extra
      // build stages and added a 60 KB exchange; wall went 3.0 → 3.8 s.)
      val bmin = byNode.join(frontier, Seq("node"))
        .groupBy(bc: _*).agg(min($"label").as("_bl"))
      val cand = byBucket.join(bmin, bucketCols)
        .groupBy($"node").agg(min($"_bl").as("_cand"))
      val step = labeled(s"cc: round $round propagate") {
        labels.join(cand, Seq("node"), "left")
          .select($"node",
            least($"label", coalesce($"_cand", $"label")).as("label"),
            coalesce($"_cand" < $"label", lit(false)).as("_moved"))
          .localCheckpoint(true)
      }
      moved = labeled(s"cc: round $round moved count")(
        step.filter($"_moved").count())
      if (java.lang.Boolean.getBoolean("graft.cc.log"))
        println(s"[cc] membership round: moved=$moved")
      labels = step.select($"node", $"label")
      frontier = step.filter($"_moved").select($"node", $"label")
      round += 1
    }
    bands.unpersist()
    byNode.unpersist()
    labels
  }

  /** q48 — the dedup pipeline's actual deliverable: every document mapped
    * to its near-dup cluster representative (min doc_id of the connected
    * component of the q28 MinHash-LSH pair graph) plus the cluster size;
    * docs in no candidate pair are their own singleton cluster. Downstream
    * a training run keeps `doc_id == rep_doc_id` rows — the multi-doc
    * generalization of [[q25ExactDedup]]'s survivor contract.
    *
    * Clustering runs on the band MEMBERSHIP graph ([[membershipComponents]]),
    * never expanding candidate pairs at all — the pair graph exists only in
    * the q28 deliverable and the oracle, and the q48 plan's shuffle volume
    * stays linear in the membership count even for a degenerate corpus
    * where one bucket holds half the documents.
    */
  def q48NeardupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cc = membershipComponents(
      minhashBands(spark, dir), Seq("band", "r0", "r1"), "doc_id")
    // cluster_size is a groupBy aggregate joined back, NOT a count-window
    // over rep_doc_id: a degenerate corpus can put half the documents in
    // one component, and a window would materialize that entire component
    // in a single task. The aggregate combines map-side (bounded task
    // input) and the join back is AQE-planned — broadcast for small
    // cluster tables, skew-split shuffle for mega-components. cc is
    // localCheckpoint'ed inside membershipComponents, so the labeled
    // fragment appearing on both sides re-reads cached blocks, not the
    // band pipeline.
    val labeled = Tables.documents(spark, dir)
      .select($"doc_id")
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("rep_doc_id"))
    val sizes = labeled.groupBy($"rep_doc_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled
      .join(sizes, Seq("rep_doc_id"))
      .select($"doc_id", $"rep_doc_id", $"cluster_size")
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** The distinct q28 candidate pair list (doc_a < doc_b), shared by the
    * pair-anchored measurement operators (q61, q66) and q28 itself.
    */
  private def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    boundedPairs(
      minhashBands(spark, dir).select($"band", $"r0", $"r1", $"doc_id"),
      Seq("band", "r0", "r1"), "doc_id")
      .select($"a".as("doc_a"), $"b".as("doc_b"))
      .distinct()
  }

  /** Reunite a per-doc payload on a candidate pair list: the pair list
    * fans out to (pair, doc, side) roles and joins the payload once on
    * doc_id; only matched pair rows cross the one groupBy that brings
    * the sides back together. Output: (doc_a, doc_b, va, vb) with va/vb
    * the payload's non-key columns as structs. Payloads must have
    * exactly one row per doc_id (first(when) would otherwise pick
    * arbitrarily).
    *
    * Join strategy is decided at RUNTIME by AQE on the un-hinted plan:
    * once the pair stages execute, adaptive join selection broadcasts
    * the roles side when its MEASURED size fits the broadcast threshold
    * and otherwise keeps the doc_id shuffle join (skew-split capable) —
    * the only shape that completes when a duplicate-heavy corpus blows
    * the candidate graph past driver memory (SCALE.md measured ~100×
    * pair growth from duplicated content at sf1). Constructing this
    * frame runs NO Spark job: the round-6 size gate localCheckpoint'ed
    * and counted the pairs at plan-construction time, which made merely
    * BUILDING q61/q66 execute the band pipeline (breaking lazy
    * composition — a caller embedding them in a larger plan paid the
    * job even if the branch was later pruned) and pinned the checkpoint
    * in executor memory; AQE's runtime statistics make the same
    * broadcast-or-shuffle call with no up-front action
    * (DedupClusterSpec pins both the laziness and the forced-shuffle
    * fallback's result equality).
    */
  private def reunitePairs(pairs: DataFrame, payload: DataFrame): DataFrame = {
    import payload.sparkSession.implicits._
    val roles = pairs.select($"doc_a", $"doc_b",
      explode(array(
        struct($"doc_a".as("doc_id"), lit(true).as("isA")),
        struct($"doc_b".as("doc_id"), lit(false).as("isA")))).as("r"))
      .select($"doc_a", $"doc_b", $"r.doc_id".as("doc_id"), $"r.isA".as("isA"))
    val v = struct(payload.columns.filterNot(_ == "doc_id").map(col): _*)
    payload
      .withColumn("_v", v)
      .join(roles, Seq("doc_id"))
      .groupBy($"doc_a", $"doc_b")
      .agg(first(when($"isA", $"_v"), ignoreNulls = true).as("va"),
        first(when(!$"isA", $"_v"), ignoreNulls = true).as("vb"))
  }

  /** q61 — shingle CONTAINMENT for the LSH candidate pairs: Jaccard (q26)
    * misses the "short doc pasted inside a long one" case because the
    * union in its denominator is dominated by the long side; containment
    * |A∩B|/|A| and |A∩B|/|B| catches it (the near-dup policy CCNet/Gopher
    * pipelines apply next to plain Jaccard). Candidates are the q28
    * MinHash-LSH pair graph; for each pair the distinct-shingle-hash
    * intersection is computed in-row from the two docs' shingle-set
    * arrays.
    *
    * Plan shape: the per-doc shingle-set array is ONE in-row native
    * expression pass (no explode, no pre-shuffle); the candidate pair
    * list fans out to two (pair, doc, side) roles and joins the pass on
    * doc_id with AQE picking the strategy at runtime ([[reunitePairs]]) —
    * a small pair list broadcasts and the corpus never shuffles, a
    * duplicate-heavy one shuffle-joins instead of blowing the driver.
    * Only matched pair rows (two bounded arrays each) cross the one
    * groupBy exchange that reunites the sides; work is
    * |pairs|·|doc shingles|, never corpus².
    */
  def q61Containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
      .select($"doc_id",
        graft.functions.ShingleFunctions.shingleHashes(split($"text", " ")).as("shs"))
    reunitePairs(lshCandidatePairs(spark, dir), docs)
      .select($"doc_a", $"doc_b",
        size($"va.shs").cast("long").as("n_a"), size($"vb.shs").cast("long").as("n_b"),
        size(array_intersect($"va.shs", $"vb.shs")).cast("long").as("inter"))
      .withColumn("containment_a", round($"inter".cast("double") / $"n_a", 6))
      .withColumn("containment_b", round($"inter".cast("double") / $"n_b", 6))
      .transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  /** q99 — EDIT-DISTANCE verification for the LSH candidate pairs: the
    * third verifier next to Jaccard (q26/q66) and containment (q61).
    * Shingle measures are blind to small in-token edits (a changed word
    * breaks w shingles but moves Jaccard only slightly); character-level
    * Levenshtein over a fixed 120-char prefix catches them, and the
    * prefix cap bounds the O(len²) DP per pair — the production
    * discipline for edit-verify at scale (full-text Levenshtein on two
    * 100 KB documents is 10^10 cells; nobody runs that).
    *
    * Output per candidate pair: raw distance, normalized distance
    * (÷ max prefix length, one IEEE division rounded at 6dp), and the
    * near_dup verdict at 0.3. Plan shape: [[reunitePairs]] (role
    * fan-out, AQE-chosen join), one codegen'd `levenshtein` per pair —
    * work is |pairs|·120², never corpus².
    */
  def q99EditVerify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prefs = Tables.documents(spark, dir)
      .select($"doc_id", substring($"text", 1, 120).as("prefix"))
    reunitePairs(lshCandidatePairs(spark, dir), prefs)
      .select($"doc_a", $"doc_b",
        levenshtein($"va.prefix", $"vb.prefix").cast("long").as("edit_dist"),
        greatest(length($"va.prefix"), length($"vb.prefix")).cast("long").as("max_len"))
      .withColumn("norm_dist", round($"edit_dist".cast("double") / $"max_len", 6))
      .withColumn("near_dup", $"norm_dist" <= 0.3)
      .transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  /** q64 — incremental dedup gate, the batch flavor of
    * [[graft.streaming.EventStream.neardupGate]]: a NEW batch of documents
    * (doc_id ≡ 0 mod 3 stands in for today's crawl) is admitted against
    * the ALREADY-INGESTED reference corpus (the rest) by LSH bucket
    * occupancy — a batch document whose four MinHash band buckets are all
    * unoccupied by the reference cannot be a candidate near-dup of
    * anything ingested (the exact q28 candidate semantics) and is
    * admitted. Output is the per-batch-doc verdict (doc_id, n_hot_bands,
    * admitted) — EVERY batch doc gets a row, including <3-token docs that
    * produce no shingles/bands (they cannot collide and are admitted with
    * 0 hot bands). This is the operator a production pipeline runs daily:
    * dedup the increment against the corpus WITHOUT re-clustering the
    * corpus — composed here from the persistable [[buildBandIndex]] /
    * [[gateAgainst]] pair (the spec round-trips the index through parquet
    * and matches this inline query row-for-row).
    */
  def q64DedupGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
    // build-once/probe-many: the band index persists via ArtifactStore
    // (narrow all-long rows — exact round trip, DedupSpec pins it), so
    // steady-state runs sketch only the BATCH side.
    val index = graft.ArtifactStore.cached(spark, "band_index", 1,
      Seq(s"$dir/documents.parquet")) {
      buildBandIndex(docs.filter($"doc_id" % 3 =!= 0))
    }
    gateAgainst(index, docs.filter($"doc_id" % 3 === 0))
      .transform(Relational.presentRanged(_, $"doc_id"))
  }

  /** BUILD-ONCE band index for the incremental dedup gate: the DISTINCT
    * occupied MinHash band buckets of a reference corpus as narrow
    * fixed-width rows (band, r0, r1). This is the artifact a daily-ingest
    * deployment PERSISTS (plain parquet — spec round-trips it) and
    * refreshes by appending each admitted batch's bands + re-distincting,
    * so the 100 TB corpus is never re-sketched per increment.
    */
  def buildBandIndex(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    bandRowsFromSigs(sigRows(docs)).select($"band", $"r0", $"r1").distinct()
  }

  /** PROBE: admit a batch of (doc_id, text, ...) documents against a
    * prebuilt [[buildBandIndex]] artifact — the q28 candidate semantics
    * (any shared band bucket → possible near-dup → held back). Emits one
    * verdict per batch document INCLUDING signature-less docs (<3 tokens →
    * no shingles, hence no bands): they cannot collide with anything and
    * are admitted with 0 hot bands via the left join from the batch doc
    * list.
    *
    * Scale shape: the batch sketches in-row (zero shuffles), equi-joins
    * the index on the fixed-width bucket key, and rolls up per doc —
    * linear in |batch| + |index|, independent of corpus size.
    */
  def gateAgainst(index: DataFrame, batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    val hits = bandRowsFromSigs(sigRows(batch))
      .join(index.select($"band", $"r0", $"r1").withColumn("hot", lit(1L)),
        Seq("band", "r0", "r1"), "left")
      .groupBy($"doc_id")
      .agg(sum(coalesce($"hot", lit(0L))).as("n_hot_bands"))
    batch.select($"doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_hot_bands", lit(0L)).as("n_hot_bands"),
        (coalesce($"n_hot_bands", lit(0L)) === 0).as("admitted"))
  }

  /** q66 — sketch calibration: for every q28 candidate pair, the MinHash
    * Jaccard ESTIMATE (matching signature components / 8) beside the EXACT
    * shingle-set Jaccard and the absolute error. The measurement a sketch
    * deployment owes its users — it answers "how many permutations do we
    * need?" with data instead of the textbook bound, and it flags the
    * drifted-sketch regression (a hash change that silently decorrelates
    * estimate from truth).
    *
    * Plan shape: the q61 [[reunitePairs]] pattern (AQE-decided roles
    * join) with BOTH per-doc sketch artifacts (shingle-hash set + 8-long
    * signature) computed in the SAME single in-row pass; only matched
    * pair rows cross the reuniting groupBy.
    */
  def q66SketchCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = split($"text", " ")
    val payload = Tables.spread(Tables.documents(spark, dir)) // parallelism restore, gated on split count
      .select($"doc_id",
        graft.functions.ShingleFunctions.shingleHashes(w).as("shs"),
        graft.functions.ShingleFunctions.minhashSig(w).as("sig"))
    val matches = (0 until 8)
      .map(i => when($"va.sig" (i) === $"vb.sig" (i), 1).otherwise(0))
      .reduce(_ + _)
    reunitePairs(lshCandidatePairs(spark, dir), payload)
      .select($"doc_a", $"doc_b",
        size(array_intersect($"va.shs", $"vb.shs")).cast("long").as("inter"),
        size($"va.shs").cast("long").as("n_a"), size($"vb.shs").cast("long").as("n_b"),
        (matches.cast("double") / lit(8.0)).as("est_jaccard"))
      .withColumn("jaccard",
        round($"inter".cast("double") / ($"n_a" + $"n_b" - $"inter"), 6))
      .select($"doc_a", $"doc_b", $"est_jaccard", $"jaccard",
        round(abs($"est_jaccard" - $"jaccard"), 6).as("abs_err"))
      .transform(Relational.presentRanged(_, $"doc_a", $"doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_edit_verify" -> (q99EditVerify _),
    "q61_containment" -> (q61Containment _),
    "q64_dedup_gate" -> (q64DedupGate _),
    "q66_sketch_calibration" -> (q66SketchCalibration _),
    "q25_exact_dedup" -> (q25ExactDedup _),
    "q72_passage_dedup" -> (q72PassageDedup _),
    "q76_passage_gate" -> (q76PassageGate _),
    "q77_dup_substrings" -> (q77DupSubstrings _),
    "q78_exact_substr_rewrite" -> (q78ExactSubstrRewrite _),
    "q26_shingle_jaccard" -> (q26ShingleJaccard _),
    "q27_minhash_sig" -> (q27MinhashSig _),
    "q28_minhash_pairs" -> (q28MinhashPairs _),
    "q29_simhash" -> (q29Simhash _),
    "q44_simhash_pairs" -> (q44SimhashPairs _),
    "q48_neardup_clusters" -> (q48NeardupClusters _)
  )

  /** Shared oracle SQL: the 16-token passage chain (token split →
    * passage index range → passage text + HUGEINT first-occurrence key
    * doc_id·2^64 + pidx, exact for any int64 doc_id / passage count) —
    * replayed by the q72/q76 oracles and TrainPrep's q74 composition.
    */
  private[operators] val passageCtesSql: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ps AS (
       |  SELECT doc_id, t,
       |    unnest(range(CAST(ceil(len(t) / ${PassageTokens}.0) AS BIGINT))) AS pidx
       |  FROM toks),
       |pp AS (
       |  SELECT doc_id, pidx,
       |    array_to_string(t[CAST(pidx * $PassageTokens + 1 AS BIGINT):CAST(pidx * $PassageTokens + $PassageTokens AS BIGINT)], ' ') AS ptext,
       |    doc_id::HUGEINT * 18446744073709551616 + pidx AS pos_key
       |  FROM ps)""".stripMargin

  /** Shared SQL fragment: distinct word 3-gram shingles per doc. */
  private val shinglesSql =
    """SELECT doc_id, lang, source,
      |  list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |    [string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
      |     for i in range(1, len(string_split(text, ' ')) - 1)]
      |    ELSE [] END) AS sh
      |FROM documents""".stripMargin

  private val gSql = "CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647"

  /** The full shingle→signature→band CTE chain, shared by the q28 oracle
    * and downstream oracles building on the LSH pair graph (q48).
    */
  private[operators] val minhashBandsCtes: String =
    s"""docs AS ($shinglesSql),
       |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM docs WHERE len(sh) > 0),
       |sig AS (SELECT doc_id,
       |  min((($gSql) * 131 + 7) % 2147483647) AS h0,
       |  min((($gSql) * 137 + 91) % 2147483647) AS h1,
       |  min((($gSql) * 139 + 173) % 2147483647) AS h2,
       |  min((($gSql) * 149 + 255) % 2147483647) AS h3,
       |  min((($gSql) * 151 + 337) % 2147483647) AS h4,
       |  min((($gSql) * 157 + 419) % 2147483647) AS h5,
       |  min((($gSql) * 163 + 501) % 2147483647) AS h6,
       |  min((($gSql) * 167 + 583) % 2147483647) AS h7
       |FROM inv GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, h0 AS r0, h1 AS r1 FROM sig UNION ALL
       |  SELECT doc_id, 1, h2, h3 FROM sig UNION ALL
       |  SELECT doc_id, 2, h4, h5 FROM sig UNION ALL
       |  SELECT doc_id, 3, h6, h7 FROM sig)""".stripMargin

  /** Band CTEs + recursive min-label closure down to `lab(doc_id,
    * rep_doc_id)` — shared by the q48 oracle and the q54 corpus-pipeline
    * oracle (must follow `WITH RECURSIVE`).
    */
  private[operators] val ccLabCtes: String =
    s"""$minhashBandsCtes,
       |edges AS (
       |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id),
       |sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
       |cc AS (
       |  SELECT doc_id, doc_id AS rep FROM documents
       |  UNION
       |  SELECT s.v AS doc_id, c.rep FROM cc c JOIN sym s ON s.u = c.doc_id
       |  WHERE c.rep < s.v),
       |lab AS (SELECT doc_id, min(rep) AS rep_doc_id FROM cc GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q66_sketch_calibration" ->
      s"""WITH $minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id),
         |hashed AS (
         |  SELECT DISTINCT doc_id,
         |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
         |  FROM inv),
         |ns AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY 1),
         |cnt AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS inter
         |  FROM pairs p
         |  JOIN hashed ha ON ha.doc_id = p.doc_a
         |  JOIN hashed hb ON hb.doc_id = p.doc_b AND hb.sh_h = ha.sh_h
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT p.doc_a, p.doc_b,
         |    (${(0 until 8).map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")}) / 8.0 AS est_jaccard,
         |    round(CAST(coalesce(c.inter, 0) AS DOUBLE)
         |      / (na.n + nb.n - coalesce(c.inter, 0)), 6) AS jaccard
         |  FROM pairs p
         |  JOIN sig sa ON sa.doc_id = p.doc_a
         |  JOIN sig sb ON sb.doc_id = p.doc_b
         |  LEFT JOIN cnt c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
         |  JOIN ns na ON na.doc_id = p.doc_a
         |  JOIN ns nb ON nb.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, est_jaccard, jaccard,
         |  round(abs(est_jaccard - jaccard), 6) AS abs_err
         |FROM j ORDER BY doc_a, doc_b""".stripMargin,
    "q64_dedup_gate" ->
      s"""WITH $minhashBandsCtes,
         |refb AS (
         |  SELECT DISTINCT band, r0, r1 FROM bands WHERE doc_id % 3 <> 0),
         |batch AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
         |hits AS (
         |  SELECT b.doc_id, count(r.band) AS n_hot
         |  FROM batch b LEFT JOIN refb r
         |    ON b.band = r.band AND b.r0 = r.r0 AND b.r1 = r.r1
         |  GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(h.n_hot, 0) AS BIGINT) AS n_hot_bands,
         |  coalesce(h.n_hot, 0) = 0 AS admitted
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |LEFT JOIN hits h ON h.doc_id = d.doc_id
         |ORDER BY 1""".stripMargin,
    "q25_exact_dedup" ->
      """SELECT min(doc_id) AS survivor_doc_id, count(*) AS cluster_size
        |FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents)
        |GROUP BY fp ORDER BY survivor_doc_id""".stripMargin,
    "q77_dup_substrings" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |win AS (
         |  SELECT doc_id, t,
         |    unnest(range(CAST(greatest(len(t) - ${PassageTokens - 1}, 0) AS BIGINT))) AS i
         |  FROM toks),
         |wm AS (
         |  SELECT doc_id,
         |    md5(array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + $PassageTokens AS BIGINT)], ' ')) AS m
         |  FROM win),
         |w AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(m, 1, 15)) AS BIGINT) AS fp1,
         |    CAST(('0x' || substring(m, 17, 15)) AS BIGINT) AS fp2
         |  FROM wm),
        |dw AS (SELECT fp1, fp2, doc_id, count(*) AS w_in_doc FROM w GROUP BY 1, 2, 3),
        |fps AS (SELECT fp1, fp2, count(*) AS n_docs FROM dw GROUP BY 1, 2),
        |pd AS (
        |  SELECT dw.doc_id,
        |    CAST(sum(dw.w_in_doc) AS BIGINT) AS n_windows,
        |    CAST(sum(CASE WHEN fps.n_docs > 1 THEN dw.w_in_doc ELSE 0 END) AS BIGINT) AS n_dup_windows
        |  FROM dw JOIN fps USING (fp1, fp2) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(pd.n_windows, 0) AS n_windows,
        |  coalesce(pd.n_dup_windows, 0) AS n_dup_windows,
        |  CASE WHEN coalesce(pd.n_windows, 0) = 0 THEN 0.0
        |       ELSE round(CAST(pd.n_dup_windows AS DOUBLE) / pd.n_windows, 6) END AS dup_fraction
        |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q78_exact_substr_rewrite" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |win AS (
         |  SELECT doc_id, t,
         |    unnest(range(CAST(greatest(len(t) - ${PassageTokens - 1}, 0) AS BIGINT))) AS s
         |  FROM toks),
         |wm AS (
         |  SELECT doc_id, s,
         |    md5(array_to_string(t[CAST(s + 1 AS BIGINT):CAST(s + $PassageTokens AS BIGINT)], ' ')) AS m
         |  FROM win),
         |w AS (
         |  SELECT doc_id, s,
         |    CAST(('0x' || substring(m, 1, 15)) AS BIGINT) AS fp1,
         |    CAST(('0x' || substring(m, 17, 15)) AS BIGINT) AS fp2
         |  FROM wm),
         |f AS (SELECT fp1, fp2, min(doc_id::HUGEINT * 18446744073709551616 + s) AS fk
         |      FROM w GROUP BY 1, 2),
         |k AS (SELECT w.doc_id, w.s FROM w JOIN f ON w.fp1 = f.fp1 AND w.fp2 = f.fp2
         |      WHERE w.doc_id::HUGEINT * 18446744073709551616 + w.s = f.fk),
         |brk AS (
         |  SELECT doc_id, s,
         |    CASE WHEN s > coalesce(max(s) OVER (PARTITION BY doc_id ORDER BY s
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -$PassageTokens - 1)
         |        + $PassageTokens THEN 1 ELSE 0 END AS nb
         |  FROM k),
         |g AS (SELECT doc_id, s,
         |        sum(nb) OVER (PARTITION BY doc_id ORDER BY s) AS isl
         |      FROM brk),
         |sp AS (SELECT doc_id, isl, min(s) AS lo, max(s) + ${PassageTokens - 1} AS hi
         |       FROM g GROUP BY 1, 2),
         |reb AS (
         |  SELECT sp.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(hi - lo + 1) AS BIGINT) AS n_kept,
         |    string_agg(array_to_string(t[CAST(lo + 1 AS BIGINT):CAST(hi + 1 AS BIGINT)], ' '),
         |      ' ' ORDER BY lo) AS clean_text
         |  FROM sp JOIN toks USING (doc_id) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len(d.t) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(d.t) < $PassageTokens THEN CAST(len(d.t) AS BIGINT)
         |       ELSE coalesce(reb.n_kept, 0) END AS n_kept_tokens,
         |  CASE WHEN len(d.t) < $PassageTokens THEN 1
         |       ELSE coalesce(reb.n_spans, 0) END AS n_spans,
         |  CASE WHEN len(d.t) < $PassageTokens THEN array_to_string(d.t, ' ')
         |       ELSE coalesce(reb.clean_text, '') END AS clean_text
         |FROM toks d LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q76_passage_gate" ->
      s"""WITH $passageCtesSql,
         |refp AS (SELECT DISTINCT md5(ptext) AS fp FROM pp WHERE doc_id % 3 <> 0),
         |b AS (SELECT doc_id, md5(ptext) AS fp FROM pp WHERE doc_id % 3 = 0),
         |hits AS (
         |  SELECT b.doc_id, count(*) AS n_passages, count(r.fp) AS n_dup
         |  FROM b LEFT JOIN refp r ON b.fp = r.fp
         |  GROUP BY 1)
         |SELECT doc_id, n_passages, n_dup AS n_dup_passages,
         |  (CAST(n_dup AS DOUBLE) / n_passages) < 0.5 AS admitted
         |FROM hits ORDER BY doc_id""".stripMargin,
    "q72_passage_dedup" ->
      s"""WITH $passageCtesSql,
         |f AS (SELECT md5(ptext) AS fp, min(pos_key) AS first_key
         |      FROM pp GROUP BY 1),
         |sel AS (
         |  SELECT pp.doc_id, pp.pidx, pp.ptext, pp.pos_key = f.first_key AS kept
         |  FROM pp JOIN f ON md5(pp.ptext) = f.fp)
         |SELECT doc_id,
         |  count(*) AS n_passages,
         |  count(*) FILTER (WHERE kept) AS n_kept,
         |  coalesce(string_agg(ptext, ' ' ORDER BY pidx) FILTER (WHERE kept), '') AS clean_text
         |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q26_shingle_jaccard" ->
      s"""WITH docs AS ($shinglesSql),
         |raw AS (SELECT doc_id, lang, source, unnest(sh) AS shingle FROM docs),
         |hashed AS (SELECT DISTINCT doc_id, lang, source,
         |        CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h FROM raw),
         |inv AS (SELECT *, count(*) OVER (PARTITION BY doc_id) AS n_sh FROM hashed),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         |  FROM inv a JOIN inv b
         |    ON a.lang = b.lang AND a.source = b.source AND a.sh_h = b.sh_h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) AS jaccard
         |FROM pairs WHERE round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q27_minhash_sig" ->
      s"""WITH docs AS ($shinglesSql),
         |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM docs WHERE len(sh) > 0)
         |SELECT doc_id,
         |  min((($gSql) * 131 + 7) % 2147483647) AS h0,
         |  min((($gSql) * 137 + 91) % 2147483647) AS h1,
         |  min((($gSql) * 139 + 173) % 2147483647) AS h2,
         |  min((($gSql) * 149 + 255) % 2147483647) AS h3,
         |  min((($gSql) * 151 + 337) % 2147483647) AS h4,
         |  min((($gSql) * 157 + 419) % 2147483647) AS h5,
         |  min((($gSql) * 163 + 501) % 2147483647) AS h6,
         |  min((($gSql) * 167 + 583) % 2147483647) AS h7
         |FROM inv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q28_minhash_pairs" ->
      s"""WITH $minhashBandsCtes
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q99_edit_verify" ->
      s"""WITH $minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id),
         |pref AS (SELECT doc_id, substring(text, 1, 120) AS prefix FROM documents),
         |d AS (
         |  SELECT doc_a, doc_b,
         |    CAST(levenshtein(pa.prefix, pb.prefix) AS BIGINT) AS edit_dist,
         |    CAST(greatest(length(pa.prefix), length(pb.prefix)) AS BIGINT) AS max_len
         |  FROM pairs JOIN pref pa ON doc_a = pa.doc_id
         |  JOIN pref pb ON doc_b = pb.doc_id)
         |SELECT doc_a, doc_b, edit_dist, max_len,
         |  round(CAST(edit_dist AS DOUBLE) / max_len, 6) AS norm_dist,
         |  round(CAST(edit_dist AS DOUBLE) / max_len, 6) <= 0.3 AS near_dup
         |FROM d ORDER BY doc_a, doc_b""".stripMargin,
    "q29_simhash" -> (simhashSqlFor(16) + " ORDER BY doc_id"),
    // connected components as a recursive min-label reachability closure
    // over the SAME band CTEs the q28 oracle uses: (doc, rep) ∈ cc when a
    // monotone-descending path carries rep to doc; the component minimum m
    // reaches every member (every hop away from m satisfies rep < node),
    // so min(rep) per doc is the component representative.
    "q48_neardup_clusters" ->
      s"""WITH RECURSIVE $ccLabCtes
         |SELECT doc_id, rep_doc_id,
         |  count(*) OVER (PARTITION BY rep_doc_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin,
    "q61_containment" ->
      s"""WITH $minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id),
         |hashed AS (
         |  SELECT DISTINCT doc_id,
         |    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
         |  FROM inv),
         |ns AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY 1),
         |cnt AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS inter
         |  FROM pairs p
         |  JOIN hashed ha ON ha.doc_id = p.doc_a
         |  JOIN hashed hb ON hb.doc_id = p.doc_b AND hb.sh_h = ha.sh_h
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, na.n AS n_a, nb.n AS n_b,
         |  coalesce(c.inter, 0) AS inter,
         |  round(CAST(coalesce(c.inter, 0) AS DOUBLE) / na.n, 6) AS containment_a,
         |  round(CAST(coalesce(c.inter, 0) AS DOUBLE) / nb.n, 6) AS containment_b
         |FROM pairs p
         |LEFT JOIN cnt c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
         |JOIN ns na ON na.doc_id = p.doc_a
         |JOIN ns nb ON nb.doc_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "q44_simhash_pairs" ->
      s"""WITH sk AS (${simhashSqlFor(32)}),
         |bands AS (
         |  SELECT doc_id, simhash, CAST(b AS INT) AS band,
         |    (simhash >> (8 * CAST(b AS INT))) & 255 AS key
         |  FROM sk, range(4) t(b)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
  )

  /** The token simhash sketch as a reusable subquery (no ORDER BY). */
  private def simhashSqlFor(bits: Int): String =
    ("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |h AS (SELECT doc_id, CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS g FROM tok),
       |s AS (SELECT doc_id, """ +
      (0 until bits).map(j => s"sum(((g >> $j) & 1) * 2 - 1) AS s$j").mkString(", ") +
      " FROM h GROUP BY doc_id)\nSELECT doc_id, CAST(" +
      (0 until bits).map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ") +
      " AS BIGINT) AS simhash FROM s").stripMargin
}
