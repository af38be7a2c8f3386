package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus text-analysis operators: one narrow, codegen-friendly
  * projection per document (no shuffle until the caller aggregates).
  */
object TextAnalysis {

  /** Per-document analysis record: predicted language, token counts,
    * quality features + score, bottom-k fingerprint. */
  def profile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      langId(col(textCol)).as("lang_pred"),
      tokenCount(col(textCol)).as("n_tokens"),
      size(words(col(textCol))).as("n_words"),
      qualityFeatures(col(textCol)).as("features"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fp"))

  /** Language-ID confusion counts against a labeled `langCol`. */
  def langConfusion(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.select(col(langCol), langId(col(textCol)).as("lang_pred"))
      .groupBy(col(langCol), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(langCol), col("lang_pred"))

  /** Per-class precision/recall/F1 of a predicted label against truth
    * — the standard classifier report card, here for any
    * (truth, prediction) labeling (the declared query grades
    * [[graft.functions.TextFunctions.langId]] against the fixture's
    * true `lang`). The row-level confusion matrix (x08) says WHERE
    * mistakes go; this says whether each class's detector is usable.
    *
    * Integer-exact: tp/fp/fn are counts off one confusion aggregation,
    * and all three metrics are rational in them — precision =
    * tp/(tp+fp), recall = tp/(tp+fn), and F1's harmonic mean collapses
    * to 2·tp/(2·tp+fp+fn) — so each rides a single integer
    * micro-division. Undefined metrics (empty denominator: a class
    * never predicted, or never true) are null, not zero — a class
    * with no predictions has UNKNOWN precision, and folding it to 0
    * would poison any macro average downstream.
    *
    * Scale: one corpus-volume (truth, pred) aggregation; the per-class
    * assembly is class-cardinality outer joins. Output: (class, tp,
    * fp, fn, precision_micro, recall_micro, f1_micro) over the union
    * of true and predicted classes. */
  def classifierPrf(labeled: DataFrame, truthCol: String,
      predCol: String): DataFrame = {
    val conf = labeled
      .groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds tp, row/col margins, class list
    val classes = conf.select(col("t").as("class"))
      .union(conf.select(col("p").as("class"))).distinct()
    val tp = conf.filter(col("t") === col("p"))
      .select(col("t").as("class"), col("n").as("tp"))
    val predTot = conf.groupBy(col("p").as("class"))
      .agg(sum(col("n")).cast("bigint").as("__pt"))
    val truthTot = conf.groupBy(col("t").as("class"))
      .agg(sum(col("n")).cast("bigint").as("__tt"))
    classes
      .join(tp, Seq("class"), "left")
      .join(predTot, Seq("class"), "left")
      .join(truthTot, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("__pt"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("__tt"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .select(col("class"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000L div (tp + fp)")).as("precision_micro"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000L div (tp + fn)")).as("recall_micro"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("2L * tp * 1000000L div (2L * tp + fp + fn)")).as("f1_micro"))
  }

  /** Benchmark-contamination screen: per corpus document, how many of
    * its word n-grams appear in a (small) benchmark corpus — the
    * standard eval-decontamination pass for training data. The
    * benchmark gram set is broadcast (it is eval-sized, not
    * corpus-sized), so the corpus is read once with no shuffle of
    * text; only (doc_id, gram) pairs that MATCH enter the counting
    * aggregation. Output: (doc_id, n_hits) for docs with ≥ 1 hit. */
  def contaminationScreen(corpus: DataFrame, benchmark: DataFrame,
      ngram: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    val benchGrams = benchmark
      .select(explode(wordShingles(col(textCol), ngram)).as("gram"))
      .distinct()
    corpus
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(col(textCol), ngram)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      // distinct AFTER the broadcast join: benchGrams is already
      // distinct, so the join preserves corpus-side multiplicity and
      // the per-doc dedup is result-identical — but now only MATCHING
      // (doc_id, gram) pairs enter the shuffle, not every gram of the
      // corpus (contamination hits are rare; the pre-join distinct
      // would have shuffled ~one row per corpus word).
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Contamination by OVERLAP FRACTION — the graded sibling of
    * [[contaminationScreen]]: that screen flags a corpus doc on ANY
    * shared benchmark n-gram, which at web scale flags half the corpus
    * on idioms; real decontamination (GPT-3 appendix C, PaLM, Llama)
    * asks what FRACTION of a benchmark item's n-grams the document
    * covers. Output: one row per (corpus doc, benchmark doc) with
    * `shared` distinct grams and `overlap` = shared / |benchmark
    * grams|, kept when ≥ `minRatio`.
    *
    * Engine-exact: both counts are integers and `overlap` is one
    * division of exact operands, rounded at output.
    *
    * Scale: benchmark grams are eval-set-sized and broadcast with
    * their per-item sizes; the corpus side explodes DISTINCT grams
    * map-side, and only MATCHING (doc, bench, gram) rows enter the
    * one aggregation shuffle — the corpus' non-matching grams (the
    * overwhelming majority) never leave their scan tasks. */
  def contaminationOverlap(corpus: DataFrame, benchmark: DataFrame,
      ngram: Int = 5, minRatio: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    val bg = benchmark
      .select(col(idCol).as("bench_id"),
        explode(array_distinct(wordShingles(col(textCol), ngram))).as("gram"))
      .localCheckpoint(true) // feeds the per-item sizes AND the probe join
    val sizes = bg.groupBy(col("bench_id")).agg(count(lit(1)).as("__bsz"))
    corpus
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(wordShingles(col(textCol), ngram))).as("gram"))
      .join(broadcast(bg), "gram")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(sizes), "bench_id")
      .select(col("doc_id"), col("bench_id"), col("shared"),
        round(col("shared").cast("double") / col("__bsz").cast("double"), 6)
          .as("overlap"))
      .filter(col("overlap") >= minRatio)
  }

  /** Gopher-style repetition filter: fraction of a document's word
    * n-gram occurrences taken by its single most frequent n-gram.
    * Boilerplate/spam repeats a few grams → ratio near 1; natural text
    * stays low. Two partial+final hash aggs: the first keys on
    * (doc_id, gram) and its map-side combine collapses repeated grams,
    * so the second exchange (re-keying on doc_id) carries one row per
    * DISTINCT gram — already reduced, not per occurrence. Output:
    * (doc_id, top_gram_ratio) for docs with ≥ 1 n-gram. */
  def repetitionRatio(docs: DataFrame, ngram: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    repetitionRatioFromTokens(tokFrame(docs, idCol, textCol), ngram)

  /** [[repetitionRatio]] over a pre-tokenized (doc_id, __w) frame —
    * THE rendering of the metric; callers that already hold tokens
    * (the x43 funnel) reuse it without re-tokenizing the corpus. */
  private def repetitionRatioFromTokens(toks: DataFrame, ngram: Int): DataFrame =
    toks
      .select(col("doc_id"),
        explode(graft.functions.ShingleFunctions.ngram_strings(
          col("__w"), ngram)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")) / sum(col("c")), 6).as("top_gram_ratio"))

  /** (doc_id, __w = word tokens) projection shared by the token-frame
    * metric variants. */
  private def tokFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions.words
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
  }

  /** The portable hash bucket, hoisted to
    * [[graft.functions.TextFunctions.md5Bucket60]] so every consumer
    * (splits, samples, thresholds, Profile's sampling gates) shares
    * ONE rendering of the oracle contract. */
  private def md5Bucket60(key: Column): Column =
    graft.functions.TextFunctions.md5Bucket60(key)

  /** Discrete-percentile bounds of `lenCol` as a 1-row (__lo, __hi)
    * frame — the x39-proven engine-exact threshold construction,
    * shared by [[lengthTrim]] and [[filterAttribution]]. */
  private def percentileBounds(df: DataFrame, lo: Double, hi: Double,
      lenCol: String): DataFrame =
    df.selectExpr(
      s"percentile_disc($lo) WITHIN GROUP (ORDER BY $lenCol) AS __lo",
      s"percentile_disc($hi) WITHIN GROUP (ORDER BY $lenCol) AS __hi")

  /** Deterministic dataset split: every row lands in train/val/test by
    * a content-stable hash of its key — reproducible across runs,
    * engines and partitionings (unlike `randomSplit`, which depends on
    * partition layout), and pure map-side at any scale. The bucket is
    * the md5-60 of the key string mod 100, so any SQL engine can
    * recompute the assignment. */
  def datasetSplit(df: DataFrame, keyCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = md5Bucket60(col(keyCol)) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Token-budget corpus selection: per `groupCol`, keep the highest-
    * quality documents whose PRECEDING cumulative token mass (in
    * quality-rank order) is under `budget` — "give me the best B
    * tokens per language", the data-selection pass that turns scored
    * corpora into a sized training mix. Selection is a prefix of the
    * rank order, so the kept set is stable under corpus growth at the
    * tail, and the budget overshoots by at most one document (the
    * standard knapsack relaxation — exact packing is NP and pointless
    * at this grain).
    *
    * Determinism discipline: ranking is on the UNROUNDED
    * [[graft.functions.TextFunctions.qualityScoreRaw]] (exact-operand
    * doubles, bit-identical on any engine) with the id as tiebreak;
    * token counts are integers; the budget comparison is integer — so
    * kept/dropped is engine-exact, no rank flip can move the cut.
    *
    * Scale: rank and cumulative mass both come from ONE
    * [[graft.operators.Rank.withGroupedPrefixSums]] pass (round 12) —
    * the per-group window form sorted a whole language in one task;
    * the two-phase prefix sum bounds every window partition by the
    * range-partition size, bit-identically. A quality pre-cut from
    * [[graft.operators.Profile.sampledQuantiles]] remains the cheap
    * first trim when most mass is far below the cut. */
  def tokenBudgetSelect(docs: DataFrame, groupCol: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, s"tokenBudgetSelect: budget must be > 0, got $budget")
    import graft.functions.TextFunctions
    val ranked = docs.select(col(groupCol), col(idCol),
      TextFunctions.qualityScoreRaw(col(textCol)).as("__qr"),
      TextFunctions.tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
      .withColumn("__one", lit(1L))
    Rank.withGroupedPrefixSums(ranked, groupCol,
        Seq(col("__qr").desc, col(idCol)),
        Seq("__one" -> "rank", "n_tokens" -> "cum_tokens"))
      .withColumn("rank", col("rank").cast("int"))
      .withColumn("kept", (col("cum_tokens") - col("n_tokens")) < budget)
      .select(col(groupCol), col("rank"), col(idCol),
        round(col("__qr"), 6).as("quality"),
        col("n_tokens"), col("cum_tokens"), col("kept"))
  }

  /** Weight-proportional systematic sample, per stratum: rows are laid
    * on an integer line in deterministic md5-hash order, each occupying
    * an interval of its weight, and every multiple of the stride
    * (= stratum weight mass div `k`) picks the row whose interval
    * covers it — the classic PPS (probability-proportional-to-size)
    * systematic draw, done entirely in integer arithmetic. The corpus
    * read: "give me ~k docs per language, long docs proportionally
    * more likely", e.g. for human eval or audit panels, without the
    * engine-dependent RNG a `TABLESAMPLE` would smuggle in.
    *
    * Determinism discipline: the line order is (md5(key), key) — a
    * content hash both engines render identically, so the draw is
    * reproducible across runs, engines and partitionings; cumulative
    * weights, the stride, and the pick test (`cum div stride` crossing
    * a multiple) are all BIGINT ops. A row heavier than the stride
    * appears once (first covered multiple), so the stratum yields
    * between k and k + (mass mod k ≠ 0 overshoot) rows, deterministic.
    * `weightCol` must be a non-negative integer column; zero-weight
    * rows occupy no interval and are never drawn.
    *
    * Scale design (round 12): the cumulative weight comes from
    * [[graft.operators.Rank.withGroupedPrefixSums]] — per-range local
    * cumsum plus broadcast per-(range, stratum) offsets — so NO task
    * ever sorts a whole stratum; the stratum total is a plain
    * aggregate broadcast back (the old partition-only window
    * buffered the entire stratum in one task for a group sum).
    *
    * Output: picked rows only — (strataCol, keyCol, weight,
    * cum_weight, pick_no), pick_no strictly increasing within a
    * stratum. */
  def systematicSample(df: DataFrame, keyCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"systematicSample: k must be positive, got $k")
    // round 12: the per-stratum cumulative weight comes from the
    // two-phase prefix sum (no whole-stratum single-task sort), and
    // the stratum total from a plain aggregate broadcast back — the
    // old partition-only window buffered the whole stratum in one
    // task for what is just a group sum
    val based = df.select(col(strataCol), col(keyCol),
      col(weightCol).cast("long").as("__w"),
      md5(col(keyCol).cast("string")).as("__h"))
    val tots = based.groupBy(col(strataCol).as("__pp_ts"))
      .agg(sum(col("__w")).as("__tot"))
    Rank.withGroupedPrefixSums(based, strataCol,
        Seq(col("__h"), col(keyCol)), Seq("__w" -> "__cum"))
      .join(broadcast(tots), col(strataCol) <=> col("__pp_ts"))
      .withColumn("__stride", greatest(lit(1L), expr(s"__tot div $k")))
      .filter(expr("__cum div __stride > (__cum - __w) div __stride"))
      .select(col(strataCol), col(keyCol), col("__w").as("weight"),
        col("__cum").as("cum_weight"),
        expr("(__cum - __w) div __stride + 1").as("pick_no"))
  }

  /** Cluster-aware deterministic split — the repair [[splitLeakage]]
    * points at: every document's split key is its near-dup COMPONENT id
    * (e.g. [[graft.operators.Dedup.connectedComponents]] over the
    * verified pair relation), coalesced to the doc's own id for the
    * corpus-majority of docs in no cluster. All members of a component
    * hash to the same bucket, so a near-dup pair can never straddle
    * splits and the [[splitLeakage]] audit is zero BY CONSTRUCTION
    * rather than by luck — the difference between "we checked" and
    * "it cannot happen".
    *
    * Scale: `clusters` is collision-scale (one row per doc appearing in
    * ≥ 1 near-dup pair — ≪ corpus even at 100 TB, since a corpus that
    * is mostly near-dups gets deduped before splitting), so the join
    * broadcasts and the corpus-scale side streams map-side; the bucket
    * hash itself is per-row arithmetic with no shuffle. The split
    * fractions drift from trainPct only by the (tiny) mass of multi-doc
    * clusters, and deterministically so.
    *
    * Contract: `clusters` carries
    * [[graft.operators.Dedup.connectedComponents]]'s output schema —
    * literal `(doc_id, cluster_id)` columns; `keyCol` renames only the
    * `df` side of the join. */
  def clusterAwareSplit(df: DataFrame, clusters: DataFrame,
      keyCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val c = clusters.select(col("doc_id").as(keyCol),
      col("cluster_id").as("__cluster"))
    val bucket = md5Bucket60(coalesce(col("__cluster"), col(keyCol))) % 100
    df.join(broadcast(c), Seq(keyCol), "left")
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__cluster")
  }

  /** Split-leakage audit: near-duplicate pairs whose members landed in
    * DIFFERENT splits are evaluation leakage (the val/test member is a
    * paraphrase of a training doc) — the check every dedup-then-split
    * pipeline owes its eval numbers. Input: a verified pair relation
    * (e.g. [[graft.operators.Dedup.ngramJaccardNearDup]]) and a
    * (id, split) assignment (e.g. [[datasetSplit]]). Output: one row
    * per unordered split combination with its pair count and a
    * `leaked` flag (split_lo ≠ split_hi); same-split rows give the
    * base rates. The repair is cluster-aware splitting (assign each
    * x28 component its min-member's split) — this operator is the
    * detector that says whether you need it.
    *
    * Coverage: a pair member with NO split assignment (pairs mined on
    * the full corpus, splits computed on a trimmed subset) lands in an
    * `(unassigned)` bucket instead of silently dropping the pair — an
    * audit that under-counts the thing it audits is worse than none.
    * `(unassigned)` rows are coverage gaps to close, not confirmed
    * leakage; they are surfaced so they cannot hide a leak.
    *
    * Scale: the pair relation is collision-scale (≪ corpus); the
    * corpus-scale split frame streams ONCE past a broadcast semi-join
    * on the pair id set and is pair-scale afterwards, so both member
    * lookups are broadcast joins; the final aggregate has ≤
    * (|splits|+1)² groups. */
  def splitLeakage(pairs: DataFrame, splits: DataFrame,
      idCol: String = "doc_id", splitCol: String = "split"): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val ids = p.select(col("doc_a").as("__id"))
      .union(p.select(col("doc_b").as("__id"))).distinct()
    // corpus-scale side streams past the broadcast id set; the result
    // is pair-scale and broadcastable into the two member lookups
    val assigned = splits.select(col(idCol).as("__id"), col(splitCol).as("__split"))
      .join(broadcast(ids), Seq("__id"), "left_semi")
    // LEFT joins: unmatched members coalesce to the audit bucket
    p.join(broadcast(assigned.toDF("doc_a", "split_a")), Seq("doc_a"), "left")
      .join(broadcast(assigned.toDF("doc_b", "split_b")), Seq("doc_b"), "left")
      .select(
        coalesce(col("split_a"), lit("(unassigned)")).as("split_a"),
        coalesce(col("split_b"), lit("(unassigned)")).as("split_b"))
      .groupBy(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        (col("split_lo") =!= col("split_hi")).as("leaked"))
  }

  /** Deterministic sequence packing: assign documents to fixed-token-
    * budget packs within each stratum — the assembly step that turns a
    * cleaned corpus into training sequences. Chunked-cumulative-sum
    * packing (a doc's pack = floor(tokens_before / budget)): fully
    * deterministic and SQL-recomputable — unlike greedy first-fit,
    * which needs sequential state.
    *
    * Scale note: round 12 made the prefix sum two-phase for real —
    * [[graft.operators.Rank.withGroupedPrefixSums]] (per-range local
    * cumsum + broadcast per-(range, stratum) offsets), so a handful
    * of 10 TB languages no longer serialize each through one task;
    * the pack assignment formula is unchanged and the ids are
    * bit-identical.
    *
    * Output: input columns projected to (stratum, id, n_tokens) plus
    * `pack_id`. */
  def packSequences(docs: DataFrame, budget: Int, strataCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    Rank.withGroupedPrefixSums(
        docs.select(col(strataCol), col(idCol),
          tokenCount(col(textCol)).as("n_tokens")),
        strataCol, Seq(col(idCol)), Seq("n_tokens" -> "__cum"))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / budget))
      .drop("__cum")
  }

  /** Context-length packing sweep — the capacity-planning read on top
    * of [[packSequences]]'s model: for each candidate budget
    * (context length), how many packs the corpus needs, how full they
    * are, how many tokens spill past the last pack boundary, and how
    * many documents straddle a pack cut (the docs a trainer must
    * split or truncate). One row per (budget, stratum); choosing a
    * context length is reading this table.
    *
    * Semantics per budget L, within each stratum under the (id) total
    * order: a doc starts in pack floor(tokens_before / L)
    * (packSequences' assignment); n_packs = last start-pack + 1;
    * capacity = n_packs·L; fill_micro = total_tokens·10⁶ div
    * capacity (> 10⁶ means the tail doc overruns the last boundary —
    * that overrun is `overflow_tokens`); split_docs counts docs whose
    * first and last token land in different packs. All integer algebra
    * over the exact cumulative sums — engine-identical (`div` and
    * DuckDB `//` both truncate; operands non-negative). Docs whose
    * token count is null (null text) are not packable and drop first,
    * mirrored by the oracle. Exact while total_tokens·10⁶ fits a long
    * (≈ 9·10¹² tokens per stratum — tens of TB of text; beyond that,
    * sweep per sub-shard and sum).
    *
    * Scale: ONE two-phase prefix-sum pass
    * ([[graft.operators.Rank.withGroupedPrefixSums]]) shared by every
    * budget (the frame is checkpointed; each budget adds one
    * stratum-cardinality aggregation), so sweeping 4 context lengths
    * costs one corpus pass, not four. */
  def packingSweep(docs: DataFrame, budgets: Seq[Long],
      strataCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0),
      s"packingSweep: budgets must be positive, got $budgets")
    val cum = Rank.withGroupedPrefixSums(
        docs.select(col(strataCol), col(idCol),
            tokenCount(col(textCol)).as("n_tokens"))
          .filter(col("n_tokens").isNotNull),
        strataCol, Seq(col(idCol)), Seq("n_tokens" -> "__cum"))
      .localCheckpoint(true) // feeds one aggregation branch per budget
    budgets.map { l =>
      cum.groupBy(col(strataCol))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"),
          (max(expr(s"(__cum - n_tokens) div $l")) + lit(1L))
            .cast("bigint").as("n_packs"),
          sum(when(col("n_tokens") > 0 &&
              expr(s"(__cum - n_tokens) div $l") =!= expr(s"(__cum - 1) div $l"),
              1L).otherwise(0L)).cast("bigint").as("split_docs"))
        .select(lit(l).cast("long").as("budget"), col(strataCol),
          col("n_docs"), col("total_tokens"), col("n_packs"),
          (col("n_packs") * lit(l)).cast("long").as("capacity"),
          expr(s"total_tokens * 1000000L div (n_packs * $l)")
            .cast("long").as("fill_micro"),
          greatest(lit(0L), col("total_tokens") - col("n_packs") * lit(l))
            .cast("long").as("overflow_tokens"),
          col("split_docs"))
    }.reduce(_ unionByName _)
      .orderBy(col("budget"), col(strataCol))
  }

  /** Fixed-window document chunking with overlap — the context-window
    * preparation step (split long docs into model-sized pieces, adjacent
    * chunks sharing `window - stride` chars). Chunk starts sit on the
    * stride grid (1, 1+stride, …) up to the doc length, so the chunk
    * count is ceil(len/stride) and the mapping is deterministic — no
    * state, no window function, ONE narrow generator projection: at
    * 100 TB this is a pure map stage that pipelines into whatever
    * shuffle follows (no exchange of its own).
    * Output: (doc_id, chunk_id, start, chunk, chunk_len). */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkDocuments: need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        explode(sequence(lit(1), length(col(textCol)), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        // exact multiples of stride: FLOOR-then-cast is engine-portable
        floor((col("start") - 1) / stride).cast("int").as("chunk_id"),
        col("start"),
        substr(col("__t"), col("start"), lit(window)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
  }

  /** Boilerplate screen: per document, the fraction of its DISTINCT
    * word n-grams that are corpus-common ("boilerplate" = n-grams
    * appearing in at least `minDfPct`% of documents — headers, footers,
    * license blurbs). The threshold is RELATIVE so the operator is
    * scale-invariant, and the comparison is kept in integer arithmetic
    * (df·100 ≥ n_docs·pct) so no float rounding can flip a boundary
    * gram. Same single-tokenize-pass shape as the tf-idf operator: the
    * per-doc gram table is materialized once and feeds both the
    * document-frequency aggregation and the per-doc rollup.
    * Output: (doc_id, n_grams, n_boiler, boiler_frac). */
  def boilerplateScreen(docs: DataFrame, ngram: Int = 2, minDfPct: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    boilerplateScreenFromTokens(tokFrame(docs, idCol, textCol), ngram, minDfPct)

  /** [[boilerplateScreen]] over a pre-tokenized (doc_id, __w) frame —
    * THE rendering of the metric (see [[repetitionRatioFromTokens]]). */
  private def boilerplateScreenFromTokens(toks: DataFrame, ngram: Int,
      minDfPct: Int): DataFrame = {
    val nDocs = toks.agg(count(lit(1)).as("__nd"))
    val grams = toks
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.ShingleFunctions.ngram_strings(
          col("__w"), ngram))).as("gram"))
      .localCheckpoint(true)
    // grams are distinct per doc, so rows-per-gram IS document frequency
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, "gram")
      .join(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") * 100 >= col("__nd") * minDfPct, 1L).otherwise(0L))
          .as("n_boiler"))
      .withColumn("boiler_frac", round(col("n_boiler") / col("n_grams"), 6))
  }

  /** Deterministic balanced downsampling: keep at most `cap` rows per
    * stratum, chosen by content-stable hash order (md5-60 of the key)
    * — the "cap each language/source" rebalancing pass. Hash order
    * makes the kept set a uniform sample that is reproducible across
    * runs, engines and partition layouts (row_number over an arrival
    * order or a random() would be neither).
    * Scale: the per-stratum rank comes from
    * [[graft.operators.Rank.withGroupedPrefixSums]] (round 12) — a
    * `row_number` window partitioned by the stratum would sort a
    * whole 10 TB language inside one task; the prefix-sum
    * decomposition bounds every window partition by the range-
    * partition size instead, with bit-identical ranks. */
  def balancedSample(df: DataFrame, keyCol: String, strataCol: String,
      cap: Int): DataFrame = {
    Rank.withGroupedPrefixSums(
        df.withColumn("__hb", md5Bucket60(col(keyCol)))
          .withColumn("__one", lit(1L)),
        strataCol, Seq(col("__hb"), col(keyCol)), Seq("__one" -> "rk"))
      .withColumn("rk", col("rk").cast("int"))
      .filter(col("rk") <= cap)
      .drop("__hb", "__one")
  }

  /** Corpus vocabulary statistics: the top-k tokens by occurrence count
    * with their cumulative corpus coverage (the Zipf head — how much of
    * the corpus the top-k vocabulary explains). Counting is one
    * partial+final hash agg; the top-k cut is a distributed
    * TakeOrderedAndProject (NOT a global window over the whole
    * vocabulary — a web-scale vocab has 10⁸ rows and would serialize
    * through one task); only the k survivors enter the single-partition
    * ranking window. cum_frac divides exact BIGINT operands, so the
    * double is bit-identical on any engine.
    * Output: (rank, token, cnt, cum_frac). */
  def vocabStats(docs: DataFrame, topK: Int = 20,
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds both the total and the top-k cut
    val total = counts.agg(sum(col("cnt")).cast("bigint").as("__tot"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
    val wRank = Window.orderBy(col("cnt").desc, col("token"))
    val wCum = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(wRank))
      .join(broadcast(total))
      .withColumn("cum_frac",
        round(sum(col("cnt")).over(wCum) / col("__tot"), 6))
      .select(col("rank"), col("token"), col("cnt"), col("cum_frac"))
  }

  /** Vocabulary coverage curve: the smallest vocabulary size whose
    * terms (taken in frequency order) cover each requested percentage
    * of the corpus token mass — THE sizing question for a tokenizer or
    * a stopword list ("how many types buy 95% of tokens"), the
    * integral complement to [[vocabStats]]' top-k head.
    *
    * Scale: the naive form is a cumulative window over the FULL
    * ranked vocabulary — 10⁸ single-task rows at web scale. Instead
    * the vocabulary collapses to its count-value HISTOGRAM (the
    * [[graft.operators.Profile.keyConcentration]] trick): terms tied
    * at count c are interchangeable for a coverage threshold, so the
    * crossing point is computable from (c, m_c) alone — prefix mass
    * over counts DESC, then an exact integer ceil-division inside the
    * crossing level. The window runs over distinct count VALUES
    * (thousands), not terms.
    *
    * Integer-exact end to end: target = ceil(pct·total/100), picks =
    * ceil((target − mass_before)/c) — floor divisions on non-negative
    * operands only. Output per requested pct: (pct, target_tokens,
    * vocab_size, total_tokens, total_vocab). */
  def vocabCoverage(docs: DataFrame, pcts: Seq[Int] = Seq(50, 90, 95, 99),
      textCol: String = "text"): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"vocabCoverage: pcts must be in [1,100], got $pcts")
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(explode(words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__c")).agg(count(lit(1)).as("__m"))
    val wPrefix = Window.orderBy(col("__c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val levels = hist
      .withColumn("__mass0", coalesce(sum(col("__c") * col("__m")).over(wPrefix), lit(0L)))
      .withColumn("__vocab0", coalesce(sum(col("__m")).over(wPrefix), lit(0L)))
    val totals = hist.agg(
      sum(col("__c") * col("__m")).cast("bigint").as("total_tokens"),
      sum(col("__m")).cast("bigint").as("total_vocab"))
    val thresholds = docs.sparkSession
      .range(1).select(explode(lit(pcts.toArray)).as("pct"))
    thresholds.join(broadcast(totals))
      .withColumn("target_tokens", expr("(pct * total_tokens + 99L) div 100L"))
      .join(levels,
        col("__mass0") < col("target_tokens") &&
          col("target_tokens") <= col("__mass0") + col("__c") * col("__m"))
      .select(col("pct"), col("target_tokens"),
        (col("__vocab0") +
          expr("(target_tokens - __mass0 + __c - 1L) div __c")).as("vocab_size"),
        col("total_tokens"), col("total_vocab"))
  }

  /** Winnowing fingerprint near-dup (Schleimer/Wilkerson/Aiken's
    * MOSS scheme): rolling char-k-gram hashes, each w-window keeps its
    * MINIMUM hash, distinct minima are the document's fingerprints,
    * and documents sharing ≥ `minShared` fingerprints are candidate
    * substring-overlap pairs. The guarantee the bottom-k sketch
    * (fingerprintDup) cannot give: any shared substring of length
    * ≥ k + w − 1 shares at least one fingerprint REGARDLESS of where
    * it sits in either document — position-robust plagiarism-style
    * detection, density ~2/(w+1) fingerprints per character.
    *
    * Portable by construction: hashes are the md5-60 family over the
    * whitespace-normalized lowercase text, windows are value-only
    * minima (ties collapse to the same VALUE, so no position
    * tie-break is needed), and the whole chain is replayable in plain
    * SQL — the oracle recomputes every fingerprint.
    *
    * Scale: fingerprints explode to ~2n/(w+1) rows, the pair join is
    * an equi-join on the fingerprint value, and `dfCap` drops
    * fingerprints appearing in more than that many docs before the
    * join — the boilerplate hot-key guard (a ubiquitous header would
    * otherwise fan out quadratically), same contract as
    * [[containmentScreen]]'s df cap. Output: (doc_a, doc_b, n_shared). */
  def winnowingNearDup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, w: Int = 4,
      minShared: Int = 2, dfCap: Int = 50): DataFrame = {
    require(k > 0 && w > 0 && minShared > 0 && dfCap > 0,
      s"winnowingNearDup: k, w, minShared, dfCap must be positive, got ($k, $w, $minShared, $dfCap)")
    // one codegen'd kernel pass per doc: rolling md5-60 gram hashes
    // (Md5ShingleHashes) → O(n) deque window minima (WinnowMinima).
    // The first cut of this operator composed built-ins —
    // transform(sequence, array_min(slice)) — and ran ~300× slower:
    // higher-order lambdas execute INTERPRETED, paying a boxed
    // expression-tree eval per element per window. This is the
    // tier-(b) custom-Expression case SURVEY §2.7 reserves for hot
    // paths the built-ins genuinely can't serve (contrast
    // blockedFuzzyJoin, where the built-in threshold levenshtein WON).
    val fps = docs.select(col(idCol).as("doc_id"),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col("doc_id"), explode(
        graft.functions.ShingleFunctions.winnow_minima(
          graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k), w))
        .as("fp"))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
    val pruned = fps.join(rare.select(col("fp")), "fp")
    val a = pruned.as("a"); val b = pruned.as("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Longest duplicated-substring estimate per near-dup pair, at
    * multiple winnowing grains — the piece between x49's fixed
    * 10-word span dedup and x203's content-defined chunks: the Lee
    * et al. ("Deduplicating Training Data Makes Language Models
    * Better") exact-substring read, approximated relationally.
    * Winnowing anchors (k-gram rolling md5-60 hashes, w-window
    * last-argmin selection WITH positions) match across documents;
    * matched anchors sharing a pair's DIAGONAL (pos_a − pos_b — a
    * contiguous shared substring keeps both position sequences in
    * lockstep) stitch into maximal runs via gaps-and-islands
    * (consecutive anchors ≤ k+w apart — winnowing guarantees anchor
    * spacing ≤ w inside contiguous shared text; the slack absorbs
    * df-capped anchors the prune dropped). A run of anchors spanning
    * [first, last] witnesses a duplicated substring of ≥
    * last − first + k chars.
    *
    * Never all-pairs: anchors join bucket-style on the fingerprint
    * with the x122 df cap, so candidate volume is bounded by real
    * duplication, and the stitching window partitions by
    * (pair, diagonal) — bounded by matched anchors, no corpus-global
    * window. Multiple (k, w) scales run as independent passes over
    * the pruned-column scan and union: the fine grain localizes
    * short template runs, the coarse grain survives higher df caps
    * on long boilerplate.
    *
    * `minRunChars` is the report floor (default 32): a run must
    * witness at least that many duplicated chars to count. Without
    * it, any two common anchors within maxGap read as a "run" of
    * ~k chars and the output degenerates toward all-pairs on a
    * small-vocabulary corpus (measured: 275 docs → 75k pair rows at
    * the k-char floor); with it, output volume is bounded by REAL
    * duplication, which is what makes the operator 100 TB-shaped.
    *
    * Output per (doc_a, doc_b, k): longest_run_chars (the estimate),
    * n_runs (stitched runs with ≥ `minAnchors` anchors and ≥
    * `minRunChars` chars), n_anchors (total matched anchors in those
    * runs). Pairs with no qualifying run emit nothing. */
  def duplicatedSubstringRuns(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      scales: Seq[(Int, Int)] = Seq((8, 4), (16, 8)),
      dfCap: Int = 50, minAnchors: Int = 2,
      minRunChars: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(scales.nonEmpty && scales.forall { case (k, w) => k > 0 && w > 0 },
      s"duplicatedSubstringRuns: scales must be positive, got $scales")
    require(scales.distinct.size == scales.size,
      s"duplicatedSubstringRuns: duplicate scales in $scales")
    require(dfCap > 0 && minAnchors > 0 && minRunChars > 0,
      s"duplicatedSubstringRuns: dfCap, minAnchors, minRunChars must be positive, got ($dfCap, $minAnchors, $minRunChars)")
    val norm = docs.select(col(idCol).as("doc_id"),
      regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
    val perScale = scales.map { case (k, w) =>
      stitchedRuns(norm, k, w, dfCap, minAnchors, minRunChars)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(
          max(col("run_chars")).cast("bigint").as("longest_run_chars"),
          count(lit(1)).as("n_runs"),
          sum(col("n_anchors")).cast("bigint").as("n_anchors"))
        .select(col("doc_a"), col("doc_b"), lit(k.toLong).as("k"),
          col("longest_run_chars"), col("n_runs"), col("n_anchors"))
    }
    perScale.reduce(_ unionByName _)
  }

  /** The stitched-run frame [[duplicatedSubstringRuns]] aggregates
    * and [[duplicatedSubstringCatalog]] reads raw: one row per
    * qualifying run — (doc_a, doc_b, run_start_a = first anchor gram
    * position in doc_a, run_chars, n_anchors). `norm` must carry
    * (doc_id, __t = normalized text). */
  private def stitchedRuns(norm: DataFrame, k: Int, w: Int, dfCap: Int,
      minAnchors: Int, minRunChars: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = norm
      .select(col("doc_id"), explode(
        graft.functions.ShingleFunctions.winnow_anchors(
          graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k), w))
        .as("__a"))
      .select(col("doc_id"), col("__a.pos").as("pos"), col("__a.fp").as("fp"))
    val rare = anchors.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= dfCap)
    val pruned = anchors.join(rare.select(col("fp")), "fp")
    val a = pruned.as("a"); val b = pruned.as("b")
    // one fp per position, so (pair, pos_a, pos_b) is already unique
    val matched = a.join(b,
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"),
        (col("a.pos") - col("b.pos")).as("diag"))
    val wOrd = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    val maxGap = k + w
    matched
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOrd) > maxGap, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__isl"))
      .agg(count(lit(1)).cast("bigint").as("n_anchors"),
        min(col("pos_a")).as("__lo"), max(col("pos_a")).as("__hi"))
      .filter(col("n_anchors") >= minAnchors &&
        col("__hi") - col("__lo") + lit(k.toLong) >= minRunChars)
      .select(col("doc_a"), col("doc_b"),
        col("__lo").cast("bigint").as("run_start_a"),
        (col("__hi") - col("__lo") + lit(k.toLong)).cast("bigint")
          .as("run_chars"),
        col("n_anchors"))
  }

  /** EXACT longest duplicated substring per document pair at one
    * k-gram grain — the exactness upgrade of
    * [[duplicatedSubstringRuns]] (VERDICT r15 item 6a): EVERY k-gram
    * position participates (no winnowing sample), so a maximal run of
    * R consecutive matched positions on a pair's diagonal witnesses
    * EXACTLY R + k − 1 shared characters. That is the Lee et al.
    * ("Deduplicating Training Data Makes Language Models Better")
    * exact-substring semantics WITHOUT a suffix automaton: rolling
    * k-gram hashes, one bucketed equi-join, one per-diagonal
    * gaps-and-islands window (gap > 1 breaks — consecutive positions
    * only, where the winnowed sibling tolerates k+w).
    *
    * Exactness envelope, stated loudly:
    *  1. substrings shorter than `k` are invisible (grain floor) and
    *     `minRunChars` floors the REPORT — lcs_chars is exact for
    *     every emitted pair, and a pair is emitted iff its true
    *     longest shared run reaches the floor;
    *  2. grams occurring more than `dfCap` times corpus-wide are
    *     dropped before the join, so pairs whose duplication rides a
    *     capped gram can under-report — `n_capped_fps` rides every
    *     output row (the x235 repeated-column convention) so the cap
    *     is visible in the result, never a silent truncation;
    *  3. md5-60 collisions could only over-report, at ~2⁻⁶⁰ per gram
    *     pair — the accepted risk of every md5-60 consumer.
    *
    * Scale: the full-position explode is linear in corpus chars —
    * the deliberate price of exactness (run the winnowed x225
    * estimate for routine monitoring; run THIS as the audit pass —
    * at 100-TB scale over the deterministic md5-60 document sample,
    * the standing x257 declaration, where pair mass scales as the
    * sample fraction squared).
    * The join stays bucketed on the gram hash (pair volume bounded
    * by Σ df² under the cap, the x122 discipline), and the stitch
    * window partitions by (pair, diagonal) — bounded by matched
    * positions, never corpus-global.
    *
    * Output per pair with a qualifying run: (doc_a, doc_b,
    * lcs_chars — exact, n_runs, n_matched_positions, n_capped_fps). */
  def exactDuplicatedSubstrings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, dfCap: Int = 50,
      minRunChars: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && dfCap > 0,
      s"exactDuplicatedSubstrings: k, dfCap must be positive, got ($k, $dfCap)")
    require(minRunChars >= k,
      s"exactDuplicatedSubstrings: minRunChars ($minRunChars) must be >= k ($k) — a run is at least one gram")
    val grams = docs.select(col(idCol).as("doc_id"),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col("doc_id"), posexplode(
        graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("fp"))
    val hist = grams.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .localCheckpoint(true) // feeds the prune AND the capped count
    val capped = hist.filter(col("__df") > dfCap)
      .agg(count(lit(1)).cast("bigint").as("n_capped_fps"))
    val pruned = grams
      .join(hist.filter(col("__df") <= dfCap).select(col("fp")), "fp")
    val a = pruned.as("a"); val b = pruned.as("b")
    val matched = a.join(b,
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), (col("a.pos") - col("b.pos")).as("diag"))
    val wOrd = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    matched
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOrd) > 1L, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__isl"))
      .agg(count(lit(1)).cast("bigint").as("__n"),
        min(col("pos_a")).as("__lo"), max(col("pos_a")).as("__hi"))
      .filter(col("__hi") - col("__lo") + lit(k.toLong) >= minRunChars)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("__hi") - col("__lo") + lit(k.toLong)).cast("bigint")
          .as("lcs_chars"),
        count(lit(1)).as("n_runs"),
        sum(col("__n")).cast("bigint").as("n_matched_positions"))
      .crossJoin(broadcast(capped))
  }

  /** EXACT benchmark-contamination spans — [[exactDuplicatedSubstrings]]
    * crossed over two corpora: for every (corpus doc, benchmark doc)
    * pair sharing a verbatim substring of ≥ `minRunChars` chars, the
    * exact longest contaminated span and WHERE it sits in the corpus
    * doc (the redaction cursor). x27/x65 answer "does any benchmark
    * 5-gram appear"; this answers the question decontamination
    * actually acts on — how LONG the verbatim overlap is and where —
    * at the Lee et al. exact grain (a 40-char quote is citation, a
    * 400-char run is a leaked eval item).
    *
    * Same exactness envelope as the self-corpus operator: grain floor
    * k, report floor `minRunChars` (span_chars is exact for every
    * emitted pair), occurrence df cap over the COMBINED gram table
    * with `n_capped_fps` riding every row.
    *
    * Scale: linear gram explodes on both sides; the contamination
    * join is corpus-grams × benchmark-grams on the hash — bounded by
    * real overlap under the cap, never |corpus|×|benchmark|; islands
    * window partitions by (pair, diagonal).
    *
    * Output per contaminated pair: (doc_id, bench_id, span_chars,
    * corpus_start — 0-based char offset of the longest span in the
    * corpus doc's NORMALIZED text (ties → smallest offset), n_runs,
    * n_matched_positions, n_capped_fps). */
  def exactContaminationSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 16,
      dfCap: Int = 50, minRunChars: Int = 32): DataFrame = {
    val (runs, capped) =
      contaminationRuns(corpus, benchmark, idCol, textCol, k, dfCap, minRunChars)
    runs
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(
        // argmax by (span desc, start asc): max of (rc, -lo) structs
        max(struct((col("__hi") - col("__lo") + lit(k.toLong)).as("rc"),
          (-col("__lo")).as("nl"))).as("__best"),
        count(lit(1)).as("n_runs"),
        sum(col("__n")).cast("bigint").as("n_matched_positions"))
      .select(col("doc_id"), col("bench_id"),
        col("__best.rc").cast("bigint").as("span_chars"),
        (-col("__best.nl")).cast("bigint").as("corpus_start"),
        col("n_runs"), col("n_matched_positions"))
      .crossJoin(broadcast(capped))
  }

  /** The exact cross-corpus run relation [[exactContaminationSpans]]
    * aggregates and [[decontaminationVerdicts]] interval-merges: one
    * row per qualifying (corpus doc, benchmark doc, diagonal) run —
    * (doc_id, bench_id, __lo/__hi = first/last gram position, __n =
    * matched positions) — plus the 1-row capped-fp frame. */
  private def contaminationRuns(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int, dfCap: Int,
      minRunChars: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && dfCap > 0,
      s"contaminationRuns: k, dfCap must be positive, got ($k, $dfCap)")
    require(minRunChars >= k,
      s"contaminationRuns: minRunChars ($minRunChars) must be >= k ($k)")
    def grams(df: DataFrame, out: String) = df
      .select(col(idCol).as(out),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col(out), posexplode(
        graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k)))
      .select(col(out), col("pos").cast("long").as("pos"), col("col").as("fp"))
    val cg = grams(corpus, "doc_id")
    val bg = grams(benchmark, "bench_id")
    // occurrence cap over the COMBINED table: a gram ubiquitous in
    // either corpus fans the join out — one histogram guards both
    val hist = cg.select(col("fp")).unionAll(bg.select(col("fp")))
      .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .localCheckpoint(true)
    val capped = hist.filter(col("__df") > dfCap)
      .agg(count(lit(1)).cast("bigint").as("n_capped_fps"))
    val keep = hist.filter(col("__df") <= dfCap).select(col("fp"))
    val matched = cg.join(keep, "fp").as("a")
      .join(bg.join(keep, "fp").as("b"), col("a.fp") === col("b.fp"))
      .select(col("a.doc_id").as("doc_id"), col("b.bench_id").as("bench_id"),
        col("a.pos").as("pos_a"), (col("a.pos") - col("b.pos")).as("diag"))
    val wOrd = Window.partitionBy(col("doc_id"), col("bench_id"), col("diag"))
      .orderBy(col("pos_a"))
    val runs = matched
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOrd) > 1L, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("bench_id"), col("diag"), col("__isl"))
      .agg(count(lit(1)).cast("bigint").as("__n"),
        min(col("pos_a")).cast("bigint").as("__lo"),
        max(col("pos_a")).cast("bigint").as("__hi"))
      .filter(col("__hi") - col("__lo") + lit(k.toLong) >= minRunChars)
    (runs, capped)
  }

  /** Decontamination VERDICTS — the apply step over
    * [[exactContaminationSpans]]: per corpus document, the exact
    * number of characters covered by verbatim benchmark overlap
    * (runs from ALL benchmark docs and diagonals, merged as
    * intervals so double-counted overlap counts once), its share of
    * the normalized text, and the action a decontamination pass
    * takes — `keep` below `clipShareMicro`, `clip` at/above it,
    * `drop` at/above `dropShareMicro` (a mostly-benchmark document
    * is not salvageable by clipping).
    *
    * Interval merge is gaps-and-islands on the char intervals
    * [lo, hi + k − 1]: per doc ordered by (start, end), a new island
    * starts when start exceeds the running max end + 1 (adjacent
    * spans merge — contiguous contamination is one span). Exact by
    * construction over the exact run relation.
    *
    * Scale: the run relation is the cost (see
    * [[exactContaminationSpans]]); the merge window partitions per
    * corpus doc over its runs — bounded by real contamination.
    * Output covers EVERY corpus doc (clean docs report zeros), one
    * row each.
    *
    * Output: (doc_id, n_chars, contaminated_chars,
    * contaminated_share_micro, n_spans, verdict), ordered by doc_id. */
  def decontaminationVerdicts(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 16,
      dfCap: Int = 50, minRunChars: Int = 32,
      clipShareMicro: Long = 200000L,
      dropShareMicro: Long = 500000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(clipShareMicro >= 0 && dropShareMicro >= clipShareMicro,
      s"decontaminationVerdicts: need 0 <= clipShareMicro <= dropShareMicro, " +
        s"got ($clipShareMicro, $dropShareMicro)")
    val (runs, _) =
      contaminationRuns(corpus, benchmark, idCol, textCol, k, dfCap, minRunChars)
    val iv = runs.select(col("doc_id"), col("__lo").as("__s"),
      (col("__hi") + lit(k.toLong) - lit(1L)).as("__e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__s"), col("__e"))
    val merged = iv
      .withColumn("__pm", max(col("__e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__pm").isNull || col("__s") > col("__pm") + 1L, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg((max(col("__e")) - min(col("__s")) + lit(1L)).as("__chars"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__chars")).cast("bigint").as("contaminated_chars"),
        count(lit(1)).cast("bigint").as("n_spans"))
    corpus
      .select(col(idCol).as("doc_id"),
        length(regexp_replace(trim(lower(col(textCol))), "\\s+", " "))
          .cast("bigint").as("n_chars"))
      .join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("contaminated_chars"), lit(0L)).as("contaminated_chars"),
        when(col("n_chars") > 0,
          expr("(coalesce(contaminated_chars, 0L) * 1000000L) div n_chars"))
          .otherwise(lit(0L)).as("contaminated_share_micro"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .select(col("doc_id"), col("n_chars"), col("contaminated_chars"),
        col("contaminated_share_micro"), col("n_spans"),
        when(col("contaminated_share_micro") >= dropShareMicro, lit("drop"))
          .when(col("contaminated_share_micro") >= clipShareMicro, lit("clip"))
          .otherwise(lit("keep")).as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** Excess-perplexity mixture reweighting — the decision layer over
    * [[crossSourcePerplexity]] (DoReMi's shape, Xie et al. 2023, made
    * exact and replayable): a source whose own LM models it far
    * better than every OTHER source's LM carries unique signal and
    * earns weight; a source anyone can model is redundant.
    *
    *  excess(e) = avg_logp(e under e) − meanₜ≠ₑ avg_logp(e under t)
    *
    * in integer micro-nats (per-cell avg = sum_logp_micro div
    * n_transitions, truncating; the cross mean is one truncating div
    * by S−1), shifted positive (u = excess − min + 10⁶) and
    * normalized (weight_micro = u·10⁶ div Σu) — every step integer,
    * so both engines produce identical weights.
    *
    * Scale: the matrix is the cost ([[crossSourcePerplexity]]'s
    * contract); everything here is |sources|-cardinality arithmetic
    * over its checkpointed 1-matrix frame. A single-source corpus
    * gets weight 10⁶ (excess defined 0).
    *
    * Output: (source, own_avg_micro, cross_avg_micro, excess_micro,
    * weight_micro), ordered by source. */
  def mixtureReweight(docs: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = crossSourcePerplexity(docs, sourceCol, idCol, textCol)
      .localCheckpoint(true) // one matrix feeds diag, cross, and output
    val avg = m.select(col("src_eval"), col("src_train"),
      expr("sum_logp_micro div n_transitions").as("avg_micro"))
    val own = avg.filter(col("src_eval") === col("src_train"))
      .select(col("src_eval").as("source"),
        col("avg_micro").as("own_avg_micro"))
    val cross = avg.filter(col("src_eval") =!= col("src_train"))
      .groupBy(col("src_eval").as("source"))
      .agg(expr("sum(avg_micro) div count(*)").as("cross_avg_micro"))
    val ex = own.join(cross, Seq("source"), "left")
      .select(col("source"), col("own_avg_micro"), col("cross_avg_micro"),
        (col("own_avg_micro") -
          coalesce(col("cross_avg_micro"), col("own_avg_micro")))
          .as("excess_micro"))
      .localCheckpoint(true) // feeds the min, the sum, and the output
    val mn = ex.agg(min(col("excess_micro")).as("__mn"))
    val tot = ex.crossJoin(broadcast(mn))
      .agg(sum(col("excess_micro") - col("__mn") + lit(1000000L)).as("__tot"),
        min(col("__mn")).as("__mn2"))
    ex.crossJoin(broadcast(tot))
      .select(col("source"), col("own_avg_micro"), col("cross_avg_micro"),
        col("excess_micro"),
        expr("((excess_micro - __mn2 + 1000000L) * 1000000L) div __tot")
          .as("weight_micro"))
      .orderBy(col("source"))
  }

  /** Within-document self-repetition at substring grain — the SELF
    * sibling of [[duplicatedSubstringRuns]]: a document's winnowing
    * anchors matched against THEMSELVES (same fingerprint, later
    * position) stitch along the OFFSET diagonal (pos_b − pos_a) into
    * the document's longest internally repeated substring. x138's
    * Gopher fractions measure aggregate repetition; this catches the
    * single long internal copy-paste (lyrics/chorus/boilerplate-
    * within-doc — the within-doc case of the Lee et al. substring
    * read) that a low dup-ngram FRACTION can hide in a long doc.
    *
    * Bounds: fingerprints occurring more than `occCap` times within
    * one doc are dropped before the self-join (the within-doc analog
    * of the near-dup df cap — a pathological doc repeating one gram
    * n times would otherwise fan out n²/2 self-pairs), and
    * `minRunChars` floors the report exactly as in the cross-doc
    * operator. The stitching window partitions by (doc, diag) —
    * bounded by self-matched anchors, never corpus-global.
    *
    * Output per doc with at least one qualifying run: (doc_id,
    * longest_self_run_chars, best_offset = the diagonal of the
    * longest run (min diagonal on ties) — the repeat period, n_runs,
    * n_anchors), ordered by doc_id. */
  def selfRepeatRuns(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, w: Int = 4,
      occCap: Int = 50, minAnchors: Int = 2,
      minRunChars: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && w > 0 && occCap > 0 && minAnchors > 0 && minRunChars > 0,
      s"selfRepeatRuns: all parameters must be positive, " +
        s"got ($k, $w, $occCap, $minAnchors, $minRunChars)")
    val anchors = docs
      .select(col(idCol).as("doc_id"),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col("doc_id"), explode(
        graft.functions.ShingleFunctions.winnow_anchors(
          graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k), w))
        .as("__a"))
      .select(col("doc_id"), col("__a.pos").as("pos"), col("__a.fp").as("fp"))
    val rare = anchors.groupBy(col("doc_id"), col("fp"))
      .agg(count(lit(1)).as("__occ")).filter(col("__occ") <= occCap)
      .select(col("doc_id"), col("fp"))
    val capped = anchors.join(rare, Seq("doc_id", "fp"))
    val a = capped.as("a"); val b = capped.as("b")
    val matched = a.join(b,
        col("a.doc_id") === col("b.doc_id") && col("a.fp") === col("b.fp") &&
          col("a.pos") < col("b.pos"))
      .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos_a"),
        (col("b.pos") - col("a.pos")).as("diag"))
    val wOrd = Window.partitionBy(col("doc_id"), col("diag"))
      .orderBy(col("pos_a"))
    val maxGap = k + w
    matched
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOrd) > maxGap, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("diag"), col("__isl"))
      .agg(count(lit(1)).cast("bigint").as("__na"),
        min(col("pos_a")).as("__lo"), max(col("pos_a")).as("__hi"))
      .filter(col("__na") >= minAnchors &&
        col("__hi") - col("__lo") + lit(k.toLong) >= minRunChars)
      .select(col("doc_id"), col("diag"),
        (col("__hi") - col("__lo") + lit(k.toLong)).cast("bigint")
          .as("__rc"),
        col("__na"))
      .groupBy(col("doc_id"))
      .agg(max(col("__rc")).as("longest_self_run_chars"),
        // (max rc, min diag among the max-rc runs) via struct-min —
        // the x212 top_dim tie-break idiom
        min(struct((-col("__rc")).as("nrc"), col("diag").as("d"))).as("__b"),
        count(lit(1)).as("n_runs"),
        sum(col("__na")).cast("bigint").as("n_anchors"))
      .select(col("doc_id"), col("longest_self_run_chars"),
        col("__b.d").cast("bigint").as("best_offset"),
        col("n_runs"), col("n_anchors"))
      .orderBy(col("doc_id"))
  }

  /** Duplicated-boilerplate CATALOG — the top-N longest duplicated
    * runs of [[duplicatedSubstringRuns]] with the actual TEXT: the
    * run bounds come from the stitched anchor frame at one (k, w)
    * grain, and the snippet is `substr(normalized_text_a,
    * run_start+1, run_chars)` — the answer to "what IS the
    * boilerplate" that the per-pair statistics can only count. The
    * snippet cut is on the NORMALIZED text (the same
    * lowercase/whitespace-collapsed form the anchors hashed), so the
    * reported string is exactly the region the anchors witnessed.
    * Estimate caveat (inherited from the stitcher): anchors pin
    * matching k-grams every ≤ k+w chars along the diagonal — a
    * same-length substitution that fits entirely BETWEEN two anchors
    * can survive stitching, so the snippet is duplicated text up to
    * sub-gap edits, not a byte-for-byte guarantee.
    *
    * Determinism: the top-N cut totally orders by (run_chars DESC,
    * doc_a, doc_b, run_start_a) — compiles to TakeOrderedAndProject.
    * Scale: the run frame is bounded by real duplication (df-capped,
    * minRunChars-floored); only the top-N rows join back to the doc
    * text (broadcast of N ids against the pruned-column scan).
    *
    * Output: (doc_a, doc_b, run_start_a, run_chars, n_anchors,
    * snippet), top `topN`. */
  def duplicatedSubstringCatalog(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, w: Int = 8,
      dfCap: Int = 50, minAnchors: Int = 2, minRunChars: Int = 32,
      topN: Int = 10): DataFrame = {
    require(k > 0 && w > 0 && dfCap > 0 && minAnchors > 0 &&
      minRunChars > 0 && topN > 0,
      s"duplicatedSubstringCatalog: all parameters must be positive, " +
        s"got ($k, $w, $dfCap, $minAnchors, $minRunChars, $topN)")
    val norm = docs.select(col(idCol).as("doc_id"),
      regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
    val top = stitchedRuns(norm, k, w, dfCap, minAnchors, minRunChars)
      .orderBy(col("run_chars").desc, col("doc_a"), col("doc_b"),
        col("run_start_a"))
      .limit(topN)
      .localCheckpoint(true) // ≤ topN rows, feeds the id cut AND the output
    val texts = norm
      .join(broadcast(top.select(col("doc_a")).distinct()),
        col("doc_id") === col("doc_a"))
      .select(col("doc_id").as("doc_a"), col("__t"))
    top.join(texts, "doc_a")
      .select(col("doc_a"), col("doc_b"), col("run_start_a"),
        col("run_chars"), col("n_anchors"),
        expr("substring(__t, CAST(run_start_a AS INT) + 1, " +
          "CAST(run_chars AS INT))").as("snippet"))
      .orderBy(col("run_chars").desc, col("doc_a"), col("doc_b"),
        col("run_start_a"))
  }

  /** Skip-gram PMI: token pairs co-occurring within a ±`window`
    * position offset, scored by pointwise mutual information against
    * the unigram model — the word2vec-statistics view of a corpus
    * (Levy & Goldberg: SGNS factorizes exactly this matrix). The
    * top-N cells are the corpus's strongest collocations; a sudden
    * new high-PMI pair is the classic template/boilerplate smell.
    *
    * Determinism: pairs canonicalize alphabetically, counts are exact
    * BIGINTs, and the one float op is ln of an explicit
    * left-to-right double product/quotient tree (identical tree in
    * the oracle → identical IEEE result), rounded to micro-nats. The
    * top-N cut totally orders by (pmi DESC, pair) and compiles to
    * TakeOrderedAndProject.
    *
    * Scale: positions explode ×window (bounded small); the pair
    * relation builds by an EQUI-join on (doc, position+d) — never a
    * per-doc cross product — and collapses immediately to pair
    * counts (partial+final). `minCount` prunes the long tail before
    * the margin joins. Output: (tok_a, tok_b, n_pair, n_a, n_b,
    * pmi_micro). */
  def skipgramPmi(docs: DataFrame, textCol: String = "text",
      window: Int = 2, minCount: Int = 5, topN: Int = 50): DataFrame = {
    require(window > 0 && minCount > 0 && topN > 0,
      s"skipgramPmi: window, minCount, topN must be positive, got ($window, $minCount, $topN)")
    import graft.functions.TextFunctions.words
    val toks = docs
      .select(col("doc_id"), posexplode(words(col(textCol))))
      .toDF("doc_id", "pos", "tok")
      .localCheckpoint(true) // both pair sides + the margins
    val margins = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val totalToks = margins.agg(sum(col("n_w")).cast("bigint").as("__nn"))
    val shifted = toks
      .withColumn("__d", explode(sequence(lit(1), lit(window))))
      .select(col("doc_id"), (col("pos") + col("__d")).as("pos"),
        col("tok").as("__t1"))
    val pairCounts = shifted
      .join(toks.select(col("doc_id"), col("pos"), col("tok").as("__t2")),
        Seq("doc_id", "pos"))
      .select(least(col("__t1"), col("__t2")).as("tok_a"),
        greatest(col("__t1"), col("__t2")).as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .localCheckpoint(true) // feeds the total AND the scored join
    val totalPairs = pairCounts.agg(sum(col("n_pair")).cast("bigint").as("__tp"))
    pairCounts
      .join(margins.select(col("tok").as("tok_a"), col("n_w").as("n_a")), "tok_a")
      .join(margins.select(col("tok").as("tok_b"), col("n_w").as("n_b")), "tok_b")
      .join(broadcast(totalPairs)).join(broadcast(totalToks))
      .withColumn("pmi_micro", round(log(
        col("n_pair").cast("double") * col("__nn").cast("double") *
          col("__nn").cast("double") /
          (col("__tp").cast("double") * col("n_a").cast("double") *
            col("n_b").cast("double"))) * lit(1e6)).cast("long"))
      .select(col("tok_a"), col("tok_b"), col("n_pair").cast("bigint").as("n_pair"),
        col("n_a").cast("bigint").as("n_a"), col("n_b").cast("bigint").as("n_b"),
        col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("tok_a"), col("tok_b"))
      .limit(topN)
  }

  /** Docs sharing an identical content fingerprint (exact-ish near-dup
    * at fingerprint resolution): bucket join on the 32-bit hashed
    * sketch for shuffle economy, then VERIFY full fingerprint equality
    * — at ~100k docs the 32-bit bucket alone would already emit
    * birthday-collision false pairs. */
  def fingerprintDup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", portableMd5: Boolean = false): DataFrame = {
    def fp(c: org.apache.spark.sql.Column) =
      if (portableMd5) fingerprintMd5(c) else fingerprint(c)
    val fps = docs.select(
        col(idCol).as("doc_id"),
        fp(col(textCol)).as("fp"),
        hash(fp(col(textCol))).as("fp_hash"))
      // docs shorter than the shingle length all sketch to [] — without
      // this filter every pair of them would verify as a "dup"
      .filter(size(col("fp")) > 0)
      .localCheckpoint(true) // both sides of the self-join
    val a = fps.as("a"); val b = fps.as("b")
    a.join(b,
        col("a.fp_hash") === col("b.fp_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.fp") === col("b.fp"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }

  /** Cross-group n-gram overlap matrix: for every pair of groups
    * (sources, shards, crawl snapshots…), the count of distinct word
    * n-grams they share and the Jaccard of their gram sets — the
    * corpus-audit view of contamination ("how much does src_a leak
    * into src_b"), generalizing the one-benchmark screen of
    * [[contaminationScreen]] to all-pairs.
    *
    * Scale: grams are reduced to portable md5-60 longs before the
    * wide exchanges, so the shuffle carries 8-byte keys, not n-word
    * strings. The self-join is an inverted-index join keyed on the
    * gram hash: each hash's posting list holds at most one row per
    * GROUP, so per-gram join fan-out is bounded by groups² — total
    * work is O(|distinct grams| × groups²), linear in corpus size for
    * a fixed group count, never the O(docs²) pair explosion. Group
    * sizes (20 rows for 20 sources) broadcast to the pair frame. */
  def crossGroupOverlap(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", ngram: Int = 3): DataFrame = {
    import graft.functions.ShingleFunctions.md5_ngram_hashes
    import graft.functions.TextFunctions.words
    // distinct (group, gram-hash) — hashing happens inside the
    // codegen'd kernel (the ONE Spark-side rendering of the md5-60
    // contract), so the explode and every exchange carry 8-byte longs,
    // never gram strings
    val g = docs
      .select(col(groupCol).as("grp"),
        explode(array_distinct(
          md5_ngram_hashes(words(col(textCol)), ngram))).as("h"))
      .distinct()
      .localCheckpoint(true) // feeds the sizes agg and both join sides
    val sizes = g.groupBy(col("grp")).agg(count(lit(1)).as("sz"))
    val shared = g.toDF("src_a", "h").as("a")
      .join(g.toDF("src_b", "h2").as("b"),
        col("a.h") === col("b.h2") && col("a.src_a") < col("b.src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.toDF("src_a", "sz_a")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "sz_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"),
        round(col("shared") / (col("sz_a") + col("sz_b") - col("shared")), 6)
          .as("jaccard"))
  }

  /** Temperature resampling toward stratum balance: each stratum keeps
    * a deterministic hash-rate sample with keep probability
    * (n_min/n_stratum)^invTemp — invTemp = 1 exactly equalizes
    * (expected) stratum sizes, invTemp = 0.5 ("T = 2") softens the
    * downsampling of dominant strata, the standard multilingual-mix
    * rebalance. Per-row keep is md5-60(key) mod 2²⁰ < floor(rate·2²⁰):
    * content-stable, engine-reproducible, independent of partition
    * layout (unlike `sample()`), and a doc keeps/drops CONSISTENTLY as
    * the corpus grows — rates move, but the hash is fixed.
    *
    * invTemp = 0.5 computes via `sqrt`, which IEEE requires correctly
    * rounded — the rate doubles are bit-identical across engines.
    * Other exponents go through `pow` (libm, last-ulp hazard): fine
    * for production, but pin tests/oracles to the sqrt path.
    *
    * Scale: stratum rates are one small agg crossed with a 1-row min,
    * broadcast back onto a map-side filter — no corpus shuffle at all. */
  def temperatureResample(df: DataFrame, keyCol: String, strataCol: String,
      invTemp: Double = 0.5): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__mn"))
    val rate =
      if (invTemp == 0.5) sqrt(col("__mn") / col("__n"))
      else pow(col("__mn") / col("__n"), invTemp)
    val rates = counts.join(broadcast(minN))
      .withColumn("__th", floor(rate * (1 << 20)).cast("bigint"))
      .select(col(strataCol).as("__strata"), col("__th"))
    // null-safe stratum match (a NULL stratum is still a stratum and
    // must not silently drop its rows); a NULL key cannot be hashed
    // deterministically → __kept 0, never NULL
    df.join(broadcast(rates), col(strataCol) <=> col("__strata"))
      .withColumn("__kept",
        coalesce((md5Bucket60(col(keyCol)) % (1 << 20) < col("__th")).cast("int"),
          lit(0)))
      .drop("__strata", "__th")
  }

  /** Mixture upsampling toward stratum balance — the oversampling dual
    * of [[temperatureResample]]: every stratum is inflated UP to the
    * size of the largest one by emitting each row `floor(target/n)`
    * times plus one extra copy for a deterministic hash-chosen
    * `(target mod n)`-expected fraction of its rows. This is the
    * "repeat rare sources for N epochs" mixture step of a pretraining
    * data recipe, made reproducible: copy counts are a pure function of
    * the row key and the stratum census, never of partition layout.
    *
    * The fractional gate is EXACT integer arithmetic — extra copy iff
    * md5-60(key) mod n < target mod n — so there is no float rate to
    * round and the oracle replays it verbatim (no 2²⁰ quantization as
    * in the resample path).
    *
    * Scale: the census is one tiny agg broadcast back; the explode is
    * map-side with per-row fan-out target/n (bounded by the stratum
    * imbalance — the inflation IS the requested work). Output carries
    * `copy_idx` (1-based) so downstream shuffles can re-salt copies of
    * the same row apart. A NULL key gets the base copies but never the
    * hash-gated extra (no deterministic hash exists for it). */
  def mixtureUpsample(df: DataFrame, keyCol: String, strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val target = counts.agg(max(col("__n")).as("__t"))
    val plan = counts.join(broadcast(target))
      .select(col(strataCol).as("__strata"),
        expr("__t div __n").as("__base"),
        (col("__t") % col("__n")).as("__rem"),
        col("__n"))
    df.join(broadcast(plan), col(strataCol) <=> col("__strata"))
      .withColumn("__copies",
        (col("__base") + coalesce(
          (pmod(md5Bucket60(col(keyCol)), col("__n")) < col("__rem")).cast("int"),
          lit(0))).cast("int"))
      .withColumn("copy_idx", explode(sequence(lit(1), col("__copies"))))
      .drop("__strata", "__base", "__rem", "__n", "__copies")
  }

  /** Lexical nearest neighbor: each document's single most similar
    * OTHER document by term-frequency cosine, the term space being
    * word `ngram`-grams (unigrams degenerate on small-vocabulary
    * corpora — every word is a stopword there), with corpus-common
    * terms pruned (df · 100 > n_docs · maxDfPct ⇒ dropped) — the
    * sparse bag-of-words sibling of the embedding top-k (x06), and the
    * tf-weighted cosine complement of x04's set-semantics Jaccard. An
    * inverted-index equi-join on the term replaces the cross join, so
    * candidate work is Σ_term df² over RARE terms only; the df prune
    * is what bounds that sum (the classic stopword cutoff — without it
    * one ubiquitous term pairs every document with every other).
    *
    * Exactness contract: tfs, dot products and squared norms are
    * integers, each < 2^53 for any doc under ~10⁵ tokens, so their
    * int→double casts are exact; cos² = (dot·dot) / (na²·nb²) is then
    * two double multiplies and one division — three correctly-rounded
    * IEEE ops, bit-identical on any engine (the x34 rule). The casts
    * happen BEFORE the multiplies: squaring in int64 would overflow
    * at dot ≥ 2^31.5, well inside the stated envelope. Squaring
    * preserves the cosine order (all values ≥ 0), so ranking by
    * (cos² DESC, neighbor ASC) needs no square root; the UNROUNDED
    * value ranks, only the output is rounded.
    *
    * Scale: tf and df are partial+final hash aggs; norms re-key tf by
    * doc. The per-doc argmax runs on the candidate pair relation
    * (bounded by the df prune), not the corpus. For web-scale corpora
    * the banded-MinHash path (x47) is the recall-oriented alternative;
    * this is the exact-scoring one. */
  def lexicalTopNeighbor(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, maxDfPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tokFrame(docs, idCol, textCol)
      .select(col("doc_id"),
        explode(graft.functions.ShingleFunctions.ngram_strings(
          col("__w"), ngram)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val nDocs = docs.select(count(lit(1)).as("__nd"))
    // kept feeds three consumers (norms, both pair-join sides) — left
    // UNmaterialized on purpose: the shared shuffle subtrees hit
    // Spark's ReuseExchange, and an eager localCheckpoint measured
    // ~40 % SLOWER at sf0.1 (it blocks pipelining for a frame that is
    // cheap to recompute from the reused exchanges)
    val kept = tf.join(df, "term").join(broadcast(nDocs))
      .filter(col("__df") * 100 <= col("__nd") * maxDfPct)
      .select(col("doc_id"), col("term"), col("tf"))
    val norms = kept.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    val undirected = pairs.select(col("da"), col("db"), col("dot"))
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db"), col("dot")))
    val scored = undirected
      .join(norms.toDF("da", "na2"), "da")
      .join(norms.toDF("db", "nb2"), "db")
      .select(col("da").as("doc_id"), col("db").as("nn_id"), col("dot"),
        ((col("dot").cast("double") * col("dot").cast("double")) /
          (col("na2").cast("double") * col("nb2").cast("double"))).as("__c2"))
    // per-doc argmax as ONE partial+final min(struct) aggregation
    // (r18, guide §2.3 "aggregate before you shuffle"): the former
    // row_number window shuffled AND sorted the whole candidate pair
    // relation per doc; the struct min combines map-side, carries
    // 16 bytes per doc through the exchange, and orders identically —
    // (-cos² ASC, nn ASC) = (cos² DESC, nn ASC); cos² ≥ 0 so the
    // negation is sign-safe in IEEE doubles
    scored.groupBy(col("doc_id"))
      .agg(min(struct((-col("__c2")).as("nc"), col("nn_id").as("nn"),
        col("dot").as("dot"), col("__c2").as("c2"))).as("__b"))
      .select(col("doc_id"), col("__b.nn").as("nn_id"),
        col("__b.dot").cast("long").as("dot"),
        round(col("__b.c2"), 6).as("cos2"))
  }

  /** First-failing-rule attrition report: every document is attributed
    * to the FIRST quality rule it fails (too_short → length_outlier →
    * repetitive → boilerplate → kept), and the output is the per-rule
    * document/char count — the pretraining-filter funnel view ("which
    * rule costs how much corpus"), the oracle-checkable sibling of
    * [[graft.pipelines.CorpusPipeline]]'s attrition report.
    *
    * Ordering matters and is part of the contract: attribution is
    * first-fail, so rule counts change if the funnel is reordered
    * (the cheapest-narrowest rules come first, mirroring the
    * execution order a real pipeline would use).
    *
    * Scale: three narrow per-doc metric frames (token count is a
    * projection; repetition and boilerplate are the x29/x34 agg
    * plans) joined back on the doc id, a 1-row percentile bound
    * broadcast, one final small groupBy. Rule predicates compare the
    * same round-6 doubles both engines produce for x29/x34. */
  def filterAttribution(docs: DataFrame, minTokens: Int = 20,
      pLo: Double = 0.05, pHi: Double = 0.95,
      maxRepetition: Double = 0.06, maxBoiler: Double = 0.95,
      idCol: String = "doc_id", textCol: String = "text",
      lenCol: String = "n_chars"): DataFrame = {
    import graft.functions.TextFunctions.words
    // ONE tokenization pass: the materialized token frame feeds the
    // token-count projection and both gram metrics (round-5 lesson —
    // re-tokenizing per metric was the x32 anti-pattern)
    val toks = docs
      .select(col(idCol).as("doc_id"), col(lenCol).as("__len"),
        words(col(textCol)).as("__w"))
      .localCheckpoint(true)
    val rep = repetitionRatioFromTokens(toks.select(col("doc_id"), col("__w")), 2)
    val boil = boilerplateScreenFromTokens(
        toks.select(col("doc_id"), col("__w")), 2, 5)
      .select(col("doc_id"), col("boiler_frac"))
    val bounds = percentileBounds(docs, pLo, pHi, lenCol)
    toks
      .select(col("doc_id"), col("__len"), size(col("__w")).as("__nt"))
      .join(rep, Seq("doc_id"), "left")
      .join(boil, Seq("doc_id"), "left")
      .join(broadcast(bounds))
      .select(col("__len"),
        when(col("__nt") < minTokens, "too_short")
          .when(col("__len") < col("__lo") || col("__len") > col("__hi"),
            "length_outlier")
          .when(coalesce(col("top_gram_ratio"), lit(0.0)) > maxRepetition,
            "repetitive")
          .when(coalesce(col("boiler_frac"), lit(0.0)) > maxBoiler,
            "boilerplate")
          .otherwise("kept").as("verdict"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n"), sum(col("__len")).cast("bigint").as("chars"))
  }

  /** Portable PII regexes: the Java-regex / RE2 COMMON SUBSET only
    * (char classes, bounded repeats, `\b`, `\d`), so Spark's
    * `regexp_replace` and any RE2-based engine (the DuckDB oracle)
    * match the exact same spans. No lookaround, no backrefs. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val LongNumRe = "\\d{9,}"

  /** PII redaction: scrub emails, IPv4 addresses and long digit runs
    * (account/card numbers) from the text, in THAT order — order is
    * part of the contract (emails contain dots+digits, IPv4 octets
    * contain digits; each later pattern runs on the already-redacted
    * text so spans never double-count). Per-stage match counts are
    * taken on that stage's input, so they equal what the replace
    * actually rewrote.
    *
    * Scale: one narrow codegen'd projection, no shuffle, no UDF — the
    * regex work pipelines into whatever sink follows. At 100 TB the
    * regex set grows (phones, SSNs, keys) but the shape stays a single
    * sequential-rewrite projection.
    *
    * Output: (doc_id, n_emails, n_ipv4, n_longnum, redacted). */
  def redactPii(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, LongNumRe, "<NUM>")
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(t0, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t1, lit(Ipv4Re), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(t2, lit(LongNumRe), lit(0))).as("n_longnum"),
      t3.as("redacted"))
  }

  /** Sub-document (span-level) corpus dedup, CCNet/C4-style: split
    * every document into consecutive `spanWords`-word spans, remove
    * the spans that occur in at least `minDocDf` DISTINCT documents
    * (corpus-duplicated paragraphs: headers, license blurbs, mirrored
    * passages), and reassemble what remains in original order. The
    * corpus fixture has no newlines, so the "paragraph" unit is the
    * fixed word window — the operator is agnostic to how spans were
    * cut.
    *
    * Scale shape: span cutting is ONE narrow generator projection
    * (array slice arithmetic — no per-word explode/regroup shuffle);
    * document frequency is a hash agg keyed on the span's md5 (8-byte
    * groups after the first exchange); the join back is an equi-join
    * on that hash; reassembly re-aggregates by doc id. Three shuffles
    * total, each on a uniform key — no window over the corpus, no
    * driver state. Duplicated-span skew (one blurb in every doc)
    * lands on single hash keys: bounded because each doc contributes
    * a span ONCE per position and AQE splits the hot reduce side.
    *
    * Output: one row per INPUT document — (doc_id, n_spans, n_removed,
    * clean_hash), clean_hash = md5 of the space-joined surviving spans
    * (md5('') when everything was removed, and for 0-word docs, which
    * report (0, 0, md5('')) rather than vanishing from the audit). */
  def spanDedup(docs: DataFrame, spanWords: Int = 10, minDocDf: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(spanWords > 0, s"spanDedup: spanWords must be positive, got $spanWords")
    require(minDocDf > 1, s"spanDedup: minDocDf must be > 1, got $minDocDf")
    val nSpans = ceil(size(col("__w")) / lit(spanWords.toDouble)).cast("int")
    val spans = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      // 0-word docs: sequence(0, -1) would emit a DESCENDING ramp, not
      // an empty one — cut them before the generator (restored by the
      // final left join so the report still covers the whole corpus)
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), nSpans - 1),
          i => array_join(
            slice(col("__w"), i * spanWords + 1, lit(spanWords)), " "))))
      .toDF("doc_id", "span_id", "span")
      .withColumn("h", md5(col("span")))
      .localCheckpoint(true) // feeds the df agg AND the join back
    val dfreq = spans.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val report = spans.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("df") >= minDocDf, 1L).otherwise(0L)).cast("bigint")
          .as("n_removed"),
        // collect_list drops nulls, so only surviving spans enter;
        // array_sort on (span_id, span) structs restores doc order
        md5(array_join(transform(
          array_sort(collect_list(
            when(col("df") < minDocDf, struct(col("span_id"), col("span"))))),
          s => s.getField("span")), " ")).as("clean_hash"))
    // every input doc gets a report row — a doc that tokenized to zero
    // words must not silently vanish from a corpus-accounting output
    docs.select(col(idCol).as("doc_id"))
      .join(report, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_hash"), md5(lit(""))).as("clean_hash"))
  }

  /** Percentile-based length trim: keep documents whose length lies in
    * [p(lo), p(hi)] of the corpus distribution — the tail-clipping
    * quality pass (truncated docs and boilerplate mega-docs both live
    * in the tails). Returns the per-stratum keep report.
    *
    * DISCRETE percentiles on purpose: `percentile_disc` returns an
    * actual data value (an exact BIGINT here), so the keep predicate
    * compares integers — engine-exact. A continuous percentile would
    * interpolate, and an interpolated double landing within an ulp of
    * an integer could flip a boundary doc between engines.
    *
    * Scale: the two thresholds are ONE corpus aggregate broadcast to
    * the filter pass; everything else is a map-side predicate + one
    * small groupBy. At 100 TB the exact percentile agg would move to
    * `approx_percentile` with a pinned accuracy — same plan shape. */
  def lengthTrim(docs: DataFrame, lo: Double, hi: Double,
      lenCol: String = "n_chars", strataCol: String = "lang"): DataFrame = {
    val bounds = percentileBounds(docs, lo, hi, lenCol)
    val kept = col(lenCol) >= col("__lo") && col(lenCol) <= col("__hi")
    docs.join(broadcast(bounds))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("total"),
        sum(when(kept, 1L).otherwise(0L)).as("kept"),
        sum(when(kept, col(lenCol)).otherwise(0L)).cast("bigint")
          .as("kept_chars"))
  }

  /** BM25 saturation/length-normalization constants, shared with the
    * oracle SQL (interpolated as `Double.toString`, which round-trips,
    * so both engines run the IDENTICAL doubles). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 retrieval: score every document against a literal query set
    * and keep the top `k` per query — the lexical-search sibling of
    * x55's tf-cosine pairing and x32's rational tf-idf (this one adds
    * term saturation `tf·(k1+1)/(tf+k1·norm)` and document-length
    * normalization, the two things BM25 exists for).
    *
    * Reproducibility contract (the hash-gate design): per-(doc, term)
    * weights are FIXED-POINT — `round(1e6 · idf_q · tfpart)` as BIGINT
    * — so the per-query score is an exact integer sum, immune to
    * floating summation order across engines/partitions (the x55 rule:
    * take differences in integer space). The only transcendental, the
    * Lucene-style idf `ln(1 + (N-df+.5)/(df+.5))`, is quantized to 6
    * decimals per DISTINCT term before it multiplies anything, so a
    * last-ulp `ln` divergence between libm implementations cannot
    * propagate. Lucene itself shipped fixed-point norms for years —
    * determinism over the 7th decimal is the right trade for a gate.
    *
    * Scale: tokens are pruned to the query vocabulary BEFORE the
    * (doc, term) aggregate, so the shuffled tf relation is bounded by
    * Σdf(query terms), not corpus size; `dl` rides the explode (no
    * corpus self-join to recover lengths); corpus stats and the query
    * list broadcast. Final ranking is the bounded-heap
    * [[graft.functions.TopKScored]] aggregator (the x59 pattern), NOT
    * a per-query row_number window: a query containing one common term
    * scores a large fraction of the corpus, and a window would shuffle
    * ALL of that query's candidates into a single partition to keep k
    * — the exact heavy-hitter skew [[sourceCapStats]] avoids. The heap
    * combines map-side, so the exchange carries at most k rows per
    * (partition, query). The long→double score cast inside the heap is
    * exact: score_micro is bounded by ~terms·2·10⁷ ≪ 2⁵³. */
  def bm25Retrieval(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int = 10, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val queryTerms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = tokFrame(docs, idCol, textCol)
    val stats = toks.agg(count(lit(1)).as("__nd"),
      sum(size(col("__w")).cast("long")).as("__sumdl"))
    // dl travels WITH the exploded tokens: no join back to a lengths frame
    val tf = toks
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("__sumdl").cast("double") / col("__nd").cast("double")
    val idfQ = round(log(
      ((col("__nd").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) + lit(1.0)), 6)
    val tfpart = (col("tf").cast("double") * lit(Bm25K1 + 1.0)) /
      (col("tf").cast("double") + lit(Bm25K1) *
        (lit(1.0 - Bm25B) + lit(Bm25B) * (col("dl").cast("double") / avgdl)))
    val weights = tf.join(dfreq, "term").join(broadcast(stats))
      .select(col("doc_id"), col("term"),
        round((idfQ * tfpart) * lit(1000000.0)).cast("long").as("__w"))
    val scored = weights.join(broadcast(queryTerms), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__w")).as("score_micro"))
    // (score DESC, id ASC) — identical tie-break to the window form
    // `row_number() OVER (PARTITION BY query_id ORDER BY score_micro
    // DESC, doc_id)`, pinned by the oracle SQL which still ranks with
    // that exact window.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    scored.schema("doc_id").dataType match {
      case idType @ (ByteType | ShortType | IntegerType | LongType) =>
        val topk = udaf(new graft.functions.TopKScored(k))
        scored
          .groupBy(col("query_id"))
          .agg(topk(col("doc_id").cast("long"), col("score_micro").cast("double")).as("__top"))
          .select(col("query_id"), posexplode(col("__top")))
          .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
            col("col.id").cast(idType).as("doc_id"),
            col("col.score").cast("long").as("score_micro"))
          .orderBy(col("query_id"), col("rank"))
      case _ =>
        // string-id corpora: casting to long would null every id inside
        // the typed aggregator, so rank with a window (same contract;
        // Spark's WindowGroupLimit still bounds per-partition rows, but
        // heavy-hitter queries shuffle their full candidate set — map
        // ids to a dense integral key first when that matters).
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col("doc_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col("doc_id"), col("score_micro"))
          .orderBy(col("query_id"), col("rank"))
    }
  }

  /** Per-source corpus cap report: each source keeps at most `cap`
    * documents ranked by (length DESC, id ASC); the output is the
    * per-source accounting — total, kept, dropped, and the cutoff
    * document (the weakest one that still made the cap) — the
    * "no domain dominates the corpus" guardrail every web-scale
    * pretraining mix applies per domain.
    *
    * Scale: ranking uses the bounded-heap [[graft.functions.TopKScored]]
    * aggregator, so the plan is ONE partial+final aggregate holding at
    * most `cap` (id, score) pairs per source map-side — the corpus is
    * never window-shuffled by source (heavy-hitter domains are exactly
    * where a per-source row_number would skew). The oracle replays the
    * same semantics AS a window, pinning heap == window. */
  def sourceCapStats(docs: DataFrame, cap: Int = 20,
      groupCol: String = "source", lenCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    val topk = udaf(new graft.functions.TopKScored(cap))
    val cut = element_at(col("__top"), size(col("__top")))
    docs.filter(col(lenCol).isNotNull)
      .groupBy(col(groupCol).as("source"))
      .agg(count(lit(1)).as("total"),
        topk(col(idCol), col(lenCol).cast("double")).as("__top"))
      .select(col("source"), col("total"),
        least(col("total"), lit(cap.toLong)).as("kept"),
        (col("total") - least(col("total"), lit(cap.toLong))).as("dropped"),
        cut.getField("id").as("cut_doc_id"),
        cut.getField("score").cast("long").as("cut_chars"))
      .orderBy(col("source"))
  }

  /** Out-of-vocabulary rate per document against the corpus's own top
    * `vocabSize` terms — the tokenizer-coverage signal (a doc whose
    * tokens mostly miss the vocabulary is noise, another language, or
    * evidence the vocabulary is too small).
    *
    * Engine-exact by construction: vocabulary selection is a total
    * order (corpus tf DESC, term ASC) + limit; per-doc counts are
    * integer sums; the rate is ONE division of exact integers
    * (correctly rounded, bit-identical), null for token-less docs.
    *
    * Scale: one tokenize/explode feeds BOTH the vocabulary aggregate
    * and the per-doc counts (materialized via localCheckpoint, the x32
    * pattern); the vocabulary is top-V via TakeOrdered (no full sort)
    * and broadcasts to a map-side membership probe. */
  def oovRate(docs: DataFrame, vocabSize: Int = 30,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = tokFrame(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("__w")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).cast("bigint").as("ctf"))
      .orderBy(col("ctf").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("__v"))
    val perDoc = tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("bigint").as("n_tokens"),
        sum(when(col("__v").isNull, col("tf")).otherwise(0L)).cast("bigint").as("n_oov"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM average log-probability per document — the CCNet-style
    * LM quality filter: train an add-one-smoothed unigram model on a
    * REFERENCE corpus (a trusted "clean" slice), then score every
    * document by its mean per-token log-probability. Documents that
    * read nothing like the reference (other languages, boilerplate,
    * gibberish) score far below it and are the filter candidates.
    * Smoothing is add-one over the reference vocabulary
    * (p(w) = (c(w)+1)/(T+V+1)); an unseen word takes the same formula
    * at c = 0, so every token has finite mass and the score is total.
    *
    * Hash-portable fixed point (the bm25Retrieval discipline): each
    * term's log-prob is quantized ONCE to integer micro-nats
    * (round(ln p, 6)·10⁶) and per-document accumulation is an integer
    * SUM — engine ulp differences in `ln` die inside the per-term
    * quantization and can never accumulate across a document.
    * `avg_logp` divides the two exact integers once at the end
    * (one correctly-rounded double op, bit-identical across engines).
    *
    * Scale: reference term counts are one partial+final aggregate; the
    * scoring join is a SHUFFLED equi-join on term — a web-scale
    * reference vocabulary (10⁸⁺ terms) is exactly what a hash join is
    * for, deliberately NOT a broadcast; the 1-row (T, V) stats frame
    * broadcasts everywhere it appears. No windows, no driver-side
    * model object — the "model" IS a DataFrame.
    * Output: (doc_id, n_tokens, sum_logp_micro, avg_logp), one row per
    * input document (token-less docs keep n_tokens = 0, null score). */
  def unigramLogProb(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val refTf = tokFrame(ref, idCol, textCol)
      .select(explode(col("__w")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__c"))
    val stats = refTf.agg(
      sum(col("__c")).cast("bigint").as("__t"), count(lit(1)).as("__v"))
    // integer micro-nats after this line — the only transcendental op,
    // quantized per TERM, never per accumulation step
    def lpMicro(c: Column): Column =
      round(round(log((c.cast("double") + lit(1.0)) /
        (col("__t").cast("double") + col("__v").cast("double") + lit(1.0))), 6) *
        lit(1000000.0)).cast("long")
    val vocab = refTf.join(broadcast(stats))
      .select(col("term"), lpMicro(col("__c")).as("__lp"))
    val docTf = tokFrame(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("__w")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("__tf"))
    val scored = docTf.join(vocab, Seq("term"), "left")
      .join(broadcast(stats))
      .select(col("doc_id"), col("__tf"),
        coalesce(col("__lp"), lpMicro(lit(0L))).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__tf")).cast("bigint").as("n_tokens"),
        sum(col("__tf") * col("__lp")).cast("bigint").as("sum_logp_micro"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("sum_logp_micro"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          round(col("sum_logp_micro").cast("double") /
            (col("n_tokens").cast("double") * lit(1000000.0)), 6)).as("avg_logp"))
  }

  /** Per-source distinctive terms (class-based TF-IDF): for every
    * source, the terms that characterize it AGAINST the other sources
    * — term frequency within the source × ln(S/df) where df is the
    * number of sources containing the term, so ubiquitous terms score
    * exactly zero and source-exclusive terms score highest. The
    * corpus-profiling read: what is each provider actually
    * contributing, the per-source topic fingerprint next to x32's
    * corpus-wide top terms.
    *
    * Integer-exact ranking: the idf is quantized once per TERM to
    * micro-nats (the x67 discipline) and multiplied by the exact
    * integer tf, so scores — and therefore the top-N cut with its
    * (score desc, term asc) tie-break — are engine-identical.
    *
    * Scale design: ONE tokenize/explode pass materializes the
    * (source, term) tf frame (partial+final hash agg); df derives from
    * it by a second row-count agg (a row per (source, term) IS a
    * source containing the term — no second corpus scan); only the
    * 1-row source-count frame broadcasts, the tf⋈df join is a shuffled
    * equi-join on term (web-scale vocabularies hash-join, never
    * broadcast). The per-source top-N runs on the vocab-cardinality
    * frame via rank ≤ N, which Spark executes as WindowGroupLimit —
    * a per-partition bounded heap before the exchange, not a full
    * per-source sort (plan-pinned, the x55 pattern).
    *
    * Output: (source, rank, term, tf, df, score_micro), rank 1..topN
    * by (score_micro desc, term asc). */
  def distinctiveTerms(docs: DataFrame, topN: Int = 5,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(topN > 0, s"distinctiveTerms: topN must be positive, got $topN")
    import org.apache.spark.sql.expressions.Window
    val st = docs
      .select(col(sourceCol).as("source"),
        explode(graft.functions.TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // feeds both df and the score join
    val dfreq = st.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nSrc = docs.agg(count_distinct(col(sourceCol)).as("__s"))
    val scored = st.join(dfreq, "term").join(broadcast(nSrc))
      .select(col("source"), col("term"), col("tf"), col("df"),
        (col("tf") * round(round(log(col("__s").cast("double") /
          col("df").cast("double")), 6) * lit(1000000.0)).cast("long"))
          .as("score_micro"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("score_micro").desc, col("term"))))
      .filter(col("rank") <= topN)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score_micro"))
  }

  /** Bigram-LM average transition log-probability per document — the
    * order-sensitive upgrade of [[unigramLogProb]]: an add-one-smoothed
    * bigram model p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V+1) is trained on a
    * reference corpus (c(w₁·) = occurrences of w₁ as a left context,
    * V = the reference's distinct right-context vocabulary) and every
    * document is scored by its mean per-TRANSITION log-prob. Unigram
    * scoring cannot see scrambled word order — "the of and to" scores
    * like English; transition probabilities catch it, which is what
    * makes this the stronger gibberish/boilerplate gate.
    *
    * Hash-portable fixed point (same discipline as [[unigramLogProb]]
    * / [[bm25Retrieval]]): each transition TYPE's log-prob is
    * quantized once to integer micro-nats; per-document accumulation
    * is an integer sum of tf × lp — `ln` ulp noise dies inside the
    * per-type quantization. The final mean is one correctly-rounded
    * double division of two exact integers.
    *
    * Scale: reference pair counts and left-context counts are
    * partial+final hash aggregates; scoring joins are SHUFFLED
    * equi-joins on the pair / left-context keys (web-scale bigram
    * vocabularies are exactly what hash joins are for — deliberately
    * not broadcast); only the 1-row V-stats frame broadcasts. No
    * windows: adjacency comes from the per-document token ARRAY
    * (transform over sequence), never a sort.
    *
    * Output: (doc_id, n_transitions, sum_logp_micro, avg_logp), one
    * row per input document; docs with < 2 tokens keep
    * n_transitions = 0 and a null score. */
  def bigramLogProb(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def pairFrame(df: DataFrame): DataFrame =
      tokFrame(df, idCol, textCol)
        .filter(size(col("__w")) >= 2)
        .select(col("doc_id"), explode(graft.functions.ShingleFunctions
          .adjacent_pairs(col("__w"))).as("__p"))
        .select(col("doc_id"), col("__p.w1"), col("__p.w2"))
    val refPairs = pairFrame(ref)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
      .localCheckpoint(true) // feeds left-context counts, V, and scoring
    val refLeft = refPairs.groupBy(col("w1"))
      .agg(sum(col("__c12")).cast("bigint").as("__c1"))
    val stats = refPairs.agg(count_distinct(col("w2")).as("__v"))
    // integer micro-nats — the only transcendental, quantized per
    // transition TYPE, never per accumulation step
    def lpMicro(c12: Column, c1: Column): Column =
      round(round(log((c12.cast("double") + lit(1.0)) /
        (c1.cast("double") + col("__v").cast("double") + lit(1.0))), 6) *
        lit(1000000.0)).cast("long")
    val docTf = pairFrame(docs)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__tf"))
    val scored = docTf
      .join(refPairs, Seq("w1", "w2"), "left")
      .join(refLeft, Seq("w1"), "left")
      .join(broadcast(stats))
      .select(col("doc_id"), col("__tf"),
        lpMicro(coalesce(col("__c12"), lit(0L)),
          coalesce(col("__c1"), lit(0L))).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__tf")).cast("bigint").as("n_transitions"),
        sum(col("__tf") * col("__lp")).cast("bigint").as("sum_logp_micro"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        col("sum_logp_micro"),
        when(coalesce(col("n_transitions"), lit(0L)) > 0,
          round(col("sum_logp_micro").cast("double") /
            (col("n_transitions").cast("double") * lit(1000000.0)), 6))
          .as("avg_logp"))
  }

  /** Trigram-LM average transition log-probability per document — the
    * order-3 upgrade of [[bigramLogProb]]: an add-one-smoothed
    * trigram model p(w₃|w₁w₂) = (c(w₁w₂w₃)+1)/(c(w₁w₂·)+V+1) is
    * trained on a reference corpus (c(w₁w₂·) = occurrences of the
    * (w₁,w₂) left context, V = the reference's distinct
    * third-position vocabulary) and every document is scored by its
    * mean per-TRANSITION log-prob. Where the bigram screen catches
    * scrambled word ORDER, the trigram screen additionally catches
    * locally-plausible-but-globally-stitched text (template splices
    * whose every bigram is common but whose trigrams never co-occur)
    * — the standard perplexity-screen grain for corpus QA.
    *
    * Same hash-portable fixed point as the bigram sibling: each
    * transition TYPE's log-prob quantizes once to integer micro-nats;
    * per-document accumulation is an exact integer sum of tf × lp;
    * the final mean is one correctly-rounded double division.
    *
    * Scale: identical shape to [[bigramLogProb]] one order up —
    * reference counts are partial+final hash aggregates, scoring
    * joins are SHUFFLED equi-joins on the trigram / context keys
    * (trigram vocabularies are far too large to broadcast), only the
    * 1-row V frame broadcasts, adjacency from the token array (no
    * sort, no window).
    *
    * Output: (doc_id, n_transitions, sum_logp_micro, avg_logp); docs
    * with < 3 tokens keep n_transitions = 0 and a null score. */
  def trigramLogProb(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def tripleFrame(df: DataFrame): DataFrame =
      tokFrame(df, idCol, textCol)
        .filter(size(col("__w")) >= 3)
        .select(col("doc_id"), explode(graft.functions.ShingleFunctions
          .adjacent_triples(col("__w"))).as("__p"))
        .select(col("doc_id"), col("__p.w1"), col("__p.w2"), col("__p.w3"))
    val refTris = tripleFrame(ref)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__c123"))
      .localCheckpoint(true) // feeds context counts, V, and scoring
    val refCtx = refTris.groupBy(col("w1"), col("w2"))
      .agg(sum(col("__c123")).cast("bigint").as("__c12"))
    val stats = refTris.agg(count_distinct(col("w3")).as("__v"))
    def lpMicro(c123: Column, c12: Column): Column =
      round(round(log((c123.cast("double") + lit(1.0)) /
        (c12.cast("double") + col("__v").cast("double") + lit(1.0))), 6) *
        lit(1000000.0)).cast("long")
    val docTf = tripleFrame(docs)
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__tf"))
    val scored = docTf
      .join(refTris, Seq("w1", "w2", "w3"), "left")
      .join(refCtx, Seq("w1", "w2"), "left")
      .join(broadcast(stats))
      .select(col("doc_id"), col("__tf"),
        lpMicro(coalesce(col("__c123"), lit(0L)),
          coalesce(col("__c12"), lit(0L))).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__tf")).cast("bigint").as("n_transitions"),
        sum(col("__tf") * col("__lp")).cast("bigint").as("sum_logp_micro"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        col("sum_logp_micro"),
        when(coalesce(col("n_transitions"), lit(0L)) > 0,
          round(col("sum_logp_micro").cast("double") /
            (col("n_transitions").cast("double") * lit(1000000.0)), 6))
          .as("avg_logp"))
  }

  /** Per-source trigram-LM cross-perplexity matrix — x227's
    * reference-LM read generalized to source×source (VERDICT r15 item
    * 6c): every source trains an add-one word-trigram LM (the exact
    * [[trigramLogProb]] contract — same counts, same quantization),
    * and every source's transitions are scored under EVERY source's
    * LM. Row (e, t) answers "how well does source t's language model
    * source e" — the transfer read behind mixture decisions: a source
    * no other source can model carries unique signal; one every
    * source models well is redundant. The diagonal is each source's
    * in-domain fit (the ceiling its row is read against).
    *
    * Exactness: per-(trigram, train) log-prob quantizes ONCE to
    * integer micro-nats (x227's fixed point); accumulation is exact
    * Σ tf·lp; one correctly-rounded double division per matrix cell.
    *
    * Scale: ONE triple pass collapses the corpus to per-source
    * trigram cells (partial+final hash agg, checkpointed — counts,
    * contexts, vocab sizes, and the eval side all read it); the grid
    * is cells × |sources| (the honest S× expansion of an S×S
    * matrix), joined to LM counts by (train, gram) equi-join —
    * vocabularies never broadcast, only the |sources|-row frames do.
    * Output is |sources|² rows.
    *
    * Output: (src_eval, src_train, n_transitions, sum_logp_micro,
    * avg_logp), ordered by (src_eval, src_train). */
  def crossSourcePerplexity(docs: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // r19: source rides the token pass directly — the old shape
    // re-joined the exploded triples back to `docs` by doc_id just to
    // pick up the source column (a broadcast join evaluated once per
    // triple); selecting it alongside the explode is the same rows
    // with one operator less.
    val tri = docs
      .select(col(sourceCol).as("__src"),
        graft.functions.TextFunctions.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("__src"), explode(graft.functions.ShingleFunctions
        .adjacent_triples(col("__w"))).as("__p"))
      .select(col("__src"), col("__p.w1"), col("__p.w2"), col("__p.w3"))
    // r19: the grid's model joins all BROADCAST at this scale (cells
    // and ctx are checkpointed ~207k-row frames), so the whole eval
    // expansion (cells ×S sources, 4.1M rows at sf0.1 with S = 20) is
    // one zero-shuffle probe chain into the partial aggregate — but
    // its STREAM side was the AQE-coalesced 1-partition checkpoint,
    // i.e. the entire ×20 fan-out, two hash probes and the log/round
    // per grid row ran single-threaded (~2.2 s of x252's 3.2 s).
    // ensureParallelism on JUST this branch fans the probe out over
    // the cores; ctx/vs/srcs keep reading the compact checkpoint
    // directly (tiny aggregates — repartitioning every consumer
    // measured SLOWER, +1.1 s, from 4 extra single-threaded
    // sort-before-repartition exchanges). Two alternatives measured
    // worse at sf0.1 and are recorded in OPTIMIZATION_r19.md: a
    // per-gram source→count map pivot (+2.3 s — map bytes ride every
    // Generate/expansion row) and a per-(gram, train) lp table joined
    // by gram (+0.6 s — five extra exchanges against a zero-shuffle
    // broadcast chain).
    val cells = tri
      .groupBy(col("__src"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
      .localCheckpoint(true)
    val ctx = cells.groupBy(col("__src"), col("w1"), col("w2"))
      .agg(sum(col("__c")).cast("bigint").as("__c12"))
    val vs = cells.groupBy(col("__src"))
      .agg(count_distinct(col("w3")).cast("bigint").as("__v"))
    val srcs = cells.select(col("__src").as("src_train")).distinct()
    val grid = Dedup.ensureParallelism(cells)
      .select(col("__src").as("src_eval"), col("w1"), col("w2"), col("w3"),
        col("__c").as("__tf"))
      .crossJoin(broadcast(srcs))
      .join(cells.select(col("__src").as("src_train"), col("w1"), col("w2"),
          col("w3"), col("__c").as("__c123")),
        Seq("src_train", "w1", "w2", "w3"), "left")
      .join(ctx.select(col("__src").as("src_train"), col("w1"), col("w2"),
          col("__c12")),
        Seq("src_train", "w1", "w2"), "left")
      .join(broadcast(vs.select(col("__src").as("src_train"), col("__v"))),
        Seq("src_train"))
    val lp = round(round(log(
        (coalesce(col("__c123"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("__c12"), lit(0L)).cast("double") +
            col("__v").cast("double") + lit(1.0))), 6) *
      lit(1000000.0)).cast("long")
    grid.select(col("src_eval"), col("src_train"), col("__tf"), lp.as("__lp"))
      .groupBy(col("src_eval"), col("src_train"))
      .agg(sum(col("__tf")).cast("bigint").as("n_transitions"),
        sum(col("__tf") * col("__lp")).cast("bigint").as("sum_logp_micro"))
      .select(col("src_eval"), col("src_train"), col("n_transitions"),
        col("sum_logp_micro"),
        round(col("sum_logp_micro").cast("double") /
          (col("n_transitions").cast("double") * lit(1000000.0)), 6)
          .as("avg_logp"))
      .orderBy(col("src_eval"), col("src_train"))
  }

  /** PII screen with CHECKSUM validation (VERDICT r15 item 6b) — the
    * step past x48's pattern redaction: a 16-digit run is only a
    * credit-card LEAK if it Luhn-validates, and an IBAN-shaped token
    * only a bank account if its ISO-7064 mod-97 check passes —
    * checksums cut the false-positive rate of pattern PII screens by
    * ~10× (a uniform random digit run passes Luhn 1-in-10, mod-97
    * 1-in-97), which is the difference between a reviewable leak
    * report and noise.
    *
    *  - cards: `\b\d{13,19}\b` digit runs, validated by the Luhn
    *    algorithm (the [[graft.functions.ShingleKernels.luhnValid]]
    *    kernel — unit-pinned equal to Spark's own `luhn_check`);
    *  - IBANs: `\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b` (uppercase
    *    canonical form — the stated charset contract), validated by
    *    ISO-7064 mod-97-10: move the first 4 chars to the end, map
    *    letters A→10…Z→35, fold (acc·10^len(e) + e) mod 97, valid
    *    iff 1;
    *  - phones: E.164-shaped `\+[1-9]\d{7,14}\b` counted (no
    *    checksum exists for phone numbers).
    *
    * Both checksum counts are codegen Catalyst expressions
    * ([[graft.functions.ShingleExpressions LuhnValidCount/
    * IbanValidCount]]) — the first cut used `size(filter(arr, c ->
    * luhn_check(c)))` and the higher-order filter excluded the whole
    * projection from whole-stage codegen (the round-9 trap).
    *
    * Scale: one narrow codegen projection per document — no shuffle,
    * no join, no interpreted lambda; aggregate downstream as needed.
    *
    * Output: (doc_id, n_card_candidates, n_card_valid,
    * n_iban_candidates, n_iban_valid, n_phone). */
  def piiChecksums(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.ShingleFunctions.{iban_valid_count, luhn_valid_count}
    docs.select(col(idCol).as("doc_id"),
        regexp_extract_all(col(textCol),
          lit("\\b\\d{13,19}\\b"), lit(0)).as("__cards"),
        regexp_extract_all(col(textCol),
          lit("\\b[A-Z]{2}\\d{2}[A-Z0-9]{10,30}\\b"), lit(0)).as("__ibans"),
        coalesce(size(regexp_extract_all(col(textCol),
          lit("\\+[1-9]\\d{7,14}\\b"), lit(0))), lit(0)).cast("long")
          .as("n_phone"))
      .select(col("doc_id"),
        coalesce(size(col("__cards")), lit(0)).cast("long")
          .as("n_card_candidates"),
        luhn_valid_count(col("__cards")).as("n_card_valid"),
        coalesce(size(col("__ibans")), lit(0)).cast("long")
          .as("n_iban_candidates"),
        iban_valid_count(col("__ibans")).as("n_iban_valid"),
        col("n_phone"))
  }

  /** Kneser-Ney bigram average transition log-probability per document
    * — the SMOOTHING upgrade of [[bigramLogProb]]: instead of add-one,
    * interpolated absolute discounting (Kneser & Ney 1995; Chen &
    * Goodman 1998) with the continuation-probability backoff that
    * makes KN the production n-gram smoother:
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − d, 0)/c(w₁·)
    *            + (d · N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/B
    *
    * where N₁₊(w₁·) = distinct right types of w₁, N₁₊(·w₂) = distinct
    * LEFT contexts of w₂ (the "how many contexts does this word
    * complete" count that demotes frequent-but-context-bound words
    * like "francisco"), and B = distinct reference bigrams. A
    * transition whose w₂ never appears as a reference right type has
    * zero continuation mass — it is counted as OOV, not scored (the
    * honest alternative to a fake epsilon floor). An unseen CONTEXT
    * w₁ backs off to the continuation distribution alone. Against the
    * add-one siblings (x96/x227) this is the screen that stops
    * over-penalizing rare-but-well-formed continuations — the grain
    * that separates "unusual topic" from "scrambled text".
    *
    * Exactness — the [[bigramLogProb]] fixed point: every input to
    * the probability is an exact BIGINT count; the probability and
    * its log are ONE fully-parenthesized double expression replayed
    * operation-for-operation by the oracle (IEEE doubles are
    * deterministic given the same expression tree), quantized once
    * per transition TYPE to integer micro-nats; per-document
    * accumulation is an exact integer Σ tf × lp; the mean is one
    * correctly-rounded double division.
    *
    * Scale: identical shape to [[bigramLogProb]] — reference counts
    * are partial+final hash aggregates; the three model frames
    * (bigram counts, per-context stats, per-word continuation counts)
    * join the per-doc transition-type frame on their natural keys as
    * SHUFFLED equi-joins (bigram vocabulary is never
    * broadcast-sized); only the 1-row B frame broadcasts.
    *
    * Output: (doc_id, n_transitions, n_oov, sum_logp_micro,
    * avg_logp) — avg over SCORED (non-OOV) transitions; docs with
    * < 2 tokens keep n_transitions = 0 and a null score. */
  def kneserNeyLogProb(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"kneserNeyLogProb: discount must be in (0, 1), got $discount")
    def pairFrame(df: DataFrame): DataFrame =
      tokFrame(df, idCol, textCol)
        .filter(size(col("__w")) >= 2)
        .select(col("doc_id"), explode(graft.functions.ShingleFunctions
          .adjacent_pairs(col("__w"))).as("__p"))
        .select(col("doc_id"), col("__p.w1"), col("__p.w2"))
    val refPairs = pairFrame(ref)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
      .localCheckpoint(true) // feeds context stats, continuation, B, scoring
    // per-context: total count and distinct right types (refPairs is
    // already one row per (w1, w2), so count(*) IS the type count)
    val ctx = refPairs.groupBy(col("w1"))
      .agg(sum(col("__c12")).cast("bigint").as("__c1"),
        count(lit(1)).cast("bigint").as("__n1r"))
    val cont = refPairs.groupBy(col("w2"))
      .agg(count(lit(1)).cast("bigint").as("__n1l"))
    val stats = refPairs.agg(count(lit(1)).cast("bigint").as("__b"))
    val d = lit(discount)
    // ONE double expression, fully parenthesized — the oracle replays
    // the identical tree. Seen context: discounted ML + weighted
    // continuation (a seen context with an UNSEEN pair keeps c12 = 0
    // and the max(−d, 0) branch zeroes the ML term); unseen context:
    // continuation alone.
    val c12 = coalesce(col("__c12"), lit(0L))
    val pSeen =
      greatest(c12.cast("double") - d, lit(0.0)) /
        col("__c1").cast("double") +
      ((d * col("__n1r").cast("double")) / col("__c1").cast("double")) *
        (col("__n1l").cast("double") / col("__b").cast("double"))
    val pUnseenCtx = col("__n1l").cast("double") / col("__b").cast("double")
    def micro(p: Column): Column =
      round(round(log(p), 6) * lit(1000000.0)).cast("long")
    val docTf = pairFrame(docs)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__tf"))
    val scored = docTf
      .join(refPairs, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .join(broadcast(stats))
      .select(col("doc_id"), col("__tf"),
        col("__n1l").isNull.as("__oov"),
        when(col("__n1l").isNull, lit(null).cast("long"))
          .when(col("__c1").isNull, micro(pUnseenCtx))
          .otherwise(micro(pSeen))
          .as("__lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__tf")).cast("bigint").as("n_transitions"),
        sum(when(col("__oov"), col("__tf")).otherwise(lit(0L)))
          .cast("bigint").as("n_oov"),
        sum(when(col("__oov"), lit(0L)).otherwise(col("__tf") * col("__lp")))
          .cast("bigint").as("sum_logp_micro"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("sum_logp_micro"),
        when(coalesce(col("n_transitions"), lit(0L)) -
            coalesce(col("n_oov"), lit(0L)) > 0,
          round(col("sum_logp_micro").cast("double") /
            ((col("n_transitions") - col("n_oov")).cast("double") *
              lit(1000000.0)), 6))
          .as("avg_logp"))
  }

  /** Mojibake / encoding-damage screen — the ftfy-class corpus-
    * cleaning pass: text that went through a UTF-8 → Latin-1
    * mis-decode (or lossy transcoding) carries unmistakable byte-
    * shadow signatures, and a source whose damage rate is high needs
    * re-extraction, not filtering. Four signature classes, each an
    * exact per-doc occurrence count:
    *
    *  - `latin1_hits`  — "Ã" + following char: the 0xC3 UTF-8 lead
    *    byte rendered as Latin-1 (é→Ã©, á→Ã¡, …);
    *  - `punct_hits`   — "â€": the 0xE2 0x80 prefix of damaged
    *    smart punctuation (“ ” – — …);
    *  - `replacement_hits` — U+FFFD, a decoder's explicit loss marker;
    *  - `nbsp_hits`    — "Â": the 0xC2 shadow before NBSP/degree/
    *    section characters.
    *
    * A document is damaged when ANY signature fires; the per-source
    * rollup is the re-crawl priority list. (Heuristic by nature —
    * legitimate Portuguese "Ã" exists — which is why the signatures
    * are reported separately instead of collapsed into a verdict.)
    *
    * Scale: one narrow projection computes all four counts per row
    * (regexp over the text column, codegen'd), then one partial+final
    * hash aggregation per source. No joins, no windows.
    *
    * Output per source: (source, n_docs, n_damaged,
    * damaged_rate_micro, latin1_hits, punct_hits, replacement_hits,
    * nbsp_hits), ordered by source. */
  def mojibakeScreen(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    def hits(pat: String): Column =
      coalesce(size(regexp_extract_all(col(textCol), lit(pat), lit(0))),
        lit(0)).cast("long")
    val perDoc = docs.select(col(sourceCol).cast("string").as("source"),
      hits("Ã.").as("__l1"), hits("â€").as("__pu"),
      hits("�").as("__re"), hits("Â").as("__nb"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("__l1") + col("__pu") + col("__re") + col("__nb") > 0,
          1L).otherwise(0L)).cast("bigint").as("n_damaged"),
        sum(col("__l1")).cast("bigint").as("latin1_hits"),
        sum(col("__pu")).cast("bigint").as("punct_hits"),
        sum(col("__re")).cast("bigint").as("replacement_hits"),
        sum(col("__nb")).cast("bigint").as("nbsp_hits"))
      .select(col("source"), col("n_docs"), col("n_damaged"),
        expr("(CAST(n_damaged AS DECIMAL(38,0)) * 1000000) div n_docs")
          .cast("bigint").as("damaged_rate_micro"),
        col("latin1_hits"), col("punct_hits"), col("replacement_hits"),
        col("nbsp_hits"))
      .orderBy(col("source"))
  }

  /** Flesch reading-ease per document — the classic readability
    * screen (Flesch 1948; the "textbook quality" axis beside the
    * statistical screens): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with the standard heuristics made
    * EXACT and replayable:
    *
    *  - words: the house tokenizer contract ([[graft.functions
    *    .TextFunctions.words]]);
    *  - sentences: terminator runs `[.!?]+`, floored at 1 (trailing
    *    unterminated text is part of the last sentence);
    *  - syllables: PER-WORD vowel groups `[aeiouy]+` floored at 1,
    *    summed over the `words()` token array by the
    *    `syllable_count` codegen kernel — the per-word floor is
    *    literal in the code, not recovered through the former
    *    global-regex run-count identity (ADVICE r16: that identity
    *    held — "o'clock" is two words AND two vowel-bearing runs —
    *    but had to be argued from the tokenizer contract every round;
    *    deriving the count from the token array ends the argument).
    *    Values are unchanged on every input; the punctuation cases
    *    stay pinned in TextAnalysisSpec.
    *
    * Exactness: all three components are exact BIGINT counts; the
    * score is ONE fully-parenthesized double expression quantized
    * once per document to integer micro.
    *
    * Scale: a narrow projection (codegen'd regex counts) + nothing
    * else — per-row work only, no joins, no windows, no shuffles
    * beyond the caller's sort.
    *
    * Output: (doc_id, n_words, n_sentences, n_syllables,
    * flesch_micro), ordered by doc_id; zero-word docs keep a null
    * score. */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    import graft.functions.ShingleFunctions.syllable_count
    def rxCount(c: Column, pat: String): Column =
      coalesce(size(regexp_extract_all(c, lit(pat), lit(0))), lit(0))
        .cast("long")
    val base = docs.select(col(idCol).as("doc_id"),
      coalesce(size(words(col(textCol))), lit(0)).cast("long").as("n_words"),
      greatest(rxCount(col(textCol), "[.!?]+"), lit(1L)).as("n_sentences"),
      coalesce(syllable_count(words(col(textCol))), lit(0L))
        .as("n_syllables"))
    base.select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0,
          round(round(
            lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") /
                col("n_sentences").cast("double")) -
              lit(84.6) * (col("n_syllables").cast("double") /
                col("n_words").cast("double")), 6) * lit(1000000.0))
            .cast("long"))
          .as("flesch_micro"))
      .orderBy(col("doc_id"))
  }

  /** Position-resolved surprisal — WHERE in documents the predictable
    * text lives: every token is assigned a relative-position bucket
    * (⌊idx·B/len⌋, B equal-width position bands), and each bucket
    * reports the corpus-wide mean unigram surprisal under the
    * reference LM ([[unigramLogProb]]'s add-one contract). A bucket
    * whose mean log-prob sits far above the rest is templated text
    * concentrated at that position — headers, footers, navigation
    * residue — the POSITION read that x176's prefix rule and x229's
    * catalog see only at the extremes.
    *
    * Exactness: the per-TERM log-prob quantizes once to integer
    * micro-nats (the unigram fixed point); bucket assignment is
    * integer floor arithmetic; accumulation is Σ tf×lp exact; the
    * mean is one correctly-rounded double division per bucket.
    *
    * Scale: reference counts partial+final; the token explode
    * collapses to (bucket, term) cells BEFORE joining the vocabulary
    * (shuffled equi-join on term — vocabularies don't broadcast);
    * only the 1-row stats/OOV frames broadcast. Output is `buckets`
    * rows.
    *
    * Output: (bucket ∈ [0, B), n_tokens, sum_logp_micro, avg_logp),
    * ordered by bucket. */
  def positionalSurprisal(docs: DataFrame, ref: DataFrame,
      buckets: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"positionalSurprisal: buckets must be in [2, 100], got $buckets")
    val refTf = tokFrame(ref, idCol, textCol)
      .select(explode(col("__w")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds the stats AND the scoring join
    val stats = refTf.agg(
      sum(col("__c")).cast("bigint").as("__t"), count(lit(1)).as("__v"))
    def lpMicro(c: Column): Column =
      round(round(log((c.cast("double") + lit(1.0)) /
        (col("__t").cast("double") + col("__v").cast("double") + lit(1.0))), 6) *
        lit(1000000.0)).cast("long")
    val vocab = refTf.join(broadcast(stats))
      .select(col("term"), lpMicro(col("__c")).as("__lp"))
    val oov = stats.select(lpMicro(lit(0L)).as("__oovlp"))
    val btf = tokFrame(docs, idCol, textCol)
      .filter(size(col("__w")) > 0)
      .select(size(col("__w")).as("__nw"),
        posexplode(col("__w")).as(Seq("__i", "term")))
      .select(expr(s"(__i * ${buckets}L) div __nw").as("bucket"), col("term"))
      .groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("__tf"))
    btf.join(vocab, Seq("term"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col("bucket"))
      .agg(sum(col("__tf")).cast("bigint").as("n_tokens"),
        sum(col("__tf") * coalesce(col("__lp"), col("__oovlp")))
          .cast("bigint").as("sum_logp_micro"))
      .select(col("bucket").cast("bigint").as("bucket"), col("n_tokens"),
        col("sum_logp_micro"),
        round(col("sum_logp_micro").cast("double") /
          (col("n_tokens").cast("double") * lit(1000000.0)), 6)
          .as("avg_logp"))
      .orderBy(col("bucket"))
  }

  /** BPE-style adjacent-pair statistics — the counting core of one
    * tokenizer-induction merge round (Sennrich et al. 2016): for every
    * corpus word, every adjacent character bigram votes with the
    * word's corpus frequency; the top pair is the merge a BPE trainer
    * would perform next. Run over a candidate training corpus this is
    * the "does my tokenizer fit this data" diagnostic.
    *
    * Scale design: the corpus collapses to DISTINCT words first (one
    * hash agg with map-side combine — the token explosion never
    * reaches the shuffle twice), then pairs are generated per distinct
    * word — O(vocab × word-length), independent of corpus row count.
    * The final top-N is sort+limit → TakeOrderedAndProject, a bounded
    * per-partition heap, not a global sort. Ties at the cut are broken
    * by pair text, so the result is a deterministic set.
    *
    * Output: (pair, pair_count) — top `topN` by (count desc, pair). */
  def bpePairStats(docs: DataFrame, topN: Int = 20,
      textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    wc
      .select(col("c"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("c")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  /** Iterated BPE vocabulary induction — N full merge rounds of the
    * Sennrich et al. 2016 trainer (the multi-round extension of
    * [[bpePairStats]]'s single-round statistics, VERDICT r12 item 6):
    * starting from per-character symbol sequences over the DISTINCT
    * word vocabulary, each round (1) counts every adjacent symbol
    * pair weighted by word corpus frequency, (2) picks the best pair
    * deterministically by (count desc, left asc, right asc), and
    * (3) merges its occurrences greedily left-to-right,
    * non-overlapping — the reference trainer's `re.sub` semantics —
    * across every word. The output is the merge TABLE (the learned
    * tokenizer), one row per round.
    *
    * The greedy non-overlapping merge is fully relational (no
    * sequential per-word scan): positions where (sym, next) equals
    * the pair are match candidates; consecutive candidate runs — which
    * require left==right (an "aaaa" run) — are islands in the
    * gaps-and-islands sense (position − running match count), and
    * greedy selects every EVEN offset from each island's first match.
    * A selected position emits the merged symbol, the position after
    * it drops, everything else passes through; the new sequence is
    * rebuilt by position sort. Hand-traced on the "aaaa"/(a,a) →
    * [aa, aa] adversary in TextAnalysisSpec.
    *
    * Scale design: the corpus collapses to DISTINCT words ONCE (one
    * hash agg — the same O(vocab) envelope as [[bpePairStats]]); all
    * N rounds run over the vocab frame only, O(vocab × word-length)
    * rows per round, independent of corpus row count. Every window
    * partitions by word (bounded by the longest word); each round's
    * survivor frame and 1-row best pair are checkpointed so round k+1
    * never re-runs round k (the x137 k-core fixpoint pattern). The
    * per-round argmax is a min-struct aggregate, not a global sort.
    *
    * Output: (round, left_sym, right_sym, merged, pair_count),
    * ordered by round; rounds after pair exhaustion emit nothing. */
  def bpeInduction(docs: DataFrame, rounds: Int = 6,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"bpeInduction: rounds must be in [1, 64], got $rounds")
    bpeInductionWithVocab(docs, rounds, textCol)._1
  }

  /** [[bpeInduction]] exposing BOTH outputs: the merge table AND the
    * final per-word symbol state (wid, c, syms) after all rounds —
    * the encoded vocabulary downstream consumers ([[bpeFertility]])
    * aggregate over. Words always survive pair exhaustion: the merge
    * round left-joins the (possibly empty) best-pair frame, so an
    * exhausted round passes every word through unchanged. */
  def bpeInductionWithVocab(docs: DataFrame, rounds: Int = 6,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64,
      s"bpeInductionWithVocab: rounds must be in [1, 64], got $rounds")
    var vocab = docs
      .select(explode(words(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(col("w").as("wid"), col("c"),
        // codegen kernel split (identical codepoint semantics to the
        // old transform/substring lambda, one O(len) pass — r18)
        graft.functions.ShingleFunctions.char_syms(col("wid")).as("syms"))
      .localCheckpoint(true)
    val merges = (1 to rounds).map { r =>
      val (best, next) = bpeMergeRound(vocab, r)
      vocab = next
      best
    }
    (merges.reduce(_ unionAll _).orderBy(col("round")), vocab)
  }

  /** Tokenizer fertility under the induced BPE vocabulary — the
    * "how many subword tokens does a word cost" capacity read per
    * `groupCol` (source, language): induce `rounds` merges with
    * [[bpeInduction]], encode every distinct word as its final symbol
    * count, and roll corpus token totals up per group. High fertility
    * = the tokenizer fragments that group's text (under-represented
    * language/domain) — the standard tokenizer-fit diagnostic next to
    * x119's coverage and x152's Heaps curve. Single-char words carry
    * no pairs and are excluded exactly as in the induction
    * ([[bpePairStats]]'s contract).
    *
    * Scale: the induction is O(vocab) ([[bpeInduction]]); the encode
    * join keys the corpus word explosion on the vocab frame (hash
    * join — vocab is NOT assumed broadcastable at web scale), and the
    * rollup is one partial+final hash aggregation.
    *
    * Output: (groupCol, n_words, n_tokens, fertility_micro =
    * n_tokens·10⁶ div n_words), ordered by group. */
  def bpeFertility(docs: DataFrame, rounds: Int = 6,
      textCol: String = "text", groupCol: String = "source"): DataFrame = {
    val (_, vocab) = bpeInductionWithVocab(docs, rounds, textCol)
    val tokensPerWord = vocab
      .select(col("wid").as("__w"), size(col("syms")).cast("long").as("__t"))
    docs.select(col(groupCol).as("grp"), explode(words(col(textCol))).as("__w"))
      .filter(length(col("__w")) >= 2)
      .join(tokensPerWord, Seq("__w"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n_words"),
        sum(col("__t")).cast("bigint").as("n_tokens"))
      .select(col("grp").as(groupCol), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000000L div n_words").as("fertility_micro"))
      .orderBy(col(groupCol))
  }

  /** One BPE merge round over a (wid, c, syms) vocab frame: returns
    * (the 1-row merge record for `round`, the merged vocab frame).
    * See [[bpeInduction]] for the greedy-merge decomposition. */
  private def bpeMergeRound(vocab: DataFrame, round: Int)
      : (DataFrame, DataFrame) = {
    // fully-merged single-symbol words carry no pairs, so they leave
    // before the pair explode
    val best = vocab
      .filter(size(col("syms")) >= 2)
      .select(col("c"), explode(graft.functions.ShingleFunctions
        .adjacent_pairs(col("syms"), "l", "r")).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("c")).cast("bigint").as("cnt"))
      .agg(min(struct((-col("cnt")).as("nc"), col("l").as("l"),
        col("r").as("r"), col("cnt").as("cnt"))).as("b"))
      .select(col("b.l").as("l"), col("b.r").as("r"), col("b.cnt").as("cnt"))
      .filter(col("l").isNotNull) // empty pair space → empty best
      .localCheckpoint(true) // 1 row; feeds the merge AND the output
    // r18: the merge application is a zero-shuffle kernel projection
    // now, so round k+1 re-deriving round k's vocab is a chain of ≤ k
    // broadcast-join projections over the CHECKPOINTED initial vocab —
    // cheaper than the per-round eager checkpoint it replaces (which
    // was a full materialization job per round when the application
    // was a 3-exchange window plan)
    val next = applyBestPair(vocab, best, checkpoint = false)
    (best.select(lit(round.toLong).as("round"), col("l").as("left_sym"),
      col("r").as("right_sym"), concat(col("l"), col("r")).as("merged"),
      col("cnt").as("pair_count")), next)
  }

  /** Greedy non-overlapping application of ONE pair row to every word
    * of a (wid, c, syms) frame — the merge kernel [[bpeInduction]]
    * documents. `best` must be ≤ 1 row with columns (l, r); an EMPTY
    * best passes every word through unchanged (LEFT join on true:
    * null l/r hit the `when` pass-through arm, so nothing merges).
    * Returns the merged (wid, c, syms) frame; `checkpoint = true`
    * eagerly materializes it (no caller needs that since the kernel
    * rewrite — the induction leaves rounds lazy, as a re-derivation is
    * now a chain of ≤ rounds broadcast-join projections over the
    * checkpointed initial vocab).
    *
    * r18 optimization (guide §2.4 + §1.2 step 2): the merge used to
    * run as posexplode → two wid-partitioned window passes →
    * collect_list re-assembly — 3 exchanges + 2 sorts PER ROUND, per
    * round checkpointed. [[graft.functions.ShingleKernels.bpeApplyMerge]]
    * is the same greedy even-offset-island selection as one O(|syms|)
    * codegen pass per word, so a round is now a zero-shuffle
    * broadcast-join projection. Equivalence is pinned by
    * TextAnalysisSpec's kernel-vs-window property test plus the
    * hand-traced corpora. */
  private[graft] def applyBestPair(vocab: DataFrame, best: DataFrame,
      checkpoint: Boolean = true): DataFrame = {
    import graft.functions.ShingleFunctions.bpe_apply_merge
    val merged = vocab.join(broadcast(best.select(col("l"), col("r"))),
        lit(true), "left")
      .select(col("wid"), col("c"),
        when(col("l").isNull || col("r").isNull, col("syms"))
          .otherwise(bpe_apply_merge(col("syms"), col("l"), col("r")))
          .as("syms"))
    // round k+1 must never re-run round k
    if (checkpoint) merged.localCheckpoint(true) else merged
  }

  /** The pre-r18 window-plan form of [[applyBestPair]] — retained
    * (test-only) as the executable specification the kernel is pinned
    * against: TextAnalysisSpec runs both over randomized vocabularies
    * and asserts identical output. Never called from a query path. */
  private[graft] def applyBestPairViaWindows(vocab: DataFrame,
      best: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("wid")).orderBy(col("p"))
    val pos = vocab.join(broadcast(best.select(col("l"), col("r"))),
        lit(true), "left")
      .select(col("wid"), col("c"), col("l"), col("r"),
        posexplode(col("syms")).as(Seq("p", "s")))
    val m = pos
      .withColumn("mt", coalesce(col("s") === col("l") &&
        lead(col("s"), 1).over(wp) === col("r"), lit(false)))
      .withColumn("isl", col("p") - sum(when(col("mt"), 1L).otherwise(0L))
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wisl = Window.partitionBy(col("wid"), col("isl"))
    m.withColumn("sel", col("mt") &&
        ((col("p") - min(when(col("mt"), col("p"))).over(wisl)) % 2 === 0))
      .withColumn("lead_s", lead(col("s"), 1).over(wp))
      .withColumn("prev_sel", coalesce(lag(col("sel"), 1).over(wp), lit(false)))
      .filter(!col("prev_sel"))
      .select(col("wid"), col("c"), col("p"),
        when(col("sel"), concat(col("s"), col("lead_s")))
          .otherwise(col("s")).as("s2"))
      .groupBy(col("wid"), col("c"))
      .agg(expr("transform(array_sort(collect_list(struct(p, s2))), x -> x.s2)")
        .as("syms"))
  }

  /** BPE ENCODER — applies an already-induced merge table to NEW text
    * (the streaming-ingest tokenize-and-count use [[bpeInduction]]
    * learns for but cannot serve itself: induction reads its own
    * corpus; this reads ANY corpus under a FIXED tokenizer). Replays
    * the merge table in round order: round r's (left_sym, right_sym)
    * row — or pass-through when round r merged nothing at induction
    * time — is greedily applied ([[applyBestPair]], the exact kernel
    * the induction used), so a word seen at induction time encodes
    * BIT-IDENTICALLY to its final induction vocab state, and an
    * unseen word gets the deterministic greedy encoding under the
    * same rules. Single-char words carry no pairs and are excluded,
    * exactly as in the induction.
    *
    * Scale design: the new corpus collapses to DISTINCT words once
    * (one hash agg, O(vocab) rows after); the whole replay is then ONE
    * projection — the round-ordered merge table collapses to a 1-row
    * pair of parallel symbol arrays (≤ 64 elements), broadcast onto
    * the vocab frame, and
    * [[graft.functions.ShingleKernels.bpeApplyMerges]] applies every
    * round greedily per word inside the codegen span. The merge table
    * is never collected to the driver, and no stage depends on corpus
    * row count after the first agg. (r18 optimization, guide §2.4:
    * the replay used to run `rounds` sequential join+window+agg+
    * checkpoint rounds — ~3 exchanges per round; it is now zero
    * post-agg exchanges. Absent rounds — nothing merged at induction
    * time — are pass-through in both forms.)
    *
    * Output: (wid, c, syms) — each distinct word with ≥ 2 chars, its
    * occurrence count in `docs`, and its encoded symbol array. */
  def bpeEncode(docs: DataFrame, merges: DataFrame, rounds: Int = 6,
      textCol: String = "text"): DataFrame =
    bpeEncodeFromWordCounts(
      docs
        .select(explode(words(col(textCol))).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("c")),
      merges, rounds)

  /** [[bpeEncode]] over a PRE-AGGREGATED (w, c) distinct-word frame —
    * the shared-subtree form for callers that encode ONE corpus under
    * SEVERAL merge tables (x276 encodes tokenizer v1 AND v2: one word
    * aggregation, two kernel projections — r18). */
  /** The 1-row (left-syms, right-syms) arrays of a round-capped merge
    * table — the broadcastable form both encode entry points consume. */
  private def bpeMergeArrays(merges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"bpeEncode: rounds must be in [1, 64], got $rounds")
    // ONE sorted array feeds both projections (ADVICE r18): two
    // independently-sorted collect_lists keyed by different secondary
    // fields could silently desync left/right pairing if a malformed
    // snapshot ever carried duplicate rounds; projecting both fields
    // from a single sorted struct array makes the pairing intrinsic.
    // (The transforms run once over a ≤64-element array on a 1-row
    // frame — not a hot path.)
    merges
      .select(col("round"), col("left_sym"), col("right_sym"))
      .filter(col("round") <= rounds)
      .agg(expr("array_sort(collect_list(struct(round, left_sym, " +
        "right_sym)))").as("__m"))
      .select(
        expr("transform(__m, x -> x.left_sym)").as("__ls"),
        expr("transform(__m, x -> x.right_sym)").as("__rs"))
  }

  private[graft] def bpeEncodeFromWordCounts(wordCounts: DataFrame,
      merges: DataFrame, rounds: Int): DataFrame = {
    import graft.functions.ShingleFunctions.{bpe_apply_merges, char_syms}
    wordCounts
      .crossJoin(broadcast(bpeMergeArrays(merges, rounds)))
      .select(col("w").as("wid"), col("c"),
        bpe_apply_merges(char_syms(col("w")), col("__ls"), col("__rs"))
          .as("syms"))
      // terminate the encode once: every consumer (x209's rollup joins
      // it against a fresh corpus explode; x276 reads it twice) starts
      // from the materialized vocab instead of re-running the agg —
      // ONE checkpoint job total, where the round-replay form cost 7
      .localCheckpoint(true)
  }

  /** Two tokenizer versions encoded in ONE vocab pass (r19, VERDICT
    * r18 item 6): the served v-old/v-new comparison (x276) used to run
    * a separate kernel projection + checkpoint + corpus join per
    * version over the SAME distinct-word frame; this emits both
    * encodings side by side so the downstream per-source rollup joins
    * the corpus once. Each column is the identical
    * `bpe_apply_merges(char_syms(w), …)` kernel under its own
    * version-pinned merge arrays — outputs are bit-equal to two
    * single-version encodes by construction. */
  private[graft] def bpeEncodeDualFromWordCounts(wordCounts: DataFrame,
      mergesA: DataFrame, roundsA: Int,
      mergesB: DataFrame, roundsB: Int): DataFrame = {
    import graft.functions.ShingleFunctions.{bpe_apply_merges, char_syms}
    val mB = bpeMergeArrays(mergesB, roundsB)
      .select(col("__ls").as("__ls_b"), col("__rs").as("__rs_b"))
    wordCounts
      .crossJoin(broadcast(bpeMergeArrays(mergesA, roundsA)))
      .crossJoin(broadcast(mB))
      .select(col("w").as("wid"), col("c"),
        bpe_apply_merges(char_syms(col("w")), col("__ls"), col("__rs"))
          .as("syms_a"),
        bpe_apply_merges(char_syms(col("w")), col("__ls_b"), col("__rs_b"))
          .as("syms_b"))
      .localCheckpoint(true)
  }

  /** Per-document curation scorecard — the explainable decision
    * record a pipeline exports for audit: every signal value alongside
    * the first-fail verdict, per document (where [[filterAttribution]]
    * reports the aggregate funnel, this is the row-level why). Signals:
    * token count, top-bigram repetition ([[repetitionFilter]]'s
    * statistic), 3-gram novelty ([[ngramNovelty]]'s), and the near-dup
    * canonical decision (passed in as `clusters` —
    * [[Dedup.canonicalizeClusters]] output — so the caller picks the
    * edge relation). Verdict precedence: too_short → repetitive →
    * redundant (novelty < `minNovelty`) → duplicate (non-canonical) →
    * kept. Docs absent from a signal (no grams, unclustered) coalesce
    * to the passing side, by contract.
    *
    * Scale design: ONE tokenization pass (the checkpointed token frame
    * feeds the count, both gram metrics — the round-5 lesson); each
    * signal is the same shuffle shape as its standalone operator; the
    * final assembly is doc-keyed left joins. */
  def curationScorecard(docs: DataFrame, clusters: DataFrame,
      minTokens: Int = 20, maxRepetition: Double = 0.06,
      minNovelty: Double = 0.2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    import graft.functions.ShingleFunctions.ngram_strings
    val toks = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__w"))
      .localCheckpoint(true)
    val rep = repetitionRatioFromTokens(toks.select(col("doc_id"), col("__w")), 2)
    val grams = toks.select(col("doc_id"),
      explode(array_distinct(ngram_strings(col("__w"), 3))).as("gram"))
    val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("__fd"))
    val nov = grams.join(first, "gram").groupBy(col("doc_id"))
      .agg(round(
        sum(when(col("__fd") === col("doc_id"), 1L).otherwise(0L)).cast("double")
          / count(lit(1)).cast("double"), 6).as("novelty"))
    toks.select(col("doc_id"), size(col("__w")).cast("bigint").as("n_tokens"))
      .join(rep, Seq("doc_id"), "left")
      .join(nov, Seq("doc_id"), "left")
      .join(clusters.select(col("doc_id"), col("keep")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("top_gram_ratio"),
        col("novelty"),
        coalesce(col("keep"), lit(true)).as("dup_keep"),
        when(col("n_tokens") < minTokens, "too_short")
          .when(coalesce(col("top_gram_ratio"), lit(0.0)) > maxRepetition,
            "repetitive")
          .when(coalesce(col("novelty"), lit(1.0)) < minNovelty, "redundant")
          .when(!coalesce(col("keep"), lit(true)), "duplicate")
          .otherwise("kept").as("verdict"))
  }

  /** Directional containment screen — the subset-duplication detector
    * resemblance misses: a short doc fully excerpted inside a long one
    * has low Jaccard (the union is dominated by the long doc) but
    * containment |A∩B|/|A| ≈ 1. Emits every pair whose larger
    * containment reaches ½ (the integer-exact keep rule below), with
    * both directions and the Jaccard for context — the
    * "quote/excerpt" edge set that complements the near-dup pair
    * relation.
    *
    * Scale design: the candidate engine is a DOCUMENT-FREQUENCY-CAPPED
    * inverted index: only grams appearing in ≤ `maxDf` documents
    * generate pairs, so the gram self-join's fan-out is Σ df² ≤
    * maxDf · (total postings) — linear in the corpus at constant
    * maxDf, never the quadratic all-pairs trap. The contract is that
    * ALL statistics (sizes, intersection, containment) are over the
    * capped gram universe: a pair sharing only ubiquitous grams is
    * boilerplate (x34's department), not duplication, and dropping it
    * is the screen's point, not a recall bug. The keep rule
    * 2·isz ≥ min(szA, szB) is integer-exact — no float compare at the
    * cut. */
  def containmentScreen(docs: DataFrame, n: Int = 3, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    import graft.functions.ShingleFunctions.ngram_strings
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(ngram_strings(words(col(textCol)), n))).as("gram"))
      .localCheckpoint(true) // feeds df, sizes AND both join sides
    val kept = grams.groupBy(col("gram")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("gram"))
    val gk = grams.join(kept, "gram").localCheckpoint(true)
    val sz = gk.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val ip = gk.as("a").join(gk.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("isz"))
    ip.join(sz.select(col("doc_id").as("doc_a"), col("sz").as("__sa")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("__sb")), "doc_b")
      .filter(lit(2) * col("isz") >= least(col("__sa"), col("__sb")))
      .select(col("doc_a"), col("doc_b"),
        round(col("isz").cast("double")
          / (col("__sa") + col("__sb") - col("isz")).cast("double"), 6).as("jaccard"),
        round(col("isz").cast("double") / col("__sa").cast("double"), 6).as("cont_a"),
        round(col("isz").cast("double") / col("__sb").cast("double"), 6).as("cont_b"))
  }

  /** N-gram novelty: per document, the fraction of its distinct word
    * n-grams whose FIRST corpus occurrence (minimum doc id) is this
    * document — the redundancy-aware selection signal: a document
    * whose grams all appeared in earlier documents adds no new
    * surface text, however different it looks at the whole-doc level.
    * Complements near-dup removal (which needs pairwise similarity)
    * by charging each doc only for text that is globally new.
    *
    * Scale design: two hash aggregations keyed on gram then doc — the
    * gram-keyed first-occurrence aggregate and the join that carries
    * it back to (doc, gram) pairs hash on the SAME key, so Catalyst
    * reuses one gram partitioning across both (no second shuffle
    * between them). Nothing is broadcast (the gram dictionary is
    * corpus-scale); docs with fewer than n words have no grams and
    * are absent, by contract.
    *
    * Output: (doc_id, n_grams, n_novel, novelty = n_novel/n_grams
    * rounded to 6 dp). */
  def ngramNovelty(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        graft.functions.TextFunctions.wordShingles(col(textCol), n))).as("gram"))
    val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** Per-document character-level Shannon entropy — the cheapest
    * "is this text or noise" signal in the filtering literature: very
    * low entropy = repeated characters/boilerplate walls, very high =
    * random-looking bytes; natural language sits in a band. Computed
    * over the lowercased character histogram, in micro-nats:
    * H = −Σ (c/n)·ln(c/n), with ln quantized ONCE per (doc, char)
    * class (the x67 discipline — exact integer c and n into one ln,
    * rounded to micro) and the outer combination pure integer algebra
    * (−Σ c·lp, one truncating division by n). The `low_entropy` flag
    * trips below 2 nats — a threshold tuned for letter-histogram
    * entropy, where natural text runs ≈ 2.7–3.1.
    *
    * Scale: one explode-to-characters pass, two partial+final hash
    * aggregations ((doc, char) then doc) — map-side combine collapses
    * repeated characters before the exchange, so the shuffled volume
    * is |alphabet| per doc, not |chars|. Nothing broadcasts.
    *
    * Output: (doc_id, n_chars_counted, entropy_micro, low_entropy),
    * one row per doc with ≥ 1 character. */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perChar = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    perChar
      .withColumn("__n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("c"), col("__n"),
        round(round(log(col("c").cast("double") / col("__n").cast("double")),
          6) * lit(1000000.0)).cast("long").as("__lp"))
      .groupBy(col("doc_id"))
      .agg(max(col("__n")).cast("bigint").as("n_chars_counted"),
        expr("(-sum(c * __lp)) div max(__n)").as("entropy_micro"))
      .withColumn("low_entropy", col("entropy_micro") < 2000000L)
  }

  /** Gopher-style repetition battery (Rae et al. 2021, §A1.1): the
    * three character-weighted repetition signals the Gopher quality
    * filter thresholds, computed per document —
    *
    *  - `top2_micro` / `top3_micro`: fraction of n-gram CHARACTER mass
    *    taken by the single most frequent word 2-/3-gram (boilerplate
    *    repeats a few grams; char-weighting catches long repeated
    *    grams a count-ratio underweights),
    *  - `dup5_micro`: fraction of 5-gram character mass in grams that
    *    occur ≥ 2 times (the "duplicated n-gram" signal),
    *
    * each as occurrences·len(gram) over the doc's total Σ count·len,
    * in integer micro (floor division — exact, engine-identical).
    * `keep` applies the paper's thresholds (top-2 ≤ 0.20, top-3 ≤
    * 0.18, dup-5 ≤ 0.15) as integer comparisons. Complements
    * [[repetitionRatio]] (count-weighted, single n) — this is the
    * multi-signal char-weighted battery with the shipping verdict.
    *
    * Scale: ONE tokenize pass fans out to the three gram lengths
    * (union, tagged by n), then two partial+final hash aggregations —
    * (doc, n, gram) then (doc, n) — and a conditional-aggregation
    * pivot to one row per doc. Map-side combine collapses repeats
    * before any exchange; nothing broadcasts.
    *
    * Docs too short for an n-gram length contribute NULL for that
    * signal (and `keep` treats the missing signal as passing —
    * a 3-word doc cannot fail the 5-gram rule).
    *
    * Output: (doc_id, top2_micro, top3_micro, dup5_micro, keep). */
  def gopherRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.ShingleFunctions.ngram_strings
    val toks = tokFrame(docs, idCol, textCol)
    val grams = Seq(2, 3, 5).map { n =>
      toks.select(col("doc_id"), lit(n).as("n"),
        explode(ngram_strings(col("__w"), n)).as("gram"))
    }.reduce(_ unionAll _)
    val perGram = grams
      .groupBy(col("doc_id"), col("n"), col("gram"))
      .agg((count(lit(1)) * length(col("gram"))).cast("bigint").as("cm"),
        count(lit(1)).as("c"))
    val perN = perGram.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("cm")).cast("bigint").as("tot"),
        max(col("cm")).cast("bigint").as("top"),
        sum(when(col("c") >= 2, col("cm")).otherwise(0L)).cast("bigint")
          .as("dup"))
    val wide = perN.groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, expr("top * 1000000L div tot"))).as("top2_micro"),
        max(when(col("n") === 3, expr("top * 1000000L div tot"))).as("top3_micro"),
        max(when(col("n") === 5, expr("dup * 1000000L div tot"))).as("dup5_micro"))
    docs.select(col(idCol).as("doc_id")).join(wide, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top2_micro"), col("top3_micro"),
        col("dup5_micro"),
        (coalesce(col("top2_micro"), lit(0L)) <= 200000L &&
          coalesce(col("top3_micro"), lit(0L)) <= 180000L &&
          coalesce(col("dup5_micro"), lit(0L)) <= 150000L).as("keep"))
  }

  /** Data-efficiency curve: rank the corpus by quality and read how
    * much token mass each quality decile carries — the "how much of
    * the data is worth training on" curve behind every quality-
    * threshold decision: if the top 3 deciles hold 80% of tokens at
    * 95% of quality, the cut pays for itself; a flat curve means
    * quality filtering buys selection, not savings. Deciles come
    * from the QUANTIZED quality ranking (qualityScore — round(qr, 6)
    * — desc, doc_id; a total order, so tile boundaries are engine-
    * identical, the x128 discipline).
    *
    * Exactness: token counts are exact integers; cumulative sums are
    * integer window sums over the 10-row decile frame; shares are
    * floor-divided micro.
    *
    * Scale: deciles come from [[Rank.withExactNtile]] over the (doc,
    * score, tokens) projection — bit-identical to the `ntile` window
    * form, but the only unpartitioned window runs over the quality-
    * score HISTOGRAM. The RAW score's alpha/punct ratio features make
    * its distinct count grow ~O(docs) — past the 3e6 envelope the
    * tile guard would deterministically raise_error — so the score is
    * quantized to the 6-dp grid FIRST (ADVICE r11): the codomain is
    * then ≤ 1e6+1 grid points in [0, 1] BY CONSTRUCTION, under the
    * envelope at any corpus size. Only the ≤ 9 boundary tie groups
    * rank row-by-row, partitioned by score.
    *
    * Output: (decile, n_docs, tokens, cum_tokens, cum_share_micro),
    * deciles 1 (best) → 10. */
  def dataEfficiencyCurve(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.{qualityScore, words}
    import org.apache.spark.sql.expressions.Window
    val scored = Rank.withExactNtile(
      docs.select(col(idCol).as("doc_id"),
          qualityScore(col(textCol)).as("__q"),
          size(words(col(textCol))).cast("bigint").as("__t"))
        // quality DESC ranks ascending on the NEGATED score (exact
        // sign flip of the 6-dp-quantized double)
        .withColumn("__negq", negate(col("__q"))),
      "__negq", "doc_id", 10, "decile")
    val byDec = scored.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).cast("bigint").as("tokens"))
    val wRun = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("cum_tokens", sum(col("tokens")).over(wRun).cast("bigint"))
      .join(broadcast(byDec.agg(sum(col("tokens")).cast("bigint").as("__tt"))))
      .select(col("decile"), col("n_docs"), col("tokens"), col("cum_tokens"),
        expr("cum_tokens * 1000000L div __tt").as("cum_share_micro"))
      .orderBy(col("decile"))
  }

  /** Rank-biased overlap (Webber et al. 2010) between two quality-
    * signal rankings, truncated at depth K — DO two filter signals
    * agree where it matters (the top), weighting depth d by
    * p^(d−1)/d so early agreement dominates: two signals with RBO
    * near 1 are redundant (drop one); near 0 they see different
    * documents (keep both, or fuse as x147 does). Computed here for
    * the quality-score vs char-entropy rankings.
    *
    * The overlap curve comes from one integer histogram: a document
    * with ranks (r_a, r_b) enters both top-d sets exactly at depth
    * max(r_a, r_b), so overlap_d is the cumulated histogram of that
    * max — no per-depth set intersection. The geometric weights
    * p^(d−1) are SCALA-computed literals shipped to both engines
    * (exact same doubles), each depth's term quantizes once to
    * micro, and the RBO total is an integer sum scaled by (1−p).
    *
    * Scale: both rankings are bounded-heap top-K aggregates
    * ([[graft.functions.TopKScored]], the x58 pattern) — the shuffle
    * carries K (id, score) pairs per partition, never the corpus, and
    * the join/histogram run on two K-row lists.
    *
    * Output: (depth, overlap, term_micro, rbo_micro) for depths
    * 1..K — rbo_micro repeated (the truncated-sum RBO at K, the
    * paper's "RBO_MIN at depth K" reading). */
  def rankBiasedOverlap(docs: DataFrame, depthK: Int = 50,
      p: Double = 0.9, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(depthK > 0 && p > 0 && p < 1,
      s"rankBiasedOverlap: need depthK > 0 and 0 < p < 1, got $depthK/$p")
    import graft.functions.TextFunctions.qualityScoreRaw
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // only documents ranked ≤ K under BOTH signals can enter the
    // overlap histogram (greatest(ra, rb) ≤ K ⟺ ra ≤ K ∧ rb ≤ K), so
    // each ranking is the bounded-heap top-K (TopKScored combines
    // map-side; heap position + 1 IS the exact global rank) — the
    // corpus is never funneled through a global row_number partition
    val topk = udaf(new graft.functions.TopKScored(depthK))
    def rankList(scored: DataFrame, rankName: String): DataFrame =
      scored.agg(topk(col("doc_id"), col("__s")).as("__top"))
        .select(posexplode(col("__top")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as(rankName))
    val ra = rankList(base.select(col("doc_id"),
      qualityScoreRaw(col("text")).as("__s")), "__ra")
    val rb = rankList(charEntropy(base).select(col("doc_id"),
      col("entropy_micro").cast("double").as("__s")), "__rb")
    val entry = ra.join(rb, "doc_id")
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .groupBy(col("__m")).agg(count(lit(1)).as("__c"))
    // depth spine with the Scala-computed geometric weights — the
    // SAME double literals the oracle embeds
    val weights = (1 to depthK).map(d =>
      (d, math.pow(p, (d - 1).toDouble))).toDF("depth", "__w")
    val wRun = Window.orderBy(col("depth"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the truncated-sum total rides a full-frame window over the SAME
    // ≤K-row terms frame (no checkpoint, no second pass)
    val wAll = Window.orderBy(col("depth")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    weights
      .join(entry.withColumnRenamed("__m", "depth"), Seq("depth"), "left")
      .withColumn("overlap",
        sum(coalesce(col("__c"), lit(0L))).over(wRun).cast("bigint"))
      .withColumn("term_micro",
        expr("CAST(round(__w * overlap / CAST(depth AS DOUBLE) * 1000000) AS BIGINT)"))
      .withColumn("__rbo_sum", sum(col("term_micro")).over(wAll))
      .withColumn("rbo_micro",
        expr(s"CAST(round(__rbo_sum * ${1.0 - p}D) AS BIGINT)"))
      .select(col("depth"), col("overlap"), col("term_micro"),
        col("rbo_micro"))
      .orderBy(col("depth"))
  }

  /** Exclusive-vocabulary share per source: the fraction of each
    * source's distinct terms that appear in NO other source — the
    * "what would we actually lose by dropping this provider"
    * complement to x98's distinctive-term ranking (tf-idf finds
    * characteristic terms; this counts irreplaceable ones). High
    * share = unique coverage; near zero = the source's vocabulary is
    * fully redundant.
    *
    * Pure integer: one (source, term) distinct frame, term-level
    * source-counts (a row per (source, term) IS a source containing
    * the term — the x98 df trick, no second scan), exclusive =
    * source_count 1, one floor division.
    *
    * Scale: one tokenize pass → two hash aggregations keyed on
    * (source, term) then term; the term⋈count join reuses the term
    * partitioning. Output is |sources| rows.
    *
    * Output: (source, vocab, exclusive, exclusive_share_micro). */
  def exclusiveVocabShare(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    val st = docs.select(col(sourceCol).as("source"),
        explode(words(col(textCol))).as("term"))
      .distinct()
      .localCheckpoint(true) // feeds the df counts and the share join
    val df = st.groupBy(col("term")).agg(count(lit(1)).as("__sc"))
    st.join(df, "term")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("__sc") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("exclusive"))
      .withColumn("exclusive_share_micro",
        expr("exclusive * 1000000L div vocab"))
      .orderBy(col("source"))
  }

  /** Heaps-law vocabulary growth: distinct-vocabulary size at nested
    * 25/50/75/100% corpus samples, with the fitted Heaps exponent β
    * (V ≈ K·Nᵝ) — the "how much new vocabulary does more data buy"
    * curve that sizes tokenizers and predicts OOV decay at 10× the
    * corpus. The samples are NESTED by construction (md5-60(doc_id)
    * mod 100 < pct — a doc in the 25% sample is in every larger one),
    * so the curve is monotone and the fit is over a real growth path,
    * not four independent draws.
    *
    * Exactness: token and vocabulary counts are exact integers from
    * ONE tokenize pass (conditional distinct-counts per percentile);
    * ln N and ln V quantize once per point to MILLI-nats (coarser
    * than the usual micro to keep the 4-point OLS cross-products in
    * BIGINT); β is the exact integer least-squares slope over the 4
    * quantized points, shipped in micro. English-like corpora fit
    * β ≈ 0.4–0.6; β near 1 means the "vocabulary" is unbounded ids,
    * not words — a schema smell worth alarming on.
    *
    * Scale: one explode + one multi-distinct aggregation (Spark
    * expands the 4 conditional distincts into one Expand — still a
    * single pass over the token frame); the OLS runs on 4 rows.
    *
    * Output: (pct, n_docs, n_tokens, vocab, beta_micro) — 4 rows,
    * beta repeated (it is a property of the curve). */
  def heapsLawGrowth(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    val toks = docs
      .select(col(idCol).as("doc_id"),
        pmod(md5Bucket60(col(idCol)), lit(100L)).as("__b"),
        explode(words(col(textCol))).as("term"))
    val pcts = Seq(25, 50, 75, 100)
    val aggs = pcts.flatMap { p =>
      Seq(
        countDistinct(when(col("__b") < p, col("doc_id"))).as(s"__d$p"),
        sum(when(col("__b") < p, 1L).otherwise(0L)).cast("bigint").as(s"__n$p"),
        countDistinct(when(col("__b") < p, col("term"))).as(s"__v$p"))
    }
    // 1-row checkpoint: the 4-point unpivot selects this frame once per
    // percentile — without it every union branch re-ran the full
    // tokenize+aggregate (measured: 8 FileScans, zero ReusedExchange)
    val wide = toks.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val long = pcts.map { p =>
      wide.select(lit(p).as("pct"), col(s"__d$p").as("n_docs"),
        col(s"__n$p").as("n_tokens"), col(s"__v$p").as("vocab"))
    }.reduce(_ unionAll _)
      .withColumn("__x",
        round(round(log(col("n_tokens").cast("double")), 3) * lit(1000.0))
          .cast("long"))
      .withColumn("__y",
        round(round(log(col("vocab").cast("double")), 3) * lit(1000.0))
          .cast("long"))
    val fit = long.agg(
        count(lit(1)).as("__k"),
        sum(col("__x")).cast("bigint").as("__sx"),
        sum(col("__y")).cast("bigint").as("__sy"),
        sum(col("__x") * col("__y")).cast("bigint").as("__sxy"),
        sum(col("__x") * col("__x")).cast("bigint").as("__sxx"))
      .select(
        when(col("__k") * col("__sxx") - col("__sx") * col("__sx") > 0,
          expr("""(__k * __sxy - __sx * __sy) * 1000000L
                  div (__k * __sxx - __sx * __sx)""")).as("beta_micro"))
    long.select(col("pct"), col("n_docs"), col("n_tokens"), col("vocab"))
      .join(broadcast(fit))
      .orderBy(col("pct"))
  }

  /** Reciprocal-rank fusion of heterogeneous quality signals: rank
    * every document under each signal independently, score it
    * Σ 10⁶ div (60 + rank) across signals, keep the fused top-K —
    * the robust way to combine filter signals whose SCALES don't
    * compare (a raw quality score, an entropy, a repetition
    * fraction): RRF only consumes ranks, so one signal's units can
    * never drown the others, and k=60 (the standard constant) damps
    * any single ranking's head. Used here to build the "best of the
    * corpus by all signals at once" shortlist.
    *
    * Signals: quality score (desc), char entropy (desc), top-2-gram
    * repetition (asc — less repetition is better). Each ranking
    * orders by (signal, doc_id) — a total order, so ranks and
    * therefore the fused integer scores are engine-identical; the
    * RRF term is one floor division per (doc, signal).
    *
    * List semantics (as in the RRF literature, which fuses RETRIEVED
    * lists, not total corpus orders): each signal contributes its
    * top-`listDepth` list; a document outside a list carries a NULL
    * rank for that signal and contributes 0 to the fusion — rank
    * listDepth+1 would add ≤ 10⁶/(61+listDepth) ≈ 0.4% of a rank-1
    * term at the default depth, so deep-list noise is cut, not
    * approximated away silently.
    *
    * Scale: each per-signal list is a bounded-heap top-M aggregate
    * ([[graft.functions.TopKScored]], the x58 pattern) — heaps merge
    * map-side, the shuffle carries M (id, score) pairs per partition,
    * and the fusion joins three M-row lists; the corpus is never
    * funneled through a global rank window. The fused top-K cut is a
    * TakeOrdered bounded heap.
    *
    * Output: (rank, doc_id, rrf_micro, q_rank, e_rank, r_rank),
    * rank 1..topK by (rrf_micro desc, doc_id); per-signal ranks NULL
    * when the doc is outside that signal's top-listDepth list. */
  def signalRankFusion(docs: DataFrame, topK: Int = 50,
      listDepth: Int = 200, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(topK > 0, s"signalRankFusion: topK must be positive, got $topK")
    require(listDepth >= topK,
      s"signalRankFusion: listDepth ($listDepth) must cover topK ($topK)")
    import graft.functions.TextFunctions.qualityScoreRaw
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val topM = udaf(new graft.functions.TopKScored(listDepth))
    def rankList(scored: DataFrame, rankName: String): DataFrame =
      scored.agg(topM(col("doc_id"), col("__s")).as("__top"))
        .select(posexplode(col("__top")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("int").as(rankName))
    val q = rankList(base.select(col("doc_id"),
      qualityScoreRaw(col("text")).as("__s")), "q_rank")
    val e = rankList(charEntropy(base).select(col("doc_id"),
      col("entropy_micro").cast("double").as("__s")), "e_rank")
    // docs with no 2-grams carry no repetition evidence: treat as 0
    // (unrepetitive), the same "missing signal passes" stance as x138;
    // ascending repetition order = descending order on the negation
    val r = rankList(base.join(
        gopherRepetition(base).select(col("doc_id"), col("top2_micro")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        negate(coalesce(col("top2_micro"), lit(0L)).cast("double")).as("__s")),
      "r_rank")
    q.join(e, Seq("doc_id"), "full_outer")
      .join(r, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("q_rank"), col("e_rank"), col("r_rank"),
        (coalesce(expr("1000000L div (60 + CAST(q_rank AS BIGINT))"), lit(0L)) +
          coalesce(expr("1000000L div (60 + CAST(e_rank AS BIGINT))"), lit(0L)) +
          coalesce(expr("1000000L div (60 + CAST(r_rank AS BIGINT))"), lit(0L)))
          .as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("rrf_micro"),
        col("q_rank"), col("e_rank"), col("r_rank"))
  }

  /** Neyman allocation of an evaluation budget across strata: sample
    * size per source ∝ N_h·σ_h (population × spread — high-variance
    * strata need more eval docs for the same estimator error), with
    * the LARGEST-REMAINDER method turning real allocations into
    * integers that sum EXACTLY to the budget — the step most
    * hand-rolled eval samplers get wrong (floor-only allocations
    * under-spend; independent rounding over-spends).
    *
    * Exactness: σ_h comes from exact integer Σx and Σx² (one sqrt
    * per stratum, quantized to micro); weights and floor allocations
    * are integer floor division on the micro weights; remainders
    * rank by (remainder desc, source asc) — total order, so the +1
    * set is engine-identical. Single-doc strata (σ undefined) get
    * σ = 0: they still receive floor allocation from N_h·0 = 0 —
    * i.e. nothing, the statistically honest answer (one doc cannot
    * estimate spread; callers wanting a minimum per stratum compose
    * a floor upstream). Allocation is also capped at N_h (cannot
    * sample more docs than exist); capped-off budget is NOT
    * redistributed (the cap is reported, the caller re-plans).
    *
    * Scale: one (source) aggregation of count/Σx/Σx² collapses the
    * corpus; everything after runs on the |sources| frame.
    *
    * Output: (source, n_docs, sd_micro, weight_micro, alloc),
    * Σ alloc = min(budget, Σ min(N_h, …)-cap effects), ordered by
    * source. */
  def neymanAllocation(docs: DataFrame, budget: Int,
      strataCol: String = "source", valueCol: String = "n_chars"): DataFrame = {
    require(budget > 0, s"neymanAllocation: budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val stats = docs
      .select(col(strataCol).as("src"), col(valueCol).cast("long").as("__x"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__x")).cast("bigint").as("__s"),
        sum(col("__x") * col("__x")).cast("bigint").as("__ss"))
      // population σ: √(Σx²/n − (Σx/n)²), one fixed double expression
      // over exact integers, quantized once per stratum
      .withColumn("sd_micro", when(col("n_docs") > 1,
        round(sqrt(
          col("__ss").cast("double") / col("n_docs").cast("double") -
            (col("__s").cast("double") / col("n_docs").cast("double")) *
              (col("__s").cast("double") / col("n_docs").cast("double"))) *
          lit(1000000.0)).cast("long")).otherwise(0L))
      .withColumn("__w", col("n_docs") * col("sd_micro"))
    val tot = stats.agg(sum(col("__w")).cast("bigint").as("__tw"))
    val planned = stats.join(broadcast(tot))
      .withColumn("weight_micro",
        when(col("__tw") > 0, expr("__w * 1000000L div __tw")).otherwise(0L))
      .withColumn("__exactB", expr(s"__w * ${budget}L"))
      .withColumn("__floor", when(col("__tw") > 0,
        expr("__exactB div __tw")).otherwise(0L))
      .withColumn("__rem", when(col("__tw") > 0,
        expr("__exactB % __tw")).otherwise(0L))
    val leftover = planned.agg(
      (lit(budget.toLong) - sum(col("__floor"))).cast("bigint").as("__extra"))
    planned.join(broadcast(leftover))
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("__rem").desc, col("src"))))
      .withColumn("alloc",
        least(col("n_docs"),
          col("__floor") + when(col("__rr") <= col("__extra"), 1L)
            .otherwise(0L)))
      .select(col("src").as(strataCol), col("n_docs"), col("sd_micro"),
        col("weight_micro"), col("alloc"))
      .orderBy(col(strataCol))
  }

  /** The x143 default language-mix target (micro shares, sum 10⁶) —
    * a public constant so the SQL oracle renders its VALUES relation
    * from the SAME numbers the Spark plan broadcasts. */
  val DefaultMixTarget: Seq[(String, Long)] = Seq(
    "en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
    "fr" -> 150000L, "zh" -> 150000L)

  /** Target-mixture sampling plan: given a token budget and a target
    * language mix, the per-language sampling rate that gets closest
    * to the target under availability — the planning step between
    * x71's per-group budget cap (which takes rates as given) and
    * x54's equalizing upsample (which ignores budgets). For each
    * language: desired = budget·share, rate = min(1, desired/avail)
    * — a language with too little data saturates at rate 1 and the
    * plan reports the shortfall instead of silently under-delivering
    * the mix.
    *
    * Exactness: token counts are exact integers (the shared
    * tokenizer); desired, rate (micro), sampled and shortfall are
    * floor-division integer algebra — engine-identical, and the plan
    * is REPRODUCIBLE: downstream selection can apply `rate_micro`
    * with the md5-60 gate (the x30/x95 sampling contract).
    *
    * Scale: one tokenize+count aggregation per language (partial+
    * final); the target map is a literal VALUES relation (broadcast
    * by construction). Languages in the corpus but not the target
    * get rate 0 (excluded from the mix); target languages absent
    * from the corpus surface as avail 0 / shortfall = desired.
    *
    * Output: (lang, avail_tokens, target_micro, desired_tokens,
    * rate_micro, sampled_tokens, shortfall_tokens), ordered by lang. */
  def targetMixPlan(docs: DataFrame, budgetTokens: Long,
      targets: Seq[(String, Long)] = DefaultMixTarget,
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0,
      s"targetMixPlan: budgetTokens must be positive, got $budgetTokens")
    require(targets.map(_._2).sum == 1000000L,
      s"targetMixPlan: target shares must sum to 1000000, got ${targets.map(_._2).sum}")
    val spark = docs.sparkSession
    import spark.implicits._
    val tgt = targets.toDF("lang", "target_micro")
    val avail = docs
      .select(col(langCol).as("lang"),
        size(graft.functions.TextFunctions.words(col(textCol)))
          .cast("bigint").as("__t"))
      .groupBy(col("lang")).agg(sum(col("__t")).cast("bigint").as("avail_tokens"))
    avail.join(broadcast(tgt), Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("avail_tokens"), lit(0L)).as("avail_tokens"),
        coalesce(col("target_micro"), lit(0L)).as("target_micro"))
      .withColumn("desired_tokens",
        expr(s"target_micro * ${budgetTokens}L div 1000000L"))
      .withColumn("rate_micro",
        when(col("avail_tokens") > 0,
          least(lit(1000000L),
            expr("desired_tokens * 1000000L div avail_tokens")))
          .otherwise(lit(0L)))
      .withColumn("sampled_tokens",
        expr("avail_tokens * rate_micro div 1000000L"))
      .withColumn("shortfall_tokens",
        greatest(lit(0L), col("desired_tokens") - col("sampled_tokens")))
      .orderBy(col("lang"))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its tokens are under a
    * TARGET domain's hashed-unigram model than under the raw corpus
    * model, then keep the top-K — the domain-matching selection step
    * between x67's single-reference log-prob and x44's temperature
    * resample. Hashing the vocabulary into `buckets` cells is the
    * paper's trick: the model is a fixed-size count vector, so the
    * weight is computable in one pass with no vocabulary dictionary.
    *
    * Weight = Σ_tokens ln(p_target[b] / p_raw[b]) with add-one
    * smoothing over the bucket space. Exactness: the log-ratio is
    * quantized ONCE per bucket to micro-nats (the x67 discipline —
    * one ln per bucket over exact integer counts, identical double
    * ops in both engines), then each document's weight is the exact
    * integer Σ tf·lr — so the (weight desc, doc_id) top-K cut is
    * engine-identical.
    *
    * Scale: two token passes collapse to bucket histograms (`buckets`
    * rows — broadcast-size by construction, the POINT of hashing);
    * the per-doc score is one (doc, bucket) aggregation joined
    * against the broadcast bucket model; the top-K cut is
    * TakeOrderedAndProject (bounded heap), never a global sort. The
    * target model derives from the raw pass by a filtered re-scan —
    * at 100 TB the two scans are the only full-volume work.
    *
    * Output: (rank, doc_id, lang, n_tokens, weight_micro), rank
    * 1..topK by (weight_micro desc, doc_id asc). */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 256, topK: Int = 100, idCol: String = "doc_id",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(buckets > 0 && topK > 0,
      s"dsirWeights: buckets and topK must be positive, got $buckets/$topK")
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        explode(graft.functions.TextFunctions.words(col(textCol))).as("tok"))
      .withColumn("b", pmod(md5Bucket60(col("tok")), lit(buckets.toLong)))
    val docTf = toks.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("tf"))
    val rawCnt = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgtCnt = toks.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = rawCnt.agg(sum(col("cr")).cast("bigint").as("R"))
      .join(tgtCnt.agg(sum(col("ct")).cast("bigint").as("T")))
    // log-ratio per bucket, quantized once: ln(((ct+1)/(T+B)) /
    // ((cr+1)/(R+B))) — same double expression text as the oracle
    val model = rawCnt.join(tgtCnt, Seq("b"), "left").join(broadcast(totals))
      .select(col("b"),
        round(round(log(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("T") + buckets).cast("double")) *
          ((col("R") + buckets).cast("double") /
            (col("cr") + 1).cast("double"))), 6) * lit(1000000.0))
          .cast("long").as("lr"))
    val scored = docTf.join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("bigint").as("n_tokens"),
        sum(col("tf") * col("lr")).cast("bigint").as("weight_micro"))
    import org.apache.spark.sql.expressions.Window
    scored.join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .orderBy(col("weight_micro").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("weight_micro").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("n_tokens"),
        col("weight_micro"))
  }

  /** Concat-and-chunk packing audit: concatenate each source's docs
    * in (doc_id) order, cut the stream every `chunkTokens` tokens —
    * the packing every GPT-style pretraining loader applies — and
    * report what the cut costs: how many docs SPAN a chunk boundary
    * (their loss is computed across an attention reset or pollutes
    * the next sequence, depending on masking), and how much of the
    * final chunk is padding. The two numbers that decide chunk
    * length and whether document-boundary masking is worth its
    * throughput cost for THIS corpus. Complements [[packSequences]]
    * (x31: whole-doc bin ids under a budget — docs never split) and
    * [[chunkDocuments]] (x33: per-doc char windows) — this one
    * audits the cross-document TOKEN stream cut.
    *
    * Packing model: pure concat-and-chunk (docs split mid-document at
    * every L-token boundary) — deliberately NOT first-fit bin
    * packing, whose greedy recurrence is inherently sequential;
    * concat-and-chunk is what the common loaders do and is exactly
    * expressible as one running sum. A doc's chunk span derives from
    * its start offset: first = start div L, last = (start+t−1) div L.
    * Token-less docs pack nothing and are excluded up front.
    *
    * Exactness: token counts, running offsets, chunk ids, and the
    * waste arithmetic are all exact BIGINT; the two rates are single
    * floor divisions.
    *
    * Scale: one tokenize pass; the running offset comes from the
    * two-phase per-source prefix sum (round 12,
    * [[graft.operators.Rank.withGroupedPrefixSums]] — each source
    * packs independently but no single source ever serializes
    * through one task); one partial+final aggregation to the
    * |sources| output frame.
    *
    * Output: (source, n_docs, n_tokens, n_chunks, n_split_docs,
    * split_micro, waste_tokens, waste_micro), ordered by source. */
  def chunkPackingAudit(docs: DataFrame, chunkTokens: Long = 512L,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(chunkTokens > 0,
      s"chunkPackingAudit: chunkTokens must be positive, got $chunkTokens")
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val L = chunkTokens
    val toks = docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
        size(words(col(textCol))).cast("long").as("t"))
      .filter(col("t") > 0)
    // round 12: exclusive running offset = inclusive prefix sum − own
    // weight, from the two-phase decomposition — no whole-source
    // single-task sort
    Rank.withGroupedPrefixSums(toks, "source", Seq(col("id")),
        Seq("t" -> "__ci"))
      .withColumn("__cb", col("__ci") - col("t"))
      .select(col("source"), col("t"),
        expr(s"__cb div $L").as("__fc"),
        expr(s"(__cb + t - 1) div $L").as("__lc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).cast("bigint").as("n_tokens"),
        sum(when(col("__lc") > col("__fc"), 1L).otherwise(0L)).cast("bigint")
          .as("n_split_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + $L - 1) div $L").as("n_chunks"),
        col("n_split_docs"),
        expr("n_split_docs * 1000000L div n_docs").as("split_micro"))
      .withColumn("waste_tokens", expr(s"n_chunks * $L - n_tokens"))
      .withColumn("waste_micro",
        expr(s"waste_tokens * 1000000L div (n_chunks * $L)"))
      .orderBy(col("source"))
  }

  /** Mixed-language document audit: language-id every fixed-size chunk
    * of a document ([[chunkDocuments]] grid + the x08 heuristic) and
    * flag documents whose chunks disagree — code-switching, bilingual
    * boilerplate, or concatenation artifacts that a single doc-level
    * lang tag hides (and that poison monolingual training splits).
    * The chunk-level sibling of x08's doc-level confusion.
    *
    * Determinism: chunk boundaries are the exact stride grid; each
    * chunk's prediction is the same argmax-with-lexicographic-tiebreak
    * as [[graft.functions.TextFunctions.langId]]; the majority chunk
    * language is the (count, lang) struct max — ties to the
    * lexicographically larger code, stated contract; the minority
    * rate is one integer floor division.
    *
    * Scale: one chunk explode (×docLen/stride fan-out, narrow), two
    * partial+final aggregations ((doc, pred) then doc) — no joins
    * beyond the doc-tag attach, no windows. Single-chunk docs cannot
    * exhibit mixing and are excluded (minChunks).
    *
    * Output: (doc_id, lang, n_chunks, n_langs, majority_pred,
    * majority_chunks, minority_micro, mixed), ordered by doc_id;
    * `mixed` = more than one distinct non-'und' chunk prediction. */
  def mixedLanguageAudit(docs: DataFrame, window: Int = 200,
      stride: Int = 200, minChunks: Int = 2, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    import graft.functions.TextFunctions.langId
    require(minChunks >= 2,
      s"mixedLanguageAudit: minChunks must be >= 2, got $minChunks")
    val preds = chunkDocuments(docs, window, stride, idCol, textCol)
      .select(col("doc_id"), langId(col("chunk")).as("__p"))
      .groupBy(col("doc_id"), col("__p"))
      .agg(count(lit(1)).as("__c"))
    preds.groupBy(col("doc_id"))
      .agg(sum(col("__c")).cast("bigint").as("n_chunks"),
        count(lit(1)).cast("bigint").as("n_langs"),
        max(struct(col("__c").as("c"), col("__p").as("p"))).as("__maj"),
        sum(when(col("__p") =!= "und", 1L).otherwise(0L)).cast("bigint")
          .as("__real"))
      .filter(col("n_chunks") >= minChunks)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chunks"), col("n_langs"),
        col("__maj.p").as("majority_pred"),
        col("__maj.c").cast("bigint").as("majority_chunks"),
        expr("(n_chunks - __maj.c) * 1000000L div n_chunks")
          .as("minority_micro"),
        (col("__real") > 1).as("mixed"))
      .orderBy(col("doc_id"))
  }

  /** Per-source vocabulary KL divergence from the corpus: KL(p̂_s ‖ p̂)
    * of the source's EMPIRICAL unigram distribution against the
    * corpus's — the one-number "how far does this provider's language
    * sit from the mixture" read that ranks sources for domain
    * balance, beside x117's per-cell PMI and x164's exclusive-vocab
    * share. No smoothing needed: every source term exists in the
    * corpus (source counts are part of corpus counts), so every
    * ratio is finite, and absent terms contribute exactly 0 to
    * Σ p·ln(p/q) under the empirical p.
    *
    * Exactness: the log-ratio ln((c_st·T)/(T_s·c_t)) quantizes ONCE
    * per (source, term) to micro-nats (exact integer products into
    * one double division — same expression text in the oracle); the
    * divergence is the exact integer Σ c_st·lr over the source,
    * shipped as one floor division by T_s.
    *
    * Scale: one tokenize pass feeds both the (source, term) and
    * (term) aggregations; the scoring join is keyed on term and
    * reuses the term partitioning; output is |sources| rows.
    *
    * Output: (source, n_terms, total_tokens, kl_micro), ordered by
    * source. */
  def sourceVocabKL(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.words
    val st = docs.select(col(sourceCol).as("source"),
        explode(words(col(textCol))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("__cs"))
      .localCheckpoint(true) // feeds corpus counts AND the scoring join
    val ct = st.groupBy(col("term")).agg(sum(col("__cs")).cast("bigint").as("__ct"))
    val ts = st.groupBy(col("source")).agg(sum(col("__cs")).cast("bigint").as("__ts"))
    val tt = ct.agg(sum(col("__ct")).cast("bigint").as("__tt"))
    st.join(ct, "term").join(ts, "source").join(broadcast(tt))
      .select(col("source"), col("__cs"), col("__ts"),
        round(round(log(
          (col("__cs").cast("double") * col("__tt").cast("double")) /
            (col("__ts").cast("double") * col("__ct").cast("double"))), 6) *
          lit(1000000.0)).cast("long").as("__lr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        max(col("__ts")).cast("bigint").as("total_tokens"),
        sum(col("__cs") * col("__lr")).cast("bigint").as("__num"))
      .select(col("source"), col("n_terms"), col("total_tokens"),
        expr("__num div total_tokens").as("kl_micro"))
      .orderBy(col("source"))
  }

  /** Common-prefix boilerplate profile: group documents by their
    * first `prefixTokens` tokens and surface every prefix shared by
    * at least `minDf` documents — the header/template detector
    * (scraped corpora repeat "subscribe to our newsletter"-class
    * openings verbatim) at DOCUMENT-START granularity, beside x34's
    * position-blind bigram screen and x81's set-novelty. A prefix
    * carried by many docs across many sources is crawler boilerplate;
    * one confined to a single source is that provider's template.
    *
    * Pure integer: the prefix is an exact token-slice join (no
    * hashing — the string itself is the key, exact on any engine);
    * counts and the share are one aggregation + one floor division.
    *
    * Scale: one tokenize pass, one hash aggregation keyed on the
    * prefix string; output bounded by the number of REPEATED
    * prefixes (≥ minDf), which is small by construction. Docs with
    * no tokens have no prefix and are excluded.
    *
    * Output: (prefix, n_docs, n_sources, share_micro), ordered by
    * (n_docs desc, prefix). */
  def commonPrefixProfile(docs: DataFrame, prefixTokens: Int = 4,
      minDf: Int = 3, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(prefixTokens >= 1 && minDf >= 2,
      s"commonPrefixProfile: need prefixTokens >= 1 and minDf >= 2, " +
        s"got $prefixTokens/$minDf")
    import graft.functions.TextFunctions.words
    val total = docs.agg(count(lit(1)).cast("bigint").as("__n"))
    docs.select(col(sourceCol).as("source"),
        array_join(slice(words(col(textCol)), 1, prefixTokens), " ")
          .as("prefix"))
      .filter(col("prefix") =!= "")
      .groupBy(col("prefix"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct(col("source")).cast("bigint").as("n_sources"))
      .filter(col("n_docs") >= minDf)
      .join(broadcast(total))
      .select(col("prefix"), col("n_docs"), col("n_sources"),
        expr("n_docs * 1000000L div __n").as("share_micro"))
      .orderBy(col("n_docs").desc, col("prefix"))
  }

  /** Leave-one-source-out ablation table: for every source, what the
    * corpus looks like WITHOUT it — remaining token share, the
    * quality mean of the rest, the delta that dropping the source
    * would move the corpus mean by, and how many near-dup pairs the
    * source participates in. The "which provider can we afford to
    * cut" planner: all |sources| ablations come from ONE pass of
    * per-source sufficient statistics (sums subtract exactly — no
    * per-ablation rescan), plus one pass over the x04 pair relation.
    *
    * Exactness: quality rides the round-6 score ×10⁶ as exact BIGINT
    * per doc; every mean/delta is integer floor division of exact
    * sums; pair counts are exact integers (a pair with both ends in
    * the source counts once for it — array_distinct per pair).
    *
    * Scale: one doc pass → |sources| stat rows; one pair-relation
    * pass → per-source touch counts; the 1-row corpus totals
    * broadcast. Output: (source, n_docs, tokens, token_share_rest_micro,
    * mean_q_micro, loso_mean_q_micro, loso_delta_micro,
    * dup_pairs_touching), ordered by source; loso columns null for a
    * single-source corpus. */
  def sourceAblation(docs: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.{qualityScore, words}
    val per = docs.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
        size(words(col(textCol))).cast("long").as("__t"),
        round(qualityScore(col(textCol)) * lit(1000000.0)).cast("long")
          .as("__q"))
      .localCheckpoint(true) // feeds the stats AND the pair source tags
    val st = per.groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("__t")).cast("bigint").as("tokens"),
        sum(col("__q")).cast("bigint").as("__qs"))
    val tot = st.agg(sum(col("n_docs")).cast("bigint").as("__N"),
      sum(col("tokens")).cast("bigint").as("__T"),
      sum(col("__qs")).cast("bigint").as("__Q"))
    val src = per.select(col("doc_id"), col("source"))
    val touches = Dedup.ngramJaccardNearDup(docs, idCol, textCol,
        ngram = 3, prefixK = 8, minJaccard = 0.2)
      .join(src.toDF("doc_a", "__sa"), "doc_a")
      .join(src.toDF("doc_b", "__sb"), "doc_b")
      .select(explode(array_distinct(array(col("__sa"), col("__sb"))))
        .as("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("dup_pairs_touching"))
    st.join(broadcast(tot))
      .join(touches, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("(__T - tokens) * 1000000L div __T").as("token_share_rest_micro"),
        expr("__qs div n_docs").as("mean_q_micro"),
        when(col("__N") > col("n_docs"),
          expr("(__Q - __qs) div (__N - n_docs)")).as("loso_mean_q_micro"),
        when(col("__N") > col("n_docs"),
          expr("(__Q - __qs) div (__N - n_docs) - __Q div __N"))
          .as("loso_delta_micro"),
        coalesce(col("dup_pairs_touching"), lit(0L)).as("dup_pairs_touching"))
      .orderBy(col("source"))
  }

  /** Truncation plan: for each candidate max-sequence length, what a
    * hard truncate at L tokens would COST this corpus — documents
    * clipped, token mass lost, mass kept — the table that picks a
    * model's max_seq_len from the data instead of folklore, and the
    * per-document-cut complement of [[chunkPackingAudit]] (packing
    * keeps every token across chunk boundaries; truncation drops the
    * tail — these are the two loader policies, costed side by side).
    *
    * Pure integer: token counts are exact; every candidate's clipped
    * counts are conditional sums in ONE aggregation pass (the
    * heapsLawGrowth multi-conditional shape — adding candidates adds
    * expressions, never scans); shares are floor divisions.
    *
    * Output: (max_len, n_docs, n_clipped, tokens_total, tokens_lost,
    * lost_micro, kept_micro), one row per candidate, ascending. */
  def truncationPlan(docs: DataFrame,
      maxLens: Seq[Int] = Seq(64, 128, 256, 512),
      textCol: String = "text"): DataFrame = {
    require(maxLens.nonEmpty && maxLens.forall(_ > 0),
      s"truncationPlan: need positive candidate lengths, got $maxLens")
    import graft.functions.TextFunctions.words
    val t = docs.select(size(words(col(textCol))).cast("long").as("__t"))
    val aggs = count(lit(1)).cast("bigint").as("__n") +:
      sum(col("__t")).cast("bigint").as("__tot") +:
      maxLens.sorted.flatMap { l =>
        Seq(
          sum(when(col("__t") > l, 1L).otherwise(0L)).cast("bigint")
            .as(s"__over$l"),
          sum(when(col("__t") > l, col("__t") - l).otherwise(0L))
            .cast("bigint").as(s"__lost$l"))
      }
    // 1-row checkpoint: the per-candidate unpivot selects this frame
    // once per candidate — without it each branch re-runs the corpus
    // aggregation (ReuseExchange does not always cover union branches)
    val wide = t.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    maxLens.sorted.map { l =>
      wide.select(lit(l).as("max_len"), col("__n").as("n_docs"),
        col(s"__over$l").as("n_clipped"),
        col("__tot").as("tokens_total"),
        col(s"__lost$l").as("tokens_lost"),
        expr(s"__lost$l * 1000000L div __tot").as("lost_micro"),
        expr(s"(__tot - __lost$l) * 1000000L div __tot").as("kept_micro"))
    }.reduce(_ unionAll _).orderBy(col("max_len"))
  }

  /** Zipf slope over the frequency head: OLS of ln(count) on ln(rank)
    * for the top-K terms — the one-number corpus-health read beside
    * [[heapsLawGrowth]]'s β: natural language runs ≈ −1 (Zipf's law);
    * a much flatter head means boilerplate/template mass (the same
    * few strings stamped everywhere), a much steeper one a
    * vocabulary dominated by a handful of tokens (log spam,
    * separator artifacts). Complements [[vocabStats]] (x36: the
    * top-K table with cumulative mass) — this one ships the FITTED
    * exponent, the comparable-across-corpora scalar. Fit over the
    * HEAD only, by design: the
    * head is where the law is linear, the fit is exact over K
    * points, and the top-K cut is cheap at any corpus size (the tail
    * fit would need per-rank work over the whole vocabulary).
    *
    * Exactness: the top-K cut orders by (count desc, term asc) — a
    * total order, so the retained set and ranks are engine-
    * identical; ln(rank) and ln(count) quantize once per point to
    * MILLI-nats (the Heaps discipline — keeps the K-point OLS
    * cross-products comfortably in BIGINT); the slope is one integer
    * division whose denominator k·Σxx−(Σx)² is non-negative, and
    * both engines truncate the signed numerator toward zero
    * identically.
    *
    * Scale: one tokenize pass → one partial+final term count → a
    * bounded TakeOrdered top-K (never a vocabulary sort); the OLS
    * runs on K rows. The corpus totals ride the same count frame.
    *
    * Output: 1 row — (k, vocab, total_tokens, head_tokens,
    * head_mass_micro, slope_micro). */
  def zipfHeadSlope(docs: DataFrame, topK: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topK >= 3, s"zipfHeadSlope: topK must be >= 3, got $topK")
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val cnt = docs
      .select(explode(words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds the totals AND the head
    val totals = cnt.agg(count(lit(1)).cast("bigint").as("vocab"),
      sum(col("c")).cast("bigint").as("total_tokens"))
    val head = cnt.orderBy(col("c").desc, col("term")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c").desc, col("term"))))
      .select(col("c"),
        round(round(log(col("rank").cast("double")), 3) * lit(1000.0))
          .cast("long").as("__x"),
        round(round(log(col("c").cast("double")), 3) * lit(1000.0))
          .cast("long").as("__y"))
    head.agg(count(lit(1)).cast("bigint").as("k"),
        sum(col("c")).cast("bigint").as("head_tokens"),
        sum(col("__x")).cast("bigint").as("__sx"),
        sum(col("__y")).cast("bigint").as("__sy"),
        sum(col("__x") * col("__y")).cast("bigint").as("__sxy"),
        sum(col("__x") * col("__x")).cast("bigint").as("__sxx"))
      .join(broadcast(totals))
      .select(col("k"), col("vocab"), col("total_tokens"), col("head_tokens"),
        expr("head_tokens * 1000000L div total_tokens").as("head_mass_micro"),
        when(expr("k * __sxx - __sx * __sx") > 0,
          expr("(k * __sxy - __sx * __sy) * 1000000L div (k * __sxx - __sx * __sx)"))
          .as("slope_micro"))
  }
  /** Per-group bigram conditional entropy H(w₂|w₁) — the information
    * rate of the word process, in micro-nats per bigram: low H means
    * repetitive, template-like text (the next word is predictable
    * from the previous one), high H means diverse continuations. The
    * corpus-structure read that complements [[gopherRepetition]]'s
    * surface repetition fractions and the char-level entropy screen
    * (x142): H = −Σ p(w₁,w₂)·ln p(w₂|w₁) over the group's bigram
    * distribution.
    *
    * Exactness: ln(c₁₂/c₁) is quantized ONCE per (group, w₁, w₂) cell
    * to micro-nats (the x96/x67 idiom), weighted by the INTEGER c₁₂
    * and integer-summed — order-free; the final division by the
    * group's bigram total is one floor division.
    *
    * Scale: one tokenize+pair pass collapsed by hash aggregation to
    * the (group, w₁, w₂) histogram; left-context counts aggregate off
    * that histogram (no second corpus scan); everything downstream is
    * histogram-sized.
    *
    * Output: (groupCol, n_bigrams, n_distinct_bigrams, h_cond_micro),
    * ordered by group; groups with no bigrams are absent. */
  def bigramConditionalEntropy(docs: DataFrame,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val pairs = docs
      .select(col(groupCol).as("grp"),
        graft.functions.TextFunctions.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("grp"), explode(graft.functions.ShingleFunctions
        .adjacent_pairs(col("__w"))).as("__p"))
      .groupBy(col("grp"), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .agg(count(lit(1)).cast("bigint").as("c12"))
      .localCheckpoint(true) // feeds the left-context counts AND the cells
    val left = pairs.groupBy(col("grp"), col("w1"))
      .agg(sum(col("c12")).cast("bigint").as("c1"))
    pairs.join(left, Seq("grp", "w1"))
      .select(col("grp"), col("c12"),
        expr("CAST(round(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), " +
          "6) * 1000000.0D) AS BIGINT)").as("__lnq"))
      .groupBy(col("grp"))
      .agg(sum(col("c12")).cast("bigint").as("n_bigrams"),
        count(lit(1)).cast("bigint").as("n_distinct_bigrams"),
        sum(col("c12") * col("__lnq")).cast("bigint").as("__s"))
      .select(col("grp").as(groupCol), col("n_bigrams"),
        col("n_distinct_bigrams"),
        expr("-(__s div n_bigrams)").as("h_cond_micro"))
      .orderBy(col(groupCol))
  }

  /** Hapax-legomenon vocabulary profile — the rare-tail health read
    * per group: share of a group's vocabulary seen exactly ONCE
    * (hapax) and the type-token ratio. A high hapax share with a low
    * TTR means a long noise tail over boilerplate (OCR debris, ID
    * strings); hapax collapsing toward zero means the tokenizer's
    * open-vocabulary assumption is failing. Complements x152's Heaps
    * growth curve (global trajectory) with the per-source point read
    * and x164's exclusive-vocab share (cross-source overlap).
    *
    * Scale: one tokenize pass to the (group, word) term-frequency
    * histogram, one re-aggregation per group. No windows.
    *
    * Output: (groupCol, n_tokens, vocab, hapax,
    * hapax_share_micro = hapax·10⁶ div vocab,
    * ttr_micro = vocab·10⁶ div n_tokens), ordered by group. */
  def hapaxProfile(docs: DataFrame, textCol: String = "text",
      groupCol: String = "source"): DataFrame = {
    docs
      .select(col(groupCol).as("grp"),
        explode(words(col(textCol))).as("__w"))
      .groupBy(col("grp"), col("__w"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
      .groupBy(col("grp"))
      .agg(sum(col("__c")).cast("bigint").as("n_tokens"),
        count(lit(1)).cast("bigint").as("vocab"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L))
          .cast("bigint").as("hapax"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("vocab"),
        col("hapax"),
        expr("hapax * 1000000L div vocab").as("hapax_share_micro"),
        expr("vocab * 1000000L div n_tokens").as("ttr_micro"))
      .orderBy(col(groupCol))
  }

  /** Feature-hashing document embedding (the "hashing trick",
    * Weinberger et al. 2009, ICML — the HashingVectorizer/VW
    * construction): every word token hashes to one of `dim` signed
    * components — index = md5-60(word) mod dim, sign = parity of the
    * next hash bits — and a document's vector is the signed
    * term-frequency sum per component. Deterministic and
    * engine-portable (md5 is the house portable hash), so ANY engine
    * reproduces the identical vectors — which makes this the
    * structural bridge between the lexical and the embedding dedup
    * stacks (VERDICT r16 item 4): documents that are lexical
    * near-duplicates share almost all tokens, so their hashed vectors
    * are near-parallel BY CONSTRUCTION — the `both` class of
    * [[graft.operators.Dedup.dedupStackDisagreement]] is exercised on
    * any corpus with planted lexical dups, independent of whether a
    * learned-embedding fixture happens to correlate.
    *
    * Components are exact integer sums (rendered as floats — |tf| is
    * far below 2²⁴, so the float is exact and downstream double math
    * is identical in every engine). Documents whose components all
    * cancel to zero are DROPPED by contract: a zero vector has no
    * direction, and both engines drop it identically.
    *
    * Scale: one token explode (linear in corpus tokens), a
    * (doc, component) hash agg — at most `dim` cells per doc — and a
    * per-doc map build; no joins, no windows. The output is a dense
    * `dim`-vector per doc: at 100 TB this is the cheap text-side
    * vectorizer that feeds the bucketed embedding-dedup machinery
    * without a model pass.
    *
    * Output: (vec_id, embedding: array<float> of length `dim`). */
  def hashedEmbedding(docs: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim >= 2 && dim <= 4096,
      s"hashedEmbedding: dim must be in [2, 4096], got $dim")
    val toks = tokFrame(docs, idCol, textCol)
      .select(col("doc_id").as("vec_id"), explode(col("__w")).as("__t"))
      .withColumn("__h",
        graft.functions.TextFunctions.md5Bucket60(col("__t")))
    // r19 (VERDICT r18 item 1): the dense projection is the
    // `dense_embedding` codegen kernel instead of the interpreted
    // `transform(sequence…)` map-lookup lambda, and the zero-vector
    // drop tests `max(abs(tf))` computed IN the aggregation instead of
    // an interpreted `exists` over the built array — equivalent by
    // construction (`exists(v, x != 0f)` ⟺ some signed tf ≠ 0 ⟺
    // max|tf| > 0; the LONG→FLOAT cast maps 0 to 0f and nothing else
    // to 0f), and the cheap filter column keeps the kernel evaluated
    // ONCE (a filter on the kernel output would be pushed below the
    // projection and double-evaluate it — the §4.4 duplication).
    toks
      .select(col("vec_id"),
        expr(s"CAST(pmod(__h, $dim) AS INT)").as("__i"),
        expr(s"CASE WHEN pmod(__h div $dim, 2) = 0 THEN 1L ELSE -1L END")
          .as("__s"))
      .groupBy(col("vec_id"), col("__i"))
      .agg(sum(col("__s")).cast("bigint").as("__v"))
      .groupBy(col("vec_id"))
      .agg(collect_list(struct(col("__i"), col("__v"))).as("__e"),
        max(abs(col("__v"))).as("__mx"))
      .filter(col("__mx") > 0L)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dense_embedding(col("__e"), dim)
          .as("embedding"))
  }

  /** EXACT longest repeated substring WITHIN each document —
    * [[exactDuplicatedSubstrings]]' machinery turned inward: positions
    * i < j of the SAME doc sharing a k-gram hash lie on diagonal
    * d = j − i, and a maximal run of R consecutive matched i's on one
    * diagonal witnesses a substring of exactly R + k − 1 chars
    * occurring (at least) twice in the doc, offset d apart
    * (overlapping occurrences included — "ababab…" repeats ARE the
    * loop shape this detects). This is the generation-loop /
    * boilerplate-within-doc audit: a model-generated doc stuck in a
    * cycle, a scraped page with its nav block repeated, a template
    * expanded twice — all surface as a long intra-doc repeat that
    * cross-doc dedup never looks at.
    *
    * Exactness envelope (the x250 conventions, per-doc grain):
    * substrings shorter than `k` are invisible; `minRunChars` floors
    * the report and max_repeat_chars is exact for every emitted doc;
    * (doc, gram) cells with more than `occCap` occurrences are
    * dropped BEFORE the self-join — a cell with m occurrences
    * contributes m(m−1)/2 pairs, so the cap bounds the per-doc pair
    * mass at occCap²/2 per cell — with the corpus-wide dropped-cell
    * count riding every row (`n_capped_cells`, the x235 honesty
    * convention; "aaaa…" floods its own gram past any cap, which is
    * why the cap exists and is visible).
    *
    * Scale: linear gram explode; the self-join is an equi-join on
    * (doc_id, fp) — never cross-doc; the islands window partitions by
    * (doc, diagonal). All per-doc-bounded.
    *
    * Output per doc with a qualifying repeat: (doc_id,
    * max_repeat_chars, n_repeat_runs, n_matched_positions,
    * n_capped_cells). */
  def intraDocRepeats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, occCap: Int = 20,
      minRunChars: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && occCap > 0,
      s"intraDocRepeats: k, occCap must be positive, got ($k, $occCap)")
    require(minRunChars >= k,
      s"intraDocRepeats: minRunChars ($minRunChars) must be >= k ($k)")
    val grams = docs.select(col(idCol).as("doc_id"),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col("doc_id"), posexplode(
        graft.functions.ShingleFunctions.md5_shingle_hashes(col("__t"), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("fp"))
    val cells = grams.groupBy(col("doc_id"), col("fp"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(true) // feeds the prune AND the capped count
    val capped = cells.filter(col("__m") > occCap)
      .agg(count(lit(1)).cast("bigint").as("n_capped_cells"))
    // only cells with 2..occCap occurrences can self-pair (the >= 2
    // filter is pure pruning — singleton grams have no pair)
    val pruned = grams.join(
      cells.filter(col("__m") <= occCap && col("__m") >= 2)
        .select(col("doc_id"), col("fp")),
      Seq("doc_id", "fp"))
    val a = pruned.as("a"); val b = pruned.as("b")
    val matched = a.join(b,
        col("a.doc_id") === col("b.doc_id") && col("a.fp") === col("b.fp") &&
          col("a.pos") < col("b.pos"))
      .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos_a"),
        (col("b.pos") - col("a.pos")).as("diag"))
    val wOrd = Window.partitionBy(col("doc_id"), col("diag"))
      .orderBy(col("pos_a"))
    matched
      .withColumn("__brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wOrd) > 1L, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("diag"), col("__isl"))
      .agg(count(lit(1)).cast("bigint").as("__n"),
        min(col("pos_a")).as("__lo"), max(col("pos_a")).as("__hi"))
      .filter(col("__hi") - col("__lo") + lit(k.toLong) >= minRunChars)
      .groupBy(col("doc_id"))
      .agg(max(col("__hi") - col("__lo") + lit(k.toLong)).cast("bigint")
          .as("max_repeat_chars"),
        count(lit(1)).as("n_repeat_runs"),
        sum(col("__n")).cast("bigint").as("n_matched_positions"))
      .crossJoin(broadcast(capped))
  }

  /** Full-cycle text periodicity — the degenerate-generation detector
    * at the WHOLE-STRING grain: the smallest period p such that the
    * normalized text is its first p chars repeated n/p times
    * (`min_full_period`, a KMP-failure-function codegen kernel;
    * aperiodic text reports p = n). "ababab…", "na na na na …", a
    * template pasted back-to-back — exact cycles that
    * [[gopherRepetition]]'s top-gram fractions see only softly and
    * [[intraDocRepeats]] reports as one long diagonal — here are one
    * integer per doc. Exact, deterministic, engine-portable: the
    * oracle replays the divisor-check definition (p | n and
    * repeat(prefix, n/p) = text), which the KMP identity matches on
    * every input.
    *
    * Scale: a per-row O(n) kernel inside the codegen span — no joins,
    * no windows, no shuffles beyond the caller's sort.
    *
    * Output: (doc_id, n_chars, min_period, n_cycles, is_periodic)
    * where is_periodic = (min_period < n_chars); zero-length docs
    * report (0, 0, 0, false). */
  def textPeriodicity(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.ShingleFunctions.min_full_period
    docs.select(col(idCol).as("doc_id"),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
      .select(col("doc_id"),
        length(col("__t")).cast("long").as("n_chars"),
        min_full_period(col("__t")).as("min_period"))
      .select(col("doc_id"), col("n_chars"), col("min_period"),
        when(col("min_period") > 0, col("n_chars").cast("long") / col("min_period"))
          .otherwise(lit(0.0)).cast("long").as("n_cycles"),
        (col("min_period") < col("n_chars")).as("is_periodic"))
  }

  /** Unicode-anomaly screen — the invisible-character inventory every
    * web-scraped training corpus needs: zero-width characters (ZWSP/
    * ZWNJ/ZWJ/BOM — watermarks, copy-paste residue, token-splitting
    * attacks), bidi control characters (U+202A–E, U+2066–69 — the
    * "Trojan Source" class), U+FFFD replacement characters (upstream
    * mojibake: some decoder already lost bytes), and C0 controls
    * other than tab/newline/CR (binary contamination). Counts are
    * exact per doc; `keep` is the all-clear flag (every count zero).
    * Complements the encoding-damage monitor (x142/char entropy):
    * those score DISTRIBUTIONS, this pins the specific forbidden
    * codepoints with exact counts both engines replay.
    *
    * Scale: four codegen'd regexp counts in one narrow projection —
    * per-row work only.
    *
    * Output: (doc_id, n_chars, n_zero_width, n_bidi, n_replacement,
    * n_ctrl, keep), one row per doc. */
  def unicodeAnomalies(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def rxCount(pat: String): Column =
      coalesce(size(regexp_extract_all(col(textCol), lit(pat), lit(0))),
        lit(0)).cast("long")
    docs.select(col(idCol).as("doc_id"),
        coalesce(length(col(textCol)), lit(0)).cast("long").as("n_chars"),
        rxCount("[\\u200B\\u200C\\u200D\\uFEFF]").as("n_zero_width"),
        rxCount("[\\u202A-\\u202E\\u2066-\\u2069]").as("n_bidi"),
        rxCount("\\uFFFD").as("n_replacement"),
        rxCount("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("n_ctrl"))
      .withColumn("keep",
        col("n_zero_width") + col("n_bidi") + col("n_replacement") +
          col("n_ctrl") === 0L)
  }

  /** Top collocations by pointwise mutual information — the classic
    * corpus-linguistics screen (Church & Hanks 1990): for adjacent
    * word pairs with count ≥ `minCount`, PMI = ln(N·c₁₂ / (c₁·c₂))
    * where c₁/c₂ are the words' LEFT/RIGHT transition margins and N
    * the total transition count — high-PMI pairs are multiword units
    * ("new york", "machine learning"); a corpus whose top PMI list is
    * template residue ("click here") has a boilerplate problem the
    * per-doc screens can miss. Count floor first: PMI of rare pairs
    * is noise (the documented Church-Hanks caveat).
    *
    * Exactness: counts are exact BIGINTs; the single `ln` quantizes
    * once per PAIR to integer micro-nats (round(round(ln(...), 6)·1e6)
    * — both engines hold the identical correctly-rounded double
    * first); the top-N cut is a full-order sort (pmi desc, w1, w2) so
    * the boundary is deterministic.
    *
    * Scale: one adjacency explode (linear), (w1,w2)/(w1)/(w2) hash
    * aggs, margins joined back on their keys (vocabulary-sized —
    * shuffled equi-joins, deliberately not broadcast), a 1-row N
    * frame broadcast, and a TakeOrderedAndProject top-N (partial
    * per-partition top-k, never a global window).
    *
    * Output: top `topN` rows of (w1, w2, n_pair, n_left, n_right,
    * pmi_micro), ordered (pmi_micro desc, w1, w2). */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
      topN: Int = 50, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minCount >= 1 && topN >= 1,
      s"pmiCollocations: minCount, topN must be positive, got ($minCount, $topN)")
    val pairs = tokFrame(docs, idCol, textCol)
      .filter(size(col("__w")) >= 2)
      .select(explode(graft.functions.ShingleFunctions
        .adjacent_pairs(col("__w"))).as("__p"))
      .select(col("__p.w1"), col("__p.w2"))
    val pc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("bigint").as("n_pair"))
      .localCheckpoint(true) // feeds margins, N, and the PMI join
    val left = pc.groupBy(col("w1"))
      .agg(sum(col("n_pair")).cast("bigint").as("n_left"))
    val right = pc.groupBy(col("w2"))
      .agg(sum(col("n_pair")).cast("bigint").as("n_right"))
    val total = pc.agg(sum(col("n_pair")).cast("bigint").as("__n"))
    pc.filter(col("n_pair") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .join(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_left"),
        col("n_right"),
        round(round(log(
          col("__n").cast("double") * col("n_pair").cast("double") /
            (col("n_left").cast("double") * col("n_right").cast("double"))),
          6) * lit(1000000.0)).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Source-pair lexical overlap matrix — corpus-level "who shares
    * text with whom": the EXACT Jaccard of each source pair's DISTINCT
    * word n-gram sets (J = |A∩B| / (|A|+|B|−|A∩B|), inclusion-
    * exclusion over exact distinct counts). x185's dup-flow matrix
    * counts near-dup DOC pairs across sources; this measures shared
    * LANGUAGE mass — template families, syndication, common
    * boilerplate — even where no single doc pair crosses a dedup
    * threshold. The n-gram grain (default 3) keeps single shared
    * words from counting as overlap.
    *
    * Exactness: distinct gram sets per source are exact (hash
    * dedup); the intersection is an equi-join count; the Jaccard
    * quantizes once per pair to integer micro by truncating division
    * (both engines' integer `div`).
    *
    * Scale: one (source, gram) distinct agg; per-source set sizes are
    * a tiny frame (broadcast); the intersection self-join fans out at
    * most |sources| per gram — bounded by the source cardinality,
    * never by corpus size. Output is |sources|·(|sources|−1)/2 rows.
    *
    * Output: (source_a < source_b, n_a, n_b, n_common,
    * jaccard_micro), ordered (source_a, source_b). */
  def sourceGramOverlap(docs: DataFrame, n: Int = 3,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(n >= 1 && n <= 10,
      s"sourceGramOverlap: n must be in [1, 10], got $n")
    val sg = docs.select(col(sourceCol).as("__src"),
        graft.functions.TextFunctions.words(col(textCol)).as("__w"))
      .select(col("__src"), explode(
        graft.functions.ShingleFunctions.ngram_strings(col("__w"), n))
        .as("__g"))
      .distinct()
      .localCheckpoint(true) // feeds sizes AND the intersection join
    val sizes = sg.groupBy(col("__src"))
      .agg(count(lit(1)).cast("bigint").as("n_grams"))
    val a = sg.as("a"); val b = sg.as("b")
    val inter = a.join(b,
        col("a.__g") === col("b.__g") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).cast("bigint").as("n_common"))
    inter
      .join(broadcast(sizes.select(col("__src").as("source_a"),
        col("n_grams").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("__src").as("source_b"),
        col("n_grams").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("n_common * 1000000L div (n_a + n_b - n_common)")
          .as("jaccard_micro"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Square-root temperature mixture allocation — the OTHER standard
    * mixture planner beside [[mixtureReweight]]'s DoReMi shape: the
    * multilingual-sampling rule p_s ∝ n_s^α at α = 1/2 (the
    * XLM/mBERT-family default — big sources damped, small sources
    * boosted, nothing starved), applied to a token budget.
    *
    * Determinism: the ONE irrational per source is √n — an IEEE
    * correctly-rounded REQUIRED operation (unlike ln/exp), so
    * `floor(sqrt(n))` is bit-identical on every engine with NO
    * quantization step; everything after is integer: share
    * p_micro = 10⁶·w div Σw, allocation = (B·w) div Σw for
    * B = total div `budgetDenom`, and the per-source sampling rate
    * capped at 10⁶ (a source allocated more than it has is taken
    * whole, never oversampled).
    *
    * Scale: one partial+final hash agg to (source, n_tokens), then
    * |sources|-cardinality arithmetic against a 1-row broadcast.
    *
    * Output per source: (source, n_tokens, temp_weight, p_micro,
    * alloc_tokens, rate_micro), ordered. */
  def sqrtTemperatureAllocation(docs: DataFrame, budgetDenom: Int = 10,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetDenom >= 1,
      s"sqrtTemperatureAllocation: budgetDenom must be >= 1, got $budgetDenom")
    val perSource = docs
      .select(col(sourceCol).as("source"),
        size(words(col(textCol))).cast("long").as("__t"))
      .groupBy(col("source"))
      .agg(sum(col("__t")).cast("bigint").as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)")
          .as("temp_weight"))
      .localCheckpoint(true) // feeds the totals AND the output
    val totals = perSource.agg(
      sum(col("n_tokens")).cast("bigint").as("__tot"),
      sum(col("temp_weight")).cast("bigint").as("__wsum"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_tokens"), col("temp_weight"),
        expr("temp_weight * 1000000L div __wsum").as("p_micro"),
        expr("((__tot div " + budgetDenom + "L) * temp_weight) div __wsum")
          .as("alloc_tokens"))
      .select(col("source"), col("n_tokens"), col("temp_weight"),
        col("p_micro"), col("alloc_tokens"),
        // an empty source has nothing to sample: rate 0, not a
        // null-by-zero-division
        when(col("n_tokens") > 0, least(lit(1000000L),
            expr("alloc_tokens * 1000000L div n_tokens")))
          .otherwise(lit(0L)).as("rate_micro"))
      .orderBy(col("source"))
  }

  /** Feature-hash bucket count for the naive-Bayes classifier: the
    * hashing trick caps the weight table at 2^18 rows (≈ 4 MB of
    * (long, long)) regardless of corpus vocabulary, which is what
    * makes the serve-side join BROADCASTable at any corpus scale. */
  val NbBuckets = 262144

  /** Trains a hashed Bernoulli naive-Bayes classifier — the
    * fastText-flavoured linear doc filter (token-presence features,
    * additive log-odds), trained as two hash aggregations and exact
    * enough to replay on any engine. `labelExpr` is the boolean
    * training label (e.g. `col("lang") === "en"`).
    *
    * Per feature bucket f = md5-60(token) mod 2^18 (presence per doc,
    * Laplace α=1, class doc counts n1/n0):
    *
    *   w(f) = round(10⁶·ln((c1+1)/(n1+2))) − round(10⁶·ln((c0+1)/(n0+2)))
    *
    * and the prior bias (feature id −1, never a hash value):
    *
    *   b = round(10⁶·ln((n1+1)/(N+2))) − round(10⁶·ln((n0+1)/(N+2)))
    *
    * Every ln sees one exact-integer ratio and is quantized ONCE; all
    * composition after is integer — both engines produce identical
    * weight tables. Training is: one distinct (doc, f) projection,
    * one (f → c1, c0) hash agg, one 1-row class-count broadcast. The
    * weight table is the versionable MODEL artifact
    * ([[graft.sources.IndexArtifacts]] snapshots it; x274 serves it).
    *
    * Output: (feature BIGINT, weight_micro BIGINT) — bucket rows plus
    * the bias row at feature = −1. */
  def nbTrain(docs: DataFrame, labelExpr: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val present = docs.select(col(idCol).as("__id"),
        labelExpr.cast("boolean").as("__y"),
        explode(words(col(textCol))).as("__t"))
      .select(col("__id"), col("__y"),
        (md5Bucket60(col("__t")) % NbBuckets).as("feature"))
      .distinct()
    val classes = docs
      .agg(sum(labelExpr.cast("long")).cast("bigint").as("__n1"),
        sum((!labelExpr).cast("long")).cast("bigint").as("__n0"))
      .localCheckpoint(true) // feeds every weight row AND the bias
    def lnMicro(num: Column, den: Column): Column =
      round(log(num.cast("double") / den.cast("double")) * lit(1000000.0))
        .cast("long")
    val weights = present.groupBy(col("feature"))
      .agg(sum(col("__y").cast("long")).cast("bigint").as("__c1"),
        sum((!col("__y")).cast("long")).cast("bigint").as("__c0"))
      .crossJoin(broadcast(classes))
      .select(col("feature"),
        (lnMicro(col("__c1") + 1, col("__n1") + 2) -
          lnMicro(col("__c0") + 1, col("__n0") + 2)).as("weight_micro"))
    val bias = classes.select(lit(-1L).as("feature"),
      (lnMicro(col("__n1") + 1, col("__n1") + col("__n0") + 2) -
        lnMicro(col("__n0") + 1, col("__n1") + col("__n0") + 2))
        .as("weight_micro"))
    weights.unionAll(bias)
  }

  /** Scores every document under a trained [[nbTrain]] weight table
    * and rolls the verdicts up per source against the actual label —
    * the model-quality report a serving pipeline emits each run.
    *
    * score(doc) = bias + Σ_{f present} w(f) (integer micro-nats;
    * features never seen in training contribute 0); pred = score > 0.
    *
    * Scale: the weight table is ≤ 2^18 + 1 rows by construction, so
    * BOTH joins here broadcast it — scoring is map-side everywhere,
    * one (doc → score) hash agg, one |sources| rollup. The corpus is
    * scanned twice (features + labels); at 100 TB fuse by passing a
    * pre-projected frame.
    *
    * Output per source: (source, n_docs, n_pred_pos, n_correct,
    * avg_score_micro = Σscore div n, truncating), ordered by source. */
  /** Per-document scores under a trained [[nbTrain]] weight table —
    * the shared scoring stage of [[nbSourceReport]] and
    * [[nbCalibration]]: (doc id, integer micro-nat score), zero-token
    * docs scoring the bias alone. Both weight-table joins broadcast
    * (≤ 2^18 + 1 rows by construction). */
  def nbScores(docs: DataFrame, weights: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = weights.localCheckpoint(true) // snapshot-read or derived
    val bias = w.filter(col("feature") === -1L)
      .select(col("weight_micro").as("__bias"))
    val sums = docs.select(col(idCol).as("__id"),
        explode(words(col(textCol))).as("__t"))
      .select(col("__id"), (md5Bucket60(col("__t")) % NbBuckets).as("feature"))
      .distinct()
      .join(broadcast(w.filter(col("feature") >= 0L)), Seq("feature"), "left")
      .groupBy(col("__id"))
      .agg(sum(coalesce(col("weight_micro"), lit(0L))).cast("bigint")
        .as("__sumw"))
    docs.select(col(idCol).as("__id"))
      .join(sums, Seq("__id"), "left")
      .crossJoin(broadcast(bias))
      // a doc with zero tokens never enters `sums`: bias alone
      .select(col("__id"),
        (coalesce(col("__sumw"), lit(0L)) + col("__bias")).as("__score"))
  }

  /** Classifier calibration table — reliability-diagram data for the
    * [[nbTrain]] model: documents bucketed by score in whole-nat
    * steps (`score_micro div 10⁶`, truncating — engine-identical on
    * negatives per the shared `div` contract), each bucket reporting
    * how often the label is ACTUALLY positive. A well-calibrated
    * log-odds score crosses 50% near bucket 0; a cliff or inversion
    * is the screen that catches a broken feature pipeline before the
    * filter ships. One hash agg over the per-doc scores; bucket
    * cardinality is bounded by the score range in nats (≲ hundreds),
    * never corpus-scale.
    *
    * Output per bucket: (score_nat, n_docs, n_actual_pos,
    * pos_rate_micro = 10⁶·n_actual_pos div n_docs), ordered. */
  def nbCalibration(docs: DataFrame, labelExpr: Column,
      weights: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("__id"), labelExpr.cast("boolean").as("__y"))
      .join(nbScores(docs, weights, idCol, textCol), Seq("__id"))
      .select(expr("__score div 1000000L").as("score_nat"), col("__y"))
      .groupBy(col("score_nat"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("__y").cast("long")).cast("bigint").as("n_actual_pos"))
      .select(col("score_nat"), col("n_docs"), col("n_actual_pos"),
        expr("n_actual_pos * 1000000L div n_docs").as("pos_rate_micro"))
      .orderBy(col("score_nat"))

  def nbSourceReport(docs: DataFrame, labelExpr: Column,
      weights: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame =
    docs.select(col(idCol).as("__id"), col(sourceCol).as("source"),
        labelExpr.cast("boolean").as("__y"))
      .join(nbScores(docs, weights, idCol, textCol), Seq("__id"))
      .select(col("source"), col("__y"), col("__score").as("__s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum((col("__s") > 0).cast("long")).cast("bigint").as("n_pred_pos"),
        sum(((col("__s") > 0) === col("__y")).cast("long")).cast("bigint")
          .as("n_correct"),
        expr("sum(__s) div count(*)").as("avg_score_micro"))
      .orderBy(col("source"))
}
