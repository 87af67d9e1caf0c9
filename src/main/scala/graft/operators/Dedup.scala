package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.core.PlanStats.Pinned

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.12 / BASELINE.json north star). Four tiers, in increasing
  * fuzziness:
  *
  *  1. exact        — hash groupBy on a normalization of the content;
  *  2. n-gram Jaccard — exact set similarity via a shingle inverted
  *                     index (ground truth for the fuzzy tiers);
  *  3. MinHash + LSH — banded signatures, near-linear candidate
  *                     generation, then exact verification;
  *  4. SimHash      — 64-bit fingerprints, banded Hamming buckets.
  *
  * Scale design: every step is a hash shuffle on doc ids, shingles, or
  * band buckets — no cross join ever materializes. The quadratic
  * danger is hot buckets (an ultra-common shingle joins every doc
  * containing it); `dfPrune` drops shingles whose document frequency
  * exceeds a cap, which is both the standard trick at 100 TB scale and
  * a quality win (boilerplate shingles carry no signal).
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** 1-row pair-budget guard — the [[graft.operators.Curate.boundedRank]]
    * fail-loud discipline applied to blocking: `blockSizes` is the
    * per-block size relation, `pairsExpr` the candidate-pair count a
    * block contributes (`n(n−1)/2` for a self-join, `n_a·n_b` for a
    * bipartite linkage; cast to decimal(38,0) if blocks can exceed
    * ~10⁹ rows), `rowsExpr` the block's row count. The guard SUMS
    * both — one cheap aggregate over the block grain, never the pair
    * grain — and `raise_error`s when total pairs exceed
    * `perRowBudget` × total rows. The budget is PER ROW, not
    * absolute, on purpose: healthy blocking does work LINEAR in the
    * data (bounded candidates per record), and a linear budget would
    * spuriously trip on legitimate growth (the round-8 sf1 lesson —
    * a fixed 2²² bound fired on 150k records × 40-record blocks,
    * which is exactly the contract working); what the guard exists
    * to catch is the SUPERLINEAR deviation — blocks growing with the
    * data — and pairs-per-row is the scale-invariant detector for
    * it. Callers cross-join the returned single row into the pair
    * pipeline (a 1-row broadcast — the allowlisted scalar shape), so
    * the check cannot be pruned away and runs before pair work lands.
    */
  def pairBudgetGuard(blockSizes: DataFrame, pairsExpr: Column,
                      rowsExpr: Column, perRowBudget: Long,
                      what: String): DataFrame =
    blockSizes.agg(coalesce(sum(pairsExpr), lit(0L)).as("__pb_pairs"),
        coalesce(sum(rowsExpr), lit(0L)).as("__pb_rows"))
      .filter(when(
        col("__pb_pairs") <= lit(perRowBudget) * col("__pb_rows"),
        lit(true))
        .otherwise(raise_error(concat(
          lit(s"$what: candidate-pair budget exceeded — "),
          col("__pb_pairs").cast("string"),
          lit(s" pairs over "), col("__pb_rows").cast("string"),
          lit(s" rows > the declared $perRowBudget pairs/row. The " +
            "blocking keys are growing with the data — add a chunk " +
            "tier / raise key cardinality instead of raising the " +
            "budget.")))))
      .select(lit(1L).as("__pb_ok"))

  /** Blocked record-linkage join — the entity-resolution primitive:
    * candidate pairs are generated ONLY within a blocking key (the
    * caller's cheap invariant: same source + similar length, same
    * normalized name initial, …), then scored by edit distance on a
    * bounded prefix. All-pairs comparison is O(n²) and impossible at
    * corpus scale; blocking bounds work at Σ C(block,2), and the
    * prefix cap bounds the per-pair Levenshtein DP at O(prefix²).
    * Pairs are ordered (idCol_a < idCol_b) so each is emitted once.
    *
    * Scale enforcement is ON BY DEFAULT (chunkSize = Some(32),
    * pairsPerRow = Some(16)) — the caller's blocking keys alone are a
    * hope, not a bound, because a fixed-cardinality key's blocks grow
    * linearly with data and its in-block pairs quadratically. A caller
    * who wants the unbounded all-pairs-within-block config must pass
    * `chunkSize = None, pairsPerRow = None` EXPLICITLY, accepting
    * Σ C(block,2) growth — quadratic in block size, i.e. quadratic in
    * the data whenever the blocking keys have fixed cardinality. The
    * opt-out trades that meltdown risk for cross-chunk recall; prefer
    * raising `chunkSize` over removing it.
    *
    *  - `chunkSize = Some(c)`: a second blocking tier — within each
    *    block, rows sort by (prefix, id) and split into chunks of at
    *    most `c` rows (sorted-neighborhood blocking, Hernández &
    *    Stolfo's merge/purge discipline: near-duplicates sort
    *    adjacently, so same-chunk recall is high); pairs are emitted
    *    within a chunk only. Block sizes become data-invariant:
    *    total pairs ≤ n/c · C(c,2) — LINEAR in n. The chunk-rank
    *    window partitions by block (one task per block) — linear
    *    work, safe while single blocks fit a task (~10⁷ rows), and
    *    the budget guard fires long before that.
    *  - `pairsPerRow = Some(b)`: [[pairBudgetGuard]] over the FINAL
    *    (chunked) block grain — the run fails loudly if candidate
    *    pairs exceed `b` per input row (the scale-invariant bound:
    *    chunked blocking yields ≤ (c−1)/2 pairs/row at ANY corpus
    *    size, so a breach means the blocking itself broke) instead
    *    of melting down quadratically.
    *
    * Returns (id_a, id_b, block cols…, dist). */
  def blockedEditDistance(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[Column], prefixLen: Int,
                          maxDist: Int,
                          chunkSize: Option[Int] = Some(32),
                          pairsPerRow: Option[Long] = Some(16L)): DataFrame = {
    val names = blockCols.indices.map(i => s"__bk$i")
    val base0 = docs.select(
      (blockCols.zip(names).map { case (c, n) => c.as(n) }) ++
        Seq(col(idCol).as("__id"),
          substring(col(textCol), 1, prefixLen).as("__t")): _*)
    val (base, keyNames) = chunkSize match {
      case Some(c) =>
        // Loud one-release notice for the r9 default flip (None →
        // Some(32)): a caller who relied on the old all-pairs-within-
        // block default silently loses cross-chunk pairs on blocks
        // larger than the chunk. The truncation is data-dependent, so
        // the driver can't see block sizes here without forcing a job;
        // this warning names the semantics change at plan-build time
        // and the scaladoc documents the opt-out (`chunkSize = None`).
        log.warn(
          s"blockedEditDistance: sorted-neighborhood chunk tier ACTIVE " +
            s"(chunkSize=$c, the safe default since r9) - candidate " +
            s"pairs are CHUNK-LOCAL; blocks larger than $c rows will " +
            s"not emit cross-chunk pairs. Pass chunkSize = None " +
            s"explicitly for the unbounded all-pairs-within-block " +
            s"behavior (quadratic in block size).")
        val w = Window.partitionBy(names.map(col): _*)
          .orderBy(col("__t"), col("__id"))
        (base0.withColumn("__chunk",
          ((row_number().over(w) - 1) / c).cast("long")),
          names :+ "__chunk")
      case None => (base0, names)
    }
    val a = base.select(keyNames.map(col) ++
      Seq(col("__id").as("id_a"), col("__t").as("__ta")): _*)
    val b = base.select(keyNames.map(col) ++
      Seq(col("__id").as("id_b"), col("__t").as("__tb")): _*)
    val joined = a.join(b, keyNames.toSeq)
    val guarded = pairsPerRow match {
      case Some(budget) =>
        val sizes = base.groupBy(keyNames.map(col): _*)
          .agg(count(lit(1)).as("__pb_n"))
        joined.crossJoin(broadcast(pairBudgetGuard(sizes,
          (col("__pb_n").cast("decimal(38,0)") * (col("__pb_n") - 1)
            / 2).cast("decimal(38,0)"),
          col("__pb_n"), budget,
          "blockedEditDistance"))).drop("__pb_ok")
      case None => joined
    }
    guarded
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("dist") <= maxDist)
      .drop("__ta", "__tb", "__chunk")
  }

  /** Exact dedup: one representative row (min of `idCol`) per distinct
    * value of `keyCols`, plus the duplicate count. */
  def exact(df: DataFrame, keyCols: Seq[Column], idCol: Column): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(idCol).as("representative"), count(lit(1)).as("dup_count"))

  /** Distinct word-`n`-gram shingles per document: (id, shingle,
    * sh = xxhash64(shingle)). The base relation for Jaccard and
    * MinHash. Downstream set operations join on `sh` (an 8-byte key)
    * instead of the shingle string — at 100 TB the inverted-index
    * shuffle carries longs, not 25-byte strings, and the equi-join is
    * a long compare. (64-bit collisions are ~n²/2⁶⁴ — negligible.) */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame =
    shingleBase(docs, idCol, textCol, n)
      .withColumn("sh", xxhash64(col("shingle")))

  /** [[shingleTable]] with the engine-portable md5-derived hash
    * ([[graft.functions.PortableHash]]) so the whole minhash pipeline
    * is reproducible by a DuckDB oracle. ~2× the hash cost of
    * xxhash64; same plan shape. */
  def shingleTablePortable(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    shingleBase(docs, idCol, textCol, n)
      .withColumn("sh", graft.functions.PortableHash.hash60(col("shingle")))

  private def shingleBase(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    docs
      // fused codegen n-gram generator (graftx.WordNgrams): one
      // compiled pass per row, no interpreted HOF chain, no
      // re-tokenization concerns
      .select(col(idCol).as("id"),
        explode(array_distinct(Text.shingles(col(textCol), n)))
          .as("shingle"))

  /** Drop shingles appearing in more than `maxDocFrac` of `totalDocs`
    * documents (document-frequency pruning). */
  def dfPrune(shingled: DataFrame, totalDocs: Long,
              maxDocFrac: Double): DataFrame = {
    val cap = math.max(2L, (totalDocs * maxDocFrac).toLong)
    val hot = shingled.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select("sh")
    shingled.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  /** [[dfPrune]] with the document count taken from the postings
    * themselves, entirely inside the plan (no driver-side `count()` at
    * construction): the cap is max(2, nDocs·maxDocFrac) where nDocs =
    * distinct ids in `shingled`. The hot-shingle list is tiny by
    * definition (each survivor of `df > frac·N` is rare), so it
    * broadcasts, and the anti-join never shuffles the postings. */
  def dfPruneFrac(shingled: DataFrame, maxDocFrac: Double): DataFrame =
    dfPruneFrac(shingled, maxDocFrac,
      shingled.select(col("id")).distinct())

  /** [[dfPruneFrac]] with the corpus size taken from `corpusIds`
    * (any one-row-per-document frame, e.g. the raw documents table):
    * counting that is a near-free parquet metadata scan, where
    * re-deriving it from the postings would tokenize the corpus a
    * third time. */
  def dfPruneFrac(shingled: DataFrame, maxDocFrac: Double,
                  corpusIds: DataFrame): DataFrame = {
    val tot = corpusIds
      .agg(greatest(lit(2.0), count(lit(1)) * maxDocFrac).as("__cap"))
    val hot = shingled.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tot))
      .filter(col("df") > col("__cap")).select("sh")
    shingled.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  /** Exact pairwise Jaccard over shingle sets. Returns (id_a, id_b,
    * inter, size_a, size_b, jaccard) for pairs with jaccard >=
    * threshold and id_a < id_b.
    *
    * Implemented as groupBy-shingle pair generation, not an
    * inverted-index self-join: group the postings by shingle hash,
    * sort each posting list, and emit the C(k,2) ordered pairs with a
    * codegen'd nested-transform — the shingle table is evaluated ONCE
    * (a self-join evaluates its un-reusable subtree once per side),
    * singleton shingles are dropped before any pair materializes, and
    * there is no join at all until the final (tiny, broadcast) size
    * lookups. Hot-shingle skew (a posting list of k docs emits k²/2
    * pairs from one row) is the known quadratic edge of all-pairs
    * exact Jaccard; at scale [[dfPrune]] caps it, which is also a
    * quality win. */
  /** (id_a, id_b, size_a, size_b, inter) for every document pair
    * sharing at least one posting — the shared core of
    * [[jaccardPairs]] and [[containmentPairs]]. Per-doc set size
    * rides along as a window count (one hash shuffle over the
    * postings), so the shingle table — the only expensive subtree —
    * is evaluated exactly once and no size lookup join is needed
    * afterwards. */
  /** Per-posting hot-key tripwire for the all-pairs family: a posting
    * list of k docs emits C(k,2) pairs from ONE grouped row, so an
    * un-pruned hot shingle (a boilerplate line shared by half the
    * corpus) is the meltdown mode of exact pair generation — k ~ n
    * means n²/2 pairs out of one task. Unlike the linkage budget this
    * can't be a per-row PAIR budget: legitimate near-dup mass grows
    * pairs/posting-row linearly with clone-cluster size (measured ×10
    * on the ×10 replica smoke), and those pairs are the OUTPUT — no
    * all-pairs algorithm can emit fewer. What IS scale-invariant is
    * the posting LENGTH itself: a real near-dup cluster is bounded
    * (df-pruning enforces it as a fraction), so a posting past the
    * cap means the caller skipped [[dfPrune]] on boilerplate-heavy
    * data. Default cap 10 000 (~5·10⁷ pairs from one posting — the
    * single-task ceiling); guarded rows fail the job loudly instead
    * of melting down. The check rides the already-grouped grain —
    * zero extra passes. Opt out with `maxPostingLen = None`. */
  private def postingCapped(ids: Column, cap: Option[Long],
                            what: String): Column = cap match {
    case None => ids
    case Some(c) =>
      when(size(ids) <= lit(c), ids)
        .otherwise(raise_error(concat(
          lit(s"$what: posting list of "), size(ids).cast("string"),
          lit(s" docs exceeds maxPostingLen=$c — a hot shingle would " +
            "emit ~k²/2 candidate pairs from one task. df-prune " +
            "the postings (Dedup.dfPrune/dfPruneFrac) or raise the " +
            "cap explicitly."))))
  }

  /** Target candidate-pair rows per reduce partition for the adaptive
    * expansion width. The pair-count aggregate is the one shuffle in
    * the all-pairs family whose input volume is CANDIDATE mass, not
    * corpus mass — Σ C(df,2) over the postings, easily 1000× the row
    * count — so inheriting the session's corpus-sized
    * `spark.sql.shuffle.partitions` melts exactly when the operator
    * matters most (measured: 1.2 B candidates over 32 local
    * partitions = 37 M pair rows each, per-candidate cost ×1.5–×2.9).
    * 4 M pair rows ≈ 150–400 MB of shuffle input per task — sized to
    * hash-aggregate in executor memory without spill. */
  private val pairsPerPartition = 4L * 1000 * 1000

  /** Hard ceiling on the adaptive width (2 M partitions ≈ 8×10¹²
    * candidates at the target — far past any sane single job; above
    * it the df-prune discipline, not partition width, is the fix). */
  private val maxAdaptiveWidth = 2 * 1000 * 1000

  private def intersectionCounts(shingled: DataFrame,
                                 maxPostingLen: Option[Long]): DataFrame = {
    val withSz = shingled.select(col("id"), col("sh"),
      count(lit(1)).over(Window.partitionBy("id")).as("sz"))
    val grouped = withSz
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("id"), col("sz")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .withColumn("ids",
        postingCapped(col("ids"), maxPostingLen, "jaccard/containment"))
      // pin the grouped postings: (a) the candidate-mass probe below
      // and the pair expansion then share ONE evaluation of the
      // expensive shingle subtree, and (b) the probe is a 1-row
      // aggregate over the pinned grain, not a second corpus pass
      .pin()
    // Σ C(k,2) — the exact pair-expansion output size, known BEFORE
    // any pair materializes. Integer division is exact (k(k-1) even).
    val mass = grouped
      .agg(coalesce(sum(expr(
        "CAST(size(ids) AS BIGINT) * (CAST(size(ids) AS BIGINT) - 1)"))
        .cast("long"), lit(0L)).as("m"))
      .head().getLong(0) / 2L
    val session = grouped.sparkSession.sessionState.conf.numShufflePartitions
    val width = math.min(maxAdaptiveWidth.toLong,
      math.max(session.toLong,
        (mass + pairsPerPartition - 1L) / pairsPerPartition)).toInt
    // codegen-adjacent pair expansion (graftx.PostingPairs): one
    // tight JVM loop per posting instead of the interpreted
    // nested-transform HOF chain — same pairs, same order (the
    // array is sorted, so id_a < id_b), no per-element array churn
    val expanded = grouped
      .select(org.apache.spark.sql.graftx.PostingPairs.col(col("ids")))
    // widen the count shuffle with the MEASURED candidate mass when
    // the session default would overload it; hash layout (id_a, id_b)
    // satisfies the aggregate's clustering, so this is still exactly
    // one exchange. Pre-shuffle partial agg is forfeited, but it only
    // ever merged pairs whose shared shingles collided into one map
    // partition (~inter/width of rows) — noise, while the width is
    // the difference between in-memory aggregation and spill.
    val laidOut =
      if (width > session)
        expanded.repartition(width, col("id_a"), col("id_b"))
      else expanded
    laidOut
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("inter"))
  }

  def jaccardPairs(shingled: DataFrame, threshold: Double,
                   maxPostingLen: Option[Long] = Some(10000L)): DataFrame =
    intersectionCounts(shingled, maxPostingLen)
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")

  /** Incremental near-dup detection: pairs involving at least one NEW
    * document, computed WITHOUT re-pairing the existing corpus — the
    * daily-ingest reality at 100 TB (re-running [[jaccardPairs]] over
    * corpus ∪ batch re-derives every old-old pair; this joins only
    * the batch's postings against the full posting table, so work
    * scales with the batch). Old-old pairs never form; both-new pairs
    * emit exactly once (kept only on the `nid < oid` orientation).
    * Result equals the full recompute restricted to new-involving
    * pairs — the q60 incremental-merge discipline applied to dedup.
    *
    * `isNew` classifies a document id (applied to both join sides —
    * must be a pure function of the id). */
  def incrementalJaccardPairs(shingled: DataFrame, isNew: Column => Column,
                              threshold: Double,
                              maxPostingLen: Option[Long] = Some(10000L))
      : DataFrame = {
    val withSz = shingled.select(col("id"), col("sh"),
      count(lit(1)).over(Window.partitionBy("id")).as("sz"))
    val newPost = withSz.filter(isNew(col("id")))
      .select(col("id").as("nid"), col("sh"), col("sz").as("nsz"))
    val allPost = withSz
      .select(col("id").as("oid"), col("sh"), col("sz").as("osz"))
    // hot-posting tripwire (see [[postingCapped]]): there is no
    // grouped posting grain here (pairs form by equi-join), so the
    // cap checks the max df through a 1-row broadcast guard — the
    // build side evaluates before the probe streams, i.e. the run
    // fails BEFORE the pair explosion materializes. Map-side combine
    // collapses the count to the distinct-sh grain, so the guard adds
    // one cheap aggregate, not a second posting shuffle.
    val joined0 = newPost.join(allPost, Seq("sh"))
    val joined = maxPostingLen match {
      case None => joined0
      case Some(c) =>
        val guard = shingled.groupBy(col("sh"))
          .agg(count(lit(1)).as("__df"))
          .agg(coalesce(max(col("__df")), lit(0L)).as("__mx"))
          .filter(when(col("__mx") <= lit(c), lit(true))
            .otherwise(raise_error(concat(
              lit("incrementalJaccardPairs: posting list of "),
              col("__mx").cast("string"),
              lit(s" docs exceeds maxPostingLen=$c — df-prune the " +
                "postings or raise the cap explicitly.")))))
          .select(lit(1L).as("__pl_ok"))
        joined0.crossJoin(broadcast(guard)).drop("__pl_ok")
    }
    joined
      .filter(col("nid") =!= col("oid") &&
        (!isNew(col("oid")) || col("nid") < col("oid")))
      .select(
        least(col("nid"), col("oid")).as("id_a"),
        greatest(col("nid"), col("oid")).as("id_b"),
        when(col("nid") < col("oid"), col("nsz")).otherwise(col("osz"))
          .as("size_a"),
        when(col("nid") < col("oid"), col("osz")).otherwise(col("nsz"))
          .as("size_b"))
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Max-containment pairs: inter / min(|A|, |B|) ≥ threshold — the
    * SUBSET-duplicate detector Jaccard structurally misses: a short
    * document fully quoted inside a long one has Jaccard
    * ≈ |A|/|B| (tiny) but containment 1.0. Same posting-list pair
    * generation and df-prune discipline as [[jaccardPairs]]; only the
    * normalization differs. */
  def containmentPairs(shingled: DataFrame, threshold: Double,
                       maxPostingLen: Option[Long] = Some(10000L)): DataFrame =
    intersectionCounts(shingled, maxPostingLen)
      .withColumn("containment",
        col("inter") / least(col("size_a"), col("size_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "containment")

  /** PPJoin-style prefix-filtered exact Jaccard join — same output
    * contract as [[jaccardPairs]], different scale profile.
    *
    * Prefix-filtering lemma: under any global token order, two sets
    * with J(x,y) >= t must share at least one token within the first
    * |s| - ceil(t·|s|) + 1 tokens of each (sorted) set. So instead of
    * building postings for EVERY shingle, only prefix tokens enter
    * the inverted index — at t=0.6 that is ~60% fewer posting rows,
    * and the candidate pair set shrinks superlinearly when shingles
    * are selective (pick the shingle width so random cross-doc
    * collisions are rare). Candidates are verified by exact
    * co-occurrence counting restricted to candidate docs.
    *
    * The global order here is hash order (free: the arrays are sorted
    * anyway for deterministic intersection); classic PPJoin orders by
    * ascending document frequency, which prunes harder but costs a
    * frequency-counting pass — at 100 TB that pass is worth it for
    * hot-key control, layered the same way on this shape. */
  def ppjoinPairs(shingled: DataFrame, threshold: Double,
                  maxPostingLen: Option[Long] = Some(10000L)): DataFrame = {
    // one corpus pass builds the per-doc sorted set table; checkpoint
    // because prefixes, and both verification sides read it (else 3×
    // recompute of the tokenize→shingle→hash chain; on a cluster this
    // is the classic "materialize the record table" PPJoin step)
    val docSets = shingled.groupBy("id")
      .agg(sort_array(collect_list(col("sh"))).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
      .pin()
    val prefixLen =
      (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    // postings carry (id, sz, pos): the POSITIONAL filter (classic
    // PPJoin) upper-bounds the achievable overlap from where the
    // shared token sits in each sorted set — ub = min(|x|-px, |y|-py)
    // — and drops the pair when ub < ceil(t/(1+t)·(|x|+|y|)), the
    // minimum intersection J >= t requires. Pairs are pruned BEFORE
    // the distinct and before any verification work; the filter is
    // conservative (keep if ANY shared prefix token passes), so the
    // exact verification below still sees every true pair.
    val prefixes = docSets.select(col("id"), col("sz"),
      posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("pos", "sh")))
    val minIsect = threshold / (1.0 + threshold)
    val cand = prefixes.groupBy("sh")
      .agg(sort_array(collect_list(
        struct(col("id"), col("sz"), col("pos")))).as("xs"))
      .filter(size(col("xs")) > 1)
      // hot-prefix-posting tripwire — same meltdown mode as the plain
      // inverted index, same zero-extra-pass check on the grouped grain
      .withColumn("xs", postingCapped(col("xs"), maxPostingLen, "ppjoin"))
      // positional-filtered pair expansion in one compiled loop
      // (graftx.PrefixFilteredPairs) — same ub/ceil arithmetic as the
      // composed HOF form, evaluated without lambda dispatch
      .select(org.apache.spark.sql.graftx.PrefixFilteredPairs
        .col(col("xs"), minIsect))
      .distinct()
    // verification by co-occurrence counting over ONLY the candidate
    // docs' postings (re-read from the checkpoint, not re-tokenized):
    // counting through a hash aggregate beats per-pair array
    // intersection once candidates × |set| gets large, and the
    // candidate semi-join at the end restores PPJoin's pruning.
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val candPostings = docSets.join(broadcast(candIds), Seq("id"), "left_semi")
      .select(col("id"), explode(col("shs")).as("sh"))
    jaccardPairs(candPostings, threshold, maxPostingLen)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
  }

  /** MinHash signatures as ONE wide row per doc: (id, m0..m{n-1})
    * where m_h = min over shingles of xxhash64(shingle, h).
    *
    * Deliberately NOT the explode-by-hash-index formulation: that
    * shuffles |shingles| × numHashes rows. Here each hash function is
    * its own `min` aggregate, so Spark's partial (map-side)
    * aggregation collapses every partition to one row per doc before
    * the single shuffle — the shuffle carries |docs| rows of 32
    * longs, independent of shingle count. */
  def minhashSignatures(shingled: DataFrame, numHashes: Int): DataFrame = {
    // rehash the 8-byte shingle hash per function, not the string:
    // 32 hash evaluations over a long are ~free next to 32 string
    // digests, and the family quality is unchanged
    val mins = (0 until numHashes).map(h =>
      min(xxhash64(col("sh"), lit(h))).as(s"m$h"))
    shingled.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** [[minhashSignatures]] over the portable universal-hash family
    * (a_h·x + b_h mod P). Same partial-aggregation shape: the shuffle
    * still carries one row of `numHashes` longs per doc. */
  def minhashSignaturesPortable(shingled: DataFrame,
                                numHashes: Int): DataFrame = {
    import graft.functions.PortableHash
    val mins = (0 until numHashes).map(h =>
      min(PortableHash.perm(h, col("sh"))).as(s"m$h"))
    shingled.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding over wide signatures: (id, band, bucket), bucket =
    * hash of the band's minhash columns in order. Row explosion is
    * |docs| × bands (tiny). Docs sharing any band bucket are
    * candidates. */
  def lshBuckets(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val numHashes = signatures.columns.count(_.startsWith("m"))
    val bands = numHashes / rowsPerBand
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(h => col(s"m$h"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: cols: _*).as("bucket"))
    }
    signatures.select(col("id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** [[lshBuckets]] with the portable polynomial bucket combine
    * (oracle-reproducible integer arithmetic instead of xxhash64). */
  def lshBucketsPortable(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    import graft.functions.PortableHash
    val numHashes = signatures.columns.count(_.startsWith("m"))
    val bands = numHashes / rowsPerBand
    val bandStructs = (0 until bands).map { b =>
      val ms = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(h => col(s"m$h"))
      struct(lit(b).as("band"),
        PortableHash.bandBucket(b, ms).as("bucket"))
    }
    signatures.select(col("id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs from shared band buckets (deduplicated).
    *
    * A band bucket of k docs emits C(k,2) candidates — the same
    * hot-key meltdown mode as an un-pruned posting list, hit when the
    * corpus has a giant exact-duplicate cluster (every clone shares
    * every band) or the band width is too narrow for the corpus.
    * Same default posture as [[jaccardPairs]]: a loud
    * `maxBucketLen` tripwire (1-row broadcast guard on the max
    * (band,bucket) size — the build side evaluates before the
    * self-join probe streams, so the run fails BEFORE the pair
    * explosion). Opt out with `maxBucketLen = None`. */
  def lshCandidates(buckets: DataFrame,
                    maxBucketLen: Option[Long] = Some(10000L)): DataFrame = {
    val joined0 = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
    val joined = maxBucketLen match {
      case None => joined0
      case Some(c) =>
        val guard = buckets.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bl"))
          .agg(coalesce(max(col("__bl")), lit(0L)).as("__mx"))
          .filter(when(col("__mx") <= lit(c), lit(true))
            .otherwise(raise_error(concat(
              lit("lshCandidates: band bucket of "),
              col("__mx").cast("string"),
              lit(s" docs exceeds maxBucketLen=$c — widen the bands " +
                "(more rows per band), pre-collapse exact duplicates, " +
                "or raise the cap explicitly.")))))
          .select(lit(1L).as("__bl_ok"))
        joined0.crossJoin(broadcast(guard)).drop("__bl_ok")
    }
    joined
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * candidates → exact-Jaccard verification. Output matches
    * [[jaccardPairs]] schema, restricted to LSH candidates. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 32,
                   rowsPerBand: Int = 4,
                   threshold: Double = 0.5,
                   portable: Boolean = false): DataFrame = {
    // Band buckets: the portable path is the zero-shuffle per-row
    // fold; the xxhash64 path keeps the wide-signature aggregation.
    // Materialized once via localCheckpoint — the bucket table is
    // referenced by both sides of the candidate self-join and (via
    // candidates) by the verification stage, and without a
    // checkpoint each reference re-runs the full tokenize→shingle→
    // sign chain over the corpus. Buckets are |docs| × bands rows of
    // three longs — cheap to store at any scale (on a cluster this
    // would be a temp-table write; local block storage is the
    // single-JVM equivalent).
    val buckets =
      (if (portable)
        lshBucketsPortable(minhashSignaturesPortable(
          shingleTablePortable(docs, idCol, textCol, shingleN), numHashes),
          rowsPerBand)
      else
        lshBuckets(minhashSignatures(
          shingleTable(docs, idCol, textCol, shingleN), numHashes),
          rowsPerBand)).pin()
    val candidates = lshCandidates(buckets)
    // Re-shingle ONLY candidate docs for verification: the candidate
    // id set is a tiny broadcast filter pushed below the tokenizer,
    // so exact-Jaccard verification tokenizes a few hundred docs, not
    // the corpus.
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val candDocs = docs.join(broadcast(candIds),
      docs(idCol) === candIds("id"), "left_semi")
    val candShingled =
      if (portable) shingleTablePortable(candDocs, idCol, textCol, shingleN)
      else shingleTable(candDocs, idCol, textCol, shingleN)
    jaccardPairs(candShingled, threshold)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
  }

  /** SimHash near-dup: 64-bit fingerprint per doc, banded into four
    * 16-bit buckets; pairs sharing a band are verified by Hamming
    * distance <= maxHamming.
    *
    * The fingerprint travels as ONE packed long, not the 64-int bit
    * array: the bucket is a 16-bit shift-mask of it and the Hamming
    * verification is `bit_count(a ^ b)` in codegen — so the band
    * self-join's payload is 8 bytes/side and nothing wide ever
    * shuffles (the earlier formulation carried both bit arrays
    * through the join). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"),
        Text.simhashBits(s"filter(split(lower($textCol), '[^a-z0-9]+'), " +
          "t -> length(t) > 0)").as("bits"))
      .select(col("id"), expr(
        """aggregate(zip_with(bits, sequence(0, 63),
          |  (b, i) -> shiftleft(CAST(b AS BIGINT), CAST(i AS INT))),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
        .as("sig"))
    val banded = withSig
      .select(col("id"), col("sig"),
        explode(lit((0 until 4).toArray)).as("band"))
      .withColumn("bucket", expr("shiftright(sig, band * 16) & 65535"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        expr("CAST(bit_count(x.sig ^ y.sig) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair list — the dedup
    * endgame: pairs only say "these two match"; keeping one document
    * per duplicate GROUP needs the transitive closure (A~B, B~C ⇒
    * one cluster {A,B,C}).
    *
    * Iterative min-label propagation: every node starts labeled with
    * its own id; each round takes the min of its own and its
    * neighbors' labels; at convergence every node carries the min id
    * of its component — a deterministic canonical representative.
    * Rounds = graph diameter, and near-dup graphs are shallow (dup
    * clusters are cliques or short chains), so convergence is a
    * handful of small joins. Each round localCheckpoints to cut the
    * lineage (mandatory for iterative plans) and the convergence test
    * is an isEmpty probe. At extreme scale the same loop tightens
    * into the large-star/small-star formulation (Kiveris et al.) —
    * identical join shapes, fewer rounds.
    *
    * Returns (id, cluster) for every id that appears in `pairs`. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .pin()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .pin()
    // labels only ever DECREASE (least of self and neighbors), so
    // Σlabel is strictly monotone until fixpoint — comparing it across
    // rounds is a one-row aggregate per round, not a join+filter probe
    def metric(df: DataFrame): (Long, Long) = {
      val r = df.agg(coalesce(sum(col("label")), lit(0L)),
        count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var prev = metric(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nb = edges
        .join(labels.select(col("id").as("b"), col("label").as("nl")),
          Seq("b"))
        .groupBy(col("a")).agg(min(col("nl")).as("nmin"))
        .select(col("a").as("id"), col("nmin"))
      val next = labels.join(nb, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
        .pin()
      val m = metric(next)
      converged = m == prev
      prev = m
      labels = next
      i += 1
    }
    require(converged, s"connectedComponents: no convergence in $maxIter")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14 — public algorithm) — the scale path next to
    * [[connectedComponents]]: the naive min-label loop runs
    * diameter-many rounds (a 10⁶-long chain needs 10⁶ joins), the
    * star loop contracts greedily toward each component's minimum in
    * O(log n) rounds regardless of diameter. Per round:
    *
    *  - LARGE-STAR: every node u links each strictly-larger neighbor
    *    to m = min(N(u) ∪ u) — long tails fold onto local minima;
    *  - SMALL-STAR: every node u links its smaller-or-equal neighbors
    *    (and itself) to their minimum — stars flatten.
    *
    * Both steps are one groupBy-min plus one narrow join on (node,
    * node) pairs; edges stay canonical (hi, lo) and deduped, so the
    * working set only shrinks. Convergence is a one-row checksum
    * aggregate per round (count + two modular sums), not a join
    * probe. Fixpoint: every edge points directly at its component's
    * minimum id.
    *
    * Returns (id, cluster) for every id in `pairs` — identical output
    * to [[connectedComponents]] (same contract, fewer rounds). */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30)
      : DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
    var edges = canon(pairs.select(col("id_a").as("a"),
      col("id_b").as("b"))).pin()
    val nodes = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .distinct().pin()
    // multiset fingerprint of the canonical edge set: modular sums
    // (no overflow cliff) + count — equal across a full round ⇒
    // fixpoint. One scalar row per probe.
    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(pmod(col("hi") * 31 + col("lo"), lit(1000003L))),
          lit(0L)),
        coalesce(sum(pmod(col("lo") * 17 + col("hi"), lit(999983L))),
          lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var prev = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star over the symmetric neighbor view
      val nbr = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = canon(nbr.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))).pin()
      // small-star over the canonical (hi → smaller neighbors) view
      val minsS = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val ss = canon(ls.join(minsS, Seq("hi"))
        .select(col("lo").as("a"), col("m").as("b"))
        .unionByName(minsS.select(col("hi").as("a"), col("m").as("b"))))
        .pin()
      val m = checksum(ss)
      converged = m == prev
      prev = m
      edges = ss
      i += 1
    }
    require(converged, s"connectedComponentsStar: no convergence in $maxIter")
    nodes
      .join(edges.select(col("hi").as("id"), col("lo")).groupBy(col("id"))
        .agg(min(col("lo")).as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
  }

  /** Embedding-cosine near-dup: sign-LSH bucket join then cosine
    * threshold. See [[graft.functions.Vectors.signBucket]].
    *
    * Same candidate shape as [[Similarity.multiBandTopK]]: the bucket
    * self-join runs on (id, bucket) only and the pair list is
    * de-duplicated on the narrow id columns BEFORE the embeddings are
    * joined back — the wide vectors never ride through the bucket
    * shuffle, and with AQE the (small) candidate side broadcasts into
    * the vector joins. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    import graft.functions.Vectors
    val ids = emb.select(col(idCol).as("id"),
      Vectors.signBucket(col(vecCol)).as("bucket"))
    val pairs = ids.as("x")
      .join(ids.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.cosineNative(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
