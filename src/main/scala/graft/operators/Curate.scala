package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, Text, Vectors}
import graft.core.PlanStats.Pinned

/** Corpus-curation operators for training-data pipelines: weighted
  * sampling, exact shared-span detection, and centroid assignment
  * (SURVEY.md §2.12 follow-ons; no reference analogue — the reference
  * delegates all set-level work to SQL, cf. `lambda/trips_lambda.py`).
  *
  * Everything here is shaped for the 100 TB case first:
  * per-row decisions against broadcast scalars (sampling), banded
  * candidate generation with document-frequency pruning (spans), and
  * a broadcast dimension with a single map-side-combinable aggregate
  * (assignment). No operator shuffles the corpus more than once.
  */
object Curate {

  /** 2^60 as an exact double (power of two — no rounding). */
  private val Pow60: Double = 1152921504606846976L.toDouble

  /** Deterministic weighted Bernoulli sample: keep a row iff
    * u(id) · W < k · w, where u(id) is a uniform-in-[0,1) hash of the
    * row key, w the row's weight, and W the total weight. Expected
    * sample size is k (rows with w ≥ W/k are always kept); inclusion
    * is a pure function of (key, weight, W), so the sample is
    * reproducible across runs, engines, and layouts — re-running on a
    * re-partitioned corpus selects the same rows.
    *
    * Scale: ONE tiny aggregate for W (map-side combined, broadcast
    * back as a scalar) and a per-row filter — the corpus itself never
    * shuffles. This is the sampler you can afford on 100 TB: weighting
    * by n_chars ≈ token-budget-proportional selection.
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     expectedK: Double): DataFrame = {
    val tot = df.agg(sum(weightCol.cast("long")).as("__w_total"))
    df.crossJoin(broadcast(tot))
      .withColumn("__u",
        PortableHash.hash60(concat(lit("ws:"), keyCol.cast("string")))
          .cast("double") / lit(Pow60))
      .filter(col("__u") * col("__w_total").cast("double") <
        lit(expectedK) * weightCol.cast("double"))
      .drop("__u", "__w_total")
  }

  /** Weighted sampling WITHOUT replacement, exactly k rows
    * (Efraimidis–Spirakis A-ES, public algorithm): each row draws the
    * deterministic uniform u(key) and ranks by −ln(u)/w — the k
    * smallest ranks are a weight-proportional sample without
    * replacement, unlike [[weightedSample]]'s Bernoulli design whose
    * size only CONCENTRATES around k. The rank is rounded to an e9
    * integer (one fixed IEEE expression per row; the rounding absorbs
    * the last-ulp `ln` divergence between libms) with the key as
    * tiebreak, so selection is reproducible bit-for-bit on any
    * engine.
    *
    * Scale shape: zero shuffles of the corpus — the global k-smallest
    * plans as TakeOrderedAndProject (each task keeps k rows, the
    * driver merges #partitions·k). Returns the selected rows plus
    * `aes_rank_e9`. */
  def weightedTopKSample(df: DataFrame, keyCol: Column, weightCol: Column,
                         k: Int): DataFrame = {
    val u = PortableHash.hash60(concat(lit("aes:"), keyCol.cast("string")))
      .cast("double") / lit(Pow60)
    df.withColumn("aes_rank_e9",
        round(-log(u) / weightCol.cast("double") * lit(1000000000.0))
          .cast("long"))
      .orderBy(col("aes_rank_e9").asc, keyCol.asc)
      .limit(k)
  }

  /** Content-defined anchor windows: the exact-substring-dedup
    * primitive. A window of `win` consecutive tokens starts at every
    * position whose FIRST token hashes to 0 mod `modulus` — anchors
    * are chosen by content, not position, so two documents sharing a
    * run of ≥ `win` + a few tokens produce the *same* window strings
    * regardless of where the run sits in each document (the
    * content-defined-chunking property; a fixed-stride grid would only
    * match runs at equal offsets mod stride).
    *
    * Returns (id, sh) with sh = portable 60-bit hash of the window —
    * the postings shuffle carries 16 bytes/row, never window text.
    * Expected postings per doc ≈ tokens/modulus.
    */
  def anchorWindowTable(docs: DataFrame, idCol: String, textCol: String,
                        win: Int, modulus: Int): DataFrame = {
    val toks = col("__toks")
    val anchors = filter(
      sequence(lit(1), size(toks) - lit(win - 1)),
      i => pmod(PortableHash.hash60(element_at(toks, i)), lit(modulus)) === 0)
    val windows = transform(anchors,
      i => array_join(slice(toks, i, lit(win)), " "))
    docs
      .select(col(idCol).as("id"), Text.words(col(textCol)).as("__toks"))
      .filter(size(toks) >= win)
      .select(col("id"),
        explode(array_distinct(windows)).as("win"))
      .select(col("id"), PortableHash.hash60(col("win")).as("sh"))
  }

  /** Document pairs sharing at least one anchor window: (id_a, id_b,
    * n_shared) with id_a < id_b. Same posting-list pair emission as
    * [[Dedup.jaccardPairs]] — group by window hash, emit C(k,2)
    * ordered pairs from each list — so the corpus is scanned once and
    * no join carries text. Callers should df-prune the postings first
    * ([[Dedup.dfPruneFrac]]): a boilerplate window shared by 10⁵ docs
    * is the quadratic edge, and dropping it is a quality win (shared
    * boilerplate is not shared authorship).
    */
  def sharedSpanPairs(windows: DataFrame): DataFrame =
    windows
      .groupBy("sh")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |    b -> struct(a AS id_a, b AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))

  /** Nearest-centroid assignment per ROW (the k-means E-step, and
    * the semantic-dedup/clustering primitive): appends (center_id,
    * cos) — the centers row with the highest cosine similarity, ties
    * broken by the smallest center id — to every input row, vector
    * column intact.
    *
    * Scale: the k centers are collapsed into ONE broadcast row
    * holding an array of (id, vector) structs, and the argmax is a
    * per-row `array_max` over the k cosines — the corpus is scanned
    * in place with NO shuffle at all (a crossJoin + groupBy(id)
    * formulation would re-shuffle one row per vector just to pick
    * the max). Cosine runs in the fused codegen expression
    * ([[Vectors.cosineNative]]). Lexicographic struct max over
    * (cos, -center, center) == "highest cosine, then lowest center
    * id" — deterministic under any execution order.
    */
  def assignRows(vectors: DataFrame, vecCol: String,
                 centers: DataFrame, centerIdCol: String,
                 centerVecCol: String): DataFrame = {
    val packed = centers.agg(collect_list(
      struct(col(centerIdCol).cast("long").as("cid"),
        col(centerVecCol).as("cvec"))).as("__centers"))
    vectors
      .crossJoin(broadcast(packed))
      .withColumn("__best", array_max(transform(col("__centers"), c =>
        struct(
          Vectors.cosineNative(col(vecCol), c.getField("cvec")).as("cos"),
          (-c.getField("cid")).as("__neg"),
          c.getField("cid").as("center_id")))))
      .withColumn("center_id", col("__best.center_id"))
      .withColumn("cos", col("__best.cos"))
      .drop("__centers", "__best")
  }

  /** [[assignRows]] projected to (id, center_id, cos). */
  def assignToCenters(vectors: DataFrame, idCol: String, vecCol: String,
                      centers: DataFrame, centerIdCol: String,
                      centerVecCol: String): DataFrame =
    assignRows(vectors, vecCol, centers, centerIdCol, centerVecCol)
      .select(col(idCol), col("center_id"), col("cos"))

  /** Overlapping token-window chunking — the step that turns documents
    * into fixed-size training windows. Each document is tokenized once
    * and split into windows of `win` tokens starting every `stride`
    * tokens (stride < win ⇒ overlapping context windows; stride == win
    * ⇒ a partition of the token sequence; the final window may be
    * short). Documents with no tokens produce no chunks.
    *
    * Returns (doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    * chunk_text) with chunk_idx dense from 0 per document.
    *
    * Scale: a pure per-row Generate (tokenize → sequence of starts →
    * explode → slice) — NO shuffle, no join, no window function. The
    * chunker is the one corpus pass a 100 TB pipeline cannot afford to
    * shuffle, and this one never does; downstream repartitioning (by
    * chunk hash for dedup, by size for packing) composes on top.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   win: Int, stride: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      org.apache.spark.sql.graftx.WordWindows.col(col(textCol), win, stride))

  /** The registry-free composed formulation of [[chunkWindows]]
    * (sequence → posexplode → slice → array_join): four generic
    * expression layers and two array allocations per chunk where the
    * generator writes rows directly. Kept as the parity reference —
    * CurationSpec pins the two row-for-row equal. */
  def chunkWindowsComposed(docs: DataFrame, idCol: String, textCol: String,
                           win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0, s"win=$win stride=$stride must be > 0")
    docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        slice(col("__w"), col("col") + 1, lit(win)).as("__c"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Sequence packing: assign chunks to fixed token-budget training
    * bins by a running prefix sum — the batch-assembly step between
    * chunking ([[chunkWindows]]) and the trainer. A chunk lands in bin
    * ⌊(tokens before it)/budget⌋ of its bucket, so bins fill
    * contiguously in (orderCols) order, chunks never split, and the
    * assignment is a pure function of the bucketed order — identical
    * on any engine or layout.
    *
    * Packing is inherently sequential (each row's bin depends on every
    * predecessor), so `bucketCol` IS the parallelism: each bucket
    * packs independently in one partitioned-window pass. At 100 TB you
    * size the bucket count to the cluster (thousands of hash buckets),
    * never pack in one global ordering — a global `Window.orderBy`
    * here would be the q59 single-task funnel.
    *
    * Returns the input plus (tokens_before, bin_idx). */
  def packSequences(chunks: DataFrame, bucketCol: Column,
                    orderCols: Seq[Column], tokenCol: Column,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be > 0")
    val w = Window.partitionBy(bucketCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("tokens_before",
        coalesce(sum(tokenCol.cast("long")).over(w), lit(0L)))
      .withColumn("bin_idx", expr(s"tokens_before div $budget"))
  }

  /** Temperature-balanced multilingual sampling (the `p_l^α` corpus
    * mixing rule): draw an expected `totalK` documents with per-group
    * budgets proportional to `C_l^α`, where `C_l` is group *l*'s total
    * weight and α ∈ (0,1] flattens the distribution (α = 1 ⇒
    * weight-proportional, α → 0 ⇒ uniform across groups — the standard
    * upsampling of low-resource languages). Within a group, inclusion
    * is the same deterministic weighted Bernoulli rule as
    * [[weightedSample]]: keep iff u(key)·C_l·S < totalK·p̂_l·w, a pure
    * function of the row and two broadcast-scalar group statistics.
    *
    * Exact-parity discipline: the only transcendental (`pow(C_l, α)`)
    * is rounded to an integer e4 fixed-point (`p̂_l`), so the budget
    * share and the keep predicate are reproducible bit-for-bit on any
    * engine; everything else is integer arithmetic plus one fixed-order
    * double comparison.
    *
    * Scale: one vocabulary-of-groups-sized aggregate (map-side
    * combined), one broadcast join back — the corpus itself never
    * shuffles, same property as [[weightedSample]].
    */
  def temperatureSample(df: DataFrame, keyCol: Column, groupCol: Column,
                        weightCol: Column, alpha: Double,
                        totalK: Double): DataFrame = {
    // materialized once (localCheckpoint): the Σp̂ scalar derives from
    // the SAME group table — without it Catalyst re-expands the
    // aggregate and scans the corpus a third time
    val groups = df.groupBy(groupCol.as("__g"))
      .agg(sum(weightCol.cast("long")).as("__c"))
      .withColumn("__p_e4",
        round(pow(col("__c").cast("double"), alpha) * 1e4)
          .cast("long"))
      .pin()
    val s = groups.agg(sum(col("__p_e4")).as("__s"))
    df.join(broadcast(groups), groupCol === col("__g"))
      .crossJoin(broadcast(s))
      .withColumn("__u",
        PortableHash.hash60(concat(lit("ts:"), keyCol.cast("string")))
          .cast("double") / lit(Pow60))
      .filter(col("__u") * col("__c").cast("double") * col("__s").cast("double") <
        lit(totalK) * col("__p_e4").cast("double") * weightCol.cast("double"))
      .drop("__g", "__c", "__p_e4", "__s", "__u")
  }

  /** Per-group cap (crawl curation: keep at most k documents per
    * source/domain, best-first by `orderSpec` — the per-domain quota
    * every web-corpus pipeline applies before training). Delegates to
    * the two-phase [[org.apache.spark.sql.graftx.TopKPerKeyPlan]]
    * custom plan: each map task keeps a bounded k-heap per group, so
    * shuffle volume is ≤ k·groups·partitions rows regardless of corpus
    * size — the `row_number().over(Window)` formulation would shuffle
    * and sort EVERY row of every group. Output = input columns plus a
    * 1-based `rank` identical to `row_number` under the same total
    * order (orderSpec must be total — include a unique tiebreaker). */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  orderSpec: Seq[(String, Boolean)], k: Int): DataFrame =
    org.apache.spark.sql.graftx.TopKPerKeyPlan
      .topK(df, groupCols, orderSpec, k, "rank")

  /** Class-balanced uniform downsample: exactly min(k, |group|) rows
    * per group, chosen uniformly WITHOUT replacement — order by a
    * deterministic per-row hash and keep the k smallest (a hash of a
    * unique key is a random permutation, so rank ≤ k is a uniform
    * k-subset, reproducible on any engine or layout). The class-
    * rebalancing primitive (cap the over-represented language/source/
    * label classes); contrast [[weightedSample]], which controls the
    * EXPECTED count but not per-group exactness. Same bounded-heap
    * TopKPerKey plan as [[capPerGroup]] — shuffle ≤ k·groups·
    * partitions rows. Output keeps the `__u` hash and `rank` columns
    * (droppable by the caller). */
  def balancedSample(df: DataFrame, groupCols: Seq[String],
                     keyCol: String, k: Int): DataFrame =
    capPerGroup(
      df.withColumn("__u",
        PortableHash.hash60(concat(lit("bs:"), col(keyCol).cast("string")))),
      groupCols, Seq(("__u", false), (keyCol, false)), k)

  /** Global 1-based dense rank over `sortCols` WITHOUT the
    * single-task `Window.orderBy` funnel — the scale-safe spine every
    * global decile/rank/ntile query must route through (extracted
    * from q59 after q291 re-introduced the funnel independently):
    *
    *  1. range-repartition on the sort key (`sortCols` must end in a
    *     unique tiebreak, or ranks of ties are layout-dependent) —
    *     the sampler balances partitions, every task holds a
    *     contiguous key range;
    *  2. sort within partitions; the local row index is the low 33
    *     bits of monotonically_increasing_id (per-partition counter);
    *  3. global rank = local index + the sum of earlier partitions'
    *     sizes, joined in from the tiny per-partition size table
    *     (O(parts) rows — broadcast, no driver collect, no Window
    *     anywhere in the plan).
    *
    * The pin is load-bearing, not an optimization: the size pass and
    * the rank pass both branch off `base`, and if Catalyst fails to
    * reuse the range exchange (observed at the ×10 smoke once the
    * range sampler goes lossy), each branch re-runs RangePartitioner
    * with a different RDD-id-derived seed — different boundaries per
    * branch, offsets joined against the wrong sizes, ranks no longer
    * a permutation. Checkpointing makes pid/local_idx literal data.
    *
    * Output: the input columns plus `rankName` (1-based LongType,
    * a permutation of 1..N). One full shuffle of the input — the
    * minimum any global ranking can pay.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 rankName: String = "rnk",
                 parts: Int = -1): DataFrame = {
    val nParts = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df
      .repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .withColumn("__gr_idx", monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1)))
      .pin()
    val sizes = base.groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("__gr_cnt"))
    // cumulative offsets over O(parts) rows via a broadcast self-join
    // (deliberately no Window: keeps the whole plan Window-free)
    val offsets = sizes.as("a")
      .join(broadcast(sizes.as("b")),
        col("b.__gr_pid") < col("a.__gr_pid"), "left")
      .groupBy(col("a.__gr_pid"))
      .agg(coalesce(sum(col("b.__gr_cnt")), lit(0L)).as("__gr_off"))
    base.join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rankName, col("__gr_off") + col("__gr_idx") + lit(1L))
      .drop("__gr_pid", "__gr_idx", "__gr_off")
  }

  /** Global rank PLUS inclusive running sum of `valueCol` in
    * `sortCols` order, with the same scale-safe shape as
    * [[globalRank]] (range repartition + broadcast per-partition
    * offsets — no unpartitioned window). The Pareto/cumulative-share
    * spine: ABC classification, Lorenz curves, waterfilling — any
    * "cumulative X by rank" over a grain that scales with the fact
    * tables. The within-partition running sum is a window PARTITIONED
    * by the range-partition id, so each task sums one balanced
    * partition; the cross-partition carry is the broadcast offset
    * join, same as the rank path.
    */
  def globalCumSum(df: DataFrame, sortCols: Seq[Column],
                   valueCol: Column, cumName: String,
                   rankName: String = "rnk",
                   parts: Int = -1): DataFrame = {
    val nParts = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df
      .withColumn("__gc_v", valueCol)
      .repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__gc_pid", spark_partition_id())
      .withColumn("__gc_idx", monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1)))
      .pin()
    val sizes = base.groupBy(col("__gc_pid"))
      .agg(count(lit(1)).as("__gc_cnt"), sum(col("__gc_v")).as("__gc_sum"))
    val offsets = sizes.as("a")
      .join(broadcast(sizes.as("b")),
        col("b.__gc_pid") < col("a.__gc_pid"), "left")
      .groupBy(col("a.__gc_pid"))
      .agg(coalesce(sum(col("b.__gc_cnt")), lit(0L)).as("__gc_offn"),
        coalesce(sum(col("b.__gc_sum")), lit(0L)).as("__gc_offs"))
    val wLoc = Window.partitionBy(col("__gc_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), Seq("__gc_pid"))
      .withColumn(rankName, col("__gc_offn") + col("__gc_idx") + lit(1L))
      .withColumn(cumName, col("__gc_offs") + sum(col("__gc_v")).over(wLoc))
      .drop("__gc_pid", "__gc_idx", "__gc_v", "__gc_offn", "__gc_offs")
  }

  /** PER-KEY rank and inclusive running sum in `sortCols` order — the
    * keyed generalization of [[globalCumSum]] for the few-keys /
    * huge-rows-per-key shape (a cumulative sum per experiment, per
    * tenant, per metric) where `Window.partitionBy(key)` would funnel
    * each key's entire history through ONE task. Rows range-partition
    * on (key, sortCols) so one key spans many balanced partitions;
    * per-(partition, key) counts/sums broadcast back as carry
    * offsets; the within-partition window partitions by
    * (partition id, key) — every task touches at most one partition's
    * slice of any key. Key cardinality must be small enough that
    * parts × keys stays broadcast-sized (offsets grain), which is
    * exactly the regime the operator exists for — and that contract
    * is ENFORCED, not hoped: the offsets build raises loudly when the
    * (partition, key) grain exceeds `maxOffsetRows` (default 2²⁰ ≈
    * 1M rows, ~tens of MB broadcast — the driver-safety ceiling).
    * A trip means the key column is high-cardinality: use a plain
    * `Window.partitionBy(key)` there instead (many small keys ⇒ the
    * per-key funnel this operator exists to avoid never forms), or
    * pass `maxOffsetRows = None` to accept the broadcast explicitly.
    *
    * `parts` caps the FIRST-PASS parallelism (each range partition is
    * one task): the default (-1) adapts to the session's
    * `spark.sql.shuffle.partitions` — 32 on the local harness, the
    * cluster-sized setting on a real deployment — so a 100 TB run
    * does not funnel through 32 tasks. Pass an explicit count to
    * trade offset-grain size (parts × keys broadcast rows) against
    * per-task slice size; both passes stay two linear scans either
    * way.
    */
  def keyedCumSum(df: DataFrame, keyCols: Seq[String],
                  sortCols: Seq[Column], valueCol: Column,
                  cumName: String, rankName: String = "rnk",
                  parts: Int = -1,
                  maxOffsetRows: Option[Long] = Some(1L << 20))
      : DataFrame = {
    val nParts = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ks = keyCols.map(col)
    val ordered = ks ++ sortCols
    val base = df
      .withColumn("__kc_v", valueCol)
      .repartitionByRange(nParts, ordered: _*)
      .sortWithinPartitions(ordered: _*)
      .withColumn("__kc_pid", spark_partition_id())
      .pin()
    val sizes = base.groupBy(col("__kc_pid") +: ks: _*)
      .agg(count(lit(1)).as("__kc_cnt"), sum(col("__kc_v")).as("__kc_sum"))
    val offsets = sizes.as("a")
      .join(broadcast(sizes.as("b")),
        keyCols.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _) &&
          col("b.__kc_pid") < col("a.__kc_pid"), "left")
      .groupBy(col("a.__kc_pid").as("__kc_pid") +:
        keyCols.map(k => col(s"a.$k").as(k)): _*)
      .agg(coalesce(sum(col("b.__kc_cnt")), lit(0L)).as("__kc_offn"),
        coalesce(sum(col("b.__kc_sum")), lit(0L)).as("__kc_offs"))
    // offsets-grain tripwire (the scaladoc contract, enforced): the
    // guard aggregate evaluates inside the offsets broadcast build,
    // so a high-cardinality key fails the job BEFORE a parts×keys
    // table lands on the driver. 1-row agg over the already-computed
    // sizes grain — no extra pass over the data.
    val offsetsG = maxOffsetRows match {
      case None => offsets
      case Some(cap) =>
        val guard = sizes.agg(count(lit(1)).as("__kc_ng"))
          .filter(when(col("__kc_ng") <= lit(cap), lit(true))
            .otherwise(raise_error(concat(
              lit("keyedCumSum: offsets grain of "),
              col("__kc_ng").cast("string"),
              lit(s" (partition, key) rows exceeds maxOffsetRows=$cap " +
                "— the key column is too high-cardinality for the " +
                "broadcast-carry shape. Use Window.partitionBy(key) " +
                "for many-small-keys data, or pass " +
                "maxOffsetRows = None to accept the broadcast.")))))
          .select(lit(1L).as("__kc_ok"))
        offsets.crossJoin(guard).drop("__kc_ok")
    }
    val wLoc = Window.partitionBy(col("__kc_pid") +: ks: _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsetsG), "__kc_pid" +: keyCols)
      .withColumn(rankName,
        col("__kc_offn") + count(lit(1)).over(wLoc))
      .withColumn(cumName, col("__kc_offs") + sum(col("__kc_v")).over(wLoc))
      .drop("__kc_pid", "__kc_v", "__kc_offn", "__kc_offs")
  }

  /** Global RUNNING MAX of `valueCol` in `sortCols` order — same
    * scale-safe shape as [[globalCumSum]] (range repartition +
    * broadcast per-partition offsets; the within-partition window
    * partitions by the range-partition id). With `inclusive = false`
    * the max EXCLUDES the current row (the watermark shape: "highest
    * event time seen BEFORE this row arrived"); the first row
    * globally gets NULL, which the caller coalesces. `valueCol` must
    * be orderable; offsets use `greatest`, which ignores NULL sides.
    */
  def globalCumMax(df: DataFrame, sortCols: Seq[Column],
                   valueCol: Column, maxName: String,
                   inclusive: Boolean = true,
                   parts: Int = -1): DataFrame = {
    val nParts = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df
      .withColumn("__gm_v", valueCol)
      .repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__gm_pid", spark_partition_id())
      .pin()
    val sizes = base.groupBy(col("__gm_pid"))
      .agg(max(col("__gm_v")).as("__gm_pmax"))
    val offsets = sizes.as("a")
      .join(broadcast(sizes.as("b")),
        col("b.__gm_pid") < col("a.__gm_pid"), "left")
      .groupBy(col("a.__gm_pid"))
      .agg(max(col("b.__gm_pmax")).as("__gm_off"))
    val frameEnd = if (inclusive) 0L else -1L
    val wLoc = Window.partitionBy(col("__gm_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    base.join(broadcast(offsets), Seq("__gm_pid"))
      .withColumn(maxName,
        greatest(col("__gm_off"), max(col("__gm_v")).over(wLoc)))
      .drop("__gm_pid", "__gm_v", "__gm_off")
  }

  /** Guarded unpartitioned rank for inputs that are SMALL BY
    * CONSTRUCTION (a vocabulary, a bin table, a ≤10³-row aggregate):
    * `row_number()` over a global `Window.orderBy`, but the caller
    * must DECLARE the cardinality bound, and the plan enforces it —
    * any row ranked past `maxRows` raises at runtime instead of
    * silently serializing a grown input through one task. This turns
    * "bounded today" comments into enforced invariants: a data-model
    * change that grows the input past its declared bound fails
    * loudly, pointing at the site that must be rewritten onto
    * [[globalRank]].
    *
    * The bound is a FAIL-LOUD CHECK, not scale protection: the
    * `raise_error` projection evaluates lazily per CONSUMED row, so
    * a downstream limit/early-out that never materializes rows past
    * `maxRows` leaves a violation undetected, and the whole input
    * still sorts through one task before any raise fires. Callers
    * that consume a prefix must validate the count separately.
    */
  def boundedRank(df: DataFrame, maxRows: Long, rankName: String,
                  sortCols: Column*): DataFrame = {
    val rn = row_number().over(Window.orderBy(sortCols: _*)).cast("long")
    df.withColumn(rankName,
      when(rn <= maxRows, rn).otherwise(raise_error(lit(
        s"boundedRank: input exceeded the declared $maxRows-row bound" +
          " — this site must move to Curate.globalRank"))))
  }

  /** Categorical dictionary encoding (string interning): build a
    * vocabulary of distinct values with dense ids (1-based, ordered
    * by value — deterministic on any engine), broadcast it, and
    * encode the corpus by join. The feature-pipeline primitive that
    * turns repeated strings into ints before training. The only
    * window runs over the DISTINCT vocabulary (vocabulary-sized, not
    * corpus-sized) and is bound-enforced via [[boundedRank]]: the
    * vocabulary must fit `maxVocab` (it is broadcast right after, so
    * a vocabulary too big to rank in one task was already too big to
    * encode by broadcast join — the two limits fail together instead
    * of the window silently becoming the funnel). The corpus itself
    * sees one broadcast hash join per encoded column, zero shuffles. */
  def dictEncode(df: DataFrame, valueCol: String, idName: String,
                 maxVocab: Long = 1L << 22): DataFrame = {
    val vocab = boundedRank(df.select(col(valueCol)).distinct(),
      maxVocab, idName, col(valueCol))
    df.join(broadcast(vocab), Seq(valueCol))
  }

  /** Regex scrub/redaction pass (the PII-masking shape: mask every
    * match of `pattern`, keep an audit count per row). Both the
    * rewrite and the count are codegen'd per-row expressions over one
    * scan — zero shuffle, embarrassingly parallel, the only shape a
    * full-corpus scrub can afford at 100 TB. Returns the input with
    * `textCol` masked in place plus a `n_matches` audit column. */
  def redact(df: DataFrame, textCol: String, pattern: String,
             repl: String): DataFrame =
    df.withColumn("n_matches",
        regexp_count(col(textCol), lit(pattern)).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), pattern, repl))

  /** Poisson(1) CDF steps for [[poissonWeight]]: P(X <= k). The
    * decimal literals parse to identical doubles on every engine
    * (correct rounding), so the inverse-CDF thresholds — and with
    * them every bootstrap weight — are engine-portable constants. */
  val poissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Deterministic Poisson-bootstrap replicate weight: inverse-CDF of
    * Poisson(1) applied to a portable uniform u ∈ [0,1). The
    * bootstrap that actually runs at 100 TB: resampling n rows with
    * replacement is impossible, but per-row independent Poisson(1)
    * weights approximate the multinomial exactly as n grows, need no
    * global state, and — derived from the portable hash — pick the
    * SAME replicate weights on any engine, so a DuckDB oracle reruns
    * the "randomness" bit-for-bit. */
  def poissonWeight(u: Column): Column =
    poissonCdf1.zipWithIndex.foldRight(lit(poissonCdf1.length): Column) {
      case ((p, k), rest) => when(u < p, k).otherwise(rest)
    }

  /** DuckDB twin of [[poissonWeight]] over fragment `u`. */
  def poissonWeightDuckSql(u: String): String =
    "CASE " + poissonCdf1.zipWithIndex.map { case (p, k) =>
      s"WHEN ($u) < $p THEN $k"
    }.mkString(" ") + s" ELSE ${poissonCdf1.length} END"
}
