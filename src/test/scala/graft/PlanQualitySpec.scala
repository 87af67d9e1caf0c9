package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these
  * plans survive a 100× scale-up. If someone's refactor drops a
  * pushed filter or turns a broadcast join into a shuffle, this is
  * the spec that goes red. */
class PlanQualitySpec extends AnyFunSuite {
  import TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("l_shipdate") && p.contains("l_discount"))
    // pruned read schema: none of the untouched lineitem columns
    assert(!p.contains("l_returnflag") && !p.contains("l_suppkey"))
  }

  test("q03: dimension side is broadcast, not shuffled") {
    val p = plan("q03_star_join_agg")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q04: snowflake dims broadcast; no sort-merge join") {
    val p = plan("q04_dim_snowflake")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q25: ANN corpus is scanned once, queries broadcast — corpus " +
       "side never exchanged before the join") {
    val p = plan("q25_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // ranking runs on the two-phase custom plan: bounded map-side
    // top-k below the exchange, merge+rank above it
    assert(p.contains("TopKPartial") && p.contains("TopKFinal"), p)
  }

  test("q01: aggregate is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial"), p)
    assert(p.contains("HashAggregate"))
  }

  test("trips pipeline: window and groupBy share one partitioning " +
       "(no third exchange)") {
    val p = plan("q15_trips_derive")
    val exchanges = "Exchange".r.findAllIn(p).length
    // window shuffle on user_id + final output sort; the groupBy on
    // user_id must reuse the window's hash partitioning
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
    assert(p.contains("WindowExec") || p.contains("Window"))
  }

  test("q21: exact dedup is a single-shuffle hash aggregate") {
    val p = plan("q21_dedup_exact")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"got $exchanges exchanges\n$p")
  }

  test("q42: salted aggregate is two-phase - an exchange on " +
       "(key, salt) then one on key") {
    val p = plan("q42_salted_agg")
    assert("Exchange hashpartitioning\\(user_id#\\d+L, __salt".r
      .findFirstIn(p).isDefined, p)
    assert("Exchange hashpartitioning\\(user_id#\\d+L, 4\\)".r
      .findFirstIn(p).isDefined ||
      "Exchange hashpartitioning\\(user_id#\\d+L, \\d+\\)".r
        .findAllIn(p).length >= 1, p)
  }

  test("q34: tumbling window aggregates with partial combine " +
       "before the shuffle") {
    val p = plan("q34_tumbling_window")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial"))
  }

  test("q54: all dimension chains broadcast — the fact side crosses " +
       "no exchange before the final aggregate") {
    val p = plan("q54_tpch_q5")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    // the date filter reaches the orders scan
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
  }

  test("q50: spatial classify is pure per-row work — only the " +
       "aggregate and sort exchange") {
    val p = plan("q50_spatial_join")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"got $exchanges exchanges\n$p")
    assert(!p.contains("Join"), p) // no join: polygons are literals
  }

  test("q24: simhash votes partially aggregate map-side (shuffle " +
       "carries one row per doc, not per token)") {
    val p = plan("q24_simhash")
    assert(p.contains("partial"), p)
    assert(p.contains("Generate"), p) // exploded-token codegen shape
  }

  test("q66/q67/q68: vocabulary/benchmark side broadcasts; no " +
       "single-partition funnel anywhere") {
    for (q <- Seq("q66_tfidf_keywords", "q67_decontaminate",
        "q68_surprisal")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastExchange"), s"$q:\n$p")
      assert(!p.contains("Exchange SinglePartition\n"), s"$q:\n$p")
    }
  }

  test("q59: global decile binning has NO Window — and in particular " +
       "no single-partition exchange funneling the corpus into one task") {
    val p = plan("q59_quality_bins")
    assert(!p.contains("Window"), p)
    assert(!"Exchange SinglePartition[^,)]*\\)\\s*\\n\\s*.*Window".r
      .findFirstIn(p).isDefined, p)
    // the rank pass reuses the size pass's range exchange
    assert(p.contains("rangepartitioning"), p)
  }

  test("q71: weighted sampling never hash-shuffles the corpus — one " +
       "broadcast scalar, per-row filter") {
    val p = plan("q71_weighted_sample")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q72: global heavy hitters = partial agg + TakeOrdered, " +
       "never a global sort") {
    val p = plan("q72_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial"), p)
  }

  test("q73: span pairs via posting lists — no cartesian, no " +
       "sort-merge self-join") {
    val p = plan("q73_span_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q74: centers broadcast; the argmax partial-aggregates " +
       "map-side") {
    val p = plan("q74_kmeans_assign")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial"), p)
  }

  test("q76: the bloom probe sits on the lineitem scan, below the " +
       "join, and the cohort side broadcasts") {
    val p = plan("q76_bloom_join")
    assert(p.contains("might_contain"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q74/q78: per-row centroid assignment — the ONLY hash " +
       "exchange in the whole k-means step is the k-group aggregate") {
    for (q <- Seq("q74_kmeans_assign", "q78_kmeans_step")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashEx == 1, s"$q: corpus must not shuffle, got $hashEx\n$p")
      assert("Exchange hashpartitioning\\(center_id".r.findFirstIn(p)
        .isDefined, s"$q:\n$p")
    }
  }

  test("q83: chunking is a pure per-row Generate — no join, no hash " +
       "shuffle of the corpus at any point") {
    val p = plan("q83_chunk_windows")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q84: BM25 — one broadcast stats row into per-row scoring; " +
       "corpus never shuffles; top-k is TakeOrderedAndProject") {
    val p = plan("q84_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q86: temperature sampling — group stats materialized once and " +
       "broadcast back; the corpus pass has ZERO hash exchanges") {
    val p = plan("q86_temperature_mix")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 0, s"corpus must not shuffle, got $hashEx\n$p")
  }

  test("q88: sequence packing — the only window is partitioned by " +
       "bucket (never a global single-task ordering)") {
    val p = plan("q88_pack_sequences")
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q90: histogram — one broadcast bounds row; the corpus never " +
       "hash-shuffles (bins-row aggregate only)") {
    val p = plan("q90_histogram")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q91: forward as-of — single union+window pass, no range " +
       "join, no cartesian") {
    val p = plan("q91_asof_forward")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }

  test("q92: PageRank — ranks broadcast into the edge scan (no " +
       "sort-merge join anywhere in the iteration chain)") {
    val p = plan("q92_pagerank")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q93: funnel — the fact's hash partitioning on user_id is " +
       "reused across the whole aggregate/join chain") {
    val p = plan("q93_funnel")
    // one exchange per source scan of the chain (re-scans share the
    // key) plus the final 1-row stack: no partitioning other than
    // user_id may appear before the global aggregate
    val ex = "Exchange hashpartitioning\\(([a-z_#0-9L, ]+?),"
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(ex.nonEmpty && ex.forall(_.startsWith("user_id")),
      s"non-user_id exchange in funnel chain: $ex\n$p")
  }

  test("q77: z-order tiling is scan + one aggregate — no join, " +
       "partial combine map-side") {
    val p = plan("q77_zorder_tiles")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial"), p)
  }

  test("q79: the salted join's key includes the salt column — the " +
       "hot key cannot land in one task") {
    val p = plan("q79_salted_join")
    assert(p.contains("__salt"), p)
  }

  test("q80: sliding windows expand in place (Generate/Expand, no " +
       "join) and partial-aggregate before the shuffle") {
    val p = plan("q80_sliding_window")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial"), p)
  }

  test("q81: the gap-fill grid is generated per key — no calendar " +
       "cross join") {
    val p = plan("q81_resample")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("Generate"), p) // sequence-explode inside the span row
  }

  test("q40: embedding near-dup dedupes candidate pairs on ids " +
       "before any vector-carrying join") {
    val qe = SparkEntry.queries("q40_embedding_pairs")(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString
    // the bucket self-join's output feeds an aggregate (the distinct)
    // whose grouping is just the two id columns — no embedding column
    // in any exchange below the vector joins
    assert(qe.contains("BroadcastHashJoin") || qe.contains("SortMergeJoin")
      || qe.contains("ShuffledHashJoin"), qe)
    assert("Exchange hashpartitioning\\(id_a#\\d+L, id_b#\\d+L".r
      .findFirstIn(qe).isDefined || qe.contains("HashAggregate(keys=[id_a"),
      qe)
  }

  test("q97: per-source cap plans as the two-phase bounded-heap TopK, " +
       "not a full-shuffle window") {
    val p = plan("q97_source_cap")
    assert(p.contains("TopKPartial") && p.contains("TopKFinal"), p)
    // the window formulation would appear as WindowExec over a full
    // row shuffle — the custom plan must have replaced it entirely
    assert(!p.contains("WindowExec"), p)
  }

  test("q101: table checksum is one scan into a partial+final " +
       "aggregate — no join, no window") {
    val p = plan("q101_table_checksum")
    assert(!p.contains("Join") && !p.contains("WindowExec"), p)
    assert(p.contains("partial"), p)
  }

  test("q104/q107: per-class sampling and heavy hitters run on the " +
       "two-phase TopK plan, never a window shuffle") {
    Seq("q104_balanced_sample", "q107_group_ngrams").foreach { q =>
      val p = plan(q)
      assert(p.contains("TopKPartial") && p.contains("TopKFinal"), s"$q\n$p")
      assert(!p.contains("WindowExec"), s"$q\n$p")
    }
  }

  test("q106: interval overlap joins on the bucket grid — hash join, " +
       "never a nested-loop cross product") {
    val p = plan("q106_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("q100: regex scrub is a pure per-row scan — zero hash " +
       "exchanges below the output sort") {
    val p = plan("q100_regex_scrub")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q120: attribution as-of join is the union+carry shape — no " +
       "range join, no cartesian, one window") {
    val p = plan("q120_attribution")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Union"), p)
    assert(p.contains("Window"), p)
  }

  test("q126/q127: per-class stats broadcast back into a per-row " +
       "pass — the corpus never sort-merge joins") {
    for (q <- Seq("q126_outlier_exact", "q127_group_bins")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
    }
  }

  test("q129: TWAP is one lead-window pass — no join, no collect") {
    val p = plan("q129_twap")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q130: activity bitmaps are two chained aggregates — no join, " +
       "partial combine map-side") {
    val p = plan("q130_activity_bitmap")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial"), p)
  }

  test("q131: bootstrap weights are per-row expressions — no join, " +
       "no window, one aggregate over the exploded replicates") {
    val p = plan("q131_poisson_bootstrap")
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("Generate"), p)
    assert(p.contains("partial"), p)
  }

  test("q145: interpolation is one lead window + its own-span " +
       "Generate — no dense-grid join after the generate") {
    val p = plan("q145_interpolate")
    assert(p.contains("Generate"), p)
    assert(p.contains("Window"), p)
    // the generated grid must not be joined back to anything
    assert(!p.contains("SortMergeJoin") && !p.contains("HashJoin"), p)
  }

  test("q148: exactly-k weighted sample plans as TakeOrdered — " +
       "bounded per-task heap, no global sort, no shuffle of the " +
       "corpus") {
    val p = plan("q148_aes_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange") || p.contains("TakeOrdered"), p)
  }

  test("q144: triangle counting carries no cartesian or " +
       "nested-loop join — all equi-joins on narrow int pairs") {
    val p = plan("q144_triangles")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("q146: spearman's two rank windows share one partitioning " +
       "on the group key") {
    val p = plan("q146_spearman")
    val exchanges = "Exchange".r.findAllIn(p).length
    // one hash exchange for the windows (+AQE reads); the aggregate
    // reuses it; final orderBy adds a range exchange
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
  }

  test("q177: seven-relation star resolves every dimension as a " +
       "broadcast join — no sort-merge join anywhere") {
    val p = plan("q177_market_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q175: PQ encoding never shuffles the corpus before the " +
       "final code aggregate") {
    val p = plan("q175_pq_encode")
    // one broadcast (the codebook row); corpus-side exchanges are
    // only the final groupBy(pq_code) + orderBy
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    val exchanges = "Exchange hash".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges\n$p")
  }

  test("q178: ADC search ranks on the bounded-heap TopKPerKey plan " +
       "with the corpus never hash-exchanged") {
    val p = plan("q178_adc_search")
    assert(p.contains("TopKPartial") && p.contains("TopKFinal"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q200: item counts and the order total join in as broadcasts " +
       "— only the basket self-join shuffles") {
    val p = plan("q200_assoc_rules")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q204: gram-matrix explode partial-aggregates below the " +
       "exchange — the shuffle carries cells, not pixels") {
    val p = plan("q204_gram_matrix")
    assert(p.contains("partial"), p)
    val exchanges = "Exchange hash".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges\n$p")
  }

  test("q210: skyline dominance resolves as a broadcast semi-join " +
       "and windows only over __pid partitions — no cartesian, no " +
       "corpus-global window") {
    val p = plan("q210_skyline")
    assert(!p.contains("CartesianProduct"), p)
    // the input survives through one broadcast LeftSemi against the
    // per-cost winners (the only BNLJ allowed is the ≤32-row pid
    // prefix triangle, which never touches input rows)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Window [") ||
      p.contains("windowspecdefinition(__pid"), p)
  }

  test("q218: neighbor pairs resolve through an equi-join on cell " +
       "coordinates — no distance cross-join anywhere") {
    val p = plan("q218_point_neighbors")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q192: nearest join is ONE exchange on user_id with both " +
       "direction sorts inside it") {
    val p = plan("q192_nearest_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }

  test("q217: ring segments broadcast-HASH-join keys on the coarse " +
       "bucket — no interpreted lambda over the ring in the per-key " +
       "path, no sort-merge, no cartesian") {
    val p2 = plan("q217_hash_ring")
    assert(p2.contains("BroadcastHashJoin"), p2)
    // (the 10×64 virtual-node cross on the 640-row dimension side is
    // a legitimate BNLJ; only the fact-side join shape matters)
    assert(!p2.contains("SortMergeJoin") &&
      !p2.contains("CartesianProduct"), p2)
    // the round-4 pathology: a per-row HOF scan of the 640-entry ring
    assert(!p2.toLowerCase.contains("lambdafunction"), p2)
  }

  test("q127: grouped exact percentiles scan events once per PASS " +
       "(sketch, boundary, binning) — never once per probe " +
       "percentile") {
    val p = plan("q127_group_bins")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 3, s"expected <=3 event scans, got $scans\n$p")
  }

  test("q238: k-anonymity rolls up at class grain — one corpus " +
       "shuffle to the QI tuple, the per-k pass is class-sized") {
    val p = plan("q238_k_anonymity")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges\n$p")
  }

  test("q239: PMI pair generation is df-pruned and per-doc; the " +
       "word-count joins broadcast the eligible band") {
    val p = plan("q239_pmi_collocations")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("q240: waterfilling windows run on the source dimension — " +
       "the corpus contributes one source-grain aggregate only") {
    val p = plan("q240_waterfill")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges\n$p")
  }

  test("q228: count-min estimates join the 512-row sketch as a " +
       "broadcast; the corpus shuffles once to key grain") {
    val p = plan("q228_countmin")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges\n$p")
  }

  test("q235: FIFO allocation — the lot table broadcasts into the " +
       "overlap join; the demand window is the only corpus exchange") {
    val p = plan("q235_fifo_alloc")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }

  test("q232: chunking stays a per-row Generate; the occurrence " +
       "join-back is never a cartesian") {
    val p = plan("q232_chunk_dedup")
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q236: per-source top-k runs on the bounded-heap TopK plan " +
       "once (pinned), never a vocabulary-wide window") {
    val p = plan("q236_hill_tail")
    // the pinned checkpoint means the visible plan reads the TopK
    // result as a scan; no ranking window may appear downstream
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q246: Adamic-Adar wedge join is equi on mid with the weight " +
       "table riding it — no cartesian, no global window") {
    val p = plan("q246_adamic_adar")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q249: DSIR bucket LM rides as a broadcast into the doc-grain " +
       "scan; no fact-sized sort-merge") {
    val p = plan("q249_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q250: month-grain allocation is a Generate + one aggregate — " +
       "no window, no cartesian, and the explode is month-sized") {
    val p = plan("q250_ship_allocation")
    assert(p.contains("Generate"), p)
    assert(!p.contains("windowspecdefinition") &&
      !p.contains("CartesianProduct"), p)
    // month arithmetic must stay on DateType (int ops), never
    // round-trip through zone-aware timestamps in the hot path
    assert(p.contains("sequence(trunc("), p)
  }

  test("q251: both snapshot sides fold to 256-leaf aggregates before " +
       "the diff join — the full-outer runs at leaf grain") {
    val p = plan("q251_merkle_diff")
    assert(!p.contains("CartesianProduct"), p)
    // the leaf-grain full outer join may be broadcast or shuffled —
    // but never a fact-sized sort-merge on the row tables (rows fold
    // map-side via partial bit_xor first)
    assert(p.contains("partial_bit_xor") || p.contains("partial"), p)
  }

  test("q255: density-cluster adjacency is a 9-probe equi-join on " +
       "cell coords, never a non-equi neighbor join") {
    val p = plan("q255_density_clusters")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q256: band migration is two user-grain aggregates and one " +
       "join — no global rank window anywhere") {
    val p = plan("q256_spend_migration")
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q257: edge-Jaccard wedges stay equi-joined on mid over the " +
       "hub-pruned backbone; ranking is bounded top-k") {
    val p = plan("q257_edge_jaccard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q258: linkage candidates come from a block equi-join and the " +
       "argmax is a hash aggregate — no sort of the scored pair set") {
    val p = plan("q258_jw_linkage")
    assert(!p.contains("CartesianProduct"), p)
    // the scorer is the native codegen expression, not a UDF
    assert(p.contains("jarowinklere6") || p.contains("JaroWinklerE6"), p)
    // best-candidate selection is aggregate-shaped (map-side combine),
    // not a row_number window over every scored pair
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q259: Theil-Sen pairs are generated from the DAY-grain " +
       "aggregate (equi-join on the group key), never the fact table") {
    val p = plan("q259_theil_sen")
    assert(!p.contains("CartesianProduct"), p)
    // both self-join branches sit above an aggregate of the scan
    assert(p.contains("HashAggregate"), p)
  }

  test("q260: Mann-Whitney runs on per-value counts — one fact scan, " +
       "window over the distinct-value axis only") {
    val p = plan("q260_mann_whitney")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("q261: chi-square margins ride as broadcasts over the pinned " +
       "cell aggregate — the fact table is never rescanned") {
    val p = plan("q261_chi_square")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    // cells is localCheckpointed: margins derive from the checkpoint,
    // so no parquet scan appears anywhere in this plan
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected margins over the checkpoint, " +
      s"got $scans parquet scans\n$p")
  }

  test("q264: Kendall pairs come from the bounded 150-row sample " +
       "(row_number cap), joined equi on the cohort key") {
    val p = plan("q264_kendall_tau")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition"), p) // the sample cap
  }

  test("q272: the 35-row policy rides as a broadcast into the eval " +
       "scan; both period scans carry pushed date filters") {
    val p = plan("q272_bandit_replay")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q273: conformal split runs entirely on the pinned week-grain " +
       "aggregate — no parquet rescan after the checkpoint") {
    val p = plan("q273_conformal")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
  }

  test("q274: Kaplan-Meier is one events scan to user grain; the " +
       "curve windows run on the <=31-row lifetime aggregate") {
    val p = plan("q274_kaplan_meier")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("Join"), p) // curve is aggregates + windows only
  }

  test("q265: stay-points are one window pass + one aggregate over a " +
       "single events scan") {
    val p = plan("q265_staypoints")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q275: both NDCG rankings and the gain aggregate share ONE " +
       "user_id partitioning — a single exchange over one events scan") {
    val p = plan("q275_ndcg")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected one user_id shuffle, got $shuffles\n$p")
    assert(!p.contains("Join"), p) // weight table is an array literal
  }

  test("q279: KMV rank window and the per-type aggregate share one " +
       "event_type partitioning over a single events scan — no joins") {
    val p = plan("q279_kmv_sketch")
    assert(!p.contains("Join"), p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("q280: EWMA range-join runs entirely on the pinned day-grain " +
       "aggregate — no parquet rescan after the checkpoint") {
    val p = plan("q280_ewma")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q281: negative candidates equi-join the corpus hash-to-hash " +
       "(no corpus broadcast); the size scalar is the only broadcast") {
    val p = plan("q281_negative_sampling")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // the 1-row n_docs scalar
  }

  test("q283: MMR greedy steps run entirely on the pinned candidate " +
       "table — no corpus rescan, no cartesian") {
    val p = plan("q283_mmr_rerank")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q284: attribution value-iteration and shares run on the " +
       "pinned 5-row scenario frame — no fact rescan, no sort-merge") {
    val p = plan("q284_markov_attribution")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q285: WOE buckets come off one pinned aggregate; the bucket " +
       "totals ride as a broadcast") {
    val p = plan("q285_woe_iv")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q286: Bloom membership is an equi-join on bit position — " +
       "never a cartesian; the filter build is bounded by m") {
    val p = plan("q286_bloom_fpr")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning") || p.contains("BroadcastHashJoin"),
      p)
  }

  test("q287: theta set-ops run on the pinned distinct-visit table — " +
       "one scan behind the checkpoint, no joins at fact size") {
    val p = plan("q287_theta_setops")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q288: ABC/XYZ classifies on the pinned part aggregate; the " +
       "revenue total rides as a broadcast") {
    val p = plan("q288_abc_xyz")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q289: permutation expansion runs on the pinned user grain " +
       "with the 200-row perm table broadcast — never on events") {
    val p = plan("q289_permutation_test")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
  }

  test("q290: pattern census joins events to the pinned session pivot " +
       "on (user, day) — no cartesian; one events scan") {
    val p = plan("q290_seq_patterns")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q291: uplift deciles run on the pinned user-grain aggregate " +
       "with the user-count scalar broadcast — no events rescan") {
    val p = plan("q291_uplift_deciles")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
  }

  test("q292: every walk hop broadcasts the walker frontier against " +
       "the pinned adjacency — no cartesian, no sort-merge") {
    val p = plan("q292_random_walks")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
  }

  test("q293: covariate balance is one events scan to user grain; " +
       "the 3-covariate melt joins nothing") {
    val p = plan("q293_covariate_balance")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q294: judge kappa is a single-aggregate single-scan plan") {
    val p = plan("q294_judge_kappa")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one documents scan, got $scans\n$p")
    assert(!p.contains("Join") && p.contains("partial"), p)
  }

  test("q295: reconciliation runs on the pinned month slice; the " +
       "region aggregates ride as broadcasts") {
    val p = plan("q295_forecast_reconcile")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"expected checkpoint-only plan, got $scans\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q296: burn-rate alerting is one events scan to hour grain; " +
       "the 6h frame runs on the hourly aggregate") {
    val p = plan("q296_slo_burn")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q297: encoding advisor totals come from the <=40-row bit " +
       "histogram window, not a second fact scan") {
    val p = plan("q297_encoding_advisor")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q282: fold audit is one fact scan, partial+final aggregate, " +
       "then windows on the 25-row grain") {
    val p = plan("q282_fold_balance")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one orders scan, got $scans\n$p")
    assert(p.contains("partial"), p)
    assert(!p.contains("Join"), p)
  }

  // windowspecdefinition's first argument is the partition spec; an
  // unpartitioned window starts straight with the sort order, so
  // "every spec mentions <col>" asserts no single-task window exists
  private def windowSpecs(p: String): Seq[String] =
    "windowspecdefinition\\(([^,]+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq

  test("q298: skew lint is pure union-of-aggregates — no join, " +
       "map-side combinable to key grain") {
    val p = plan("q298_skew_lint")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial"), p)
  }

  test("q299: rollup is ONE Expand aggregate pass, dims broadcast") {
    val p = plan("q299_rollup_revenue")
    assert(p.contains("Expand"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q300: weighted median — the only window is globalCumSum's " +
       "pid-partitioned running sum, never a per-segment funnel") {
    val p = plan("q300_weighted_median")
    val specs = windowSpecs(p)
    assert(specs.nonEmpty && specs.forall(_.contains("__gc_pid")),
      s"window specs: $specs\n$p")
  }

  test("q302: pruning audit ranks through globalRank — no window " +
       "at all in the plan") {
    val p = plan("q302_minmax_pruning")
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q303: bot screen windows partition by user; final ordering " +
       "is a bounded TakeOrdered, not a global sort") {
    val p = plan("q303_bot_regularity")
    assert(p.contains("TakeOrderedAndProject"), p)
    val specs = windowSpecs(p)
    assert(specs.forall(_.contains("user_id")), s"$specs")
  }

  test("q307: CUSUM cum-sum routes through globalCumSum (pid-" +
       "partitioned window only); argmax is a 1-row aggregate") {
    val p = plan("q307_cusum_changepoint")
    val specs = windowSpecs(p)
    assert(specs.forall(_.contains("__gc_pid")), s"$specs")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q308: lag joins run on the pinned hourly aggregate — no " +
       "events rescan, no cartesian beyond the 7-row lag broadcast") {
    val p = plan("q308_xcorr_lag")
    assert("Scan parquet".r.findAllIn(p).length == 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q312: the only window is globalCumMax's pid-partitioned " +
       "running max (behind the lateness pin) — the arrival log " +
       "never funnels into one task") {
    val p = plan("q312_watermark_advisor")
    // final plan reads the pinned lateness table: any window visible
    // here must be the pid-partitioned one; the candidate scoring
    // itself is scan- and window-free
    val specs = windowSpecs(p)
    assert(specs.forall(_.contains("__gm_pid")), s"window specs: $specs")
    assert("Scan parquet".r.findAllIn(p).length == 0, p)
  }

  test("q314: t-closeness cumulates per class — every window " +
       "partitions by the quasi-identifier, bins ride as broadcast") {
    val p = plan("q314_t_closeness")
    val specs = windowSpecs(p)
    assert(specs.nonEmpty && specs.forall(_.contains("event_type")),
      s"window specs: $specs")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q315: heavy-hitter cut is a bounded TakeOrdered on the " +
       "pinned key-count table — one lineitem scan total") {
    val p = plan("q315_join_card_estimate")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("Scan parquet".r.findAllIn(p).length == 0, p)
  }

  test("q291: no Window anywhere — deciles route through " +
       "Curate.globalRank (range repartition + offsets)") {
    val p = plan("q291_uplift_deciles")
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
  }

  test("q328: PII scrub is one scan + one hash aggregate — no join, " +
       "no window, nothing that shuffles more than 20 source rows") {
    val p = plan("q328_pii_redaction")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q329: memorization index joins on the gram key only — no " +
       "cartesian/broadcast-nested-loop, no window") {
    val p = plan("q329_memorization_13gram")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q330: sliding distinct is a bounded explode + aggregates — " +
       "no window funnel, no cartesian") {
    val p = plan("q330_rolling_active_users")
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q331: leak audit's 1-row count is broadcast onto the 3-row " +
       "rollup; no window") {
    val p = plan("q331_leakage_safe_splits")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q332: co-purchase pairs equi-join on the order key; readout " +
       "is a bounded TakeOrdered, not a global sort") {
    val p = plan("q332_copurchase_lift")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q333: backfill plan is one conditional aggregate under a " +
       "broadcast scalar — no window, no shuffle join") {
    val p = plan("q333_backfill_planner")
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q334: deletion audit joins lineitem to orders on the order " +
       "key only — no cartesian, no window") {
    val p = plan("q334_deletion_impact")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q335: OOF encoding re-joins the 25-cell grain broadcast — " +
       "no shuffle join, no window") {
    val p = plan("q335_oof_target_encoding")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q341: churn labels are one conditional user-grain aggregate " +
       "— no join, no window (point-in-time by construction)") {
    val p = plan("q341_churn_labels")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q342: discount curve joins the 11-row band grain broadcast; " +
       "no window") {
    val p = plan("q342_discount_curve")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q339: prefix-cache audit is three grouped aggregates — no " +
       "join, no window") {
    val p = plan("q339_prefix_cache")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q340: bucket balance broadcasts the 1-row total onto the " +
       "band histogram; no window") {
    val p = plan("q340_bucket_balance")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q338: drift deciles route through globalRank — every window " +
       "is the pid-partitioned offset machinery, never a funnel") {
    val p = plan("q338_decile_drift")
    val specs = windowSpecs(p)
    assert(specs.forall(_.contains("__gc_pid")), s"$specs")
  }

  test("q337: attribution is one user-partitioned carry-forward " +
       "window — zero joins, no range self-join") {
    val p = plan("q337_lasttouch_attribution")
    assert(!p.contains("Join"), p)
    val specs = windowSpecs(p)
    assert(specs.nonEmpty && specs.forall(_.contains("user_id")), s"$specs")
  }

  test("q336: transition census marginal re-join is broadcast; the " +
       "user-partitioned window sits below the pin (source lint " +
       "guards its partitioning)") {
    val p = plan("q336_transition_census")
    // the lead() window is inside the pinned subtree, so the executed
    // plan above the checkpoint must carry NO window at all
    assert(windowSpecs(p).isEmpty, s"${windowSpecs(p)}")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Shift tier: global value-axis windows consume the POST-" +
       "AGGREGATION distinct-value table, never the raw corpus") {
    for (name <- Seq("q405_wasserstein", "q406_cvm_two_sample",
        "q407_energy_distance", "q409_kruskal_wallis",
        "q417_anderson_darling")) {
      val p = plan(name)
      val w = p.indexOf("Window")
      assert(w >= 0, s"$name: no Window in plan")
      // the window's input subtree (printed below it) must contain
      // the value-grain HashAggregate: the single-partition window
      // sees universe-bounded rows, not data-volume rows
      assert(p.indexOf("HashAggregate", w) > w,
        s"$name: Window is not fed by the distinct-value aggregate")
    }
  }

  test("Shift tier: pair-free constructions stay pair-free — no " +
       "CartesianProduct (grid/self/pair joins are equi-joins or " +
       "bounded broadcast crosses)") {
    for (name <- Seq("q419_friedman_kendall_w",
        "q423_jonckheere_terpstra", "q416_hodges_lehmann")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name grew a CartesianProduct")
    }
  }

  // Source lint, not a plan check: EVERY `Window.orderBy` without a
  // partitionBy in src/main must be either (a) inside the guarded
  // Curate.boundedRank helper (which raises at runtime past its
  // declared bound) or (b) on this allowlist with its bound written
  // down. A new unpartitioned window — the single-task funnel that
  // cost q59, q291 and q217 a round each — fails this test until it
  // is either routed through globalRank/globalCumSum/boundedRank or
  // consciously allowlisted here with the argument for its bound.
  test("source lint: unpartitioned Window.orderBy sites are guarded " +
       "or allowlisted with documented bounds") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val sites = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { f =>
        val rel = root.relativize(f).toString
        val src = scala.io.Source.fromFile(f.toFile, "UTF-8")
        try src.getLines().map(_.trim).filter(l =>
          l.contains("Window.orderBy") && !l.startsWith("//") &&
            !l.startsWith("*") && !l.contains("partitionBy"))
          .map(l => s"$rel :: $l").toList
        finally src.close()
      }.toSet
    val allow = Set(
      // the guarded helper itself — its bound is a runtime raise
      "graft/operators/Curate.scala :: val rn = row_number().over(Window.orderBy(sortCols: _*)).cast(\"long\")",
      // q296: 6h range frame over the HOURLY aggregate — bounded by
      // the retention window (720 rows/month), not data volume
      "graft/analytics/Metrics.scala :: val w6 = Window.orderBy(\"h\").rangeBetween(-5, 0)",
      // q267: cumulative sum over the 40-bin table (o_orderkey % 40)
      "graft/analytics/Robust.scala :: val w = Window.orderBy(\"bin\")",
      // q274: Kaplan–Meier curve over day-grain lifetimes — bounded
      // by the observation span in days
      "graft/analytics/Evaluation.scala :: val wT = Window.orderBy(\"lt\")",
      // q217: lag over the 640-row hash-ring bounds (10 shards × 64
      // vnodes, a literal construction)
      "graft/analytics/Curation.scala :: lag(col(\"bh\"), 1).over(Window.orderBy(col(\"bh\"))), lit(-1L)))",
      // 30-day range frame over the DAY-grain aggregate
      "graft/analytics/Advanced.scala :: val w = Window.orderBy(col(\"day\")).rangeBetween(-29, 0)",
      // q160: binned-ECDF cumulative window over the e1-rounded value
      // bins (~10^3–10^4 rows regardless of volume)
      "graft/analytics/Advanced.scala :: val w = org.apache.spark.sql.expressions.Window.orderBy(col(\"v\"))",
      // q240: waterfill boundary over the |sources| enumeration
      "graft/analytics/Governance.scala :: val w = Window.orderBy(col(\"cap\"), col(\"source\"))",
      // Shift tier (q405+): every use runs over a DISTINCT-VALUE
      // table (e2 cents universe / n_chars universe), a day-grain
      // table, or a (source × lang) hypothesis enumeration — bounded
      // by a domain/universe, never by data volume (the q160 binned-
      // ECDF argument, documented at the helper)
      "graft/analytics/Shift.scala :: private def axis(sort: Column*) = Window.orderBy(sort: _*)",
      // Mining tier (q434+): only ever applied to the day-pair grain
      // (≤ C(1000,2) rows, raise_error tripwire at 1000 days) —
      // bounded by the observation span, never by data volume
      "graft/analytics/Mining.scala :: private def axis(sort: Column*) = Window.orderBy(sort: _*)",
      // Refine tier (q490+): day grain (tripwired at 1000 days via
      // dayGuard), day-pair grain, or an e2 distinct-value universe
      // (~10^5 rows) — bounded by a span/universe, never data volume
      "graft/analytics/Refine.scala :: private def axis(sort: Column*) = Window.orderBy(sort: _*)")
    val unexpected = sites -- allow
    val stale = allow -- sites
    assert(unexpected.isEmpty,
      s"NEW unpartitioned Window.orderBy site(s) — route through " +
        s"Curate.globalRank/globalCumSum/boundedRank or allowlist " +
        s"with a documented bound:\n${unexpected.mkString("\n")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer in source (update the lint):\n" +
        stale.mkString("\n"))
  }

  test("q347: guaranteed heavy hitters — pass 1 aggregates to the " +
       "4096-bucket grain and candidates come back as a BROADCAST " +
       "(the full key grain is only aggregated on candidate-bucket " +
       "rows); no sort-merge join anywhere") {
    val p = plan("q347_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q352: the cascade sweep is ONE scan of documents crossed " +
       "with the broadcast 11-row grid — the threshold grain must " +
       "not re-scan the corpus") {
    val p = plan("q352_cascade_frontier")
    assert("Scan parquet".r.findAllIn(p).length <= 1, p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q353: CUPED's pooled theta broadcasts back onto the user " +
       "grain (1-row cross join), never a second events scan") {
    val p = plan("q353_cuped")
    assert("Scan parquet".r.findAllIn(p).length <= 1, p)
  }

  test("q356: the dim join plants a dynamic-pruning runtime filter " +
       "ON the DSv2 scan (SupportsRuntimeV2Filtering) — the scan " +
       "narrows to the dim's id set at execution, the connector " +
       "analogue of dynamic partition pruning") {
    val p = plan("q356_dsv2_runtime_filter")
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(p.contains("RuntimeFilters"), p)
  }

  test("q343: global COUNT/MIN/MAX collapse INSIDE the DSv2 source — " +
       "the plan is Project-over-BatchScan with PushedAggregates, " +
       "no aggregate operator, no exchange") {
    val p = plan("q343_dsv2_agg_pushdown")
    assert(p.contains("PushedAggregates"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q358: GROUP BY user_id pushes PARTIALLY into the DSv2 source " +
       "(supportCompletePushDown=false) — the BatchScan reports " +
       "PushedGroupBy and emits per-(partition,user) partials, and " +
       "Spark's finalize aggregate sits on top") {
    val p = plan("q358_dsv2_partial_agg")
    assert(p.contains("PushedGroupBy"), p)
    assert(p.contains("mode=partial"), p)
    // the finalize step must still exist — partial pushdown is a
    // split, not a collapse
    assert(p.contains("HashAggregate"), p)
  }

  test("q376: multi-key GROUP BY (user_id, event_type) with SUM pushes " +
       "PARTIALLY into the DSv2 source — the BatchScan reports both " +
       "group keys and the Sum aggregate, with the finalize on top") {
    val p = plan("q376_dsv2_multikey_sum")
    assert(p.contains("PushedGroupBy [user_id, event_type]"), p)
    assert(p.toUpperCase.contains("SUM"), p)
    assert(p.contains("mode=partial"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q401: ORDER BY event_id DESC LIMIT k pushes COMPLETELY into " +
       "the DSv2 source (SupportsPushDownTopN, isPartiallyPushed = " +
       "false) — no Sort, no TakeOrderedAndProject survives") {
    val p = plan("q401_dsv2_topn")
    assert(p.contains("PushedTopN"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort"), p)
  }

  test("q402: the DSv2 scan reports KeyGroupedPartitioning over its " +
       "per-user partitions — groupBy(user_id) with NON-pushable " +
       "aggregates runs with ZERO hash exchange (the only exchange " +
       "is the final ORDER BY's range partitioning)") {
    val p = plan("q402_dsv2_keygrouped")
    assert(p.contains("KeyGroupedBy [user_id]"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q403: reported partitioning composes with the pushed grouped " +
       "aggregate — per-user key-disjoint partitions fold their own " +
       "ids into ONE partial row each AND the finalize aggregate runs " +
       "with ZERO hash exchange (RestoreReportedPartitioningRule " +
       "re-binds the reported KeyGroupedPartitioning that Spark's " +
       "pushed-agg rewrite drops; the only exchange left is the final " +
       "ORDER BY's range partitioning)") {
    val p = plan("q403_dsv2_keygrouped_pushed")
    assert(p.contains("mode=partial+keygrouped"), p)
    assert(p.contains("PushedGroupBy [user_id]"), p)
    // the pushed partials must reach the aggregate pre-aggregated —
    // the scan, not a row-generating read, feeds the partial agg
    assert(p.contains("PushedAggregates [COUNT(*), SUM(event_id), " +
      "MIN(event_id), MAX(event_id)]"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  // Output-type parity lint (the round-6 q307 lesson): the
  // correctness driver hashes values AFTER fetching both engines'
  // results, and some types round-trip differently — Spark
  // `Decimal('x')` vs DuckDB HUGEINT→float64 `x.0` hash as UNEQUAL
  // even when numerically identical. So no final result column may
  // be DecimalType (decimals are for INTERMEDIATE overflow-safe
  // arithmetic only — cast back to BIGINT/DOUBLE with a bound guard
  // before the final select) and none may be FloatType (float32
  // formatting vs DuckDB's float64 is the same hazard). This sweeps
  // the ANALYZED schema of every gate query, so the q307 class
  // cannot reach the driver again.
  test("output-type parity lint: no final Decimal/Float column in " +
       "any gate query's result schema") {
    import org.apache.spark.sql.types.{DataType, ArrayType, MapType,
      StructType, DecimalType, FloatType}
    def offending(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(s"$path: $dt")
      case FloatType => Seq(s"$path: $dt")
      case ArrayType(et, _) => offending(et, s"$path[]")
      case MapType(kt, vt, _) =>
        offending(kt, s"$path.key") ++ offending(vt, s"$path.value")
      case st: StructType =>
        st.fields.toSeq.flatMap(f => offending(f.dataType,
          s"$path.${f.name}"))
      case _ => Nil
    }
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, TestSpark.sf001).schema
      schema.fields.toSeq.flatMap(f =>
        offending(f.dataType, s"$name.${f.name}"))
    }
    assert(bad.isEmpty,
      s"final Decimal/Float column(s) would hash-mismatch the oracle " +
        s"— cast to BIGINT/DOUBLE before the final select:\n" +
        bad.mkString("\n"))
  }

  test("q466: ORDER BY + OFFSET + LIMIT collapse COMPLETELY into " +
       "the DSv2 scan — the BatchScan reports PushedTopN AND " +
       "PushedOffset, and no Sort or GlobalLimit operator remains") {
    val p = plan("q466_dsv2_offset")
    assert(p.contains("PushedTopN"), p)
    assert(p.contains("PushedOffset 1000"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p)
  }

  test("q434: the Apriori pruning set joins BROADCAST (left-semi) " +
       "before the third item attaches, and nothing is a cartesian " +
       "— downward closure does its work in the physical plan") {
    val p = plan("q434_apriori_triples")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q445: Shapley reduces users to the PINNED ≤16-row mask grain " +
       "(no fact re-scan downstream); the subset lattice joins are " +
       "broadcast-only, no cartesian, no sort-merge") {
    val p = plan("q445_shapley_attribution")
    assert(!p.contains("FileScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q446: CMH's star join runs once into the PINNED stratum " +
       "grain — the pooled readout never re-runs the join") {
    val p = plan("q446_cmh_stratified")
    assert(!p.contains("FileScan"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q442: the Holt walk's single partition sits ABOVE the " +
       "PINNED day grain — only ≤1000 day rows funnel into the " +
       "sequential partition, never fact rows") {
    val p = plan("q442_holt_walk")
    assert(p.contains("SinglePartition"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("q447/q448: each reliability statistic is ONE documents scan " +
       "(the rater grain is pinned) with broadcast-only composition") {
    Seq("q447_icc_reliability", "q448_krippendorff_alpha").foreach {
      n =>
        val p = plan(n)
        assert(!p.contains("FileScan"), s"$n\n$p")
        assert(!p.contains("CartesianProduct"), s"$n\n$p")
        assert(!p.contains("SortMergeJoin"), s"$n\n$p")
    }
  }

  // ----- Learn tier: the distributed-training scale posture -----

  test("Learn tier: parameters broadcast, gradients reduce — the " +
       "perceptron/k-means/PCA iteration state joins BROADCAST onto " +
       "the data grain, never cartesian (data-grain equi-joins like " +
       "the per-point argmin may shuffle; that is the honest shape)") {
    Seq("q469_batch_perceptron", "q470_kmeans_lloyd", "q478_pca_power")
      .foreach { n =>
        val p = plan(n)
        assert(!p.contains("CartesianProduct"), s"$n\n$p")
      }
    // the perceptron never shuffles a join at all: its only joins are
    // the broadcast 1-row weight vector (BroadcastNestedLoop)
    assert(!plan("q469_batch_perceptron").contains("SortMergeJoin"))
    // the k-means/PCA per-pass state joins are hash-broadcast
    assert(plan("q470_kmeans_lloyd").contains("BroadcastHashJoin"))
    assert(plan("q478_pca_power").contains("BroadcastHashJoin"))
  }

  test("Learn tier: the NB/Rocchio vocabulary joins are broadcast " +
       "hash joins — the token scan is never shuffled against a " +
       "50-row vocab — and nothing is cartesian") {
    Seq("q467_naive_bayes", "q481_rocchio_tfidf").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n\n$p")
      assert(!p.contains("CartesianProduct"), s"$n\n$p")
    }
  }

  test("q473: grid-DBSCAN scans the embeddings source exactly once — " +
       "every later join (neighbor mass, core filter, CC) sits on the " +
       "cell grain, no cartesian anywhere") {
    // the query pins aggressively, so the final plan alone can't show
    // the scan count — capture every pre-checkpoint subtree too
    graft.core.PlanStats.enablePlanLog()
    val fin = try plan("q473_grid_dbscan")
              finally graft.core.PlanStats.disablePlanLog()
    val full = (graft.core.PlanStats.loggedPlans :+ fin).mkString("\n")
    // count physical scan nodes ("FileScan parquet" would match a
    // naive "Scan parquet" too — don't double-count)
    val scans = "FileScan".r.findAllIn(full).length +
      "BatchScan".r.findAllIn(full).length
    assert(scans == 1, s"scans=$scans\n$full")
    assert(!full.contains("CartesianProduct"), full)
  }

  test("q480: one (bucket x hour) cumulant table feeds all nine " +
       "learning-curve fits — at most the two intended event scans " +
       "(train grain + holdout axis) appear") {
    val p = plan("q480_learning_curve")
    val scans = "Scan parquet".r.findAllIn(p).length +
      "FileScan".r.findAllIn(p).length
    assert(scans <= 2, s"scans=$scans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
