"""Plan-shape regression tests: the scale properties (pushdown, pruning,
shuffle budget, join strategy, partial aggregation) asserted on the
physical plans of the headline queries. A change that silently loses a
pushed filter or adds a shuffle fails here, not at 100 TB."""

from __future__ import annotations

import pytest

from db_integration_via_kafka_ksql_spark.plans.audit import audit
from db_integration_via_kafka_ksql_spark.registry import all_queries


@pytest.fixture(scope="module")
def reports(spark, sf_dir):
    queries = all_queries()

    def build(name):
        return audit(queries[name](spark, sf_dir))

    return build


def test_q1_scan_pruned_and_pushed(reports):
    r = reports("q1_pricing_summary")
    scan = r.scans["lineitem"]
    # 7 columns of 17 — projection pruning reached the scan
    assert len(scan.read_columns) == 7
    assert any("l_shipdate" in f for f in scan.pushed_filters)
    # partial agg + exactly one shuffle for the groupBy
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_q3_topk_never_global_sorts(reports):
    r = reports("q3_shipping_priority")
    assert r.take_ordered  # LIMIT k via TakeOrderedAndProject, no full sort
    for t in ("customer", "orders", "lineitem"):
        assert r.scans[t].pushed_filters, f"{t} scan lost its pushed filter"


def test_q5_small_dims_broadcast(reports):
    r = reports("q5_local_supplier_volume")
    # region+nation are explicitly broadcast; no shuffle for those joins
    assert r.n_broadcast_exchanges >= 1
    assert r.scans["region"].pushed_filters  # r_name = 'ASIA' reached the scan


def test_compact_latest_partial_agg_before_shuffle(reports):
    r = reports("cdc_compact_latest")
    # THE scale property of the CDC core: per-partition combine first,
    # then exactly one key-hash shuffle carrying <=1 row per key/partition
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_topk_global_is_take_ordered(reports):
    r = reports("topk_expensive_orders")
    assert r.take_ordered
    assert r.n_shuffle_exchanges == 0  # top-k needs no shuffle at all


def test_exact_dedup_single_shuffle(reports):
    r = reports("dedup_exact")
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_text_ops_are_scan_only(reports):
    # narrow maps: zero shuffles, zero joins — corpus-scan speed at any SF
    for name in (
        "text_token_stats",
        "text_quality_scores",
        "text_fingerprints",
        "text_chunk_windows",
    ):
        r = reports(name)
        assert r.n_exchanges == 0, f"{name} gained a shuffle"
        cols = r.scans["documents"].read_columns
        assert "text" in cols and len(cols) <= 3, f"{name} reads too much"


def test_brute_topk_broadcasts_queries(reports):
    r = reports("sim_brute_topk")
    # query set is broadcast; corpus side never shuffles before scoring
    assert r.n_broadcast_exchanges >= 1


def test_ivf_assignment_is_partial_agg_not_window(reports):
    # round-2 verdict's scale-killer: corpus→list assignment must be a
    # map-side-combined aggregate (~n rows to the exchange), never a
    # row_number window over the n x nlists cross product.
    r = reports("sim_centroid_assignment")
    assert r.has_partial_aggregate
    assert r.windows == 0, "centroid assignment regressed to a window argmin"

    r = reports("sim_ivf_topk")
    assert r.has_partial_aggregate
    # only the (|queries| x nlists) probe ranking and the final per-query
    # top-k may use windows — never the corpus assignment
    assert r.windows <= 2, "IVF corpus assignment regressed to a window argmin"


def test_star_join_all_dims_broadcast_single_shuffle(reports):
    """The star join's scale shape: every dimension (orders side included)
    broadcasts, so the fact table is scanned once and shuffled exactly
    once — for the final groupBy, never for a join."""
    r = reports("star_sales_by_region_segment")
    assert r.broadcast_hash_joins == 4
    assert r.sort_merge_joins == 0
    assert r.nested_loop_joins == 0
    assert r.n_shuffle_exchanges == 1
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        assert len(r.scans[t].read_columns) <= 3, f"{t} scan not pruned"


def test_asof_join_is_union_sort_window_not_join(reports):
    """As-of join compiles to union + single keyed shuffle + window —
    no join node at all, and in particular nothing quadratic."""
    r = reports("asof_join_events")
    assert r.n_shuffle_exchanges == 1
    assert r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins == 0
    assert r.windows == 1


def test_range_join_is_bucketed_equi_not_cartesian(reports):
    """The keyed point-in-interval join must stay a broadcast equi-join
    on the bucket key — a cartesian/nested-loop here explodes at scale."""
    r = reports("range_join_events_sessions")
    assert r.nested_loop_joins == 0
    assert r.broadcast_hash_joins == 1


def test_curation_composite_one_scan_two_shuffles(reports):
    """Corpus curation (quality filter → keep-one dedup → per-source
    stats) reads documents ONCE and shuffles twice (dedup key, then
    source key) — the min(struct) keep-one rides the aggregate, no
    join-back to the corpus."""
    for name in ("corpus_curation_stats", "training_mix_curated"):
        r = reports(name)
        assert list(r.scans) == ["documents"], name
        assert r.n_shuffle_exchanges == 2, name
        assert r.has_partial_aggregate, name
        assert r.broadcast_hash_joins + r.sort_merge_joins == 0, name


def test_embedding_pair_join_never_nested_loop(reports):
    """Multi-probe LSH pair generation joins on the band bucket —
    broadcast-hash on the (checkpointed) compact side, and never a
    nested-loop/cartesian fallback."""
    r = reports("dedup_embedding_pairs_lsh_mp")
    assert r.nested_loop_joins == 0
    assert r.broadcast_hash_joins == 1


def test_upsert_merge_is_partial_agg_no_window(reports):
    """Two-changelog merge compacts via max(struct) partial aggregation
    (map-side combine before each of its two key shuffles) — regression
    guard against the row_number-window formulation, which shuffles
    every version of every key."""
    r = reports("cdc_upsert_merge")
    assert r.has_partial_aggregate
    assert r.windows == 0
    assert r.n_shuffle_exchanges == 2


def test_repetition_partial_agg_no_joins(reports):
    """Repetition stats: gram counting is partial-aggregated map-side
    before its shuffle; no join anywhere; only the explicit-parallelism
    round-robin + two uniform-key agg shuffles."""
    r = reports("text_repetition_scores")
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 3
    assert r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins == 0
    assert len(r.scans["documents"].read_columns) == 2  # doc_id + text only


def test_decontam_bench_grams_broadcast(reports):
    """Decontamination: the benchmark gram set and the per-doc overlap
    counts are both broadcast — corpus rows are never shuffled by gram
    (hot n-grams cannot skew the plan)."""
    r = reports("decontam_ngram_overlap")
    assert r.broadcast_hash_joins == 2  # left-semi vs bench + final left join
    assert r.sort_merge_joins == 0
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges <= 2  # bench-gram distinct + per-doc count


def test_events_hourly_scan_pruned_single_shuffle(reports):
    """Hour-bucket agg: the scan must read only (ts, event_type, value) —
    the epoch-micros derivation stays a projection, never widens the
    scan — with map-side partial aggregation and exactly one exchange."""
    r = reports("events_hourly_counts")
    scan = r.scans["events"]
    assert len(scan.read_columns) == 3
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1
    assert r.windows == 0


def test_ngram_jaccard_size_prune_inside_join(reports):
    """The size-ratio prune (jaccard <= min(sz)/max(sz)) must stay a join
    predicate so incompatible pairs die BEFORE the intersection groupBy;
    losing it to a post-aggregation filter silently restores the full
    sum(df(g)^2) aggregate input at scale."""
    r = reports("dedup_ngram_jaccard_capped")
    # join condition carries both ratio bounds on the shingle-set sizes
    join_nodes = [
        seg
        for seg in r.plan_text.split("\n\n")
        if "Join" in seg.split("\n")[0] and "doc_id" in seg
    ]
    assert any(seg.count("sz") >= 2 and "0.2" in seg for seg in join_nodes), (
        "size-ratio predicates missing from the inverted-index self-join"
    )
    assert r.nested_loop_joins == 0
    # the set sizes ride through the intersection groupBy as first(sz), and
    # the df-cap anti-join runs once inside the eager checkpoint of the
    # capped index — the visible plan holds exactly ONE join (the
    # inverted-index self-join). More means either the post-aggregate
    # size-joins (two corpus-sized shuffles) or the duplicated
    # hot-list-aggregate-per-side shape crept back in.
    total_joins = (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins
    )
    assert total_joins == 1, (
        f"expected 1 join (the inverted-index self-join), saw {total_joins}"
    )


def test_seq_packing_single_shard_shuffle(reports):
    """Sequence packing: exactly one shuffle (the shard-keyed window);
    nothing else moves data."""
    r = reports("seq_packing_offsets")
    assert r.windows == 1
    assert r.n_shuffle_exchanges == 1
    assert r.n_broadcast_exchanges == 0
    assert len(r.scans["documents"].read_columns) == 3


def test_keep_best_quality_partial_agg_no_window(reports):
    """Retention-policy argmax must be a struct-max aggregate (map-side
    combine, one key shuffle) — never the row_number-window formulation,
    which shuffles every member of every cluster."""
    r = reports("dedup_keep_best_quality")
    assert r.has_partial_aggregate
    assert r.windows == 0
    assert r.n_shuffle_exchanges == 1
    assert len(r.scans["documents"].read_columns) == 2  # doc_id + text


def test_mixture_planner_single_corpus_agg(reports):
    """Water-fill planning: ONE partial-aggregated corpus shuffle reduces
    the scan to #strata rows; the windows that compute the level run on
    that tiny frame only (single-partition exchange), and the scan reads
    just (source, text)."""
    r = reports("mixture_token_budget")
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges <= 2  # corpus agg + tiny-frame window
    assert len(r.scans["documents"].read_columns) == 2


def test_mixture_realized_broadcasts_plan(reports):
    """Plan realization: the plan side of the sampler join and the final
    accounting join are both broadcast (tiny frames — never shuffle the
    corpus by plan keys), and the checkpointed plan keeps the corpus
    planning aggregate to a single pass."""
    r = reports("mixture_realized_tokens")
    assert r.n_broadcast_exchanges >= 1
    assert r.sort_merge_joins == 0
    # doc_id (hash bucket) + text + source — nothing else reaches the scan
    assert len(r.scans["documents"].read_columns) == 3


def test_pii_scrub_is_scan_only(reports):
    """PII scrub: pure scan-side column math — zero exchanges of any
    kind, three columns read."""
    r = reports("pii_scrub_contacts")
    assert r.n_exchanges == 0
    assert len(r.scans["customer"].read_columns) == 3


def test_duplicate_spans_shuffles_hashes_not_strings(reports):
    """The windowed-fingerprint dedup must move 8-byte hashes through
    every exchange, never the window strings — and keep the occurrence
    count partial (map-side combined) so hot boilerplate can't skew."""
    import re

    r = reports("text_duplicate_spans")
    assert r.has_partial_aggregate
    assert r.windows == 1  # one doc-keyed interval-merge window
    hash_parts = re.findall(r"hashpartitioning\([^)]*\)", r.plan_text)
    assert hash_parts, "expected shuffle exchanges"
    for part in hash_parts:
        assert "gram" not in part, part


def test_interval_join_is_keyed_equi_join_not_cartesian(reports):
    """The WITHIN-join batch twin must plan as a key-partitioned equi-join
    with the time range as a post-filter — never a nested-loop/cartesian
    over the event stream."""
    r = reports("interval_join_clicks_purchases")
    assert r.nested_loop_joins == 0
    assert r.sort_merge_joins + r.broadcast_hash_joins >= 1
    assert "user_id" in r.plan_text


def test_kmeans_assignment_scan_side_single_shuffle(reports):
    """Lloyd's assignment must be a pure projection over literal
    centroids: the cluster profile's only exchange is the final
    map-side-combined groupBy — no join against a centroid table, no
    window argmin over the n x k cross product. (The round-robin spread
    of the tiny scan is allowed — it carries raw rows, not pair/cross
    rows; the only KEYED exchange is the k-row aggregate.)"""
    import re

    r = reports("kmeans_cluster_sizes")
    keyed = re.findall(r"hashpartitioning\([^)]*\)", r.plan_text)
    assert len(keyed) == 1 and "cluster" in keyed[0], keyed
    assert r.n_shuffle_exchanges <= 2  # round-robin spread + groupBy
    assert r.n_broadcast_exchanges == 0
    assert r.windows == 0
    assert r.sort_merge_joins + r.broadcast_hash_joins + r.nested_loop_joins == 0
    assert r.has_partial_aggregate


def test_semdedup_pair_join_is_cluster_equi_not_cartesian(reports):
    """The SemDeDup candidate stage must equi-join on the cluster id
    (pair space bounded by cluster occupancy) — never a nested-loop over
    the corpus."""
    r = reports("semdedup_pairs")
    assert r.nested_loop_joins == 0
    assert r.sort_merge_joins + r.broadcast_hash_joins >= 1
    assert "cluster" in r.plan_text


def test_bpe_counts_aggregate_word_frame_take_ordered(reports):
    """BPE pair counting must reduce the corpus to the distinct-word
    frame first (map-side-combined aggregate), count pairs with a second
    partial aggregate, and take the top-k as a TakeOrdered — never a
    global sort of the pair table."""
    r = reports("vocab_top_merge_pairs")
    assert r.has_partial_aggregate
    assert r.take_ordered
    assert r.n_shuffle_exchanges <= 3  # word agg + pair agg (+ limit-1 window)
    assert r.sort_merge_joins + r.broadcast_hash_joins + r.nested_loop_joins == 0


def test_source_overlap_has_no_gram_self_join(reports):
    """The contamination matrix must build pairs from each gram's bounded
    source list — a gram-keyed self-join (quadratic in document frequency)
    is the plan this operator exists to avoid."""
    r = reports("source_overlap_shared_grams")
    assert r.sort_merge_joins + r.broadcast_hash_joins + r.nested_loop_joins == 0
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges <= 4  # spread + distinct + gram agg + pair count


def test_simhash_pairs_materialized_band_frame(reports):
    """The simhash band self-join must consume ONE materialized band
    frame — an un-checkpointed frame re-runs the 16-bit md5-vote fold
    and its spread shuffle once per consumer (6 exchanges; now 2 + the
    broadcast)."""
    r = reports("dedup_simhash_pairs")
    assert r.n_shuffle_exchanges <= 3
    assert r.nested_loop_joins == 0


def test_ivf_pq_lists_stay_scan_side(reports):
    """IVF-PQ's scale shape: the coarse assignment and PQ encode are
    scan-side projections (literal codewords — materialized behind the
    lists frame, never a corpus join). Since the r14 serve pruning, the
    ADC scoring + shortlist ranking run EAGERLY behind a checkpoint (so
    their probed-lists scan can be collected and pushed as an isin /
    PartitionFilter), leaving the visible plan as: pruned q rescore scan
    + broadcast shortlist + broadcast queries + ONE final top-k window —
    never a corpus-sized window, never a shuffled corpus join."""
    r = reports("sim_ivf_pq_topk")
    assert r.windows <= 3, "a corpus-sized window crept into IVF-PQ"
    assert r.n_broadcast_exchanges >= 2
    assert r.sort_merge_joins == 0


def test_lm_fluency_model_joins_are_gram_keyed(reports):
    """The LM scorer's scale contract: the bigram/unigram model frames
    join the doc bigrams by GRAM KEY (broadcast at this sf, hash-equi
    at scale) — never a corpus self-join; the vocabulary size rides a
    single-row broadcast (the one annotated NLJ); every count aggregate
    combines map-side; no windows anywhere."""
    r = reports("text_lm_fluency")
    assert r.windows == 0
    assert r.has_partial_aggregate
    assert r.nested_loop_joins == 1  # doc_bi x |1-row V| only (NLJ_NOTES)
    assert r.sort_merge_joins + r.broadcast_hash_joins >= 3  # cb, cu, doc join-back


def test_cut_span_removal_no_token_explode_join(reports):
    """The applied dedup step's scale contract: the expensive span
    machinery stays behind the matches checkpoint; live plan = the two
    island windows, the span-array aggregation (map-side combined), and
    ONE doc_id-keyed join back to the corpus — the cut itself is a
    scan-side array filter, so there is never a token-level join or a
    corpus-wide window."""
    r = reports("text_cut_span_removal")
    assert r.nested_loop_joins == 0
    assert r.windows == 2  # the island passes only
    assert (r.broadcast_hash_joins + r.sort_merge_joins) == 1  # join-back
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges <= 4


def test_quality_perceptron_scoring_stays_scan_side(reports):
    """The classifier's scale contract: scoring is a pure scan-side
    pipeline — hashed-bucket features with the (dim+1)-int weight vector
    inlined as a literal, one map-side-combined per-doc aggregate, no
    joins and no windows anywhere (training's per-epoch collect is the
    <=dim+1-row update vector, outside this plan)."""
    r = reports("text_quality_perceptron")
    assert r.has_partial_aggregate
    assert r.windows == 0
    assert r.nested_loop_joins == 0
    assert (r.broadcast_hash_joins + r.sort_merge_joins) == 0
    assert r.n_shuffle_exchanges == 2  # feature count + per-doc margin


def test_ngram_novelty_no_pairwise_join(reports):
    """Novelty's scale contract: the gram-sized inverted index is never
    self-joined (no pair blow-up — unlike the dedup pair generators);
    the only join assembles two doc-sized count frames, and both
    aggregates combine map-side."""
    r = reports("text_ngram_novelty")
    assert r.has_partial_aggregate
    assert r.windows == 0
    assert r.nested_loop_joins == 0
    # one doc-sized assembly join only
    assert (r.broadcast_hash_joins + r.sort_merge_joins) <= 1


def test_winnowing_single_doc_window_no_joins(reports):
    """Winnowing's scale contract: one window partitioned BY DOC (frames
    are document-sized, never corpus-wide) with the rightmost-tie
    position riding the min(struct) — no argmax join-back, no joins at
    all in the live plan."""
    r = reports("text_winnowing_fingerprints")
    assert r.windows == 1
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins
    ) == 0


def test_winnowing_pairs_join_on_sketch_only(reports):
    """The overlap join runs on the capped SKETCH inverted index: one
    fp-equi pair join plus the cap anti-join — never a gram-set or
    corpus self-join; pair counts combine map-side."""
    r = reports("text_winnowing_overlap_pairs")
    assert r.has_partial_aggregate
    assert r.nested_loop_joins == 0
    assert r.windows == 0  # selection is materialized behind the sketch


def test_inter_arrival_single_user_exchange(reports):
    """The LAG rollup's scale shape: the per-user window and the
    per-user aggregate share ONE user-keyed exchange (Catalyst reuses
    the window's hash partitioning for the groupBy), the aggregate
    still combines map-side, and the events scan reads only the three
    columns the frame needs."""
    r = reports("events_inter_arrival_stats")
    assert r.n_shuffle_exchanges == 1
    assert r.windows == 1
    assert r.has_partial_aggregate
    assert len(r.scans["events"].read_columns) == 3


def test_duplicate_cut_spans_equi_pair_join_no_nlj(reports):
    """Exact substring-dedup's scale contract: the expensive subtree
    (gram explode -> eligibility semi-join -> equi pair join on the
    8-byte hash -> diagonal-run window) is MATERIALIZED once via
    localCheckpoint before the side_a/side_b union, so the visible plan
    is only the post-checkpoint interval union: zero joins of any kind
    (in particular no nested-loop/cartesian and no second copy of the
    pair join), the unique-span pre-aggregation combines map-side, and
    the two per-doc island window passes — nothing corpus-wide."""
    r = reports("text_duplicate_cut_spans")
    assert r.nested_loop_joins == 0
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins
    ) == 0  # the pair join ran exactly once, behind the checkpoint
    assert r.has_partial_aggregate
    assert r.windows == 2  # the two island passes; diagonal runs checkpointed
    assert r.n_shuffle_exchanges == 2  # span pre-agg + doc_id island window


def test_hll_register_agg_combines_map_side(reports):
    """HLL's scale contract: the register build is a partially-aggregated
    groupBy (each input partition emits <= m rows per group before the
    shuffle), and the exact-count companion joins by broadcast — four
    hash exchanges total (registers, estimate rollup, and the two-phase
    distinct), none carrying raw events."""
    r = reports("sketch_hll_distinct_users")
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 4
    assert r.n_broadcast_exchanges >= 1


def test_kmv_overlap_sketch_built_once(reports):
    """The k-min sketch feeds three plan branches (group list + both pair
    sides); the eager localCheckpoint means the distinct+rank subtree over
    the raw token stream appears ONCE — the visible plan has a single
    window (the union-sketch rank), not one per branch."""
    r = reports("sketch_kmv_source_token_overlap")
    assert r.windows == 1
    assert r.n_shuffle_exchanges <= 4


def test_cms_counter_grid_partial_agg_probe_broadcast(reports):
    """Count-Min's scale contract: the counter grid groupBy combines
    map-side (grid rows, not token rows, cross the wire), probe selection
    is TakeOrdered (no global sort), and the probe/counter join
    broadcasts the fixed-size grid."""
    r = reports("sketch_cms_token_counts")
    assert r.has_partial_aggregate
    assert r.take_ordered
    assert r.n_broadcast_exchanges >= 1
    assert r.n_shuffle_exchanges <= 2


def test_pmi_single_pair_count_pass_topk_take_ordered(reports):
    """PMI's scale contract: one bigram-count pass (checkpointed, then
    marginals re-aggregate the pair frame — no second corpus scan), N as
    the single-row broadcast (the lm_fluency NLJ pattern), and the
    global top-k via TakeOrdered, never a full sort."""
    r = reports("text_pmi_collocations")
    assert r.has_partial_aggregate
    assert r.take_ordered
    assert r.nested_loop_joins == 1  # single-row N broadcast only
    assert r.n_shuffle_exchanges <= 4


def test_bm25_inverted_index_broadcast_joins(reports):
    """BM25's scale contract: postings built once (checkpointed), the
    query-term list and df frame join by broadcast hash (an equi-join on
    term — at scale, term-bucketed postings prune the scan), corpus
    constants ride the single-row broadcast NLJ, and the only window is
    the per-query rank prune."""
    r = reports("text_bm25_topk")
    assert r.has_partial_aggregate
    assert r.broadcast_hash_joins >= 2
    assert r.nested_loop_joins == 1  # single-row (n_docs, avgdl) broadcast
    assert r.sort_merge_joins == 0
    assert r.windows == 1


def test_pagerank_visible_plan_is_topk_over_checkpointed_ranks(reports):
    """The iterative work (5 edge-join + contribution-groupBy rounds) is
    materialized behind per-iteration localCheckpoints (the
    connected-components lineage discipline); the visible plan is just
    the global top-k — TakeOrdered, no sort, no joins, no shuffles."""
    r = reports("graph_pagerank_topk")
    assert r.take_ordered
    assert r.n_shuffle_exchanges == 0
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins
    ) == 0


def test_cohort_retention_user_sized_state_pruned_scan(reports):
    """Retention's scale contract: the events scan reads only
    (user_id, ts), every aggregate combines map-side, and the
    cohort-size join broadcasts (weeks-sized frame)."""
    r = reports("events_cohort_retention")
    assert r.has_partial_aggregate
    assert len(r.scans["events"].read_columns) == 2
    assert r.n_broadcast_exchanges >= 1
    assert r.n_shuffle_exchanges <= 6


def test_funnel_steps_materialized_once(reports):
    """Funnel's scale contract: each per-user step frame is checkpointed
    (its pushed event_type scan runs once, invisible here), so the
    visible plan is only counts + union + the single-row broadcast."""
    r = reports("events_funnel_conversion")
    assert r.has_partial_aggregate
    assert r.nested_loop_joins == 1  # single-row first_n broadcast
    assert r.sort_merge_joins == 0 and r.broadcast_hash_joins == 0


def test_transition_matrix_totals_over_checkpointed_pairs(reports):
    """The Markov matrix's scale shape: the LAG window + transition
    groupBy run once behind the pair-frame checkpoint (it feeds totals
    AND the join — unmaterialized, the window would plan per branch);
    the visible plan is the |types|^2 re-aggregate plus its broadcast
    join back."""
    r = reports("events_transition_matrix")
    assert r.windows == 0  # the LAG subtree is materialized, not re-planned
    assert r.has_partial_aggregate
    assert r.n_broadcast_exchanges >= 1
    assert r.n_shuffle_exchanges <= 2


def test_scd2_single_key_shuffle(reports):
    """SCD2's scale contract: ONE key-hash exchange (the LEAD window over
    (key, version)); interval ends, the delete filter, and is_current are
    all scan-side around it."""
    r = reports("cdc_scd2_history")
    assert r.windows == 1
    assert r.n_shuffle_exchanges == 1
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins
    ) == 0


def test_histogram_quantiles_data_crosses_wire_once(reports):
    """Histogram quantiles' scale contract: the value column partially
    aggregates into <= n_buckets rows per partition before its single
    data shuffle; bounds/quantile frames ride broadcasts and the running
    sum windows over bucket rows, never data."""
    r = reports("events_value_quantiles_hist")
    assert r.has_partial_aggregate
    assert r.n_broadcast_exchanges >= 2
    assert len(r.scans["events"].read_columns) == 1  # value only


def test_image_ahash_is_scan_only(reports):
    # the perceptual hash is pure mapInPandas over the scan: zero
    # exchanges, and the scan reads only (doc_id, text) for the payload
    r = reports("mm_image_ahash")
    assert r.n_exchanges == 0
    assert len(r.scans["documents"].read_columns) <= 2


def test_image_neardup_band_join_bounded(reports):
    # the band frame is checkpointed (no corpus scan in the visible plan
    # — the mapInPandas hash runs ONCE, not per join side); the candidate
    # join + distinct keeps a bounded shuffle budget
    r = reports("mm_image_neardup_pairs")
    assert r.scans == {}
    assert r.n_shuffle_exchanges <= 3
    assert r.nested_loop_joins == 0  # banded equi-join, never all-pairs


def test_knn_triangle_plan_truncated_and_equi_joined(reports):
    # kNN edges and the oriented frame are checkpointed: the visible plan
    # is graph-sized (no lineitem scan) and every join is an equi-join
    r = reports("graph_supplier_knn_triangles")
    assert r.scans == {}
    assert r.nested_loop_joins == 0


def test_zorder_key_is_scan_side(reports):
    # one tiny bounds aggregate (single row, broadcast back via the
    # deliberate single-row NLJ cross join — the lm_fluency pattern);
    # the bucket + interleave math is scan-side column arithmetic
    r = reports("events_zorder_keys")
    assert r.n_shuffle_exchanges == 1  # only the bounds aggregate
    assert r.nested_loop_joins <= 1  # the single-row broadcast join
    assert "events" in r.scans


def test_audio_pcm_stats_is_scan_only(reports):
    r = reports("mm_audio_pcm_stats")
    assert r.n_exchanges == 0
    assert len(r.scans["documents"].read_columns) <= 2


def test_version_diff_single_alignment_join(reports):
    # fingerprints are scan-side; the diff is one key-aligned join — no
    # nested loops, and both scans read only (doc_id, text)
    r = reports("corpus_version_diff")
    assert r.nested_loop_joins == 0
    assert len(r.scans["documents"].read_columns) <= 2


def test_curriculum_no_global_sort(reports):
    # the positioned frame is checkpointed once (it feeds the size frame
    # AND the final join), so the visible plan has no corpus scan; the
    # only global window runs over the 10-row offsets frame, and the
    # offset join rides a broadcast — a global corpus row_number (one
    # single-task sort) would show as a Window over the scan instead
    r = reports("text_curriculum_order")
    assert r.nested_loop_joins == 0
    assert r.scans == {}
    assert r.n_broadcast_exchanges >= 1


def test_skew_report_is_topk_not_global_sort(reports):
    r = reports("skew_user_activity_report")
    assert r.take_ordered  # top-k via TakeOrderedAndProject
    assert len(r.scans["events"].read_columns) == 1  # user_id only


def test_allpairs_prefix_join_behind_checkpoint_no_nlj(reports):
    """AllPairs' scale contract: the PREFIX index (explode -> df join ->
    per-doc position window -> pos filter, all pre-checkpoint) is
    materialized once and feeds both join sides, and the per-doc shingle
    arrays are checkpointed once feeding the index AND the verification
    frames (a scan-side projection — no collect_list re-aggregation
    shuffle) — so the visible plan has no window, no second index build,
    and exactly three equi-joins (prefix x prefix candidates + the two
    verification array joins); no nested-loop anywhere."""
    r = reports("dedup_allpairs_jaccard")
    assert r.nested_loop_joins == 0
    assert r.windows == 0  # the (df, g) position window ran pre-checkpoint
    assert (r.broadcast_hash_joins + r.sort_merge_joins) == 3
    assert r.n_shuffle_exchanges == 2  # probe repartition(g) + pair dedup


def test_validation_suite_one_join_no_nlj(reports):
    """Constraint suite's scale contract: all row-level + uniqueness
    expectations ride ONE aggregation over the orders scan (partial agg,
    the multi-distinct Expand included); the only join in the whole
    report is the referential probe against the deduplicated customer
    keys — never a nested loop, and no window anywhere."""
    r = reports("validate_orders_constraints")
    assert r.nested_loop_joins == 0
    assert r.windows == 0
    assert (r.broadcast_hash_joins + r.sort_merge_joins) == 1
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 4


def test_semantic_decontam_bench_broadcast_single_corpus_pass(reports):
    """Semantic decontamination's scale contract: the benchmark side is
    BROADCAST (corpus payloads never shuffle for the join) and the
    argmax is a partially-aggregated struct-max groupBy — one corpus
    pass, one key shuffle of already-filtered hit rows, no window. The
    single nested-loop IS the design (annotated in NLJ_NOTES): the
    scoring pass is equi-keyed on nothing, every corpus row meets the
    broadcast bench list exactly once — same shape as sim_brute_topk."""
    r = reports("decontam_semantic_cosine")
    assert r.n_broadcast_exchanges >= 1
    assert r.windows == 0
    assert r.nested_loop_joins == 1
    assert r.sort_merge_joins == 0
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 2  # repartition(par) + argmax groupBy


def test_bloom_pruned_join_filters_before_join(reports):
    """Bloom-pruned join's scale contract: the fact scan reads only the
    join key + measure (projection pruning), the Bloom probe (getbit
    fold over the single-row broadcast bitset — the annotated NLJ) sits
    on the scan side BELOW the actual equi-join, the dim filter is
    pushed to the orders scan, and the rollup partially aggregates with
    one shuffle."""
    r = reports("join_bloom_pruned_urgent_qty")
    assert "getbit" in r.plan_text  # the probe survived into the plan
    assert r.nested_loop_joins == 1  # the bitset ship, annotated
    assert r.broadcast_hash_joins + r.sort_merge_joins == 1  # ONE real join
    assert len(r.scans["lineitem"].read_columns) == 2  # l_orderkey, l_quantity
    assert any("o_orderpriority" in f for f in r.scans["orders"].pushed_filters)
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_hybrid_rerank_candidates_broadcast_two_windows(reports):
    """Hybrid retrieval's scale contract: the dense stage joins the
    corpus-embedding scan against BROADCAST candidates (nothing
    corpus-sized shuffles for the rerank — the only NLJ is BM25's
    annotated single-row constants ship), and exactly two rank windows
    exist: the BM25 candidate prune and the cosine rerank."""
    r = reports("text_hybrid_bm25_cosine_topk")
    assert r.windows == 2
    assert r.nested_loop_joins == 1  # bm25 consts, annotated
    assert r.n_broadcast_exchanges >= 3  # qterms, df, candidates, qvec
    assert r.sort_merge_joins == 0
    assert r.has_partial_aggregate


def test_exact_quantiles_checkpointed_cumsum_small_windows(reports):
    """Exact quantiles' scale contract: the distinct-value cumulative
    sum (bucket-partitioned window + single-row bounds ship) runs once
    behind the checkpoint; the visible plan is bucket totals -> the
    n_buckets-row prefix-sum window -> broadcast offsets join -> ONE
    final conditional-min aggregate. Never a corpus-wide single-task
    sort."""
    r = reports("events_value_exact_quantiles")
    assert r.windows == 1  # the n_buckets-row offset window only
    assert r.nested_loop_joins == 0
    assert r.broadcast_hash_joins + r.sort_merge_joins == 1  # offsets join
    assert r.has_partial_aggregate


def test_quality_calibration_single_source_exchange(reports):
    """Calibration's scale contract: ONE source-keyed shuffle shared by
    the rank window and the per-source count window; no joins; the
    documents scan reads only (doc_id, text, source)."""
    r = reports("text_quality_calibrated")
    assert r.n_shuffle_exchanges == 1
    assert r.windows == 2
    assert r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins == 0
    assert len(r.scans["documents"].read_columns) == 3


def test_neighbor_smoothing_lsh_pairs_no_nlj(reports):
    """Neighbor smoothing's scale contract: the neighborhood comes from
    the LSH-bucketed pair generator (equi-joins only — never all-pairs),
    quality joins are broadcast-sized at fixture scale, the rollup is
    one partially-aggregated doc_id shuffle, no window."""
    r = reports("quality_neighbor_smoothing")
    assert r.nested_loop_joins == 0
    assert r.sort_merge_joins == 0
    assert r.windows == 0
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1  # the doc_id rollup


def test_grouped_exact_quantiles_no_nlj_small_windows(reports):
    """Grouped exact quantiles: the (group, bucket) cumulative sum runs
    behind the checkpoint; visibly only the |groups| x n_buckets offset
    window, the offsets equi-join, and partially-aggregated groupBys —
    no nested loop (the bounds ship is a per-group JOIN here, not a
    single-row crossJoin), no corpus-wide sort."""
    r = reports("events_type_value_quantiles")
    assert r.nested_loop_joins == 0
    assert r.windows == 1
    assert r.broadcast_hash_joins + r.sort_merge_joins == 1
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 3


def test_mg_heavy_hitters_filter_stays_post_agg(reports):
    """heavy_hitters_exact: one map-side-combined count shuffle (over
    the checkpointed counts — the corpus scan ran once at checkpoint
    time), the grand total as a single-row broadcast NLJ, and no window
    or sort anywhere: the support compare is a plain filter on the
    <= k surviving rows."""
    r = reports("sketch_mg_heavy_tokens")
    assert r.windows == 0
    assert not r.take_ordered
    assert r.nested_loop_joins  # the annotated single-row total broadcast
    assert r.n_shuffle_exchanges <= 1


def test_cms_join_size_two_grids_no_corpus_join(reports):
    """The join-size estimator's whole point: the corpus-sized join is
    never the estimate's input — both sides reduce map-side to
    depth x width counter grids (partial agg before every exchange),
    the grid-product join is grid x grid, and the only NLJ is the
    single-row exact/estimate result assembly."""
    r = reports("sketch_cms_join_size")
    assert r.has_partial_aggregate
    assert r.nested_loop_joins <= 2  # single-row result assembly only
    assert r.n_shuffle_exchanges <= 6


def test_audio_neardup_band_join_bounded(reports):
    # same contract as the image twin through the shared banding engine:
    # fingerprint frame checkpointed (the mapInPandas segmentation runs
    # once, no corpus scan per join side), banded equi-join, no NLJ
    r = reports("mm_audio_neardup_pairs")
    assert r.scans == {}
    assert r.n_shuffle_exchanges <= 3
    assert r.nested_loop_joins == 0


def test_zone_map_report_ranks_partitioned_never_global(reports):
    """The report's global rank is a PARTITIONED window + broadcast
    prefix offsets (curriculum_order discipline) — the corpus-sized
    frames are checkpointed, so the visible plan holds only the tiny
    offsets windows (one per layout), never a single-task corpus sort."""
    r = reports("events_zone_map_skip")
    assert r.windows <= 2  # the two <=64-row offsets windows only
    assert r.has_partial_aggregate
    assert r.scans == {}  # keyed frame checkpointed: no re-scan per layout


def test_tfidf_keyphrases_no_corpus_rescan(reports):
    """TF-IDF's scale contract: the postings pass is checkpointed (df
    and the scoring join share it — no second corpus scan), the term
    dictionary joins BY KEY (never broadcast: it is corpus-sized), N
    rides the single-row broadcast, and the per-doc top-k is a
    partitioned window."""
    r = reports("text_tfidf_keyphrases")
    assert r.scans == {}  # postings checkpointed: no documents re-scan
    assert r.has_partial_aggregate
    assert r.windows == 1
    assert r.nested_loop_joins <= 1  # the single-row N broadcast only


def test_robust_outliers_checkpointed_dev_no_nlj(reports):
    """Robust outliers' scale contract: the deviations frame is
    checkpointed once (the MAD quantile pass and the final report share
    it — no third corpus scan), every join is keyed (per-group med/mad
    are dimension-sized, no single-row crossJoin), and the windows are
    the grouped-quantile bucket windows only."""
    r = reports("events_value_robust_outliers")
    assert r.nested_loop_joins == 0
    assert r.has_partial_aggregate
    assert "events" not in r.scans  # base scanned before the checkpoint


def test_zone_map_read_pruned_is_narrow_scan(reports):
    """The zone-map read path (r14): after the driver-side footer prune,
    the visible plan is a bare filtered scan of the kept files — the
    range predicate also reaches the row level as PushedFilters, the
    projection stays at the 4 requested columns, and no shuffle exists
    anywhere (pruning must never cost a repartition)."""
    r = reports("events_zone_map_read_pruned")
    assert r.n_shuffle_exchanges == 0
    assert r.windows == 0
    scan = next(iter(r.scans.values()))
    assert any("value" in f for f in scan.pushed_filters), r.plan_text[:2000]
    assert len(scan.read_columns) <= 4


def test_gapfill_preaggregates_events_before_the_grid(reports):
    """Gap-fill's scale contract: events reduce map-side to (type, hour)
    counts before touching the dimension-sized grid; the type dimension
    broadcasts; the moving window runs over grid rows only."""
    r = reports("events_hourly_gapfill")
    assert len(r.scans["events"].read_columns) == 2  # event_type, ts
    assert r.has_partial_aggregate
    assert r.n_broadcast_exchanges >= 1  # the type dim onto the hour spine
    assert r.windows == 1
    assert r.n_shuffle_exchanges <= 6


def test_decay_engagement_is_one_scan_one_rollup(reports):
    """Decay engagement's scale contract: the as-of horizon rides a
    single-row broadcast (the annotated tiny NLJ), and the per-user
    rollup partially aggregates — no event-sized shuffle beyond it."""
    r = reports("events_decay_engagement")
    # two pruned scan branches (horizon: ts only; rollup: user_id, ts);
    # the audit keeps one ScanInfo per table — either way it's pruned
    assert len(r.scans["events"].read_columns) <= 2
    assert r.nested_loop_joins == 1  # single-row horizon broadcast
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges <= 3


def test_bfs_levels_materializes_each_hop(reports):
    """BFS's scale contract: every hop's frontier is checkpointed, so
    the result plan is a union over materialized node-sized frames —
    re-collecting it never re-plans the per-hop joins (the iterative
    lineage-truncation discipline shared with cc/pagerank)."""
    r = reports("graph_bfs_levels")
    assert not r.scans  # all inputs are checkpoint RDDs, no re-scan
    assert r.n_shuffle_exchanges == 0


def test_series_similarity_windows_checkpointed_once(reports):
    """Series similarity's scale contract: the window-vector frame is
    checkpointed once and feeds the query max, the query join, and the
    candidate scan — the visible plan is broadcast-query scoring + the
    rank prune over dimension-sized frames, never an events re-scan."""
    r = reports("events_series_similarity_topk")
    assert "events" not in r.scans  # gap-fill chain is behind the checkpoint
    assert r.n_broadcast_exchanges == 2  # single-row qstart + |types| queries
    assert r.nested_loop_joins == 1  # the annotated non-overlap theta join
    assert r.sort_merge_joins == 0
    assert r.windows == 1  # the rank prune only
    assert r.n_shuffle_exchanges <= 2


def test_series_discords_probe_join_is_broadcast_hash(reports):
    """Discord screen's scale contract: probes (|types| x recent_windows)
    BROADCAST into a same-type equi-join (the exclusion zone is a
    post-join filter, not a nested loop over the window frame); the only
    NLJ is the single-row qmax horizon; the nearest-neighbor fold is a
    partial-aggregated min(struct), and only the discord rank windows."""
    r = reports("events_series_discords")
    assert "events" not in r.scans  # behind the window-frame checkpoint
    assert r.broadcast_hash_joins == 1  # probes x wins equi-join on type
    assert r.nested_loop_joins == 1     # single-row qmax broadcast only
    assert r.sort_merge_joins == 0
    assert r.has_partial_aggregate
    assert r.windows == 1


def test_lag_correlation_single_materialized_series(reports):
    """Lead-lag scan's scale contract: the series is checkpointed once
    (the shifted self-join's two sides must not re-plan the gap-fill
    chain), the shift is an equi HASH join on the computed hour key, the
    only NLJ is the broadcast lag spine, and the product fold partially
    aggregates into the |types|^2 x |lags| state."""
    r = reports("events_series_lag_correlation")
    assert "events" not in r.scans  # behind the series checkpoint
    assert r.nested_loop_joins == 1  # the |lags| broadcast spine only
    assert r.sort_merge_joins == 0
    assert r.has_partial_aggregate
    assert r.windows == 1
    assert r.n_shuffle_exchanges <= 2


def test_hour_of_day_profile_slots_checkpointed_once(reports):
    """Seasonality profile's scale contract: the 24-slot frame is
    checkpointed once (it feeds the totals AND the share join), totals
    broadcast back — no event re-scan, no window, no NLJ."""
    r = reports("events_hour_of_day_profile")
    assert "events" not in r.scans
    assert r.nested_loop_joins == 0
    assert r.broadcast_hash_joins == 1
    assert r.has_partial_aggregate
    assert r.windows == 0
