"""Deduplication operators over a document corpus: exact, MinHash+LSH,
n-gram Jaccard, SimHash, embedding near-dup.

Reference: none (the reference has no text surface — SURVEY §2.4); these are
the BASELINE.json LLM-data-pipeline extensions, designed for 100 TB:

- **exact_duplicates**: hash-groupBy on md5(text). One shuffle keyed by a
  uniform hash → no skew; map-side partial agg collapses per-partition
  duplicates first.
- **minhash_lsh_pairs**: shingle→minhash→band→bucket-join. The candidate
  join keys on (band_id, band_key) — uniform md5-derived keys, expected
  bucket size ~1 at high k; the full n² pair space is never formed. The
  exact-Jaccard rerank joins the (small) candidate set back to the word
  sets and intersects arrays per pair — per-row work bounded by doc length,
  no extra shuffle beyond the candidate join.
- **ngram_jaccard_pairs**: exact pairs via shared-shingle inverted index —
  the join is keyed by shingle (uniform), and hot shingles can be capped
  via document-frequency filtering (df_cap) exactly like a stopword cut.
- **simhash_pairs**: 16-bit fingerprints, byte-banded candidates, hamming
  filter via xor+bit_count — constant per-pair cost.
- **embedding_dup_pairs**: integer-quantized cosine threshold; candidates
  from hyperplane-LSH buckets so the pair space is n²/2^planes.

All scoring that feeds the DuckDB parity gate is integer/string-exact
(md5, bigint dots); see functions/text.py and functions/vector.py.

**Output-expanding joins need explicit parallelism.** AQE sizes partitions
by *input* bytes; a pair-generating self-join can take KBs in and emit
millions of rows out, so the planner happily runs it in one task. Every
pair join below repartitions its probe side to the cluster's default
parallelism first — a no-op cost on big inputs, a 30x win on small ones.
(Measured at sf0.1: embedding brute pairs 28.7s → ~2s on local[32].)

**localCheckpoint trade-off (applies to every eager=True site here, in
similarity.py and in graph.py).** Multi-consumer intermediates (shingle
arrays, quantized+bucketed vectors) are localCheckpoint'd, which (a) runs
a Spark job at operator-BUILD time — these builders are deliberately NOT
lazy, unlike the relational operators — and (b) pins the snapshot on
executor-local storage, so losing an executor fails the job instead of
recomputing from lineage (plain .checkpoint() to a reliable store is the
HA alternative, at a distributed-FS write cost). We take that trade
because the checkpointed frames are small derived forms (arrays/ints, not
the corpus), and without truncation the 3-4x recompute + double-per-round
lineage growth is a certain cost while executor loss is a rare one —
rerunning the query on failure is acceptable for batch dedup/ANN jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.functions import vector as V


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the
    representative (min doc_id) and the copy count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def keep_best_per_cluster(
    members: DataFrame,
    cluster_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Retention policy over duplicate clusters: instead of keep-min-id,
    keep the highest-`score_col` member of every cluster (ties broken by
    min id — deterministic across engines and retries).

    The standard curation refinement: when several near-identical copies
    of a document exist, retain the best-quality one, not the one that
    happened to get the smallest id.

    Output: (cluster_col, keep_id, best_score, n_members).

    Scale shape: one partial-aggregated groupBy — the argmax rides a
    struct max (score, -id, id), so map-side combine reduces each cluster
    to one row per partition before the single key shuffle. No window
    function (a row_number formulation would shuffle every member of
    every cluster).

    `id_col` must be numeric: the min-id tie-break negates it inside the
    struct max. A string id would cast to NULL there and silently invert
    the tie-break to max-id, so non-numeric ids are rejected loudly."""
    from pyspark.sql import types as ST

    id_type = members.schema[id_col].dataType
    if not isinstance(id_type, ST.NumericType):
        raise TypeError(
            f"keep_best_per_cluster needs a numeric id column for its "
            f"min-id tie-break; {id_col!r} is {id_type} — map string ids "
            "to a numeric surrogate first"
        )
    best = F.max(
        F.struct(
            F.col(score_col).alias("s"),
            (-F.col(id_col)).alias("neg_id"),
            F.col(id_col).alias("id"),
        )
    )
    return (
        members.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("n_members"), best.alias("_best"))
        .select(
            cluster_col,
            F.col("_best.id").alias("keep_id"),
            F.col("_best.s").alias("best_score"),
            "n_members",
        )
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Spread the corpus across cores BEFORE the per-doc heavy expressions
    (shingling, simhash folds). A small parquet input scans as one task,
    and the expression would otherwise evaluate single-threaded — on big
    inputs maxPartitionBytes already splits the scan and this is ~free."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(par)


def _word_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return _spread(docs).select(
        "doc_id", F.array_distinct(F.split(F.col(text_col), " ")).alias("ws")
    )


def sig_band_structs(k: int, bands: int):
    """Array of (band_id, band_key) structs over signature columns
    h0..h{k-1}: `bands` bands of k/bands concatenated components.

    THE single definition of how signatures become band keys — the batch
    pair generator and the streaming near-dup state both derive their
    keys here, and persisted streaming state joins against future batches
    on these strings, so the two paths must stay bit-identical forever."""
    rows = k // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat(
                    *[F.col(f"h{b * rows + r}") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def _band_keys_of_sets(sets: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band_id, band_key) rows from per-doc word-set arrays:
    k salted min-hashes, `bands` bands of k/bands concatenated rows,
    flattened with a single explode."""
    sig = (
        sets.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id")
        .agg(*T.minhash_signature(F.col("w"), k))
    )
    return sig.select(
        "doc_id", F.explode(sig_band_structs(k, bands)).alias("bb")
    ).select(
        "doc_id",
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.band_key").alias("band_key"),
    )


def minhash_band_keys(
    docs: DataFrame, k: int = 8, bands: int = 4, text_col: str = "text"
) -> DataFrame:
    """Public band-key builder: the LSH bucket assignment of each doc as
    (doc_id, band_id, band_key) rows — the shared primitive of the batch
    pair generator above and the streaming near-dup filter
    (streaming/neardup.py). Docs sharing any (band_id, band_key) are
    LSH candidates."""
    return _band_keys_of_sets(_word_sets(docs, text_col), k, bands)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH with exact-Jaccard rerank.

    k salted min-hashes over distinct words, `bands` bands of k/bands rows;
    docs sharing any band key become candidates; candidates are reranked
    with exact word-set Jaccard and kept when >= threshold.

    `bucket_cap` is the band-bucket analogue of the inverted-index df_cap:
    a (band_id, band_key) bucket holding more than bucket_cap docs is
    dropped BEFORE the self-join (a bucket of m docs emits m²/2 candidate
    pairs — on a boilerplate-heavy corpus one degenerate bucket can
    dominate the whole join). Unlike the shingle cap this is a RECALL
    trade, not just a cost cut: a pair whose only agreeing band was
    capped is missed; pairs agreeing in any surviving band are still
    found, and every emitted pair passes the exact-Jaccard rerank, so
    precision is unaffected. The streaming twin's `salt_bands` spreads
    the same hot buckets instead of dropping them (streaming batches are
    bounded; an unbounded batch corpus is not).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # the word sets feed the signature aggregation AND both rerank sides;
    # without a materialization the split+distinct scan recomputes 3x (and
    # the signature — k md5's per word occurrence, the heavy part — once
    # per consumer of `sig`). localCheckpoint stores the compact array form
    # once on executor storage; at scale that is O(corpus tokens) local
    # disk, strictly cheaper than re-tokenizing the corpus per consumer.
    sets = _word_sets(docs, text_col).localCheckpoint(eager=True)
    # bands via ONE explode, not a `bands`-way union: each union branch
    # would re-run the whole signature aggregation (measured 4x recompute
    # at bands=4). The signature table is tiny (doc_id + k hex strings) —
    # checkpoint it so the self-join's two sides share one computation.
    all_bands = _band_keys_of_sets(sets, k, bands).localCheckpoint(eager=True)
    if bucket_cap is not None:
        hot = (
            all_bands.groupBy("band_id", "band_key")
            .count()
            .filter(F.col("count") > bucket_cap)
            .select("band_id", "band_key")
        )
        # one checkpoint so the hot-bucket aggregate runs once, not under
        # both self-join sides (the _shingle_index df_cap rationale)
        all_bands = all_bands.join(
            hot, ["band_id", "band_key"], "left_anti"
        ).localCheckpoint(eager=True)
    par = docs.sparkSession.sparkContext.defaultParallelism
    # probe side spread round-robin: the band join's OUTPUT is quadratic
    # in bucket occupancy, so parallelism must not follow input size
    a, b_ = all_bands.repartition(par).alias("a"), all_bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    wa = sets.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("wsa"))
    wb = sets.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("wsb"))
    scored = (
        cand.repartition(par, "doc_a")  # rerank (array_intersect) is the hot loop
        .join(wa, "doc_a")
        .join(wb, "doc_b")
        # size-ratio prune: jaccard <= min(|A|,|B|)/max(|A|,|B|), so pairs
        # failing min >= t*max can't reach the threshold — skips the
        # array_intersect without changing the result set
        .filter(
            F.least(F.size("wsa"), F.size("wsb")).cast("double")
            >= F.lit(threshold) * F.greatest(F.size("wsa"), F.size("wsb")).cast("double")
        )
        .withColumn("inter", F.size(F.array_intersect("wsa", "wsb")).cast("bigint"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("wsa") + F.size("wsb") - F.col("inter")).cast("double"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def _shingle_index(
    docs: DataFrame, n: int, text_col: str, df_cap: int | None
) -> DataFrame:
    """Inverted shingle index (doc_id, sz, g) — the shared front half of
    the Jaccard and containment pair generators.

    The per-doc shingle arrays feed the inverted index (consumed by the
    hot-list aggregation AND both self-join sides) — without a
    materialization Spark recomputes the per-doc shingling expression
    (the heavy part) up to 4x. localCheckpoint stores the compact per-doc
    array form once on executor storage and truncates lineage; at scale
    this is O(total shingles) local disk, far cheaper than re-shingling
    the corpus per consumer. (Measured at sf0.1: 10.3s -> ~4s for the
    capped Jaccard variant.) The shingle-set size rides along from
    explode time (+8 bytes/row in the g-shuffle, no extra join).

    Shingles are folded to 64-bit xxhash64 fingerprints BEFORE the
    distinct/checkpoint (r17, guide §2.3 "narrower types"): every
    downstream shuffle — the df-count aggregate, the anti-join, the
    inverted self-join and the pair groupBy — moves 8-byte bigints
    instead of variable-length gram strings, and the checkpointed arrays
    shrink the same way. Both consumers only test shingle EQUALITY and
    count intersections, so results are unchanged up to a ~2^-64
    per-pair collision (the duplicate_spans / allpairs_jaccard_pairs
    stance: at 1e12 shingles the expected colliding pairs are ~0.03;
    acceptable for a dedup signal, and the sf-scale oracles hash-verify
    the actual outputs)."""
    sh = _spread(docs).select(
        "doc_id", F.col(text_col), F.split(F.col(text_col), " ").alias("_ws")
    ).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                T.shingles_of_words("_ws", text_col, n),
                lambda g: F.xxhash64(g),
            )
        ).alias("sh"),
    )
    sh = sh.localCheckpoint(eager=True)
    inv = sh.select(
        "doc_id", F.size("sh").cast("bigint").alias("sz"), F.explode("sh").alias("g")
    )
    if df_cap is not None:
        hot = inv.groupBy("g").count().filter(F.col("count") > df_cap).select("g")
        # materialize the capped index once: without this, the hot-list
        # aggregate (a full shuffle over every shingle occurrence) and the
        # anti-join are physically duplicated under BOTH self-join sides —
        # Spark's ReuseExchange does not fire across them. One eager
        # checkpoint = one hot shuffle, and both join sides scan the stored
        # capped index.
        inv = inv.join(hot, "g", "left_anti").localCheckpoint(eager=True)
    return inv


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via a shared-shingle inverted index.

    Only pairs sharing >= 1 shingle are generated (inverted-index join on
    the shingle), so cost tracks real overlap, not n². `df_cap` drops
    shingles appearing in more than df_cap docs (hot-key guard at scale —
    a shingle in 1M docs would otherwise emit 10^12 pairs).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    inv = _shingle_index(docs, n, text_col, df_cap)
    par = docs.sparkSession.sparkContext.defaultParallelism
    # inverted-index join output ~ sum(df(g)^2): decouple parallelism from
    # the (tiny) input size; partitioning by shingle co-locates the join
    ia, ib = inv.repartition(par, "g").alias("a"), inv.alias("b")
    inter = (
        ia.join(
            ib,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio prune: jaccard <= min(sz)/max(sz), so pairs whose
            # sizes differ by more than the threshold ratio can never pass
            # the final filter — drop their rows BEFORE the groupBy (the
            # expensive part; measured ~13% at sf0.1, and at scale it cuts
            # the aggregate's input, the term that grows with corpus size)
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        # sz is constant per doc_id, so first() inside the aggregate recovers
        # both set sizes for free — no post-agg join back to a corpus-sized
        # sizes frame (which would cost two extra shuffles at scale)
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first(F.col("a.sz")).alias("sza"),
            F.first(F.col("b.sz")).alias("szb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    df_cap: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection: pairs where the SMALLER doc's
    shingle set is mostly contained in the other's — containment =
    |A∩B| / min(|A|,|B|) >= threshold. Catches quotes, excerpts, and
    wrapper pages that Jaccard misses by construction (a 50-gram doc
    fully quoted inside a 5000-gram doc has Jaccard ~0.01 but
    containment 1.0).

    Same inverted-index plan as ngram_jaccard_pairs — shared-shingle
    equi-join, map-side-combined pair aggregate, sizes riding the index
    rows — but deliberately WITHOUT the size-ratio prune: dissimilar
    sizes are exactly the signal here, so `df_cap` is the only (and
    still essential) hot-shingle guard at scale.

    Returns (doc_a, doc_b, containment) with doc_a < doc_b.
    """
    inv = _shingle_index(docs, n, text_col, df_cap)
    par = docs.sparkSession.sparkContext.defaultParallelism
    ia, ib = inv.repartition(par, "g").alias("a"), inv.alias("b")
    inter = (
        ia.join(
            ib,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first(F.col("a.sz")).alias("sza"),
            F.first(F.col("b.sz")).alias("szb"),
        )
    )
    return (
        inter.withColumn(
            "containment",
            F.col("inter").cast("double")
            / F.least("sza", "szb").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc 16-bit SimHash fingerprint + its two byte-bands."""
    return _spread(docs).select(
        "doc_id",
        T.simhash16_expr(f"array_distinct(split({text_col}, ' '))").alias("simhash"),
    ).select(
        "doc_id",
        "simhash",
        (F.col("simhash") % 256).alias("band_lo"),
        (F.col("simhash").cast("bigint") / 256).cast("bigint").alias("band_hi"),
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share a byte band (pigeonhole:
    hamming <= 3 on 16 bits can still differ in both bytes, so the band
    recall is approximate by design — that's the documented LSH trade-off;
    hamming <= 1 pairs are always caught). xor+bit_count rerank."""
    fp = simhash_fingerprints(docs, text_col)
    lo = fp.select("doc_id", "simhash", F.lit(0).alias("band_id"), F.col("band_lo").alias("bk"))
    hi = fp.select("doc_id", "simhash", F.lit(1).alias("band_id"), F.col("band_hi").alias("bk"))
    # materialize the band frame once: it feeds BOTH self-join sides, and
    # each un-materialized consumer re-runs the full simhash fold (16
    # md5-vote bits per doc) plus its spread shuffle — measured 6
    # exchanges before, 3 after (the dedup.py checkpoint discipline)
    bands = lo.unionByName(hi).localCheckpoint(eager=True)
    par = docs.sparkSession.sparkContext.defaultParallelism
    a, b = bands.repartition(par).alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def auto_lsh_planes(
    n_rows: int, target_occupancy: int = 32, floor: int = 6, cap: int = 24
) -> int:
    """Plane count that keeps expected LSH bucket occupancy bounded:
    smallest p with n/2^p <= target_occupancy (clamped to [floor, cap]).

    Why this exists (r14 sf1 scale probe): with a FIXED plane count the
    candidate pair space is ~n²/2^p — quadratic in the corpus. The probe
    measured dedup_clusters_embedding at 15.6x wall for 10x data purely
    from candidate scoring. Scaling p with log2(n) makes expected pairs
    ~n * target_occupancy / 2 — linear — at the standard LSH trade
    (per-pair recall p_agree^planes falls as planes rise; multiprobe
    buys most of it back, and the recall floor is measured in tests)."""
    if n_rows < 1:
        return floor
    # ceiling division: floor would under-count planes for n just past a
    # power-of-2 boundary (e.g. n=131073 -> n/2^12 = 32.0002 > 32) and
    # break the documented "smallest p with n/2^p <= target" invariant
    need = (n_rows + target_occupancy - 1) // target_occupancy
    p = max(floor, (need - 1).bit_length())
    return min(p, cap)


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold_pct: int = 95,
    n_planes: int | str = 6,
    dims: int = 64,
    brute_force: bool = False,
    multiprobe: bool = False,
) -> DataFrame:
    """Near-duplicate vector pairs: quantized-cosine >= threshold_pct/100.

    n_planes="auto" picks the plane count from the corpus row count via
    `auto_lsh_planes` (one count-star job — parquet metadata, not a
    scan): THE scale setting, since any fixed plane count is quadratic
    at some corpus size (see auto_lsh_planes). The oracle-gated registry
    queries pin an explicit plane count (the bucketing is part of the
    replayed contract); auto is for production corpora of unknown size.

    The score (qdot) is exact integer math. The threshold test uses
    IEEE-double sqrt of the exact integer norms: sqrt is correctly rounded
    by the standard, so the comparison is bit-identical in any conforming
    engine (DuckDB parity verified). Candidates come from hyperplane-LSH
    buckets (n²/2^planes pair space); brute_force=True skips bucketing
    (baseline / oracle path).

    multiprobe=True additionally probes every bucket at hamming distance 1
    from a vector's own bucket (one side explodes to n_planes+1 probe ids;
    join stays bucket-equi). Candidate space grows ×(n_planes+1), recall
    rises from p^planes to p^planes + planes·p^(planes-1)·(1-p) where p is
    the per-plane agreement probability — measured at sf0.01 in
    tests/test_extensions.py (recall floors documented there). Each
    qualifying pair is generated exactly once: for hamming-0 pairs only the
    identity probe matches, for hamming-1 pairs exactly one flipped probe
    matches, and the vec_a < vec_b guard kills the mirror orientation.

    Returns (vec_a, vec_b, qdot) with vec_a < vec_b.
    """
    if n_planes == "auto":
        n_planes = auto_lsh_planes(embeddings.count())
    q = embeddings.select("vec_id", V.quantize("embedding").alias("q"))
    q = q.select(
        "vec_id",
        "q",
        F.expr(
            "aggregate(q, cast(0 as bigint), (acc, x) -> acc + x * x)"
        ).alias("n2"),
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if not brute_force:
        q = q.withColumn("bucket", V.lsh_bucket("q", n_planes, dims))
    # materialize the quantized (and bucketed) corpus once: both self-join
    # sides consume it, and without a checkpoint Spark recomputes the
    # quantize/norm/bucket scan per side AND fuses the whole pipeline into
    # one giant codegen unit (~7 s janino compile on first action). At
    # scale this stores O(n·d) ints on executor-local disk, read twice —
    # strictly cheaper than re-quantizing the corpus twice.
    q = q.repartition(par).localCheckpoint(eager=True)
    a, b = q.alias("a"), q.alias("b")
    if not brute_force:
        if multiprobe:
            probes = F.array(
                F.col("bucket"),
                *[F.expr(f"bucket ^ {1 << i}") for i in range(n_planes)],
            )
            a = q.withColumn("probe", F.explode(probes)).alias("a")
            pairs = a.join(
                b,
                (F.col("a.probe") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
        else:
            pairs = a.join(
                b,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
    else:
        # quadratic pair space (baseline/oracle path only)
        pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.expr(
            "aggregate(zip_with(a.q, b.q, (x, y) -> x * y), "
            "cast(0 as bigint), (acc, v) -> acc + v)"
        ).alias("qdot"),
        F.col("a.n2").alias("na"),
        F.col("b.n2").alias("nb"),
    )
    t = threshold_pct / 100
    return (
        scored.filter(
            (F.col("qdot") > 0)
            & F.expr(
                f"CAST(qdot AS DOUBLE) >= {t} * "
                f"sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))"
            )
        )
        .select("vec_a", "vec_b", "qdot")
    )


def edit_verified_pairs(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    prefilter_jaccard: float = 0.5,
    max_dist: int | None = 20,
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy near-dup pairs with EXACT character-level verification: the
    MinHash-LSH candidate generator and word-set Jaccard prefilter feed
    a Levenshtein edit-distance check over the raw texts — the fuzzy-
    dedup shape where a cheap set-similarity recall stage is confirmed
    by an exact sequence-level distance (word-set Jaccard is blind to
    ORDER; two docs with identical vocabularies but scrambled text pass
    the prefilter and are rejected here).

    Returns (doc_a, doc_b, jaccard, edit_dist), doc_a < doc_b, keeping
    pairs with edit_dist <= max_dist (max_dist=None emits all prefilter
    survivors with their distances — the analysis form).

    Scale shape: inherits the banded-bucket candidate discipline (never
    all-pairs); the O(|ta|*|tb|) Levenshtein DP — the expensive exact
    stage — runs ONLY on pairs that survived both the band join and the
    Jaccard prefilter, joined to the raw texts by two doc-keyed
    equi-joins. levenshtein() is a JVM intrinsic (whole-stage codegen),
    and DuckDB's levenshtein computes the identical unit-cost DP, so
    the whole pipeline stays oracle-exact."""
    cand = minhash_lsh_pairs(
        docs, k=k, bands=bands, threshold=prefilter_jaccard, text_col=text_col
    )
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col(text_col).alias("ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col(text_col).alias("tb"))
    out = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.levenshtein("ta", "tb").cast("bigint").alias("edit_dist"),
        )
    )
    if max_dist is not None:
        out = out.filter(F.col("edit_dist") <= max_dist)
    return out


def allpairs_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set-Jaccard pairs via AllPairs prefix filtering
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW 2007) — the threshold-exact scale path beside ngram_jaccard_pairs'
    df_cap heuristic.

    Same semantics as ngram_jaccard_pairs (distinct word-n-gram sets,
    Jaccard >= t) but candidate generation indexes only each doc's PREFIX
    in a global rarest-first shingle order instead of every shingle:

    - t = threshold_num/threshold_den (a rational, so every prefix length
      and the final threshold test stay integer-exact — no float ceil).
    - Global order: (document frequency ASC, shingle ASC). Rare shingles
      sort first, so prefixes are built from the least-colliding keys.
      The order is applied per-doc with a doc-partitioned row_number —
      there is NO global rank assignment (a vocab-wide single-partition
      sort would be the actual bottleneck at 100 TB); any shared total
      order works for the prefix-filter lemma, including (df, shingle)
      itself.
    - Prefix length p(d) = |d| - ceil(t*|d|) + 1: a pair with
      Jaccard >= t under the size filter t*|a| <= |b| <= |a|/t must
      overlap by >= ceil(t*max(|a|,|b|)) shingles, and two sets whose
      overlap is >= alpha MUST share an element within their
      (sz - alpha + 1)-prefixes in any common total order — so joining
      prefix-to-prefix loses nothing (the oracle is the EXHAUSTIVE
      inverted index, which proves exactness, not just precision).
    - Verification is exact: array_intersect of the full sorted shingle
      arrays per surviving candidate; the threshold test is the integer
      cross-multiplication inter*den >= num*(sza+szb-inter).

    Scale shape: one corpus scan -> shingle index (checkpointed once; it
    feeds the df counts, the prefix index, and the per-doc full arrays);
    df join is a uniform equi-join on the shingle; the candidate join is
    prefix x prefix (output ~ sum over prefix shingles of df_prefix(g)^2,
    a strict subset of the full inverted-index join); candidate pairs are
    deduplicated BEFORE the two array joins, so verification cost tracks
    the candidate count, not the collision count.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= t.
    """
    from pyspark.sql import Window

    num, den = threshold_num, threshold_den
    # shingles are folded to 60-bit md5 fingerprints up front (the
    # substring-dedup discipline): every downstream join/sort/array op
    # runs on fixed-width bigints instead of variable-length strings —
    # measured 9.5 s -> ~3 s at sf0.1 — at a ~|shingles|^2/2^61 collision
    # risk (two distinct shingles identified; negligible below ~10^8
    # distinct shingles, and the oracle hashes identically so parity
    # still proves the prefix filter lossless)
    sh = _spread(docs).select(
        "doc_id",
        F.split(F.col(text_col), " ").alias("_ws"),
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id",
        F.expr(
            "array_distinct(transform("
            + T.shingles_of_words_sql("_ws", "_t", n)
            + ", g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)))"
        ).alias("sh"),
    )
    # checkpoint the per-doc shingle ARRAYS once: they feed the inverted
    # index (below) and the verification full-set arrays (scan-side
    # projection — no collect_list re-aggregation shuffle)
    sh = sh.localCheckpoint(eager=True)
    inv = sh.select(
        "doc_id",
        F.size("sh").cast("bigint").alias("sz"),
        F.explode("sh").alias("g"),
    )
    # df as count(*) over (partition by g) on the inverted index itself:
    # the aggregate + join-back pair it replaces cost a SECOND full-index
    # exchange (groupBy g, then re-hash inv by g for the join) — the
    # window computes the identical per-gram count with ONE g-keyed
    # exchange (guide §2.4 "two operations keyed the same way can share
    # one exchange"; the cooccurrence_knn_edges r17 fix, same shape)
    # prefix length p = sz - ceil(t*sz) + 1, all-integer (DIV, not IEEE /):
    # the pos filter runs BEFORE the checkpoint, so only prefix rows (about
    # (1-t) of the index) are materialized for the two join sides
    pfx = (
        inv.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("g").asc()
                )
            ),
        )
        .filter(F.expr(f"pos <= sz - ((sz * {num} + {den - 1}) DIV {den}) + 1"))
        .select("doc_id", "sz", "g", "pos")
        .localCheckpoint(eager=True)
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    pa, pb = pfx.repartition(par, "g").alias("a"), pfx.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: jaccard <= min/max, so cross-size pairs outside
            # the t ratio can never pass — and the prefix lengths are only
            # safe GIVEN this filter (required overlap >= ceil(t*max))
            & (F.col("a.sz") * den >= num * F.col("b.sz"))
            & (F.col("b.sz") * den >= num * F.col("a.sz"))
            # positional filter (Bayardo §3.2 / PPJoin): a match at prefix
            # positions (pa, pb) bounds the overlap by
            # 1 + min(sza - pa, szb - pb) — elements BEFORE the pair's
            # FIRST common gram are disjoint by definition, and that first
            # match maximizes the bound, so keeping pairs where ANY match
            # row reaches alpha = ceil(num*(sza+szb)/(num+den)) is
            # lossless (integer cross-multiplied, like the threshold test)
            & (
                (
                    1
                    + F.least(
                        F.col("a.sz") - F.col("a.pos"),
                        F.col("b.sz") - F.col("b.pos"),
                    )
                )
                * (num + den)
                >= num * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets = sh.select(
        "doc_id",
        F.col("sh").alias("toks"),
        F.size("sh").cast("bigint").alias("sz"),
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("ta"),
        F.col("sz").alias("sza"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("tb"),
        F.col("sz").alias("szb"),
    )
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).cast("bigint").alias("inter"),
            "sza",
            "szb",
        )
    )
    return (
        scored.filter(
            F.col("inter") * den >= num * (F.col("sza") + F.col("szb") - F.col("inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )
