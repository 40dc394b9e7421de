"""Distributed connected components over a pair graph — the clustering
step of near-duplicate deduplication (pairs → clusters → keep one doc per
cluster).

Reference: none (the reference has no dedup surface); this is the
LLM-data-pipeline extension family. Algorithm: iterative min-label
propagation with pointer jumping — each round every node takes the min
label among {itself, its neighbors}, then labels compress by one hop
(label := label(label)). Pointer jumping gives O(log n) rounds instead of
O(diameter); the same family as the large-star/small-star method used for
web-scale graphs (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14).

Scale notes:
- per round: ONE key shuffle for the neighbor-min aggregate and one
  self-join for pointer jumping; both key on uniformly-distributed ids.
- `localCheckpoint` per round truncates lineage — mandatory for iterative
  DataFrame algorithms (the plan would otherwise double every round). The
  snapshots live on executor-local storage: an executor loss mid-iteration
  fails the job (no lineage to recompute from) — acceptable for a batch
  clustering pass; see the trade-off note in operators/dedup.py.
- the convergence probe is a single scalar count per round (driver-side,
  O(1) data).
- edge lists for dedup graphs are tiny relative to the corpus (only
  near-dup candidates), so even 100 TB corpora propagate labels over a
  comparatively small frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(edge_rows: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find with path compression; parent pointers always point to
    the smaller id, so every root IS its component's min — the same label
    convention as the distributed path."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Label every node with the MIN node id of its connected component.

    nodes: one row per node (id_col); isolated nodes keep their own label.
    edges: undirected pairs (src_col, dst_col), any orientation.
    Returns (id, label) — label is the component representative.

    strategy:
    - "auto" (default): count the (already materialized) edge list; if it
      fits on the driver (<= DRIVER_CC_MAX_EDGES) run union-find there and
      broadcast the label map back — near-dup edge lists are typically
      minuscule next to the corpus, and the iterative path's per-round job
      overhead dwarfs a one-pass collect at that size. Larger edge lists
      take the distributed iteration.

      Crossover, measured (round 6-7 bench, local[32] sf0.1): the
      driver path completes the embedding-dedup clustering in ~1.9 s
      where the distributed path takes ~4.2 s over 5 rounds — a ~2.3x
      gap that is pure per-round JOB OVERHEAD, so it holds (and widens
      in driver's favor) for any edge list the driver can hold: by TIME
      alone the crossover sits far above DRIVER_CC_MAX_EDGES. The cap is
      therefore a MEMORY bound, not a speed crossover — 1M edges ≈ tens
      of MB collected, the largest list we let a shared driver absorb —
      and `auto` deliberately switches at the memory bound because past
      it the driver path stops being safe, not because the distributed
      path becomes faster there. Both regimes of `auto` are pinned in
      tests/test_extensions.py.
    - "distributed": always iterate (min-label propagation + pointer
      jumping, O(log n) rounds).
    - "driver": always collect — raises above DRIVER_CC_MAX_EDGES.
    Both paths produce the identical labeling (equivalence-tested).

    stats (optional): mutated in place with {"rounds": N, "converged": b,
    "strategy": s, "n_edges": m}. On the distributed path N counts
    executed rounds INCLUDING the final no-change round that detects
    convergence, so a graph of longest chain L costs about
    ceil(log2(L)) + 1 rounds (pointer jumping halves label distance per
    round; asserted in tests/test_extensions.py on a 1k-node chain). On
    the driver path N is 0.
    """
    labels = nodes.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(id_col).cast("bigint").alias("label"),
    ).localCheckpoint(eager=True)
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("id"),
            F.col(dst_col).cast("bigint").alias("nbr"),
        )
        .union(
            edges.select(
                F.col(dst_col).cast("bigint").alias("id"),
                F.col(src_col).cast("bigint").alias("nbr"),
            )
        )
        .localCheckpoint(eager=True)
    )
    if strategy not in ("auto", "distributed", "driver"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "distributed":
        # e is doubled (both orientations); n_edges counts the originals
        n_edges = e.count() // 2
        if n_edges <= DRIVER_CC_MAX_EDGES:
            mapping = _driver_union_find(
                [(r["id"], r["nbr"]) for r in e.filter("id < nbr").collect()]
            )
            if stats is not None:
                stats.update(
                    rounds=0, converged=True,
                    strategy="driver_union_find", n_edges=n_edges,
                )
            spark = nodes.sparkSession
            if not mapping:
                return labels
            map_df = F.broadcast(
                spark.createDataFrame(
                    list(mapping.items()), "id bigint, new_label bigint"
                )
            )
            return labels.join(map_df, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
        if strategy == "driver":
            raise ValueError(
                f"driver strategy refused: {n_edges} edges > "
                f"{DRIVER_CC_MAX_EDGES} (use auto/distributed)"
            )
    if stats is not None:
        stats["strategy"] = "distributed"
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # min label among neighbors (one key shuffle)
        nbr_min = (
            e.join(labels.withColumnRenamed("id", "nbr"), "nbr")
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer jumping: label := label(label) (one self-join)
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("label"), F.col("label").alias("hop")
                ).alias("y"),
                "label",
                "left",
            )
            .select("id", F.least(F.coalesce("hop", "label"), F.col("label")).alias("label"))
            # lazy: the convergence count below is the materializing action,
            # so each round costs ONE job, not two
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str,
    pair_b: str,
    stats: dict | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Near-dup clustering: (id, cluster_rep, is_rep). `is_rep` marks the
    one row per cluster a keep-one curation pass retains (min id wins —
    deterministic, engine-independent).

    Only nodes that appear in >= 1 pair enter the iteration — for dedup
    graphs that is a small fraction of the corpus (near-dup candidates),
    so the per-round frames are edge-sized, not corpus-sized; isolated
    docs are their own representative via the final left join."""
    # the pair frame feeds four consumers (both unions below, twice each);
    # without a one-shot materialization the (expensive) candidate join
    # that produced it recomputes per consumer — measured 22s → 15s at
    # sf0.1 bench. Edge-sized, so the snapshot is tiny.
    pairs = pairs.select(
        F.col(pair_a).cast("bigint").alias(pair_a),
        F.col(pair_b).cast("bigint").alias(pair_b),
    ).localCheckpoint(eager=True)
    touched = (
        pairs.select(F.col(pair_a).alias("id"))
        .union(pairs.select(F.col(pair_b).alias("id")))
        .distinct()
    )
    cc = connected_components(
        touched, pairs, id_col="id", src_col=pair_a, dst_col=pair_b,
        stats=stats, strategy=strategy,
    )
    base = nodes.select(F.col(id_col).cast("bigint").alias("id"))
    labeled = base.join(cc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("label", "id").alias("cluster_rep"),
        (F.coalesce("label", "id") == F.col("id")).alias("is_rep"),
    )
    return labeled


def leakage_free_splits(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str,
    pair_b: str,
    weights: list[tuple[str, int]] | None = None,
    salt: str = "split1",
) -> DataFrame:
    """Train/val/test assignment with the contamination guard: every
    member of a near-dup CLUSTER lands in the SAME split, because the
    split is hashed from the cluster representative, never the doc id.
    Plain per-doc hash splitting leaks — a near-duplicate of a training
    document sitting in the test split inflates eval scores; splitting
    by connected component makes that impossible by construction.

    weights are (name, weight) in order; a cluster goes to the split
    whose cumulative weight range contains md5(salt|rep) % total — the
    same deterministic hash-Bernoulli discipline as epoch_split, so any
    engine/partitioning reproduces the assignment. Split proportions are
    approximate at cluster granularity (a giant cluster moves as one
    unit — the price of zero leakage, and the reason to dedup first).

    Scale: clustering cost is the existing dedup_clusters path
    (edge-sized iteration); the assignment itself is a pure column
    expression over (id, cluster_rep) — no extra shuffle.

    Returns (id_col, cluster_rep, split).
    """
    from db_integration_via_kafka_ksql_spark.functions import text as T

    if weights is None:
        weights = [("train", 80), ("val", 10), ("test", 10)]
    if not weights or any(w <= 0 for _, w in weights):
        raise ValueError(f"weights must be positive: {weights!r}")
    total = sum(w for _, w in weights)
    clusters = dedup_clusters(nodes, pairs, id_col, pair_a, pair_b)
    bucket = T.hex_hash_int(
        F.concat(F.lit(salt + "|"), F.col("cluster_rep").cast("string"))
    ) % total
    expr = F.lit(weights[-1][0])  # fallthrough = last split
    acc = 0
    conds = []
    for name, w in weights[:-1]:
        acc += w
        conds.append((acc, name))
    for acc_w, name in reversed(conds):
        expr = F.when(bucket < acc_w, F.lit(name)).otherwise(expr)
    return clusters.select(id_col, "cluster_rep", expr.alias("split"))


PAGERANK_SCALE = 1_000_000_000_000  # ranks in integer picoshares of 1.0
PAGERANK_DAMP_NUM = 85  # damping 0.85 as the exact rational 85/100
PAGERANK_DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge frame (src, dst).

    Ranks are integer "picoshares" (PAGERANK_SCALE = one unit of
    probability mass); every update is integer math — contributions are
    ``rank DIV out_degree``, the damping factor is the exact rational
    85/100 — so the fixed iteration count yields bit-identical ranks on
    any partitioning, and the DuckDB oracle can replay the entire
    iteration chain (the kmeans discipline for iterative operators).
    Floor division leaks a few picoshares per step; that loss is
    deterministic and identical in the oracle.

    Node universe = distinct(src) UNION distinct(dst); BIGINT ids. Nodes
    with out-edges but no in-edges are kept in the rank frame at the
    damping base term every iteration (the per-iteration aggregate is
    left-joined back to the node universe), so their outgoing
    contributions keep flowing — a plain ``contribs.groupBy`` would
    silently drop them after iteration 1. Dangling nodes (in-edges
    only) accumulate rank but redistribute nothing, the standard
    no-redistribution variant: total mass is NOT conserved on graphs
    with dangling nodes — symmetrize first if conservation matters.

    Scale shape (100 TB): the edge frame is joined per iteration on
    ``src`` against the node-sized rank frame — edges are repartitioned
    by src ONCE and checkpointed with their out-degree denormalized, so
    each iteration costs one node-sized shuffle (the contribution
    groupBy, map-side combined) plus the rank-frame join that reuses the
    edge partitioning. Rank frames are localCheckpoint-ed per iteration
    to truncate lineage (see the connected-components note above).

    Returns (node, rank_scaled).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edeg = (
        edges.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # bounded scalar collect (one long)
    init = PAGERANK_SCALE // n_nodes
    base = (15 * init) // 100
    ranks = nodes.select("node", F.lit(init).cast("long").alias("r"))
    for _ in range(iterations):
        contribs = edeg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), F.expr("r DIV deg").alias("c"))
        agg = contribs.groupBy("node").agg(
            F.expr(
                f"{base} + {PAGERANK_DAMP_NUM} * CAST(sum(c) AS BIGINT)"
                f" DIV {PAGERANK_DAMP_DEN}"
            ).alias("r")
        )
        # Source-only nodes receive no contributions; keep them at the
        # base term so their own outgoing mass survives the iteration.
        ranks = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("r"), F.lit(base).cast("long")).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    UNDIRECTED graph given as a symmetric edge frame (src, dst; both
    directions present, no self-loops) — the graph-density diagnostic a
    curation pass runs on a near-dup pair graph (dense triangles = a
    template family, not organic duplication).

    Algorithm (the degree-ordered orientation of node-iterator triangle
    counting — standard distributed formulation, e.g. Suri & Vassilvitskii's
    MR triangle counting): orient every undirected edge from the
    lower-(degree, id) endpoint to the higher one; each triangle then has
    exactly ONE wedge (a->b, a->c) at its minimum vertex, so joining the
    wedge frame against the oriented edge (b->c) counts every triangle
    exactly once. Orientation bounds the wedge fan-out by the oriented
    out-degree, which is O(sqrt(|E|)) for any graph — the skew story: a
    celebrity node of degree 1M generates wedges only toward HIGHER-degree
    nodes, of which there are few, instead of 10^12 unordered wedges.

    Integer discipline: coefficient = 2*tri * 1000 DIV (deg*(deg-1)),
    permille (0 for degree < 2) — exact on both engines.

    Scale shape: two shuffles for degrees + orientation, one self-join on
    the oriented edge key for wedges, one equi-join probe (b, c) against
    the oriented edges, then a node-keyed count. The oriented frame is
    checkpointed once (it feeds the wedge self-join twice AND the probe —
    the unionAll/multi-consumer double-compute trap).

    Returns (node, degree, n_triangles, clustering_permille).
    """
    # deg feeds three consumers (both orientation sides + the final
    # projection) — materialize once or each replans the edge aggregate
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # orient: keep (a=src, b=dst) where (deg_a, a) < (deg_b, b)
    da = deg.withColumnRenamed("src", "a").withColumnRenamed("deg", "da")
    db = deg.withColumnRenamed("src", "b").withColumnRenamed("deg", "db")
    oriented = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b", "db")
        .localCheckpoint(eager=True)
    )
    # wedge endpoints must be ordered by the SAME (deg, id) key as the
    # orientation — ordering by id alone would probe (x -> y) for closing
    # edges the orientation stored as (y -> x) and silently undercount
    w1 = oriented.select(F.col("a"), F.col("b").alias("x"), F.col("db").alias("dx"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = w1.join(w2, "a").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closed = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    )
    # every triangle appears once in `closed` as (a, x, y); credit all 3
    tri_nodes = (
        closed.select(F.col("a").alias("node"))
        .unionByName(closed.select(F.col("x").alias("node")))
        .unionByName(closed.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.withColumnRenamed("src", "node")
        .join(tri_nodes, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.expr("2 * coalesce(n_triangles, 0) * 1000 DIV (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("clustering_permille"),
        )
    )


def cooccurrence_knn_edges(
    pairs_src: DataFrame,
    item_col: str,
    context_col: str,
    k: int,
    context_cap: int | None = None,
) -> DataFrame:
    """Symmetric top-k strongest-partner edges from shared-context
    co-occurrence: edge weight = number of distinct contexts two items
    share; each item keeps its k strongest partners (ties to the lower
    partner id); the union of both directions is the undirected graph
    `triangle_stats` consumes. This is the kNN sparsifier for
    similarity graphs — a fixed weight THRESHOLD degenerates to a
    complete graph as the corpus grows; top-k is scale-invariant.

    `context_cap` is the scale knob (the third member of the r14
    bounded-occupancy family, with dedup.auto_lsh_planes and
    kmeans.auto_semdedup_k): the per-context pair space is
    occupancy²/2, so one hot context shared by 10^4 items contributes
    5*10^7 candidate pairs while carrying almost no partner SIGNAL (a
    context everyone shares distinguishes nobody — the stop-word
    argument, identical to the dedup family's df_cap). Capping drops
    contexts with more than `context_cap` distinct items BEFORE the
    self-join, bounding candidates at n_contexts * cap² / 2. Capping
    changes results by design (hot-context weight is removed); the
    oracle-gated registry query pins cap=None so its SQL replay stays
    exact, and production corpora opt in.

    Scale shape: one distinct + (optional) one context-occupancy
    semi-filter + one context-keyed equi self-join with map-side-combined
    pair counting, one per-item top-k window over <= n*k rows, one
    distinct union. The pair frame is checkpointed once (it feeds both
    direction branches — the unionAll double-compute trap).

    Returns (src, dst), both directions present, checkpointed.
    """
    from pyspark.sql.window import Window

    ic = pairs_src.select(
        F.col(context_col).alias("p"), F.col(item_col).alias("s")
    ).distinct()
    if context_cap is not None:
        if context_cap < 1:
            raise ValueError(f"context_cap must be >= 1, got {context_cap}")
        # occupancy as a count-over-p window instead of a groupBy+join
        # (r17, guide §2.4): same rows kept — count(*) over (partition by
        # p) on the distinct frame IS the context occupancy — but one
        # p-keyed exchange instead of an aggregate exchange PLUS a join
        # back, and the self-join below reuses the window's p
        # partitioning (measured: the candidate phase 4.6 s -> 2.9 s at
        # sf0.1; same shape win at 100 TB where the dropped join carried
        # the full distinct index)
        ic = (
            ic.withColumn(
                "n", F.count(F.lit(1)).over(Window.partitionBy("p"))
            )
            .filter(F.col("n") <= context_cap)
            .select("p", "s")  # drop stop-word contexts pre-join
        )
    pairs = (
        ic.alias("a")
        .join(
            ic.alias("b"),
            (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .localCheckpoint(eager=True)
    )
    dirs = pairs.select(
        F.col("sa").alias("s"), F.col("sb").alias("nbr"), "shared"
    ).unionByName(
        pairs.select(F.col("sb").alias("s"), F.col("sa").alias("nbr"), "shared")
    )
    w = Window.partitionBy("s").orderBy(F.col("shared").desc(), F.col("nbr").asc())
    kept = (
        dirs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("s", "nbr")
        .localCheckpoint(eager=True)  # feeds both symmetrize branches
    )
    return (
        kept.unionByName(
            kept.select(F.col("nbr").alias("s"), F.col("s").alias("nbr"))
        )
        .distinct()
        .select(F.col("s").alias("src"), F.col("nbr").alias("dst"))
        .localCheckpoint(eager=True)  # feeds deg + orientation downstream
    )


def bfs_levels(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Breadth-first hop levels from a source set over a directed edge
    frame (src, dst): level(v) = minimum number of hops from any source,
    explored to ``max_hops``. The bounded-radius reachability primitive —
    "everything within k hops of these seeds" is how a curation pass
    expands from a trusted (or poisoned) seed set along a similarity/
    interaction graph, and the third member of the iterative-graph family
    (connected_components labels reachability, pagerank weighs it, BFS
    DISTANCES it).

    ``sources`` is a single-column ``node`` frame (typically tiny — a
    seed list). Returns (node, level), level 0 = the sources themselves;
    unreached nodes are absent. Levels are exact by construction (the
    frontier at hop h is exactly the nodes first reached at h), so a
    fixed ``max_hops`` replays bit-identically in SQL as an unrolled CTE
    chain (the kmeans/pagerank discipline for iterative operators).

    Scale shape (100 TB): edges are repartitioned by ``src`` ONCE and
    checkpointed; each hop is one frontier equi-join on that partitioning
    + one distinct + one anti-join against the visited frame (node-sized,
    never edge-sized state); per-hop localCheckpoint truncates the
    lineage (the connected-components note). The only driver action is a
    1-row ``take`` per hop for early exit on an empty frontier — cheaper
    than scheduling ``max_hops - h`` dead joins.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    visited = (
        sources.select("node")
        .distinct()
        .select("node", F.lit(0).cast("long").alias("level"))
        .localCheckpoint(eager=True)
    )
    if max_hops == 0:
        return visited  # never pay the edge-frame scan/shuffle
    e = edges.select("src", "dst").repartition("src").localCheckpoint(
        eager=True
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(hop).cast("long").alias("level"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):  # frontier exhausted — bounded 1-row collect
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited
