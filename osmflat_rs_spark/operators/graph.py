"""Connected components — the operator that turns near-duplicate PAIRS
into duplicate CLUSTERS (pick one representative per component, drop the
rest): the step every dedup pipeline needs after MinHash/SimHash/SRP
candidate generation, and the reference has no analog for (its relations
form a static forest resolved at build time; a dedup graph is dynamic).

Algorithm: iterative MIN-LABEL PROPAGATION with POINTER JUMPING.
Per round, each node takes the minimum label over itself and its
neighbors (one shuffle: edges ⋈ labels → groupBy-min, map-side
partials), then labels are compressed one hop (labels ⋈ labels on
lbl = node — the classic pointer-jumping/path-halving step). Plain
neighbor-min alone needs O(diameter) rounds — a pathological chain of n
near-dup docs would need n rounds; the jumping step doubles the
distance a label travels per round, so convergence is O(log n) rounds
for ANY topology (each round ~2 bounded shuffles). This is the
published two-phase recipe (Kiveris et al. 2014 "Connected Components
in MapReduce and Beyond" — their small-star/large-star achieves the
same bound; min-label + jumping is the simpler equivalent for
undirected label diffusion).

Scale notes:
- State per round is ONE (node, label) row per node — never edge-
  amplified; the edge table is re-joined each round (re-scan beats
  materializing per-round edge copies).
- Each round ends with an EAGER localCheckpoint: iterative Spark plans
  otherwise nest the full lineage per round (plan size doubles per
  iteration and the optimizer re-walks it — the standard iterative-
  algorithm trap).
- Convergence is detected with a driver-side count of changed labels —
  one scalar action per round, the legitimate driver-loop exception
  (bounded by the O(log n) round count).
- Labels are node ids, so the component representative is the MINIMUM
  node id in the component — deterministic, partition-invariant, and
  reproducible by a SQL recursive CTE (the driver gate's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Components of the undirected graph → (node, component).

    ``component`` is the minimum node id in the node's component. Nodes
    are exactly the ids appearing in ``edges`` (isolated ids the caller
    wants labeled can be passed as self-loops). Raises RuntimeError if
    not converged after ``max_iter`` rounds (O(log n) suffices — the
    guard exists so a mis-wired input fails loudly, not silently)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # undirected, deduped edge list (both directions, self-edges dropped)
    a = edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    both = a.unionByName(a.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = both.filter(F.col("u") != F.col("v")).distinct().persist()
    # nodes come from the PRE-filter edge list so a self-loop registers
    # its node (the documented way to label isolated ids)
    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor minimum (self label included via union); the self row
        # also THREADS the previous label through the aggregate (max of
        # the null-for-neighbors column), so the convergence check below
        # is a filter on the round's own output — no labels-vs-new
        # comparison join, one fewer shuffle per round
        nb = e.join(labels, e["v"] == labels["node"]).select(
            F.col("u").alias("node"), F.col("lbl"), F.lit(None).cast("long").alias("_old")
        )
        new = (
            labels.select("node", "lbl", F.col("lbl").alias("_old"))
            .unionByName(nb)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"), F.max("_old").alias("_old"))
        )
        # pointer jumping: lbl <- lbl(lbl); every label IS a node id
        hop = new.select(F.col("node").alias("_n2"), F.col("lbl").alias("_l2"))
        new = (
            new.join(hop, new["lbl"] == hop["_n2"])
            .select("node", F.col("_l2").alias("lbl"), "_old")
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("lbl") != F.col("_old")).count()
        labels = new.select("node", "lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    e.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_cluster_representatives(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → (node, component, is_representative): the
    keep-one-per-cluster decision. The representative is the component's
    minimum id (the label itself), so the kept set is deterministic."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        "node", "component", (F.col("node") == F.col("component")).alias("is_representative")
    )


def pagerank_uniform(
    edges: DataFrame,
    n_nodes: int,
    out_degree: int,
    iters: int,
    d_num: int = 17,
    d_den: int = 20,
    src: str = "src",
    dst: str = "dst",
    validate: bool = True,
) -> DataFrame:
    """PageRank power iteration in EXACT integer arithmetic →
    (node, rank_scaled, rank_ppb), for graphs whose every node has the
    same out-degree (the gate's synthetic road mesh; also the shape of
    k-regular similarity graphs from kNN joins).

    With damping d = d_num/d_den and uniform out-degree g, define the
    scaled rank R_t(v) = rank_t(v) · n · (d_den·g)^t. Then the power
    iteration rank' = (1−d)/n + d·Σ_in rank/g becomes PURE BIGINT
    recurrence:

        R_0(v)     = 1
        R_{t+1}(v) = (d_den−d_num)·g·(d_den·g)^t + d_num·Σ_{u→v} R_t(u)

    so every intermediate is an exact integer, partition- and order-
    invariant — the gate hash-checks VALUES, not a float tolerance
    (total mass Σ_v R_t = n·(d_den·g)^t exactly, asserted in tests).
    ``rank_ppb`` = floor(R_T·10⁹ / (n·(d_den·g)^T)) is the rank in
    parts-per-billion, still exact integer division in both engines.

    Scale shape (same discipline as ``shortest_paths``): per round ONE
    (node, R) row per node; one equi-join against the re-scanned edge
    table + one map-side-combined sum + a left join back onto the node
    range for the teleport term; eager localCheckpoint per round (the
    iterative-lineage trap). Fixed ``iters`` — no driver-side
    convergence action at all. Multi-edges contribute multiply
    (multigraph semantics, documented); dangling nodes are rejected by
    ``validate`` because uniform out-degree is the integrality
    precondition.

    The reference has no ranking operator (its graphs are the static
    ways/relations forest); this is north-rule surface — centrality over
    the road mesh the engine already builds shortest paths on.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < d_num < d_den):
        raise ValueError(f"need 0 < d_num < d_den, got {d_num}/{d_den}")
    base = d_den * out_degree
    if n_nodes * base**iters >= 2**62:
        raise ValueError(
            f"scaled ranks would overflow int64: n·(d_den·g)^T = "
            f"{n_nodes * base**iters} >= 2^62 — lower iters or d_den"
        )
    # the ppb projection multiplies by 1e9 BEFORE dividing; when the
    # worst-case product can overflow (big graphs), emit NULL ppb and
    # keep the exact rank_scaled (callers divide driver-side instead)
    ppb_safe = n_nodes * base**iters * 10**9 < 2**63
    spark = edges.sparkSession
    e = edges.select(F.col(src).cast("long").alias("_s"), F.col(dst).cast("long").alias("_d"))
    if validate:
        bad_deg = e.groupBy("_s").count().filter(F.col("count") != out_degree).limit(1).count()
        n_src = e.select("_s").distinct().count()
        if bad_deg or n_src != n_nodes:
            raise ValueError(
                f"pagerank_uniform requires every node in [0, {n_nodes}) to have "
                f"out-degree exactly {out_degree} (found non-uniform degree: "
                f"{bool(bad_deg)}, distinct sources: {n_src})"
            )
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    ranks = nodes.select("node", F.lit(1).cast("long").alias("r"))
    for t in range(iters):
        tele = (d_den - d_num) * out_degree * base**t
        contrib = (
            e.join(ranks, e["_s"] == ranks["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("r").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(tele) + F.lit(d_num) * F.coalesce(F.col("_in"), F.lit(0))
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    denom = n_nodes * base**iters
    ppb = (
        F.expr(f"(r * CAST(1000000000 AS BIGINT)) div CAST({denom} AS BIGINT)")
        if ppb_safe
        else F.lit(None).cast("long")
    )
    return ranks.select("node", F.col("r").alias("rank_scaled"), ppb.alias("rank_ppb"))


def shortest_paths(
    edges: DataFrame,
    sources: list,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Multi-source hop-bounded shortest paths (distributed Bellman-Ford
    with delta relaxation) → (source, node, dist).

    ``dist`` is the minimum total ``weight`` over DIRECTED paths from
    ``source`` with at most ``max_hops`` edges; unreachable (source,
    node) pairs emit no row; the source itself is distance 0. The hop
    bound is part of the SEMANTICS (it makes the result finite-path-
    enumerable — exactly restatable as a bounded recursive SQL walk —
    and is the routing-domain "within N segments" question); when the
    frontier drains earlier, the loop exits early with the identical
    answer, because no longer path can improve a settled distance
    under non-negative weights (validated).

    Scale shape (same discipline as ``connected_components``):

    - per-round state is ONE (source, node, dist) row per settled pair;
      only the FRONTIER (pairs improved last round — the delta) joins
      the edge table, so relaxation work tracks the wavefront, not the
      settled mass;
    - each round is one equi-join (frontier ⋈ edges on node = src,
      broadcast-eligible when the frontier is small) + one map-side-
      combined min-agg + one min-merge against the settled table;
    - rounds end with an EAGER localCheckpoint (lineage trap) and a
      driver-side emptiness check (one scalar action, bounded by
      ``max_hops``).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).cast("long").alias("_es"),
        F.col(dst).cast("long").alias("_ed"),
        F.col(weight).cast("long").alias("_ew"),
    )
    neg = e.filter(F.col("_ew") < 0).limit(1).count()
    if neg:
        raise ValueError("shortest_paths requires non-negative weights")
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, node long, dist long"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_hops):
        relaxed = (
            frontier.join(e, frontier["node"] == e["_es"])
            .select("source", F.col("_ed").alias("node"), (F.col("dist") + F.col("_ew")).alias("dist"))
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
        )
        # strictly-better candidates only (the delta)
        improved = (
            relaxed.join(
                dist.select("source", "node", F.col("dist").alias("_old")),
                ["source", "node"],
                "left",
            )
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("source", "node", "dist")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.unionByName(improved)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist
