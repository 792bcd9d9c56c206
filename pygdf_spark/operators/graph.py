"""Iterative graph operators: connected components by distributed
min-label propagation with path compression.

Reference parity: cuDF itself has no graph ops (cuGraph's domain), but
corpus-dedup pipelines need the transitive closure of the near-dup
pair graph — the reference's users run exactly this downstream of
MinHash. Here it is a first-class distributed operator.

Scale design (100 TB posture):
- the driver loop iterates over ROUNDS (O(log D) of them, D = graph
  diameter, thanks to path compression), never over rows; each round
  is two keyed shuffles (neighbor-min groupBy + label-pointer join),
  the same plan shape as the large-star/small-star CC algorithms used
  at web scale.
- labels monotonically decrease, so convergence is a fixpoint; the
  per-round `changed` check is a count aggregate (one job), and
  `localCheckpoint` truncates lineage so round N's plan does not embed
  rounds 1..N-1 (without it the DAG doubles per round and the
  optimizer, not the data, becomes the bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp): every vertex labeled with the minimum vertex id of
    its connected component. ``edges`` is undirected (each pair may
    appear in either or both orientations).

    Per round: (1) propagate — every vertex takes the min label in its
    closed neighborhood; (2) compress — every vertex jumps to its
    label's label (pointer doubling, so chains collapse in O(log D)
    rounds, not O(D))."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # hash-partition the symmetrized edge table by the join key ONCE
    # and persist: every round joins on u, and the cached partitioning
    # satisfies the join's distribution requirement, so rounds 2..K
    # skip re-shuffling the (unchanging) edge side entirely (opt r7,
    # guide §2.4 "share one exchange"); unpersisted before return
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .persist()
    )
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # (1) min label over the closed neighborhood
        nbr_min = (
            sym.join(labels, sym.u == labels.id)
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        # carry the pre-round label as ``old`` so the fixpoint test is
        # a FILTER over the round's own output instead of a second
        # keyed join against the previous labels (opt r7, guide §2.4);
        # the lazy checkpoint folds cache population into the same
        # ``changed`` probe job (an eager checkpoint + join-count ran
        # two jobs and one extra shuffle per round)
        l1 = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.col("label").alias("old"),
                    F.least("label", "nmin").alias("label"))
        )
        # (2) path compression: label ← label's label
        ptr = l1.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        l2 = (
            l1.join(ptr, l1.label == ptr.pid, "left")
            .select("id", "old", F.least("label", "plabel").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            l2.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        labels = l2.select("id", "label")
        if changed == 0:
            break
    else:
        # exhausted max_iter with labels still moving: returning them
        # would silently split one component into several (downstream
        # dedup would then KEEP duplicates) — fail loudly instead
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "propagate+compress rounds (component diameter > 2^"
            f"{max_iter}); raise max_iter"
        )
    # safe: the converged round's full count() materialized the final
    # labels, so the returned frame reads cached blocks, not sym
    sym.unpersist()
    return labels.select("id", F.col("label").alias("comp"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, hop): minimum hop distance from ANY source vertex —
    multi-source breadth-first search over an undirected edge list
    (single-source is the 1-row special case). The level-synchronous
    frontier algorithm every distributed graph engine uses (Pregel /
    GraphX shape):

    per round: expand the frontier through the (symmetrized) edges —
    one keyed shuffle — then anti-join the visited set so each vertex
    settles exactly once, at its first (= minimum) hop. Rounds =
    eccentricity of the source set, NOT O(V); each round's frontier is
    materialized once with localCheckpoint (truncating lineage like
    connected_components above) and the visited set stays a LAZY union
    of those checkpointed frontiers — re-materializing the growing
    union every round would copy O(V) rows per round, O(V·rounds)
    total, for zero information (opt r7, guide §1.2: the union's pieces
    are already cached blocks). Unreachable vertices are absent from
    the output (no sentinel hops).

    Raises after ``max_iter`` rounds with the frontier non-empty —
    a truncated BFS would silently report infinite distances as
    merely-unvisited."""
    from functools import reduce

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # same one-time edge partitioning as connected_components above:
    # every round's expansion joins on u, so the persisted layout lets
    # rounds 2..K skip re-shuffling the edge side (guide §2.4)
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .persist()
    )
    parts = [
        sources.select(F.col(sources.columns[0]).alias("id")).distinct()
        .withColumn("hop", F.lit(0).cast("long"))
        .localCheckpoint()
    ]
    frontier = parts[0]
    for hop in range(1, max_iter + 1):
        visited = reduce(lambda a, b: a.union(b), parts)
        # LAZY checkpoint + full count(): the expansion, the cache
        # population, and the emptiness test share ONE job per round
        # (an eager checkpoint followed by a count ran two)
        nxt = (
            sym.join(
                frontier.select(F.col("id").alias("u")), "u"
            )
            .select(F.col("v").alias("id")).distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hop", F.lit(hop).cast("long"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            # every part was fully materialized by its own count();
            # the returned union reads cached blocks, not sym
            sym.unpersist()
            return visited
        parts.append(nxt)
        frontier = nxt
    sym.unpersist()
    raise RuntimeError(
        f"bfs_hops frontier still expanding after {max_iter} rounds; "
        "raise max_iter"
    )


def pagerank_micro(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iters: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank_micro): PageRank power iteration in EXACT integer
    µ-unit arithmetic, so the result is bit-identical across engines
    and partitionings (the oracle-pinnable form — float PageRank sums
    contributions in nondeterministic order). Per iteration:

        r'(v) = (100 - d)% · 1e6  +  d% · Σ_{u→v} (r(u) DIV outdeg(u))

    with BIGINT floor divisions; dangling-vertex mass is dropped
    (documented spec, matched by the oracle). Fixed ``iters`` rounds —
    the unrolled-iteration contract the recursive oracle mirrors, same
    as the k-means/PQ queries.

    Scale shape: each round is one edges⋈ranks broadcast-or-shuffle
    join + one keyed sum; lineage is truncated per round
    (localCheckpoint) exactly like connected_components above.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    verts = e.select(F.col("a").alias("id")).union(
        e.select(F.col("b").alias("id"))
    ).distinct().localCheckpoint()
    # localCheckpoint like verts: every iteration's plan embeds deg, so
    # an unmaterialized groupBy would re-scan+re-shuffle the edge table
    # once per round
    deg = (
        e.groupBy(F.col("a").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    base = (100 - damping_pct) * 10_000  # (100-d)% of 1e6 µ
    r = verts.withColumn("r", F.lit(1_000_000).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(r.withColumnRenamed("id", "a"), "a")
            .join(deg.withColumnRenamed("id", "a"), "a")
            .select("b", F.expr("r div deg").alias("c"))
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum("c").alias("s"))
        )
        r = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return r.select("id", F.col("r").alias("rank_micro"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact distributed triangle count (the "forward" / degree-
    orientation algorithm — Schank & Wagner 2005, the shape every
    distributed graph system uses): orient each undirected edge from
    its (degree, id)-smaller endpoint, enumerate directed 2-paths
    x→y→z, and close them against the oriented edge set. Degree
    orientation bounds every out-degree by O(√m), so the wedge join is
    O(m^1.5) worst case instead of Σdeg² — the difference between a
    star node exploding the join and not.

    ``edges``: (a, b) rows, any direction/duplication; self-loops
    dropped. Returns ONE row: n_nodes, n_edges, n_triangles,
    tri_checksum (Σ(a+b+c) over unique triangles — orientation-
    independent, so an id-oriented oracle reproduces it exactly).
    Plan: 2 keyed shuffles for degree+orientation, one wedge join, one
    closing semi-join, all equi-joins on node keys."""
    e = (
        edges.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    try:
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        j = (
            e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
            .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
        )
        lower_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        o = j.select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        ).persist()
        try:
            wedges = (
                o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                .join(
                    o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
                    "b",
                )
            )
            tris = wedges.join(
                o.select(F.col("src").alias("a"), F.col("dst").alias("c")),
                ["a", "c"],
                "left_semi",
            )
            n_nodes = deg.count()
            n_edges = e.count()
            # the result is ONE row — materialize it eagerly so the
            # persisted e/o (each referenced 3x by the join tree) are
            # actually reused, then release them (the ivf_probe_topk
            # persist-leak lesson: never return a lazy plan over a
            # cache you are about to drop)
            row = tris.agg(
                F.count(F.lit(1)).alias("n_triangles"),
                F.coalesce(
                    F.sum(F.col("a") + F.col("b") + F.col("c")), F.lit(0)
                ).cast("long").alias("tri_checksum"),
            ).collect()[0]
            spark = edges.sparkSession
            return spark.createDataFrame(
                [(int(n_nodes), int(n_edges), int(row["n_triangles"]),
                  int(row["tri_checksum"]))],
                "n_nodes long, n_edges long, n_triangles long, "
                "tri_checksum long",
            )
        finally:
            o.unpersist()
    finally:
        e.unpersist()
