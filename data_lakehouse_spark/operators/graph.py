"""Distributed connected components — the transitive-closure step that
turns pairwise near-dup candidates into full dedup clusters.

``embedding_dedup_canonical`` / ``minhash``-style pair generators emit
EDGES; a cluster is the connected component of the similarity graph.
The single-hop min-neighbor collapse (operators/similarity.py
``embedding_dedup_canonical``) is the right first pass, but chains
(A~B~C with A≁C) need the fixed point. This module computes it in two
phases (the contract-then-iterate shape of the MapReduce-CC family;
cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014):

- contract: hook every vertex to ``min(v, min neighbor)`` — ONE
  aggregation over the full edge set — and project edges onto hook
  labels. Near-dup components are tiny, so the contracted graph is
  orders of magnitude smaller than the input; the full-size data is
  touched exactly once more (the edge projection joins).
- finish the residue: once the contracted edge count fits under
  ``driver_finish_max_edges`` (it does after one hook on every real
  near-dup graph — components are tiny), a driver-side union-find
  closes it in one pass and the result broadcasts back. Until then,
  contraction repeats on the (already shrunken) residue — each hook
  halves every chain, so the loop is O(log diameter) rounds over
  geometrically shrinking data, never the full input again.

Why the guarded driver finish is the scale-correct call and not a
collect-smell: the full edge set is touched by exactly two shuffles
(the hook aggregation and the label projection); what reaches the
driver is bounded by the guard and is the CONTRACTED graph — one edge
per adjacent pair of hook-clusters — not the input. Distributed
per-round label propagation on that residue costs ~seconds of fixed
scheduling overhead per round for data that fits in one task; a
union-find on ≤5M edges is milliseconds. The repeated-contraction
fallback keeps every step distributed when the residue is genuinely
huge (adversarial long chains).

Reference parity: the reference has no graph tier; this extends the
LLM-dedup surface (driver brief) past single-hop canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    vertex_col: str = "vec_id",
    max_iter: int = 25,
    driver_finish_max_edges: int = 5_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id reachable from it
    → ``(vertex, component_id)``.

    ``edges`` is undirected input (each pair once is enough; it is
    symmetrized internally). ``vertices`` optionally supplies the full
    vertex universe so isolated vertices (no edges) appear as their own
    singleton components — pass it for dedup so clean documents are
    still labeled. Raises if ``max_iter`` contraction rounds don't
    shrink the residue under ``driver_finish_max_edges`` (each round
    halves chain depth; never observed past round one on near-dup
    graphs).

    Pass ``stats`` (a dict; mutated in place) to get the scale
    instrumentation the SCALING diagnosis reads: ``input_edges``
    (symmetrized count), ``residue_edges`` (contracted-graph sizes per
    residue round, so ``residue_edges[0]`` is what one hook pass left),
    ``residue_rounds`` (extra distributed contraction rounds taken —
    0 means the first contraction fit the driver guard), and
    ``finish`` (``"driver_union_find"`` or ``"empty"``). Collecting it
    adds one count job over the checkpointed edge set.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    # Materialize the (possibly expensive) pair-generation plan ONCE —
    # the contraction below reads it three times, and without this the
    # upstream candidate generator (e.g. the block GEMM) would re-run
    # per read. Symmetrize by exploding each edge into both directions
    # (a UNION of the plan with its swapped self evaluates the upstream
    # generator once per branch — exchange reuse does not fire across
    # Python-kernel subtrees, so the GEMM/LSH would run twice).
    sym = _symmetrize(e).localCheckpoint()
    if stats is not None:
        stats["input_edges"] = sym.count()

    # Phase 1 — contract: hook every vertex to the minimum of itself and
    # its direct neighbors (one shuffle over the full edge set), then
    # project edges onto hook labels. This is the ONLY full-size pass;
    # everything after runs on the contracted residue.
    # Correctness: each component's global-minimum vertex m hooks to
    # itself (no neighbor is smaller), contraction preserves
    # connectivity, so the component id of v is the contracted-graph
    # component of hook(v).
    hook, contracted = _hook_and_project(sym)
    comp = _cc_residue(
        spark, contracted, max_iter, driver_finish_max_edges, stats=stats
    )

    # Phase 2 — expand: component(v) = comp(hook(v)); hook labels whose
    # whole component collapsed in one hop have no contracted edge and
    # keep themselves. Isolated vertices (present in ``vertices`` but
    # edge-free) become singleton components via the left join. ``comp``
    # is residue-sized — the join broadcasts.
    labeled = (
        hook.join(F.broadcast(comp), hook["h"] == comp["cv"], "left")
        .select(
            F.col("a").alias("v"),
            F.coalesce("clabel", F.col("h")).alias("component_id"),
        )
    )
    if vertices is not None:
        verts = vertices.select(
            F.col(vertex_col).cast("bigint").alias("v")
        ).distinct()
        labeled = (
            verts.join(labeled, "v", "left")
            .select("v", F.coalesce("component_id", F.col("v")).alias("component_id"))
        )
    return labeled.select(F.col("v").alias(vertex_col), "component_id")


def _symmetrize(e: DataFrame) -> DataFrame:
    """Undirected edge list → both directions in ONE pass over the
    input: explode each (a, b) into [(a, b), (b, a)] instead of
    unioning the plan with its swapped self (which evaluates the
    upstream pair generator once per union branch)."""
    return e.select(
        F.explode(
            F.array(
                F.array(F.col("a"), F.col("b")),
                F.array(F.col("b"), F.col("a")),
            )
        ).alias("_e")
    ).select(
        F.col("_e").getItem(0).alias("a"), F.col("_e").getItem(1).alias("b")
    )


def _hook_and_project(
    sym: DataFrame, *, close: bool = False
) -> tuple[DataFrame, DataFrame]:
    """One contraction round: ``hook(v) = min(v, min neighbor)`` (one
    shuffle) and the edge projection onto hook labels (two joins) →
    ``(hook: a→h, contracted edges a<b, deduped)``.

    ``close=True`` pointer-jumps the hook map to its root closure
    first (``h ← h(h)`` until fixed — O(log depth) rounds of map-sized
    self-joins), so each vertex contracts to its hook-forest ROOT (its
    valley's local minimum) rather than its immediate hook. That is
    what makes repeated contraction shrink multiplicatively even on
    adversarial monotone chains; it costs extra rounds, so the
    top-level full-size pass leaves it off and only the residue loop
    (already small) turns it on."""
    hook = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_nb"))
        .select("a", F.least(F.col("a"), F.col("_nb")).alias("h"))
        .localCheckpoint()
    )
    if close:
        hook = _close_hook_map(hook)
    ha = hook.select(F.col("a").alias("_ea"), F.col("h").alias("ha"))
    hb = hook.select(F.col("a").alias("_eb"), F.col("h").alias("hb"))
    contracted = (
        sym.join(ha, sym["a"] == ha["_ea"])
        .join(hb, sym["b"] == hb["_eb"])
        .filter(F.col("ha") != F.col("hb"))
        .select(
            F.least("ha", "hb").alias("a"), F.greatest("ha", "hb").alias("b")
        )
        .distinct()
    )
    return hook, contracted


def _close_hook_map(hook: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Pointer-jump a functional ``a→h`` map to its root closure.
    Hook targets are strictly ≤ their source, so depth halves per
    ``h ← h(h)`` round and the fixed point arrives in O(log depth)
    rounds; each round is one map-sized self-join plus the count that
    materializes the lazy checkpoint."""
    cur = hook
    for _ in range(max_rounds):
        nxt_ref = cur.select(F.col("a").alias("_a2"), F.col("h").alias("_h2"))
        stepped = (
            cur.join(nxt_ref, cur["h"] == nxt_ref["_a2"], "left")
            .select(
                "a",
                F.coalesce("_h2", F.col("h")).alias("h"),
                (F.coalesce("_h2", F.col("h")) != F.col("h")).alias("_moved"),
            )
            .localCheckpoint(eager=False)
        )
        moved = stepped.filter(F.col("_moved")).count()
        cur = stepped.drop("_moved")
        if moved == 0:
            return cur
    raise RuntimeError(f"hook-map closure did not fix in {max_rounds} rounds")


def _cc_residue(
    spark,
    edges: DataFrame,
    max_iter: int,
    driver_finish_max_edges: int,
    stats: dict | None = None,
) -> DataFrame:
    """Close the contracted residue → ``(cv, clabel)`` map covering
    every vertex that appears in ``edges``. Repeats contraction while
    the residue exceeds the driver guard (distributed, geometrically
    shrinking), then finishes with a single-pass union-find."""
    maps: list[DataFrame] = []  # composition chain, innermost first
    if stats is not None:
        stats["residue_edges"] = []
    cur = edges
    for _ in range(max_iter):
        # Materialize the contracted residue before counting it: the
        # count below and the consumer that follows (union-find read or
        # the next contraction round) otherwise each re-run the full
        # contraction plan (two joins + distinct over the checkpointed
        # edge set) — the residue is contracted-graph-sized, cheap to
        # hold, and is read at least twice.
        cur = cur.localCheckpoint(eager=False)
        cnt = cur.count()
        if stats is not None:
            stats["residue_edges"].append(cnt)
            stats["residue_rounds"] = len(maps)
        if cnt == 0:
            final = spark.createDataFrame([], "cv long, clabel long")
            if stats is not None:
                stats["finish"] = "empty"
            break
        if cnt <= driver_finish_max_edges:
            final = _union_find_df(spark, cur)
            if stats is not None:
                stats["finish"] = "driver_union_find"
            break
        sym_cur = _symmetrize(cur).localCheckpoint()
        hook, cur = _hook_and_project(sym_cur, close=True)
        maps.append(hook.select(F.col("a").alias("cv"), F.col("h").alias("clabel")))
    else:
        raise RuntimeError(
            f"connected_components residue did not fit under "
            f"{driver_finish_max_edges} edges in {max_iter} rounds"
        )
    # Compose outward: each hop map re-points its labels through the
    # finer map computed after it. All frames here are residue-sized.
    for hop in reversed(maps):
        nxt = final.select(F.col("cv").alias("_c"), F.col("clabel").alias("_l"))
        final = (
            hop.join(nxt, hop["clabel"] == nxt["_c"], "left")
            .select("cv", F.coalesce("_l", F.col("clabel")).alias("clabel"))
        )
    return final


def _union_find_df(spark, edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a guarded-size edge list →
    ``(cv, clabel)`` with clabel = min vertex of the component."""
    parent: dict[int, int] = {}
    seen: set[int] = set()

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    # One Arrow-batched fetch instead of toLocalIterator: the iterator
    # form launches a job per partition (32 tiny jobs on an empty-ish
    # residue) and yields boxed Row objects; the edge set is guarded to
    # ≤ driver_finish_max_edges rows of two longs, so a single columnar
    # transfer is bounded and far cheaper on both sides.
    pdf = edges.select("a", "b").toPandas()
    # Fail loudly on nulls: pandas coerces nullable int64 -> float64 and
    # int(float) silently corrupts ids above 2^53. The residue edge list
    # is non-null by construction; this guard turns a violated
    # assumption into an error instead of mislabeled components.
    for col in ("a", "b"):
        if str(pdf[col].dtype) != "int64":
            raise ValueError(
                f"union-find residue column {col!r} fetched as "
                f"{pdf[col].dtype} (expected int64) — null or non-long "
                "edge ids would corrupt component labels"
            )
    for a, b in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
        a, b = int(a), int(b)
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return spark.createDataFrame(
        [(v, find(v)) for v in sorted(seen)], "cv long, clabel long"
    )
