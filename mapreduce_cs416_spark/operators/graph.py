"""Distributed connected components — dedup-cluster canonicalization.

Near-dup detection (dedup.py) emits PAIRS; an actual dedup pipeline
must then group transitively-connected pairs and keep one canonical
document per group ("A~B, B~C ⇒ keep one of {A,B,C}"). That grouping
is connected components over the similarity graph — an iterative
algorithm the reference cannot express at all (its dataflow is a
single map→shuffle→reduce pass, mr/coordinator.go) and SQL can only
express via recursive CTEs that don't scale out.

Implemented as alternating *large-star / small-star* rounds (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", ACM SoCC 2014): each round is one
aggregate + one join over the edge list keyed by node id, so a round
costs O(|E|) shuffle with no per-node neighbor materialization
(no collect_list — a celebrity node's neighborhood never has to fit
in one task), and the number of rounds is O(log n) even on
pathological path graphs, vs O(diameter) for naive label propagation.
Lineage is truncated with ``localCheckpoint`` every round so the plan
doesn't grow with the iteration count.

The fixpoint (a disjoint union of min-rooted stars) is detected
structurally from two constant-size driver-side probes — never by
collecting the edge set, and without spending an extra full star
round just to observe "nothing changed".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Free a superseded ``localCheckpoint``'s storage blocks NOW.

    ``DataFrame.unpersist()`` only consults the cache manager and is a
    no-op for checkpointed plans; the blocks belong to the RDD inside
    the plan's LogicalRDD node, which is only reachable through the
    JVM plan (verified: RDDStorageInfo drops to zero on this call,
    stays pinned after ``df.unpersist()``). Best-effort: on any
    introspection failure the blocks are simply left for GC, which
    was the previous behavior.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge list → large-star rounds: every node u connects its
    strictly-larger neighbors to m(u) = min(N(u) ∪ {u}).

    The trailing ``distinct`` was tried WITHOUT in r14 (guide §2.4 —
    the consumer's min aggregate is duplicate-insensitive and its own
    trailing distinct collapses dup join outputs, so dropping this
    one keeps the edge set identical): measured a wash at sf0.1
    (4.45 vs 4.33 s on dedup_components, inside host noise), and at
    scale it trades one exchange for shipping duplicate (v, m) rows
    into the next round's join — kept for the skew-safety of deduped
    rounds."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Large-star output points big→small (u > v). Small-star rewires
    each node's small neighbors (and itself) to m(u) = min(N(u) ∪ {u})
    = min(N(u)), collapsing short chains into stars."""
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = edges.select("u", "v").union(m.select("u", F.col("u").alias("v")))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _is_star_fixpoint(edges: DataFrame) -> bool:
    """True iff ``edges`` is a disjoint union of stars — the
    algorithm's fixpoint — so the loop can stop WITHOUT running one
    more full star round just to observe "nothing changed" (the
    count+hash probe this replaces cost an extra O(|E|)-shuffle round
    at every scale). Precondition: edges point child→center with
    center < child (small-star output guarantees it, since the center
    is the min of a set containing the child); under it a star state
    is automatically min-rooted, so stopping here yields the same
    labels as running to the probe-detected fixpoint.

    Star test = (each child has exactly one center) ∧ (no center is
    itself a child). Both conditions fold into ONE constant-size job:
    tag each edge endpoint with a child/center flag, aggregate per
    node, then reduce to three counters — total child-edge rows
    (= |E|), distinct children, and nodes that are both child and
    center (the chained set v ∩ u). One job per round instead of the
    previous agg + semi-join pair; never a collect of the edges.

    SINGLE-branch over ``edges`` (r14): both endpoints are emitted by
    one explode instead of a two-branch union, so the probe reads the
    edge frame exactly once — which is what lets
    ``connected_components`` hand it a LAZY checkpoint to materialize
    (the kcore one-job-per-round discipline) without the multi-branch
    race the verify-skill gotcha warns about."""
    row = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"), F.lit(1).alias("c"), F.lit(0).alias("p")),
                    F.struct(F.col("v").alias("node"), F.lit(0).alias("c"), F.lit(1).alias("p")),
                )
            ).alias("x")
        )
        .select("x.node", "x.c", "x.p")
        .groupBy("node")
        .agg(
            F.sum("c").alias("child_edges"),
            F.max("c").alias("is_child"),
            F.max("p").alias("is_center"),
        )
        .agg(
            # coalesce: the sums are NULL over an EMPTY edge set (zero
            # groups reach the final agg), which is a valid fixpoint
            F.coalesce(F.sum("child_edges"), F.lit(0)).alias("n_edges"),
            F.coalesce(F.sum("is_child"), F.lit(0)).alias("n_children"),
            F.coalesce(
                F.sum(
                    F.when((F.col("is_child") == 1) & (F.col("is_center") == 1), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_chained"),
        )
        .collect()[0]
    )
    return row["n_edges"] == row["n_children"] and row["n_chained"] == 0


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """(node, component) labels for every node appearing in ``pairs``;
    component = the minimum node id in the connected component.

    ``pairs`` is an undirected edge list (one row per edge, any
    orientation). Nodes not present in ``pairs`` are singletons and
    are NOT returned — callers union them back with label = self
    (see plans/northstar.dedup_components).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # the star test's orientation precondition only holds for
    # small-star output, so the input always gets at least one round
    for _ in range(max_iter):
        prev = edges
        # LAZY checkpoint (r14, the kcore discipline): the round's
        # fixpoint probe is the action that materializes it, so a
        # round costs ONE job instead of an eager-checkpoint job plus
        # a probe job. Safe because the probe reads the lazy frame
        # through a single branch (see _is_star_fixpoint) — the
        # multi-branch-over-lazy-intermediate race cannot occur — and
        # every other consumer (the next round, the returned labels)
        # runs only after the probe has materialized it. The
        # superseded round's blocks are freed only after the probe,
        # while prev is still read by the new round's plan.
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        done = _is_star_fixpoint(edges)
        _unpersist_checkpoint(prev)
        if done:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint edge set is a union of stars (u, m): u's label is m,
    # and each star center m labels itself.
    return edges.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        edges.select("v", "v").distinct()
    )


def kcore(
    pairs: DataFrame,
    k: int = 2,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 24,
    broadcast_max_nodes: int = 8_000_000,
) -> DataFrame:
    """(node, core_degree): the k-core of the undirected graph — the
    maximal subgraph where every node keeps degree >= k — by the
    classic simultaneous peel: each round drops EVERY node whose
    current degree is < k (Matula & Beck's algorithm, rounds bounded
    by the degeneracy ordering depth), until a round drops nobody.
    On a near-dup graph this separates genuinely dense duplicate
    clusters from incidental pair chains — the community-strength
    refinement of ``connected_components``.

    Same iterative discipline as connected_components: per-round
    localCheckpoint with eager frees of the superseded round's blocks,
    and the fixpoint probe is one count over the NODE-sized degree
    frame (never the edge list, never a collect of data rows). All
    victims drop simultaneously per round — exactly what the unrolled
    DuckDB CTE chain replays (plans/northstar._kcore_sql), so the two
    engines agree round-for-round; exceeding ``max_rounds`` raises
    rather than silently diverging from the fixed-unroll oracle."""
    und = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    )
    edges = (
        und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # Degree-DELTA peel (r11; the r10 form rewrote the edge list with
    # two semi-joins + a full groupBy per round — 3 actions/round).
    # Each node dies exactly ONCE, so against the ORIGINAL symmetric
    # edge list deg'(u) = deg(u) − |edges(u, victims_r)| telescopes to
    # the degree among survivors: an edge (u, v) is subtracted from
    # live u exactly in the round v dies (v was alive before, so the
    # edge was never counted out earlier). The edge list is scanned
    # per round but NEVER rewritten, the per-round shuffle is sized by
    # edges adjacent to the round's victims, and the maintained degree
    # IS the core degree at the fixpoint — and since r13 ONE job/round
    # (VERDICT r12 item 8): the round's node-sized checkpoint is LAZY
    # (localCheckpoint(eager=False)) and the one-row fixpoint probe is
    # the action that materializes it, so the probe rides the
    # checkpoint job instead of paying a second local[32] job floor
    # (~0.16 s/round, the measured fixed cost in README's floor note).
    # The probe is a SINGLE-branch aggregate over the lazy frame —
    # the multi-branch-over-lazy-intermediate race (verify-skill
    # gotcha; bit 3× in r6) cannot occur. The superseded round's
    # blocks are freed only AFTER the next probe materializes the new
    # checkpoint (the lazy frame still reads them until then).
    # Measured honestly: a WASH at sf0.1 (5.55 vs 5.62 s back-to-back
    # — both forms are fixed-cost dominated there); the win is shuffle
    # VOLUME, the axis that matters at scale: total shuffled rows
    # across all rounds are ≤ 2|E| here (each edge contributes once
    # per endpoint's death) vs Σ_r |E_r| ≈ |E|·rounds for the
    # rewrite-the-edges form on slowly-shrinking graphs.
    # All victims still drop simultaneously per round, so the unrolled
    # DuckDB CTE oracle (plans/northstar._kcore_sql) replays
    # round-for-round unchanged (driver-hashed).
    deg = edges.groupBy("u").agg(F.count("*").alias("d")).localCheckpoint(
        eager=False
    )
    prev = None
    for _ in range(max_rounds):
        # one node-sized job: materializes deg's checkpoint AND yields
        # the fixpoint probe + the victim cardinality that gates the
        # broadcast hint below
        probe = deg.agg(
            F.count(F.when(F.col("d") < k, 1)).alias("n_victims"),
            F.count(F.when(F.col("d") >= k, 1)).alias("n_surv"),
        ).collect()[0]
        if prev is not None:  # safe now: deg no longer reads prev
            _unpersist_checkpoint(prev)
            prev = None
        if probe["n_victims"] == 0:
            break
        victims = deg.where(F.col("d") < k).select(F.col("u").alias("v"))
        # victims and loss are NODE-sized but sit behind/derive from a
        # localCheckpoint, whose LogicalRDD carries no size stats —
        # without the hint Spark planned these as full SortMergeJoins
        # (found by PLANS.md's r10 ckpt-fragment column). Above
        # ``broadcast_max_nodes`` the hint is dropped (executor/driver
        # memory, ADVICE r10) and the shuffle join runs instead — the
        # gate is measured, not guessed, riding the probe for free.
        hint = (
            F.broadcast
            if max(probe["n_victims"], probe["n_surv"]) <= broadcast_max_nodes
            else (lambda df: df)
        )
        loss = edges.join(hint(victims), "v").groupBy("u").agg(
            F.count("*").alias("lost")
        )
        prev = deg
        deg = (
            deg.where(F.col("d") >= k)
            .join(hint(loss), "u", "left")
            .select("u", (F.col("d") - F.coalesce(F.col("lost"), F.lit(0))).alias("d"))
            .localCheckpoint(eager=False)
        )
    else:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    if prev is not None:
        _unpersist_checkpoint(prev)
    _unpersist_checkpoint(edges)
    return deg.select(F.col("u").alias("node"), F.col("d").cast("int").alias("core_degree"))


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    n_iter: int = 10,
    damping: float = 0.85,
    broadcast_max_nodes: int = 8_000_000,
) -> DataFrame:
    """PageRank over a directed edge list: (node, rank) for every node
    appearing as source or target, after ``n_iter`` power iterations
    with damping ``damping`` and uniform dangling-mass redistribution
    (so sum(rank) == 1 at every step — the invariant the tests pin).

    The second iterative-graph operator (after connected_components)
    the reference's single-pass dataflow cannot express. Scale shape
    per iteration: one O(|E|) join of edges to current ranks on the
    source key, one O(|E|) shuffle of contributions to the target key,
    and a left join back to the node set — no per-node neighborhood
    materialization, no driver-side edge collection. The only
    driver-side values are the node count (once) and the per-iteration
    dangling-mass scalar (a one-row aggregate). Lineage is truncated
    every round with an eager localCheckpoint and the superseded
    round's blocks are unpersisted immediately (same discipline as
    connected_components — VERDICT r4's bench-bleed lesson).

    Fixed iteration count, not a float-convergence test: reruns visit
    the identical plan sequence, and ranks differ only by float
    summation order (documented; the registered query is rows-only and
    pytest checks against a NumPy reference with rtol).

    r14: lineage is truncated every ``checkpoint_every`` rounds (2)
    instead of every round. Within a pair the second round's two
    references to the first round's ranks (the dangling aggregate and
    the broadcast build side) share the first round's shuffle via
    ReusedExchange, so nothing is recomputed, and the pair pays ONE
    Catalyst planning pass + one checkpoint job instead of two
    (measured 8.5 → 7.2 s adjacent at sf0.1; intervals of 4+ regress —
    plan growth outruns the amortization — and were reverted).
    """
    return _pagerank_rounds(
        edges,
        src,
        dst,
        n_iter,
        broadcast_max_nodes,
        init_rank=lambda n: F.lit(1.0 / n),
        dang_sum=lambda: F.coalesce(
            F.sum(F.col("rank") * F.col("_dangf")), F.lit(0.0)
        ).alias("_dang"),
        contrib=lambda: (F.col("rank") / F.col("outdeg")).alias("c"),
        next_rank=lambda n: (
            (F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("_dang") / F.lit(float(n)))
            + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
        ).alias("rank"),
        rank_col="rank",
        dangf_type="int",
        empty_rank=F.lit(0.0),
        out=lambda ranks: ranks.select(F.col("u").alias("node"), "rank"),
    )


def _pagerank_rounds(
    edges: DataFrame,
    src: str,
    dst: str,
    n_iter: int,
    broadcast_max_nodes: int,
    *,
    init_rank,
    dang_sum,
    contrib,
    next_rank,
    rank_col: str,
    dangf_type: str,
    empty_rank,
    out,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Shared power-iteration skeleton of ``pagerank`` (float) and
    ``pagerank_fixed`` (scaled integer): identical join/aggregate
    round shape, arithmetic supplied by the callbacks. Kept in one
    place so the r14 checkpoint-interval tuning cannot drift between
    the twins."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # static per-round inputs, joined ONCE outside the loop: the
    # edge⋈outdeg frame (saves a join per round) and the node set
    # carrying a dangling flag (no out-edges), so the per-round
    # dangling-mass aggregate is a plain scan of the checkpointed
    # ranks — no join at all (VERDICT r10 item 4).
    deg = e.groupBy("u").agg(F.count("*").alias("outdeg"))
    ew = e.join(deg, "u").select("u", "v", "outdeg").localCheckpoint()
    # r15: the node set and its dangling flag are DERIVED from the
    # checkpointed ew instead of paying their own distinct-union
    # checkpoint + a join back to deg (two prep jobs + gaps): every
    # edge of e survives the deg join (deg is keyed by e's own u
    # values), so ew carries the full edge set — a node is dangling
    # iff it never appears as a source. Same node set, same flag,
    # same n; only the prep job count changes (5 → 3).
    nodes_f = (
        ew.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.lit(1).alias("_src")),
                    F.struct(F.col("v").alias("u"), F.lit(0).alias("_src")),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.u").alias("u"))
        .agg((1 - F.max("x._src")).cast(dangf_type).alias("_dangf"))
        .localCheckpoint()
    )
    n = nodes_f.count()
    if n == 0:
        # empty graph: the frames hold zero rows — nothing worth
        # freeing eagerly, and the returned (empty) projection still
        # reads nodes_f's checkpoint
        return out(nodes_f.select("u", empty_rank.alias(rank_col)))
    # ranks₀ is a pure projection over the checkpointed nodes_f — no
    # checkpoint of its own (r14: the extra eager job bought nothing;
    # both round-1 readers re-run only a column projection).
    ranks = nodes_f.select("u", "_dangf", init_rank(n).alias(rank_col))
    # ranks is NODE-sized and sits behind / derives from a
    # localCheckpoint (no size stats — the kcore SMJ lesson): without
    # the hint the per-round contribution join plans as a
    # SortMergeJoin that re-shuffles the EDGE frame every round. Gate
    # on the known node count (executor memory escape hatch).
    hint = F.broadcast if n <= broadcast_max_nodes else (lambda df: df)
    prev = None
    for i in range(n_iter):
        # the dangling-mass scalar rides the round's OWN job as a
        # one-row broadcast side frame over the previous ranks — no
        # per-round driver collect. Same float evaluation order as
        # the literal it replaces: (base + d·dang/n) + d·s.
        dang = ranks.agg(dang_sum())
        contribs = ew.join(hint(ranks), "u").select(F.col("v").alias("u"), contrib())
        summed = contribs.groupBy("u").agg(F.sum("c").alias("s"))
        ranks = (
            nodes_f.join(hint(summed), "u", "left")
            .crossJoin(F.broadcast(dang))
            .select("u", "_dangf", next_rank(n))
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
            if prev is not None:
                _unpersist_checkpoint(prev)
            prev = ranks
    if n_iter <= 0:
        # zero-round call (ADVICE r14): ranks is still a lazy
        # projection over nodes_f, whose blocks the cleanup below
        # frees — materialize it first or the caller's first action
        # reads truncated lineage
        ranks = ranks.localCheckpoint()
    for df in (e, ew, nodes_f):
        _unpersist_checkpoint(df)
    return out(ranks)


def pagerank_fixed(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    n_iter: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    broadcast_max_nodes: int = 8_000_000,
) -> DataFrame:
    """PageRank in SCALED-INTEGER fixed-point arithmetic — the
    exactly-oracle-able twin of ``pagerank``. Ranks are BIGINTs
    scaled by ``scale``; each contribution is an integer floor
    division by the out-degree; damping is applied as
    ``·damping_num DIV damping_den``. Integer sums commute on any
    partitioning, so — unlike the float twin, whose ranks depend on
    summation order and which is therefore rows-only at the driver —
    every round here is bit-reproducible and DuckDB replays the
    identical rounds as a generated MATERIALIZED CTE chain
    (plans/northstar.GRAPH_PAGERANK_FIXED_SQL, the kcore/bpe_train
    pattern). The price is mass leakage from the floors (sum(rank)
    drifts at most a few node-counts of ulps below ``scale``), a
    documented trade for exactness; ranking order matches the float
    twin on the test graphs (tests/test_graph.py).

    Scale shape per iteration: identical to ``pagerank`` — one
    O(|E|) join on the source key, one contribution shuffle to the
    target key, a left join back to the node set, a one-row dangling
    scalar; localCheckpoint every second round (see pagerank's r14
    note) + superseded-block frees. Integer arithmetic is unaffected
    by where lineage is truncated, so the unrolled DuckDB oracle
    replays bit-identically.
    """
    # the same nesting the oracle uses: ((den-num)*scale // den) // n
    def _next(n: int):
        base = ((damping_den - damping_num) * scale // damping_den) // n
        return F.expr(
            f"CAST({base} + ({damping_num} * (coalesce(s, 0) + (_dang div {n}))) div"
            f" {damping_den} AS LONG)"
        ).alias("r")

    return _pagerank_rounds(
        edges,
        src,
        dst,
        n_iter,
        broadcast_max_nodes,
        init_rank=lambda n: F.lit(scale // n).cast("long"),
        dang_sum=lambda: F.coalesce(F.sum(F.col("r") * F.col("_dangf")), F.lit(0))
        .cast("long")
        .alias("_dang"),
        contrib=lambda: F.expr("r div outdeg").alias("c"),
        next_rank=_next,
        rank_col="r",
        dangf_type="long",
        empty_rank=F.lit(0).cast("long"),
        out=lambda ranks: ranks.select(F.col("u").alias("node"), F.col("r").alias("rank_fp")),
    )


def triangle_counts(
    pairs: DataFrame, src: str = "vec_a", dst: str = "vec_b", materialize: bool = True
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list: (node, n_triangles) for every node in >= 1 triangle. The
    local-clustering signal of the near-dup graph — a node closing
    many triangles sits in a dense duplicate clique, one closing none
    is a chain artifact worth human review.

    Degree-oriented wedge join (Suri & Vassilvitskii, WWW'11 — "the
    curse of the last reducer"): orient every edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges
    only at each edge's SMALLER endpoint, then confirm the closing
    edge with a join. Orienting by degree bounds any node's
    out-degree at O(sqrt(|E|)), so a celebrity node of degree d
    generates O(|E|) wedges total instead of the d^2 a naive
    neighbor join produces — the difference between a skew-immune
    plan and one task holding the whole star at 100 TB. All three
    legs are equi-joins on node ids (shuffle or broadcast by size);
    nothing collects a neighborhood.
    """
    # EAGERLY materialize the canonical edge list (localCheckpoint):
    # degrees, orientation, both wedge legs, and the closing-edge
    # probe all read it, and `pairs` is typically an EXPENSIVE
    # upstream (the O(n²) cosine pair join in graph_triangles). A lazy
    # persist() is not enough — the seven references sit in ONE action,
    # whose concurrent tasks race past the unfilled cache and re-run
    # the pair join several times (benched ~7× the one-pass cost at
    # sf0.1); the eager checkpoint runs the upstream exactly once. The
    # edge list itself is small (near-dup pairs, not the corpus).
    # materialize=False opts out for callers that can't accept eager
    # execution / pinned blocks / localCheckpoint's missing fault
    # tolerance (cf. similarity.cosine_near_dup_pairs).
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if materialize:
        e = e.localCheckpoint()
    deg = (
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, id): lo -> hi
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.struct("db", "b")).otherwise(F.struct(F.col("da").alias("db"), F.col("a").alias("b"))).alias("hi"),
    ).select("lo", F.col("hi.b").alias("hi"), F.col("hi.db").alias("dhi"))
    # wedges at the common lower endpoint; (x, y) canonically ordered
    # by (degree, id) so each candidate triangle edge is probed once
    w1 = o.select(F.col("lo"), F.col("hi").alias("x"), F.col("dhi").alias("dx"))
    w2 = o.select(F.col("lo"), F.col("hi").alias("y"), F.col("dhi").alias("dy"))
    wedge = w1.join(w2, "lo").where(
        (F.col("dx") < F.col("dy")) | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tri = wedge.join(closing, ["x", "y"]).select("lo", "x", "y")
    member = (
        tri.select(F.col("lo").alias("node"))
        .union(tri.select(F.col("x").alias("node")))
        .union(tri.select(F.col("y").alias("node")))
    )
    return member.groupBy("node").agg(F.count("*").cast("int").alias("n_triangles"))
