"""Connected components over candidate-pair graphs.

Completes the dedup story: LSH/similarity joins emit PAIRS; proper
duplicate-group handling needs the transitive closure (A~B, B~C ⇒
{A,B,C} one group). Implemented as iterative label propagation
(min-label propagation with pointer doubling) on DataFrames:
each node adopts the
minimum id among itself and its neighbors until a fixed point.
Converges in O(log n) rounds on real dup-graphs (components are
small); each round is one join + one aggregate.

Scale notes: checkpoint/persist each round to cut lineage growth
(the loop caches the frontier); components of near-dup graphs are
tiny, so no giant-component skew handling is needed — if a corpus
produced one, cap candidate-pair degree upstream.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .dedup import _reliable_checkpoint
from .graph import BROADCAST_STATE_MAX_NODES


def connected_components(
    pairs: SparkDF,
    id_a: str = 'id_a',
    id_b: str = 'id_b',
    max_iterations: int = 20,
    checkpoint_dir: Optional[str] = None,
    broadcast_state_nodes: int = 0,
) -> SparkDF:
    """Resolve pair edges to components: ``(node, component)`` where
    component = min node id reachable from ``node``.

    Only nodes that appear in ``pairs`` are returned (isolated nodes
    are their own components trivially).

    ``checkpoint_dir`` upgrades the per-round lineage cuts from
    ``localCheckpoint`` (executor-storage blocks — die with any
    executor, forcing a full recompute of every round so far) to
    RELIABLE checkpoints on shared storage
    (:func:`dedup._reliable_checkpoint`) — set it for long cluster
    runs.
    """
    # Lazy lineage cuts: each round's cut materializes inside the
    # next action's job instead of as its own eager job — same
    # stages, far fewer scheduler round-trips (measured 15.8 → 5.7 s
    # on a 2000-node path; the reliable-dir branch stays eager, see
    # :func:`dedup._reliable_checkpoint`).
    _ckpt = lambda d: _reliable_checkpoint(  # noqa: E731
        d, checkpoint_dir, eager=False)
    edges = pairs.select(
        F.col(id_a).cast('long').alias('a'),
        F.col(id_b).cast('long').alias('b'),
    )
    # undirected: keep both directions
    sym = edges.unionByName(
        edges.select(F.col('b').alias('a'), F.col('a').alias('b'))
    ).distinct()
    # localCheckpoint (not persist): each round's plan would otherwise
    # embed every previous round — plan size grows exponentially and
    # the DRIVER OOMs during analysis after ~10 iterations.
    # Partition on 'b' — the key EVERY round's label join uses — so
    # the edge frame is never re-exchanged inside the loop; only the
    # one-off init aggregate below pays an exchange on 'a'.
    sym = sym.repartition('b').transform(_ckpt)

    labels = (
        sym.groupBy('a')
        .agg(F.min('b').alias('min_neighbor'))
        .select(
            F.col('a').alias('node'),
            F.least(F.col('a'), F.col('min_neighbor')).alias('comp'),
        )
        .transform(_ckpt)
    )
    # broadcast_state_nodes > 0: every label-side join below
    # broadcasts while the node count stays under the threshold.
    # Defaults OFF — the r16 position-matched A/B measured the
    # broadcast arm consistently slower here (0/4 paired wins, min
    # 2.50 vs 1.85 s at sf0.1): the per-round driver collects cost
    # more than the small exchanges they save.  For dense-graph
    # deployments where re-exchanging the edge frame per round
    # dominates, turn it on (see graph.BROADCAST_STATE_MAX_NODES).
    bcast = 0 < broadcast_state_nodes and \
        labels.count() <= broadcast_state_nodes
    _b = (lambda d: F.broadcast(d)) if bcast else (lambda d: d)

    for it in range(max_iterations):
        # pass 1 — neighbor min: label(a) = min(label(a), label(b))
        # over edges. Alone this moves labels ONE hop per round, so a
        # path of length L would need L rounds — the 20-iteration cap
        # would silently return unconverged labels on long chains.
        lb = _b(labels)
        neighbor_labels = (
            sym.join(
                lb, sym['b'] == lb['node'], 'inner'
            )
            .select(sym['a'].alias('node'), F.col('comp'))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy('node')
            .agg(F.min('comp').alias('comp'))
        )
        # Round 0 checks convergence BETWEEN the passes: near-dup
        # pair graphs are typically unions of cliques, which the
        # min-neighbor INITIALIZATION already labels exactly — if
        # pass 1 changed nothing the labels are a fixed point and
        # the pointer-doubling join never needs to run at all.
        if it == 0:
            new_labels = _ckpt(new_labels)
            changed = (
                new_labels.alias('n')
                .join(_b(labels.alias('o')), 'node')
                .filter(F.col('n.comp') != F.col('o.comp'))
                .limit(1)
                .count()
            )
            if changed == 0:
                return new_labels
        # pass 2 — pointer doubling: label(node) = label(label(node)).
        # Labels now jump 2^r hops after r rounds, so even a pure
        # path converges in O(log L) rounds.
        pointees = _b(new_labels.select(
            F.col('node').alias('__pnode'),
            F.col('comp').alias('__pcomp'),
        ))
        new_labels = (
            new_labels.join(
                pointees,
                new_labels['comp'] == pointees['__pnode'],
                'left',
            )
            .select(
                'node',
                F.coalesce(
                    F.least(F.col('comp'), F.col('__pcomp')),
                    F.col('comp'),
                ).alias('comp'),
            )
            .transform(_ckpt)
        )
        # Convergence check every OTHER round: the check is a whole
        # extra join+count job, and an already-converged round is a
        # cheap no-op (labels reproduce identically) — skipping half
        # the checks costs at most one redundant round while saving
        # ~1/4 of the loop's jobs. Odd rounds and the final round
        # always check so the loop can never exit unconverged.
        # (Round 0 already checked between the passes above.)
        labels, prev = new_labels, labels
        if it % 2 == 1 or it == max_iterations - 1:
            changed = (
                labels.alias('n')
                .join(_b(prev.alias('o')), 'node')
                .filter(F.col('n.comp') != F.col('o.comp'))
                .limit(1)
                .count()
            )
            if changed == 0:
                break

    return labels


def dedup_by_components(
    df: SparkDF,
    pairs: SparkDF,
    id_col: str = 'doc_id',
    checkpoint_dir: Optional[str] = None,
) -> SparkDF:
    """Keep one row (lowest id) per duplicate component.

    The transitive-closure-correct version of the greedy
    keep-lowest-id rule in ``minhash_dedup``: every member of a
    duplicate group except its minimum id is dropped, even when some
    members only connect through intermediates.
    """
    comps = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    to_drop = comps.filter(F.col('node') != F.col('comp')).select(
        F.col('node').alias(id_col)
    )
    return df.join(to_drop, on=id_col, how='left_anti')
