"""Locality-aware node reordering: label propagation + cluster-major relabeling.

Why this exists (TPU-first design, no reference analog): on TPU, per-edge
gather/scatter costs ~10 cycles per edge regardless of feature width — the VPU
cannot vectorize random row access. The escape hatch is the MXU: if node ids are
relabeled so communities are contiguous, most edges fall into a few dense
diagonal blocks of Â, which the 'bsr' graphsum backend materializes as dense
tiles and multiplies at matmul speed (see data/graph.py build_bsr). This module
produces that ordering:

1. label propagation (a few vectorized rounds): each node adopts its most
   common neighbor label — cheap O(E log E) numpy per round, no METIS needed;
2. final order: cluster-major (clusters sorted by size, descending), preserving
   original id order within a cluster.

Training metrics are permutation-invariant (masked CE / accuracy are sums over
nodes), so reordering the whole dataset is semantics-preserving; the inverse
permutation is kept for mapping per-node outputs back to original ids.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cuda_gcn_tpu.data.parser import CSR, GCNDataset


# Bump whenever label_propagation's ALGORITHM changes (not just its speed):
# cached label files are keyed on (this version, graph contents), so a bump
# invalidates every committed/stale cache instead of silently reusing labels
# from an older algorithm (e.g. v1 -> v2 added the collapse guard).
LPA_VERSION = 2


def lpa_cache_key(indptr: np.ndarray, indices: np.ndarray) -> str:
    """Short content hash tying an LPA label cache file to the exact graph
    and LPA_VERSION that produced it (scripts/bench_scaling.py)."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.int64(LPA_VERSION).tobytes())
    h.update(np.ascontiguousarray(indptr).tobytes())
    h.update(np.ascontiguousarray(indices).tobytes())
    return h.hexdigest()[:12]


def label_propagation(indptr: np.ndarray, indices: np.ndarray, rounds: int = 4,
                      seed_labels: np.ndarray | None = None,
                      prefer_native: bool = True,
                      max_top_share: float | None = 0.5) -> np.ndarray:
    """Synchronous LPA: per round, each node takes the modal label among its
    neighbors (ties -> smallest label; isolated nodes keep their label).

    Prefers the multithreaded C++ implementation (csrc/gcn_lpa.cpp, ~20x at
    reddit scale) when the toolchain is available; this numpy version is the
    semantics oracle and the fallback (tests assert they agree).

    ``max_top_share`` is the collapse guard (round 3): at 32x-reddit the
    synchronous dynamics CASCADE between rounds 2 and 3 — 252K clusters
    (top label 34% of nodes) collapse to 64 (top 80%) — and a one-label
    graph is useless for both tiling and partitioning. Rounds run one at a
    time; if a round's top label exceeds the share bound, the PREVIOUS
    round's labels are returned (docs/PERF.md '32x-reddit'). None disables
    (the ungated fixed-round semantics the oracle tests pin)."""
    if max_top_share is not None and rounds > 1:
        n = len(indptr) - 1
        labels = seed_labels
        for _ in range(rounds):
            new = label_propagation(indptr, indices, rounds=1,
                                    seed_labels=labels,
                                    prefer_native=prefer_native,
                                    max_top_share=None)
            top = np.bincount(new.astype(np.int64)).max()
            if top > max_top_share * n and labels is not None:
                return labels
            if labels is not None and np.array_equal(new, labels):
                return labels
            labels = new
        return labels
    if prefer_native:
        from cuda_gcn_tpu.data import native

        if native.lpa_available():
            return native.label_propagation(indptr, indices, rounds, seed_labels)
    n = len(indptr) - 1
    labels = seed_labels.copy() if seed_labels is not None else np.arange(n, dtype=np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dst = indices.astype(np.int64)
    for _ in range(rounds):
        lab = labels[dst]
        # single fused-key sort instead of a 2-key lexsort (2x faster at 21M
        # edges; n^2 fits int64 for any graph this loads). Ties don't need
        # stability: equal keys are identical (src, label) pairs.
        order = np.argsort(src * np.int64(n) + lab)
        s, l = src[order], lab[order]
        if len(s) == 0:
            break
        new_run = np.empty(len(s), dtype=bool)
        new_run[0] = True
        new_run[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
        run_ids = np.cumsum(new_run) - 1
        counts = np.bincount(run_ids)
        run_src = s[new_run]
        run_lab = l[new_run]
        # per src: highest count wins; ties -> smaller label (lexsort is stable
        # and runs are already label-ascending within src)
        pick = np.lexsort((-counts, run_src))
        first = np.empty(len(pick), dtype=bool)
        rs = run_src[pick]
        first[0] = True
        first[1:] = rs[1:] != rs[:-1]
        new_labels = labels.copy()
        new_labels[rs[first]] = run_lab[pick][first]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return labels


def cluster_order(labels: np.ndarray) -> np.ndarray:
    """Permutation placing nodes cluster-major, clusters by size descending.

    Returns ``perm`` with perm[new_id] = old_id.
    """
    uniq, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
    cluster_rank = np.empty(len(uniq), dtype=np.int64)
    cluster_rank[np.argsort(-counts, kind="stable")] = np.arange(len(uniq))
    return np.lexsort((np.arange(len(labels)), cluster_rank[inv]))


def locality_permutation(csr: CSR, rounds: int = 4,
                         return_cluster_sizes: bool = False):
    """Cluster-major locality permutation. With ``return_cluster_sizes``, also
    returns the cluster sizes IN THE NEW ORDER (descending) — the partitioner
    snaps its balance-aware cuts to these cluster boundaries so a node-block
    cut does not slice through a dense community (SURVEY.md §7 hard part #3)."""
    labels = label_propagation(csr.indptr, csr.indices, rounds=rounds)
    perm = cluster_order(labels)
    if not return_cluster_sizes:
        return perm
    _, counts = np.unique(labels, return_counts=True)
    sizes = counts[np.argsort(-counts, kind="stable")]
    return perm, sizes


def partition_aware_order(labels: np.ndarray, n_parts: int,
                          weights: np.ndarray | None = None):
    """Cluster layout for a P-part partition: greedy-assign clusters (size
    descending) to the lightest part by edge weight, then lay parts out
    contiguously (clusters size-descending within a part).

    Why (round 3, VERDICT round-2 weak #4): the plain cluster-major order
    puts ALL the tiny tail clusters — whose edges are mostly random and
    therefore boundary no matter where they live — at the END of the id
    space, so the last part carried 2.6x the boundary fraction of the rest
    at 16x-reddit P=8. Spreading tail clusters evenly equalizes each part's
    boundary share without changing the total. Returns (perm, cuts):
    ``perm[new_id] = old_id`` and ``cuts`` the P part-start node ids aligned
    exactly on part boundaries (pass to partition_graph(cuts=...)).

    Clusters heavier than total/P are SPLIT into <=total/P chunks first
    (by ascending node id, so whatever locality the ids carry survives):
    at 32x-reddit LPA merges the hub core into one giant cluster, and a
    whole-cluster packer then cannot do better than edge balance
    ~cw_max/(total/P) (measured 1.6 at P=2) no matter the assignment. For
    graphs whose clusters all fit (reddit..16x), the split is a no-op and
    the layout is unchanged.
    """
    n = len(labels)
    uniq, inv, counts = np.unique(labels, return_counts=True,
                                  return_inverse=True)
    w = (np.ones(n, np.float64) if weights is None
         else weights.astype(np.float64))
    if w.sum() <= 0:  # edgeless graph under degree weights: every greedy
        w = np.ones(n, np.float64)  # bin ties at 0 and parts end up empty
    cw = np.bincount(inv, weights=w, minlength=len(uniq))
    cap = cw.sum() / max(n_parts, 1)
    if n_parts > 1 and len(uniq) and cw.max() > cap:
        node_order = np.lexsort((np.arange(n), inv))  # cluster-major, id asc
        w_ord = w[node_order]
        inv_ord = inv[node_order]
        cum = np.cumsum(w_ord)
        starts = np.searchsorted(inv_ord, np.arange(len(uniq)))
        sizes = np.diff(np.append(starts, n))
        prev = cum - w_ord - np.repeat(cum[starts] - w_ord[starts], sizes)
        sub = (prev // cap).astype(np.int64)  # 0 for every fitting cluster
        refined = np.empty(n, np.int64)
        refined[node_order] = inv_ord * (int(sub.max()) + 1) + sub
        uniq, inv, counts = np.unique(refined, return_counts=True,
                                      return_inverse=True)
        cw = np.bincount(inv, weights=w, minlength=len(uniq))
    order = np.argsort(-cw, kind="stable")
    loads = np.zeros(n_parts)
    part_of = np.empty(len(uniq), np.int64)
    for c in order:
        p = int(np.argmin(loads))
        part_of[c] = p
        loads[p] += cw[c]
    # cluster rank: (part, weight descending, cluster id) -> contiguous parts
    rank = np.lexsort((np.arange(len(uniq)), -cw, part_of))
    cluster_rank = np.empty(len(uniq), np.int64)
    cluster_rank[rank] = np.arange(len(uniq))
    perm = np.lexsort((np.arange(n), cluster_rank[inv]))
    part_nodes = np.bincount(part_of[inv], minlength=n_parts)
    cuts = np.concatenate([[0], np.cumsum(part_nodes)[:-1]])
    return perm, cuts.astype(np.int64)


def refine_partition(indptr: np.ndarray, indices: np.ndarray,
                     part_of: np.ndarray, n_parts: int, weights: np.ndarray,
                     sweeps: int = 2, slack: float = 1.05) -> np.ndarray:
    """Balance-constrained boundary refinement over a P-part node assignment
    (a vectorized one-move Fiduccia–Mattheyses/LPA hybrid).

    Per sweep every node counts its edges into each part (ONE bincount over
    m keys) and bids to move to its argmax part; bids are admitted
    best-gain-first under a per-part inflow cap (load <= slack * W/P) and
    outflow floor (load >= W/(P*slack)), so edge balance survives while
    boundary edges turn interior. Exists because cluster-granular packing
    bottoms out when the clustering itself fails: at 32x-reddit synchronous
    LPA cascades into one 80%-mass label (docs/PERF.md), the id-order split
    of that giant is class-random, and no LPA round does better (round-1/2
    layouts measured WORSE: 49/46% boundary at P=2 vs 40% collapsed+split,
    21% planted-class floor). Refinement recovers most of the gap from any
    starting layout. Returns the refined part assignment (same node order).
    """
    n = len(indptr) - 1
    w = weights.astype(np.float64)
    total = w.sum()
    cap_load = slack * total / n_parts
    floor_load = total / (slack * n_parts)
    src = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(indptr.astype(np.int64)))
    dst = indices.astype(np.int64)
    part_of = part_of.astype(np.int32).copy()
    rows = np.arange(n)
    for _ in range(sweeps):
        cnt = np.bincount(src * n_parts + part_of[dst],
                          minlength=n * n_parts).reshape(n, n_parts)
        best = np.argmax(cnt, axis=1).astype(np.int32)
        gain = cnt[rows, best] - cnt[rows, part_of]
        movers = np.flatnonzero((gain > 0) & (best != part_of))
        if not len(movers):
            break
        loads = np.bincount(part_of, weights=w, minlength=n_parts)
        order = movers[np.argsort(-gain[movers], kind="stable")]
        # dampening: admit only the top half by gain per sweep — synchronous
        # all-move updates mass-swap symmetric regions back and forth
        # (boundary invariant), the standard sync-LPA oscillation
        order = order[: max(1, (len(order) + 1) // 2)]
        wo = w[order]
        src_p, dst_p = part_of[order], best[order]
        # exchange-aware admission: moves are mostly symmetric swaps whose
        # NET load change is small, so admit everything and repair — a
        # per-part inflow-prefix rule would throttle convergence to
        # (slack-1) of the weight per sweep. Repair monotonically un-admits
        # the lowest-gain movers into over-cap parts / out of under-floor
        # parts until the slack band holds (admission only shrinks, so this
        # terminates; starting loads are inside the band by construction).
        admit = np.ones(len(order), bool)
        for _ in range(100):
            la = loads + np.bincount(dst_p[admit], weights=wo[admit],
                                     minlength=n_parts) \
                       - np.bincount(src_p[admit], weights=wo[admit],
                                     minlength=n_parts)
            bad = False
            for p in np.flatnonzero(la > cap_load + 1e-9):
                sel = np.flatnonzero(admit & (dst_p == p))[::-1]
                cut = np.searchsorted(np.cumsum(wo[sel]), la[p] - cap_load)
                admit[sel[:cut + 1]] = False
                bad = True
            for p in np.flatnonzero(la < floor_load - 1e-9):
                sel = np.flatnonzero(admit & (src_p == p))[::-1]
                cut = np.searchsorted(np.cumsum(wo[sel]), floor_load - la[p])
                admit[sel[:cut + 1]] = False
                bad = True
            if not bad:
                break
        else:  # could not repair: skip this sweep's moves entirely
            admit[:] = False
        moved = order[admit]
        if not len(moved):
            break
        part_of[moved] = best[moved]
    return part_of


def partition_layout(indptr: np.ndarray, indices: np.ndarray,
                     labels: np.ndarray, n_parts: int,
                     weights: np.ndarray | None = None,
                     refine_sweeps: int = 2, slack: float = 1.05):
    """The full P-part layout pipeline: cluster-granular greedy packing
    (``partition_aware_order``) followed by node-granular boundary
    refinement (``refine_partition``). Returns (perm, cuts) in the same
    contract; within a part, unmoved nodes keep the cluster-major aware
    order (so the interior tile/blocked locality survives refinement)."""
    perm, cuts = partition_aware_order(labels, n_parts, weights=weights)
    if n_parts <= 1 or refine_sweeps <= 0:
        return perm, cuts
    n = len(labels)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    part_of = (np.searchsorted(cuts, inv, side="right") - 1).astype(np.int32)
    w = (np.ones(n, np.float64) if weights is None
         else weights.astype(np.float64))
    refined = refine_partition(indptr, indices, part_of, n_parts, w,
                               sweeps=refine_sweeps, slack=slack)
    counts = np.bincount(refined, minlength=n_parts)
    if (counts == 0).any():  # degenerate input graph: keep the packed layout
        return perm, cuts
    perm2 = np.lexsort((inv, refined))
    cuts2 = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return perm2, cuts2.astype(np.int64)


@dataclasses.dataclass
class ReorderedDataset:
    dataset: GCNDataset
    perm: np.ndarray      # perm[new_id] = old_id
    inv_perm: np.ndarray  # inv_perm[old_id] = new_id


def reorder_dataset(ds: GCNDataset, perm: np.ndarray) -> ReorderedDataset:
    """Relabel every per-node structure of a dataset by ``perm``."""
    n = ds.num_nodes
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    # adjacency: rows permuted, column ids remapped (row content order preserved)
    deg = np.diff(ds.graph.indptr.astype(np.int64))
    new_deg = deg[perm]
    new_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_deg, out=new_indptr[1:])
    starts = ds.graph.indptr.astype(np.int64)[perm]
    gather = (np.repeat(starts - new_indptr[:-1], new_deg)
              + np.arange(new_indptr[-1], dtype=np.int64))
    new_indices = inv[ds.graph.indices.astype(np.int64)[gather]]
    graph = CSR(indptr=new_indptr.astype(np.int32), indices=new_indices.astype(np.int32))

    # features: same row permutation trick on the feature CSR
    fdeg = np.diff(ds.feature_index.indptr.astype(np.int64))
    new_fdeg = fdeg[perm]
    new_findptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_fdeg, out=new_findptr[1:])
    fstarts = ds.feature_index.indptr.astype(np.int64)[perm]
    fgather = (np.repeat(fstarts - new_findptr[:-1], new_fdeg)
               + np.arange(new_findptr[-1], dtype=np.int64))
    feature_index = CSR(indptr=new_findptr.astype(np.int32),
                        indices=ds.feature_index.indices[fgather])
    feature_value = ds.feature_value[fgather]

    new_ds = GCNDataset(
        graph=graph,
        feature_index=feature_index,
        feature_value=feature_value,
        label=ds.label[perm],
        split=ds.split[perm],
        num_nodes=n,
        input_dim=ds.input_dim,
        output_dim=ds.output_dim,
    )
    return ReorderedDataset(dataset=new_ds, perm=perm, inv_perm=inv)
