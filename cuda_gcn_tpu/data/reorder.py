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


def label_propagation(indptr: np.ndarray, indices: np.ndarray, rounds: int = 4,
                      seed_labels: np.ndarray | None = None,
                      prefer_native: bool = True) -> np.ndarray:
    """Synchronous LPA: per round, each node takes the modal label among its
    neighbors (ties -> smallest label; isolated nodes keep their label).

    Prefers the multithreaded C++ implementation (csrc/gcn_lpa.cpp, ~20x at
    reddit scale) when the toolchain is available; this numpy version is the
    semantics oracle and the fallback (tests assert they agree)."""
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
