"""Offline (host-only) comparison of node orderings for BSR tile coverage.

The bsr backend's epoch cost is ~dominated by residual edges (those not in
dense [256,256] tiles); every +1% edge coverage is ~12 ms/epoch off the reddit
train time. This evaluates candidate permutations purely in numpy: coverage =
fraction of edges in tiles holding >= min_edges, at the production tile size
and budget (data/graph.py constants).

Candidates: LPA rounds sweep, RCM (scipy), hub-first + LPA, multilevel
heavy-edge matching (Graclus-style), and combinations.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def load(name="synth-reddit"):
    z = np.load(f".cache/{name}.npz")
    return z["g_indptr"].astype(np.int64), z["g_indices"].astype(np.int64)


def coverage(indptr, indices, perm, tb=256, min_edges=64, budget_tiles=65536):
    n = len(indptr) - 1
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    src = inv[np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))]
    dst = inv[indices]
    t_blocks = -(-n // tb)
    tid = (src // tb) * t_blocks + (dst // tb)
    counts = np.bincount(tid, minlength=t_blocks * t_blocks)
    cand = counts[counts >= min_edges]
    if len(cand) > budget_tiles:
        cand = np.sort(cand)[::-1][:budget_tiles]
    covered = cand.sum()
    return covered / len(src), len(cand)


def matching_coarsen(indptr, indices, levels=3, rng=None):
    """Graclus-style multilevel coarsening by randomized heavy-edge matching.

    Each level: every (super)node proposes its heaviest-degree-normalized
    neighbor; mutual or conflict-resolved proposals merge. Returns a cluster
    label per original node (cluster size <= 2^levels).
    """
    rng = rng or np.random.default_rng(0)
    n = len(indptr) - 1
    # current graph in COO with weights; start with unit weights, drop self-loops
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dst = indices.copy()
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = np.ones(len(src), dtype=np.float64)
    label = np.arange(n, dtype=np.int64)  # original node -> current supernode
    cur_n = n
    for _ in range(levels):
        if len(src) == 0:
            break
        deg = np.bincount(src, weights=w, minlength=cur_n)
        # heavy-edge preference normalized by endpoint degree (Graclus kernel)
        norm = w / (deg[src] + deg[dst] + 1e-9)
        # per src: neighbor with max normalized weight (random tiebreak)
        order = np.lexsort((rng.random(len(src)), -norm, src))
        first = np.empty(len(order), dtype=bool)
        s_sorted = src[order]
        first[0] = True
        first[1:] = s_sorted[1:] != s_sorted[:-1]
        prop = np.full(cur_n, -1, dtype=np.int64)
        prop[s_sorted[first]] = dst[order][first]
        # resolve: i matched with prop[i] if prop[prop[i]] == i (mutual), else
        # match i -> prop[i] when prop[i] unmatched after mutual pass
        partner = np.full(cur_n, -1, dtype=np.int64)
        idx = np.arange(cur_n)
        has = prop >= 0
        mutual = has & (prop[np.clip(prop, 0, cur_n - 1)] == idx)
        partner[mutual] = prop[mutual]
        # greedy second pass: unmatched i grabs unmatched prop[i]
        um = has & (partner < 0)
        cand_i = idx[um]
        cand_j = prop[um]
        free_j = partner[cand_j] < 0
        cand_i, cand_j = cand_i[free_j], cand_j[free_j]
        # dedupe targets: first come first served
        o = np.argsort(cand_j, kind="stable")
        cj, ci = cand_j[o], cand_i[o]
        fst = np.empty(len(cj), dtype=bool)
        if len(cj):
            fst[0] = True
            fst[1:] = cj[1:] != cj[:-1]
            tgt_free = partner[cj[fst]] < 0
            partner[ci[fst][tgt_free]] = cj[fst][tgt_free]
            partner[cj[fst][tgt_free]] = ci[fst][tgt_free]
        # build new supernode ids: pair -> one id
        rep = np.where((partner >= 0) & (partner < idx), partner, idx)
        uniq, newid = np.unique(rep, return_inverse=True)
        label = newid[label]
        # contract edges
        src = newid[src]
        dst = newid[dst]
        keep = src != dst
        src, dst = src[keep], dst[keep]
        w = w[keep]
        # merge parallel edges
        cur_n = len(uniq)
        key = src * cur_n + dst
        o = np.argsort(key)
        key, src, dst, w = key[o], src[o], dst[o], w[o]
        fst = np.empty(len(key), dtype=bool)
        if len(key):
            fst[0] = True
            fst[1:] = key[1:] != key[:-1]
            run = np.cumsum(fst) - 1
            w = np.bincount(run, weights=w)
            src, dst = src[fst], dst[fst]
    return label


def order_from_labels(labels, indptr=None):
    from cuda_gcn_tpu.data.reorder import cluster_order

    return cluster_order(labels)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cuda_gcn_tpu.data.reorder import cluster_order, label_propagation

    indptr, indices = load()
    n = len(indptr) - 1
    results = []

    def ev(name, perm, t0):
        cov, ntiles = coverage(indptr, indices, perm)
        resid = (1 - cov) * (indptr[-1])
        print(f"{name:34s} cov={cov:.4f} tiles={ntiles:6d} resid={resid/1e6:5.2f}M "
              f"({time.time()-t0:5.1f}s)", flush=True)
        results.append((name, cov))

    t0 = time.time()
    ev("identity", np.arange(n), t0)

    t0 = time.time()
    perm = np.load(".cache/synth-reddit.perm.npy")
    ev("LPA-4 (cached, production)", perm, t0)

    for rounds in (8, 16):
        t0 = time.time()
        lab = label_propagation(indptr, indices, rounds=rounds)
        ev(f"LPA-{rounds}", cluster_order(lab), t0)

    # RCM on the sparsity pattern
    t0 = time.time()
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        A = sp.csr_matrix((np.ones(len(indices), np.float32),
                           indices.astype(np.int32), indptr.astype(np.int32)),
                          shape=(n, n))
        rcm = reverse_cuthill_mckee(A, symmetric_mode=True).astype(np.int64)
        ev("RCM", rcm, t0)
    except Exception as e:
        print(f"RCM failed: {e}")

    # multilevel heavy-edge matching, cluster-major order
    for levels in (6, 8):
        t0 = time.time()
        lab = matching_coarsen(indptr, indices, levels=levels)
        ev(f"HEM-{levels} (clusters<=2^{levels})", cluster_order(lab), t0)

    # HEM then LPA seeded by HEM clusters
    t0 = time.time()
    lab = matching_coarsen(indptr, indices, levels=8)
    lab2 = label_propagation(indptr, indices, rounds=4, seed_labels=lab)
    ev("HEM-8 + LPA-4 refine", cluster_order(lab2), t0)

    # LPA clusters, order clusters to put connected clusters adjacently?
    # (tile grid is 2D: row-block x col-block; inter-cluster edges land in
    # off-diagonal tiles which can also be dense if clusters are adjacent)
    best = max(results, key=lambda kv: kv[1])
    print(f"best: {best[0]} cov={best[1]:.4f}")


if __name__ == "__main__":
    main()
