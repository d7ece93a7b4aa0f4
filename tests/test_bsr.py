"""Block-sparse (BSR) graphsum backend + locality reordering tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from cuda_gcn_tpu.data.graph import build_graph
from cuda_gcn_tpu.data.parser import CSR
from cuda_gcn_tpu.data.reorder import (
    cluster_order, label_propagation, locality_permutation, reorder_dataset)
from cuda_gcn_tpu.data.synthetic import SynthSpec, make_synthetic
from cuda_gcn_tpu.ops.graphsum import graphsum


@pytest.fixture(scope="module")
def clustered():
    """Community graph whose reordered Â has genuinely dense diagonal tiles."""
    spec = SynthSpec(num_nodes=256, num_edges=4000, num_classes=4, input_dim=16,
                     nnz_per_node=4, homophily=0.9, train_per_class=10,
                     num_val=40, num_test=60)
    ds = make_synthetic(spec, seed=11)
    rng = np.random.default_rng(0)
    h = rng.standard_normal((256, 12)).astype(np.float32)
    return ds, h


def bsr_graph(csr, **kw):
    kw.setdefault("bsr_tile", 32)
    kw.setdefault("bsr_min_edges", 8)
    # exact-match tests store tiles in f32; the bf16 default is covered by
    # test_bsr_bf16_tiles_close
    kw.setdefault("bsr_dtype", "float32")
    return build_graph(csr, backend="bsr", **kw)


def test_bsr_bf16_tiles_close(clustered):
    """Default bf16 tile storage stays within bf16 rounding of the oracle."""
    ds, h = clustered
    g = bsr_graph(ds.graph, bsr_dtype="bfloat16")
    assert g.bsr_tiles.dtype == jnp.bfloat16
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h), g))
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


def test_bsr_has_dense_tiles_after_reorder(clustered):
    ds, _ = clustered
    perm = locality_permutation(ds.graph)
    rds = reorder_dataset(ds, perm).dataset
    g = bsr_graph(rds.graph)
    assert g.bsr_tiles.shape[0] > 0, "expected dense tiles on a clustered graph"
    covered = ds.graph.nnz - int(g.src.shape[0])
    assert covered / ds.graph.nnz > 0.3  # tiles actually absorb edges


def test_bsr_forward_matches_oracle(clustered):
    ds, h = clustered
    g = bsr_graph(ds.graph)
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h), g))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_bsr_forward_matches_oracle_after_reorder(clustered):
    ds, h = clustered
    perm = locality_permutation(ds.graph)
    r = reorder_dataset(ds, perm)
    g = bsr_graph(r.dataset.graph)
    h_perm = h[perm]
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h_perm), g))
    # got is in new-id space; map back with perm: got[new] corresponds to old perm[new]
    np.testing.assert_allclose(got, expected[perm], rtol=1e-4, atol=1e-5)


def test_bsr_vjp_matches_dense_autodiff(clustered):
    ds, h = clustered
    g = bsr_graph(ds.graph)
    g_seg = build_graph(ds.graph, backend="segment")

    def f_bsr(hh):
        return jnp.sum(jnp.sin(graphsum(hh, g)))

    def f_seg(hh):
        return jnp.sum(jnp.sin(graphsum(hh, g_seg)))

    ga = jax.grad(f_bsr)(jnp.asarray(h))
    gb = jax.grad(f_seg)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_bsr_empty_tiles_degrades_to_segment(clustered):
    """High threshold -> zero tiles -> pure residual path must still be exact."""
    ds, h = clustered
    g = build_graph(ds.graph, backend="bsr", bsr_tile=32, bsr_min_edges=10**9)
    assert g.bsr_tiles.shape[0] == 0
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    np.testing.assert_allclose(np.asarray(graphsum(jnp.asarray(h), g)),
                               expected, rtol=1e-4, atol=1e-5)


def test_bsr_budget_caps_tiles(clustered):
    ds, _ = clustered
    g_all = bsr_graph(ds.graph)
    one_tile_bytes = 32 * 32 * 4  # f32 tiles (bsr_graph default)
    g_capped = bsr_graph(ds.graph, bsr_budget_bytes=2 * one_tile_bytes)
    assert g_capped.bsr_tiles.shape[0] <= 2 <= max(g_all.bsr_tiles.shape[0], 2)


def test_blocked_residual_matches_oracle(clustered):
    """Flat-piece residual layout (blk_fwd; bwd routes via symmetric) stays
    exact, fwd + vjp."""
    ds, h = clustered
    g = bsr_graph(ds.graph, bsr_min_edges=64, blocked_blk=32, blocked_min_nodes=0)
    assert g.blk_fwd is not None and (g.blk_bwd is not None or g.symmetric)
    assert sum(b.rows.shape[0] for b in g.blk_fwd.buckets) > 1  # multiple pieces
    assert bool(np.asarray(g.blk_fwd.buckets[0].flush).any())   # multiple bands
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h), g))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    g_seg = build_graph(ds.graph, backend="segment")
    ga = jax.grad(lambda hh: jnp.sum(jnp.sin(graphsum(hh, g))))(jnp.asarray(h))
    gb = jax.grad(lambda hh: jnp.sum(jnp.sin(graphsum(hh, g_seg))))(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_tile_einsum_chunked_matches_unchunked(clustered, monkeypatch):
    """The K-chunked tile contraction (large-graph memory bound) must be exact
    vs the single fused einsum, forward and transpose."""
    import importlib

    gs = importlib.import_module("cuda_gcn_tpu.ops.graphsum")

    ds, h = clustered
    g = bsr_graph(ds.graph)
    assert g.bsr_tiles.shape[0] > 4

    def f(hh):  # grad exercises the transpose contraction
        return jnp.sum(jnp.sin(graphsum(hh, g)))

    ref_f = np.asarray(graphsum(jnp.asarray(h), g))
    ref_t = np.asarray(jax.grad(f)(jnp.asarray(h)))
    monkeypatch.setattr(gs, "_TILE_EINSUM_CHUNK", 4)
    monkeypatch.setattr(gs, "_TILE_EINSUM_ENGAGE", 4)
    got_f = np.asarray(graphsum(jnp.asarray(h), g))
    got_t = np.asarray(jax.grad(f)(jnp.asarray(h)))
    np.testing.assert_allclose(got_f, ref_f, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_t, ref_t, rtol=1e-5, atol=1e-6)


def test_blocked_pack_covers_all_edges(clustered):
    """Every residual edge appears exactly once across the flat pieces;
    padding is confined to coef==0 lanes with window-local row id rbw."""
    ds, _ = clustered
    g = bsr_graph(ds.graph, bsr_min_edges=64, blocked_blk=32, blocked_min_nodes=0)
    bc = g.blk_fwd
    triples = []
    for bk in bc.buckets:
        rows = np.asarray(bk.rows)
        cols = np.asarray(bk.cols)
        coef = np.asarray(bk.coef)
        r0 = np.asarray(bk.r0)
        c0 = np.asarray(bk.c0)
        real = rows != bc.rbw
        grows = (rows + r0[:, None])[real]
        gcols = (cols + c0[:, None])[real]
        triples += list(zip(grows.tolist(), gcols.tolist(), coef[real].tolist()))
        assert np.all(coef[~real] == 0.0)
    flat = sorted(zip(np.asarray(g.src).tolist(), np.asarray(g.dst).tolist(),
                      np.asarray(g.coef).tolist()))
    assert sorted(triples) == flat


def test_blocked_pack_padding_bounded_on_skew():
    """VERDICT round-2 directive #1: the flat bucketed pack must keep padded
    slots <= 1.3x real edges on a skewed (hub + sparse tail) residual — the
    round-2 rectangle measured ~2.2x on this shape class at 8x-reddit."""
    from cuda_gcn_tpu.data.graph import _blocked2d_pack, blocked2d_stats

    rng = np.random.default_rng(1)
    n, m = 200_000, 400_000
    # hub rows and hub cols hold ~35% of edges; a sparse tail spans the last
    # quarter of the node range at ~100x lower density (the 8x skew character)
    hub_rows = rng.integers(0, 50, m // 5).astype(np.int64)
    body_rows = rng.integers(0, 3 * n // 4, m - m // 5 - m // 20).astype(np.int64)
    tail_rows = rng.integers(3 * n // 4, n, m // 20).astype(np.int64)
    rows = np.sort(np.concatenate([hub_rows, body_rows, tail_rows]))
    hub_cols = rng.integers(0, 50, m // 5)
    other_cols = rng.integers(0, n, m - m // 5)
    cols = np.concatenate([hub_cols, other_cols])[rng.permutation(m)].astype(np.int64)
    coef = rng.random(m).astype(np.float32)
    b2 = _blocked2d_pack(rows, cols, coef, n, target_blk=4096)
    stats = blocked2d_stats(b2)
    assert stats["real_edges"] == m
    assert stats["pad_ratio"] <= 1.3, f"pad ratio {stats['pad_ratio']} > 1.3"


@pytest.mark.parametrize("impl", ["carry", "rmw"])
def test_blocked2d_apply_impls_exact(impl, monkeypatch):
    """Both per-piece accumulator formulations (carried-window flush and
    unconditional read-modify-write) must be exact on a multi-band multi-bucket
    layout."""
    import importlib

    gs = importlib.import_module("cuda_gcn_tpu.ops.graphsum")
    from cuda_gcn_tpu.data.graph import _blocked2d_pack

    monkeypatch.setattr(gs, "_BLOCKED2D_IMPL", impl)
    rng = np.random.default_rng(9)
    n, m = 2000, 30000
    rows = np.sort(rng.integers(0, n, m).astype(np.int64))
    cols = rng.integers(0, n, m).astype(np.int64)
    coef = rng.random(m).astype(np.float32)
    b2 = _blocked2d_pack(rows, cols, coef, n, target_blk=128)
    assert len(b2.buckets) >= 1
    h = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(gs._blocked2d_apply(jnp.asarray(h), b2, n))
    expected = np.zeros((n, 8), np.float64)
    np.add.at(expected, rows, coef[:, None].astype(np.float64) * h[cols])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=2e-4)


def test_label_propagation_finds_planted_communities():
    spec = SynthSpec(num_nodes=200, num_edges=3000, num_classes=2, input_dim=8,
                     nnz_per_node=3, homophily=0.95, train_per_class=5,
                     num_val=20, num_test=20)
    ds = make_synthetic(spec, seed=3)
    labels = label_propagation(ds.graph.indptr, ds.graph.indices, rounds=8)
    # most nodes of the same planted class should share an LPA label:
    # measure purity of the largest two LPA clusters against planted classes
    uniq, counts = np.unique(labels, return_counts=True)
    top = uniq[np.argsort(-counts)[:2]]
    agree = 0
    for lab in top:
        members = ds.label[labels == lab]
        agree += np.bincount(members, minlength=2).max()
    assert agree / len(labels) > 0.6


def test_cluster_order_is_permutation():
    labels = np.array([2, 0, 1, 0, 2, 2])
    perm = cluster_order(labels)
    assert sorted(perm) == list(range(6))
    # cluster 2 (size 3) first, then cluster 0 (size 2), then 1
    assert list(labels[perm]) == [2, 2, 2, 0, 0, 1]


def test_reorder_dataset_consistency(tiny_dataset):
    ds = tiny_dataset
    perm = locality_permutation(ds.graph)
    r = reorder_dataset(ds, perm)
    rds = r.dataset
    assert rds.graph.nnz == ds.graph.nnz
    np.testing.assert_array_equal(rds.label, ds.label[perm])
    np.testing.assert_array_equal(rds.split, ds.split[perm])
    # dense features rows permuted
    np.testing.assert_allclose(rds.dense_features(), ds.dense_features()[perm])
    # adjacency: new edge set == relabeled old edge set
    def edges(csr):
        src = np.repeat(np.arange(csr.nrows), np.diff(csr.indptr))
        return set(zip(src.tolist(), csr.indices.tolist()))

    old_edges = edges(ds.graph)
    relabeled = {(int(r.inv_perm[a]), int(r.inv_perm[b])) for a, b in old_edges}
    assert edges(rds.graph) == relabeled


def test_training_with_bsr_matches_segment(tiny_dataset):
    """End-to-end: one no-dropout step with auto/bsr+reorder == segment baseline."""
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod

    cfg = GCNConfig(hidden_dim=8, dropout=0.0, epochs=3, seed=0,
                    graphsum_backend="segment")
    r_seg = train_mod.run(cfg, tiny_dataset, verbose=False)
    import dataclasses

    cfg_bsr = dataclasses.replace(cfg, graphsum_backend="bsr")
    r_bsr = train_mod.run(cfg_bsr, tiny_dataset, verbose=False)
    assert r_bsr.history[-1]["train_loss"] == pytest.approx(
        r_seg.history[-1]["train_loss"], rel=1e-4)
    assert r_bsr.test_acc == pytest.approx(r_seg.test_acc, abs=0.02)


def test_bsr_duplicate_edges_accumulate():
    """A dataset can list the same neighbor twice; duplicate edges must
    contribute twice to the tile (the generic np.add.at path), matching the
    reference parser's keep-duplicates semantics."""
    # 4-node graph, all edges in one 32x32 tile; edge (0,1) duplicated
    indptr = np.array([0, 3, 5, 7, 9], dtype=np.int64)
    indices = np.array([0, 1, 1, 1, 2, 2, 3, 3, 0], dtype=np.int64)
    csr = CSR(indptr, indices)
    g = bsr_graph(csr)
    assert int(g.bsr_tiles.shape[0]) == 1 and g.nnz == 0  # fully tiled
    h = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 1
    expected = oracle.graphsum_forward(indptr, indices, h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h), g))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_dropped_flat_coo_fails_loudly(clustered, monkeypatch):
    """When the flat residual COO is replaced by placeholders at large scale
    (FLAT_RESID_MAX_NNZ), any backend that needs it must raise, not silently
    aggregate zero edges (ADVICE.md round-1, data/graph.py)."""
    import cuda_gcn_tpu.data.graph as graph_mod

    ds, h = clustered
    monkeypatch.setattr(graph_mod, "FLAT_RESID_MAX_NNZ", 0)
    g = build_graph(ds.graph, backend="bsr", bsr_tile=32, bsr_min_edges=64,
                    bsr_dtype="float32", blocked_blk=32, blocked_min_nodes=0)
    assert g.resid_nnz > 0 and int(g.src.shape[0]) == 0  # placeholder engaged
    # the blocked bsr path still works and stays exact
    expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                       h.astype(np.float64))
    np.testing.assert_allclose(np.asarray(graphsum(jnp.asarray(h), g)),
                               expected, rtol=1e-4, atol=1e-5)
    # flat-COO consumers fail loudly
    from cuda_gcn_tpu.data.graph import dense_adjacency

    with pytest.raises(ValueError, match="flat"):
        graphsum(jnp.asarray(h), g.with_backend("segment"))
    with pytest.raises(ValueError):
        dense_adjacency(g)


def test_auto_tile_budget_math():
    """Budget = HBM minus features/activations/residual/headroom, floored at
    1 GB (VERDICT round-1 item 2: use the real chip memory, 15.75 GB proven)."""
    from cuda_gcn_tpu.data.graph import auto_tile_budget

    hbm = int(15.5 * (1 << 30))
    n, nnz = 931_860, 87_400_000
    aux = n * 640 * 4  # reddit4x dense features, lane-padded
    b = auto_tile_budget(n, nnz, aux_bytes=aux, hbm_bytes=hbm)
    # must leave room for everything and still beat the old 5 GB fallback
    assert b > 6 << 30
    assert b + aux + 2 * 12 * nnz + (1 << 30) <= hbm
    # floor engages when reserves exceed HBM
    assert auto_tile_budget(n, nnz, aux_bytes=hbm, hbm_bytes=hbm) == 1 << 30


def test_auto_budget_small_graph_is_deterministic(clustered):
    """Small builds must resolve the auto budget without querying devices."""
    import unittest.mock as mock

    import cuda_gcn_tpu.data.graph as graph_mod

    ds, _ = clustered
    with mock.patch.object(graph_mod, "device_hbm_bytes",
                           side_effect=AssertionError("device queried")):
        g = build_graph(ds.graph, backend="bsr", bsr_tile=32, bsr_min_edges=8)
    assert g.backend == "bsr"


def test_tile_coverage_on_reddit_profile_shape():
    """Tile coverage on a reddit-shaped community graph (power-law degrees,
    homophily 0.8, dense-ish communities) must exceed 50% after the LPA
    locality reorder — the measured reddit-profile coverage is ~78%
    (docs/PERF.md); round-1 verdict flagged that no test pinned this."""
    spec = SynthSpec(num_nodes=20000, num_edges=400000, num_classes=41,
                     input_dim=32, nnz_per_node=4, homophily=0.8,
                     train_per_class=20, num_val=500, num_test=1000)
    ds = make_synthetic(spec, seed=5)
    perm = locality_permutation(ds.graph)
    rds = reorder_dataset(ds, perm).dataset
    g = build_graph(rds.graph, backend="bsr", bsr_tile=64)
    covered = (rds.graph.nnz - g.nnz) / rds.graph.nnz
    assert covered > 0.5, f"tile coverage {covered:.2%} below 50%"
    # without the reorder, coverage on the same graph should be far lower
    g0 = build_graph(ds.graph, backend="bsr", bsr_tile=64)
    covered0 = (ds.graph.nnz - g0.nnz) / ds.graph.nnz
    assert covered > covered0 + 0.2


@pytest.mark.parametrize("shape", ["hub", "tail", "one_row"])
def test_blocked2d_pathological_distributions(shape):
    """The 2D streaming pack must stay exact on skewed inputs: a hub node
    holding half the edges (band cuts collapse), edges concentrated in the
    last rows (clamped final windows), and a single-row graph (one band)."""
    rng = np.random.default_rng(42)
    n, m = 600, 4000
    if shape == "hub":
        rows = np.concatenate([np.zeros(m // 2, np.int64),
                               rng.integers(0, n, m - m // 2)])
    elif shape == "tail":
        rows = rng.integers(n - 20, n, m).astype(np.int64)
    else:
        rows = np.full(m, n // 2, np.int64)
    cols = rng.integers(0, n, m).astype(np.int64)
    rows = np.sort(rows)
    coef = rng.random(m).astype(np.float32)

    from cuda_gcn_tpu.data.graph import _blocked2d_pack
    from cuda_gcn_tpu.ops.graphsum import _blocked2d_apply

    b2 = _blocked2d_pack(rows, cols, coef, n, target_blk=64)
    h = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(_blocked2d_apply(jnp.asarray(h), b2, n))
    expected = np.zeros((n, 8), np.float64)
    np.add.at(expected, rows, coef[:, None].astype(np.float64) * h[cols])
    # atol covers f32 cancellation noise in the hub row's ~2000-term sum
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=2e-4)


def test_symmetric_build_aliases_transpose(clustered):
    """On a symmetric Â with a pair-closed tile set, NO transpose layout is
    built or shipped (zero-copy transpose of a symmetric operator): merely
    aliasing device arrays still costs double in XLA's argument accounting
    (two jit parameters, one buffer — the 16x OOM lesson), so the backward
    routes through the FORWARD structures via the static symmetric flag."""
    ds, h = clustered
    g = bsr_graph(ds.graph, bsr_min_edges=64, blocked_blk=32, blocked_min_nodes=0)
    assert g.symmetric
    assert g.t_src.size == 0 and g.t_dst.size == 0 and g.t_coef.size == 0
    assert g.blk_bwd is None and g.blk_fwd is not None
    # tile set is pair-closed: every off-diagonal (r, c) has its mirror (c, r)
    rows = np.asarray(g.bsr_rows, dtype=np.int64)
    cols = np.asarray(g.bsr_cols, dtype=np.int64)
    key = set(zip(rows.tolist(), cols.tolist()))
    assert all((c, r) in key for r, c in key)
    # residual edge multiset is symmetric (what makes the alias the transpose)
    src = np.asarray(g.src, dtype=np.int64)
    dst = np.asarray(g.dst, dtype=np.int64)
    n = g.n_nodes
    assert np.array_equal(np.sort(src * n + dst), np.sort(dst * n + src))


def test_pair_closure_when_budget_splits_mirror(clustered):
    """A budget that cuts mid-pair must drop the unpaired mirror tile and
    return its edges to the residual; fwd and vjp stay exact throughout."""
    ds, h = clustered
    one_tile = 32 * 32 * 4
    for budget in (one_tile, 3 * one_tile, 5 * one_tile):
        g = bsr_graph(ds.graph, bsr_budget_bytes=budget,
                      blocked_blk=32, blocked_min_nodes=0)
        rows = np.asarray(g.bsr_rows, dtype=np.int64)
        cols = np.asarray(g.bsr_cols, dtype=np.int64)
        key = set(zip(rows.tolist(), cols.tolist()))
        assert all((c, r) in key for r, c in key), f"unpaired tile at {budget}"
        expected = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                           h.astype(np.float64))
        got = np.asarray(graphsum(jnp.asarray(h), g))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_asymmetric_graph_builds_real_transpose():
    """Directed input: no aliasing — the true transpose layouts are built and
    the vjp still matches the segment backend."""
    rng = np.random.default_rng(7)
    n = 96
    # random directed CSR (deliberately NOT symmetrized), self-loops included
    counts = rng.integers(1, 6, n)
    indices = np.concatenate(
        [np.sort(np.unique(np.append(rng.integers(0, n, c), i)))
         for i, c in enumerate(counts)]).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum([len(np.unique(np.append(rng.integers(0, n, c), i)))
                            for i, c in enumerate(counts)])
    # rebuild deterministically (the comprehension above must match)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        c = rng.integers(1, 6)
        rows.append(np.sort(np.unique(np.append(rng.integers(0, n, c), i))))
    indices = np.concatenate(rows).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum([len(r) for r in rows])
    csr = CSR(indptr, indices)
    g = bsr_graph(csr, blocked_blk=32, blocked_min_nodes=0)
    if g.symmetric:  # pathological luck — regenerate would be needed
        pytest.skip("random directed graph came out symmetric")
    assert g.t_src is not g.src
    assert g.blk_bwd is None or g.blk_bwd is not g.blk_fwd
    g_seg = build_graph(csr, backend="segment")
    h = rng.standard_normal((n, 8)).astype(np.float32)
    ga = jax.grad(lambda hh: jnp.sum(jnp.sin(graphsum(hh, g))))(jnp.asarray(h))
    gb = jax.grad(lambda hh: jnp.sum(jnp.sin(graphsum(hh, g_seg))))(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_piece_arrays_compact_dtypes(clustered):
    """Window-local piece indices store 16-bit (rows int16 pad=rbw, cols
    uint16) and coef stores the run's compute dtype — the residual HBM
    resident halves at 16x scale (PieceBucket docstring)."""
    import ml_dtypes

    from cuda_gcn_tpu.data.graph import _blocked2d_pack

    ds, _ = clustered
    g = bsr_graph(ds.graph, bsr_min_edges=64, blocked_blk=32, blocked_min_nodes=0)
    for bk in g.blk_fwd.buckets:
        assert bk.rows.dtype == jnp.int16
        assert bk.cols.dtype == jnp.uint16
        assert bk.coef.dtype == jnp.float32  # f32 run default
    # bf16 compute dtype -> bf16 stored coefs (cast equals the apply's
    # per-multiply cast, at half the HBM)
    rows = np.repeat(np.arange(64, dtype=np.int64), 4)
    cols = (rows * 7 + np.tile(np.arange(4), 64)) % 64
    coef = np.random.default_rng(0).random(rows.size).astype(np.float32)
    b2 = _blocked2d_pack(rows, cols, coef, 64, target_blk=32,
                         coef_dtype=np.dtype(ml_dtypes.bfloat16))
    assert all(bk.coef.dtype == jnp.bfloat16 for bk in b2.buckets)


# ---------------------------------------------------------------------------
# Pallas BSR tile-contraction pipeline (ops/pallas_bsr.py) — interpret mode
# ---------------------------------------------------------------------------

def _xla_dense_part(tiles, rows, cols, h, n, t_blocks):
    from cuda_gcn_tpu.ops.graphsum import _tile_contract

    tb = tiles.shape[1]
    d = h.shape[1]
    hT = jnp.pad(h, ((0, t_blocks * tb - n), (0, 0))).T.reshape(d, t_blocks, tb)
    outb = _tile_contract(tiles, rows, cols, hT, t_blocks, False)
    return np.asarray(
        outb.transpose(1, 0, 2).reshape(d, t_blocks * tb)[:, :n].T)


@pytest.mark.parametrize("d", [16, 13])
def test_pallas_bsr_matches_xla_tile_contract(d):
    """The Pallas pipeline must reproduce the XLA tile contraction exactly in
    f32 (same contraction + f32 accumulation), including: multi-tile block
    rows (accumulator runs), EMPTY block rows (the aliased-zeros init), the
    first and last block rows, and non-sublane-aligned feature widths."""
    from cuda_gcn_tpu.ops.pallas_bsr import bsr_tile_contract

    rng = np.random.default_rng(3)
    tb, t_blocks = 128, 6
    n = t_blocks * tb - 57
    # rows sorted; rows 2 and 5 have no tiles; row 3 has a 3-tile run
    rows = jnp.asarray(np.array([0, 0, 1, 3, 3, 3, 4], np.int32))
    cols = jnp.asarray(np.array([5, 0, 1, 2, 0, 4, 3], np.int32))
    tiles = jnp.asarray(rng.standard_normal((7, tb, tb)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    ref = _xla_dense_part(tiles, rows, cols, h, n, t_blocks)
    got = np.asarray(bsr_tile_contract(tiles, rows, cols, h, n, t_blocks,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
    # empty block rows really are zero (rows 2, 5 -> node range [2*tb, 3*tb))
    assert np.all(got[2 * tb:3 * tb] == 0.0)


def test_pallas_bsr_bf16_tiles_single_tile():
    """bf16 tile storage (the production default) upcasts in-kernel; K=1 and
    an all-rows-distinct tile list exercise the flush-every-step path."""
    from cuda_gcn_tpu.ops.pallas_bsr import bsr_tile_contract

    rng = np.random.default_rng(4)
    tb, t_blocks = 128, 3
    n = t_blocks * tb
    rows = jnp.asarray(np.array([0, 1, 2], np.int32))
    cols = jnp.asarray(np.array([2, 0, 1], np.int32))
    tiles = jnp.asarray(rng.standard_normal((3, tb, tb)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    ref = _xla_dense_part(tiles, rows, cols, h, n, t_blocks)
    got = np.asarray(bsr_tile_contract(tiles, rows, cols, h, n, t_blocks,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)

    got1 = np.asarray(bsr_tile_contract(tiles[:1], rows[:1], cols[:1], h, n,
                                        t_blocks, interpret=True))
    ref1 = _xla_dense_part(tiles[:1], rows[:1], cols[:1], h, n, t_blocks)
    np.testing.assert_allclose(got1, ref1, rtol=1e-6, atol=1e-5)


def test_tile_engine_dispatch(clustered, monkeypatch):
    """_TILE_ENGINE: 'auto' must stay on the XLA path off-TPU; 'pallas' forces
    the Pallas pipeline (interpret mode here) and the full graphsum output must
    match the XLA-engine output — the end-to-end integration check."""
    import importlib

    gs = importlib.import_module("cuda_gcn_tpu.ops.graphsum")
    from cuda_gcn_tpu.ops import pallas_bsr

    ds, h = clustered
    graph = bsr_graph(ds.graph)
    assert graph.backend == "bsr" and graph.bsr_tiles.shape[0] > 0
    hj = jnp.asarray(h)

    calls = []
    real = pallas_bsr.bsr_tile_contract
    monkeypatch.setattr(pallas_bsr, "bsr_tile_contract",
                        lambda *a, **k: calls.append(1) or real(*a, **k))

    monkeypatch.setattr(gs, "_TILE_ENGINE", "auto")
    ref = np.asarray(graphsum(hj, graph))
    assert not calls, "auto engine must not run Pallas off-TPU"

    monkeypatch.setattr(gs, "_TILE_ENGINE", "pallas")
    got = np.asarray(graphsum(hj, graph))
    assert calls, "pallas engine must dispatch to the kernel"
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_pallas_bsr_blocked_variant_matches(monkeypatch):
    """The blocked (streamed-activations) variant must match the resident one
    — it is the fallback when the table exceeds the VMEM budget."""
    from cuda_gcn_tpu.ops import pallas_bsr

    rng = np.random.default_rng(5)
    tb, t_blocks = 128, 4
    n = t_blocks * tb - 9
    rows = jnp.asarray(np.array([0, 1, 1, 3], np.int32))
    cols = jnp.asarray(np.array([3, 2, 0, 1], np.int32))
    tiles = jnp.asarray(rng.standard_normal((4, tb, tb)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    resident = np.asarray(pallas_bsr.bsr_tile_contract(
        tiles, rows, cols, h, n, t_blocks, interpret=True, variant="resident"))
    blocked = np.asarray(pallas_bsr.bsr_tile_contract(
        tiles, rows, cols, h, n, t_blocks, interpret=True, variant="blocked"))
    np.testing.assert_allclose(blocked, resident, rtol=1e-6, atol=1e-6)
    ref = _xla_dense_part(tiles, rows, cols, h, n, t_blocks)
    np.testing.assert_allclose(blocked, ref, rtol=1e-6, atol=1e-5)


def test_resident_gate_respects_scoped_vmem_reality():
    """The round-4 regression class: at reddit dims (t_blocks=911, tb=256,
    dp in {32, 96}, f32 activations) the whole-table working set is 28-86 MiB.
    The gate must (a) admit only what the raised 128 MiB kernel limit can
    hold, and (b) never admit a table the physical VMEM can't fit."""
    from cuda_gcn_tpu.ops import pallas_bsr

    for dp in (32, 96):
        ws = pallas_bsr._resident_working_set_bytes(911, dp, 256, 4, 2)
        table = 911 * dp * 256 * 4
        assert ws > table  # accounts for blocks + accumulator, not just table
        assert ws < pallas_bsr._VMEM_BYTES
    # 16x-scale table (t_blocks ~3644): must NOT pass the gate at dp=96
    assert not pallas_bsr._resident_fits(3644, 96, 256, 4, 2)
    assert pallas_bsr.select_variant(10, 256, 3644, 96, 4, 2) == "blocked"
    assert pallas_bsr.select_variant(10, 256, 911, 32, 4, 2) == "resident"


def test_verified_variant_off_tpu_uses_gate_and_memoizes(monkeypatch):
    """Off-TPU the verified engine is the gate choice (interpret always
    lowers); on-TPU-shaped failures fall back blocked -> xla (simulated by
    stubbing the AOT compile)."""
    from cuda_gcn_tpu.ops import pallas_bsr

    pallas_bsr._ENGINE_CACHE.clear()
    # probe-informed policy (artifacts/exp_pallas_bsr.json): xla at one-vreg
    # width, blocked at mid widths, resident at dp>=64 when the table fits
    assert pallas_bsr.verified_variant(7, 256, 911, 16, jnp.float32,
                                       jnp.bfloat16) == "xla"
    assert pallas_bsr.verified_variant(7, 256, 911, 32, jnp.float32,
                                       jnp.bfloat16) == "blocked"
    assert pallas_bsr.verified_variant(7, 256, 911, 96, jnp.float32,
                                       jnp.bfloat16) == "resident"
    pallas_bsr._ENGINE_CACHE.clear()
    # simulate TPU where every Pallas compile is rejected: must return 'xla'
    monkeypatch.setattr(pallas_bsr, "_on_tpu", lambda: True)
    monkeypatch.setattr(pallas_bsr, "_aot_compiles", lambda *a, **k: False)
    pallas_bsr._ENGINE_CACHE.clear()
    assert pallas_bsr.verified_variant(7, 256, 911, 96, jnp.float32,
                                       jnp.bfloat16) == "xla"
    # resident rejected, blocked accepted -> 'blocked'
    monkeypatch.setattr(pallas_bsr, "_aot_compiles",
                        lambda variant, *a, **k: variant == "blocked")
    pallas_bsr._ENGINE_CACHE.clear()
    assert pallas_bsr.verified_variant(7, 256, 911, 96, jnp.float32,
                                       jnp.bfloat16) == "blocked"
    # memoized: flipping the stub no longer changes the answer
    monkeypatch.setattr(pallas_bsr, "_aot_compiles", lambda *a, **k: False)
    assert pallas_bsr.verified_variant(7, 256, 911, 96, jnp.float32,
                                       jnp.bfloat16) == "blocked"
    pallas_bsr._ENGINE_CACHE.clear()
