"""Op-level tests: every graphsum backend against the numpy oracle, custom VJP
against autodiff of the dense formulation, loss/accuracy/Adam against oracle math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from cuda_gcn_tpu.data.graph import build_graph, dense_adjacency
from cuda_gcn_tpu.data.parser import CSR
from cuda_gcn_tpu.ops import adam
from cuda_gcn_tpu.ops.dropout import dropout
from cuda_gcn_tpu.ops.graphsum import graphsum
from cuda_gcn_tpu.ops.loss import l2_penalty, masked_cross_entropy, strict_accuracy
from cuda_gcn_tpu.ops.matmul import csr_matmul

BACKENDS = ["segment", "ell", "dense", "pallas"]


def random_csr(rng, n, avg_deg=4):
    """Random directed graph CSR with prepended self-loops (parser-style)."""
    rows = []
    for i in range(n):
        deg = rng.integers(0, 2 * avg_deg + 1)
        neigh = rng.choice(n, size=deg, replace=False) if deg else np.empty(0, np.int64)
        rows.append(np.concatenate([[i], neigh]))
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum([len(r) for r in rows])
    return CSR(indptr=indptr.astype(np.int32),
               indices=np.concatenate(rows).astype(np.int32))


@pytest.fixture(scope="module")
def csr_and_h():
    rng = np.random.default_rng(3)
    csr = random_csr(rng, 64)
    h = rng.standard_normal((64, 12)).astype(np.float32)
    return csr, h


@pytest.mark.parametrize("backend", BACKENDS)
def test_graphsum_forward_matches_oracle(csr_and_h, backend):
    csr, h = csr_and_h
    graph = build_graph(csr, backend=backend)
    expected = oracle.graphsum_forward(csr.indptr, csr.indices, h.astype(np.float64))
    got = np.asarray(graphsum(jnp.asarray(h), graph))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", BACKENDS)
def test_graphsum_vjp_matches_dense_autodiff(csr_and_h, backend):
    csr, h = csr_and_h
    graph = build_graph(csr, backend=backend)
    adj = np.asarray(dense_adjacency(build_graph(csr, backend="segment")))

    def dense_f(h):
        return jnp.sum(jnp.sin(jnp.asarray(adj) @ h))

    def sparse_f(h):
        return jnp.sum(jnp.sin(graphsum(h, graph)))

    g_dense = jax.grad(dense_f)(jnp.asarray(h))
    g_sparse = jax.grad(sparse_f)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense), rtol=1e-4, atol=1e-5)


def test_graphsum_under_jit(csr_and_h):
    csr, h = csr_and_h
    graph = build_graph(csr, backend="ell")
    f = jax.jit(lambda h, g: graphsum(h, g))
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(h), graph)),
        oracle.graphsum_forward(csr.indptr, csr.indices, h.astype(np.float64)),
        rtol=1e-5, atol=1e-5)


def test_cross_entropy_matches_oracle(rng):
    logits = rng.standard_normal((30, 5)).astype(np.float32) * 3
    truth = rng.integers(-1, 5, size=30).astype(np.int32)
    assert (truth >= 0).any()
    exp_loss, exp_grad = oracle.cross_entropy(logits.astype(np.float64), truth)
    loss = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(truth))
    np.testing.assert_allclose(float(loss), exp_loss, rtol=1e-5)
    grad = jax.grad(lambda l: masked_cross_entropy(l, jnp.asarray(truth)))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad), exp_grad, rtol=1e-4, atol=1e-6)


def test_strict_accuracy_matches_oracle(rng):
    logits = rng.standard_normal((50, 7)).astype(np.float32)
    # inject exact ties: tie counts as correct (gcn.cpp:88-93 strict > comparison)
    logits[0] = 0.0
    truth = rng.integers(-1, 7, size=50).astype(np.int32)
    truth[0] = 3
    got = float(strict_accuracy(jnp.asarray(logits), jnp.asarray(truth)))
    assert got == pytest.approx(oracle.strict_accuracy(logits, truth))


def test_adam_matches_oracle(rng):
    w = rng.standard_normal((8, 4)).astype(np.float32)
    params = {"w1": jnp.asarray(w)}
    state = adam.init(params)
    hp = adam.AdamParams(lr=0.01)
    w_np, m_np, v_np = w.astype(np.float64), np.zeros_like(w, np.float64), np.zeros_like(w, np.float64)
    for t in range(1, 6):
        g = rng.standard_normal(w.shape).astype(np.float32)
        params, state = adam.apply(params, {"w1": jnp.asarray(g)}, state, hp)
        w_np, m_np, v_np = oracle.adam_step(w_np, g.astype(np.float64), m_np, v_np, t, lr=0.01)
    np.testing.assert_allclose(np.asarray(params["w1"]), w_np, rtol=1e-4, atol=1e-6)
    assert int(state.step) == 5


def test_adam_weight_decay_via_loss_grad(rng):
    # grad of (CE-like + l2_penalty) == raw grad + wd*W, the reference decay path
    w = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    wd = 5e-4
    g = jax.grad(lambda w: l2_penalty(w, wd))(w)
    np.testing.assert_allclose(np.asarray(g), wd * np.asarray(w), rtol=1e-6)


def test_dropout_distribution():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000, 100))
    y = np.asarray(dropout(x, 0.5, key, training=True))
    kept = y > 0
    np.testing.assert_allclose(kept.mean(), 0.5, atol=0.02)   # keep prob = 1-p
    np.testing.assert_allclose(y[kept].mean(), 2.0, rtol=1e-5)  # inverted scale 1/(1-p)
    np.testing.assert_allclose(y.mean(), 1.0, atol=0.05)       # expectation preserved
    # eval mode and rate 0 are identity
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.5, key, training=False)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.0, key, training=True)), np.asarray(x))


def test_csr_matmul_matches_oracle(tiny_dataset, rng):
    ds = tiny_dataset
    w = rng.standard_normal((ds.input_dim, 8)).astype(np.float32)
    rows = np.repeat(np.arange(ds.num_nodes), np.diff(ds.feature_index.indptr)).astype(np.int32)
    got = csr_matmul(jnp.asarray(ds.feature_value), jnp.asarray(rows),
                     jnp.asarray(ds.feature_index.indices), jnp.asarray(w), ds.num_nodes)
    expected = oracle.sparse_matmul_forward(
        ds.feature_index.indptr, ds.feature_index.indices,
        ds.feature_value.astype(np.float64), w.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
    # and equals the dense path
    dense = ds.dense_features() @ w
    np.testing.assert_allclose(np.asarray(got), dense, rtol=1e-4, atol=1e-4)


def test_pallas_backend_falls_back_when_h_exceeds_vmem(csr_and_h, monkeypatch):
    """backend='pallas' on an over-VMEM activation table must dispatch to the
    XLA ELL path (same packing) and stay exact — the fallback the kernel
    docstring promises (ops/pallas_spmm.py)."""
    import cuda_gcn_tpu.ops.pallas_spmm as ps

    csr, h = csr_and_h
    graph = build_graph(csr, backend="pallas")
    expected = oracle.graphsum_forward(csr.indptr, csr.indices, h.astype(np.float64))
    monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 1)  # nothing fits
    assert not ps.fits_vmem(graph.n_nodes, h.shape[1])
    called = []
    orig = ps.ell_spmm
    monkeypatch.setattr(ps, "ell_spmm", lambda *a, **k: called.append(1) or orig(*a, **k))
    got = np.asarray(graphsum(jnp.asarray(h), graph))
    assert not called, "pallas kernel must not run when h exceeds VMEM"
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def _random_feature_csr(rng, n_rows, n_cols, avg_nnz=5):
    """Random CSR feature matrix with some empty rows."""
    counts = rng.integers(0, 2 * avg_nnz + 1, size=n_rows)
    indptr = np.zeros(n_rows + 1, np.int32)
    indptr[1:] = np.cumsum(counts)
    indices = rng.integers(0, n_cols, size=int(indptr[-1])).astype(np.int32)
    # sort within rows (CSR convention; ties fine)
    for i in range(n_rows):
        indices[indptr[i]:indptr[i + 1]].sort()
    values = rng.standard_normal(int(indptr[-1])).astype(np.float32)
    return indptr, indices, values


def test_banded_matmul_matches_csr(rng):
    """banded_matmul (huge-graph layer-0, ops/matmul.py) == csr_matmul, fwd and
    dW, on a multi-band matrix whose row count is not a band multiple."""
    from cuda_gcn_tpu.ops.matmul import banded_matmul, make_banded_features

    n_rows, n_cols, d = 100, 37, 8
    indptr, indices, values = _random_feature_csr(rng, n_rows, n_cols)
    w = jnp.asarray(rng.standard_normal((n_cols, d)).astype(np.float32))
    bf = make_banded_features(indptr, indices, values, n_cols, np.float32, rbw=16)
    assert bf.vals.shape[0] == -(-n_rows // 16)  # multiple bands exercised

    rows = np.repeat(np.arange(n_rows, dtype=np.int32), np.diff(indptr))
    ref = csr_matmul(jnp.asarray(values), jnp.asarray(rows),
                     jnp.asarray(indices), w, n_rows)
    got = banded_matmul(w, bf.vals, bf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # dW through both formulations (banded: custom VJP; csr: autodiff)
    g = rng.standard_normal((n_rows, d)).astype(np.float32)
    loss_b = lambda w_: jnp.vdot(banded_matmul(w_, bf.vals, bf), jnp.asarray(g))
    loss_c = lambda w_: jnp.vdot(csr_matmul(jnp.asarray(values), jnp.asarray(rows),
                                            jnp.asarray(indices), w_, n_rows),
                                 jnp.asarray(g))
    dw_b = jax.grad(loss_b)(w)
    dw_c = jax.grad(loss_c)(w)
    np.testing.assert_allclose(np.asarray(dw_b), np.asarray(dw_c), rtol=1e-4, atol=1e-4)


def test_banded_features_compact_dtypes(rng):
    """BandedFeatures index arrays store 16-bit lanes when the geometry allows
    (uint16 cols at F<=65536, int16 band-local rows, uint16 t_idx at
    Emax<=65536) — at the 16x-reddit feature matrix this halves ~1 GB of HBM
    arguments. Numerics must be unchanged by the compaction (the apply
    upcasts per scan step)."""
    from cuda_gcn_tpu.ops.matmul import banded_matmul, make_banded_features

    n_rows, n_cols, d = 100, 37, 8
    indptr, indices, values = _random_feature_csr(rng, n_rows, n_cols)
    bf = make_banded_features(indptr, indices, values, n_cols, np.float32, rbw=16)
    assert bf.cols.dtype == jnp.uint16
    assert bf.rows.dtype == jnp.int16
    assert bf.t_idx.dtype == jnp.uint16
    w = jnp.asarray(rng.standard_normal((n_cols, d)).astype(np.float32))
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), np.diff(indptr))
    g = jnp.asarray(rng.standard_normal((n_rows, d)).astype(np.float32))
    # dW equality pins the recomputed col-sorted ids (pad slots rewritten to
    # F via the row sentinel) against the reference csr formulation
    dw_b = jax.grad(lambda w_: jnp.vdot(banded_matmul(w_, bf.vals, bf), g))(w)
    dw_c = jax.grad(lambda w_: jnp.vdot(
        csr_matmul(jnp.asarray(values), jnp.asarray(rows),
                   jnp.asarray(indices), w_, n_rows), g))(w)
    np.testing.assert_allclose(np.asarray(dw_b), np.asarray(dw_c),
                               rtol=1e-4, atol=1e-4)


def test_banded_features_int32_fallback_dtypes(rng):
    """The 16-bit compaction must fall back to int32 lanes when the geometry
    demands it — F > 65536 (wide feature spaces) forces int32 cols, and
    Emax > 65536 (the actual 16x-reddit band occupancy, ~287K nnz/band)
    forces int32 t_idx — with numerics still equal to the csr formulation."""
    from cuda_gcn_tpu.ops.matmul import banded_matmul, make_banded_features

    # Case 1: F > 65536 -> cols must be int32 (a uint16 would alias ids)
    n_rows, n_cols, d = 16, (1 << 16) + 64, 4
    indptr, indices, values = _random_feature_csr(rng, n_rows, n_cols)
    # pin at least one id beyond the uint16 range so aliasing would be caught
    if len(indices):
        indices[0] = n_cols - 1
        indices[:max(indptr[1], 1)].sort()
    bf = make_banded_features(indptr, indices, values, n_cols, np.float32, rbw=8)
    assert bf.cols.dtype == jnp.int32
    assert bf.t_idx.dtype == jnp.uint16  # Emax here is tiny; stays compact

    w = jnp.asarray(rng.standard_normal((n_cols, d)).astype(np.float32))
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), np.diff(indptr))
    got = np.asarray(banded_matmul(w, bf.vals, bf))
    want = np.asarray(csr_matmul(jnp.asarray(values), jnp.asarray(rows),
                                 jnp.asarray(indices), w, n_rows))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Case 2: Emax > 65536 -> t_idx must be int32 (slot permutation overflows
    # uint16). One hub row with 70K nnz in a narrow feature space.
    n_rows2, n_cols2 = 4, 97
    hub = (1 << 16) + 100
    counts = np.array([3, hub, 2, 5], np.int64)
    indptr2 = np.zeros(n_rows2 + 1, np.int64)
    indptr2[1:] = np.cumsum(counts)
    indices2 = rng.integers(0, n_cols2, size=int(indptr2[-1])).astype(np.int32)
    for i in range(n_rows2):
        indices2[indptr2[i]:indptr2[i + 1]].sort()
    values2 = rng.standard_normal(int(indptr2[-1])).astype(np.float32)
    bf2 = make_banded_features(indptr2, indices2, values2, n_cols2,
                               np.float32, rbw=2)
    assert bf2.t_idx.dtype == jnp.int32
    assert bf2.cols.dtype == jnp.uint16

    w2 = jnp.asarray(rng.standard_normal((n_cols2, d)).astype(np.float32))
    rows2 = np.repeat(np.arange(n_rows2, dtype=np.int32), counts)
    g2 = jnp.asarray(rng.standard_normal((n_rows2, d)).astype(np.float32))
    got2 = np.asarray(banded_matmul(w2, bf2.vals, bf2))
    want2 = np.asarray(csr_matmul(jnp.asarray(values2), jnp.asarray(rows2),
                                  jnp.asarray(indices2), w2, n_rows2))
    np.testing.assert_allclose(got2, want2, rtol=1e-3, atol=1e-3)
    # dW through the int32 t_idx path (recomputed col-sorted ids at scale)
    dw_b = jax.grad(lambda w_: jnp.vdot(banded_matmul(w_, bf2.vals, bf2), g2))(w2)
    dw_c = jax.grad(lambda w_: jnp.vdot(
        csr_matmul(jnp.asarray(values2), jnp.asarray(rows2),
                   jnp.asarray(indices2), w_, n_rows2), g2))(w2)
    np.testing.assert_allclose(np.asarray(dw_b), np.asarray(dw_c),
                               rtol=1e-3, atol=1e-3)


def test_banded_matmul_under_jit_and_empty_tail_band(rng):
    from cuda_gcn_tpu.ops.matmul import banded_matmul, make_banded_features

    n_rows, n_cols, d = 33, 10, 4  # tail band has a single row
    indptr, indices, values = _random_feature_csr(rng, n_rows, n_cols, avg_nnz=2)
    w = jnp.asarray(rng.standard_normal((n_cols, d)).astype(np.float32))
    bf = make_banded_features(indptr, indices, values, n_cols, np.float32, rbw=16)
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), np.diff(indptr))
    ref = csr_matmul(jnp.asarray(values), jnp.asarray(rows),
                     jnp.asarray(indices), w, n_rows)
    got = jax.jit(banded_matmul)(w, bf.vals, bf)
    assert got.shape == (n_rows, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", ["segment", "bsr"])
def test_graphsum_pair_matches_separate_passes(csr_and_h, backend):
    """graphsum_pair == (graphsum(zt), graphsum(ze)) with the SAME f32 path."""
    from cuda_gcn_tpu.ops.graphsum import graphsum_pair

    csr, h = csr_and_h
    graph = build_graph(csr, backend=backend)
    rng = np.random.default_rng(11)
    zt = jnp.asarray(h)
    ze = jnp.asarray(rng.standard_normal(h.shape).astype(np.float32))
    out_t, out_e = jax.jit(graphsum_pair)(zt, ze, graph)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(graphsum(zt, graph)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(graphsum(ze, graph)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("backend", ["segment", "bsr"])
def test_graphsum_pair_backward_is_train_width_only(csr_and_h, backend):
    """d/dzt matches plain graphsum's VJP exactly; d/dze is zero (stop_gradient
    contract — the eval half only ever feeds undifferentiated val metrics)."""
    from cuda_gcn_tpu.ops.graphsum import graphsum_pair

    csr, h = csr_and_h
    graph = build_graph(csr, backend=backend)
    rng = np.random.default_rng(12)
    zt = jnp.asarray(h)
    ze = jnp.asarray(rng.standard_normal(h.shape).astype(np.float32))

    def f_pair(zt, ze):
        out_t, out_e = graphsum_pair(zt, ze, graph)
        # the eval half feeds a metric-like reduction that must NOT backprop
        return jnp.sum(jnp.sin(out_t)) + jax.lax.stop_gradient(jnp.sum(out_e))

    def f_plain(zt):
        return jnp.sum(jnp.sin(graphsum(zt, graph)))

    gt, ge = jax.grad(f_pair, argnums=(0, 1))(zt, ze)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(jax.grad(f_plain)(zt)),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.max(jnp.abs(ge))) == 0.0
