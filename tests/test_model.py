"""Model-level tests: golden eval-mode activations vs the numpy oracle, gradient
equivalence with a dense formulation, and end-to-end convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from cuda_gcn_tpu.config import GCNConfig
from cuda_gcn_tpu.data.graph import build_graph
from cuda_gcn_tpu.models import gcn
from cuda_gcn_tpu import train as train_mod


@pytest.fixture(scope="module")
def setup(tiny_dataset):
    ds = tiny_dataset
    cfg = GCNConfig().__class__(hidden_dim=8, seed=1)
    cfg = ds.apply_config(cfg)
    graph = build_graph(ds.graph, backend="segment")
    x = jnp.asarray(ds.dense_features())
    params = gcn.init_params(jax.random.PRNGKey(1), cfg.layer_dims())
    return ds, cfg, graph, x, params


def test_forward_matches_oracle(setup):
    """Eval-mode per-layer math must equal the reference pipeline exactly
    (SURVEY.md §4 golden-activation test)."""
    ds, cfg, graph, x, params = setup
    logits = gcn.apply(params, graph, x, training=False)
    expected = oracle.gcn_forward(
        ds.graph.indptr, ds.graph.indices,
        np.asarray(x, np.float64), np.asarray(params["w1"], np.float64),
        np.asarray(params["w2"], np.float64))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("backend", ["segment", "ell", "dense"])
def test_forward_backend_equivalence(setup, backend):
    ds, cfg, graph, x, params = setup
    logits_seg = gcn.apply(params, graph, x, training=False)
    graph_b = build_graph(ds.graph, backend=backend)
    logits_b = gcn.apply(params, graph_b, x, training=False)
    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_seg), rtol=1e-4, atol=1e-5)


def test_loss_grad_matches_oracle(setup):
    """d(CE+l2)/dW equals the reference's effective gradient: CE grad chained
    through the graph, plus wd*W1 on layer-1 only."""
    ds, cfg, graph, x, params = setup
    truth = train_mod.make_truth(ds.split, ds.label, 1)
    wd = 5e-4

    (loss, (logits, acc)), grads = jax.value_and_grad(gcn.loss_fn, has_aux=True)(
        params, graph, x, truth, weight_decay=wd, training=False)

    # oracle loss: CE on oracle logits + l2
    logits_np = np.asarray(logits, np.float64)
    exp_ce, exp_gl = oracle.cross_entropy(logits_np.copy(), np.asarray(truth))
    exp_loss = exp_ce + wd / 2 * np.sum(np.asarray(params["w1"], np.float64) ** 2)
    np.testing.assert_allclose(float(loss), exp_loss, rtol=1e-5)

    # oracle W2 grad: chain exp_gl back through GraphSum then H1ᵀ
    g_h2a = oracle.graphsum_backward(ds.graph.indptr, ds.graph.indices, exp_gl)
    h1 = oracle.graphsum_forward(ds.graph.indptr, ds.graph.indices,
                                 np.asarray(x, np.float64) @ np.asarray(params["w1"], np.float64))
    h1 = np.maximum(h1, 0.0)
    exp_gw2 = h1.T @ g_h2a
    np.testing.assert_allclose(np.asarray(grads["w2"]), exp_gw2, rtol=1e-4, atol=1e-6)

    # W1 grad includes the decay term wd*W1
    g_h1 = (g_h2a @ np.asarray(params["w2"], np.float64).T)  # after matmul bwd
    relu_mask = (h1 > 0).astype(np.float64)
    g_h1b = oracle.graphsum_backward(ds.graph.indptr, ds.graph.indices, g_h1 * relu_mask)
    exp_gw1 = np.asarray(x, np.float64).T @ g_h1b + wd * np.asarray(params["w1"], np.float64)
    np.testing.assert_allclose(np.asarray(grads["w1"]), exp_gw1, rtol=1e-4, atol=1e-6)


def test_training_converges(tiny_dataset):
    """Full run on the synthetic dataset must fit the train split and generalize
    well above chance (SURVEY.md §4 convergence test)."""
    cfg = GCNConfig(hidden_dim=16, epochs=60, seed=0, graphsum_backend="segment")
    result = train_mod.run(cfg, tiny_dataset, verbose=False)
    assert result.history[-1]["train_acc"] > 0.9
    assert result.test_acc > 0.5  # 4 classes -> chance is 0.25
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]


def test_three_layer_model(tiny_dataset):
    cfg = GCNConfig(hidden_dims=(16, 8), epochs=5, seed=0)
    result = train_mod.run(cfg, tiny_dataset, verbose=False)
    assert len(result.state.params) == 3
    assert np.isfinite(result.history[-1]["train_loss"])


def test_sparse_feature_path_matches_dense(tiny_dataset):
    """feature_matmul='sparse' (CSR-values layer 0) must produce the same eval
    logits as the densified path, and the same fused-epoch metrics when
    dropout=0 (dropout masks differ only on structural zeros otherwise)."""
    import jax.numpy as jnp

    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.models import gcn

    cfg_d = GCNConfig(epochs=3, seed=0, dropout=0.0)
    cfg_d, graph, x_d, truths = train_mod.prepare(cfg_d, tiny_dataset)
    cfg_s = GCNConfig(epochs=3, seed=0, dropout=0.0, feature_matmul="sparse")
    cfg_s, _, x_s, _ = train_mod.prepare(cfg_s, tiny_dataset)

    params = gcn.init_params(jax.random.PRNGKey(0), cfg_d.layer_dims())
    ld = gcn.apply(params, graph, x_d, training=False)
    ls = gcn.apply(params, graph, x_s, training=False)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ls), rtol=1e-5, atol=1e-6)

    kw = dict(dropout_rate=0.0, weight_decay=cfg_d.weight_decay, lr=cfg_d.learning_rate)
    s1 = train_mod.create_state(cfg_d)
    s1, m1 = train_mod.run_epochs(s1, graph, x_d, truths[1], truths[2], epochs=3, **kw)
    s2 = train_mod.create_state(cfg_s)
    s2, m2 = train_mod.run_epochs(s2, graph, x_s, truths[1], truths[2], epochs=3, **kw)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_banded_feature_path_matches_dense(tiny_dataset, monkeypatch):
    """The huge-graph banded layer-0 (BandedFeatures, engaged above
    BANDED_FEATURES_MIN_ROWS) must match the dense path end-to-end: eval
    logits and the fused-epoch training metrics at dropout=0."""
    import jax.numpy as jnp

    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.models import gcn
    from cuda_gcn_tpu.ops import matmul as matmul_mod

    monkeypatch.setattr(matmul_mod, "BANDED_FEATURES_MIN_ROWS", 1)
    monkeypatch.setattr(matmul_mod, "FEAT_BAND_ROWS", 16)

    cfg_d = GCNConfig(epochs=3, seed=0, dropout=0.0)
    cfg_d, graph, x_d, truths = train_mod.prepare(cfg_d, tiny_dataset)
    cfg_b = GCNConfig(epochs=3, seed=0, dropout=0.0, feature_matmul="sparse")
    cfg_b, _, x_b, _ = train_mod.prepare(cfg_b, tiny_dataset)
    assert isinstance(x_b, matmul_mod.BandedFeatures)
    assert x_b.vals.shape[0] > 1  # multiple bands exercised

    params = gcn.init_params(jax.random.PRNGKey(0), cfg_d.layer_dims())
    ld = gcn.apply(params, graph, x_d, training=False)
    lb = gcn.apply(params, graph, x_b, training=False)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lb), rtol=1e-5, atol=1e-6)

    kw = dict(dropout_rate=0.0, weight_decay=cfg_d.weight_decay, lr=cfg_d.learning_rate)
    s1 = train_mod.create_state(cfg_d)
    s1, m1 = train_mod.run_epochs(s1, graph, x_d, truths[1], truths[2], epochs=3, **kw)
    s2 = train_mod.create_state(cfg_b)
    s2, m2 = train_mod.run_epochs(s2, graph, x_b, truths[1], truths[2], epochs=3, **kw)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # dropout ON must still train (masks differ from dense only in shape)
    s3 = train_mod.create_state(cfg_b)
    s3, m3 = train_mod.run_epochs(s3, graph, x_b, truths[1], truths[2], epochs=3,
                                  dropout_rate=0.5, weight_decay=cfg_b.weight_decay,
                                  lr=cfg_b.learning_rate)
    assert np.all(np.isfinite(np.asarray(m3[0])))
