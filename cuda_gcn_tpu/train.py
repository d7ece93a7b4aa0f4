"""Training harness: jitted train/eval steps and the epoch loop.

TPU-native equivalent of GCN::run / train_epoch / eval (src/seq/gcn.cpp:107-158)
and CUDAGCN::run (src/cuda/cuda_gcn.cu:136-187). Where the reference pays per-epoch
host↔device crossings (feature re-upload cuda_gcn.cu:81-83, set_truth
malloc/memcpy/free cuda_gcn.cu:85-97, full-logits D2H for accuracy
cuda_gcn.cu:100-120), the TPU build keeps everything device-resident: one jitted
``train_step`` with donated state returns only scalar metrics, truth vectors are
precomputed per split and live on device, and accuracy/loss reduce on device.

Output contract preserved from the reference for diffability (gcn.cpp:139-157):

    epoch=%d train_loss=%.5f train_acc=%.5f val_loss=%.5f val_acc=%.5f time=%.5f
    total training time=%.5f
    test_loss=%.5f test_acc=%.5f time=%.5f

As in the reference, the per-epoch time (and "total training time") includes the
validation forward pass — TMR_TRAIN brackets train_epoch()+eval(2) (gcn.cpp:135-140),
and the train loss/accuracy are measured on the dropout-active training forward,
before the optimizer step. Early stopping: stop when the current val loss exceeds
the mean of the last ``early_stopping`` val losses, current included
(gcn.cpp:142-150).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cuda_gcn_tpu.config import GCNConfig
from cuda_gcn_tpu.data.graph import Graph, build_graph
from cuda_gcn_tpu.data.parser import GCNDataset
from cuda_gcn_tpu.models import gcn
from cuda_gcn_tpu.ops import adam
from cuda_gcn_tpu.utils.timer import TMR_TEST, TMR_TRAIN, timers


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: Any
    opt: adam.AdamState
    key: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt, self.key), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def create_state(cfg: GCNConfig, rng_key: jax.Array | None = None) -> TrainState:
    key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed)
    init_key, run_key = jax.random.split(key)
    params = gcn.init_params(init_key, cfg.layer_dims(), dtype=jnp.dtype(cfg.param_dtype))
    return TrainState(params=params, opt=adam.init(params), key=run_key)


def make_truth(split: np.ndarray, label: np.ndarray, current_split: int) -> jnp.ndarray:
    """set_truth equivalent (gcn.cpp:78-81): label where split matches, else -1."""
    return jnp.asarray(np.where(split == current_split, label, -1).astype(np.int32))


def _train_epoch_core(state: TrainState, graph: Graph, x, truth, *,
                      dropout_rate: float, weight_decay: float, lr: float):
    """One full-batch step: forward (training mode) + grads + Adam. Returns
    (new_state, train_loss, train_acc) — loss/acc at the *pre-step* weights,
    measured on the dropout-active forward, like train_epoch (gcn.cpp:107-118)."""
    key, subkey = jax.random.split(state.key)
    (loss, (_, acc)), grads = jax.value_and_grad(gcn.loss_fn, has_aux=True)(
        state.params, graph, x, truth,
        weight_decay=weight_decay, key=subkey, dropout_rate=dropout_rate, training=True,
    )
    params, opt = adam.apply(state.params, grads, state.opt, adam.AdamParams(lr=lr))
    return TrainState(params=params, opt=opt, key=key), loss, acc


def _eval_core(params, graph: Graph, x, truth, *, weight_decay: float):
    loss, (_, acc) = gcn.loss_fn(params, graph, x, truth, weight_decay=weight_decay, training=False)
    return loss, acc


@partial(jax.jit, static_argnames=("dropout_rate", "weight_decay", "lr"), donate_argnums=(0,))
def train_step(state: TrainState, graph: Graph, x: jnp.ndarray, truth: jnp.ndarray,
               *, dropout_rate: float, weight_decay: float, lr: float):
    return _train_epoch_core(state, graph, x, truth, dropout_rate=dropout_rate,
                             weight_decay=weight_decay, lr=lr)


@partial(jax.jit, static_argnames=("weight_decay",))
def eval_step(params, graph: Graph, x: jnp.ndarray, truth: jnp.ndarray, *, weight_decay: float):
    """Evaluation forward (training=false): returns (loss_incl_l2, acc) (gcn.cpp:120-128)."""
    return _eval_core(params, graph, x, truth, weight_decay=weight_decay)


def _combined_metrics(logits, truth, w1, weight_decay):
    from cuda_gcn_tpu.ops.loss import l2_penalty, masked_cross_entropy, strict_accuracy

    loss = masked_cross_entropy(logits, truth) + l2_penalty(w1, weight_decay)
    return loss, strict_accuracy(logits, truth)


@partial(jax.jit, static_argnames=("epochs", "dropout_rate", "weight_decay", "lr"),
         donate_argnums=(0,))
def run_epochs(state: TrainState, graph: Graph, x: jnp.ndarray,
               truth_train: jnp.ndarray, truth_val: jnp.ndarray, *,
               epochs: int, dropout_rate: float, weight_decay: float, lr: float):
    """Fused epoch loop: ``epochs`` (train + validation) iterations in ONE device
    program via lax.scan — no per-epoch host dispatch (which costs ~29 ms/epoch
    over a tunneled device). Returns (state, stacked per-epoch metrics).

    Pass-fusion: epoch e's validation forward uses the post-step params θ_e —
    exactly the params epoch e+1's training forward starts from. Since graphsum
    is linear and TPU gathers are width-independent (docs/PERF.md), iteration
    e+1 computes BOTH forwards in one width-concatenated aggregation
    (gcn.apply_pair): 4 adjacency passes per epoch instead of 6. The scan's
    iteration i therefore yields train metrics of epoch i and val metrics of
    epoch i-1; a single trailing eval supplies epoch `epochs`' val metrics and
    the metric streams are realigned before returning. Semantics (metric
    values, dropout key sequence, update order) are IDENTICAL to running
    train_step + eval_step per epoch, matching GCN::run (gcn.cpp:130-158).

    Used when early stopping is disabled (the reference default,
    gcn.cpp:142-150 with early_stopping=0); exact per-epoch semantics otherwise
    require a host-side decision between epochs.
    """

    def fused_loss(params, key):
        logits_t, logits_e = gcn.apply_pair(params, graph, x, key=key,
                                            dropout_rate=dropout_rate)
        tl, ta = _combined_metrics(logits_t, truth_train, params["w1"], weight_decay)
        vl, va = _combined_metrics(logits_e, truth_val, params["w1"], weight_decay)
        return tl, (ta, vl, va)

    def body(state, _):
        key, subkey = jax.random.split(state.key)
        (tl, (ta, vl_prev, va_prev)), grads = jax.value_and_grad(
            fused_loss, has_aux=True)(state.params, subkey)
        params, opt = adam.apply(state.params, grads, state.opt, adam.AdamParams(lr=lr))
        return TrainState(params=params, opt=opt, key=key), (tl, ta, vl_prev, va_prev)

    state, (tl, ta, vl, va) = jax.lax.scan(body, state, None, length=epochs)
    # realign: iteration i's (vl, va) evaluate θ_{i-1}; drop the θ_0 entry and
    # append the final post-step eval.
    vl_last, va_last = _eval_core(state.params, graph, x, truth_val,
                                  weight_decay=weight_decay)
    vl = jnp.concatenate([vl[1:], vl_last[None]])
    va = jnp.concatenate([va[1:], va_last[None]])
    return state, (tl, ta, vl, va)


# Chunking bounds the runtime of a single fused device program: very long
# programs (reddit-scale, 100 epochs fused) can exceed the execution watchdog
# of the tunneled device backend and kill the worker. Each chunk targets this
# many seconds of estimated device time; small graphs run all epochs in ONE
# program (each extra dispatch costs ~29 ms on the tunneled backend, which
# dominates cora-scale totals).
TARGET_PROGRAM_SECONDS = 10.0
# Rough per-edge-per-pass cost on the bench chip (docs/PERF.md): between the
# 12.3 ns gather floor and the tile-covered fast path.
_EST_SECONDS_PER_EDGE_PASS = 5e-9
# Beyond this MEASURED chunk runtime, shrink subsequent chunks: the tunneled
# worker's execution watchdog kills programs around ~60 s, and the static
# estimate has been observed 10x off at 4x-reddit scale (932K nodes / 87M nnz,
# where HBM pressure changes the cost regime entirely — docs/PERF.md).
MAX_PROGRAM_SECONDS = 40.0
# Above this estimated per-epoch cost the static model is untrusted: probe the
# true per-epoch time with 1-epoch programs before committing to a chunk size.
# Reddit (21M nnz, est 0.42 s/epoch, measured 0.3 s) stays on the static path
# — one compile, no probe dispatches — so the headline bench is unaffected.
_PROBE_ABOVE_EST_SECONDS = 1.0


def _balance_chunks(epochs: int, raw: int) -> int:
    # balance: equal-size chunks avoid compiling a second (tail-size) program
    raw = max(1, min(epochs, raw))
    n_chunks = -(-epochs // raw)
    return -(-epochs // n_chunks)


def _estimate_epoch_seconds(nnz: int) -> float:
    return max(nnz * 4 * _EST_SECONDS_PER_EDGE_PASS, 1e-6)


def pick_epoch_chunk(nnz: int, epochs: int) -> int:
    per_epoch = _estimate_epoch_seconds(nnz)
    return _balance_chunks(epochs, int(TARGET_PROGRAM_SECONDS / per_epoch))


def run_chunked_loop(run_one, epochs: int, chunk: int | None, nnz: int,
                     passes_per_epoch: int = 4,
                     times_out: list | None = None):
    """The shared chunk-sizing/adaptation policy for fused epoch runners.

    ``run_one(k)`` executes up to k fused epochs (mutating its own state) and
    returns either the 4-tuple of per-epoch metric arrays, or
    ``(metrics, n_done, stopped)`` when the runner can exit early (the
    on-device early-stopping loop). Chunks are sized from the static per-edge
    cost model at reddit scale and below; for larger graphs (estimate > ~1
    s/epoch) the true per-epoch time is probed with two 1-epoch programs (the
    first pays compile) and all remaining chunks are sized from the
    measurement. Any chunk measured over MAX_PROGRAM_SECONDS shrinks the
    following ones — a single oversized device program can trip the tunneled
    worker's execution watchdog. Used by the single-chip, sharded, and
    early-stopping runners so the policy exists exactly once.

    ``times_out``, when given a list, receives one MEASURED per-epoch wall
    time per completed epoch: each chunk's timed duration spread over its
    epochs (epochs inside one fused device program are indistinguishable by
    design — there is no host boundary to timestamp). This keeps the printed
    per-epoch ``time=`` values measurements in the reference's sense
    (src/seq/gcn.cpp:139-140) rather than one run-wide constant; the first
    chunk's epochs honestly carry their share of compile time, exactly as
    the clock saw it.

    Returns (metrics [4 x np.ndarray], stopped)."""
    if epochs <= 0:  # public policy helper: callers may pass epochs=0 (ADVICE round-2)
        return [np.zeros(0, np.float32) for _ in range(4)], False
    est = _estimate_epoch_seconds(nnz) * passes_per_epoch / 4
    probe = chunk is None and est > _PROBE_ABOVE_EST_SECONDS
    if chunk is None:
        chunk = _balance_chunks(epochs, int(TARGET_PROGRAM_SECONDS / est))
    parts: list[list[np.ndarray]] = []
    done = n_calls = 0
    stopped = False
    while done < epochs and not stopped:
        # probe calls: two 1-epoch programs (first includes compile; the second
        # is cached and measures pure execution)
        k = 1 if (probe and n_calls < 2) else min(chunk, epochs - done)
        t0 = time.perf_counter()
        out = run_one(k)
        if isinstance(out, tuple) and len(out) == 3:
            m, n_done, stopped = out
        else:
            m, n_done = out, k
        parts.append([np.asarray(v)[:n_done] for v in m])  # device sync per chunk
        dt = time.perf_counter() - t0
        if times_out is not None and n_done:
            times_out.extend([dt / n_done] * n_done)
        done += n_done
        n_calls += 1
        if probe and n_calls == 2:
            chunk = _balance_chunks(epochs - done,
                                    int(TARGET_PROGRAM_SECONDS / max(dt, 1e-6)))
        elif n_calls > 1 and dt > MAX_PROGRAM_SECONDS and k > 1:
            # n_calls > 1: the first call's time includes compilation, which
            # must not trigger a shrink (and a recompile) on the steady path
            chunk = max(1, int(MAX_PROGRAM_SECONDS / (dt / max(n_done, 1))))
    return [np.concatenate([p[i] for p in parts]) for i in range(4)], stopped


@partial(jax.jit, static_argnames=("epochs", "es_window", "dropout_rate",
                                   "weight_decay", "lr"), donate_argnums=(0, 5))
def run_epochs_es(state: TrainState, graph: Graph, x: jnp.ndarray,
                  truth_train: jnp.ndarray, truth_val: jnp.ndarray,
                  ring: jnp.ndarray, epoch0: jnp.ndarray, *,
                  epochs: int, es_window: int,
                  dropout_rate: float, weight_decay: float, lr: float):
    """Fused early-stopping epoch loop: up to ``epochs`` (train + validation)
    iterations in ONE device program via lax.while_loop, stopping on-device
    with EXACT reference semantics (gcn.cpp:142-150): after global epoch e
    (1-based), stop when e >= es_window and val_loss_e > mean of the last
    ``es_window`` val losses (current included).

    Unlike run_epochs there is no pass-fusion (the stop decision needs epoch
    e's val loss before epoch e+1 starts), so each iteration runs the plain
    train step + eval forward — 6 adjacency passes/epoch like the reference,
    but still zero per-epoch host dispatch (the stepwise loop this replaces
    paid ~2x29 ms dispatch per epoch on the tunneled chip, docs/PERF.md).

    ``ring`` carries the last ``es_window`` val losses across chunked calls
    (+inf-initialized: untouched slots never trigger a stop because the mean
    is +inf); ``epoch0`` is the global epoch count already run. Returns
    (state, metrics [epochs, 4] with +inf rows beyond the stop, n_done, stopped,
    ring).
    """

    def cond(carry):
        _, i, stop, _, _ = carry
        return jnp.logical_and(i < epochs, jnp.logical_not(stop))

    def body(carry):
        state, i, _, metrics, ring = carry
        state, tl, ta = _train_epoch_core(state, graph, x, truth_train,
                                          dropout_rate=dropout_rate,
                                          weight_decay=weight_decay, lr=lr)
        vl, va = _eval_core(state.params, graph, x, truth_val,
                            weight_decay=weight_decay)
        metrics = jax.lax.dynamic_update_slice(
            metrics, jnp.stack([tl, ta, vl, va])[None].astype(jnp.float32), (i, 0))
        epoch = epoch0 + i + 1  # 1-based global epoch
        ring = jax.lax.dynamic_update_slice(
            ring, vl[None].astype(jnp.float32), ((epoch - 1) % es_window,))
        stop = jnp.logical_and(epoch >= es_window,
                               vl > jnp.mean(ring))
        return state, i + 1, stop, metrics, ring

    metrics0 = jnp.full((epochs, 4), jnp.inf, jnp.float32)
    state, n_done, stopped, metrics, ring = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.bool_(False), metrics0, ring))
    return state, metrics, n_done, stopped, ring


def run_epochs_es_chunked(state: TrainState, graph: Graph, x, truth_train,
                          truth_val, *, epochs: int, es_window: int,
                          chunk: int | None = None,
                          times_out: list | None = None, **step_kwargs):
    """run_epochs_es in bounded chunks, sharing run_chunked_loop's full
    sizing/probe/shrink policy (6 adjacency passes per epoch here vs the
    fused loop's 4 — the cost model scales accordingly). Returns
    (state, [4 x np.ndarray] truncated at the stop epoch, stopped)."""
    hold = {"state": state,
            "ring": jnp.full((es_window,), jnp.inf, jnp.float32),
            "epoch0": 0}

    def run_one(k):
        hold["state"], metrics, n_done, stop_flag, hold["ring"] = run_epochs_es(
            hold["state"], graph, x, truth_train, truth_val, hold["ring"],
            jnp.int32(hold["epoch0"]), epochs=k, es_window=es_window,
            **step_kwargs)
        n_done = int(n_done)
        hold["epoch0"] += n_done
        m = np.asarray(metrics)
        return [m[:, i] for i in range(4)], n_done, bool(stop_flag)

    metrics, stopped = run_chunked_loop(run_one, epochs, chunk,
                                        graph.total_nnz or graph.nnz,
                                        passes_per_epoch=6,
                                        times_out=times_out)
    return hold["state"], metrics, stopped


def run_epochs_chunked(state: TrainState, graph: Graph, x, truth_train, truth_val, *,
                       epochs: int, chunk: int | None = None,
                       times_out: list | None = None, **step_kwargs):
    """run_epochs in fixed-size chunks (one compile when chunk divides epochs),
    materializing metrics between chunks. Returns (state, [4 x np.ndarray]).
    Chunk sizing/adaptation: run_chunked_loop."""
    holder = {"state": state}

    def run_one(k):
        holder["state"], m = run_epochs(holder["state"], graph, x, truth_train,
                                        truth_val, epochs=k, **step_kwargs)
        return m

    metrics, _ = run_chunked_loop(run_one, epochs, chunk, graph.total_nnz or graph.nnz,
                                  times_out=times_out)
    return holder["state"], metrics


@dataclasses.dataclass
class RunResult:
    test_loss: float
    test_acc: float
    total_train_time: float
    epochs_run: int
    state: TrainState
    history: list[dict]


def prepare(cfg: GCNConfig, dataset: GCNDataset):
    """Build device-resident inputs: graph, features, and per-split truth vectors.

    For the block-sparse backend, the dataset is first relabeled with the
    locality permutation (data/reorder.py) so communities land in contiguous
    node blocks — training metrics are permutation-invariant, so this is
    semantics-preserving.
    """
    from cuda_gcn_tpu.data.graph import DENSE_BACKEND_MAX_NODES

    cfg = dataset.apply_config(cfg)
    backend = cfg.graphsum_backend
    if backend == "auto":
        backend = "dense" if cfg.num_nodes <= DENSE_BACKEND_MAX_NODES else "bsr"
    if backend == "bsr" and cfg.reorder != "none":
        from cuda_gcn_tpu.data.reorder import locality_permutation, reorder_dataset

        perm = locality_permutation(dataset.graph)
        dataset = reorder_dataset(dataset, perm).dataset
    # feature-table bytes, declared to the tile-budget model so huge graphs
    # leave HBM room for x (data/graph.py auto_tile_budget): lane-padded dense
    # [N, pad128(F)] f32, or the COO triple (val+row+col) on the sparse path —
    # the 12x gap at 16x-reddit (0.78 vs 9.5 GB) is what moves the single-chip
    # wall (docs/PERF.md "16x-reddit")
    if cfg.feature_matmul == "sparse":
        from cuda_gcn_tpu.ops.matmul import BANDED_FEATURES_MIN_ROWS

        feat_nnz = int(dataset.feature_value.shape[0])
        if dataset.num_nodes >= BANDED_FEATURES_MIN_ROWS:
            # banded layout: compact index arrays (uint16 cols + int16 rows
            # + int32 t_idx = 8 B/slot worst case) + values over [B, Emax]
            # padded slots (pad is small at ~uniform nnz/row; 1.1x headroom)
            item = np.dtype(cfg.compute_dtype).itemsize
            feat_bytes = int(feat_nnz * 1.1) * (item + 8)
        else:
            feat_bytes = feat_nnz * 12  # COO triple (val+row+col)
    else:
        feat_bytes = dataset.num_nodes * (-(-cfg.input_dim // 128) * 128) * 4
    from cuda_gcn_tpu.data.graph import BSR_DEFAULT_BUDGET_BYTES

    budget = (int(cfg.bsr_budget_gb * (1 << 30)) if cfg.bsr_budget_gb is not None
              else BSR_DEFAULT_BUDGET_BYTES)
    graph = build_graph(dataset.graph, backend=backend, aux_bytes=feat_bytes,
                        act_itemsize=np.dtype(cfg.compute_dtype).itemsize,
                        bsr_budget_bytes=budget)
    # resolve (and AOT-verify, engine 'auto') the Pallas-vs-XLA tile engine at
    # every feature width the fused loop will trace, OUTSIDE the big trace —
    # a Mosaic rejection falls back here instead of crashing the run
    from cuda_gcn_tpu.ops.graphsum import resolved_tile_engine

    resolved_tile_engine(graph, {2 * cfg.hidden_dim, 2 * cfg.output_dim,
                                 cfg.hidden_dim, cfg.output_dim},
                         dtype=cfg.compute_dtype)
    if cfg.feature_matmul == "sparse":
        from cuda_gcn_tpu.ops.matmul import (BANDED_FEATURES_MIN_ROWS,
                                             SparseFeatures,
                                             make_banded_features)

        fi = dataset.feature_index
        if dataset.num_nodes >= BANDED_FEATURES_MIN_ROWS:
            # csr_matmul's [N, d] segment output scalarizes past ~1M rows and
            # its [nnz, d] gather temp is GBs at 16x — the banded layout keeps
            # both bounded (ops/matmul.py "banded sparse layer-0")
            x = make_banded_features(fi.indptr, fi.indices,
                                     dataset.feature_value, cfg.input_dim,
                                     cfg.compute_dtype)
        else:
            rows = np.repeat(np.arange(dataset.num_nodes, dtype=np.int32),
                             np.diff(fi.indptr))
            x = SparseFeatures(
                values=jnp.asarray(dataset.feature_value.astype(np.dtype(cfg.compute_dtype))),
                rows=jnp.asarray(rows), cols=jnp.asarray(fi.indices.astype(np.int32)),
                n_rows=dataset.num_nodes, n_cols=cfg.input_dim)
    else:
        x = jnp.asarray(dataset.dense_features(np.dtype(cfg.compute_dtype)))
    truths = {s: make_truth(dataset.split, dataset.label, s) for s in (1, 2, 3)}
    return cfg, graph, x, truths


def prime_cache(cfg: GCNConfig, dataset: GCNDataset, verbose: bool = True):
    """AOT-compile the device programs ``run(cfg, dataset)`` would execute,
    WITHOUT running them — the cold-compile cost (183-249 s for the reddit
    bench vs its 28 s runtime, docs/PERF.md "Compile time") is paid once,
    explicitly, and lands in the persistent XLA cache so the subsequent run
    is warm. The reference never pays a runtime compile (C++ is AOT); this is
    the TPU-native equivalent of that guarantee for latency-sensitive runs.

    Compiles the fused-epoch program at every chunk size the sizing policy
    (run_chunked_loop) can request up front — the balanced chunk, its tail,
    and the 1-epoch probe programs on probe-scale graphs. Adaptive SHRINK
    sizes (after a mid-run watchdog trip) are measurement-dependent and stay
    cold. Returns [(program, epochs_per_program, seconds)].
    """
    cfg, graph, x, truths = prepare(cfg, dataset)
    state = create_state(cfg)
    nnz = graph.total_nnz or graph.nnz
    kw = dict(dropout_rate=cfg.dropout, weight_decay=cfg.weight_decay,
              lr=cfg.learning_rate)
    es = cfg.early_stopping > 0
    sizes: list[int] = []
    if cfg.epochs > 1:
        est = _estimate_epoch_seconds(nnz) * (6 if es else 4) / 4
        if est > _PROBE_ABOVE_EST_SECONDS:
            sizes.append(1)  # the two probe programs (sizing policy)
        chunk = _balance_chunks(cfg.epochs, int(TARGET_PROGRAM_SECONDS / est))
        sizes.append(chunk)
        done = chunk * (-(-cfg.epochs // chunk) - 1)
        tail = cfg.epochs - done
        if tail and tail not in sizes:
            sizes.append(tail)
    out = []
    for k in sizes:
        t0 = time.perf_counter()
        if es:
            ring = jnp.full((cfg.early_stopping,), jnp.inf, jnp.float32)
            run_epochs_es.lower(state, graph, x, truths[1], truths[2], ring,
                                jnp.int32(0), epochs=k,
                                es_window=cfg.early_stopping, **kw).compile()
            name = "run_epochs_es"
        else:
            run_epochs.lower(state, graph, x, truths[1], truths[2],
                             epochs=k, **kw).compile()
            name = "run_epochs"
        out.append((name, k, time.perf_counter() - t0))
        if verbose:
            print(f"primed {name}[epochs={k}] in {out[-1][2]:.1f}s")
    t0 = time.perf_counter()
    eval_step.lower(state.params, graph, x, truths[3],
                    weight_decay=cfg.weight_decay).compile()
    out.append(("eval_step", 1, time.perf_counter() - t0))
    if verbose:
        print(f"primed eval_step in {out[-1][2]:.1f}s")
    return out


def run(cfg: GCNConfig, dataset: GCNDataset, verbose: bool = True,
        initial_state: TrainState | None = None, time_ops: bool = False) -> RunResult:
    """Full training run with the reference's epoch loop and output contract.

    ``time_ops`` additionally measures every per-op TMR_* phase at the real
    model shapes after training (utils/profiling.populate_op_timers), so
    ``--timing`` reports true device-time averages per op — the reference's
    PRINT_TIMER_AVERAGE intent (src/common/timer.h:26) with real sync."""
    cfg, graph, x, truths = prepare(cfg, dataset)
    timers.reset(TMR_TRAIN, TMR_TEST)  # per-run totals (see PhaseTimer.reset)
    state = initial_state if initial_state is not None else create_state(cfg)

    step_kwargs = dict(dropout_rate=cfg.dropout, weight_decay=cfg.weight_decay, lr=cfg.learning_rate)

    history: list[dict] = []
    loss_history: list[float] = []
    epochs_run = 0
    stopped_early = False
    if cfg.epochs > 1:
        # fused path: epochs run in chunked device programs with no per-epoch
        # host dispatch. With early stopping the stop decision is made
        # ON-DEVICE inside a lax.while_loop with exact reference semantics
        # (run_epochs_es); without it, the pass-fused scan (run_epochs).
        timers.start(TMR_TRAIN)
        epoch_times: list[float] = []  # chunk-true measured per-epoch times
        if cfg.early_stopping > 0:
            state, metrics, stopped_early = run_epochs_es_chunked(
                state, graph, x, truths[1], truths[2], epochs=cfg.epochs,
                es_window=cfg.early_stopping, times_out=epoch_times,
                **step_kwargs)
        else:
            state, metrics = run_epochs_chunked(state, graph, x, truths[1], truths[2],
                                                epochs=cfg.epochs,
                                                times_out=epoch_times, **step_kwargs)
        total_time = timers.stop(TMR_TRAIN)
        epochs_run = len(metrics[0])
        if len(epoch_times) != epochs_run:  # defensive: never drop epochs
            epoch_times = [total_time / max(epochs_run, 1)] * epochs_run
        for epoch in range(1, epochs_run + 1):
            train_loss, train_acc, val_loss, val_acc = (float(m[epoch - 1]) for m in metrics)
            epoch_time = epoch_times[epoch - 1]
            if verbose:
                print(f"epoch={epoch} train_loss={train_loss:.5f} train_acc={train_acc:.5f} "
                      f"val_loss={val_loss:.5f} val_acc={val_acc:.5f} time={epoch_time:.5f}")
            history.append(dict(epoch=epoch, train_loss=train_loss, train_acc=train_acc,
                                val_loss=val_loss, val_acc=val_acc, time=epoch_time))
            loss_history.append(val_loss)
        if stopped_early and verbose:
            print("Early stopping...")
    else:
        for epoch in range(1, cfg.epochs + 1):
            timers.start(TMR_TRAIN)
            state, train_loss, train_acc = train_step(state, graph, x, truths[1], **step_kwargs)
            val_loss, val_acc = eval_step(state.params, graph, x, truths[2],
                                          weight_decay=cfg.weight_decay)
            # materialize before stopping the clock (block_until_ready alone is
            # unreliable over the tunneled backend)
            train_loss, train_acc, val_loss, val_acc = (
                float(train_loss), float(train_acc), float(val_loss), float(val_acc))
            epoch_time = timers.stop(TMR_TRAIN)
            epochs_run = epoch
            if verbose:
                print(f"epoch={epoch} train_loss={train_loss:.5f} train_acc={train_acc:.5f} "
                      f"val_loss={val_loss:.5f} val_acc={val_acc:.5f} time={epoch_time:.5f}")
            history.append(dict(epoch=epoch, train_loss=train_loss, train_acc=train_acc,
                                val_loss=val_loss, val_acc=val_acc, time=epoch_time))
            loss_history.append(val_loss)
            if cfg.early_stopping > 0 and epoch >= cfg.early_stopping:
                recent = loss_history[epoch - cfg.early_stopping : epoch]
                if val_loss > sum(recent) / cfg.early_stopping:
                    if verbose:
                        print("Early stopping...")
                    break

    total = timers.total(TMR_TRAIN)
    if verbose:
        print(f"total training time={total:.5f}")

    timers.start(TMR_TEST)
    test_loss, test_acc = eval_step(state.params, graph, x, truths[3], weight_decay=cfg.weight_decay)
    test_loss, test_acc = float(test_loss), float(test_acc)
    test_time = timers.stop(TMR_TEST)
    if verbose:
        print(f"test_loss={test_loss:.5f} test_acc={test_acc:.5f} time={test_time:.5f}")

    if time_ops:
        from cuda_gcn_tpu.utils.profiling import populate_op_timers

        populate_op_timers(graph, x, state.params, truths[1],
                           jax.random.PRNGKey(cfg.seed),
                           dropout_rate=cfg.dropout)

    return RunResult(test_loss=test_loss, test_acc=test_acc, total_train_time=total,
                     epochs_run=epochs_run, state=state, history=history)
