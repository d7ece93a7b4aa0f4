"""SPMD sharded training over a device mesh: halo-exchange GCN with shard_map.

The multi-chip execution layer the reference never had (its only parallelism is
CUDA grids on one GPU, SURVEY.md §2.4). Design:

* 1-D mesh axis ``'graph'``: node blocks (data/sequence-parallel analog). Each
  device owns a [B, d] slab of activations and its block's edges
  (see parallel/partition.py).
* Per GCN layer: (1) gather the rows each peer needs, (2) P-1 static-shape
  ``ppermute`` rounds over ICI exchange boundary features (each ring offset's
  buffer sized to that offset's max need — volume tracks actual boundary
  structure), (3) sorted-segment aggregation over local edges whose
  destinations index the concatenated ``[own | halo]`` buffer. XLA overlaps
  the collectives with the independent dense matmul / local compute —
  verified structurally, not assumed: the v5e-4-scheduled HLO places every
  ppermute as an async collective-permute-start/done pair with interior
  work in flight between them (scripts/exp_overlap_hlo.py;
  artifacts/overlap_hlo_v5e-4.json; pinned by tests/test_overlap_hlo.py).
* Weights are replicated (they are tiny: F×16, 16×C); their gradients emerge
  correctly via shard_map's replication rules when ``jax.grad`` is taken
  *outside* the shard_mapped loss. The loss itself reduces with ``psum`` so the
  returned scalar is replicated.
* Backward: the local aggregation reverses through the precomputed local
  transpose (sorted), each ``ppermute`` transposes to the inverse-offset
  ``ppermute``, and the send-gather transposes to a small scatter-add over
  halo rows only — all derived by autodiff, no hand-written backward pass.

This module is exercised on an 8-device virtual CPU mesh in tests and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda_gcn_tpu.config import GCNConfig
from cuda_gcn_tpu.data.parser import GCNDataset
from cuda_gcn_tpu.models.gcn import _layer0_transform
from cuda_gcn_tpu.ops import adam
from cuda_gcn_tpu.ops.dropout import dropout
from cuda_gcn_tpu.ops.graphsum import (RectGraph, _rect_apply, _zero_cotangent,
                                       rect_graphsum)
from cuda_gcn_tpu.ops.loss import l2_penalty
from cuda_gcn_tpu.ops.matmul import BandedFeatures, SparseFeatures, dense_matmul
from cuda_gcn_tpu.parallel.partition import PartitionedGraph, partition_graph

GRAPH_AXIS = "graph"


def _cast_payload(a: jnp.ndarray, halo_dtype: str) -> jnp.ndarray:
    """Wire-format cast for halo payloads. ``halo_dtype='bfloat16'`` (the
    production default, GCNConfig.halo_dtype) halves every ppermute round's
    bytes: activations tolerate bf16 rounding (they are multiplied by f32
    coefficients and accumulated in f32 on the receiving side), and the comm
    term is what keeps reddit-1x P=8 from the >=80% unoverlapped scaling bound
    (artifacts/predicted_scaling_reddit.json round 3: 0.786, binding term
    comm). No-op when the compute dtype already matches."""
    dt = jnp.dtype(halo_dtype)
    return a if a.dtype == dt else a.astype(dt)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(GRAPH_AXIS,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedInputs:
    """Device-stacked inputs; every array's leading axis is the part axis.

    The local edge set is carried SPLIT into interior (own-block destinations)
    and boundary (halo destinations) operators so the per-layer all_to_all and
    the interior aggregation have no data dependence — XLA's latency-hiding
    scheduler overlaps them (SURVEY.md §5 halo-overlap north star; schedule
    evidence: artifacts/overlap_hlo_v5e-4.json)."""

    interior: RectGraph    # leaves [P, Eimax]
    boundary: RectGraph    # leaves [P, Ebmax]
    send_secs: tuple       # P-1 arrays [P, hmax_k]: round-k ship lists
    # dense: [P*B, F] array (shard_map splits the row axis). Sparse layer-0
    # (cfg.feature_matmul == 'sparse'): a BandedFeatures / SparseFeatures
    # pytree whose stacked leaves lead with the part axis (ops/matmul.py
    # make_*_features_parts) — _local_features selects the device's slab.
    x: Any
    block: int
    n_local: int

    def tree_flatten(self):
        return ((self.interior, self.boundary, self.send_secs, self.x),
                (self.block, self.n_local))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, block=aux[0], n_local=aux[1])


def _index_rect(rg: RectGraph, i: int) -> RectGraph:
    """Select one part's slice from stacked [P, ...] leaves (covers the COO
    fields and, when present, the tile arrays and Blocked2DDev residuals)."""
    return jax.tree_util.tree_map(lambda a: a[i], rg)


def _local_features(x):
    """The device-local feature input inside shard_map. Dense x arrives
    already split ([B, F] — its spec splits the global row axis); the sparse
    pytrees arrive with a leading part axis of 1 to strip (same convention as
    the interior/boundary RectGraphs)."""
    if isinstance(x, (BandedFeatures, SparseFeatures)):
        return jax.tree_util.tree_map(lambda a: a[0], x)
    return x


def _vary_for_layer0(w, x_local):
    """Mark the replicated layer-0 weight device-varying before a sparse
    feature transform. banded_matmul's custom VJP is opaque to shard_map's
    varying-axes inference: its dW cotangent is computed from device-varying
    data, and without this cast shard_map cannot justify the replicated P()
    out-spec of the params cotangent. pcast's transpose is the psum that
    correctly all-reduces the per-device dW (exactly what autodiff inserts
    automatically on the dense path's jnp.dot)."""
    if isinstance(x_local, (BandedFeatures, SparseFeatures)):
        return jax.lax.pcast(w, GRAPH_AXIS, to="varying")
    return w


def halo_graphsum(own_h: jnp.ndarray, interior: RectGraph, boundary: RectGraph,
                  send_secs, block: int,
                  halo_dtype: str = "float32") -> jnp.ndarray:
    """One sharded aggregation: exchange halo rows while aggregating interior
    edges, then add the boundary contribution.

    own_h: [B, d] this device's activation slab. send_secs: P-1 ship lists
    [hmax_k] of block-local rows, one per ring offset — round k ppermutes
    q -> (q+k)%P, so each round's volume is the per-offset max need rather
    than the global worst pair. Returns [B, d] aggregated rows for owned
    nodes. The interior rect_graphsum does not depend on any collective
    result, so XLA can run the rounds and the interior work concurrently
    (structural evidence: tests/test_overlap_hlo.py pins the compiled
    schedule's start/done bracketing). Payloads ship in ``halo_dtype``
    (_cast_payload); the autodiff backward casts the reverse-ppermute
    cotangents to the same wire format (convert_element_type transposes to a
    cast back onto the operand dtype), so both directions pay the reduced
    bytes.
    """
    p = jax.lax.axis_size(GRAPH_AXIS)
    d = own_h.shape[1]
    parts = []
    for k, sidx in enumerate(send_secs, start=1):
        send = _cast_payload(own_h[sidx], halo_dtype)
        perm = [(q, (q + k) % p) for q in range(p)]
        parts.append(jax.lax.ppermute(send, GRAPH_AXIS, perm))
    halo = (jnp.concatenate(parts, axis=0).astype(own_h.dtype) if parts
            else jnp.zeros((boundary.n_in, d), own_h.dtype))
    interior_out = rect_graphsum(own_h, interior)       # overlaps the rounds
    halo_out = rect_graphsum(halo, boundary)
    return interior_out + halo_out


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _halo_pair_prim(halo_dtype, zt, ze, interior, boundary, send_secs):
    """Width-concatenated halo aggregation of (train, eval) activations whose
    BACKWARD runs at train width only — the sharded mirror of
    ops/graphsum._graphsum_pair_prim. Without it, autodiff of the fused pair
    forward ships 2d-wide cotangents through the reverse ppermute rounds and
    aggregates 2d-wide transposes, with the eval half's cotangent identically
    zero (it only feeds undifferentiated val metrics): 2x the backward comm
    bytes and 2x the transpose aggregation work, for nothing."""
    d = zt.shape[1]
    p = jax.lax.axis_size(GRAPH_AXIS)
    both = jnp.concatenate([zt, ze], axis=1)
    parts = []
    for k, sidx in enumerate(send_secs, start=1):
        send = _cast_payload(both[sidx], halo_dtype)
        perm = [(q, (q + k) % p) for q in range(p)]
        parts.append(jax.lax.ppermute(send, GRAPH_AXIS, perm))
    halo = (jnp.concatenate(parts, axis=0).astype(both.dtype) if parts
            else jnp.zeros((boundary.n_in, both.shape[1]), both.dtype))
    out = rect_graphsum(both, interior) + rect_graphsum(halo, boundary)
    return out[:, :d], out[:, d:]


def _halo_pair_fwd(halo_dtype, zt, ze, interior, boundary, send_secs):
    out = _halo_pair_prim(halo_dtype, zt, ze, interior, boundary, send_secs)
    return out, (interior, boundary, send_secs)


def _halo_pair_bwd(halo_dtype, res, gs):
    """Hand-written transpose of the (linear) pair forward at TRAIN width:
    interior transpose + boundary transpose into the halo buffer, then the
    inverse ppermute rounds scatter-add halo cotangents back onto their
    senders' rows. Elementwise identical to autodiff of halo_graphsum at
    width d (the bf16 wire cast lands at the same points)."""
    interior, boundary, send_secs = res
    g_t, g_e = gs  # the eval half's cotangent is zero by contract
    p = jax.lax.axis_size(GRAPH_AXIS)
    d_own = _rect_apply(g_t, interior, transpose=True)
    g_halo = _rect_apply(g_t, boundary, transpose=True)  # [halo_space, d]
    off = 0
    for k, sidx in enumerate(send_secs, start=1):
        sec = _cast_payload(g_halo[off: off + sidx.shape[0]], halo_dtype)
        off += sidx.shape[0]
        perm = [((q + k) % p, q) for q in range(p)]  # inverse of round k
        back = jax.lax.ppermute(sec, GRAPH_AXIS, perm)
        # pad slots ship row 0's value forward, but no boundary edge reads a
        # pad halo row, so their cotangent here is exactly 0 — the add is
        # the same scatter autodiff derives for own_h[sidx]
        d_own = d_own.at[sidx].add(back.astype(d_own.dtype))
    return (d_own.astype(g_t.dtype), jnp.zeros_like(g_e),
            _zero_cotangent(interior), _zero_cotangent(boundary),
            _zero_cotangent(send_secs))


_halo_pair_prim.defvjp(_halo_pair_fwd, _halo_pair_bwd)


def halo_graphsum_pair(zt, ze, interior: RectGraph, boundary: RectGraph,
                       send_secs, halo_dtype: str = "float32"):
    """(halo_graphsum(zt), stop_gradient(halo_graphsum(ze))) in ONE exchange +
    aggregation at concatenated width, differentiating at train width (see
    _halo_pair_prim). The eval output is stop_gradient'ed to make the
    contract explicit, exactly like ops/graphsum.graphsum_pair."""
    out_t, out_e = _halo_pair_prim(halo_dtype, zt, jax.lax.stop_gradient(ze),
                                   interior, boundary, tuple(send_secs))
    return out_t, jax.lax.stop_gradient(out_e)


def _per_device_forward(params, inputs: ShardedInputs, key, dropout_rate,
                        training, halo_dtype="float32"):
    """The SPMD program for one device: full GCN forward on the local slab.

    Note: ``inputs.x`` is already the local [B, F] slab here — the shard_map
    in_spec splits its global [P*B, F] leading axis across the graph axis.
    """
    interior = _index_rect(inputs.interior, 0)
    boundary = _index_rect(inputs.boundary, 0)
    send_secs = tuple(sec[0] for sec in inputs.send_secs)

    n_layers = len(params)
    if training and key is not None:
        # distinct dropout streams per device
        key = jax.random.fold_in(key, jax.lax.axis_index(GRAPH_AXIS))
        keys = jax.random.split(key, n_layers)
    else:
        keys = [None] * n_layers

    h = _local_features(inputs.x)
    for i in range(n_layers):
        if i == 0:
            # dense / CSR / banded layer-0 dispatch, shared with the
            # single-chip model — each device transforms its own feature slab
            # into [B, H], no collective needed (X rows are owned rows)
            h = _layer0_transform(h, _vary_for_layer0(params["w1"], h),
                                  dropout_rate, keys[0], training)
        else:
            h = dropout(h, dropout_rate, keys[i], training)
            h = jnp.dot(h, params[f"w{i + 1}"],
                        preferred_element_type=jnp.float32).astype(h.dtype)
        h = halo_graphsum(h, interior, boundary, send_secs, inputs.block,
                          halo_dtype)
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    return h  # [B, C] local logits


def _psum_metrics(logits, truth):
    """Replicated (psum-reduced) masked CE + strict accuracy over all devices."""
    mask = truth >= 0
    safe_truth = jnp.where(mask, truth, 0)
    logits32 = logits.astype(jnp.float32)
    shifted = logits32 - jax.lax.stop_gradient(jnp.max(logits32, axis=1, keepdims=True))
    log_z = jnp.log(jnp.sum(jnp.exp(shifted), axis=1))
    per_node = log_z - jnp.take_along_axis(shifted, safe_truth[:, None], axis=1)[:, 0]
    ce_sum = jax.lax.psum(jnp.sum(jnp.where(mask, per_node, 0.0)), GRAPH_AXIS)
    count = jax.lax.psum(jnp.sum(mask), GRAPH_AXIS)
    loss = ce_sum / count

    truth_logit = jnp.take_along_axis(logits, safe_truth[:, None], axis=1)[:, 0]
    correct = jnp.max(logits, axis=1) <= truth_logit
    acc = jax.lax.psum(jnp.sum(jnp.where(mask, correct, False).astype(jnp.float32)),
                       GRAPH_AXIS) / count
    return loss, acc


def _per_device_loss(params, inputs: ShardedInputs, truth_local, key,
                     dropout_rate, training, halo_dtype="float32"):
    logits = _per_device_forward(params, inputs, key, dropout_rate, training,
                                 halo_dtype)
    return _psum_metrics(logits, truth_local)


def _per_device_pair(params, inputs: ShardedInputs, key, dropout_rate,
                     halo_dtype="float32"):
    """Fused train(dropout)+eval forwards on the local slab: one halo exchange
    and one local aggregation per layer at concatenated width (the multi-chip
    version of gcn.apply_pair — also halves the all_to_all count per epoch).
    The backward runs at TRAIN width (halo_graphsum_pair)."""
    interior = _index_rect(inputs.interior, 0)
    boundary = _index_rect(inputs.boundary, 0)
    send_secs = tuple(sec[0] for sec in inputs.send_secs)

    n_layers = len(params)
    key = jax.random.fold_in(key, jax.lax.axis_index(GRAPH_AXIS))
    keys = jax.random.split(key, n_layers)

    ht = he = _local_features(inputs.x)
    for i in range(n_layers):
        w = params[f"w{i + 1}"]
        if i == 0:
            w0 = _vary_for_layer0(w, ht)
            zt = _layer0_transform(ht, w0, dropout_rate, keys[0], True)
            ze = _layer0_transform(he, w0, 0.0, None, False)
        else:
            zt = jnp.dot(dropout(ht, dropout_rate, keys[i], True), w,
                         preferred_element_type=jnp.float32).astype(ht.dtype)
            ze = jnp.dot(he, w,
                         preferred_element_type=jnp.float32).astype(he.dtype)
        ht, he = halo_graphsum_pair(zt, ze, interior, boundary, send_secs,
                                    halo_dtype)
        if i < n_layers - 1:
            ht = jnp.maximum(ht, 0.0)
            he = jnp.maximum(he, 0.0)
    return ht, he


def _per_device_pair_loss(params, inputs, truth_train_local, truth_val_local,
                          key, dropout_rate, halo_dtype="float32"):
    lt, le = _per_device_pair(params, inputs, key, dropout_rate, halo_dtype)
    tl, ta = _psum_metrics(lt, truth_train_local)
    vl, va = _psum_metrics(le, truth_val_local)
    return tl, (ta, vl, va)


def _spec_inputs_of(inputs: ShardedInputs) -> ShardedInputs:
    """PartitionSpec-pytree matching ShardedInputs: every leaf splits on P."""
    def rect_spec(rg):
        return jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), rg)

    x_spec = (jax.tree_util.tree_map(lambda _: P(GRAPH_AXIS), inputs.x)
              if isinstance(inputs.x, (BandedFeatures, SparseFeatures))
              else P(GRAPH_AXIS))
    return ShardedInputs(
        interior=rect_spec(inputs.interior), boundary=rect_spec(inputs.boundary),
        send_secs=tuple(P(GRAPH_AXIS) for _ in inputs.send_secs),
        x=x_spec, block=inputs.block, n_local=inputs.n_local)


def sharded_loss_fn(mesh: Mesh, params, inputs: ShardedInputs, truth, key,
                    *, dropout_rate: float, weight_decay: float, training: bool,
                    halo_dtype: str = "float32"):
    """shard_map-wrapped loss; differentiable in params. truth: [P*B] global."""
    spec_inputs = _spec_inputs_of(inputs)

    fn = jax.shard_map(
        partial(_per_device_loss, dropout_rate=dropout_rate, training=training,
                halo_dtype=halo_dtype),
        mesh=mesh,
        in_specs=(P(), spec_inputs, P(GRAPH_AXIS), P()),
        out_specs=(P(), P()),
    )
    loss, acc = fn(params, inputs, truth, key)
    return loss + l2_penalty(params["w1"], weight_decay), acc


def make_sharded_inputs(pg: PartitionedGraph, x: np.ndarray, mesh: Mesh,
                        put=None) -> ShardedInputs:
    """Device-put the stacked partition arrays with the right shardings.

    ``put`` overrides the leaf placement — e.g. a ShapeDtypeStruct factory for
    AOT lowering against an unattached TPU topology (scripts/exp_overlap_hlo.py
    compiles the multi-chip program without multi-chip hardware)."""
    sh = NamedSharding(mesh, P(GRAPH_AXIS))

    if put is None:
        def put(a):
            return jax.device_put(jnp.asarray(a), sh)

    tile_kw: dict = {}
    if pg.i_tiles is not None:
        tile_kw = dict(tiles=put(pg.i_tiles), tile_rows=put(pg.i_tile_rows),
                       tile_cols=put(pg.i_tile_cols), tb=pg.tb, nblocks=pg.i_nblocks)
    if pg.i_blk is not None:
        from cuda_gcn_tpu.data.graph import Blocked2DDev, PieceBucket

        def to_dev(bucket_list):
            buckets = tuple(
                PieceBucket(**{k: put(b[k]) for k in
                               ("r0", "c0", "flush", "rows", "cols", "coef")})
                for b in bucket_list)
            return Blocked2DDev(buckets=buckets, rbw=pg.blk_rbw,
                                width=pg.blk_width, n_pad8=pg.blk_n_pad8)

        tile_kw["blk_fwd"] = to_dev(pg.i_blk)
        tile_kw["blk_bwd"] = to_dev(pg.it_blk)
    interior = RectGraph(
        rows=put(pg.i_src), cols=put(pg.i_dst), coef=put(pg.i_coef),
        t_rows=put(pg.it_src), t_cols=put(pg.it_dst), t_coef=put(pg.it_coef),
        n_out=pg.block, n_in=pg.block, **tile_kw)
    boundary = RectGraph(
        rows=put(pg.b_src), cols=put(pg.b_dst), coef=put(pg.b_coef),
        t_rows=put(pg.bt_src), t_cols=put(pg.bt_dst), t_coef=put(pg.bt_coef),
        n_out=pg.block, n_in=pg.halo_space)
    if isinstance(x, (BandedFeatures, SparseFeatures)):
        # stacked per-part sparse features (make_*_features_parts): every
        # leaf already leads with the part axis — put leaves as-is
        x_dev = jax.tree_util.tree_map(put, x)
    else:
        x_dev = put(pg.pad_nodes(x))
    return ShardedInputs(
        interior=interior, boundary=boundary,
        send_secs=tuple(put(sec) for sec in pg.send_secs),
        x=x_dev,
        block=pg.block, n_local=pg.n_local)


def make_sharded_train_step(mesh: Mesh, cfg: GCNConfig):
    """Jitted multi-device train step (donated state), mirroring train.train_step."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, inputs: ShardedInputs, truth):
        key, subkey = jax.random.split(state.key)
        (loss, acc), grads = jax.value_and_grad(
            lambda p: sharded_loss_fn(mesh, p, inputs, truth, subkey,
                                      dropout_rate=cfg.dropout,
                                      weight_decay=cfg.weight_decay, training=True,
                                      halo_dtype=cfg.halo_dtype),
            has_aux=True)(state.params)
        params, opt = adam.apply(state.params, grads, state.opt,
                                 adam.AdamParams(lr=cfg.learning_rate))
        from cuda_gcn_tpu.train import TrainState

        return TrainState(params=params, opt=opt, key=key), loss, acc

    return step


def make_sharded_run_epochs(mesh: Mesh, cfg: GCNConfig):
    """Fused multi-device epoch loop: the sharded analog of train.run_epochs.

    Same pass-fusion (epoch e's eval rides epoch e+1's train forward through
    one width-concatenated halo exchange + aggregation) and the same metric
    realignment; all epochs execute as one lax.scan device program."""
    @partial(jax.jit, static_argnames=("epochs",), donate_argnums=(0,))
    def run(state, inputs: ShardedInputs, truth_train, truth_val, *, epochs: int):
        fused = jax.shard_map(
            partial(_per_device_pair_loss, dropout_rate=cfg.dropout,
                    halo_dtype=cfg.halo_dtype),
            mesh=mesh,
            in_specs=(P(), _spec_inputs_of(inputs), P(GRAPH_AXIS), P(GRAPH_AXIS), P()),
            out_specs=(P(), (P(), P(), P())),
        )

        def fused_loss(params, key):
            tl, (ta, vl, va) = fused(params, inputs, truth_train, truth_val, key)
            l2 = l2_penalty(params["w1"], cfg.weight_decay)
            return tl + l2, (ta, vl + l2, va)

        def body(state, _):
            key, subkey = jax.random.split(state.key)
            (tl, (ta, vl_prev, va_prev)), grads = jax.value_and_grad(
                fused_loss, has_aux=True)(state.params, subkey)
            params, opt = adam.apply(state.params, grads, state.opt,
                                     adam.AdamParams(lr=cfg.learning_rate))
            from cuda_gcn_tpu.train import TrainState

            return TrainState(params=params, opt=opt, key=key), (tl, ta, vl_prev, va_prev)

        state, (tl, ta, vl, va) = jax.lax.scan(body, state, None, length=epochs)
        vl_last, va_last = sharded_loss_fn(
            mesh, state.params, inputs, truth_val, jax.random.PRNGKey(0),
            dropout_rate=0.0, weight_decay=cfg.weight_decay, training=False,
            halo_dtype=cfg.halo_dtype)
        vl = jnp.concatenate([vl[1:], vl_last[None]])
        va = jnp.concatenate([va[1:], va_last[None]])
        return state, (tl, ta, vl, va)

    return run


def run_sharded_epochs_chunked(mesh: Mesh, cfg: GCNConfig, state, inputs,
                               truth_train, truth_val, *, epochs: int,
                               chunk: int | None = None, run=None,
                               times_out: list | None = None):
    """make_sharded_run_epochs in fixed-size chunks, materializing metrics
    between chunks (the sharded analog of train.run_epochs_chunked — bounds
    single-device-program runtime, which matters on tunneled backends).
    Chunk sizing/adaptation: train.run_chunked_loop (shared policy)."""
    from cuda_gcn_tpu import train as train_mod

    # per-DEVICE work drives program runtime: one part's padded edge capacity
    # (coef.shape[-1] == eimax/ebmax), not the P-stacked total
    nnz = int(inputs.interior.coef.shape[-1] + inputs.boundary.coef.shape[-1])
    if run is None:
        run = make_sharded_run_epochs(mesh, cfg)  # reuse across calls to avoid re-jit
    holder = {"state": state}

    def run_one(k):
        holder["state"], m = run(holder["state"], inputs, truth_train, truth_val,
                                 epochs=k)
        return m

    metrics, _ = train_mod.run_chunked_loop(run_one, epochs, chunk, nnz,
                                            times_out=times_out)
    return holder["state"], metrics


def make_sharded_run_epochs_es(mesh: Mesh, cfg: GCNConfig):
    """Fused ON-DEVICE early-stopping loop for the sharded trainer: up to
    ``epochs`` train+eval iterations in one device program via lax.while_loop,
    stopping with EXACT reference semantics (gcn.cpp:142-150) — the multi-chip
    mirror of train.run_epochs_es (which documents the ring/epoch0 chunk-carry
    contract). Round 2 fell back to a stepwise host loop here, paying ~2x29 ms
    dispatch per epoch on the tunneled chip (VERDICT round-2 directive #7)."""

    @partial(jax.jit, static_argnames=("epochs", "es_window"),
             donate_argnums=(0, 4))
    def run(state, inputs: ShardedInputs, truth_train, truth_val, ring, epoch0,
            *, epochs: int, es_window: int):
        def train_metrics(params, key):
            return sharded_loss_fn(mesh, params, inputs, truth_train, key,
                                   dropout_rate=cfg.dropout,
                                   weight_decay=cfg.weight_decay, training=True,
                                   halo_dtype=cfg.halo_dtype)

        def cond(carry):
            _, i, stop, _, _ = carry
            return jnp.logical_and(i < epochs, jnp.logical_not(stop))

        def body(carry):
            state, i, _, metrics, ring = carry
            key, subkey = jax.random.split(state.key)
            (tl, ta), grads = jax.value_and_grad(train_metrics, has_aux=True)(
                state.params, subkey)
            params, opt = adam.apply(state.params, grads, state.opt,
                                     adam.AdamParams(lr=cfg.learning_rate))
            from cuda_gcn_tpu.train import TrainState

            state = TrainState(params=params, opt=opt, key=key)
            vl, va = sharded_loss_fn(mesh, params, inputs, truth_val,
                                     jax.random.PRNGKey(0), dropout_rate=0.0,
                                     weight_decay=cfg.weight_decay, training=False,
                                     halo_dtype=cfg.halo_dtype)
            metrics = jax.lax.dynamic_update_slice(
                metrics, jnp.stack([tl, ta, vl, va])[None].astype(jnp.float32),
                (i, 0))
            epoch = epoch0 + i + 1  # 1-based global epoch
            ring = jax.lax.dynamic_update_slice(
                ring, vl[None].astype(jnp.float32), ((epoch - 1) % es_window,))
            stop = jnp.logical_and(epoch >= es_window, vl > jnp.mean(ring))
            return state, i + 1, stop, metrics, ring

        metrics0 = jnp.full((epochs, 4), jnp.inf, jnp.float32)
        state, n_done, stopped, metrics, ring = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), jnp.bool_(False), metrics0, ring))
        return state, metrics, n_done, stopped, ring

    return run


def run_sharded_epochs_es_chunked(mesh: Mesh, cfg: GCNConfig, state, inputs,
                                  truth_train, truth_val, *, epochs: int,
                                  es_window: int, chunk: int | None = None,
                                  times_out: list | None = None):
    """make_sharded_run_epochs_es in bounded chunks via train.run_chunked_loop
    (shared sizing/probe/shrink policy; 6 adjacency passes per epoch — no
    pass-fusion, the stop decision needs epoch e's val loss first). Returns
    (state, [4 x np.ndarray] truncated at the stop epoch, stopped)."""
    from cuda_gcn_tpu import train as train_mod

    run = make_sharded_run_epochs_es(mesh, cfg)
    nnz = int(inputs.interior.coef.shape[-1] + inputs.boundary.coef.shape[-1])
    hold = {"state": state,
            "ring": jnp.full((es_window,), jnp.inf, jnp.float32),
            "epoch0": 0}

    def run_one(k):
        hold["state"], metrics, n_done, stop_flag, hold["ring"] = run(
            hold["state"], inputs, truth_train, truth_val, hold["ring"],
            jnp.int32(hold["epoch0"]), epochs=k, es_window=es_window)
        n_done = int(n_done)
        hold["epoch0"] += n_done
        m = np.asarray(metrics)
        return [m[:, i] for i in range(4)], n_done, bool(stop_flag)

    metrics, stopped = train_mod.run_chunked_loop(run_one, epochs, chunk, nnz,
                                                  passes_per_epoch=6,
                                                  times_out=times_out)
    return hold["state"], metrics, stopped


def make_sharded_eval_step(mesh: Mesh, cfg: GCNConfig):
    @jax.jit
    def step(params, inputs: ShardedInputs, truth):
        # dummy key: unused in eval mode, but keeps the shard_map arg structure static
        return sharded_loss_fn(mesh, params, inputs, truth, jax.random.PRNGKey(0),
                               dropout_rate=0.0, weight_decay=cfg.weight_decay,
                               training=False, halo_dtype=cfg.halo_dtype)

    return step


def prepare_sharded(cfg: GCNConfig, dataset: GCNDataset, mesh: Mesh,
                    lpa_labels: np.ndarray | None = None,
                    **partition_kwargs):
    """Partition + device-put a dataset for the mesh. Returns (cfg, inputs, truths).
    Extra keyword arguments are forwarded to ``partition_graph`` (tile size,
    blocked-residual thresholds, budgets).

    Unless ``cfg.reorder == 'none'``, the dataset is first relabeled with the
    LPA locality permutation (data/reorder.py) so communities land inside
    node blocks — this is what keeps the halo (boundary) fraction low on
    power-law graphs (SURVEY.md §7 hard part #3); training metrics are
    permutation-invariant. ``lpa_labels`` skips the label-propagation pass
    for callers that already computed (or cached) the labels for THIS
    dataset's node order — the expensive host step at 16x+ scale."""
    cfg = dataset.apply_config(cfg)
    n_parts = mesh.shape[GRAPH_AXIS]
    if cfg.reorder != "none":
        from cuda_gcn_tpu.data.reorder import (label_propagation,
                                               partition_layout,
                                               reorder_dataset)

        # P-aware cluster layout: clusters greedy-packed into P equal-edge
        # bins (tail clusters spread, not piled on the last part) and laid
        # out contiguously, then node-granular boundary refinement
        # (reorder.refine_partition) — at 32x-reddit the refinement cuts the
        # P=2 boundary 0.46 -> 0.33 where cluster packing alone bottoms out
        labels = (lpa_labels if lpa_labels is not None else
                  label_propagation(dataset.graph.indptr, dataset.graph.indices))
        deg = np.diff(dataset.graph.indptr.astype(np.int64))
        perm, cuts = partition_layout(dataset.graph.indptr,
                                      dataset.graph.indices,
                                      labels, n_parts, weights=deg)
        dataset = reorder_dataset(dataset, perm).dataset
        partition_kwargs.setdefault("cuts", cuts)
    block = -(-dataset.num_nodes // n_parts)
    from cuda_gcn_tpu.data.graph import DENSE_BACKEND_MAX_NODES

    interior_tiles = (cfg.graphsum_backend == "bsr"
                      or (cfg.graphsum_backend == "auto"
                          and block > DENSE_BACKEND_MAX_NODES))
    pg = partition_graph(dataset.graph, n_parts, interior_tiles=interior_tiles,
                         **partition_kwargs)
    if cfg.feature_matmul == "sparse":
        # keep huge feature matrices sparse on the mesh too (round-3 gap:
        # 16x-reddit dense X is 9.5 GB global — the very workload class the
        # partition layer exists for). The banded/CSR threshold tests the
        # PER-DEVICE slab: the segment-output cliff (docs/PERF.md) is about
        # one device's [block, d] output, not the global node count.
        from cuda_gcn_tpu.ops.matmul import (BANDED_FEATURES_MIN_ROWS,
                                             make_banded_features_parts,
                                             make_sparse_features_parts)

        fi = dataset.feature_index
        make = (make_banded_features_parts
                if pg.block >= BANDED_FEATURES_MIN_ROWS
                else make_sparse_features_parts)
        x = make(fi.indptr, fi.indices, dataset.feature_value, pg.bounds,
                 pg.block, cfg.input_dim, np.dtype(cfg.compute_dtype))
    else:
        x = dataset.dense_features(np.dtype(cfg.compute_dtype))
    inputs = make_sharded_inputs(pg, x, mesh)
    sh = NamedSharding(mesh, P(GRAPH_AXIS))
    truths = {}
    for s in (1, 2, 3):
        t = np.where(dataset.split == s, dataset.label, -1).astype(np.int32)
        truths[s] = jax.device_put(jnp.asarray(pg.pad_nodes(t, fill=-1)), sh)
    return cfg, inputs, truths


def run_sharded(cfg: GCNConfig, dataset: GCNDataset, mesh: Mesh | None = None,
                verbose: bool = True, initial_state=None, **partition_kwargs):
    """Full multi-chip training run with the reference's epoch loop, output
    contract, and early-stopping rule (gcn.cpp:130-158) — the sharded
    counterpart of ``train.run``, with NO feature gaps between the two paths
    (VERDICT round-2 directive #7): early stopping runs ON-DEVICE inside the
    fused while_loop (run_sharded_epochs_es_chunked) and ``initial_state``
    restores a checkpoint (params are replicated — the jitted step device_puts
    them). ``partition_kwargs`` reach partition_graph — real pods should pass
    bsr_budget_bytes to lift the virtual-mesh single-device tile-budget cap."""
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.utils.timer import TMR_TEST, TMR_TRAIN, timers

    mesh = mesh if mesh is not None else make_mesh()
    cfg, inputs, truths = prepare_sharded(cfg, dataset, mesh, **partition_kwargs)
    timers.reset(TMR_TRAIN, TMR_TEST)
    state = initial_state if initial_state is not None else train_mod.create_state(cfg)
    eval_step = make_sharded_eval_step(mesh, cfg)

    history: list[dict] = []
    loss_history: list[float] = []
    epochs_run = 0
    stopped_early = False
    if cfg.epochs > 1:
        timers.start(TMR_TRAIN)
        epoch_times: list[float] = []  # chunk-true measured per-epoch times
        if cfg.early_stopping > 0:
            state, metrics, stopped_early = run_sharded_epochs_es_chunked(
                mesh, cfg, state, inputs, truths[1], truths[2],
                epochs=cfg.epochs, es_window=cfg.early_stopping,
                times_out=epoch_times)
        else:
            state, metrics = run_sharded_epochs_chunked(
                mesh, cfg, state, inputs, truths[1], truths[2],
                epochs=cfg.epochs, times_out=epoch_times)
        total_time = timers.stop(TMR_TRAIN)
        epochs_run = len(metrics[0])
        if len(epoch_times) != epochs_run:  # defensive: never drop epochs
            epoch_times = [total_time / max(epochs_run, 1)] * epochs_run
        for epoch in range(1, epochs_run + 1):
            tl, ta, vl, va = (float(m[epoch - 1]) for m in metrics)
            epoch_time = epoch_times[epoch - 1]
            if verbose:
                print(f"epoch={epoch} train_loss={tl:.5f} train_acc={ta:.5f} "
                      f"val_loss={vl:.5f} val_acc={va:.5f} time={epoch_time:.5f}")
            history.append(dict(epoch=epoch, train_loss=tl, train_acc=ta,
                                val_loss=vl, val_acc=va, time=epoch_time))
            loss_history.append(vl)
        if stopped_early and verbose:
            print("Early stopping...")
    else:
        train_step = make_sharded_train_step(mesh, cfg)
        for epoch in range(1, cfg.epochs + 1):
            timers.start(TMR_TRAIN)
            state, tl, ta = train_step(state, inputs, truths[1])
            vl, va = eval_step(state.params, inputs, truths[2])
            tl, ta, vl, va = float(tl), float(ta), float(vl), float(va)
            epoch_time = timers.stop(TMR_TRAIN)
            epochs_run = epoch
            if verbose:
                print(f"epoch={epoch} train_loss={tl:.5f} train_acc={ta:.5f} "
                      f"val_loss={vl:.5f} val_acc={va:.5f} time={epoch_time:.5f}")
            history.append(dict(epoch=epoch, train_loss=tl, train_acc=ta,
                                val_loss=vl, val_acc=va, time=epoch_time))
            loss_history.append(vl)

    total = timers.total(TMR_TRAIN)
    if verbose:
        print(f"total training time={total:.5f}")
    timers.start(TMR_TEST)
    test_loss, test_acc = eval_step(state.params, inputs, truths[3])
    test_loss, test_acc = float(test_loss), float(test_acc)
    test_time = timers.stop(TMR_TEST)
    if verbose:
        print(f"test_loss={test_loss:.5f} test_acc={test_acc:.5f} time={test_time:.5f}")
    return train_mod.RunResult(
        test_loss=test_loss, test_acc=test_acc, total_train_time=total,
        epochs_run=epochs_run, state=state, history=history)
