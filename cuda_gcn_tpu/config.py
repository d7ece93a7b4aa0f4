"""Hyperparameter configuration.

TPU-native equivalent of the reference ``GCNParams`` struct
(reference: src/seq/gcn.h:9-14, defaults at src/seq/gcn.cpp:9-11).

Differences from the reference, by design:
  * the reference CLI *advertises* nine positional hyperparameter overrides but never
    parses them (src/main.cpp:24-25 vs :29-36); our CLI actually honors them.
  * ``num_nodes``/``input_dim``/``output_dim`` stay parser-inferred, exactly like the
    reference (src/common/parser.cpp:45,90-91).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class GCNConfig:
    """Hyperparameters for a full-batch GCN training run.

    Field names and defaults mirror ``GCNParams::get_default()``
    (reference: src/seq/gcn.cpp:9-11): ``{2708, 1433, 16, 7, 0.5, 0.01, 5e-4, 100, 0}``.
    The first/second/fourth fields are placeholders overwritten by the dataset parser.
    """

    num_nodes: int = 2708
    input_dim: int = 1433
    hidden_dim: int = 16
    output_dim: int = 7
    dropout: float = 0.5
    learning_rate: float = 0.01
    weight_decay: float = 5e-4
    epochs: int = 100
    early_stopping: int = 0

    # --- TPU-build extensions (no reference analog) ---
    seed: int = 0                      # PRNG seed (reference seeds from time(); we are reproducible)
    hidden_dims: tuple[int, ...] | None = None  # override for >2-layer GCNs; None => (hidden_dim,)
    graphsum_backend: str = "auto"     # 'auto' | 'segment' | 'ell' | 'pallas' | 'dense' | 'bsr'
    reorder: str = "auto"              # 'auto' (locality reorder for bsr) | 'none'
    feature_matmul: str = "dense"      # 'dense' (MXU) | 'sparse' (CSR values, reference-style)
    param_dtype: str = "float32"       # parameter dtype
    compute_dtype: str = "float32"     # activation dtype ('bfloat16' for MXU speed)
    halo_dtype: str = "bfloat16"       # wire format of sharded halo payloads
    # (parallel/sharded._cast_payload): bf16 halves every ppermute round's
    # bytes in both directions — the comm term is what binds the >=80%
    # scaling north star at reddit P=8 (artifacts/predicted_scaling_*.json).
    # Set 'float32' for bit-exact parity with the single-chip path.
    bsr_budget_gb: float | None = None  # pin the BSR tile budget (GiB); None = the
    # auto HBM-derived policy (data/graph.auto_tile_budget). Pinning below auto
    # trades tile coverage (MXU work) for argument HBM — the knob that moves
    # the single-chip wall (docs/PERF.md "16x-reddit").

    def layer_dims(self) -> tuple[int, ...]:
        hidden = self.hidden_dims if self.hidden_dims is not None else (self.hidden_dim,)
        return (self.input_dim, *hidden, self.output_dim)


def default_config() -> GCNConfig:
    return GCNConfig()
