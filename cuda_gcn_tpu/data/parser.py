"""Dataset parser for the ``.graph`` / ``.split`` / ``.svmlight`` text format.

Behavioral spec (matching the reference parser, src/common/parser.cpp):

* ``<name>.graph``  — line *i* holds the whitespace-separated neighbor ids of node *i*.
  A **self-loop is prepended** to every row while building the CSR
  (parser.cpp:30-33), and ``num_nodes`` is inferred as the number of lines
  (parser.cpp:45).
* ``<name>.svmlight`` — one node per line: ``label k:v k:v ...``. Builds a CSR
  feature index + value array + a label per node; a line whose label fails to
  parse yields label ``-1`` and no features (parser.cpp:68-71).
  ``input_dim = max feature index + 1`` and ``output_dim = max label + 1``
  (parser.cpp:90-91).
* ``<name>.split`` — one integer per node: 1=train, 2=validation, 3=test, other=unused
  (parser.cpp:94-103; usage at src/seq/gcn.cpp:78-81).

The reference reads with ``getline`` + eof-check, which silently drops a final line
that lacks a trailing newline; we accept such a line instead (files produced by the
offline converters always end with a newline, so behavior is identical on real data).

A native C++ fast path (csrc/parser.cpp via ctypes) is used automatically when the
shared library has been built; the pure-Python implementation is the fallback and
the correctness oracle.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from cuda_gcn_tpu.config import GCNConfig


@dataclasses.dataclass
class CSR:
    """Index-only CSR structure (values, if any, live in a separate array).

    Same role as the reference ``SparseIndex`` (src/seq/sparse.h:12-17).
    """

    indptr: np.ndarray   # (nrows+1,) int32
    indices: np.ndarray  # (nnz,) int32

    @property
    def nrows(self) -> int:
        return len(self.indptr) - 1

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])


@dataclasses.dataclass
class GCNDataset:
    """Parsed dataset: the analog of the reference ``GCNData`` (src/seq/gcn.h:16-22)."""

    graph: CSR              # adjacency CSR, self-loops already prepended
    feature_index: CSR      # sparse feature CSR index
    feature_value: np.ndarray  # (feature nnz,) float32
    label: np.ndarray       # (num_nodes,) int32, -1 where unlabeled
    split: np.ndarray       # (num_nodes,) int32, 1/2/3 codes
    num_nodes: int
    input_dim: int
    output_dim: int

    def dense_features(self, dtype=np.float32) -> np.ndarray:
        """Densify the CSR feature matrix to [num_nodes, input_dim].

        TPU-first: dense features feed the MXU for the layer-1 feature transform
        instead of the reference's CSR SparseMatmul loop (src/seq/module.cpp:47-61).
        """
        x = np.zeros((self.num_nodes, self.input_dim), dtype=dtype)
        rows = np.repeat(
            np.arange(self.num_nodes, dtype=np.int64),
            np.diff(self.feature_index.indptr),
        )
        x[rows, self.feature_index.indices] = self.feature_value.astype(dtype)
        return x

    def apply_config(self, cfg: GCNConfig) -> GCNConfig:
        """Overwrite the parser-inferred fields of a config (main.cpp:29-33 flow)."""
        return dataclasses.replace(
            cfg,
            num_nodes=self.num_nodes,
            input_dim=self.input_dim,
            output_dim=self.output_dim,
        )


def _lines(path: str) -> list[str]:
    with open(path, "r") as f:
        return f.read().splitlines()


def parse_graph_text(lines: list[str]) -> CSR:
    """Build the adjacency CSR, prepending a self-loop per node (parser.cpp:20-46)."""
    n = len(lines)
    tokens = [line.split() for line in lines]
    counts = np.fromiter((len(t) + 1 for t in tokens), dtype=np.int64, count=n)  # +1 self-loop
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = np.empty(indptr[-1], dtype=np.int64)
    indices[indptr[:-1]] = np.arange(n, dtype=np.int64)  # implicit self connection first
    flat = np.array([x for t in tokens for x in t], dtype=np.int64) if indptr[-1] > n else np.empty(0, np.int64)
    mask = np.ones(indptr[-1], dtype=bool)
    mask[indptr[:-1]] = False
    indices[mask] = flat
    return CSR(indptr=indptr.astype(np.int32), indices=indices.astype(np.int32))


def parse_svmlight_text(lines: list[str]):
    """Parse ``label k:v ...`` lines -> (feature CSR, values, labels, input_dim, output_dim).

    Mirrors parser.cpp:52-92: unparseable labels become -1; dims are max+1 over
    what parsed (note the reference initializes its maxima to 0, so an all-empty
    file still reports dims of 1 — we reproduce that).
    """
    indptr = np.zeros(len(lines) + 1, dtype=np.int64)
    idx_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    labels = np.full(len(lines), -1, dtype=np.int32)
    max_idx, max_label = 0, 0
    for i, line in enumerate(lines):
        parts = line.split()
        indptr[i + 1] = indptr[i]
        if not parts:
            continue
        try:
            label = int(parts[0])
        except ValueError:
            continue
        labels[i] = label
        max_label = max(max_label, label)
        if len(parts) > 1:
            kv = np.char.partition(np.asarray(parts[1:]), ":")
            ks = kv[:, 0].astype(np.int64)
            vs = kv[:, 2].astype(np.float32)
            idx_chunks.append(ks)
            val_chunks.append(vs)
            indptr[i + 1] += len(ks)
            if len(ks):
                max_idx = max(max_idx, int(ks.max()))
    indices = np.concatenate(idx_chunks) if idx_chunks else np.empty(0, np.int64)
    values = np.concatenate(val_chunks) if val_chunks else np.empty(0, np.float32)
    csr = CSR(indptr=indptr.astype(np.int32), indices=indices.astype(np.int32))
    return csr, values.astype(np.float32), labels, max_idx + 1, max_label + 1


def parse_split_text(lines: list[str]) -> np.ndarray:
    return np.array([int(l) for l in lines if l.strip()], dtype=np.int32)


def load_dataset(name: str, data_dir: str = "data", use_native: bool | None = None) -> GCNDataset:
    """Load ``<data_dir>/<name>.{graph,split,svmlight}`` (parser.cpp:12-15 layout).

    ``use_native``: force (True) / forbid (False) the C++ fast parser; None = auto.
    """
    paths = {ext: os.path.join(data_dir, f"{name}.{ext}") for ext in ("graph", "split", "svmlight")}
    for p in paths.values():
        if not os.path.exists(p):
            raise FileNotFoundError(f"Cannot read input: {p}")

    if use_native is not False:
        try:
            from cuda_gcn_tpu.data import native

            if native.available():
                return native.load_dataset(paths)
        except Exception:
            if use_native:
                raise

    graph = parse_graph_text(_lines(paths["graph"]))
    feat, values, labels, input_dim, output_dim = parse_svmlight_text(_lines(paths["svmlight"]))
    split = parse_split_text(_lines(paths["split"]))
    return GCNDataset(
        graph=graph,
        feature_index=feat,
        feature_value=values,
        label=labels,
        split=split,
        num_nodes=graph.nrows,
        input_dim=input_dim,
        output_dim=output_dim,
    )
