"""Native C++ parser: must agree exactly with the pure-Python parser."""

import numpy as np
import pytest

from cuda_gcn_tpu.data import native
from cuda_gcn_tpu.data.parser import load_dataset
from cuda_gcn_tpu.data.synthetic import write_dataset

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_matches_python(tmp_path, tiny_dataset):
    write_dataset(tiny_dataset, str(tmp_path), "tiny")
    py = load_dataset("tiny", data_dir=str(tmp_path), use_native=False)
    nat = load_dataset("tiny", data_dir=str(tmp_path), use_native=True)
    np.testing.assert_array_equal(nat.graph.indptr, py.graph.indptr)
    np.testing.assert_array_equal(nat.graph.indices, py.graph.indices)
    np.testing.assert_array_equal(nat.feature_index.indptr, py.feature_index.indptr)
    np.testing.assert_array_equal(nat.feature_index.indices, py.feature_index.indices)
    np.testing.assert_allclose(nat.feature_value, py.feature_value, rtol=1e-6)
    np.testing.assert_array_equal(nat.label, py.label)
    np.testing.assert_array_equal(nat.split, py.split)
    assert (nat.num_nodes, nat.input_dim, nat.output_dim) == (
        py.num_nodes, py.input_dim, py.output_dim)


def test_native_edge_cases(tmp_path):
    (tmp_path / "edge.graph").write_text("1\n\n0 1\n")  # node 1 isolated
    (tmp_path / "edge.svmlight").write_text("2 0:1.5 3:2e-1\nx\n1\n")
    (tmp_path / "edge.split").write_text("1\n2\n3\n")
    py = load_dataset("edge", data_dir=str(tmp_path), use_native=False)
    nat = load_dataset("edge", data_dir=str(tmp_path), use_native=True)
    np.testing.assert_array_equal(nat.graph.indptr, py.graph.indptr)
    np.testing.assert_array_equal(nat.graph.indices, py.graph.indices)
    np.testing.assert_array_equal(nat.label, py.label)  # [2, -1, 1]
    assert list(nat.label) == [2, -1, 1]
    np.testing.assert_allclose(nat.feature_value, py.feature_value)
    assert nat.input_dim == py.input_dim == 4
    assert nat.output_dim == py.output_dim == 3


def test_native_negative_labels(tmp_path):
    (tmp_path / "neg.graph").write_text("1\n0\n")
    (tmp_path / "neg.svmlight").write_text("-1 0:1\n0 1:1\n")
    (tmp_path / "neg.split").write_text("1\n3\n")
    nat = load_dataset("neg", data_dir=str(tmp_path), use_native=True)
    py = load_dataset("neg", data_dir=str(tmp_path), use_native=False)
    assert list(nat.label) == list(py.label) == [-1, 0]


def test_native_lpa_matches_numpy(tiny_dataset):
    """csrc/gcn_lpa.cpp must reproduce the numpy LPA exactly (same modal/tie
    semantics, same early exit), with and without seed labels."""
    from cuda_gcn_tpu.data import native
    from cuda_gcn_tpu.data.reorder import label_propagation

    if not native.lpa_available():
        pytest.skip("no native toolchain")
    ds = tiny_dataset
    for rounds in (1, 4, 16):
        ref = label_propagation(ds.graph.indptr, ds.graph.indices, rounds=rounds,
                                prefer_native=False)
        got = native.label_propagation(ds.graph.indptr, ds.graph.indices, rounds)
        np.testing.assert_array_equal(got, ref)
    seed = np.arange(ds.num_nodes, dtype=np.int64) % 7
    ref = label_propagation(ds.graph.indptr, ds.graph.indices, rounds=4,
                            seed_labels=seed, prefer_native=False)
    got = native.label_propagation(ds.graph.indptr, ds.graph.indices, 4,
                                   seed_labels=seed)
    np.testing.assert_array_equal(got, ref)


def test_native_build_kernels_match_numpy():
    """csrc/gcn_build.cpp must be BIT-exact with the numpy graph-build oracle:
    normalization coefficients (double math, one f32 round), stable transpose
    sort, densest-tile selection incl. the stable budget cap and bf16 RNE
    rounding."""
    from cuda_gcn_tpu.data import graph as G
    from cuda_gcn_tpu.data import native_build as nb

    if not nb.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    n, m = 500, 6000
    src = np.sort(rng.integers(0, n, m))
    dst = rng.integers(0, n, m).astype(np.int64)
    # CSR for normalization
    counts = np.bincount(src, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    # guard: normalization divides by row length -> give every row an edge
    deg_src = np.repeat(np.arange(n), np.maximum(counts, 0))
    assert len(deg_src) == m

    ref_coef = ((1.0 / np.sqrt(np.maximum(counts, 1)[src].astype(np.float64)
                               * np.maximum(counts, 1)[dst].astype(np.float64)))
                .astype(np.float32))
    coef = rng.random(m).astype(np.float32)

    # norm_coef: only rows with edges are visited, so zero-degree rows are fine
    got = nb.norm_coef(indptr, dst)
    deg = np.diff(indptr).astype(np.float64)
    expected = (1.0 / np.sqrt(deg[src] * deg[dst])).astype(np.float32)
    np.testing.assert_array_equal(got, expected)
    del ref_coef

    # transpose: stable counting sort == np.argsort(kind='stable')
    ts, td, tc = nb.transpose_coo(src, dst, coef, n)
    perm = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(ts, dst[perm])
    np.testing.assert_array_equal(td, src[perm])
    np.testing.assert_array_equal(tc, coef[perm])

    # tile selection: f32 unique, f32 duplicates, bf16 unique; small budget cap
    for dtype_name, unique in (("float32", True), ("float32", False),
                               ("bfloat16", True)):
        dtype = G._np_dtype(dtype_name)
        for max_tiles in (10**9, 3):
            budget = max_tiles * 16 * 16 * dtype.itemsize
            native = nb.select_tiles(src, dst, coef, n, 16, 4, max_tiles,
                                     dtype, unique)
            if not unique and dtype.itemsize == 2:
                assert native is None
                continue
            (t_n, r_n, c_n, tb_n, T_n), keep_n = native
            # numpy oracle (force past the native dispatch with a local copy)
            t_blocks = -(-n // 16)
            tile_id = (src // 16) * t_blocks + dst // 16
            cnts = np.bincount(tile_id, minlength=t_blocks * t_blocks)
            cand = np.flatnonzero(cnts >= 4)
            if len(cand) > max_tiles:
                order = np.argsort(-cnts[cand], kind="stable")
                cand = np.sort(cand[order[:max_tiles]])
            rank_of = np.full(t_blocks * t_blocks, -1, dtype=np.int64)
            rank_of[cand] = np.arange(len(cand))
            er = rank_of[tile_id]
            in_tile = er >= 0
            flat = er[in_tile] * 256 + (src[in_tile] % 16) * 16 + (dst[in_tile] % 16)
            if unique:
                # dedupe identical (src,dst) pairs like build_graph's unique
                # check would; our random sample may have dups, so emulate
                # last-write-wins scatter-assign for comparability
                tiles = np.zeros((len(cand), 16, 16), dtype=dtype)
                tiles.reshape(-1)[flat] = coef[in_tile].astype(dtype)
            else:
                tiles = np.zeros((len(cand), 16, 16), dtype=np.float32)
                np.add.at(tiles.reshape(-1), flat, coef[in_tile])
                tiles = tiles.astype(dtype)
            np.testing.assert_array_equal(r_n, (cand // t_blocks).astype(np.int32))
            np.testing.assert_array_equal(c_n, (cand % t_blocks).astype(np.int32))
            np.testing.assert_array_equal(keep_n, ~in_tile)
            np.testing.assert_array_equal(
                np.asarray(t_n, dtype=np.float32), np.asarray(tiles, np.float32))
