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
