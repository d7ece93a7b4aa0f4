"""Parser tests: format semantics per src/common/parser.cpp."""

import numpy as np
import pytest

from cuda_gcn_tpu.data.parser import (
    load_dataset, parse_graph_text, parse_split_text, parse_svmlight_text)
from cuda_gcn_tpu.data.synthetic import SynthSpec, make_synthetic, write_dataset


def test_graph_self_loop_prepended():
    # line i = neighbors of node i; a self-loop is prepended per row (parser.cpp:30-33)
    csr = parse_graph_text(["1 2", "0", "0 1"])
    assert list(csr.indptr) == [0, 3, 5, 8]
    assert list(csr.indices) == [0, 1, 2, 1, 0, 2, 0, 1]
    assert csr.nrows == 3


def test_graph_empty_line_is_isolated_node():
    csr = parse_graph_text(["", "0"])
    assert list(csr.indptr) == [0, 1, 3]
    assert list(csr.indices) == [0, 1, 0]


def test_svmlight_basic():
    csr, vals, labels, input_dim, output_dim = parse_svmlight_text(
        ["2 0:1.5 3:2.0", "0 1:0.5", "1"])
    assert list(csr.indptr) == [0, 2, 3, 3]
    assert list(csr.indices) == [0, 3, 1]
    np.testing.assert_allclose(vals, [1.5, 2.0, 0.5])
    assert list(labels) == [2, 0, 1]
    assert input_dim == 4   # max idx + 1 (parser.cpp:90)
    assert output_dim == 3  # max label + 1 (parser.cpp:91)


def test_svmlight_unlabeled_line_gets_minus_one():
    _, _, labels, _, _ = parse_svmlight_text(["x", "1 0:1"])
    assert labels[0] == -1 and labels[1] == 1


def test_split():
    assert list(parse_split_text(["1", "2", "3", "0"])) == [1, 2, 3, 0]


def test_roundtrip_through_files(tmp_path, tiny_dataset):
    write_dataset(tiny_dataset, str(tmp_path), "tiny")
    ds = load_dataset("tiny", data_dir=str(tmp_path), use_native=False)
    np.testing.assert_array_equal(ds.graph.indptr, tiny_dataset.graph.indptr)
    np.testing.assert_array_equal(ds.graph.indices, tiny_dataset.graph.indices)
    np.testing.assert_array_equal(ds.label, tiny_dataset.label)
    np.testing.assert_array_equal(ds.split, tiny_dataset.split)
    np.testing.assert_array_equal(ds.feature_index.indptr, tiny_dataset.feature_index.indptr)
    np.testing.assert_array_equal(ds.feature_index.indices, tiny_dataset.feature_index.indices)
    np.testing.assert_allclose(ds.feature_value, tiny_dataset.feature_value, rtol=1e-5)
    assert ds.num_nodes == tiny_dataset.num_nodes
    assert ds.output_dim == tiny_dataset.output_dim


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset("nope", data_dir=str(tmp_path))


def test_dense_features(tiny_dataset):
    x = tiny_dataset.dense_features()
    assert x.shape == (tiny_dataset.num_nodes, tiny_dataset.input_dim)
    i = 0
    lo, hi = tiny_dataset.feature_index.indptr[i], tiny_dataset.feature_index.indptr[i + 1]
    for k, v in zip(tiny_dataset.feature_index.indices[lo:hi], tiny_dataset.feature_value[lo:hi]):
        assert x[i, k] == pytest.approx(v)
    assert np.count_nonzero(x) == tiny_dataset.feature_index.nnz


def test_variant_profile_resolves():
    """synth-reddit-slope (the discriminative-parity variant) must resolve to
    the reddit dims with its overrides applied — and stay out of PROFILES so
    size-scaled code paths (bench caches, scaling scripts) don't pick it up
    implicitly."""
    from cuda_gcn_tpu.data.synthetic import PROFILES, VARIANTS, spec_for

    assert "synth-reddit-slope" in VARIANTS
    assert "synth-reddit-slope" not in PROFILES
    s = spec_for("synth-reddit-slope")
    base = spec_for("synth-reddit")
    assert (s.num_nodes, s.num_edges, s.num_classes, s.input_dim) == (
        base.num_nodes, base.num_edges, base.num_classes, base.input_dim)
    assert s.label_noise == 0.05 and s.label_noise < base.label_noise
    assert s.feat_noise > base.feat_noise
    # explicit overrides still win over the variant's
    assert spec_for("synth-reddit-slope", label_noise=0.2).label_noise == 0.2
