"""GraphSAGE converter: fabricated tiny dumps -> 3-file format -> parser roundtrip."""

import json

import numpy as np
import pytest

from cuda_gcn_tpu.data.parser import load_dataset
from cuda_gcn_tpu.data.reddit import convert


@pytest.fixture
def graphsage_dir(tmp_path):
    # 5 nodes: n0,n1 train; n2 val; n3 test; n4 broken (missing annotations)
    nodes = [
        {"id": "n0", "val": False, "test": False},
        {"id": "n1", "val": False, "test": False},
        {"id": "n2", "val": True, "test": False},
        {"id": "n3", "val": False, "test": True},
        {"id": "n4"},
    ]
    links = [
        {"source": "n0", "target": "n1"},
        {"source": "n1", "target": "n2"},
        {"source": "n2", "target": "n3"},
        {"source": "n4", "target": "n0"},  # dropped with n4
    ]
    (tmp_path / "reddit-G.json").write_text(json.dumps({"nodes": nodes, "links": links}))
    feats = np.arange(20, dtype=np.float64).reshape(5, 4)
    np.save(tmp_path / "reddit-feats.npy", feats)
    (tmp_path / "reddit-id_map.json").write_text(
        json.dumps({f"n{i}": i for i in range(5)}))
    (tmp_path / "reddit-class_map.json").write_text(
        json.dumps({f"n{i}": i % 3 for i in range(5)}))
    return tmp_path


def test_convert_roundtrip(graphsage_dir):
    convert(str(graphsage_dir), "reddit")
    ds = load_dataset("reddit", data_dir=str(graphsage_dir))
    assert ds.num_nodes == 4  # n4 dropped
    assert list(ds.split) == [1, 1, 2, 3]
    assert list(ds.label) == [0, 1, 2, 0]
    assert ds.output_dim == 3
    # adjacency (new ids 0..3 in sorted order): edges 0-1, 1-2, 2-3 both ways
    # parser prepends self-loops
    def neighbors(i):
        lo, hi = ds.graph.indptr[i], ds.graph.indptr[i + 1]
        return sorted(int(x) for x in ds.graph.indices[lo:hi])

    assert neighbors(0) == [0, 1]
    assert neighbors(1) == [0, 1, 2]
    assert neighbors(2) == [1, 2, 3]
    assert neighbors(3) == [2, 3]


def test_convert_standardizes_on_train_stats(graphsage_dir):
    convert(str(graphsage_dir), "reddit")
    ds = load_dataset("reddit", data_dir=str(graphsage_dir))
    x = ds.dense_features()
    feats = np.arange(20, dtype=np.float64).reshape(5, 4)
    train = feats[[0, 1]]
    expected = (feats - train.mean(0)) / train.std(0)
    # rows 0..3 are nodes n0..n3
    np.testing.assert_allclose(x, expected[:4], rtol=1e-4)


def test_convert_npz_written(graphsage_dir):
    convert(str(graphsage_dir), "reddit")
    z = np.load(graphsage_dir / "reddit.npz")
    assert z["features"].shape == (4, 4)
    assert list(z["split"]) == [1, 1, 2, 3]
    assert z["adj_indptr"][-1] == 6  # 3 undirected edges, both directions, no self-loops
