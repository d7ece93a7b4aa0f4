"""Test configuration: run on CPU with 8 virtual devices so multi-chip sharding
logic has CI coverage without a pod (SURVEY.md §4 item 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon sitecustomize force-registers the TPU backend and wins
# over JAX_PLATFORMS; override at the config level so tests always run on the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small deterministic synthetic dataset shared across tests."""
    from cuda_gcn_tpu.data.synthetic import SynthSpec, make_synthetic

    spec = SynthSpec(num_nodes=200, num_edges=600, num_classes=4, input_dim=32,
                     nnz_per_node=6, train_per_class=10, num_val=40, num_test=60)
    return make_synthetic(spec, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
