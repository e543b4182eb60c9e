"""Test configuration: force an 8-device virtual CPU mesh.

Multi-host/multi-chip logic is tested on a single host via XLA's virtual
device emulation (SURVEY.md §4: the TPU-build analog of the reference's
single-device test discipline). Must run before the first jax import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# This machine's site bootstrap may pre-register an accelerator platform and
# latch JAX_PLATFORMS before user code runs; jax.config wins over the env.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from scipy import sparse  # noqa: E402


# ---- shared graph fixtures (mirroring the reference's test fixtures,
# reference tests/test_geo_shortest_paths.py:14-35) -----------------------

def _sym(rows, cols, data, n):
    W = sparse.csr_matrix((data, (rows, cols)), shape=(n, n), dtype=np.float32)
    return W.maximum(W.T)


@pytest.fixture
def line_graph():
    # 0-1-2-3 path with unit weights
    return _sym([0, 1, 2], [1, 2, 3], [1.0, 1.0, 1.0], 4)


@pytest.fixture
def triangle_graph():
    return _sym([0, 1, 2], [1, 2, 0], [1.0, 2.0, 4.0], 3)


@pytest.fixture
def disconnected_two_lines():
    # components {0,1,2} and {3,4}
    return _sym([0, 1, 3], [1, 2, 4], [1.0, 1.0, 1.0], 5)


@pytest.fixture
def random_latents():
    rng = np.random.RandomState(42)
    return rng.randn(200, 8).astype(np.float32)
