"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; bench.py runs on the real chip)."""

import os

# Must be set before jax backends initialize. The axon sitecustomize forces
# jax_platforms="axon,cpu" at interpreter startup (ignoring JAX_PLATFORMS), so
# override via jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_vectors(n: int, dim: int, seed: int = 42) -> np.ndarray:
    """Seeded random vectors in [-1, 1] (reference test generator pattern:
    leann.rs:1078-1083, StdRng::seed_from_u64)."""
    r = np.random.default_rng(seed)
    return (r.random((n, dim), dtype=np.float32) * 2.0 - 1.0).astype(np.float32)
