"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding tests work
without a TPU pod (the "multi-node without a cluster" mechanism; see
SURVEY.md section 4).  Must set the env vars before jax is imported.
"""
import os

# Force CPU: the ambient environment may point JAX at a TPU (JAX_PLATFORMS=axon,
# and site hooks may re-assert it via jax.config at interpreter start); unit
# tests must be hermetic and runnable anywhere.  jax.config.update after import
# wins over both the env var and any sitecustomize registration.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual multi-chip mesh

import numpy as np
import pytest

LENNA_PATH = "/root/reference/tests/input/lenna512x512.png"


@pytest.fixture(scope="session")
def lenna_y():
    """Y plane of the 512x512 Lenna fixture (same as the reference tests)."""
    if not os.path.exists(LENNA_PATH):
        pytest.skip("lenna fixture not available")
    from fractencode_tpu.image import load_gray

    return load_gray(LENNA_PATH)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
