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

# Upstream XLA:CPU issue: compile passes recurse deeply on the large fused
# programs (the one-dispatch quadtree pyramid, batch lax.map bodies) and the
# process aborts inside backend_compile_and_load — but ONLY after many
# compilations in one process.  Round-5 isolation attempts: the same
# programs (512^2/1024^2 fused pyramid, jnp and interpret-pallas backends,
# 8 virtual devices) compile cleanly every time in a fresh process with the
# default 8 MB stack; running tests/test_quadtree.py in one pytest process
# aborts at ~the 12th compile without this raise.  CPU and TPU run the SAME
# program structure (quadtree.py round-5 un-fork); this rlimit raise is a
# test-rig workaround for the upstream compiler, not a program fork.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or _hard >= 512 << 20:
    resource.setrlimit(resource.RLIMIT_STACK, (512 << 20, _hard))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual multi-chip mesh

import numpy as np
import pytest

LENNA_PATH = "/root/reference/tests/input/lenna512x512.png"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    One pytest process compiles hundreds of XLA:CPU programs; past a point
    the accumulated JIT state makes further compiles abort the process
    (observed as ``Fatal Python error: Aborted`` inside
    ``backend_compile_and_load`` at ~40% of the suite, position varying run
    to run — a resource limit, not any single test).  Dropping the caches at
    module boundaries keeps intra-module cache sharing (where nearly all
    reuse is) while bounding per-process JIT accumulation.
    """
    yield
    jax.clear_caches()


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
