"""Test bootstrap: force an 8-device virtual CPU mesh before JAX initializes.

The reference tests need real GPUs + torchrun (`test/test_hybrid_attn.py`);
here the same oracle pattern runs as plain pytest on 8 simulated devices
(SURVEY.md §4 "implication for the TPU build").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image pins JAX_PLATFORMS=axon (single real TPU chip); tests want the
# deterministic 8-device CPU simulation instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches at module boundaries.

    The suite compiles thousands of distinct programs; letting the in-process
    jit cache grow across all ~30 modules has crashed XLA's CPU compiler deep
    into the run (segfault in backend_compile_and_load after ~240 tests).
    Cross-module cache reuse is minimal, so this costs little and bounds the
    compiler state each module sees."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
