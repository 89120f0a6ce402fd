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


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
