"""Layout permutations and position descriptors (parallel/layouts.py).

Checks the TPU layouts reproduce the reference's extract semantics
(`yunchang/comm/extract_local.py:7-60`) and that the compact position
descriptors describe exactly the tokens each ring rank holds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from long_context_attention_tpu.parallel.layouts import (
    LAYOUTS,
    extract_local,
    layout_permutation,
    permute_for_layout,
    position_descriptor,
    positions_from_descriptor,
    unpermute_from_layout,
)


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("ring", [1, 4])
def test_permutation_is_a_permutation(layout, ring):
    seq = 32
    p = layout_permutation(layout, ring, seq)
    assert sorted(p.tolist()) == list(range(seq))


def test_zigzag_matches_reference_pairing():
    # zigzag pairs chunk r with 2W-1-r (`comm/extract_local.py:29-49`)
    ring, seq = 4, 16  # half-chunks of 2
    x = jnp.arange(seq)
    # rank 1 -> halves 1 and 6 -> tokens [2,3] + [12,13]
    np.testing.assert_array_equal(extract_local(x, 1, ring, "zigzag", axis=0),
                                  [2, 3, 12, 13])


def test_stripe_matches_reference_interleave():
    # stripe: rank r owns tokens r, r+W, r+2W, ... (`comm/extract_local.py:7-22`)
    ring, seq = 4, 16
    x = jnp.arange(seq)
    np.testing.assert_array_equal(extract_local(x, 2, ring, "stripe", axis=0),
                                  [2, 6, 10, 14])


def test_basic_is_contiguous():
    ring, seq = 4, 16
    x = jnp.arange(seq)
    np.testing.assert_array_equal(extract_local(x, 3, ring, "basic", axis=0),
                                  [12, 13, 14, 15])


@pytest.mark.parametrize("layout", LAYOUTS)
def test_permute_unpermute_roundtrip(layout, rng):
    ring = 4
    x = jnp.asarray(rng.normal(size=(2, 32, 3)))
    y = permute_for_layout(x, layout, ring, axis=1)
    np.testing.assert_array_equal(unpermute_from_layout(y, layout, ring, axis=1), x)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_contiguous_shards_of_permuted_equal_extract_local(layout):
    ring, seq = 4, 32
    x = jnp.arange(seq)
    y = permute_for_layout(x, layout, ring, axis=0)
    local = seq // ring
    for r in range(ring):
        np.testing.assert_array_equal(
            y[r * local:(r + 1) * local], extract_local(x, r, ring, layout, axis=0)
        )


@pytest.mark.parametrize("layout", LAYOUTS)
def test_position_descriptor_names_the_held_tokens(layout):
    """positions_from_descriptor == the global indices extract_local selects."""
    ring, seq = 4, 32
    local = seq // ring
    ids = jnp.arange(seq)
    for r in range(ring):
        off, stride = position_descriptor(layout, r, ring, local)
        pos = positions_from_descriptor(off, stride, local)
        held = extract_local(ids, r, ring, layout, axis=0)
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(held))


def test_zigzag_requires_even_chunks():
    with pytest.raises(ValueError):
        layout_permutation("zigzag", 4, 20)
