"""Pallas patch-sampling kernel: interpret-mode equivalence vs gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from cubesat_apds_tpu.ops.features.orientation import gather_sampler
from cubesat_apds_tpu.ops.pallas.sample_kernel import (
    PATCH_R,
    pallas_sampler,
    pallas_sampler_supported,
)


def test_supported_predicate():
    assert pallas_sampler_supported([[512, 512], [64, 64]])
    assert not pallas_sampler_supported([[512, 512], [32, 32]])
    assert not pallas_sampler_supported([[512, 500]])  # width % 32 != 0


def test_kernel_matches_gather_interpret(rng):
    L, Hmax, Wmax, C = 4, 128, 128, 4
    arr = rng.standard_normal((L, Hmax, Wmax, C)).astype(np.float32)
    arr[..., 3] = 0.0
    stack = jnp.asarray(arr).astype(jnp.bfloat16)
    hw = np.array([[128, 128], [64, 64], [128, 128], [64, 64]], np.int32)
    level_hw = jnp.asarray(hw)
    K, S = 16, 33
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    hs = hw[np.asarray(lvl), 0]
    ws = hw[np.asarray(lvl), 1]
    cx = jnp.asarray([int(rng.integers(0, w)) for w in ws], jnp.int32)
    cy = jnp.asarray([int(rng.integers(0, h)) for h in hs], jnp.int32)
    iy = cy[:, None] + jnp.asarray(
        rng.integers(-PATCH_R, PATCH_R + 1, (K, S)), jnp.int32)
    ix = cx[:, None] + jnp.asarray(
        rng.integers(-PATCH_R, PATCH_R + 1, (K, S)), jnp.int32)

    ref = np.asarray(gather_sampler(stack, level_hw, lvl)(iy, ix))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_sampler(stack, level_hw, lvl, cx, cy)(iy, ix))
    np.testing.assert_array_equal(got, ref)
