"""One-hot patch sampler ⇔ direct gather equivalence (exact semantics)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.ops.features.sampling import (
    PATCH_R,
    extract_patches,
    sample_patches,
)


def _corners_img(rng, n=192, k=14):
    img = np.zeros((n, n), np.float32)
    for _ in range(k):
        cy, cx = rng.integers(20, n - 40, 2)
        s = int(rng.integers(10, 26))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.4, 1.0)
    return img


def test_patch_sampling_matches_gather_random(rng):
    """Raw equivalence on random stacks + random sample coords."""
    L, H, W, C = 3, 40, 48, 4
    stack = jnp.asarray(rng.standard_normal((L, H, W, C)).astype(np.float32))
    level_hw = jnp.asarray([[40, 48], [20, 24], [10, 12]], jnp.int32)
    K, S = 7, 25
    lvl = jnp.asarray(rng.integers(0, 3, K), jnp.int32)
    hs = np.asarray(level_hw)[np.asarray(lvl), 0]
    ws = np.asarray(level_hw)[np.asarray(lvl), 1]
    cx = jnp.asarray([int(rng.integers(0, w)) for w in ws], jnp.int32)
    cy = jnp.asarray([int(rng.integers(0, h)) for h in hs], jnp.int32)
    # Sample coords within ±PATCH_R of the center, some out of range.
    off = rng.integers(-PATCH_R, PATCH_R + 1, (K, S))
    iy = cy[:, None] + jnp.asarray(off, jnp.int32)
    off2 = rng.integers(-PATCH_R, PATCH_R + 1, (K, S))
    ix = cx[:, None] + jnp.asarray(off2, jnp.int32)

    # Direct gather reference.
    hs_b = level_hw[lvl, 0][:, None]
    ws_b = level_hw[lvl, 1][:, None]
    iy_c = jnp.clip(iy, 0, hs_b - 1)
    ix_c = jnp.clip(ix, 0, ws_b - 1)
    lvl_b = jnp.broadcast_to(lvl[:, None], iy.shape)
    ref = np.asarray(stack[lvl_b, iy_c, ix_c])

    patches, col0, row0 = extract_patches(stack, level_hw, lvl, cx, cy)
    got = np.asarray(sample_patches(patches, iy, ix, row0, col0,
                                    level_hw, lvl))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_patch_sampling_chunked(rng):
    """The lax.map chunked path gives identical patches."""
    L, H, W, C = 2, 32, 32, 4
    stack = jnp.asarray(rng.standard_normal((L, H, W, C)).astype(np.float32))
    level_hw = jnp.asarray([[32, 32], [16, 16]], jnp.int32)
    K = 10
    lvl = jnp.zeros(K, jnp.int32)
    cx = jnp.asarray(rng.integers(0, 32, K), jnp.int32)
    cy = jnp.asarray(rng.integers(0, 32, K), jnp.int32)
    p1, _, _ = extract_patches(stack, level_hw, lvl, cx, cy, chunk=1024)
    p2, _, _ = extract_patches(stack, level_hw, lvl, cx, cy, chunk=4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_detect_and_compute_sampler_equivalence(rng):
    """End-to-end: descriptors + angles identical between backends."""
    img = _corners_img(rng)
    f_gather = detect_and_compute(img, AkazeConfig(capacity=256,
                                                   sampler="gather"))
    f_onehot = detect_and_compute(img, AkazeConfig(capacity=256,
                                                   sampler="onehot"))
    v = np.asarray(f_gather.keypoints.valid)
    np.testing.assert_array_equal(v, np.asarray(f_onehot.keypoints.valid))
    # bf16 stack values are identical inputs to both backends; means are
    # accumulated in f32 either way but with different summation orders —
    # angles agree tightly, descriptor bits may flip only on exact ties.
    a1 = np.asarray(f_gather.keypoints.angle)[v]
    a2 = np.asarray(f_onehot.keypoints.angle)[v]
    da = np.abs((a1 - a2 + np.pi) % (2 * np.pi) - np.pi)
    assert np.median(da) < 1e-3
    d1 = np.asarray(f_gather.descriptors)[v]
    d2 = np.asarray(f_onehot.descriptors)[v]
    flips = np.unpackbits(d1 ^ d2, axis=-1).sum(-1)
    assert np.median(flips) <= 2, f"median bit flips {np.median(flips)}"
