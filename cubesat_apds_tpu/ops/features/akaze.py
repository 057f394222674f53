"""AKAZE detect-and-compute: the TPU-native equivalent of
akaze_keypoint_descriptor_extraction_def (reference:
feature_extraction/src/lib.rs:61-92).

Pipeline: nonlinear scale space (FED) → det-Hessian detection + NMS +
sub-pixel → orientation → full MLDB descriptor. Returns fixed-capacity
`Features` (keypoints + packed 61-byte descriptors + validity mask).

Level images are stacked into zero-padded [L, H, W] tensors for the
per-keypoint sampling stages; this costs ≤3× the pyramid memory and turns
orientation + description into fully batched gathers/einsums (no
per-keypoint control flow). Intended operating range is tile-sized images
(≤1024², the preprocessor's tile default) — the preprocessor feeds tiles,
never whole mosaics, exactly like the reference (preprocessor
main.rs:248-327).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.core.types import Features, Keypoints
from cubesat_apds_tpu.ops.features.detect import detect_keypoints
from cubesat_apds_tpu.ops.features.mldb import mldb_descriptors
from cubesat_apds_tpu.ops.features.orientation import compute_orientations
from cubesat_apds_tpu.ops.features.scale_space import ScaleSpace, build_scale_space


def _pad_stack(levels: List[jax.Array]) -> jax.Array:
    """Stack per-level arrays into one [L, Hmax, Wmax] zero-padded tensor."""
    hmax = max(a.shape[0] for a in levels)
    wmax = max(a.shape[1] for a in levels)
    padded = [
        jnp.pad(a, ((0, hmax - a.shape[0]), (0, wmax - a.shape[1])))
        for a in levels
    ]
    return jnp.stack(padded)


def _packed_stack(lt: List[jax.Array], lx: List[jax.Array],
                  ly: List[jax.Array]) -> jax.Array:
    """[L, H, W, 4] channel-packed (Lt, Lx, Ly, 0) stack in bfloat16.

    One gather serves intensity + both derivatives for orientation and
    MLDB sampling (4th channel pads to a lane-friendly width). bf16
    halves the random-access gather traffic; the descriptor compares
    cell MEANS, whose f32 accumulation absorbs the quantization.
    """
    stacks = [_pad_stack(x).astype(jnp.bfloat16) for x in (lt, lx, ly)]
    packed = jnp.stack(stacks + [jnp.zeros_like(stacks[0])], axis=-1)
    return packed


@functools.partial(jax.jit, static_argnames=("config", "capacity"))
def detect_and_compute(img, config: AkazeConfig = AkazeConfig(),
                       capacity: int | None = None) -> Features:
    """img: [H, W] float32 grayscale in [0, 1] → Features.

    Keypoints come out response-sorted (strongest first), capacity-padded;
    the cap semantics mirror the reference's max_points = 2^18−1
    (lib.rs:12-13) at a practical per-tile static capacity.
    """
    capacity = capacity or config.capacity
    img = jnp.asarray(img, jnp.float32)

    ss = build_scale_space(img, config)
    kps, lx_list, ly_list = detect_keypoints(ss, config, capacity)

    packed = _packed_stack(ss.Lt, lx_list, ly_list)
    level_hw = jnp.asarray(
        [[a.shape[0], a.shape[1]] for a in ss.Lt], jnp.int32)

    sample_fn = None
    sampler = config.sampler
    if sampler == "pallas":
        from cubesat_apds_tpu.ops.pallas.sample_kernel import (
            pallas_sampler, pallas_sampler_supported)

        level_hw_static = [[a.shape[0], a.shape[1]] for a in ss.Lt]
        if pallas_sampler_supported(level_hw_static) and \
                jax.default_backend() == "tpu":
            lvl = jnp.clip(kps.class_id, 0, packed.shape[0] - 1)
            ratio = jnp.exp2(kps.octave.astype(jnp.float32))
            cx = jnp.floor(kps.xy[:, 0] / ratio + 0.5).astype(jnp.int32)
            cy = jnp.floor(kps.xy[:, 1] / ratio + 0.5).astype(jnp.int32)
            sample_fn = pallas_sampler(packed, level_hw, lvl, cx, cy)
        else:
            sampler = "gather"
    if sampler == "onehot":
        from cubesat_apds_tpu.ops.features.sampling import (
            extract_patches, sample_patches)

        lvl = jnp.clip(kps.class_id, 0, packed.shape[0] - 1)
        ratio = jnp.exp2(kps.octave.astype(jnp.float32))
        cx = jnp.floor(kps.xy[:, 0] / ratio + 0.5).astype(jnp.int32)
        cy = jnp.floor(kps.xy[:, 1] / ratio + 0.5).astype(jnp.int32)
        patches, col0, row0 = extract_patches(packed, level_hw, lvl, cx, cy)

        def sample_fn(iy, ix):
            return sample_patches(patches, iy, ix, row0, col0,
                                  level_hw, lvl)

    angle = compute_orientations(
        packed, level_hw, kps.xy, kps.size, kps.class_id,
        kps.octave, kps.valid, sample_fn=sample_fn)
    kps = Keypoints(
        xy=kps.xy, size=kps.size, angle=angle, response=kps.response,
        octave=kps.octave, class_id=kps.class_id, valid=kps.valid)

    if config.descriptor_mode == "fast":
        from cubesat_apds_tpu.ops.features.mldb import (
            fast_blur_sigmas, mldb_descriptors_fast)
        from cubesat_apds_tpu.ops.resample import gaussian_blur

        # Per-grid-level blur-matched pyramids: each level has ONE static
        # scale s, so the matched σ per (level, grid) is static too.
        blur_stacks = []
        for g in range(3):
            lt_b, lx_b, ly_b = [], [], []
            for i, m in enumerate(ss.meta):
                sigma = fast_blur_sigmas(m.sigma_size)[g]
                lt_b.append(gaussian_blur(ss.Lt[i], sigma))
                lx_b.append(gaussian_blur(lx_list[i], sigma))
                ly_b.append(gaussian_blur(ly_list[i], sigma))
            blur_stacks.append(_packed_stack(lt_b, lx_b, ly_b))
        desc = mldb_descriptors_fast(
            blur_stacks, level_hw, kps.xy, kps.size, kps.angle,
            kps.class_id, kps.octave, kps.valid)
    else:
        desc = mldb_descriptors(
            packed, level_hw,
            kps.xy, kps.size, kps.angle, kps.class_id, kps.octave,
            kps.valid, sample_fn=sample_fn)
    return Features(keypoints=kps, descriptors=desc)


def detect_and_compute_batch(imgs, config: AkazeConfig = AkazeConfig(),
                             capacity: int | None = None) -> Features:
    """vmapped detect_and_compute over a batch of same-shape images
    (the preprocessor's tile batch; replaces the reference's rayon
    fan-out, preprocessor main.rs:227-245)."""
    fn = functools.partial(detect_and_compute, config=config, capacity=capacity)
    return jax.vmap(fn)(jnp.asarray(imgs, jnp.float32))
