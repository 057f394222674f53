"""Fused FED cycle kernel: fallback equivalence on CPU (the kernel
itself exercises on TPU; the dispatch logic + math parity here)."""

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.ops.features import scale_space as S
from cubesat_apds_tpu.ops.pallas.diffusion import fed_cycle_fused


def test_fused_matches_xla_path(rng):
    img = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.2, 1.0, (64, 64)), jnp.float32)
    taus = S.fed_tau_by_process_time(3.0)
    ref = np.asarray(S.fed_cycle(img, g, taus))
    got = np.asarray(fed_cycle_fused(img, g, taus))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_fused_in_interpret_mode(rng):
    """Run the actual Pallas kernel via the interpreter to validate the
    in-kernel stencil (roll + boundary masks) against the XLA stencil."""
    from jax.experimental.pallas import tpu as pltpu

    from cubesat_apds_tpu.ops.pallas import diffusion as D

    img = jnp.asarray(rng.uniform(0, 1, (32, 128)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.2, 1.0, (32, 128)), jnp.float32)
    taus = S.fed_tau_by_process_time(1.0)
    ref = np.asarray(S.fed_cycle(img, g, taus))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(D._fed_cycle_pallas(img, g, jnp.asarray(taus),
                                             len(taus)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_strip_kernel_matches_xla(rng):
    """The row-strip FED variant (images past the VMEM budget) must be
    EXACT vs the monolithic stencil: halo ≥ n_steps rows means every
    interior row's light cone stays inside its strip. Covers a ragged
    bottom strip (h=72 with strip_h=32 → padding) and the true-edge
    Neumann boundary (top/bottom strips)."""
    from jax.experimental.pallas import tpu as pltpu

    from cubesat_apds_tpu.ops.pallas import diffusion as D

    img = jnp.asarray(rng.uniform(0, 1, (72, 128)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.2, 1.0, (72, 128)), jnp.float32)
    taus = S.fed_tau_by_process_time(2.0)  # 6 steps
    assert len(taus) <= 8
    ref = np.asarray(S.fed_cycle(img, g, taus))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(D._fed_cycle_strips(
            img, g, jnp.asarray(taus), len(taus), strip_h=32, halo=8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_strip_plan_budget():
    """Planned strips must fit the VMEM budget and cover the image."""
    from cubesat_apds_tpu.ops.pallas import diffusion as D

    for h, w, n in ((1024, 1024, 5), (2048, 2048, 4), (1024, 8192, 9)):
        plan = D._strip_plan(h, w, n)
        assert plan is not None, (h, w)
        strip_h, halo, n_strips = plan
        assert halo >= n
        assert n_strips * strip_h >= h
        footprint = D._VMEM_BYTES_PER_PIXEL * (strip_h + 2 * halo) * w
        assert footprint <= D._VMEM_BUDGET_BYTES
