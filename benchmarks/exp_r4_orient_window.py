"""Round-4 spike: level-grouped WINDOW gather for orientation sampling
(PERF.md roadmap item 1's last untried idea, VERDICT r3 next #8).

The orientation disc is axis-aligned and its scale s = fround(size/2 /
ratio) takes only a few small integer values, so instead of the flat
[K, 109] point gather (109 indices/keypoint at the measured ~5-13
ns/index wall), gather ONE (1, 40, 128, 4) window per keypoint centered
at (cy, cx) — K indices total, width-free per the gather-cost model —
and extract the 109 disc samples with STATIC per-s index patterns
(local center is fixed at (20, 64), so for each s ∈ {1, 2, 3} the
sample positions are compile-time constants).

Measures, on the real TPU with the hardened salt+chained-fetch
protocol:
  A. flat point gather [K, 109] (the current production form)
  B. window gather alone [K] × (1, 40, 128, 4)
  C. window gather + static disc extraction (one s pattern)
  D. C with the 3-way s select (the full replacement's cost shape)

Decision rule: land only if D meaningfully beats A; otherwise record
the negative result in PERF.md like the previous four formulations.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cubesat_apds_tpu.ops.features.orientation import _DISC  # noqa: E402

L, H, W, C = 16, 512, 512, 4
K = 1280


def bench(fn, args, name, iters=30):
    ent = np.float32(time.time() % 1000.0)
    acc = None
    for i in range(2):
        o = fn(*args, jnp.float32(ent + 10000 + i))
        acc = o if acc is None else acc + o
    float(acc)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jnp.asarray(np.float32(i)) + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        o = fn(*args, jnp.float32(ent + i))
        acc = o if acc is None else acc + o
    float(acc)
    dt = (time.perf_counter() - t0 - rtt) / iters * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(0, 1, (L, H, W, C)), jnp.bfloat16)
    flat = stack.reshape(L * H * W, C)
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    cx = jnp.asarray(rng.integers(24, W - 24, K), jnp.int32)
    cy = jnp.asarray(rng.integers(24, H - 24, K), jnp.int32)
    s = jnp.asarray(rng.integers(1, 4, K), jnp.int32)
    disc = jnp.asarray(_DISC)                        # [109, 2] (dx, dy)

    @jax.jit
    def flat_gather(flat, lvl, cx, cy, s, salt):
        ix = cx[:, None] + disc[None, :, 0] * s[:, None]
        iy = cy[:, None] + disc[None, :, 1] * s[:, None]
        ix = jnp.clip(ix + salt.astype(jnp.int32) * 0, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        lin = (lvl[:, None] * H + iy) * W + ix
        vals = jnp.take(flat, lin, axis=0)           # [K, 109, C]
        return jnp.sum(vals.astype(jnp.float32))

    @jax.jit
    def window_only(stack, lvl, cx, cy, salt):
        y0 = jnp.clip(cy - 20 + salt.astype(jnp.int32) * 0, 0, H - 40)
        x0 = jnp.clip(cx - 64, 0, W - 128)
        starts = jnp.stack([lvl, y0, x0, jnp.zeros_like(lvl)], -1)
        win = jax.vmap(lambda st: jax.lax.dynamic_slice(
            stack, (st[0], st[1], st[2], st[3]), (1, 40, 128, C)))(starts)
        return jnp.sum(win.astype(jnp.float32))

    def extract(win, s_static):
        ly = 20 + _DISC[:, 1] * s_static             # static [109]
        lx = 64 + _DISC[:, 0] * s_static
        return win[:, 0, ly, lx, :]                  # [K, 109, C]

    @jax.jit
    def window_extract1(stack, lvl, cx, cy, salt):
        y0 = jnp.clip(cy - 20 + salt.astype(jnp.int32) * 0, 0, H - 40)
        x0 = jnp.clip(cx - 64, 0, W - 128)
        starts = jnp.stack([lvl, y0, x0, jnp.zeros_like(lvl)], -1)
        win = jax.vmap(lambda st: jax.lax.dynamic_slice(
            stack, (st[0], st[1], st[2], st[3]), (1, 40, 128, C)))(starts)
        return jnp.sum(extract(win, 2).astype(jnp.float32))

    @jax.jit
    def window_extract3(stack, lvl, cx, cy, s, salt):
        y0 = jnp.clip(cy - 20 + salt.astype(jnp.int32) * 0, 0, H - 40)
        x0 = jnp.clip(cx - 64, 0, W - 128)
        starts = jnp.stack([lvl, y0, x0, jnp.zeros_like(lvl)], -1)
        win = jax.vmap(lambda st: jax.lax.dynamic_slice(
            stack, (st[0], st[1], st[2], st[3]), (1, 40, 128, C)))(starts)
        out = extract(win, 1).astype(jnp.float32)
        for sv in (2, 3):
            sel = (s == sv)[:, None, None]
            out = jnp.where(sel, extract(win, sv).astype(jnp.float32), out)
        return jnp.sum(out)

    a = bench(flat_gather, (flat, lvl, cx, cy, s), "A flat [K,109] gather")
    b = bench(window_only, (stack, lvl, cx, cy), "B window gather only")
    c = bench(window_extract1, (stack, lvl, cx, cy),
              "C window + static extract (1 pattern)")
    d = bench(window_extract3, (stack, lvl, cx, cy, s),
              "D window + 3-way s extract")
    print(json.dumps({"bench": "orient_window_spike", "K": K,
                      "flat_ms": round(a, 3), "window_ms": round(b, 3),
                      "extract1_ms": round(c, 3),
                      "extract3_ms": round(d, 3)}))


if __name__ == "__main__":
    main()
