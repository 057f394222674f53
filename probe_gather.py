import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
N = 903168  # samples
def bench(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

M = 16*512*512
idx = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))

src_f32_4 = jnp.asarray(rng.standard_normal((M, 4)).astype(np.float32))
src_bf16_4 = src_f32_4.astype(jnp.bfloat16)
src_f32_1 = src_f32_4[:, 0]
src_bf16_8 = jnp.asarray(rng.standard_normal((M//2, 8)).astype(np.float32)).astype(jnp.bfloat16)
idx2 = idx // 2
src_f32_128 = jnp.asarray(rng.standard_normal((M//32, 128)).astype(np.float32))
idx32 = idx // 32

bench("gather [M,4] f32", jax.jit(lambda i: src_f32_4[i]), idx)
bench("gather [M,4] bf16", jax.jit(lambda i: src_bf16_4[i]), idx)
bench("gather [M] f32 scalar", jax.jit(lambda i: src_f32_1[i]), idx)
bench("gather [M/2,8] bf16", jax.jit(lambda i: src_bf16_8[i]), idx2)
bench("gather [M/32,128] f32", jax.jit(lambda i: src_f32_128[i]), idx32)
# sorted?
idx_sorted = jnp.sort(idx)
bench("gather [M,4] f32 sorted idx", jax.jit(lambda i: src_f32_4[i]), idx_sorted)
bench("take is_sorted", jax.jit(lambda i: jnp.take(src_f32_4, i, axis=0, indices_are_sorted=True)), idx_sorted)
# one-hot matmul alternative for small pools? skip
# gather N/4 only (what stride-2 subsampling would give)
idx_small = idx[: N//4]
bench("gather [M,4] f32, N/4 idx", jax.jit(lambda i: src_f32_4[i]), idx_small)
