"""Probe 2: int8 MXU rate with minimal non-matmul work.

Sums K independent int8 dots (int32 accumulate) — no per-step
re-narrowing; the only extra op is the final reduction. Also times a
prefill-shaped case (M=1024, K=2560, N=10240) both dtypes.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STEPS = 64


def bench(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def square(n=4096):
    a8 = jnp.ones((n, n), jnp.int8)
    b8 = jnp.ones((n, n), jnp.int8)

    @jax.jit
    def loop_int8(a, b):
        def body(s, i):
            # vary `a` cheaply so XLA can't hoist the dot out of the loop
            ai = (a + i.astype(jnp.int8))
            y = jax.lax.dot_general(
                ai, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return s + y, None
        s0 = jnp.zeros((n, n), jnp.int32)
        s, _ = jax.lax.scan(body, s0, jnp.arange(STEPS, dtype=jnp.int32))
        return s.sum()

    t = bench(loop_int8, a8, b8)
    flops = 2 * n**3 * STEPS
    print(f"square int8 sum-of-dots: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TOPs")


def prefill_shape(m=1024, k=2560, n=10240):
    ab = jnp.ones((m, k), jnp.bfloat16)
    bb = jnp.ones((k, n), jnp.bfloat16)
    a8 = jnp.ones((m, k), jnp.int8)
    b8 = jnp.ones((k, n), jnp.int8)

    @jax.jit
    def loop_bf16(a, b):
        def body(s, i):
            y = jnp.dot(a + i.astype(jnp.bfloat16), b)
            return s + y.astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.zeros((m, n), jnp.float32),
                            jnp.arange(STEPS, dtype=jnp.int32))
        return s.sum()

    @jax.jit
    def loop_int8(a, b):
        def body(s, i):
            y = jax.lax.dot_general(
                a + i.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return s + y, None
        s, _ = jax.lax.scan(body, jnp.zeros((m, n), jnp.int32),
                            jnp.arange(STEPS, dtype=jnp.int32))
        return s.sum()

    fl = 2 * m * k * n * STEPS
    tb = bench(loop_bf16, ab, bb)
    ti = bench(loop_int8, a8, b8)
    print(f"prefill-shape bf16: {tb*1e3:.1f} ms -> {fl/tb/1e12:.1f} TFLOPs")
    print(f"prefill-shape int8: {ti*1e3:.1f} ms -> {fl/ti/1e12:.1f} TOPs "
          f"(ratio {tb/ti:.2f})")


if __name__ == "__main__":
    square()
    prefill_shape()
