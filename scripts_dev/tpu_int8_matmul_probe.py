"""Probe: does this chip's MXU run int8 matmuls at ~2x bf16 rate?

Whole-jitted-loop timing (per CLAUDE.md: microbenchmarks over the
tunnel are unreliable; chained matmuls in one jit are the trustworthy
form). Chained 4096^3 matmuls, bf16 vs int8xint8->int32.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 4096
STEPS = 64


def run(dtype_name):
    if dtype_name == "bf16":
        a = jnp.ones((N, N), jnp.bfloat16)
        b = jnp.ones((N, N), jnp.bfloat16)

        @jax.jit
        def loop(a, b):
            def body(c, _):
                c = jnp.dot(c, b)
                # keep values bounded so the chain doesn't overflow
                c = c * jnp.bfloat16(1.0 / N)
                return c, None
            c, _ = jax.lax.scan(body, a, None, length=STEPS)
            return c.sum()
    else:
        a = jnp.ones((N, N), jnp.int8)
        b = jnp.ones((N, N), jnp.int8)

        @jax.jit
        def loop(a, b):
            def body(c, _):
                y = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # re-narrow to int8 for the next chained matmul
                c = (y >> 12).astype(jnp.int8)
                return c, None
            c, _ = jax.lax.scan(body, a, None, length=STEPS)
            return c.sum()

    out = loop(a, b)
    np.asarray(out)  # sync (tunnel: block_until_ready can return early)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = loop(a, b)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    t = np.median(ts)
    flops = 2 * N**3 * STEPS
    print(f"{dtype_name}: {t*1e3:.1f} ms median -> "
          f"{flops / t / 1e12:.1f} T(FL)OPs")
    return flops / t / 1e12


if __name__ == "__main__":
    print("devices:", jax.devices())
    r_bf16 = run("bf16")
    r_int8 = run("int8")
    print(f"int8/bf16 ratio: {r_int8 / r_bf16:.2f}")
