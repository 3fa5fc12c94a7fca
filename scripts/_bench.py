"""Shared chained-timing helpers for the probe/microbench scripts.

Methodology for this tunnel (block_until_ready does NOT wait for execution;
only data fetches do): run the op N and 3N times inside fori_loop-jitted
programs with a scalar dependency carry, per-op = (t_3N - t_N) / 2N — cancels
the ~32 ms dispatch floor and the fetch. The carry must CONSUME every output
element (out.mean()): chaining a single output scalar lets XLA
slice-propagate / DCE most of the op (a bare matmul "measured" 1370 TF/s
that way).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain(f, args, n):
    @jax.jit
    def prog(*a):
        def body(i, s):
            out = f(a[0] + s.astype(a[0].dtype), *a[1:])
            return s + 1e-6 * jnp.asarray(out, jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    return prog


def measure(label, f, args, n=4, flops=None):
    p1, p3 = chain(f, args, n), chain(f, args, 3 * n)
    np.asarray(p1(*args)); np.asarray(p3(*args))
    t0 = time.perf_counter(); np.asarray(p1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(p3(*args)); t3 = time.perf_counter() - t0
    per = (t3 - t1) / (2 * n)
    extra = f"  {flops / per / 1e12:7.1f} T/s" if flops else ""
    print(f"{label:<46} {per * 1e3:8.2f} ms{extra}", flush=True)
    return per
