"""Probe: XLA sort / gather costs on the chip at binning-relevant shapes.

In-jit methodology (ROUND_NOTES): standalone sub-ms jits read at the
dispatch floor through the tunnel. Each op runs R times inside ONE jit
under a lax.fori_loop with a sequential data dependency, returning a
digest; cost = (loop_time - empty_loop_time) / R.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 50


def loop_time(step, x0, iters=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, R, step, x)

    out = jax.block_until_ready(run(x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3  # ms per op


def main():
    rng = np.random.default_rng(0)

    def probe_sort(n, arity):
        key = jnp.asarray(rng.integers(0, 1 << 28, size=n), jnp.int32)
        pay = jnp.asarray(rng.integers(0, 1 << 17, size=n), jnp.int32)

        if arity == 2:
            def step(i, kp):
                k, p = kp
                k = k ^ i          # sequential dependency
                return jax.lax.sort((k, p), num_keys=1, is_stable=False)
            x0 = (key, pay)
        else:
            def step(i, k):
                return jax.lax.sort((k ^ i,), num_keys=1,
                                    is_stable=False)[0]
            x0 = key
        return loop_time(step, x0)

    for n in (1 << 17, 300_000, 460_836, 1 << 19):
        co = probe_sort(n, 2)
        ko = probe_sort(n, 1)
        print(f"n={n:>7}  co-sort {co:7.3f} ms   key-only {ko:7.3f} ms",
              flush=True)

    # gathers
    N = 73729
    tab = jnp.asarray(rng.standard_normal((22, N)), jnp.float32)
    big_idx = jnp.asarray(rng.integers(0, N, size=460_836), jnp.int32)

    def g_step(i, t):
        out = jnp.take(t, (big_idx + i) % N, axis=1)
        return t + out[:, :N] * 1e-9
    print(f"(22,N) 460k col gather: {loop_time(g_step, tab):7.3f} ms",
          flush=True)

    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    def p_step(i, t):
        return jnp.take(t, (perm + i) % N, axis=1)
    print(f"(22,N) col-perm gather: {loop_time(p_step, tab):7.3f} ms",
          flush=True)

    # searchsorted bounds (1025 queries over sorted 460k)
    skey = jnp.sort(big_idx)
    tq = jnp.arange(1025, dtype=jnp.int32) * 71

    def ss_step(i, acc):
        return acc + jnp.searchsorted(skey, tq + i).astype(jnp.int32)
    print(f"searchsorted 460k/1025q: "
          f"{loop_time(ss_step, jnp.zeros(1025, jnp.int32)):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
