"""Micro-timings of the binning sub-ops at 1M prims / 4M pair budget.

Identifies which primitive (sort, scatter, cumsum, gather, searchsorted)
dominates bin_to_tiles on the TPU so optimization goes where the time is.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import goliath_tpu

goliath_tpu.enable_compilation_cache()


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    N = int(os.environ.get("N", 1 << 20))
    budget = 4 * N
    T = 10752
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    keys = jax.random.randint(k1, (budget,), 0, T, jnp.int32)
    slots = jnp.arange(budget, dtype=jnp.int32)
    vals = jax.random.randint(k2, (budget,), 0, N, jnp.int32)
    depths = jax.random.normal(k3, (N,))
    ends = jnp.sort(jax.random.randint(k1, (N,), 0, budget, jnp.int32))
    f32rows = jax.random.normal(k2, (budget, 16))

    t = timeit(jax.jit(lambda d: jnp.argsort(d)), depths)
    print(f"argsort [{N}]:                 {t*1e3:7.1f} ms")

    t = timeit(jax.jit(lambda k, s: jax.lax.sort((k, s), num_keys=1,
                                                 is_stable=True)),
               keys, slots)
    print(f"stable sort [{budget}] 2-op:   {t*1e3:7.1f} ms")

    t = timeit(jax.jit(lambda v, s: v[s]), vals, slots[::-1])
    print(f"gather [{budget}] int32:       {t*1e3:7.1f} ms")

    t = timeit(jax.jit(lambda r, s: r[s]), f32rows, slots[::-1])
    print(f"row gather [{budget}x16] f32:  {t*1e3:7.1f} ms")

    t = timeit(
        jax.jit(lambda p, s: jnp.zeros((budget,), jnp.int32)
                .at[p].set(s, mode="drop", unique_indices=True)),
        vals, slots)
    print(f"scatter-set [{budget}] unique: {t*1e3:7.1f} ms")

    t = timeit(
        jax.jit(lambda e: jnp.zeros((budget,), jnp.int32)
                .at[jnp.clip(e, 0, budget - 1)].add(1, mode="drop")),
        ends)
    print(f"scatter-add [{N}] dups:        {t*1e3:7.1f} ms")

    t = timeit(jax.jit(lambda m: jnp.cumsum(m)),
               jnp.ones((budget,), jnp.int32))
    print(f"cumsum [{budget}] i32:         {t*1e3:7.1f} ms")

    t = timeit(jax.jit(lambda g: jnp.cumsum(g, axis=0)), f32rows)
    print(f"cumsum [{budget}x16] f32:      {t*1e3:7.1f} ms")

    t = timeit(
        jax.jit(lambda e, s: jnp.searchsorted(e, s, side="right",
                                              method="sort")),
        ends, slots)
    print(f"searchsorted sort [{N}+{budget}]: {t*1e3:7.1f} ms")

    tids = jnp.arange(T + 1, dtype=jnp.int32)
    t = timeit(
        jax.jit(lambda k, q: jnp.searchsorted(k, q, side="left",
                                              method="sort")),
        jnp.sort(keys), tids)
    print(f"searchsorted sort [{budget}+{T}]: {t*1e3:7.1f} ms")

    t = timeit(
        jax.jit(lambda k, q: jnp.searchsorted(k, q, side="left",
                                              method="scan_unrolled")),
        jnp.sort(keys), tids)
    print(f"searchsorted scan_unrolled [{T} queries]: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
