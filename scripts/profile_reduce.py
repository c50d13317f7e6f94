"""Staged in-graph timing of the pair-grad reduction (sorted pair grads ->
per-prim sums) at bench scale, comparing permutation-application strategies:

  scatter+gather — int-scatter inv = at[perm].set(iota), then rows[inv]
  sort-payload   — lax.sort((perm, g0..gF)) — perm IS the presort slot, so
                   sorting by it applies the inverse permutation; payload
                   operands cost ~2.6ms each at 2M vs ~35ms for the random
                   row gather
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

from goliath_tpu.ops.gsplat_pallas import cumsum_rows_pl  # noqa: E402


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    n = int(os.environ.get("N", 1024 * 1024))
    budget = int(float(os.environ.get("PBM", 2)) * n)
    F = int(os.environ.get("F", 10))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sorted_g = jax.random.normal(k1, (budget, F))
    perm = jax.random.permutation(k2, budget).astype(jnp.int32)
    counts = jnp.clip(jax.random.poisson(k3, 2.0, (n,)), 0, 8).astype(
        jnp.int32)
    ends = jnp.cumsum(counts).astype(jnp.int32)
    offsets = (ends - counts).astype(jnp.int32)

    def via_scatter_gather(sorted_g, perm):
        inv = jnp.zeros((budget,), jnp.int32).at[perm].set(
            jnp.arange(budget, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        return sorted_g[inv]

    def via_sort_payload(sorted_g, perm):
        ops = tuple(sorted_g[:, i] for i in range(F))
        out = jax.lax.sort((perm,) + ops, num_keys=1, is_stable=False)
        return jnp.stack(out[1:], axis=1)

    def boundary(presort):
        csum = cumsum_rows_pl(presort)
        bounds = jnp.concatenate([offsets, ends[-1:]])
        bvals = jnp.where((bounds > 0)[:, None],
                          csum[jnp.clip(bounds - 1, 0, budget - 1)], 0.0)
        return bvals[1:] - bvals[:-1]

    t = timeit(jax.jit(
        lambda g, p: via_scatter_gather(g, p).sum()), sorted_g, perm)
    print(f"permute scatter+gather:   {t*1e3:8.1f} ms")
    t = timeit(jax.jit(
        lambda g, p: via_sort_payload(g, p).sum()), sorted_g, perm)
    print(f"permute sort-payload:     {t*1e3:8.1f} ms")
    t = timeit(jax.jit(lambda g: cumsum_rows_pl(g).sum()), sorted_g)
    print(f"cumsum_rows [2M,{F}]:      {t*1e3:8.1f} ms")
    t = timeit(jax.jit(
        lambda g, p: boundary(via_scatter_gather(g, p)).sum()),
        sorted_g, perm)
    print(f"full (scatter+gather):    {t*1e3:8.1f} ms")
    t = timeit(jax.jit(
        lambda g, p: boundary(via_sort_payload(g, p)).sum()),
        sorted_g, perm)
    print(f"full (sort-payload):      {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
