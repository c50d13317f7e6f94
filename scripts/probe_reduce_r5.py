"""Round-5 probe: boundary-step variants of the sorted-pair-grad reduce.

r4 replaced the single [N+1, F] row boundary gather (12.8x lane-padded but
ONE pass, ~12ms) with F separate 1-D gathers to stay lane-dense — but each
1-D gather of ~1M elements is latency-bound on its own, so F=10 of them
cost ~10x. This probe times, at bench scale (budget=2M, F=10, N=1M):

  sort        — lax.sort perm + F payloads (shared by all variants)
  cumsum      — cumsum_cols_pl [F, budget]
  b_rowgather — csum.T [budget, F]; ONE row gather at bounds  (r3 form)
  b_cf_1d     — F per-channel 1-D gathers                      (r4 form)
  b_cf_take   — ONE gather along axis=1 of [F, budget]
  end-to-end  — full reduce_sorted_pair_grads (current code)
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

from goliath_tpu.ops.gsplat_pallas import cumsum_cols_pl  # noqa: E402


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

    def sort_only(g, p):
        ops = tuple(g[:, i] for i in range(F))
        out = jax.lax.sort((p,) + ops, num_keys=1, is_stable=False)
        return sum(o.sum() for o in out[1:])

    def csum_cf(g, p):
        ops = tuple(g[:, i] for i in range(F))
        out = jax.lax.sort((p,) + ops, num_keys=1, is_stable=False)
        return cumsum_cols_pl(out[1:])                       # [F, budget]

    def b_rowgather(g, p, off, en):
        csum = csum_cf(g, p).T                               # [budget, F]
        bounds = jnp.concatenate([off, en[-1:]])
        bvals = jnp.where((bounds > 0)[:, None],
                          csum[jnp.clip(bounds - 1, 0, budget - 1)], 0.0)
        acc = bvals[1:] - bvals[:-1]                         # [N, F]
        return acc[:, 0:2].sum() + acc[:, 2:5].sum() + acc[:, 6:].sum()

    def b_cf_1d(g, p, off, en):
        csum = csum_cf(g, p)
        bounds = jnp.concatenate([off, en[-1:]])
        bidx = jnp.clip(bounds - 1, 0, budget - 1)
        pos = bounds > 0
        bvals = jnp.stack(
            [jnp.where(pos, csum[c][bidx], 0.0) for c in range(F)])
        acc = bvals[:, 1:] - bvals[:, :-1]                   # [F, N]
        return acc[0:2].T.sum() + acc[2:5].T.sum() + acc[6:].T.sum()

    def b_cf_take(g, p, off, en):
        csum = csum_cf(g, p)
        bounds = jnp.concatenate([off, en[-1:]])
        bidx = jnp.clip(bounds - 1, 0, budget - 1)
        bvals = jnp.where((bounds > 0)[None, :],
                          jnp.take(csum, bidx, axis=1), 0.0)  # [F, N+1]
        acc = bvals[:, 1:] - bvals[:, :-1]
        return acc[0:2].T.sum() + acc[2:5].T.sum() + acc[6:].T.sum()

    def end_to_end(g, p, off, en):
        from goliath_tpu.ops.gsplat import reduce_sorted_pair_grads
        acc = reduce_sorted_pair_grads(g, p, off, en)
        return acc[0:2].T.sum() + acc[2:5].T.sum() + acc[6:].T.sum()

    for name, fn, args in [
        ("sort only", sort_only, (sorted_g, perm)),
        ("sort+cumsum_cf", lambda g, p: csum_cf(g, p).sum(), (sorted_g, perm)),
        ("boundary rowgather (r3)", b_rowgather,
         (sorted_g, perm, offsets, ends)),
        ("boundary cf 1-D x F (r4)", b_cf_1d,
         (sorted_g, perm, offsets, ends)),
        ("boundary cf take ax1", b_cf_take,
         (sorted_g, perm, offsets, ends)),
        ("reduce end-to-end (cur)", end_to_end,
         (sorted_g, perm, offsets, ends)),
    ]:
        t = timeit(jax.jit(fn), *args)
        print(f"{name:28s} {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
