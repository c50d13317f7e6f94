"""Can a hand-rolled bitonic network beat lax.sort for the pair sort?

The tile binning stable-sorts (tile_key int32, slot int32) at ~2M elements;
lax.sort costs ~70ms there. A bitonic network is log^2(n) fused
elementwise passes — potentially bandwidth-bound instead. Stability is
recovered by lexicographic (key, slot) comparison (slot is the unique
depth rank).

RESULT (axon v5e, 2^21 elements): lax.sort 81.9 ms, bitonic 761.3 ms
(compile 223 s). The 231 interleave/deinterleave reshapes dominate — each
pass rewrites the full arrays with a layout change. Dead end; lax.sort's
fused multi-op sort stands.
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


def bitonic_sort_pairs(keys: jnp.ndarray, vals: jnp.ndarray):
    """Ascending lexicographic sort of (keys, vals); n must be a power of 2."""
    n = keys.shape[0]
    k = n.bit_length() - 1
    assert (1 << k) == n, n

    for s in range(1, k + 1):
        for t in range(s, 0, -1):
            d = 1 << (t - 1)
            kk = keys.reshape(-1, 2, d)
            vv = vals.reshape(-1, 2, d)
            ka, kb = kk[:, 0], kk[:, 1]
            va, vb = vv[:, 0], vv[:, 1]
            # ascending iff bit s of the element index is 0; within a
            # reshape block the bit is constant and equals bit (s - t) of
            # the block index
            blocks = n // (2 * d)
            bi = jax.lax.broadcasted_iota(jnp.int32, (blocks, 1), 0)
            asc = ((bi >> (s - t)) & 1) == 0
            gt = (ka > kb) | ((ka == kb) & (va > vb))
            swap = jnp.where(asc, gt, ~gt)
            k_lo = jnp.where(swap, kb, ka)
            k_hi = jnp.where(swap, ka, kb)
            v_lo = jnp.where(swap, vb, va)
            v_hi = jnp.where(swap, va, vb)
            keys = jnp.stack([k_lo, k_hi], axis=1).reshape(n)
            vals = jnp.stack([v_lo, v_hi], axis=1).reshape(n)
    return keys, vals


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    n = 1 << int(os.environ.get("LOGN", 21))
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (n,), 0, 10752, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32)

    ref = jax.jit(lambda k, s: jax.lax.sort((k, s), num_keys=1,
                                            is_stable=True))
    t = timeit(ref, keys, slots)
    print(f"lax.sort stable [{n}] 2-op:   {t*1e3:7.1f} ms", flush=True)

    bit = jax.jit(bitonic_sort_pairs)
    t0 = time.time()
    ks, vs = bit(keys, slots)
    ks.block_until_ready()
    print(f"bitonic compile+1st: {time.time()-t0:.1f} s", flush=True)
    t = timeit(bit, keys, slots)
    print(f"bitonic [{n}] 2-op:           {t*1e3:7.1f} ms", flush=True)

    rk, rv = jax.device_get(ref(keys, slots))
    bk, bv = jax.device_get((ks, vs))
    import numpy as np
    assert (rk == bk).all()
    assert (rv == bv).all(), "payload order differs (stability broken)"
    print("parity with stable lax.sort: OK")


if __name__ == "__main__":
    main()
