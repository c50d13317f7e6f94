"""indexed_add (sort-based scatter replacement) vs .at[].add, and the
take_cols custom VJP vs plain fancy-index gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.ops.scatter import indexed_add, take_cols


@pytest.mark.parametrize("seed", [0, 1])
def test_indexed_add_matches_scatter(seed):
    rng = np.random.RandomState(seed)
    P, C, N = 5000, 4, 700
    # out-of-range indices must be dropped
    idx = jnp.asarray(rng.randint(-10, N + 10, size=P).astype(np.int32))
    vals = jnp.asarray(rng.randn(P, C).astype(np.float32))

    ref = np.zeros((N, C), np.float32)
    idx_np, vals_np = np.asarray(idx), np.asarray(vals)
    ok = (idx_np >= 0) & (idx_np < N)
    np.add.at(ref, idx_np[ok], vals_np[ok])

    got = np.asarray(indexed_add(idx, vals, N, _force_sorted=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    got2 = np.asarray(indexed_add(idx, vals, N))
    np.testing.assert_allclose(got2, ref, rtol=2e-5, atol=2e-5)


def test_take_cols_grad_matches_plain_gather():
    rng = np.random.RandomState(0)
    C, V = 3, 123
    table = jnp.asarray(rng.randn(C, V).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, size=(17, 13)).astype(np.int32))
    w = jnp.asarray(rng.randn(C, 17, 13).astype(np.float32))

    def f_custom(t):
        return (take_cols(t, idx) * w).sum()

    def f_plain(t):
        return (t[:, idx] * w).sum()

    g1 = jax.grad(f_custom)(table)
    g2 = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(take_cols(table, idx)),
                               np.asarray(table[:, idx]), rtol=0, atol=0)
