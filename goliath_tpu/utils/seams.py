"""UV-seam-continuous texture resampling (reference: ca_code/utils/seams.py).

`SeamSampler` holds precomputed seam-crossing texel copies (dst<-src) and a
weighted grid_sample resample; data comes from the shared static assets
(`seam_data_1024` / `seam_data_2048`).

TPU formulation: both impaint and resample are STATIC sparse linear maps
that touch only a thin seam band (~1-2% of texels). Naive advanced-index
forms (`tex[:, :, si, sj]`, `.at[:, :, si, sj].set(...)`) lower to XLA
gather/scatter ops whose window dims are (B, C) — XLA then lays the big
[B, C, H, W] operands out with C in the 128-lane minor dim, padding C=8
maps 16x (observed: six 2 GB layout-conversion copies in the mesh_vae
full-res backward = the round-3/4 HBM OOM). Instead each stage is

    out = tex + expand(delta)        # delta is K-sized, K = |seam band|

wrapped in ONE stage-level custom_vjp whose backward applies the
PRECOMPUTED TRANSPOSE of the same sparse map (ELL form, built once in
numpy at init). Forward and backward are then: a few K-sized gathers plus
one lane-dense [B, C, N] gather+add — no scatters, no sorts, no layout
copies.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.utils.sampling import grid_sample


def impaint_batch(value: jnp.ndarray, dst_ij: jnp.ndarray, src_ij: jnp.ndarray
                  ) -> jnp.ndarray:
    """Copy src texels into dst texels: value [B, C, H, W]. (Dense oracle —
    production path is SeamSampler.impaint.)"""
    src_vals = value[:, :, src_ij[:, 0], src_ij[:, 1]]
    return value.at[:, :, dst_ij[:, 0], dst_ij[:, 1]].set(src_vals)


def resample_tex(tex: jnp.ndarray, uvs: jnp.ndarray, weights: jnp.ndarray
                 ) -> jnp.ndarray:
    """Dense full-map resample oracle (reference semantics)."""
    B = tex.shape[0]
    grid = 2.0 * (uvs[None] - 0.5)
    grid = jnp.broadcast_to(grid, (B,) + grid.shape[1:])
    resampled = grid_sample(tex, grid, align_corners=False, padding_mode="border")
    return (1.0 - weights) * tex + weights * resampled


def _build_ell(q: np.ndarray, k: np.ndarray, c: np.ndarray):
    """Group sparse entries (target q, source k, coeff c) by target.

    Returns (tgt [K2] unique targets, ell_idx [m, K2] source index + 1
    (0 = padding -> zero column), ell_co [m, K2] float coeffs)."""
    if q.size == 0:
        return (np.zeros(1, np.int64), np.zeros((1, 1), np.int32),
                np.zeros((1, 1), np.float32))
    order = np.argsort(q, kind="stable")
    qs, ks, cs = q[order], k[order], c[order]
    tgt, start = np.unique(qs, return_index=True)
    counts = np.diff(np.append(start, qs.size))
    m = int(counts.max())
    K2 = tgt.size
    ell_idx = np.zeros((m, K2), np.int32)
    ell_co = np.zeros((m, K2), np.float32)
    rank = np.arange(qs.size) - np.repeat(start, counts)
    ell_idx[rank, np.repeat(np.arange(K2), counts)] = ks + 1
    ell_co[rank, np.repeat(np.arange(K2), counts)] = cs
    return tgt.astype(np.int64), ell_idx, ell_co


def _inv_map(tgt: np.ndarray, n: int) -> np.ndarray:
    """inv[p] = j + 1 where tgt[j] == p, else 0 (points at a zero column)."""
    inv = np.zeros((n,), np.int32)
    inv[tgt] = np.arange(1, tgt.size + 1, dtype=np.int32)
    return inv


def _pad_zero_col(h: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.zeros(h.shape[:-1] + (1,), h.dtype), h], axis=-1)


def _take_last(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, C, M] gathered along the last axis at idx [K] -> [B, C, K]
    via ONE lane-axis gather (jnp.take axis=-1 keeps K in the minor tile,
    lane-dense and single-pass). The advanced-indexing form x[:, :, idx]
    puts the (B, C) offset dims in the minor tile — XLA materializes
    [K, B, C] padded C -> 128 lanes (measured 42.7x / 8 GB at K = 2048^2,
    C = 3) — and per-(b, c) 1-D gather loops pay full gather latency B*C
    times (scripts/probe_reduce_r5.py: ~16ms per 1M-element gather)."""
    B, C, _ = x.shape
    flat = x.reshape(B * C, -1)
    return jnp.take(flat, idx, axis=1).reshape(B, C, idx.shape[0])


def _ell_apply(h: jnp.ndarray, ell_idx: np.ndarray, ell_co: np.ndarray
               ) -> jnp.ndarray:
    """h [B, C, K] -> [B, C, K2]: out[..., j] = sum_m co[m, j] * h[..., idx-1]."""
    hp = _pad_zero_col(h)
    out = None
    for m in range(ell_idx.shape[0]):
        term = _take_last(hp, jnp.asarray(ell_idx[m])) * jnp.asarray(ell_co[m])
        out = term if out is None else out + term
    return out


def _make_stage(gather_delta, transpose_h, ell_idx, ell_co, inv, inv_b):
    """Build a custom-vjp seam stage on flat maps [B, C, N].

    forward:  out = x + pad(gather_delta(x))[:, :, inv]
    backward: d_x = g + pad(ell_apply(transpose_h(g)))[:, :, inv_b]
    (all index/coeff tables static; no scatters in either direction)."""

    inv_j = jnp.asarray(inv)
    inv_bj = jnp.asarray(inv_b)

    @jax.custom_vjp
    def stage(x):
        delta = gather_delta(x)
        return x + _take_last(_pad_zero_col(delta), inv_j).astype(x.dtype)

    def fwd(x):
        return stage(x), None

    def bwd(_, g):
        corr = _ell_apply(transpose_h(g), ell_idx, ell_co)
        return (g + _take_last(_pad_zero_col(corr), inv_bj).astype(g.dtype),)

    stage.defvjp(fwd, bwd)
    return stage


class SeamSampler:
    def __init__(self, seamless_data: Dict[str, Any]) -> None:
        self.dst_ij = np.asarray(seamless_data["dst_ij"], np.int64)
        self.src_ij = np.asarray(seamless_data["src_ij"], np.int64)
        self.uvs = np.asarray(seamless_data["uvs"], np.float32)
        self.weights = np.asarray(seamless_data["weights"], np.float32)
        w = self.weights
        w2d = w.reshape(w.shape[-3:]) if w.ndim >= 3 else w[None]
        Cw, H, W = w2d.shape
        N = H * W
        self._hw = (H, W)

        # ---- resample: nonzero-weight texel set + its 4 bilinear taps ----
        nz = np.nonzero(np.abs(w2d).max(axis=0) > 0)
        if nz[0].size == 0:
            nz = (np.zeros(1, np.int64), np.zeros(1, np.int64))
        sel = (nz[0] * W + nz[1]).astype(np.int64)            # [K] unique
        self._sel = sel.astype(np.int32)
        self._sel_w = w2d[:, nz[0], nz[1]].astype(np.float32)  # [Cw, K]
        uv = self.uvs[nz[0], nz[1]]                            # [K, 2]
        # grid_sample(align_corners=False, padding_mode='border') taps:
        # continuous coord = uv * size - 0.5, border-clamped corners
        x = uv[:, 0] * W - 0.5
        y = uv[:, 1] * H - 0.5
        x0, y0 = np.floor(x), np.floor(y)
        wx, wy = (x - x0).astype(np.float32), (y - y0).astype(np.float32)
        tap_idx = np.zeros((4, sel.size), np.int64)
        tap_w = np.zeros((4, sel.size), np.float32)
        t = 0
        for dy in (0, 1):
            for dx in (0, 1):
                xi = np.clip(x0 + dx, 0, W - 1).astype(np.int64)
                yi = np.clip(y0 + dy, 0, H - 1).astype(np.int64)
                tap_idx[t] = yi * W + xi
                tap_w[t] = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                t += 1
        self._tap_idx = tap_idx.astype(np.int32)
        self._tap_w = tap_w

        # transpose entries of (res - cur) as a map h[K] -> N:
        #   +tap_w[t, k] at tap_idx[t, k]; -1 at sel[k]
        q = np.concatenate([tap_idx.reshape(-1), sel])
        k = np.concatenate([np.tile(np.arange(sel.size), 4),
                            np.arange(sel.size)])
        c = np.concatenate([tap_w.reshape(-1),
                            -np.ones(sel.size, np.float32)])
        tgt_r, ell_idx_r, ell_co_r = _build_ell(q, k, c)

        sel_j = jnp.asarray(self._sel)
        taps_j = [(jnp.asarray(self._tap_idx[t]), jnp.asarray(self._tap_w[t]))
                  for t in range(4)]
        w_j = jnp.asarray(self._sel_w)                          # [Cw, K]

        def resample_delta(xf):                                 # [B, C, N]
            cur = _take_last(xf, sel_j)
            res = None
            for idx_t, w_t in taps_j:
                term = _take_last(xf, idx_t) * w_t
                res = term if res is None else res + term
            return w_j[None] * (res - cur)                      # [B, C, K]

        def resample_h(g):                                      # cotangent
            return w_j[None] * _take_last(g, sel_j)

        self._resample_stage = _make_stage(
            resample_delta, resample_h, ell_idx_r, ell_co_r,
            _inv_map(sel, N), _inv_map(tgt_r, N))

        # ---- impaint: dst <- src static copies ----
        dst = (self.dst_ij[:, 0] * W + self.dst_ij[:, 1]).astype(np.int64)
        src = (self.src_ij[:, 0] * W + self.src_ij[:, 1]).astype(np.int64)
        # dedup dst keeping the LAST occurrence (scatter-set semantics)
        _, last = np.unique(dst[::-1], return_index=True)
        keep = np.sort(dst.size - 1 - last)
        dst, src = dst[keep], src[keep]
        dst_j, src_j = jnp.asarray(dst, jnp.int32), jnp.asarray(src, jnp.int32)

        q = np.concatenate([src, dst])
        k = np.concatenate([np.arange(dst.size)] * 2)
        c = np.concatenate([np.ones(dst.size, np.float32),
                            -np.ones(dst.size, np.float32)])
        tgt_i, ell_idx_i, ell_co_i = _build_ell(q, k, c)

        def impaint_delta(xf):
            return _take_last(xf, src_j) - _take_last(xf, dst_j)

        def impaint_h(g):
            return _take_last(g, dst_j)

        self._impaint_stage = _make_stage(
            impaint_delta, impaint_h, ell_idx_i, ell_co_i,
            _inv_map(dst, N), _inv_map(tgt_i, N))

    def _flat(self, value: jnp.ndarray, stage) -> jnp.ndarray:
        B, C, H, W = value.shape
        assert (H, W) == self._hw, \
            f"SeamSampler built for {self._hw}, got {(H, W)}"
        return stage(value.reshape(B, C, H * W)).reshape(B, C, H, W)

    def impaint(self, value: jnp.ndarray) -> jnp.ndarray:
        return self._flat(value, self._impaint_stage)

    def resample(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self._flat(tex, self._resample_stage)

    def resample_border_only(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(tex)

    def __call__(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(self.impaint(tex))
