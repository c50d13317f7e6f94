"""Is the decoder's transpose-conv ladder MXU-efficient on TPU?

Times the production ConvTranspose2dWNUB ladder level (lhs-dilated conv)
against alternatives at the dominant level (512 -> 1024, 16 -> 125 ch):
  convt   — current formulation (conv with lhs_dilation=2)
  subpix  — stride-1 conv to 4x channels + depth-to-space (same FLOPs, dense)
  conv    — plain stride-1 4x4 conv at output res (upper-bound cost ref)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import goliath_tpu

goliath_tpu.enable_compilation_cache()


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(out.ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(out.ravel()[0])
    return (time.time() - t0) / n


def main():
    B = int(os.environ.get("B", 1))
    levels = [
        (256, 256, 16),    # 16 -> 32 etc. tiny
        (64, 128, 256),
        (32, 64, 512),
        (16, 125, 1024),   # the whale: 512^2 x 16 -> 1024^2 x 125
    ]
    key = jax.random.PRNGKey(0)
    for cin, cout, outres in levels:
        inres = outres // 2
        x = jax.random.normal(key, (B, cin, inres, inres))
        w_iohw = jax.random.normal(key, (cin, cout, 4, 4)) * 0.05

        @jax.jit
        def convt(x, w):
            wf = jnp.flip(w, (-2, -1)).transpose(1, 0, 2, 3)
            return lax.conv_general_dilated(
                x, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        @jax.jit
        def subpix(x, w):
            # phase (a, b): y[o, 2m+a, 2n+b] = sum_t x[i, m+?]..., kernel
            # taps kh with kh-1 ≡ a (mod 2). Build [4*Cout, Cin, 2, 2].
            ws = []
            for a in (0, 1):
                for b in (0, 1):
                    kh = [1, 3] if a == 0 else [0, 2]
                    kw = [1, 3] if b == 0 else [0, 2]
                    sub = w[:, :, kh][:, :, :, kw]      # [Cin, Cout, 2, 2]
                    ws.append(sub.transpose(1, 0, 2, 3))
            W = jnp.concatenate(ws, axis=0)             # [4Cout, Cin, 2, 2]
            # taps m' in {m, m-1} for kh order [1,3] (w flipped under conv)
            y = lax.conv_general_dilated(
                x, jnp.flip(W, (-2, -1)), (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            Bx, C4, H, Wd = y.shape
            C = C4 // 4
            y = y.reshape(Bx, 2, 2, C, H, Wd)
            y = y.transpose(0, 3, 4, 1, 5, 2).reshape(Bx, C, 2 * H, 2 * Wd)
            return y

        @jax.jit
        def conv_ref(xup, w):
            wf = w.transpose(1, 0, 2, 3)
            return lax.conv_general_dilated(
                xup, wf, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        @jax.jit
        def convt_bf16(x, w):
            wf = jnp.flip(w, (-2, -1)).transpose(1, 0, 2, 3)
            y = lax.conv_general_dilated(
                x.astype(jnp.bfloat16), wf.astype(jnp.bfloat16), (1, 1),
                [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            return y

        @jax.jit
        def convt_nhwc(x, w):
            wf = jnp.flip(w, (-2, -1)).transpose(2, 3, 0, 1)  # HWIO
            xn = x.transpose(0, 2, 3, 1)
            y = lax.conv_general_dilated(
                xn, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y

        t1 = timeit(convt, x, w_iohw)
        t2 = timeit(subpix, x, w_iohw)
        xup = jax.random.normal(key, (B, cin, outres, outres))
        t3 = timeit(conv_ref, xup, w_iohw)
        t4 = timeit(convt_bf16, x, w_iohw)
        t5 = timeit(convt_nhwc, x, w_iohw)
        print(f"{cin:4d}->{cout:4d} @{outres:4d}: convt {t1*1e3:7.2f} ms  "
              f"subpix {t2*1e3:7.2f} ms  dense-conv-at-out {t3*1e3:7.2f} ms  "
              f"bf16 {t4*1e3:7.2f} ms  nhwc {t5*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
