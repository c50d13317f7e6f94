"""Frozen frontal face decoder (reference: ca_code/nn/face.py:16-83).

Decodes an external "hqlp" face latent into face geometry and a
frontal-view 1024^2 texture. Weights are expected to come from a
pretrained checkpoint; the module itself is a plain conv-transpose pyramid.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from goliath_tpu.nn.layers import (
    ConvTranspose2dWNUB,
    LinearWN,
    leaky_relu,
)


class FaceDecoderFrontal(nn.Module):
    assets: Any
    n_latent: int = 256
    n_vert_out: int = 3 * 7306
    tex_out_shp: Tuple[int, int] = (1024, 1024)
    tex_roi: Any = None  # defaults to ((0,0), tex_out_shp)

    @nn.compact
    def __call__(self, face_embs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B = face_embs.shape[0]
        frontal_view = jnp.asarray(
            np.asarray(self.assets.face_frontal_view, np.float32)
        )
        view = jnp.broadcast_to(frontal_view[None], (B,) + frontal_view.shape)

        encout = leaky_relu(LinearWN(self.n_latent, 256, name="encmod")(face_embs))
        geomout = LinearWN(256, self.n_vert_out, name="geommod")(encout)
        viewout = leaky_relu(LinearWN(3, 8, name="viewmod")(view))
        encview = jnp.concatenate([encout, viewout], axis=1)
        h = leaky_relu(LinearWN(256 + 8, 256 * 4 * 4, name="texfc")(encview))
        h = h.reshape(-1, 256, 4, 4)
        # conv-transpose pyramid 4 -> tex_out (reference channels at 1024)
        import math as _math

        out_size = self.tex_out_shp[0]
        full = [256, 256, 128, 128, 64, 64, 32, 8]  # input widths at 1024
        n_ups = int(_math.log2(out_size // 4))
        widths = full[-(n_ups - 1):] if n_ups > 1 else []
        widths = [256] + list(widths[1:]) if len(widths) else []
        size = 4
        cin = 256
        for i, w in enumerate(widths):
            size *= 2
            h = ConvTranspose2dWNUB(cin, w, size, size, 4, 2, 1,
                                    name=f"texmod_up{i}")(h)
            h = leaky_relu(h)
            cin = w
        texout = ConvTranspose2dWNUB(cin, 3, out_size, out_size, 4, 2, 1,
                                     alpha=1.0, name="texmod_out")(h)
        tex_roi = self.tex_roi or ((0, 0), self.tex_out_shp)
        roi_h = tex_roi[1][0] - tex_roi[0][0]
        roi_w = tex_roi[1][1] - tex_roi[0][1]
        bias = self.param("bias", nn.initializers.zeros, (3, roi_h, roi_w))
        out = {
            "face_geom": geomout.reshape(B, -1, 3),
            "face_tex_raw": texout,
        }
        out["face_tex"] = 255 * (texout + bias[None] + 0.5)
        return out
