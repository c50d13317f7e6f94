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
    tex_roi: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (1024, 1024))

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
        h = leaky_relu(LinearWN(256 + 8, 256 * 4 * 4, name="texmod2")(encview))
        h = h.reshape(-1, 256, 4, 4)
        chans = [
            (256, 256, 8), (256, 128, 16), (128, 128, 32), (128, 64, 64),
            (64, 64, 128), (64, 32, 256), (32, 8, 512),
        ]
        for i, (cin, cout, size) in enumerate(chans):
            h = ConvTranspose2dWNUB(cin, cout, size, size, 4, 2, 1,
                                    name=f"texmod{i}")(h)
            h = leaky_relu(h)
        texout = ConvTranspose2dWNUB(8, 3, 1024, 1024, 4, 2, 1, alpha=1.0,
                                     name="texmod_out")(h)
        roi_h = self.tex_roi[1][0] - self.tex_roi[0][0]
        roi_w = self.tex_roi[1][1] - self.tex_roi[0][1]
        bias = self.param("bias", nn.initializers.zeros, (3, roi_h, roi_w))
        out = {
            "face_geom": geomout.reshape(B, -1, 3),
            "face_tex_raw": texout,
        }
        out["face_tex"] = 255 * (texout + bias[None] + 0.5)
        return out
