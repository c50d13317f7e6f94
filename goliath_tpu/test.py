"""Evaluation loop (reference: ca_code/utils/test.py:49-133).

No-grad forward, per-batch losses accumulated to means, optional 4-panel
PNG dumps (gt / pred / mask / L2 x 20).
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from typing import Any, Callable, Dict, Iterator, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _save_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3] uint8; minimal PNG writer (no PIL dependency)."""
    import struct
    import zlib

    h, w = img.shape[:2]
    raw = b"".join(
        b"\x00" + img[i].astype(np.uint8).tobytes() for i in range(h)
    )
    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def test(
    model,
    loss_fn,
    test_data: Iterator,
    config: Mapping[str, Any],
    params: Any,
    batch_filter_fn: Optional[Callable] = None,
    vis_path: Optional[str] = None,
    logging_enabled: bool = True,
) -> Dict[str, float]:
    """Returns mean losses over the test set."""
    apply_fn = jax.jit(
        lambda p, b: model.apply(p, b, train=False)
    )
    sums: Dict[str, float] = defaultdict(float)
    count = 0
    if vis_path:
        os.makedirs(vis_path, exist_ok=True)

    for i, batch in enumerate(test_data):
        if batch is None:
            continue
        if batch_filter_fn is not None:
            batch = batch_filter_fn(batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, (list, str))}
        preds = apply_fn(params, jb)
        _, ldict = loss_fn(preds, jb, iteration=0)
        for k, v in ldict.items():
            sums[k] += float(np.asarray(v).mean())
        count += 1

        if vis_path and "rgb" in preds and "image" in jb:
            gt = np.asarray(jb["image"][0]).transpose(1, 2, 0)
            pred = np.asarray(preds["rgb"][0]).transpose(1, 2, 0)
            mask = np.asarray(
                jb.get("image_mask", jnp.ones_like(jb["image"]))[0]
            )
            if mask.shape[0] == 1:
                mask = np.repeat(mask, 3, axis=0)
            mask = mask.transpose(1, 2, 0)
            l2 = np.clip(((gt - pred) ** 2) * 20.0, 0, 1)
            scale = 255.0 if gt.max() <= 2.0 else 1.0
            panel = np.concatenate(
                [gt * scale, pred * scale, mask * 255.0, l2 * 255.0], axis=1
            )
            _save_png(
                os.path.join(vis_path, f"test_{i:04d}.png"),
                np.clip(panel, 0, 255).astype(np.uint8),
            )

        if logging_enabled and i % config.get("test", {}).get(
            "log_every_n_steps", 1
        ) == 0:
            logger.info(f"eval batch {i}: " + " ".join(
                f"{k}={float(np.asarray(v).mean()):.4f}"
                for k, v in ldict.items()
            ))

    means = {k: v / max(count, 1) for k, v in sums.items()}
    logger.info(f"eval means: {means}")
    return means
