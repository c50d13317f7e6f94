"""Assemble QUALITY.md from the quality-run logs (/tmp/r3q_qtrain.log,
/tmp/r3q_qtest.log). Run after scripts/tpu_queue.sh finishes."""

import ast
import re
import sys

train_log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3q_qtrain.log"
test_log = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r3q_qtest.log"

iters = []
for line in open(train_log, errors="ignore"):
    m = re.search(r"iter=(\d+): (.*)", line)
    if m:
        losses = dict(re.findall(r"(\w+)=([-\d.na]+)", m.group(2)))
        iters.append((int(m.group(1)), losses))

means = None
for line in open(test_log, errors="ignore"):
    if line.startswith("{'loss_"):
        means = ast.literal_eval(line.strip())

if not iters or means is None:
    sys.exit("logs incomplete; not writing QUALITY.md")

first = iters[0]
last = iters[-1]
psnr = means.get("loss_psnr")
ssim = 1.0 - float(means.get("loss_rgb_ssim", 1.0))

out = f"""# Quality-parity evidence (round 4)

Protocol = the reference eval (ca_code/scripts/run_test.py:49-77): train to
convergence, then evaluate with the psnr metric injected, train-only losses
stripped, per-camera cal + learnable blur DISABLED, batch 1, fixed-seed
random frames. Capture = the rendered-target synthetic fixture
(configs/rgca_synthetic_quality.yml): a textured, lambert-lit sphere with
per-frame pose wobble and OLAT-style lighting, 256x256, uv 128 (16,384
gaussians), trained on a 6-camera ring and EVALUATED ON A 12-CAMERA RING —
the 6 odd cameras are held-out viewpoints.

Training: `python -m goliath_tpu.scripts.run_train
configs/rgca_synthetic_quality.yml` on the attached v5e
({last[0] + 1} iterations, batch 4).

| metric | iter {first[0]} | iter {last[0]} |
|---|---|---|
| rgb_l1 | {first[1].get('loss_rgb_l1')} | {last[1].get('loss_rgb_l1')} |
| rgb_ssim loss | {first[1].get('loss_rgb_ssim')} | {last[1].get('loss_rgb_ssim')} |
| total | {first[1].get('loss_total')} | {last[1].get('loss_total')} |

Held-out evaluation (`run_test`, 12 frames x mixed seen/held-out cameras):

| metric | value |
|---|---|
| **PSNR** | **{psnr:.2f} dB** |
| **SSIM** | **{ssim:.4f}** |
| rgb_l1 | {means.get('loss_rgb_l1'):.4f} |

Regression guard: tests/test_quality_floor.py trains the same pipeline
briefly on CPU and asserts held-out PSNR > 16 dB.

Caveats: the gated Goliath capture data is not available in this
environment, so quality parity against the reference's own checkpoints
cannot be measured directly; this artifact demonstrates the full
train->eval pipeline converging on real rendered targets under the
reference protocol. Perceptual losses used the structural nets with
fixed-seed features (no pretrained npz in-container; see
losses/perceptual.py) — they are DISABLED in this config, so the numbers
do not depend on them.
"""
open("/root/repo/QUALITY.md", "w").write(out)
print(out)
