#!/usr/bin/env python
"""Export torchvision VGG19 / EfficientNet-B0 weights to the npz schema
consumed by goliath_tpu.losses.perceptual (reference nets:
ca_code/loss/vgg.py:17-48, ca_code/loss/effnet.py:16-69).

This environment has torch-cpu but no torchvision and no egress, so the
exporter consumes a torch *state-dict file* obtained out-of-band:

  # on any machine with torchvision:
  python -c "import torch, torchvision as tv; \
      torch.save(tv.models.vgg19(weights='IMAGENET1K_V1').state_dict(), 'vgg19.pth')"
  python -c "import torch, torchvision as tv; \
      torch.save(tv.models.efficientnet_b0(weights='IMAGENET1K_V1').state_dict(), 'b0.pth')"

  # here:
  python scripts/export_perceptual_npz.py --vgg19 vgg19.pth --out vgg19.npz
  python scripts/export_perceptual_npz.py --effnet b0.pth --out effnet_b0.npz
  export GOLIATH_TPU_VGG19_NPZ=vgg19.npz GOLIATH_TPU_EFFNET_NPZ=effnet_b0.npz

Schemas
-------
VGG19 (the 13 convs reached by the reference's 5 slices, torchvision
`features` conv indices [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]):
  conv{i}_w [O, I, 3, 3], conv{i}_b [O]   for i in 0..12

EfficientNet-B0 features[0..3] with BatchNorms FOLDED into the convs
(inference-only):
  stem_w/b; per block j in 0..4: mb{j}_expand_w/b (absent when
  expand_ratio == 1), mb{j}_dw_w/b, mb{j}_se1_w/b, mb{j}_se2_w/b,
  mb{j}_proj_w/b.

`--selftest` builds randomly-initialized torch replicas with
torchvision-compatible state-dict keys, exports them, and checks the JAX
feature extractors reproduce the torch forward within fp32 tolerance.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torchvision VGG19 `features` indices of the 13 convs the loss reaches
VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]

# B0 blocks reached by features[1..3]: (cin, expand, kernel, stride, cout)
B0_BLOCKS = [
    (32, 1, 3, 1, 16),
    (16, 6, 3, 2, 24),
    (24, 6, 3, 1, 24),
    (24, 6, 5, 2, 40),
    (40, 6, 5, 1, 40),
]
# torchvision feature-stage/sub-block index per flat block
B0_STAGE_OF_BLOCK = [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1)]


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def export_vgg19(state: dict) -> dict:
    out = {}
    for i, fi in enumerate(VGG19_CONV_IDX):
        out[f"conv{i}_w"] = _np(state[f"features.{fi}.weight"])
        out[f"conv{i}_b"] = _np(state[f"features.{fi}.bias"])
    return out


def _fold_bn(conv_w, bn_gamma, bn_beta, bn_mean, bn_var, eps):
    """Fold an eval-mode BatchNorm into the preceding bias-free conv."""
    scale = _np(bn_gamma) / np.sqrt(_np(bn_var) + eps)
    w = _np(conv_w) * scale[:, None, None, None]
    b = _np(bn_beta) - _np(bn_mean) * scale
    return w, b


def export_effnet_b0(state: dict, bn_eps: float = 1e-5) -> dict:
    import torch  # noqa: F401 (state values are torch tensors)

    def fold(prefix_conv, prefix_bn):
        return _fold_bn(
            state[f"{prefix_conv}.weight"],
            state[f"{prefix_bn}.weight"], state[f"{prefix_bn}.bias"],
            state[f"{prefix_bn}.running_mean"],
            state[f"{prefix_bn}.running_var"], bn_eps,
        )

    out = {}
    out["stem_w"], out["stem_b"] = fold("features.0.0", "features.0.1")
    for j, (cin, exp, k, s, cout) in enumerate(B0_BLOCKS):
        stage, sub = B0_STAGE_OF_BLOCK[j]
        base = f"features.{stage}.{sub}.block"
        li = 0
        if exp != 1:
            out[f"mb{j}_expand_w"], out[f"mb{j}_expand_b"] = fold(
                f"{base}.{li}.0", f"{base}.{li}.1")
            li += 1
        out[f"mb{j}_dw_w"], out[f"mb{j}_dw_b"] = fold(
            f"{base}.{li}.0", f"{base}.{li}.1")
        li += 1
        out[f"mb{j}_se1_w"] = _np(state[f"{base}.{li}.fc1.weight"])
        out[f"mb{j}_se1_b"] = _np(state[f"{base}.{li}.fc1.bias"])
        out[f"mb{j}_se2_w"] = _np(state[f"{base}.{li}.fc2.weight"])
        out[f"mb{j}_se2_b"] = _np(state[f"{base}.{li}.fc2.bias"])
        li += 1
        out[f"mb{j}_proj_w"], out[f"mb{j}_proj_b"] = fold(
            f"{base}.{li}.0", f"{base}.{li}.1")
    return out


# ---------------------------------------------------------------------------
# torch replicas with torchvision-compatible state-dict keys (for selftest
# and for validating key mapping without torchvision/egress)
# ---------------------------------------------------------------------------


def build_torch_vgg19_features():
    """VGG19 cfg-E `features` replica (conv indices match torchvision)."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(True)]
            cin = v
    import torch.nn as nn

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    return Wrap()


def build_torch_b0_features():
    """EfficientNet-B0 features[0..3] replica; state-dict keys match
    torchvision's (block.{i}.{0,1} conv+bn, SE fc1/fc2)."""
    import torch
    import torch.nn as nn

    def cna(cin, cout, k, s, groups=1, act=True):
        mods = [nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                          bias=False), nn.BatchNorm2d(cout)]
        if act:
            mods.append(nn.SiLU(inplace=True))
        return nn.Sequential(*mods)

    class SE(nn.Module):
        def __init__(self, c, sq):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(c, sq, 1)
            self.fc2 = nn.Conv2d(sq, c, 1)
            self.activation = nn.SiLU(inplace=True)
            self.scale_activation = nn.Sigmoid()

        def forward(self, x):
            s = self.fc2(self.activation(self.fc1(self.avgpool(x))))
            return x * self.scale_activation(s)

    class MBConv(nn.Module):
        def __init__(self, cin, exp, k, s, cout):
            super().__init__()
            mid = cin * exp
            sq = max(1, cin // 4)
            mods = []
            if exp != 1:
                mods.append(cna(cin, mid, 1, 1))
            mods.append(cna(mid, mid, k, s, groups=mid))
            mods.append(SE(mid, sq))
            mods.append(cna(mid, cout, 1, 1, act=False))
            self.block = nn.Sequential(*mods)
            self.use_res = s == 1 and cin == cout

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            stages = [cna(3, 32, 3, 2)]
            blocks_by_stage = {1: [], 2: [], 3: []}
            for j, (cin, exp, k, s, cout) in enumerate(B0_BLOCKS):
                blocks_by_stage[B0_STAGE_OF_BLOCK[j][0]].append(
                    MBConv(cin, exp, k, s, cout))
            for i in (1, 2, 3):
                stages.append(nn.Sequential(*blocks_by_stage[i]))
            self.features = nn.Sequential(*stages)

        def forward(self, x):
            feats = []
            for i, st in enumerate(self.features):
                x = st(x)
                if i >= 1:
                    feats.append(x)
            return feats

    m = Wrap()
    # keep random BN stats non-trivial so folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.2)
    return m


def selftest(tmpdir: str) -> None:
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import torch
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    torch.manual_seed(0)
    x = torch.rand(1, 3, 64, 64) * 255.0

    # --- VGG19 ---
    vgg = build_torch_vgg19_features().eval()
    np.savez(os.path.join(tmpdir, "vgg19.npz"),
             **export_vgg19(vgg.state_dict()))
    os.environ["GOLIATH_TPU_VGG19_NPZ"] = os.path.join(tmpdir, "vgg19.npz")

    from goliath_tpu.losses import perceptual as P
    P._vgg19_weights.cache_clear()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xn = ((x / 255.0).clamp(0, 1) - mean) / std
    with torch.no_grad():
        h = xn
        tfeats = []
        bounds = [(0, 2), (2, 7), (7, 12), (12, 21), (21, 30)]
        for lo, hi in bounds:
            for li in range(lo, hi):
                h = vgg.features[li](h)
            tfeats.append(h.numpy())
    jfeats = P._vgg19_features(P._normalize_imagenet(
        jnp.asarray(x.numpy())))
    for i, (tf_, jf) in enumerate(zip(tfeats, jfeats)):
        err = np.abs(tf_ - np.asarray(jf)).max()
        scale = max(np.abs(tf_).max(), 1e-3)
        assert err / scale < 2e-5, f"vgg slice {i}: rel err {err/scale}"
    print("VGG19 selftest OK: 5 slices match torch within 2e-5 rel")

    # --- EffNet B0 ---
    b0 = build_torch_b0_features().eval()
    np.savez(os.path.join(tmpdir, "b0.npz"),
             **export_effnet_b0(b0.state_dict()))
    os.environ["GOLIATH_TPU_EFFNET_NPZ"] = os.path.join(tmpdir, "b0.npz")
    P._effnet_weights.cache_clear()
    with torch.no_grad():
        tfeats = [f.numpy() for f in b0(xn)]
    jfeats = P._effnet_features(P._normalize_imagenet(jnp.asarray(x.numpy())))
    for i, (tf_, jf) in enumerate(zip(tfeats, jfeats)):
        err = np.abs(tf_ - np.asarray(jf)).max()
        scale = max(np.abs(tf_).max(), 1e-3)
        assert err / scale < 5e-5, f"b0 stage {i}: rel err {err/scale}"
    print("EffNet-B0 selftest OK: 3 stages match torch within 5e-5 rel")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg19", help="path to torchvision vgg19 state dict")
    ap.add_argument("--effnet", help="path to torchvision efficientnet_b0 "
                                     "state dict")
    ap.add_argument("--out", help="output .npz path")
    ap.add_argument("--bn-eps", type=float, default=1e-5)
    ap.add_argument("--selftest", action="store_true",
                    help="validate the exporter + JAX nets against torch "
                         "replicas (no torchvision needed)")
    args = ap.parse_args()

    if args.selftest:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            selftest(td)
        return
    import torch

    if args.vgg19:
        state = torch.load(args.vgg19, map_location="cpu",
                           weights_only=True)
        np.savez(args.out or "vgg19.npz", **export_vgg19(state))
        print(f"wrote {args.out or 'vgg19.npz'}")
    if args.effnet:
        state = torch.load(args.effnet, map_location="cpu",
                           weights_only=True)
        np.savez(args.out or "effnet_b0.npz",
                 **export_effnet_b0(state, args.bn_eps))
        print(f"wrote {args.out or 'effnet_b0.npz'}")
    if not (args.vgg19 or args.effnet):
        ap.error("give --vgg19 and/or --effnet, or --selftest")


if __name__ == "__main__":
    main()
