"""A faithful torch twin of MultiModalModel for whole-model parity goldens.

Reproduces the reference architecture (base_models.py:7-90) with the exact
module attribute names the HuggingFace checkpoint uses, so its state dict
round-trips through interop.torch_import unchanged. Parameterised by the
same (stage_sizes, width) knobs as ArchConfig so the golden can run on the
tiny test geometry.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchResNetTrunk(nn.Module):
    """torchvision-shaped trunk (conv1/bn1/layer{1..4}), GAP features."""

    def __init__(self, cin=3, width=64, stage_sizes=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        planes, c = width, width
        for stage, blocks in enumerate(stage_sizes):
            layer = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                layer.append(TorchBottleneck(c, planes, stride))
                c = planes * TorchBottleneck.expansion
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layer))
            planes *= 2
        self.feature_size = c

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x.mean(dim=(2, 3))


class TorchAdditiveAttention(nn.Module):
    def __init__(self, feat, hidden=128):
        super().__init__()
        self.query_projection = nn.Linear(feat, hidden)
        self.key_projection = nn.Linear(feat, hidden)
        self.value_projection = nn.Linear(feat, hidden)
        self.attention_mechanism = nn.Linear(hidden, hidden)

    def forward(self, f):
        scores = torch.tanh(self.query_projection(f) + self.key_projection(f))
        weights = torch.softmax(self.attention_mechanism(scores), dim=1)
        return self.value_projection(f) * weights  # elementwise, no sum


class TorchMultiModal(nn.Module):
    def __init__(self, num_classes=7, width=64, stage_sizes=(3, 4, 6, 3),
                 hidden=128, fusion_dims=(1284, 32)):
        super().__init__()
        self.image_model_feat = TorchResNetTrunk(3, width, stage_sizes)
        self.bathy_model_feat = TorchResNetTrunk(3, width, stage_sizes)
        self.sss_model_feat = TorchResNetTrunk(1, width, stage_sizes)
        feat = self.image_model_feat.feature_size
        self.attention_image = TorchAdditiveAttention(feat, hidden)
        self.attention_bathy = TorchAdditiveAttention(feat, hidden)
        self.attention_sss = TorchAdditiveAttention(feat, hidden)
        self.fc = nn.Linear(3 * hidden, fusion_dims[0])
        self.fc1 = nn.Linear(fusion_dims[0], fusion_dims[1])
        self.fc2 = nn.Linear(fusion_dims[1], num_classes)

    def forward(self, a, b, c):
        fi = self.image_model_feat(a)
        fb = self.bathy_model_feat(b)
        fs = self.sss_model_feat(c)
        combined = torch.cat([self.attention_image(fi),
                              self.attention_bathy(fb),
                              self.attention_sss(fs)], dim=1)
        return self.fc2(self.fc1(self.fc(combined)))


def softplus_inv_np(y):
    return np.log(np.expm1(y))


def bayesianize_state_dict(model: nn.Module, delta: float = 0.05,
                           sigma_floor: float = 1e-4):
    """Rename a deterministic twin's state dict to bayesian-torch keys
    (mu_kernel/rho_kernel for convs, mu_weight/rho_weight(+bias) for
    linears; BN keys kept) with MOPED-style sigma = max(delta*|w|, floor).

    Returns (state_dict, sigma_by_key) where sigma_by_key maps the *torch
    parameter key* to its sigma array (for constructing matched draws)."""
    sd, sigmas = {}, {}
    params = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        a = v.detach().cpu().numpy()
        if k not in params:  # BN running stats / num_batches_tracked
            sd[k] = a
            continue
        base, leaf = k.rsplit(".", 1)
        is_bn = a.ndim == 1 and (base.endswith("bn1") or base.endswith("bn2")
                                 or base.endswith("bn3")
                                 or base.endswith("downsample.1"))
        if is_bn:
            sd[k] = a  # deterministic affine
            continue
        sigma = np.maximum(delta * np.abs(a), sigma_floor).astype(np.float32)
        if a.ndim == 4:
            sd[f"{base}.mu_kernel"] = a
            sd[f"{base}.rho_kernel"] = softplus_inv_np(sigma)
        elif leaf == "weight":
            sd[f"{base}.mu_weight"] = a
            sd[f"{base}.rho_weight"] = softplus_inv_np(sigma)
        else:
            sd[f"{base}.mu_bias"] = a
            sd[f"{base}.rho_bias"] = softplus_inv_np(sigma)
        sigmas[k] = sigma
    return sd, sigmas


def set_draw(model: nn.Module, mus, sigmas, eps_by_key):
    """Load w = mu + sigma * eps into the twin's parameters in place."""
    with torch.no_grad():
        for k, p in model.named_parameters():
            if k in sigmas:
                w = mus[k] + sigmas[k] * eps_by_key[k]
                p.copy_(torch.from_numpy(w.astype(np.float32)))
