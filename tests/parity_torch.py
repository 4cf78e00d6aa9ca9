"""Torch-CPU twin of MultiRobotPerceptionNet — the parity oracle.

SURVEY.md section 4.2: the reference mount was empty, so the allclose parity
contract (BASELINE.json:5) is anchored to a minimal torch reimplementation of
the same math (the reference is a torch codebase), with weights transplanted
from the flax model. When the real reference tree appears, swap its modules
in here.

DO NOT import torch from the main package — this module is test-only.
Layout notes: flax is NHWC with conv kernels (kh, kw, in, out); torch is
NCHW with (out, in, kh, kw). SAME padding for stride-2 convs is asymmetric
(XLA pads bottom/right), so convs here pre-pad explicitly.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _same_pad(x: torch.Tensor, k: int, s: int) -> torch.Tensor:
    """Replicate XLA/flax 'SAME' padding for a k x k, stride-s conv (NCHW)."""
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _conv(x, kernel_nhwc, bias, stride=1):
    """flax-kernel conv on NCHW input."""
    w = torch.from_numpy(np.ascontiguousarray(
        np.transpose(kernel_nhwc, (3, 2, 0, 1))))  # -> (out, in, kh, kw)
    x = _same_pad(x, w.shape[-1], stride)
    b = torch.from_numpy(np.asarray(bias)) if bias is not None else None
    return F.conv2d(x, w, b, stride=stride)


def _group_norm(x, num_groups, scale, bias, eps=1e-6):
    return F.group_norm(x, num_groups, torch.from_numpy(np.asarray(scale)),
                        torch.from_numpy(np.asarray(bias)), eps=eps)


def _dense(x, kernel, bias):
    return x @ torch.from_numpy(np.asarray(kernel)) + torch.from_numpy(np.asarray(bias))


class TorchTwin:
    """Forward-only twin driven directly by the flax param pytree."""

    def __init__(self, model_config, flax_params):
        self.cfg = model_config
        p = flax_params["params"] if "params" in flax_params else flax_params
        self.p = p

    # -- building blocks ---------------------------------------------------
    def _conv_block(self, x, params, stride):
        ch = params["Conv_0"]["kernel"].shape[-1]
        x = _conv(x, np.asarray(params["Conv_0"]["kernel"]), None, stride)
        g = min(self.cfg.norm_groups, ch)
        x = _group_norm(x, g, params["GroupNorm_0"]["scale"],
                        params["GroupNorm_0"]["bias"])
        return F.relu(x)

    def _res_block(self, x, params):
        ch = params["Conv_0"]["kernel"].shape[-1]
        h = self._conv_block(x, params["ConvBlock_0"], 1)
        h = _conv(h, np.asarray(params["Conv_0"]["kernel"]), None, 1)
        g = min(self.cfg.norm_groups, ch)
        h = _group_norm(h, g, params["GroupNorm_0"]["scale"],
                        params["GroupNorm_0"]["bias"])
        return F.relu(x + h)

    # -- stages ------------------------------------------------------------
    def encoder(self, x):
        p = self.p["encoder"]
        x = self._conv_block(x, p["stem"], 1)
        skips = []
        for i in range(len(self.cfg.encoder_channels)):
            x = self._conv_block(x, p[f"down{i}"], 2)
            x = self._res_block(x, p[f"res{i}"])
            skips.append(x)
        return skips, x

    def fusion(self, feats, edge_src, edge_dst, edge_mask, node_mask, layer=0):
        """Dense-math edge attention identical to the sparse JAX path."""
        p = self.p[f"fusion{layer}"]
        V, C = feats.shape[0], feats.shape[1]
        values = _conv(feats, np.asarray(p["value"]["kernel"]),
                       p["value"]["bias"], 1)

        if self.cfg.fusion == "attention":
            pooled = feats.mean(dim=(2, 3))  # [V, C]
            q = _dense(pooled, p["query"]["kernel"], p["query"]["bias"])
            k = _dense(pooled, p["key"]["kernel"], p["key"]["bias"])
            d = q.shape[-1]
            # per-edge logits, softmax per destination (loop = oracle clarity)
            logits = (q[edge_dst] * k[edge_src]).sum(-1) / math.sqrt(d)
            alpha = torch.zeros_like(logits)
            for v in range(V):
                sel = (torch.from_numpy(edge_dst) == v) & torch.from_numpy(edge_mask)
                if sel.any():
                    alpha[sel] = torch.softmax(logits[sel], dim=0)
            msg = torch.zeros_like(values)
            for e in range(len(edge_src)):
                if edge_mask[e]:
                    msg[edge_dst[e]] += alpha[e] * values[edge_src[e]]
        elif self.cfg.fusion == "mean":
            msg = torch.zeros_like(values)
            deg = torch.zeros(V)
            for e in range(len(edge_src)):
                if edge_mask[e]:
                    msg[edge_dst[e]] += values[edge_src[e]]
                    deg[edge_dst[e]] += 1
            msg = msg / deg.clamp(min=1.0)[:, None, None, None]
        else:
            raise ValueError(self.cfg.fusion)

        fused = torch.cat([feats, msg], dim=1)
        fused = _conv(fused, np.asarray(p["update"]["kernel"]), None, 1)
        fused = _group_norm(fused, min(self.cfg.norm_groups, C),
                            p["update_norm"]["scale"], p["update_norm"]["bias"])
        out = feats + F.relu(fused)
        return out * torch.from_numpy(node_mask.astype(np.float32))[:, None, None, None]

    def decoder(self, skips, bottleneck):
        p = self.p["decoder"]
        x = bottleneck
        n = len(self.cfg.encoder_channels)
        for i in reversed(range(n)):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, skips[i - 1]], dim=1)
            x = self._conv_block(x, p[f"up{i}"], 1)
        return x

    def heads(self, dec):
        out = {}
        if self.cfg.predict_depth:
            p = self.p["depth_head"]
            raw = _conv(dec, np.asarray(p["out"]["kernel"]), p["out"]["bias"], 1)
            out["depth"] = (self.cfg.min_depth +
                            (self.cfg.max_depth - self.cfg.min_depth)
                            * torch.sigmoid(raw[:, 0]))
        if self.cfg.num_seg_classes > 0:
            p = self.p["seg_head"]
            out["seg_logits"] = _conv(dec, np.asarray(p["out"]["kernel"]),
                                      p["out"]["bias"], 1)
        return out

    # -- full forward ------------------------------------------------------
    @torch.no_grad()
    def forward(self, images_nhwc: np.ndarray, graph) -> dict:
        """Returns activations dict in NHWC numpy, matching the JAX model."""
        x = torch.from_numpy(np.transpose(images_nhwc, (0, 3, 1, 2)).copy())
        skips, bottleneck = self.encoder(x)
        acts = {"bottleneck": bottleneck}
        fused = bottleneck
        if self.cfg.fusion != "none":
            src = np.asarray(graph.edge_src)
            dst = np.asarray(graph.edge_dst)
            mask = np.asarray(graph.edge_mask)
            nmask = np.asarray(graph.node_mask)
            for i in range(self.cfg.num_fusion_layers):
                fused = self.fusion(fused, src, dst, mask, nmask, layer=i)
        acts["fused"] = fused
        dec = self.decoder(skips, fused)
        acts["decoder"] = dec
        acts.update(self.heads(dec))

        def to_nhwc(t):
            a = t.numpy()
            return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a
        return {k: to_nhwc(v) for k, v in acts.items()}
