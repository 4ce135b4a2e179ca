"""PyTorch oracle implementing the reference model equations (SURVEY.md §2.1).

This is a *test fixture only*: an independent implementation of the documented
MaskAttn-UNet equations (ade_semantic.py:152-314 / city_instance.py:216-276)
used to verify the JAX/Pallas implementation's numerics. Differences vs the
reference by design: the attention mask is an injected boolean keep-mask
(deterministic) instead of module-cached torch.randint, the dead
emb_layers are omitted, and the attention output is un-flattened with the
intended permute+view — the reference's raw `.view(B, C, H, W)` reinterpret
(ade_semantic.py:190) scrambles channels across space; that literal
behavior is covered separately by tests/literal_reference.py +
tests/test_literal_parity.py against the exec'd reference classes, with
`attn_output_layout='literal_view'` on the JAX side.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleAttention(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.q = nn.Linear(channels, channels)
        self.k = nn.Linear(channels, channels)
        self.v = nn.Linear(channels, channels)
        self.norm = nn.LayerNorm([channels])

    def forward(self, x, keep_mask):
        b, c, h, w = x.shape
        t = x.view(b, c, h * w).permute(0, 2, 1)
        q, k, v = self.q(t), self.k(t), self.v(t)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.channels)
        bias = torch.where(keep_mask[:, None, :],
                           torch.tensor(0.0), torch.tensor(float("-inf")))
        wts = (scores + bias).softmax(dim=-1)
        out = self.norm(wts @ v + t)
        return out.permute(0, 2, 1).view(b, c, h, w)


class OracleConvBlock(nn.Module):
    def __init__(self, cin, cout, mid=None, residual=False):
        super().__init__()
        mid = mid or cout
        self.residual = residual
        self.net = nn.Sequential(
            nn.Conv2d(cin, mid, 3, padding=1, bias=False),
            nn.BatchNorm2d(mid),
            nn.GELU(),
            nn.Conv2d(mid, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x):
        return F.gelu(x + self.net(x)) if self.residual else self.net(x)


class OracleDown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.net = nn.Sequential(
            nn.MaxPool2d(2),
            OracleConvBlock(cin, cin, residual=True),
            OracleConvBlock(cin, cout),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x):
        return self.net(x)


class OracleUp(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.upsample = nn.Upsample(scale_factor=2, mode="bilinear",
                                    align_corners=True)
        self.net = nn.Sequential(
            OracleConvBlock(cin, cin, residual=True),
            OracleConvBlock(cin, cout, cin // 2),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x, skip):
        x = self.upsample(x)
        return self.net(torch.cat([skip, x], dim=1))


class OracleUNet(nn.Module):
    def __init__(self, c_in=3, c_out=150, img_size=128, embed_dim=0,
                 boundary=False):
        super().__init__()
        self.initial = OracleConvBlock(c_in, 64)
        self.down1, self.down2, self.down3 = (
            OracleDown(64, 128), OracleDown(128, 256), OracleDown(256, 256))
        self.attn1 = OracleAttention(128)
        self.attn2 = OracleAttention(256)
        self.attn3 = OracleAttention(256)
        self.bottom1 = OracleConvBlock(256, 512)
        self.bottom2 = OracleConvBlock(512, 512)
        self.bottom3 = OracleConvBlock(512, 256)
        self.up1, self.up2, self.up3 = (
            OracleUp(512, 128), OracleUp(256, 64), OracleUp(128, 64))
        self.attn4 = OracleAttention(128)
        self.attn5 = OracleAttention(64)
        self.attn6 = OracleAttention(64)
        self.norm = nn.LayerNorm([64, img_size, img_size])
        self.final = nn.Sequential(
            nn.Conv2d(64, c_out, 1), nn.BatchNorm2d(c_out), nn.ReLU())
        self.embed_dim = embed_dim
        self.boundary = boundary
        if embed_dim:
            self.embed_head = nn.Sequential(
                nn.Conv2d(64, embed_dim, 1), nn.BatchNorm2d(embed_dim),
                nn.ReLU())
        if boundary:
            self.boundary_head = nn.Sequential(
                nn.Conv2d(c_out, 32, 3, padding=1), nn.BatchNorm2d(32),
                nn.ReLU(), nn.Conv2d(32, 1, 1))

    def forward(self, x, masks):
        x1 = self.initial(x)
        x2 = self.attn1(self.down1(x1), masks[0])
        x3 = self.attn2(self.down2(x2), masks[1])
        x4 = self.attn3(self.down3(x3), masks[2])
        x4 = self.bottom3(self.bottom2(self.bottom1(x4)))
        h = self.attn4(self.up1(x4, x3), masks[3])
        h = self.attn5(self.up2(h, x2), masks[4])
        h = self.attn6(self.up3(h, x1), masks[5])
        h = self.norm(h)
        sem = self.final(h)
        if not (self.embed_dim or self.boundary):
            return sem
        emb = self.embed_head(h) if self.embed_dim else None
        bnd = self.boundary_head(sem) if self.boundary else None
        return sem, bnd, emb


# ---------------------------------------------------------------------------
# Weight transfer: JAX pytree -> torch oracle
# ---------------------------------------------------------------------------

def _t(a):
    import numpy as np
    return torch.from_numpy(np.asarray(a).copy())


def load_convblock(mod: OracleConvBlock, p):
    mod.net[0].weight.data = _t(p["conv1"]["kernel"]).permute(3, 2, 0, 1)
    mod.net[3].weight.data = _t(p["conv2"]["kernel"]).permute(3, 2, 0, 1)
    for bn, name in ((mod.net[1], "bn1"), (mod.net[4], "bn2")):
        bn.weight.data = _t(p[name]["scale"])
        bn.bias.data = _t(p[name]["offset"])


def load_down(mod: OracleDown, p):
    load_convblock(mod.net[1], p["block1"])
    load_convblock(mod.net[2], p["block2"])
    mod.net[3].weight.data = _t(p["bn"]["scale"])
    mod.net[3].bias.data = _t(p["bn"]["offset"])


def load_up(mod: OracleUp, p):
    load_convblock(mod.net[0], p["block1"])
    load_convblock(mod.net[1], p["block2"])
    mod.net[2].weight.data = _t(p["bn"]["scale"])
    mod.net[2].bias.data = _t(p["bn"]["offset"])


def load_attn(mod: OracleAttention, p):
    for lin, name in ((mod.q, "query"), (mod.k, "key"), (mod.v, "value")):
        lin.weight.data = _t(p[name]["kernel"]).T
        lin.bias.data = _t(p[name]["bias"])
    mod.norm.weight.data = _t(p["norm"]["scale"])
    mod.norm.bias.data = _t(p["norm"]["offset"])


def load_params(model: OracleUNet, params: dict):
    load_convblock(model.initial, params["initial"])
    for i in (1, 2, 3):
        load_down(getattr(model, f"down{i}"), params[f"down{i}"])
        load_up(getattr(model, f"up{i}"), params[f"up{i}"])
        load_convblock(getattr(model, f"bottom{i}"), params[f"bottom{i}"])
    for i in range(1, 7):
        load_attn(getattr(model, f"attn{i}"), params[f"attn{i}"])
    # final LayerNorm affine: (H, W, C) -> [C, H, W]
    model.norm.weight.data = _t(params["final_norm"]["scale"]).permute(2, 0, 1)
    model.norm.bias.data = _t(params["final_norm"]["offset"]).permute(2, 0, 1)
    model.final[0].weight.data = _t(
        params["final_conv"]["kernel"]).permute(3, 2, 0, 1)
    model.final[0].bias.data = _t(params["final_conv"]["bias"])
    model.final[1].weight.data = _t(params["final_bn"]["scale"])
    model.final[1].bias.data = _t(params["final_bn"]["offset"])
    if model.embed_dim:
        model.embed_head[0].weight.data = _t(
            params["embed_conv"]["kernel"]).permute(3, 2, 0, 1)
        model.embed_head[0].bias.data = _t(params["embed_conv"]["bias"])
        model.embed_head[1].weight.data = _t(params["embed_bn"]["scale"])
        model.embed_head[1].bias.data = _t(params["embed_bn"]["offset"])
    if model.boundary:
        model.boundary_head[0].weight.data = _t(
            params["boundary_conv1"]["kernel"]).permute(3, 2, 0, 1)
        model.boundary_head[0].bias.data = _t(params["boundary_conv1"]["bias"])
        model.boundary_head[1].weight.data = _t(params["boundary_bn"]["scale"])
        model.boundary_head[1].bias.data = _t(params["boundary_bn"]["offset"])
        model.boundary_head[3].weight.data = _t(
            params["boundary_conv2"]["kernel"]).permute(3, 2, 0, 1)
        model.boundary_head[3].bias.data = _t(params["boundary_conv2"]["bias"])
