"""Torch oracle models for checkpoint-import parity tests.

Minimal from-scratch torch implementations reproducing the reference v6
architecture's compute graph AND state-dict key names (torchvision-style
``backbone.layerG.B.convN`` etc.), so `torch_import` can be validated
without torchvision or real reference checkpoints.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + identity)


class TorchSEBlock(nn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        self.excitation = nn.Sequential(
            nn.Linear(channels, channels // reduction, bias=False),
            nn.ReLU(),
            nn.Linear(channels // reduction, channels, bias=False),
            nn.Sigmoid(),
        )

    def forward(self, x):
        b, c = x.shape[:2]
        y = x.mean(dim=(2, 3))
        y = self.excitation(y).view(b, c, 1, 1)
        return x * y


class TorchSpatialAttention(nn.Module):
    def __init__(self, kernel_size=7):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, kernel_size, padding=kernel_size // 2, bias=False)

    def forward(self, x):
        avg_out = x.mean(dim=1, keepdim=True)
        max_out = x.max(dim=1, keepdim=True).values
        attn = torch.sigmoid(self.conv(torch.cat([avg_out, max_out], dim=1)))
        return x * attn


class TorchImprovedBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))
        self.se1 = TorchSEBlock(64)
        self.se2 = TorchSEBlock(128)
        self.se3 = TorchSEBlock(256)
        self.se4 = TorchSEBlock(512)
        self.spatial_attn = TorchSpatialAttention()

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.se1(self.layer1(x))
        x = self.se2(self.layer2(x))
        x = self.se3(self.layer3(x))
        x = self.se4(self.layer4(x))
        x = self.spatial_attn(x)
        return x.mean(dim=(2, 3))


class TorchStage2Head(nn.Module):
    def __init__(self, hidden=(256, 128), num_classes=3, temperature=False):
        super().__init__()
        layers, in_dim = [], 512
        for h in hidden:
            layers += [nn.Linear(in_dim, h), nn.ReLU(), nn.Dropout(0.4)]
            in_dim = h
        layers.append(nn.Linear(in_dim, num_classes))
        self.head = nn.Sequential(*layers)
        if temperature:  # Stage1BinaryHead (models.py:129-149)
            self.temperature = nn.Parameter(torch.ones(1) * 1.5)

    def forward(self, x):
        return self.head(x)


class TorchStage2Model(nn.Module):
    """Any v6 per-stage model; the per-stage head widths follow the
    reference exactly (models.py:129-203): stage1 (256,)->1 + temperature,
    stage2 (256,128)->3, rect (128,64)->2, ab (256,128)->4."""

    def __init__(self, hidden=(256, 128), num_classes=3, temperature=False):
        super().__init__()
        self.backbone = TorchImprovedBackbone()
        self.head = TorchStage2Head(hidden, num_classes, temperature)

    def forward(self, x):
        return self.head(self.backbone(x))


def torch_v6_stage(stage: str) -> "TorchStage2Model":
    """Reference-shaped per-stage v6 model (models.py:206-251)."""
    spec = {
        "stage1": ((256,), 1, True),
        "stage2": ((256, 128), 3, False),
        "rect": ((128, 64), 2, False),
        "ab": ((256, 128), 4, False),
    }[stage]
    return TorchStage2Model(*spec)


class TorchDepthwiseSeparableConv(nn.Module):
    """v5 dsconv block with the reference's param naming
    (models_hier.py:22-44)."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.depthwise = nn.Conv2d(in_ch, in_ch, 3, stride=stride, padding=1,
                                   groups=in_ch, bias=False)
        self.pointwise = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch)
        self.bn2 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        x = F.silu(self.bn1(self.depthwise(x)))
        return F.silu(self.bn2(self.pointwise(x)))


class TorchConvStem(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TorchHierarchicalBackbone(nn.Module):
    def __init__(self, base=32):
        super().__init__()
        widths = [base, base * 2, base * 4, base * 4]
        self.stem = TorchConvStem(1, widths[0])
        blocks = []
        in_c = widths[0]
        for idx, out_c in enumerate(widths[1:], start=1):
            stride = 2 if idx < len(widths) - 1 else 1
            blocks.append(TorchDepthwiseSeparableConv(in_c, out_c, stride))
            in_c = out_c
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return x.mean(dim=(2, 3))


def _v5_head(in_dim, out_dim):
    return nn.Sequential(
        nn.Linear(in_dim, in_dim // 2), nn.SiLU(), nn.Dropout(0.3),
        nn.Linear(in_dim // 2, out_dim),
    )


class TorchQPEmbedding(nn.Module):
    """Scalar QP projection with reference naming (models_hier.py:86-101)."""

    def __init__(self, embed_dim=16):
        super().__init__()
        self.proj = nn.Sequential(nn.Linear(1, embed_dim), nn.SiLU())

    def forward(self, qp):
        if qp.dim() == 1:
            qp = qp.unsqueeze(-1)
        return self.proj(qp)


class TorchHierarchicalModel(nn.Module):
    """v5 multi-head model with reference naming (models_hier.py:158-206);
    ``use_qp`` adds the optional QP embedding concatenated to the backbone
    features before every head (models_hier.py:86-101 semantics: head
    hidden width stays feature_dim // 2)."""

    def __init__(self, feature_dim=128, use_qp=False):
        super().__init__()
        self.backbone = TorchHierarchicalBackbone()
        self.use_qp = use_qp
        if use_qp:
            self.qp_embed = TorchQPEmbedding()
        qp_dim = 16 if use_qp else 0

        class Head(nn.Module):
            def __init__(self, out_dim):
                super().__init__()
                self.fc = nn.Sequential(
                    nn.Linear(feature_dim + qp_dim, feature_dim // 2),
                    nn.SiLU(), nn.Dropout(0.3),
                    nn.Linear(feature_dim // 2, out_dim),
                )

            def forward(self, x):
                return self.fc(x)

        self.stage1_head = Head(1)
        self.stage2_head = Head(5)
        self.specialist_heads = nn.ModuleDict({
            "RECT": Head(2), "AB": Head(4), "1TO4": Head(2),
        })

    def forward(self, x, qp=None):
        f = self.backbone(x)
        if self.use_qp:
            if qp is None:
                emb = torch.zeros(f.size(0), 16)
            else:
                emb = self.qp_embed(qp)
            f = torch.cat([f, emb], dim=-1)
        return (
            self.stage1_head(f).squeeze(-1),
            self.stage2_head(f),
            {k: h(f) for k, h in self.specialist_heads.items()},
        )


class TorchFGVCModel(nn.Module):
    """FGVC stack with script-006 naming (feat_proj Sequential indices,
    classifier.weight)."""

    def __init__(self, num_classes=4, feat_dim=512):
        super().__init__()
        self.backbone = TorchImprovedBackbone()
        self.feat_proj = nn.Sequential(
            nn.Linear(512, feat_dim), nn.BatchNorm1d(feat_dim), nn.ReLU(),
            nn.Dropout(0.3),
            nn.Linear(feat_dim, feat_dim), nn.BatchNorm1d(feat_dim), nn.ReLU(),
            nn.Dropout(0.3),
        )
        class CosineClassifier(nn.Module):
            def __init__(self):
                super().__init__()
                self.weight = nn.Parameter(torch.randn(num_classes, feat_dim))
                self.scale = 20.0

            def forward(self, f):
                w = F.normalize(self.weight, p=2, dim=1)
                return self.scale * F.linear(f, w)

        self.classifier = CosineClassifier()

    def forward(self, x):
        f = self.feat_proj(self.backbone(x))
        f = F.normalize(f, p=2, dim=1)
        return self.classifier(f)
