"""Post-training int8 quantization (PTQ) for the serving path.

The reference has no quantization story (fp32 eager torch throughout —
SURVEY.md §2.2). On TPU v5e the int8 MXU peak is ~2x bf16 (~394 vs ~197
TOPS) and the v6 backbone (``pesquisa_v6/v6_pipeline/models.py:64-126``)
is conv/matmul-dominated, so an int8 serving path raises the throughput
ceiling of the fused hierarchical pipeline beyond what bf16 can reach.
This subsystem is net-new capability, not a port.

TPU-first design:

* **BatchNorm folding.** At inference BN is a per-channel affine map, so
  every conv+BN pair folds into one conv with a bias — one quantizable
  weight per layer and no BN arithmetic left in the graph.
* **Symmetric per-output-channel int8 weights; equalized per-tensor
  activation scales** calibrated from a representative batch. Calibration
  observes per-channel activation absmax; each quantized site then folds a
  per-input-channel equalization vector ``e_c = sqrt(a_c / w_c)`` into the
  weights (activations divided by ``e_c``, weight input-channel rows
  multiplied by ``e_c``), which balances channel dynamic ranges so the
  single per-tensor activation scale behaves like a per-channel one —
  the cross-layer-equalization trick of Nagel et al. 2019 ("Data-Free
  Quantization"), applied per-site with measured ranges. Zero-point is 0
  everywhere, so SAME-padding zeros stay exact in the integer domain.
* **Empirical bias correction.** Quantization noise has a non-zero mean
  per output channel; after quantizing, the per-channel mean discrepancy
  ``E[conv_f(x) - conv_q(x)]`` over the calibration batch is folded into
  each conv/dense bias (quantized graph only — the float reference
  forward keeps the exact folded biases).
* **Hybrid conv lowering** (default; measured fastest on the v5e — see
  the SMM section below): group-1 blocks run as direct int8
  ``conv_general_dilated`` with int32 accumulation; deeper blocks at
  <=4x4 extent lower to flat **spatial-matmul (SMM)** int8 contractions —
  one dense (S*S*Ci, So*So*Co) matmul per conv with SAME padding baked
  into structural zeros. At 1x1 spatial extent a 3x3 SAME conv collapses
  to its center tap (the ``SpatialConv`` trick, ``models/layers.py:160``),
  carried into the integer domain. ``lowering="im2col"`` keeps the
  legacy all-conv form.
* **Float islands.** The stem conv, SE / spatial-attention gates,
  residual adds and dequant epilogues stay in float (``float_dtype``):
  they are a rounding-sensitive, FLOP-trivial fraction of the graph.

Calibration and quantized inference share ONE forward implementation
(``_backbone_apply`` / ``_head_apply`` in observe- vs quantize-mode), so
the scales always describe exactly the tensors the int8 graph quantizes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from av1tpu.data.records import NORM_10BIT

_BN_EPS = 1e-5
_DIMNUMS = ("NHWC", "HWIO", "NHWC")
_GROUPS = ("layer1", "layer2", "layer3", "layer4")


# ---------------------------------------------------------------------------
# Folding: conv+BN -> conv+bias
# ---------------------------------------------------------------------------


def _fold(conv_kernel, bn_params, bn_stats):
    """Fold a BatchNorm (inference form) into the preceding conv.

    y = scale*(conv(x)-mean)/sqrt(var+eps) + bias
      = conv(x)*k + (bias - mean*k),  k = scale/sqrt(var+eps)
    """
    k = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    return conv_kernel * k, bn_params["bias"] - bn_stats["mean"] * k


def is_plain_stage(variables: Mapping) -> bool:
    """True when the variable tree has the plain ImprovedBackbone+MLPHead
    layout that fold_backbone/fold_head understand (Stage1/2/3 models).
    FGVC's projection+cosine head lacks ``params["head"]``. Used instead
    of catching KeyError around the fold: a genuinely malformed plain
    checkpoint should fail loudly, not silently serve unfolded."""
    try:
        p = variables["params"]
        return (
            "head" in p
            and "backbone" in p
            and "bn1" in p["backbone"]
            and "backbone" in variables.get("batch_stats", {})
        )
    except TypeError:
        return False


def fold_backbone(variables: Mapping) -> Dict:
    """BN-fold an ``ImprovedBackbone`` variable tree (params+batch_stats)
    into a flat dict of conv kernels+biases plus the float gate weights."""
    p = variables["params"]["backbone"]
    bs = variables["batch_stats"]["backbone"]
    folded: Dict[str, Any] = {}
    k, b = _fold(p["conv1"]["kernel"], p["bn1"], bs["bn1"])
    folded["stem"] = {"kernel": k, "bias": b}
    for gi, gname in enumerate(_GROUPS, start=1):
        for bi in range(2):
            n = f"{gname}_{bi}"
            blk: Dict[str, Any] = {}
            k1, b1 = _fold(p[n]["conv1"]["kernel"], p[n]["bn1"], bs[n]["bn1"])
            k2, b2 = _fold(p[n]["conv2"]["kernel"], p[n]["bn2"], bs[n]["bn2"])
            blk["conv1"] = {"kernel": k1, "bias": b1}
            blk["conv2"] = {"kernel": k2, "bias": b2}
            if "downsample_conv" in p[n]:
                kd, bd = _fold(
                    p[n]["downsample_conv"]["kernel"],
                    p[n]["downsample_bn"],
                    bs[n]["downsample_bn"],
                )
                blk["downsample"] = {"kernel": kd, "bias": bd}
            else:
                blk["downsample"] = None
            folded[n] = blk
        folded[f"se{gi}"] = {
            "d0": p[f"se{gi}"]["Dense_0"]["kernel"],
            "d1": p[f"se{gi}"]["Dense_1"]["kernel"],
        }
    folded["spatial_attn"] = p["spatial_attn"]["Conv_0"]["kernel"]
    return folded


def fold_head(variables: Mapping, name: str = "head") -> List[Dict]:
    """Extract an MLPHead dense stack as an ordered kernel+bias list.

    ``name`` selects the head submodule — the per-stage models use
    ``head``; the unified model carries four (``head_stage1`` etc.).
    """
    hp = variables["params"][name]
    names = sorted(hp.keys(), key=lambda s: int(s.split("_")[-1]))
    return [{"kernel": hp[n]["kernel"], "bias": hp[n]["bias"]} for n in names]


# ---------------------------------------------------------------------------
# Integer primitives
# ---------------------------------------------------------------------------


def _quant_weight(kernel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: kernel (..., O) -> ((K, O) int8,
    (O,) f32 scales). Row order of the flattened kernel matches
    ``_patches3x3`` (dh-major, dw, then input channel)."""
    flat = jnp.asarray(kernel, jnp.float32).reshape(-1, kernel.shape[-1])
    s = jnp.maximum(jnp.max(jnp.abs(flat), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(flat / s), -127, 127).astype(jnp.int8)
    return wq, s


def _quant_act(x, act):
    """Symmetric int8 activation quantization (zero-point 0).

    ``act = (inv, s_x)``: ``inv`` is the per-channel multiplier
    ``1 / (e_c * s_x)`` folding the equalization vector into the quantizer
    (a scalar when equalization is off); ``s_x`` is the per-tensor scale of
    the equalized activation, used by the dequant epilogue.
    """
    inv, _ = act
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )


def _int_dot(lhs_i8, rhs_i8):
    return jax.lax.dot_general(
        lhs_i8,
        rhs_i8,
        dimension_numbers=(((lhs_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _int_conv(x_i8, k_i8, stride: int):
    """Direct int8 SAME conv with int32 accumulation (exact: integer
    arithmetic, no rounding). Measured faster than the im2col lowering on
    the v5e at the 4x4-extent layer-1 shapes (docs/PARITY.md §int8
    lowering): no 9-tap patch materialization in HBM."""
    return jax.lax.conv_general_dilated(
        x_i8, k_i8, (stride, stride), "SAME", dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )


def _patches3x3(x, stride: int):
    """SAME 3x3 im2col: (B,H,W,C) -> (B,H',W',9C), zero padded (exact for
    symmetric quantization). Works for any dtype including int8.

    Padding matches XLA SAME semantics exactly: stride 1 pads (1,1);
    stride 2 on even extents pads (0,1) — the window for output ``o``
    starts at input row ``2*o`` (pad_total = (ceil(H/2)-1)*2+3-H = 1,
    pad_low = 0), NOT at ``2*o - 1``.
    """
    b, h, w, c = x.shape
    if stride == 1:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [
            xp[:, dh : dh + h, dw : dw + w, :]
            for dh in range(3)
            for dw in range(3)
        ]
        return jnp.concatenate(taps, axis=-1)
    assert stride == 2 and h % 2 == 0 and w % 2 == 0, (stride, h, w)
    ho, wo = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    taps = [
        xp[:, dh::2, dw::2, :][:, :ho, :wo, :]
        for dh in range(3)
        for dw in range(3)
    ]
    return jnp.concatenate(taps, axis=-1)


def _qconv3x3(x, act, w_i8, s_w, stride: int, float_dtype):
    """int8 3x3 SAME conv (center-tap matmul at 1x1 extent, direct int8
    conv otherwise — bit-identical to the im2col lowering, measured
    faster).

    At 1x1 spatial extent the center tap is exact for ANY stride: SAME
    padding is (1,1) there and the window covers only padding zeros plus
    the center pixel (output extent is ceil(1/s) = 1 regardless).

    ``w_i8`` is the flat (9*C, O) int8 kernel (``_quant_weight`` of the
    HWIO kernel); the direct-conv path reshapes it back to HWIO.
    """
    xq = _quant_act(x, act)
    scale = (s_w * np.float32(act[1])).astype(jnp.float32)
    c = x.shape[-1]
    if x.shape[1] == 1 and x.shape[2] == 1:
        w_center = w_i8.reshape(9, c, -1)[4]
        y = _int_dot(xq[:, 0, 0, :], w_center)
        return (y.astype(jnp.float32) * scale)[:, None, None, :].astype(float_dtype)
    y = _int_conv(xq, w_i8.reshape(3, 3, c, -1), stride)
    return (y.astype(jnp.float32) * scale).astype(float_dtype)


def _qconv1x1(x, act, w_i8, s_w, stride: int, float_dtype):
    xq = _quant_act(x, act)
    if stride != 1:
        xq = xq[:, ::stride, ::stride, :]
    y = _int_dot(xq, w_i8)
    scale = (s_w * np.float32(act[1])).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(float_dtype)


# ---------------------------------------------------------------------------
# Float reference ops (also the calibration path)
# ---------------------------------------------------------------------------


def _conv_f(x, kernel, stride: int):
    """Float 3x3 SAME conv with the center-tap collapse at 1x1 extent."""
    kernel = kernel.astype(x.dtype)
    if x.shape[1] == 1 and x.shape[2] == 1 and stride == 1 and kernel.shape[0] == 3:
        y = x[:, 0, 0, :] @ kernel[1, 1]
        return y[:, None, None, :]
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME", dimension_numbers=_DIMNUMS
    )


# ---------------------------------------------------------------------------
# Spatial-matmul (SMM) lowering: tiny-extent convs as ONE dense matmul
# ---------------------------------------------------------------------------
#
# Post-stem the 16px pipeline's spatial extents are 4x4 -> 1x1 — far below
# the MXU's 128x128 tile, so per-position convs (or im2col with its 9-tap
# HBM materialization) leave the systolic array mostly idle. The SMM
# lowering flattens spatial x channel into ONE axis (NHWC row-major) and
# expresses a SAME conv at extent (h,w) as a single dense
# (h*w*Ci, ho*wo*Co) matmul whose block structure bakes in the kernel taps
# and SAME-padding zeros. At 2x2 extent this is FEWER MACs than 9-tap
# im2col (the window covers <=4 real positions), at 4x4 it is 16/9 more —
# but every op becomes an MXU-aligned K>=256 contraction. Measured on the
# v5e (docs/PARITY.md §int8 lowering): direct int8 conv for the 4x4
# group-1 blocks + int8 SMM for groups 2-4 runs the stage-1 backbone at
# 1.19x the bf16 folded path, vs 0.53x for the all-im2col lowering. In
# bf16 the same lowering LOSES to XLA's conv path (group-1's 16/9 FLOP
# overhead is not paid back), so SMM is int8-only.


def build_smm_matrix(kernel, h: int, w: int, stride: int) -> np.ndarray:
    """Dense (h*w*Ci, ho*wo*Co) matrix equal to a SAME 3x3 conv at extent
    (h, w): ``conv(x, kernel) == (x.reshape(B,-1) @ M).reshape(B,ho,wo,Co)``.

    Padding matches XLA SAME semantics for ANY extent/stride:
    ``pad_low = max((ho-1)*stride + kh - h, 0) // 2`` — stride 1 pads
    (1,1); stride 2 on even extents pads (0,1) (window for output ``o``
    starts at row ``2*o``); stride 2 at the 1x1 extent pads (1,1), so the
    single output reads the CENTER tap (k[1,1]), same as the
    center-tap collapse in :func:`_qconv3x3`. (An earlier version used
    the even-extent convention everywhere and silently read k[0,0] at
    1x1/stride-2 — the layer4_0 site of every 16px/8px plan — which the
    even-extent-only golden test missed; caught by trained-checkpoint
    certification.)
    """
    k = np.asarray(kernel, np.float32)
    kh, kw, ci, co = k.shape
    ho, wo = -(-h // stride), -(-w // stride)
    m = np.zeros((h * w * ci, ho * wo * co), np.float32)
    pad_y = max((ho - 1) * stride + kh - h, 0) // 2
    pad_x = max((wo - 1) * stride + kw - w, 0) // 2
    for oy in range(ho):
        for ox in range(wo):
            dst = (oy * wo + ox) * co
            for dy in range(kh):
                for dx in range(kw):
                    iy = oy * stride + dy - pad_y
                    ix = ox * stride + dx - pad_x
                    if 0 <= iy < h and 0 <= ix < w:
                        src = (iy * w + ix) * ci
                        m[src:src + ci, dst:dst + co] = k[dy, dx]
    return m


def build_smm_matrix_1x1(kernel, h: int, w: int, stride: int) -> np.ndarray:
    """SMM matrix for a 1x1 conv (the downsample shortcut): output
    position (oy,ox) reads input position (oy*stride, ox*stride)."""
    k = np.asarray(kernel, np.float32)[0, 0]
    ci, co = k.shape
    ho, wo = -(-h // stride), -(-w // stride)
    m = np.zeros((h * w * ci, ho * wo * co), np.float32)
    for oy in range(ho):
        for ox in range(wo):
            src = ((oy * stride) * w + (ox * stride)) * ci
            dst = (oy * wo + ox) * co
            m[src:src + ci, dst:dst + co] = k
    return m


def _stem_out_extent(hw: int) -> int:
    """Input extent -> post-stem post-maxpool extent (7x7/2 conv with
    explicit (3,3) padding, then 3x3/2 maxpool with (1,1) padding)."""
    conv_out = (hw + 6 - 7) // 2 + 1
    return (conv_out + 2 - 3) // 2 + 1


def _plan_backbone(folded: Dict, hw: int) -> Dict:
    """Decide per-block lowering + build SMM weights/biases for a given
    input extent ``hw`` (the image height/width).

    Rule (measured, docs/PARITY.md §int8 lowering): a block lowers to SMM
    when its input extent is <=2 (SMM is strictly fewer MACs there), or
    <=4 outside group 1 (the 16/9 overhead pays for MXU alignment on the
    narrower deep channels); otherwise it stays a direct int8 conv. Group
    1 at 4x4 keeps the conv form — its 64-channel tensors are the
    largest, and the 16/9 extra traffic measured slower.

    Returns ``{"hw": hw, "blocks": {name: {"form", "s", "so", "stride",
    "ch"}}, "smm_w": {wkey: np (K,N)}, "smm_b": {wkey: np (N,)}}``.
    """
    s = _stem_out_extent(hw)
    blocks: Dict[str, Dict] = {}
    smm_w: Dict[str, np.ndarray] = {}
    smm_b: Dict[str, np.ndarray] = {}
    for gi, gname in enumerate(_GROUPS, start=1):
        for bi in range(2):
            n = f"{gname}_{bi}"
            blk = folded[n]
            stride = 2 if (gi > 1 and bi == 0) else 1
            so = max(1, -(-s // stride))
            use_smm = s <= 2 or (s <= 4 and gi >= 2)
            ch = int(np.asarray(blk["conv2"]["kernel"]).shape[-1])
            blocks[n] = {
                "form": "smm" if use_smm else "conv",
                "s": s, "so": so, "stride": stride, "ch": ch,
            }
            if use_smm:
                k1 = np.asarray(blk["conv1"]["kernel"], np.float32)
                k2 = np.asarray(blk["conv2"]["kernel"], np.float32)
                smm_w[f"{n}.conv1"] = build_smm_matrix(k1, s, s, stride)
                smm_b[f"{n}.conv1"] = np.tile(
                    np.asarray(blk["conv1"]["bias"], np.float32), so * so
                )
                smm_w[f"{n}.conv2"] = build_smm_matrix(k2, so, so, 1)
                smm_b[f"{n}.conv2"] = np.tile(
                    np.asarray(blk["conv2"]["bias"], np.float32), so * so
                )
                if blk["downsample"] is not None:
                    kd = np.asarray(
                        blk["downsample"]["kernel"], np.float32
                    )
                    smm_w[f"{n}.ds"] = build_smm_matrix_1x1(kd, s, s, stride)
                    smm_b[f"{n}.ds"] = np.tile(
                        np.asarray(blk["downsample"]["bias"], np.float32),
                        so * so,
                    )
            s = so
    return {"hw": hw, "blocks": blocks, "smm_w": smm_w, "smm_b": smm_b}


def _check_plan_extent(plan: Optional[Dict], x) -> None:
    """Hybrid-lowered models are extent-specialized: the plan's SMM
    matrices and activation scales bake the calibration extent. Serving a
    different size would fail deep inside a dot/reshape with an opaque
    shape error, so validate up front."""
    hw = plan.get("hw") if plan is not None else None
    if hw is not None and (x.shape[1] != hw or x.shape[2] != hw):
        raise ValueError(
            f"model was quantized for {hw}x{hw} inputs, got "
            f"{x.shape[1]}x{x.shape[2]} — re-quantize with calibration "
            f"images of this extent (the hybrid lowering bakes SMM "
            f"matrices per spatial size)"
        )


def _backbone_apply_hybrid(
    folded: Dict,
    x,
    plan: Dict,
    scales: Optional[Dict[str, Tuple]] = None,
    qw: Optional[Dict] = None,
    observed: Optional[Dict] = None,
    float_dtype=jnp.float32,
    qbias: Optional[Dict] = None,
    captured: Optional[Dict] = None,
    front_fn=None,
):
    """The hybrid-lowered backbone forward (observe- / quantize-mode).

    Same observe/quantize duality as :func:`_backbone_apply`, but conv
    sites execute per the ``plan``: direct int8 conv for "conv" blocks,
    flat spatial-matmuls for "smm" blocks. Observe mode records the
    EXACT tensors the quantized graph will see (flat for SMM sites), so
    calibration scales and bias corrections line up by construction.
    Stem, SE gates, spatial attention and GAP stay float, as in the
    legacy lowering; ``front_fn`` swaps in the fused stem+maxpool kernel
    (``kernels.fused_front``) — bit-identical, so the calibrated scales
    transfer.
    """
    quant = qw is not None
    nb = x.shape[0]

    def observe(site, t):
        if observed is not None:
            m = jnp.max(jnp.abs(t), axis=tuple(range(t.ndim - 1))).astype(
                jnp.float32
            )
            observed[site] = (
                jnp.maximum(observed[site], m) if site in observed else m
            )
        if captured is not None:
            captured[site] = t

    def _bias(wkey, base):
        if quant and qbias is not None and wkey in qbias:
            return qbias[wkey]
        return base

    def conv3(site, wkey, xin, entry, stride):
        observe(site, xin)
        if quant:
            y = _qconv3x3(
                xin, scales[site], qw[wkey][0], qw[wkey][1], stride,
                float_dtype,
            )
        else:
            y = _conv_f(xin, entry["kernel"], stride)
        return y + _bias(wkey, entry["bias"]).astype(y.dtype)

    def conv1(site, wkey, xin, entry, stride):
        observe(site, xin)
        if quant:
            y = _qconv1x1(
                xin, scales[site], qw[wkey][0], qw[wkey][1], stride,
                float_dtype,
            )
        else:
            kernel = entry["kernel"].astype(xin.dtype)
            y = jax.lax.conv_general_dilated(
                xin, kernel, (stride, stride), "SAME",
                dimension_numbers=_DIMNUMS,
            )
        return y + _bias(wkey, entry["bias"]).astype(y.dtype)

    def smm_mm(site, wkey, xin):
        observe(site, xin)
        if quant:
            act = scales[site]
            xq = _quant_act(xin, act)
            w_i8, s_w = qw[wkey]
            scale = (s_w * np.float32(act[1])).astype(jnp.float32)
            y = (_int_dot(xq, w_i8).astype(jnp.float32) * scale).astype(
                float_dtype
            )
        else:
            y = xin @ jnp.asarray(plan["smm_w"][wkey], xin.dtype)
        return y + _bias(
            wkey, jnp.asarray(plan["smm_b"][wkey], jnp.float32)
        ).astype(y.dtype)

    x = x.astype(float_dtype)
    if front_fn is not None:
        x = front_fn(x)
    else:
        stem = folded["stem"]
        x = jax.lax.conv_general_dilated(
            x, stem["kernel"].astype(float_dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=_DIMNUMS,
        )
        x = jnp.maximum(x + stem["bias"].astype(float_dtype), 0)
        x = fnn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    flat = False
    for gi, gname in enumerate(_GROUPS, start=1):
        for bi in range(2):
            n = f"{gname}_{bi}"
            blk = folded[n]
            p = plan["blocks"][n]
            if p["form"] == "smm":
                if not flat:
                    x = x.reshape(nb, -1)
                    flat = True
                y = smm_mm(f"{n}.in", f"{n}.conv1", x)
                y = jnp.maximum(y, 0)
                y = smm_mm(f"{n}.mid", f"{n}.conv2", y)
                if blk["downsample"] is not None:
                    res = smm_mm(f"{n}.in", f"{n}.ds", x)
                else:
                    res = x
                x = jnp.maximum(y + res, 0)
            else:
                if flat:
                    x = x.reshape(nb, p["s"], p["s"], -1)
                    flat = False
                y = conv3(f"{n}.in", f"{n}.conv1", x, blk["conv1"], p["stride"])
                y = jnp.maximum(y, 0)
                y = conv3(f"{n}.mid", f"{n}.conv2", y, blk["conv2"], 1)
                if blk["downsample"] is not None:
                    res = conv1(
                        f"{n}.in", f"{n}.ds", x, blk["downsample"], p["stride"]
                    )
                else:
                    res = x
                x = jnp.maximum(y + res, 0)
        ch = plan["blocks"][f"{gname}_1"]["ch"]
        se = folded[f"se{gi}"]
        if flat:
            g = x.reshape(nb, -1, ch).mean(axis=1)
        else:
            g = jnp.mean(x, axis=(1, 2))
        g = jnp.maximum(g @ se["d0"].astype(g.dtype), 0)
        g = jax.nn.sigmoid(g @ se["d1"].astype(g.dtype))
        if flat:
            x = (x.reshape(nb, -1, ch) * g[:, None, :]).reshape(nb, -1)
        else:
            x = x * g[:, None, None, :]

    so = plan["blocks"]["layer4_1"]["so"]
    if flat:
        x = x.reshape(nb, so, so, -1)
    sa_kernel = folded["spatial_attn"].astype(float_dtype)
    avg_map = jnp.mean(x, axis=-1, keepdims=True)
    max_map = jnp.max(x, axis=-1, keepdims=True)
    a = jnp.concatenate([avg_map, max_map], axis=-1)
    if so == 1:
        attn = (a[:, 0, 0, :] @ sa_kernel[3, 3])[:, None, None, :]
    else:
        attn = jax.lax.conv_general_dilated(
            a, sa_kernel, (1, 1), "SAME", dimension_numbers=_DIMNUMS
        )
    x = x * jax.nn.sigmoid(attn)
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# The single forward implementation (observe-mode / quantize-mode)
# ---------------------------------------------------------------------------


def _backbone_apply(
    folded: Dict,
    x,
    scales: Optional[Dict[str, Tuple]] = None,
    qw: Optional[Dict] = None,
    observed: Optional[Dict] = None,
    float_dtype=jnp.float32,
    group12_fn=None,
    qbias: Optional[Dict] = None,
    captured: Optional[Dict] = None,
    front_fn=None,
    front_g1_fn=None,
):
    """ImprovedBackbone inference forward over folded weights.

    ``qw=None``: float forward (the calibration/reference path); pass
    ``observed={}`` to collect per-site per-channel absmax, and
    ``captured={}`` to additionally keep each site's input tensor (for
    bias correction). ``qw`` + ``scales``: quantized forward, with
    ``qbias`` overriding the folded biases per weight key (bias
    correction). Graph parity: models/v6.ImprovedBackbone.

    ``group12_fn`` (float serving path only): a fused replacement for the
    layer1+SE1+layer2+SE2 subgraph — e.g. the Pallas mega-kernel
    ``kernels.resnet_group.fused_group12`` — applied post-maxpool.
    ``front_fn``: a fused replacement for stem+bias+relu+maxpool — e.g.
    ``kernels.fused_front.make_fused_front`` — taking the normalized
    NHWC input and returning the post-maxpool activation.
    ``front_g1_fn`` (float serving path only) goes further: it replaces
    stem+maxpool+layer1 blocks+SE1 in one call
    (``kernels.fused_front.make_fused_front_g1``), so the backbone
    resumes at layer group 2.
    """
    quant = qw is not None

    def observe(site, t):
        if observed is not None:
            m = jnp.max(jnp.abs(t), axis=tuple(range(t.ndim - 1))).astype(
                jnp.float32
            )
            observed[site] = (
                jnp.maximum(observed[site], m) if site in observed else m
            )
        if captured is not None:
            captured[site] = t

    def _bias(wkey, entry):
        if quant and qbias is not None and wkey in qbias:
            return qbias[wkey]
        return entry["bias"]

    def conv3(site, wkey, xin, entry, stride):
        observe(site, xin)
        if quant:
            y = _qconv3x3(
                xin, scales[site], qw[wkey][0], qw[wkey][1], stride, float_dtype
            )
        else:
            y = _conv_f(xin, entry["kernel"], stride)
        return y + _bias(wkey, entry).astype(y.dtype)

    def conv1(site, wkey, xin, entry, stride):
        observe(site, xin)
        if quant:
            y = _qconv1x1(
                xin, scales[site], qw[wkey][0], qw[wkey][1], stride, float_dtype
            )
        else:
            kernel = entry["kernel"].astype(xin.dtype)
            y = jax.lax.conv_general_dilated(
                xin, kernel, (stride, stride), "SAME", dimension_numbers=_DIMNUMS
            )
        return y + _bias(wkey, entry).astype(y.dtype)

    x = x.astype(float_dtype)
    # Stem (float): 7x7/2 conv on 1 channel + folded-BN bias + relu + maxpool.
    skip_group1 = False
    if front_g1_fn is not None and not quant and observed is None:
        x = front_g1_fn(x)
        skip_group1 = True
    elif front_fn is not None:
        x = front_fn(x)
    else:
        stem = folded["stem"]
        x = jax.lax.conv_general_dilated(
            x,
            stem["kernel"].astype(float_dtype),
            (2, 2),
            [(3, 3), (3, 3)],
            dimension_numbers=_DIMNUMS,
        )
        x = jnp.maximum(x + stem["bias"].astype(float_dtype), 0)
        x = fnn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    groups = list(enumerate(_GROUPS, start=1))
    if skip_group1:
        groups = groups[1:]
    elif group12_fn is not None and not quant and observed is None:
        x = group12_fn(x)
        groups = groups[2:]
    for gi, gname in groups:
        for bi in range(2):
            n = f"{gname}_{bi}"
            blk = folded[n]
            stride = 2 if (gi > 1 and bi == 0) else 1
            y = conv3(f"{n}.in", f"{n}.conv1", x, blk["conv1"], stride)
            y = jnp.maximum(y, 0)
            y = conv3(f"{n}.mid", f"{n}.conv2", y, blk["conv2"], 1)
            if blk["downsample"] is not None:
                res = conv1(f"{n}.in", f"{n}.ds", x, blk["downsample"], stride)
            else:
                res = x
            x = jnp.maximum(y + res, 0)
        se = folded[f"se{gi}"]
        g = jnp.mean(x, axis=(1, 2))
        g = jnp.maximum(g @ se["d0"].astype(g.dtype), 0)
        g = jax.nn.sigmoid(g @ se["d1"].astype(g.dtype))
        x = x * g[:, None, None, :]

    # Spatial attention (float): 7x7 conv over [mean, max] channel maps.
    sa_kernel = folded["spatial_attn"].astype(float_dtype)
    avg_map = jnp.mean(x, axis=-1, keepdims=True)
    max_map = jnp.max(x, axis=-1, keepdims=True)
    a = jnp.concatenate([avg_map, max_map], axis=-1)
    if x.shape[1] == 1 and x.shape[2] == 1:
        attn = (a[:, 0, 0, :] @ sa_kernel[3, 3])[:, None, None, :]
    else:
        attn = jax.lax.conv_general_dilated(
            a, sa_kernel, (1, 1), "SAME", dimension_numbers=_DIMNUMS
        )
    x = x * jax.nn.sigmoid(attn)
    return jnp.mean(x, axis=(1, 2))


def _head_apply(
    head: List[Dict],
    x,
    scales: Optional[Dict[str, Tuple]] = None,
    qw: Optional[Dict] = None,
    observed: Optional[Dict] = None,
    float_dtype=jnp.float32,
    qbias: Optional[Dict] = None,
    captured: Optional[Dict] = None,
    site_prefix: str = "head",
):
    """MLPHead inference forward (Dense/relu stack; dropout is identity).

    ``site_prefix`` names the activation sites (``head.0`` ...) so several
    heads sharing one backbone (the unified model) calibrate/quantize
    under distinct keys.
    """
    quant = qw is not None
    x = x.astype(float_dtype)
    for i, layer in enumerate(head):
        site = f"{site_prefix}.{i}"
        if observed is not None:
            m = jnp.max(jnp.abs(x), axis=0).astype(jnp.float32)
            observed[site] = (
                jnp.maximum(observed[site], m) if site in observed else m
            )
        if captured is not None:
            captured[site] = x
        if quant:
            w_i8, s_w = qw[site]
            act = scales[site]
            xq = _quant_act(x, act)
            scale = (s_w * np.float32(act[1])).astype(jnp.float32)
            bias = (
                qbias[site]
                if qbias is not None and site in qbias
                else layer["bias"]
            )
            x = (_int_dot(xq, w_i8).astype(jnp.float32) * scale).astype(
                float_dtype
            ) + bias.astype(float_dtype)
        else:
            x = x @ layer["kernel"].astype(x.dtype) + layer["bias"].astype(x.dtype)
        if i < len(head) - 1:
            x = jnp.maximum(x, 0)
    return x


# ---------------------------------------------------------------------------
# Quantized stage model
# ---------------------------------------------------------------------------


@dataclass
class QuantStageModel:
    """A BN-folded, int8-quantized v6 stage model: ``__call__(x) -> logits``
    on already-normalized float images. ``plan`` (set by the default
    "hybrid" lowering) routes the backbone through
    :func:`_backbone_apply_hybrid`; ``plan=None`` is the legacy all-conv
    lowering."""

    folded: Dict
    head: List[Dict]
    scales: Dict[str, Tuple[jnp.ndarray, float]]
    qw: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]
    float_dtype: Any = jnp.float32
    qbias: Optional[Dict[str, jnp.ndarray]] = None
    plan: Optional[Dict] = None
    front_fn: Optional[Any] = None
    calib_amax: Optional[Dict[str, np.ndarray]] = None

    def __call__(self, x):
        _check_plan_extent(self.plan, x)
        if self.plan is not None:
            feats = _backbone_apply_hybrid(
                self.folded, x, self.plan, self.scales, self.qw,
                float_dtype=self.float_dtype, qbias=self.qbias,
                front_fn=self.front_fn,
            )
        else:
            feats = _backbone_apply(
                self.folded,
                x,
                self.scales,
                self.qw,
                float_dtype=self.float_dtype,
                qbias=self.qbias,
                front_fn=self.front_fn,
            )
        return _head_apply(
            self.head,
            feats,
            self.scales,
            self.qw,
            float_dtype=self.float_dtype,
            qbias=self.qbias,
        )

    def float_forward(self, x):
        """The BN-folded float reference forward (same graph, no int8)."""
        feats = _backbone_apply(self.folded, x, float_dtype=jnp.float32)
        return _head_apply(self.head, feats, float_dtype=jnp.float32)


def _as_heads(head) -> Dict[str, List[Dict]]:
    """Normalize the single-head (list) form to the named-heads (dict of
    site-prefix -> dense stack) form shared by stage and unified models."""
    return head if isinstance(head, Mapping) else {"head": head}


def calibrate(
    folded: Dict, head, calib_x, capture: bool = False, plan: Optional[Dict] = None
):
    """Run the folded float forward once, collecting per-site per-channel
    activation absmax for every tensor the int8 graph will quantize.

    ``head``: one dense stack (list) or several named ones (dict of site
    prefix -> stack, e.g. the unified model's four heads). ``plan``
    switches observation to the hybrid-lowered graph (flat tensors at SMM
    sites) so the scales describe exactly what the quantized graph sees.
    Returns ``amax`` (site -> (C,) float64 numpy vector), plus the site
    input tensors when ``capture=True`` (for bias correction)."""
    heads = _as_heads(head)

    def run(x):
        observed: Dict[str, jnp.ndarray] = {}
        captured: Dict[str, jnp.ndarray] = {} if capture else None
        if plan is None:
            feats = _backbone_apply(
                folded, x, observed=observed, captured=captured
            )
        else:
            feats = _backbone_apply_hybrid(
                folded, x, plan, observed=observed, captured=captured
            )
        for prefix, stack in heads.items():
            _head_apply(
                stack, feats, observed=observed, captured=captured,
                site_prefix=prefix,
            )
        return observed, (captured if capture else {})

    observed, captured = jax.jit(run)(calib_x)
    amax = {k: np.maximum(np.asarray(v, np.float64), 0.0) for k, v in observed.items()}
    return (amax, captured) if capture else amax


# Weight keys consuming each activation site, as 4-tuples
# (wkey, quantizable kernel, conv stride, bias base). Shared sites (block
# input feeds both conv1 and the downsample) must share one equalization
# vector. With a ``plan``, SMM blocks contribute their dense spatial-matmul
# matrices (2D) and position-tiled biases instead of conv kernels.
def _site_consumers(folded: Dict, head, plan: Optional[Dict] = None):
    sites: Dict[str, List[Tuple[str, Any, int, Any]]] = {}
    for gi, gname in enumerate(_GROUPS, start=1):
        for bi in range(2):
            n = f"{gname}_{bi}"
            blk = folded[n]
            stride = 2 if (gi > 1 and bi == 0) else 1
            if plan is not None and plan["blocks"][n]["form"] == "smm":
                smm_w, smm_b = plan["smm_w"], plan["smm_b"]
                cons = [
                    (f"{n}.conv1", smm_w[f"{n}.conv1"], 1,
                     smm_b[f"{n}.conv1"])
                ]
                if blk["downsample"] is not None:
                    cons.append(
                        (f"{n}.ds", smm_w[f"{n}.ds"], 1, smm_b[f"{n}.ds"])
                    )
                sites[f"{n}.in"] = cons
                sites[f"{n}.mid"] = [
                    (f"{n}.conv2", smm_w[f"{n}.conv2"], 1,
                     smm_b[f"{n}.conv2"])
                ]
                continue
            cons = [
                (f"{n}.conv1", blk["conv1"]["kernel"], stride,
                 blk["conv1"]["bias"])
            ]
            if blk["downsample"] is not None:
                cons.append(
                    (f"{n}.ds", blk["downsample"]["kernel"], stride,
                     blk["downsample"]["bias"])
                )
            sites[f"{n}.in"] = cons
            sites[f"{n}.mid"] = [
                (f"{n}.conv2", blk["conv2"]["kernel"], 1,
                 blk["conv2"]["bias"])
            ]
    for prefix, stack in _as_heads(head).items():
        for i, layer in enumerate(stack):
            sites[f"{prefix}.{i}"] = [
                (f"{prefix}.{i}", layer["kernel"], 1, layer["bias"])
            ]
    return sites


def _quantize_sites(
    folded: Dict,
    heads: Dict[str, List[Dict]],
    calib_x,
    equalize: bool,
    bias_correct: bool,
    plan: Optional[Dict] = None,
):
    """The shared fold-calibrate-quantize core: returns (scales, qw, qbias,
    amax) for a folded backbone plus any number of named dense-head stacks.
    ``plan`` selects the hybrid lowering's site graph (SMM matrices as
    consumers at the planned blocks). ``amax`` is the raw (pre-equalization)
    per-site calibration absmax — the reference point for drift checks."""
    amax, captured = calibrate(folded, heads, calib_x, capture=True, plan=plan)
    sites = _site_consumers(folded, heads, plan=plan)

    scales: Dict[str, Tuple[jnp.ndarray, float]] = {}
    qw: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    eq: Dict[str, np.ndarray] = {}
    for site, consumers in sites.items():
        a = amax[site]
        if equalize:
            # per-input-channel weight absmax across all consumers
            w = np.zeros_like(a)
            for _, kernel, _, _ in consumers:
                k = np.abs(np.asarray(kernel, np.float64))
                k = k.reshape(-1, k.shape[-2], k.shape[-1]) if k.ndim == 4 else k[None]
                w = np.maximum(w, k.max(axis=(0, 2)))
            ok = (a > 0) & (w > 0)
            e = np.ones_like(a)
            e[ok] = np.sqrt(a[ok] / w[ok])
        else:
            e = np.ones_like(a)
        eq[site] = e
        s_x = max(float((a / e).max()), 1e-6) / 127.0
        inv = jnp.asarray(1.0 / (e * s_x), jnp.float32)
        scales[site] = (inv, s_x)
        for wkey, kernel, _, _ in consumers:
            ax = kernel.ndim - 2  # input-channel axis: 2 for convs, 0 for dense
            shape = [1] * kernel.ndim
            shape[ax] = -1
            qw[wkey] = _quant_weight(
                jnp.asarray(kernel) * jnp.asarray(e, jnp.float32).reshape(shape)
            )

    qbias: Optional[Dict[str, jnp.ndarray]] = None
    if bias_correct:
        qbias = {}

        # The calibration activations, float kernels, and int8 weights are
        # passed as jit ARGUMENTS: closing over them would embed every
        # tensor as an XLA compile-time constant, making compile time and
        # memory scale with the calibration batch (and opening the whole
        # graph to constant folding).
        def corrections(captured_args, kernel_args, qw_args):
            out = {}
            for site, consumers in sites.items():
                x = captured_args[site].astype(jnp.float32)
                act = scales[site]
                for wkey, _, stride, _ in consumers:
                    kernel = kernel_args[wkey]
                    q_int, q_scale = qw_args[wkey]
                    if kernel.ndim == 2:  # dense head layer / SMM matrix
                        y_f = x @ kernel
                        y_q = (
                            _int_dot(_quant_act(x, act), q_int).astype(
                                jnp.float32
                            )
                            * (q_scale * np.float32(act[1]))
                        )
                    elif kernel.shape[0] == 1:  # 1x1 downsample conv
                        y_f = jax.lax.conv_general_dilated(
                            x,
                            kernel,
                            (stride, stride),
                            "SAME",
                            dimension_numbers=_DIMNUMS,
                        )
                        y_q = _qconv1x1(
                            x, act, q_int, q_scale, stride, jnp.float32
                        )
                    else:
                        y_f = _conv_f(x, kernel, stride)
                        y_q = _qconv3x3(
                            x, act, q_int, q_scale, stride, jnp.float32
                        )
                    d = y_f - y_q
                    out[wkey] = jnp.mean(
                        d.reshape(-1, d.shape[-1]), axis=0
                    )
            return out

        deltas = jax.jit(corrections)(
            {site: captured[site] for site in sites},
            {
                wkey: jnp.asarray(kernel, jnp.float32)
                for consumers in sites.values()
                for wkey, kernel, _, _ in consumers
            },
            {
                wkey: (qw[wkey][0], qw[wkey][1])
                for consumers in sites.values()
                for wkey, _, _, _ in consumers
            },
        )
        for site, consumers in sites.items():
            for wkey, _, _, base in consumers:
                qbias[wkey] = (
                    jnp.asarray(base, jnp.float32) + deltas[wkey]
                )

    return scales, qw, qbias, amax


def quantize_stage(
    variables: Mapping,
    calib_x,
    float_dtype=jnp.float32,
    equalize: bool = True,
    bias_correct: bool = True,
    lowering: str = "hybrid",
) -> QuantStageModel:
    """Fold + calibrate + quantize one v6 stage model.

    ``calib_x``: representative normalized float images (N,H,W,1).
    ``equalize``: fold per-input-channel range equalization into the
    weights (see module docstring); ``bias_correct``: fold the calibration
    batch's per-channel mean quantization error into the biases. Both
    default on — together they moved final-label agreement vs the flax
    pipeline from 97.3% to the high 99s on trained checkpoints.
    ``lowering``: "hybrid" (default — direct int8 convs + spatial-matmul
    tail, the fast path; see the SMM section docstring) or "im2col"
    (legacy all-conv lowering).
    """
    if lowering not in ("hybrid", "im2col"):
        raise ValueError(f"unknown lowering {lowering!r}")
    folded = fold_backbone(variables)
    head = fold_head(variables)
    plan = (
        _plan_backbone(folded, int(calib_x.shape[1]))
        if lowering == "hybrid" else None
    )
    scales, qw, qbias, amax = _quantize_sites(
        folded, {"head": head}, calib_x, equalize, bias_correct, plan=plan
    )
    return QuantStageModel(
        folded, head, scales, qw, float_dtype=float_dtype, qbias=qbias,
        plan=plan, calib_amax=amax,
    )


# Unified-model head order; site prefixes match the flax submodule names so
# ``fold_head(variables, name=...)`` and the packed-logit column layout
# (models/v6.UNIFIED_LOGIT_SLICES) stay aligned.
_UNIFIED_HEADS = ("head_stage1", "head_stage2", "head_rect", "head_ab")


@dataclass
class QuantUnifiedModel:
    """An int8-quantized :class:`av1tpu.models.UnifiedV6Model`:
    ``__call__(x) -> (N, 10)`` packed logits (``split_unified_logits``
    layout) on already-normalized float images. One int8 backbone forward
    + four int8 dense head stacks."""

    folded: Dict
    heads: Dict[str, List[Dict]]
    scales: Dict[str, Tuple[jnp.ndarray, float]]
    qw: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]
    float_dtype: Any = jnp.float32
    qbias: Optional[Dict[str, jnp.ndarray]] = None
    plan: Optional[Dict] = None
    front_fn: Optional[Any] = None
    calib_amax: Optional[Dict[str, np.ndarray]] = None

    def _forward(self, x, quant: bool):
        scales = self.scales if quant else None
        qw = self.qw if quant else None
        qbias = self.qbias if quant else None
        fd = self.float_dtype if quant else jnp.float32
        if quant:
            _check_plan_extent(self.plan, x)
        if quant and self.plan is not None:
            feats = _backbone_apply_hybrid(
                self.folded, x, self.plan, scales, qw, float_dtype=fd,
                qbias=qbias, front_fn=self.front_fn if quant else None,
            )
        else:
            feats = _backbone_apply(
                self.folded, x, scales, qw, float_dtype=fd, qbias=qbias,
                front_fn=self.front_fn if quant else None,
            )
        return jnp.concatenate(
            [
                _head_apply(
                    self.heads[name], feats, scales, qw, float_dtype=fd,
                    qbias=qbias, site_prefix=name,
                ).astype(jnp.float32)
                for name in _UNIFIED_HEADS
            ],
            axis=-1,
        )

    def __call__(self, x):
        return self._forward(x, quant=True)

    def float_forward(self, x):
        """The BN-folded float reference forward (same graph, no int8)."""
        return self._forward(x, quant=False)


def quantize_unified(
    variables: Mapping,
    calib_x,
    float_dtype=jnp.float32,
    equalize: bool = True,
    bias_correct: bool = True,
    lowering: str = "hybrid",
) -> QuantUnifiedModel:
    """Fold + calibrate + quantize a trained ``UnifiedV6Model``.

    The unified variable tree carries the same ``backbone`` submodule as
    the per-stage models plus four named heads; all four calibrate and
    quantize against ONE shared set of backbone activation scales (they
    consume the same trunk), with per-head scales for the dense stacks.
    ``lowering`` as in :func:`quantize_stage`.
    """
    if lowering not in ("hybrid", "im2col"):
        raise ValueError(f"unknown lowering {lowering!r}")
    folded = fold_backbone(variables)
    heads = {name: fold_head(variables, name=name) for name in _UNIFIED_HEADS}
    plan = (
        _plan_backbone(folded, int(calib_x.shape[1]))
        if lowering == "hybrid" else None
    )
    scales, qw, qbias, amax = _quantize_sites(
        folded, heads, calib_x, equalize, bias_correct, plan=plan
    )
    return QuantUnifiedModel(
        folded, heads, scales, qw, float_dtype=float_dtype, qbias=qbias,
        plan=plan, calib_amax=amax,
    )


# ---------------------------------------------------------------------------
# Calibration-drift detection
# ---------------------------------------------------------------------------


def make_drift_checker(q):
    """Running activation-range check for a quantized model.

    int8 activation scales are frozen at calibration time; content drift
    (a scene cut, new texture statistics) can push activations past the
    calibrated absmax, where int8 clipping silently degrades agreement.
    This builds a cheap monitor: ONE float observe-mode forward (jitted
    once; reuse amortizes the compile) that returns the worst per-site
    ratio of observed absmax to the calibration absmax.

    ``check(x)`` takes normalized float images (N,H,W,1) — a small sample
    (~64 blocks) suffices — and returns ``{"max_ratio", "worst_site"}``.
    The ratio is PER-TENSOR (observed site absmax over calibrated site
    absmax — the quantity that sets the activation scale ``s_x``);
    per-channel ratios are dominated by channels that happened to be
    near-zero on the calibration batch and flag noise, not drift.
    ``max_ratio <= 1`` means the sample sits inside the calibrated range;
    sustained ratios above ~1.5 are the recalibration trigger (a 1.5x
    input brightness shift measures ~1.9, a scene-cut-sized 3x shift
    ~4.4; same-distribution held-out data ~1.17).
    """
    if q.calib_amax is None:
        raise ValueError("model carries no calibration amax (legacy object?)")
    heads = _as_heads(q.heads if hasattr(q, "heads") else q.head)
    base = {
        site: max(float(np.max(np.asarray(v, np.float64))), 1e-12)
        for site, v in q.calib_amax.items()
    }

    @jax.jit
    def observed_amax(x):
        observed: Dict[str, jnp.ndarray] = {}
        if q.plan is not None:
            feats = _backbone_apply_hybrid(
                q.folded, x, q.plan, observed=observed
            )
        else:
            feats = _backbone_apply(q.folded, x, observed=observed)
        for prefix, stack in heads.items():
            _head_apply(stack, feats, observed=observed, site_prefix=prefix)
        return observed

    def check(x) -> Dict[str, Any]:
        amax = observed_amax(x)
        worst, worst_site = 0.0, None
        for site, b in base.items():
            if site not in amax:
                continue
            r = float(np.max(np.asarray(amax[site], np.float64) / b))
            if r > worst:
                worst, worst_site = r, site
        return {"max_ratio": worst, "worst_site": worst_site}

    return check


# ---------------------------------------------------------------------------
# Fused int8 v6 pipeline
# ---------------------------------------------------------------------------


def attach_fused_front(
    q, hw: int, float_dtype=None, tile: int = 128,
    interpret: bool = False,
):
    """Swap a quantized (or folded) model's stem+maxpool for the Pallas
    fused front kernel (``kernels.fused_front`` — bit-identical, ~1.3x).
    No-op (returns False) when the extent is unsupported.

    ``float_dtype=None`` (default) follows ``q.float_dtype`` so a direct
    caller cannot silently inject a bf16 stem into an fp32-calibrated
    graph."""
    from av1tpu.kernels.fused_front import make_fused_front, supports_extent

    if not supports_extent(hw):
        return False
    if float_dtype is None:
        float_dtype = q.float_dtype
    q.front_fn = make_fused_front(
        q.folded["stem"]["kernel"], q.folded["stem"]["bias"], hw,
        float_dtype=float_dtype, tile=tile, interpret=interpret,
    )
    return True


def make_v6_pipeline_int8(
    models,
    calib_images,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    float_dtype=jnp.float32,
    mesh=None,
    use_fused_front: bool = False,
    interpret: bool = False,
    quant_out: Optional[list] = None,
):
    """int8 twin of :func:`av1tpu.eval.make_v6_pipeline`.

    ``models``: a ``PipelineModels``; ``calib_images``: uint16 calibration
    blocks (N,H,W,1) — a few hundred representative superblocks suffice.
    Returns ``predict(images_u16) -> dict`` with the same output contract
    and routing (``v6_route``) as the float pipeline.

    The AB stage quantizes only when its variables follow the plain
    backbone+MLPHead structure (``Stage3ABModel``); an FGVC AB model
    (BN-projection + cosine classifier) stays float inside the same fused
    graph — a mixed-precision pipeline, still one jit.

    ``use_fused_front`` swaps each quantized stage's stem+maxpool for the
    Pallas fused front kernel (bit-identical; 8/16px extents only —
    silently kept off otherwise). Requires ``mesh=None`` or a shard_map
    caller: pallas_call has no GSPMD rule, so with a mesh the predict is
    wrapped in shard_map over the data axis like the folded pipeline.
    """
    from av1tpu.eval.hierarchy import _jit_with_mesh, assemble_v6_predict

    calib_x = calib_images.astype(jnp.float32) / norm_scale
    q1 = quantize_stage(models.stage1_vars, calib_x, float_dtype)
    q2 = quantize_stage(models.stage2_vars, calib_x, float_dtype)
    q3r = quantize_stage(models.stage3_rect_vars, calib_x, float_dtype)
    if is_plain_stage(models.stage3_ab_vars):
        ab_logits_fn = quantize_stage(models.stage3_ab_vars, calib_x, float_dtype)
    else:
        ab_logits_fn = lambda x: models.stage3_ab.apply(  # noqa: E731
            models.stage3_ab_vars, x, train=False
        )
    if quant_out is not None:
        # expose the quantized stage objects (calibration amax, plans) for
        # drift monitoring — the returned predict is an opaque jit closure
        quant_out.extend(
            q for q in (q1, q2, q3r, ab_logits_fn)
            if isinstance(q, QuantStageModel)
        )

    has_pallas = False
    if use_fused_front:
        hw = int(calib_images.shape[1])
        for q in (q1, q2, q3r, ab_logits_fn):
            if isinstance(q, QuantStageModel):
                has_pallas |= attach_fused_front(
                    q, hw, float_dtype, interpret=interpret
                )

    predict = assemble_v6_predict(
        q1, q2, q3r, ab_logits_fn, stage1_threshold, norm_scale
    )
    if mesh is not None and has_pallas:
        return _shard_map_predict(predict, mesh)
    return _jit_with_mesh(predict, mesh)


def _shard_map_predict(predict, mesh):
    """shard_map the whole per-sample predict over the data axis (the
    pallas_call path — no GSPMD partitioning rule; weights replicate)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from av1tpu.parallel.mesh import DATA_AXIS

    spec = P(DATA_AXIS)
    return jax.jit(
        shard_map(
            predict, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_rep=False,
        )
    )


def make_unified_pipeline_int8(
    variables: Mapping,
    calib_images,
    stage1_threshold: float = 0.45,
    norm_scale: float = NORM_10BIT,
    float_dtype=jnp.float32,
    mesh=None,
    use_fused_front: bool = False,
    interpret: bool = False,
    quant_out: Optional[list] = None,
):
    """int8 twin of :func:`av1tpu.eval.make_unified_pipeline_folded`.

    ``variables``: a trained ``UnifiedV6Model`` variable tree;
    ``calib_images``: uint16 calibration blocks (N,H,W,1). Returns
    ``predict(images_u16) -> dict`` with the ``make_v6_pipeline`` output
    contract and routing. The int8 cuts compound with the unified
    family's ~4x backbone cut: one int8 trunk forward serves all four
    stage decisions. ``use_fused_front`` as in
    :func:`make_v6_pipeline_int8`.
    """
    from av1tpu.eval.hierarchy import _jit_with_mesh
    from av1tpu.eval.unified import _route_from_unified

    calib_x = calib_images.astype(jnp.float32) / norm_scale
    q = quantize_unified(variables, calib_x, float_dtype)
    if quant_out is not None:
        quant_out.append(q)
    has_pallas = False
    if use_fused_front:
        has_pallas = attach_fused_front(
            q, int(calib_images.shape[1]), float_dtype, interpret=interpret
        )

    def predict(images):
        x = images.astype(jnp.float32) / norm_scale
        return _route_from_unified(q(x), stage1_threshold)

    if mesh is not None and has_pallas:
        return _shard_map_predict(predict, mesh)
    return _jit_with_mesh(predict, mesh)


__all__ = [
    "QuantStageModel",
    "QuantUnifiedModel",
    "attach_fused_front",
    "build_smm_matrix",
    "build_smm_matrix_1x1",
    "is_plain_stage",
    "calibrate",
    "fold_backbone",
    "fold_head",
    "make_drift_checker",
    "make_unified_pipeline_int8",
    "make_v6_pipeline_int8",
    "quantize_stage",
    "quantize_unified",
]
