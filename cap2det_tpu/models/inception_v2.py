"""InceptionV2 (BN-Inception) backbone with the Faster-RCNN two-stage split.

The reference uses the object_detection ``faster_rcnn_inception_v2``
feature extractor (models/utils.py:127-167, configs set
``type: 'faster_rcnn_inception_v2'``): the *first stage* runs
inception_v2_base through ``Mixed_4e`` (stride 16, 576 channels) over the
full image; the *second stage* runs ``Mixed_5a..Mixed_5c`` (1024 channels)
over the cropped ROI features.

This is a pure-functional implementation over a params dict whose nesting
mirrors the TF-slim checkpoint variable names (``InceptionV2/Mixed_4e/
Branch_2/Conv2d_0b_3x3/weights`` etc.) so ImageNet checkpoints convert
1:1 (see tools/convert_tf_checkpoint.py). BatchNorm uses frozen moving
statistics (all shipped configs run with ``batch_norm_trainable: false``);
beta remains a parameter so gradient multipliers behave like the
reference.

Compute defaults to bfloat16 on the MXU with float32 accumulation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

BN_EPSILON = 0.001


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _conv_params(rng, kh, kw, cin, cout, stddev=0.09):
    k1, _ = jax.random.split(rng)
    return {
        "weights": jax.random.truncated_normal(
            k1, -2.0, 2.0, (kh, kw, cin, cout), jnp.float32
        )
        * stddev,
        "BatchNorm": {
            "beta": jnp.zeros((cout,), jnp.float32),
            "moving_mean": jnp.zeros((cout,), jnp.float32),
            "moving_variance": jnp.ones((cout,), jnp.float32),
        },
    }


def _sep_conv_params(rng, kh, kw, cin, channel_multiplier, cout, stddev=0.09):
    k1, k2 = jax.random.split(rng)
    return {
        "depthwise_weights": jax.random.truncated_normal(
            k1, -2.0, 2.0, (kh, kw, cin, channel_multiplier), jnp.float32
        )
        * stddev,
        "pointwise_weights": jax.random.truncated_normal(
            k2, -2.0, 2.0, (1, 1, cin * channel_multiplier, cout), jnp.float32
        )
        * stddev,
        "BatchNorm": {
            "beta": jnp.zeros((cout,), jnp.float32),
            "moving_mean": jnp.zeros((cout,), jnp.float32),
            "moving_variance": jnp.ones((cout,), jnp.float32),
        },
    }


# Inception block specs: per branch a list of (name, kernel, cout, stride).
# Pool branches are ('avg'|'max', kernel, stride) pseudo-layers.
# Matches slim inception_v2_base / od's box-classifier blocks.

_BLOCKS_FIRST = {
    "Mixed_3b": [
        [("Conv2d_0a_1x1", 1, 64, 1)],
        [("Conv2d_0a_1x1", 1, 64, 1), ("Conv2d_0b_3x3", 3, 64, 1)],
        [
            ("Conv2d_0a_1x1", 1, 64, 1),
            ("Conv2d_0b_3x3", 3, 96, 1),
            ("Conv2d_0c_3x3", 3, 96, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 32, 1)],
    ],
    "Mixed_3c": [
        [("Conv2d_0a_1x1", 1, 64, 1)],
        [("Conv2d_0a_1x1", 1, 64, 1), ("Conv2d_0b_3x3", 3, 96, 1)],
        [
            ("Conv2d_0a_1x1", 1, 64, 1),
            ("Conv2d_0b_3x3", 3, 96, 1),
            ("Conv2d_0c_3x3", 3, 96, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 64, 1)],
    ],
    "Mixed_4a": [
        [("Conv2d_0a_1x1", 1, 128, 1), ("Conv2d_1a_3x3", 3, 160, 2)],
        [
            ("Conv2d_0a_1x1", 1, 64, 1),
            ("Conv2d_0b_3x3", 3, 96, 1),
            ("Conv2d_1a_3x3", 3, 96, 2),
        ],
        [("pool_max", 3, None, 2)],
    ],
    "Mixed_4b": [
        [("Conv2d_0a_1x1", 1, 224, 1)],
        [("Conv2d_0a_1x1", 1, 64, 1), ("Conv2d_0b_3x3", 3, 96, 1)],
        [
            ("Conv2d_0a_1x1", 1, 96, 1),
            ("Conv2d_0b_3x3", 3, 128, 1),
            ("Conv2d_0c_3x3", 3, 128, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 128, 1)],
    ],
    "Mixed_4c": [
        [("Conv2d_0a_1x1", 1, 192, 1)],
        [("Conv2d_0a_1x1", 1, 96, 1), ("Conv2d_0b_3x3", 3, 128, 1)],
        [
            ("Conv2d_0a_1x1", 1, 96, 1),
            ("Conv2d_0b_3x3", 3, 128, 1),
            ("Conv2d_0c_3x3", 3, 128, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 128, 1)],
    ],
    "Mixed_4d": [
        [("Conv2d_0a_1x1", 1, 160, 1)],
        [("Conv2d_0a_1x1", 1, 128, 1), ("Conv2d_0b_3x3", 3, 160, 1)],
        [
            ("Conv2d_0a_1x1", 1, 128, 1),
            ("Conv2d_0b_3x3", 3, 160, 1),
            ("Conv2d_0c_3x3", 3, 160, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 96, 1)],
    ],
    "Mixed_4e": [
        [("Conv2d_0a_1x1", 1, 96, 1)],
        [("Conv2d_0a_1x1", 1, 128, 1), ("Conv2d_0b_3x3", 3, 192, 1)],
        [
            ("Conv2d_0a_1x1", 1, 160, 1),
            ("Conv2d_0b_3x3", 3, 192, 1),
            ("Conv2d_0c_3x3", 3, 192, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 96, 1)],
    ],
}

_BLOCKS_SECOND = {
    "Mixed_5a": [
        [("Conv2d_0a_1x1", 1, 128, 1), ("Conv2d_1a_3x3", 3, 192, 2)],
        [
            ("Conv2d_0a_1x1", 1, 192, 1),
            ("Conv2d_0b_3x3", 3, 256, 1),
            ("Conv2d_1a_3x3", 3, 256, 2),
        ],
        [("pool_max", 3, None, 2)],
    ],
    "Mixed_5b": [
        [("Conv2d_0a_1x1", 1, 352, 1)],
        [("Conv2d_0a_1x1", 1, 192, 1), ("Conv2d_0b_3x3", 3, 320, 1)],
        [
            ("Conv2d_0a_1x1", 1, 160, 1),
            ("Conv2d_0b_3x3", 3, 224, 1),
            ("Conv2d_0c_3x3", 3, 224, 1),
        ],
        [("pool_avg", 3, None, 1), ("Conv2d_0b_1x1", 1, 128, 1)],
    ],
    "Mixed_5c": [
        [("Conv2d_0a_1x1", 1, 352, 1)],
        [("Conv2d_0a_1x1", 1, 192, 1), ("Conv2d_0b_3x3", 3, 320, 1)],
        [
            ("Conv2d_0a_1x1", 1, 192, 1),
            ("Conv2d_0b_3x3", 3, 224, 1),
            ("Conv2d_0c_3x3", 3, 224, 1),
        ],
        [("pool_max", 3, None, 1), ("Conv2d_0b_1x1", 1, 128, 1)],
    ],
}

FIRST_STAGE_DEPTH = 576  # Mixed_4e output channels
SECOND_STAGE_DEPTH = 1024  # Mixed_5c output channels


def _block_params(rng, spec, cin):
    out = {}
    total = 0
    for b, branch in enumerate(spec):
        rng, sub = jax.random.split(rng)
        branch_params = {}
        c = cin
        for name, k, cout, stride in branch:
            if name.startswith("pool_"):
                continue
            sub, layer_rng = jax.random.split(sub)
            branch_params[name] = _conv_params(layer_rng, k, k, c, cout)
            c = cout
        out["Branch_%d" % b] = branch_params
        total += c
    return out, total


def init_first_stage_params(rng):
    """InceptionV2 stem + Mixed_3b..Mixed_4e (576ch, stride 16)."""
    params = {}
    rng, r = jax.random.split(rng)
    params["Conv2d_1a_7x7"] = _sep_conv_params(r, 7, 7, 3, 8, 64)
    rng, r = jax.random.split(rng)
    params["Conv2d_2b_1x1"] = _conv_params(r, 1, 1, 64, 64)
    rng, r = jax.random.split(rng)
    params["Conv2d_2c_3x3"] = _conv_params(r, 3, 3, 64, 192)
    cin = 192
    for name in ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
                 "Mixed_4d", "Mixed_4e"]:
        rng, r = jax.random.split(rng)
        params[name], cin = _block_params(r, _BLOCKS_FIRST[name], cin)
    assert cin == FIRST_STAGE_DEPTH, cin
    return {"InceptionV2": params}


def init_second_stage_params(rng):
    """Mixed_5a..Mixed_5c (1024ch) for the per-ROI box classifier."""
    params = {}
    cin = FIRST_STAGE_DEPTH
    for name in ["Mixed_5a", "Mixed_5b", "Mixed_5c"]:
        rng, r = jax.random.split(rng)
        params[name], cin = _block_params(r, _BLOCKS_SECOND[name], cin)
    assert cin == SECOND_STAGE_DEPTH, cin
    return {"InceptionV2": params}


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def preprocess(images):
    """Maps [0,255] pixels to [-1,1] (faster_rcnn inception preprocess)."""
    return (2.0 / 255.0) * images - 1.0


def _conv(x, w, stride, compute_dtype):
    # Activations and weights in compute_dtype (bf16 on TPU; the MXU
    # accumulates in fp32 internally); BN runs in fp32 and casts back.
    if x.shape[-1] > w.shape[2]:
        # The activation carries lane-padding channels (see _pad_cout):
        # zero-weight rows make the extra channels contribute nothing.
        # Restricted to the one deliberate case — a sub-128 conv input
        # lane-padded up to exactly 128 — so a genuine channel-wiring
        # mismatch still fails instead of silently ignoring channels.
        if x.shape[-1] != 128 or w.shape[2] >= 128:
            raise ValueError(
                "conv input width %d != weight input channels %d (only "
                "the 128-lane padding of <128ch stem activations is "
                "allowed)" % (x.shape[-1], w.shape[2])
            )
        w = jnp.pad(w, ((0, 0), (0, 0), (0, x.shape[-1] - w.shape[2]), (0, 0)))
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fold_bn(w, bn):
    """Folds frozen-statistics BN into the conv: returns (w', bias') with
    conv(x, w') + bias' == BN(conv(x, w)). Exact for inference-mode BN
    (all shipped configs: batch_norm_trainable false); beta stays a live
    parameter — gradients flow through the fold. Saves a full elementwise
    pass over every conv activation.
    """
    inv = jax.lax.rsqrt(bn["moving_variance"] + BN_EPSILON)
    w_folded = w * inv  # broadcast over the trailing cout axis
    bias = bn["beta"] - bn["moving_mean"] * inv
    return w_folded, bias


def _conv_bn(params, x, stride, compute_dtype, pad_out_to=None):
    w, bn = params["weights"], params["BatchNorm"]
    if pad_out_to:
        w, bn = _pad_cout(w, bn, pad_out_to)
    w, bias = _fold_bn(w, bn)
    out = _conv(x, w, stride, compute_dtype)
    return jax.nn.relu(out + bias.astype(out.dtype))


def _pad_cout(w, bn, target):
    """Zero-pads a conv's output channels (and its BN vectors) to `target`.

    Numerically exact: padded channels produce conv output 0, BN maps it
    to (0 - 0) * rsqrt(1 + eps) + 0 = 0, and ReLU keeps 0 — so downstream
    consumers (whose weights are input-zero-padded in `_conv`) see pure
    zeros. Used to lift the stem's 64-channel stretch to the TPU's
    128-lane width: a 64-wide last axis occupies half-empty (8,128) tiles
    in memory ANYWAY, so this costs no bytes and doubles VPU/MXU lane
    utilization (BENCH_NOTES.md round-3: the stem maxpool was 18x off
    speed-of-light at 64 lanes).
    """
    cout = w.shape[-1]
    if cout >= target:
        return w, bn
    pad = target - cout
    w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, pad)])
    bn = {
        "beta": jnp.pad(bn["beta"], (0, pad)),
        "moving_mean": jnp.pad(bn["moving_mean"], (0, pad)),
        "moving_variance": jnp.pad(
            bn["moving_variance"], (0, pad), constant_values=1.0
        ),
    }
    return w, bn


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with (di, dj, c) phase packing.

    The packing the s2d stem conv expects. H and W must be even. Works
    on jnp and numpy arrays alike (the HOST pipeline packs pixel
    canvases with the numpy twin in cap2det.device_batch — shipping the
    packed layout avoids the ~5 ms on-device transpose that made the
    device-side s2d formulation a net loss, BENCH_NOTES.md round 3).
    """
    b, h, w_dim, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w_dim // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w_dim // 2, 4 * c)
    )


def _s2d_axis(k):
    """(lead_zero_taps, kernel_blocks, block_pad_lo) for one axis of a
    SAME/stride-2 conv on an even extent.

    SAME/stride-2 on even extent pads (k-2)//2 pixels before the
    first tap; output o reads pixel rows 2o - pad_px + u. Prepending
    `lead = pad_px % 2` zero taps makes the first tap block-aligned:
    tap u' = u + lead reads row 2(o - (pad_px + lead)/2) + (u' % 2).
    """
    pad_px = max(k - 2, 0) // 2
    lead = pad_px % 2
    kb = (k + lead + 1) // 2
    return lead, kb, (pad_px + lead) // 2


def _s2d_pack_weights(w):
    """Rewrites a stride-2 KxK conv weight for the space-to-depth input.

    Returns (w_s2d [kh2, kw2, 4*cin, cout], ((pad_t, pad_b), (pad_l,
    pad_r))) such that a stride-1 conv of the packed input with w_s2d and
    that explicit padding equals the stride-2 SAME conv of the raw input
    (exact reformulation — the standard TPU trick for the RGB stem,
    where cin=3 leaves the MXU's contraction dimension 127/128 empty;
    s2d packs 12 channels and quarters the positions).
    """
    kh, kw, cin, cout = w.shape
    lead_h, kh2, pad_t = _s2d_axis(kh)
    lead_w, kw2, pad_l = _s2d_axis(kw)
    w8 = jnp.pad(
        w,
        (
            (lead_h, 2 * kh2 - kh - lead_h),
            (lead_w, 2 * kw2 - kw - lead_w),
            (0, 0),
            (0, 0),
        ),
    )
    # Tap (2*bi + di) -> phase channel di; matches space_to_depth's
    # (di, dj, c) packing.
    w_s2d = (
        w8.reshape(kh2, 2, kw2, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(kh2, kw2, 4 * cin, cout)
    )
    return w_s2d, ((pad_t, kh2 - 1 - pad_t), (pad_l, kw2 - 1 - pad_l))


def _space_to_depth_conv(x, w, stride, compute_dtype):
    """Stride-2 KxK conv via on-device s2d packing (exact reformulation).

    Kept as the reference implementation/golden for `_s2d_pack_weights`;
    the production path packs on the HOST (space_to_depth in
    device_batch) and feeds `_sep_conv_bn` the packed canvas directly.
    """
    assert stride == 2, stride
    w_s2d, padding = _s2d_pack_weights(w.astype(compute_dtype))
    x2 = space_to_depth(x.astype(compute_dtype))
    return jax.lax.conv_general_dilated(
        x2,
        w_s2d,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _sep_conv_bn(params, x, stride, compute_dtype, pad_out_to=None):
    dw = params["depthwise_weights"].astype(compute_dtype)
    kh, kw, cin, mult = dw.shape
    pw = params["pointwise_weights"].astype(compute_dtype)
    cout = pw.shape[-1]
    if cin <= 8:
        # Stem case (cin=3): compose depthwise o pointwise into one dense
        # conv — mathematically exact since the pointwise is 1x1:
        # W[u,v,c,o] = sum_m dw[u,v,c,m] * pw[c*mult+m, o]. A grouped conv
        # over 3 single-channel groups is MXU-hostile; the dense form runs
        # as one well-shaped matmul (trace-time compose, 9k params).
        w_dense = jnp.einsum(
            "uvcm,cmo->uvco", dw, pw.reshape(cin, mult, cout)
        )
        bn = params["BatchNorm"]
        if pad_out_to:
            w_dense, bn = _pad_cout(w_dense, bn, pad_out_to)
        w_dense, bias = _fold_bn(w_dense, bn)
        if x.shape[-1] == 4 * cin:
            # HOST-packed space-to-depth canvas ([B, H/2, W/2, 4*cin],
            # space_to_depth packing): run the exact stride-1 regrouped
            # conv. The regrouped conv alone is 2.2x faster (1.06 vs
            # 2.35 ms at bench shapes); packing on device was a net loss
            # (~5 ms XLA transpose, BENCH_NOTES.md round 3) — packing in
            # the host pipeline sidesteps that entirely.
            assert stride == 2, stride
            w_s2d, padding = _s2d_pack_weights(w_dense.astype(compute_dtype))
            out = jax.lax.conv_general_dilated(
                x.astype(compute_dtype),
                w_s2d,
                window_strides=(1, 1),
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jax.nn.relu(out + bias.astype(out.dtype))
        out = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            w_dense.astype(compute_dtype),
            window_strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(out + bias.astype(out.dtype))
    # Grouped-conv output channels are blocked per input channel
    # (c * mult + m) — TF depthwise ordering; the plain reshape keeps it.
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        dw.reshape(kh, kw, 1, cin * mult),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin,
    )
    pw_folded, bias = _fold_bn(
        params["pointwise_weights"], params["BatchNorm"]
    )
    out = jax.lax.conv_general_dilated(
        out,
        pw_folded.astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + bias.astype(out.dtype))


def _same_pads(size, kernel, stride):
    out = -(-size // stride)
    pad_total = max((out - 1) * stride + kernel - size, 0)
    return out, pad_total // 2, pad_total - pad_total // 2


def _pool_slices(x, kind, kernel, stride):
    """SAME-padded pooling via shifted strided slices.

    Differentiable everywhere — used as the custom backward for `_pool`
    (lax.reduce_window lacks a linearization rule under jit on this
    platform, and the slice formulation's forward is 4-10x slower than
    reduce_window at stem shapes, tools/bench_backbone_parts.py). TF
    avg-pool SAME semantics: padding excluded from the divisor.
    """
    b, h, w, c = x.shape
    out_h, pad_t, pad_b = _same_pads(h, kernel, stride)
    out_w, pad_l, pad_r = _same_pads(w, kernel, stride)
    if kind == "pool_max":
        fill = jnp.asarray(-jnp.inf, x.dtype)
    else:
        fill = jnp.asarray(0.0, x.dtype)
    xp = jnp.pad(
        x,
        ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        constant_values=fill,
    )
    acc = None
    for i in range(kernel):
        for j in range(kernel):
            view = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (b, i + (out_h - 1) * stride + 1, j + (out_w - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            if acc is None:
                acc = view
            elif kind == "pool_max":
                acc = jnp.maximum(acc, view)
            else:
                acc = acc + view
    if kind == "pool_max":
        return acc
    ones = jnp.ones((1, h, w, 1), x.dtype)
    ones = jnp.pad(ones, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
    counts = None
    for i in range(kernel):
        for j in range(kernel):
            view = jax.lax.slice(
                ones,
                (0, i, j, 0),
                (1, i + (out_h - 1) * stride + 1, j + (out_w - 1) * stride + 1, 1),
                (1, stride, stride, 1),
            )
            counts = view if counts is None else counts + view
    return acc / counts


# Below this spatial extent (h*w) the avg-pool BACKWARD keeps the slice
# VJP (see _pool_p_bwd). The forward stays reduce_window at EVERY shape:
# isolated probes showed slices 3-15x faster at [2000, 7x7/4x4, C]
# second-stage shapes, but in-situ the step REGRESSED 42->51 ms — XLA
# materializes each of the 9 shifted strided slices as its own copy
# inside the big program (the same reversal as the shifted-conv negative,
# r4 item 4), while the isolated jit had fused them. BENCH_NOTES.md r4.
_SMALL_SPATIAL = 256


def _pool_fast(x, kind, kernel, stride):
    """SAME-padded pooling via lax.reduce_window (fast TPU forward).

    At many-ROI small-spatial shapes (see _fused_pool_default) the
    Pallas VMEM pool kernel (kernels/pool_grad.pool_fwd) is the default
    instead; CAP2DET_POOL_FWD=fused|rw forces a form."""
    v = os.environ.get("CAP2DET_POOL_FWD")
    use_fused = (v == "fused") if v else _fused_pool_default(x.shape)
    if use_fused and jax.default_backend() == "tpu":
        from cap2det_tpu.kernels import pool_grad

        if pool_grad.supported(x.shape, kernel, stride):
            return pool_grad.pool_fwd(x, kind, kernel, stride)
    if v == "rw2" or (v is None and _separable_rw_default(x.shape)):
        # Separable SAME pool: a KxK window is two 1-D reduce_windows
        # (rows then cols) — exact for max, and for avg the rectangular
        # counts factor as counts_h*counts_w. Halves the per-element
        # window work at the stem's large spatial extents.
        if kind == "pool_max":
            r = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, kernel, 1, 1),
                (1, stride, 1, 1), "SAME"
            )
            return jax.lax.reduce_window(
                r, -jnp.inf, jax.lax.max, (1, 1, kernel, 1),
                (1, 1, stride, 1), "SAME"
            )
        s1 = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, kernel, 1, 1), (1, stride, 1, 1),
            "SAME"
        )
        sums = jax.lax.reduce_window(
            s1, 0.0, jax.lax.add, (1, 1, kernel, 1), (1, 1, stride, 1),
            "SAME"
        )
        ch = jax.lax.reduce_window(
            jnp.ones((1, x.shape[1], 1, 1), x.dtype), 0.0, jax.lax.add,
            (1, kernel, 1, 1), (1, stride, 1, 1), "SAME",
        )
        cw = jax.lax.reduce_window(
            jnp.ones((1, 1, x.shape[2], 1), x.dtype), 0.0, jax.lax.add,
            (1, 1, kernel, 1), (1, 1, stride, 1), "SAME",
        )
        return sums * (1.0 / (ch * cw))
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    if kind == "pool_max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, dims, strides, "SAME"
        )
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, strides, "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None],
        0.0, jax.lax.add, dims, strides, "SAME",
    )
    # Multiply by the (constant-folded) reciprocal: VPU division is a
    # multi-pass op and the count plane is a compile-time constant.
    return sums * (1.0 / counts)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pool_p(x, kind, kernel, stride):
    return _pool_fast(x, kind, kernel, stride)


def _pool_p_fwd(x, kind, kernel, stride):
    return _pool_p(x, kind, kernel, stride), x


def _separable_rw_default(shape):
    """Separable 1-D reduce_windows by default only at large spatial
    extents (the stem pools), pending the measured gate; placeholder
    FALSE until the step A/B lands (CAP2DET_POOL_FWD=rw2 forces it)."""
    return False


def _fused_pool_default(shape):
    """Shape heuristic for routing pools through the Pallas VMEM kernels
    (kernels/pool_grad.py) instead of XLA forms: ONLY at many-ROI
    small-spatial shapes. Measured step-level A/B (BENCH_NOTES.md r4):
    at voc07_inc2 shapes ([2000, 7x7/4x4, C]) fused fwd+bwd pools take
    the step 40.0 -> 34.4 ms, while at bench shapes ([1000, ...]) the
    same routing REGRESSES 39.7 -> 41.5 (and fused-fwd-alone to 58:
    the pool custom call un-fuses the slice-VJP's forward replay). The
    XLA lowering lottery flips between N=1000 and N=2000; both sides
    are pinned by measurement, overridable via CAP2DET_POOL_FWD /
    CAP2DET_POOL_GRAD."""
    n, h, w = shape[0], shape[1], shape[2]
    return h * w <= _SMALL_SPATIAL and n >= _FUSED_POOL_MIN_ROWS


_FUSED_POOL_MIN_ROWS = 1536


def _pool_p_bwd(kind, kernel, stride, x, g):
    # Default at bench-like shapes: "slices", the VJP of the shifted-
    # slice chain — fastest in composite (second_stage fwd+bwd 11.6 ms
    # vs 14.7 fused, 24.2 XLA-first-tie: the slice ops fuse into the
    # neighboring conv backwards while a custom call is a fusion
    # barrier). At many-ROI shapes (_fused_pool_default) the fused
    # first-tie kernel wins at the STEP level instead (inc2 40.0 ->
    # 34.4 ms with fused fwd+bwd) and is the default there; it also
    # carries TF MaxPoolGrad tie semantics (first maximal element takes
    # the whole gradient; the slice chain splits ties unevenly).
    # CAP2DET_POOL_GRAD=slices|fused|ref forces a form.
    from cap2det_tpu.kernels import pool_grad

    variant = os.environ.get("CAP2DET_POOL_GRAD")
    if variant is None:
        variant = "fused" if _fused_pool_default(x.shape) else "slices"
    if kind == "pool_max" and variant != "slices":
        if (variant == "fused" and jax.default_backend() == "tpu"
                and pool_grad.supported(x.shape, kernel, stride)):
            return (pool_grad.maxpool_grad(x, g, kernel, stride),)
        return (pool_grad.maxpool_grad_reference(x, g, kernel, stride),)
    if (kind == "pool_avg"
            and (variant == "fused"
                 or os.environ.get("CAP2DET_AVG_BWD") == "fused")
            and jax.default_backend() == "tpu"
            and pool_grad.supported(x.shape, kernel, stride)):
        # Unlike the max kernel, avgpool_grad is linear in g and reads
        # NO forward values, so it carries no fusion-barrier risk of
        # un-fusing a forward replay; CAP2DET_AVG_BWD=fused selects it
        # independently of the max-pool variant for step-level A/Bs.
        return (pool_grad.avgpool_grad(x.shape, x.dtype, g, kernel,
                                       stride),)
    if (kind == "pool_avg" and stride == 1 and kernel % 2 == 1
            and x.shape[1] * x.shape[2] > _SMALL_SPATIAL
            and os.environ.get("CAP2DET_AVG_BWD", "rw") == "rw"):
        # Exact transpose of the stride-1 SAME avg pool as ONE fused op:
        # dx[i] = sum_{windows o containing i} g[o] / count[o], and for
        # stride 1 with symmetric (odd-kernel) padding the containing
        # windows are themselves a SAME reduce-window around i. The
        # slice-VJP form this replaces lowered to k^2 pad+add+divide
        # fusions (~3 ms/step profiled at bench shapes, BENCH_NOTES r4).
        # Shape-gated like the forward: at second-stage spatial extents
        # reduce_window itself is the pathology (its 2.7 ms at inc2
        # outweighed the fused-chain saving — r4 item 18/20), so small
        # shapes take the slice VJP below.
        h, w = x.shape[1:3]
        ones = jnp.ones((1, h, w, 1), jnp.float32)
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, 1, 1, 1),
            "SAME",
        )
        gt = g.astype(jnp.float32) / counts
        dx = jax.lax.reduce_window(
            gt, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, 1, 1, 1),
            "SAME",
        )
        return (dx.astype(x.dtype),)
    _, vjp = jax.vjp(lambda x: _pool_slices(x, kind, kernel, stride), x)
    return (vjp(g)[0],)


_pool_p.defvjp(_pool_p_fwd, _pool_p_bwd)


def _pool(x, kind, kernel, stride):
    """SAME-padded pool: reduce_window forward, slice-formulation backward
    (reduce_window has no linearization rule on this platform; the frozen
    first stage never differentiates its pools, so backward only runs for
    the small second-stage maxpools)."""
    return _pool_p(x, kind, kernel, stride)


def _block(params, spec, x, compute_dtype):
    """Inception block with the leading 1x1 convs of all branches merged
    into one conv (they share the input, so concatenating their output
    channels is numerically exact) — fewer, fatter MXU matmuls instead of
    several thin ones with lane-padding waste."""
    mergeable = [
        b for b, branch in enumerate(spec)
        if branch[0][1] == 1 and branch[0][3] == 1
        and not branch[0][0].startswith("pool_")
    ]
    merged_out = {}
    if len(mergeable) >= 2:
        weights, betas, means, variances, couts = [], [], [], [], []
        for b in mergeable:
            name = spec[b][0][0]
            p = params["Branch_%d" % b][name]
            weights.append(p["weights"])
            betas.append(p["BatchNorm"]["beta"])
            means.append(p["BatchNorm"]["moving_mean"])
            variances.append(p["BatchNorm"]["moving_variance"])
            couts.append(p["weights"].shape[-1])
        w_cat, bias = _fold_bn(
            jnp.concatenate(weights, axis=-1),
            {
                "beta": jnp.concatenate(betas),
                "moving_mean": jnp.concatenate(means),
                "moving_variance": jnp.concatenate(variances),
            },
        )
        out = _conv(x, w_cat, 1, compute_dtype)
        fused = jax.nn.relu(out + bias.astype(out.dtype))
        offset = 0
        for b, cout in zip(mergeable, couts):
            merged_out[b] = fused[..., offset:offset + cout]
            offset += cout

    outputs = []
    for b, branch in enumerate(spec):
        bp = params["Branch_%d" % b]
        if b in merged_out:
            h = merged_out[b]
            rest = branch[1:]
        else:
            h = x
            rest = branch
        for name, k, cout, stride in rest:
            if name.startswith("pool_"):
                h = _pool(h, name, k, stride)
            else:
                h = _conv_bn(bp[name], h, stride, compute_dtype)
        outputs.append(h)
    return jnp.concatenate(outputs, axis=-1)


def first_stage(params, images, compute_dtype=jnp.bfloat16):
    """Image -> Mixed_4e features [B, H/16, W/16, 576].

    `images` is the preprocessed canvas, either raw [B, H, W, 3] or
    HOST-packed space-to-depth [B, H/2, W/2, 12] (space_to_depth
    packing; the production training layout — see device_batch). The
    stem conv handles both; everything downstream is identical.

    The 64-channel stem stretch runs lane-padded to 128 (exactly-zero
    extra channels, see _pad_cout): a 64-wide channel axis occupies
    half-empty (8,128) tiles anyway, and the padded form doubled the
    measured stem maxpool/conv throughput (BENCH_NOTES.md round 3).
    Mixed_3b's leading convs absorb the padding via zero weight rows.
    """
    p = params["InceptionV2"]
    x = _sep_conv_bn(p["Conv2d_1a_7x7"], images, 2, compute_dtype,
                     pad_out_to=128)
    x = _pool(x, "pool_max", 3, 2)
    x = _conv_bn(p["Conv2d_2b_1x1"], x, 1, compute_dtype, pad_out_to=128)
    x = _conv_bn(p["Conv2d_2c_3x3"], x, 1, compute_dtype)
    x = _pool(x, "pool_max", 3, 2)
    for name in ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
                 "Mixed_4d", "Mixed_4e"]:
        x = _block(p[name], _BLOCKS_FIRST[name], x, compute_dtype)
    return x


def second_stage(params, rois, compute_dtype=jnp.bfloat16):
    """ROI features [N,S,S,576] -> Mixed_5c features [N,S',S',1024].

    CAP2DET_SECOND_STAGE_REMAT=1 wraps each Mixed_5 block in
    jax.checkpoint: branch intermediates are recomputed in the backward
    instead of saved (trades ~1 extra block forward for the saved
    residuals' HBM round-trip + layout churn — the r4 attribution put
    the second-stage backward at 4.5x its forward).
    """
    block = _block
    if os.environ.get("CAP2DET_SECOND_STAGE_REMAT") == "1":
        def block(p, spec, x, dt):
            return jax.checkpoint(
                lambda pp, xx: _block(pp, spec, xx, dt)
            )(p, x)
    x = rois
    p = params["InceptionV2"]
    for name in ["Mixed_5a", "Mixed_5b", "Mixed_5c"]:
        x = block(p[name], _BLOCKS_SECOND[name], x, compute_dtype)
    return x
