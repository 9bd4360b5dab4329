"""Pallas fused ROI crop+pool kernel vs the XLA reference implementation
(interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.kernels import roi_pool
from cap2det_tpu.ops import roi as roi_ops


def _random_case(seed, batch=2, num_p=6, h=12, w=16, c=8):
    rng = np.random.RandomState(seed)
    features = rng.randn(batch, h, w, c).astype(np.float32)
    y0 = rng.uniform(-0.1, 0.7, (batch, num_p))
    x0 = rng.uniform(-0.1, 0.7, (batch, num_p))
    boxes = np.stack(
        [y0, x0, y0 + rng.uniform(0.1, 0.5, (batch, num_p)),
         x0 + rng.uniform(0.1, 0.5, (batch, num_p))], -1
    ).astype(np.float32)
    return features, boxes


@pytest.mark.parametrize("crop_size", [4, 6])
def test_forward_matches_xla(crop_size):
    features, boxes = _random_case(0)
    ours = np.asarray(
        roi_pool.roi_crop_maxpool(
            features, boxes, crop_size, 2, 2, interpret=True
        )
    )
    ref = np.asarray(
        roi_ops.crop_resize_maxpool(features, boxes, crop_size, 2, 2)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["ymm", "mm"])
def test_forward_alt_impls_match_xla(impl):
    """The recorded-negative matmul forward variants (BENCH_NOTES.md r3
    item 2, r4 item 14) stay selectable and correct."""
    features, boxes = _random_case(4, num_p=9)
    ours = np.asarray(
        roi_pool.roi_crop_maxpool(
            features, boxes, 6, 2, 2, interpret=True, impl=impl
        )
    )
    ref = np.asarray(
        roi_ops.crop_resize_maxpool(features, boxes, 6, 2, 2)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("adj", ["1", "full"])
def test_forward_adjacent_pair_reads_match_xla(monkeypatch, adj):
    """CAP2DET_ROI_ADJ folds the pooled pair's two 2-row reads into one
    3-row read where the windows overlap ('1': everywhere, 'full': only
    the full-width fallback branch — BENCH_NOTES r4 item 29). Must stay
    bit-compatible with the reference, including wide boxes (which take
    the full-width branch) and right-edge taps (the dynamic_slice clamp
    guard)."""
    features, boxes = _random_case(2, num_p=8, h=16, w=48, c=8)
    wide = np.array(
        [[[0.0, 0.0, 1.0, 1.0], [0.1, 0.05, 0.9, 0.98],
          [0.2, 0.5, 0.8, 1.1], [0.0, 0.9, 1.0, 1.0]]], np.float32
    )
    boxes = np.concatenate([boxes[:, :4], np.tile(wide, (2, 1, 1))], axis=1)
    monkeypatch.setenv("CAP2DET_ROI_ADJ", adj)
    ours = np.asarray(
        roi_pool.roi_crop_maxpool(features, boxes, 6, 2, 2, interpret=True)
    )
    ref = np.asarray(
        roi_ops.crop_resize_maxpool(features, boxes, 6, 2, 2)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_forward_outside_boxes_zero():
    features, _ = _random_case(1)
    boxes = np.tile(
        np.array([[[-1.0, -1.0, -0.2, -0.2]]], np.float32), (2, 3, 1)
    )
    out = np.asarray(
        roi_pool.roi_crop_maxpool(features, boxes, 4, 2, 2, interpret=True)
    )
    np.testing.assert_allclose(out, 0.0)


def test_gradient_matches_xla():
    features, boxes = _random_case(2)
    g_target = np.random.RandomState(3).randn(2, 6, 3, 3, 8).astype(np.float32)

    def loss_pallas(f):
        out = roi_pool.roi_crop_maxpool(f, boxes, 6, 2, 2, interpret=True)
        return jnp.sum(out * g_target)

    def loss_xla(f):
        out = roi_ops.crop_resize_maxpool(f, boxes, 6, 2, 2)
        return jnp.sum(out * g_target)

    g1 = np.asarray(jax.grad(loss_pallas)(features))
    g2 = np.asarray(jax.grad(loss_xla)(features))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


def test_channel_blocking():
    features, boxes = _random_case(4, c=16)
    full = np.asarray(
        roi_pool.roi_crop_maxpool(
            features, boxes, 4, 2, 2, channel_block=16, interpret=True
        )
    )
    blocked = np.asarray(
        roi_pool.roi_crop_maxpool(
            features, boxes, 4, 2, 2, channel_block=8, interpret=True
        )
    )
    np.testing.assert_allclose(full, blocked, rtol=1e-6)


def test_bfloat16_features():
    features, boxes = _random_case(5)
    out = roi_pool.roi_crop_maxpool(
        features.astype(jnp.bfloat16), boxes, 4, 2, 2, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    ref = roi_ops.crop_resize_maxpool(
        features.astype(jnp.bfloat16).astype(np.float32), boxes, 4, 2, 2
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=2e-2, atol=2e-2
    )


def test_tied_windows_conserve_gradient_mass():
    """Fully-tied pool windows (constant features — the post-ReLU-zeros
    case) must not inflate the gradient: total mass equals the upstream
    mass, matching TF MaxPoolGrad's route-to-first-max semantics. (A
    `windows >= max` mask would multiply it by pool_kernel^2.)"""
    import jax
    import jax.numpy as jnp

    feat = np.zeros((1, 8, 8, 8), np.float32)
    boxes = np.array([[[0.0, 0.0, 1.0, 1.0]]], np.float32)

    g = jax.grad(
        lambda f: jnp.sum(
            roi_pool.roi_crop_maxpool(f, boxes, 4, 2, 2, interpret=True)
            .astype(jnp.float32)
        )
    )(feat)
    # 2x2 pooled output x 8 channels -> upstream mass 32.
    np.testing.assert_allclose(float(np.sum(np.asarray(g))), 32.0, atol=1e-4)


def test_window_tier_branch_matches_xla():
    """Exercises BOTH the narrow-window fast path and the full-width
    fallback (wide + reversed + degenerate boxes) on a feature map wide
    enough to enable the tier (W=48 -> window 24)."""
    from cap2det_tpu.kernels.roi_pool import _window_tier

    assert _window_tier(48) is not None
    rng = np.random.RandomState(7)
    feat = rng.normal(0, 1, (2, 40, 48, 8)).astype(np.float32)
    narrow = np.stack([
        rng.uniform(0, 0.5, (2, 6)), rng.uniform(0, 0.7, (2, 6)),
        rng.uniform(0.5, 1.0, (2, 6)), rng.uniform(0.7, 1.0, (2, 6)) * 0
    ], -1)
    narrow[..., 3] = narrow[..., 1] + rng.uniform(0.02, 0.15, (2, 6))
    wide = np.stack([
        rng.uniform(0, 0.3, (2, 4)), rng.uniform(0, 0.2, (2, 4)),
        rng.uniform(0.5, 1.0, (2, 4)), rng.uniform(0.8, 1.0, (2, 4))
    ], -1)
    reversed_box = np.array([[[0.8, 0.9, 0.2, 0.1]], [[0.5, 0.6, 0.5, 0.6]]])
    degenerate = np.zeros((2, 1, 4))
    boxes = np.concatenate(
        [narrow, wide, reversed_box, degenerate], axis=1
    ).astype(np.float32)

    out = roi_pool.roi_crop_maxpool(
        feat, boxes, 6, 2, 2, channel_block=8, interpret=True
    )
    ref = roi_ops.crop_resize_maxpool(feat, boxes, 6, 2, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    gk = jax.grad(
        lambda f: jnp.sum(
            roi_pool.roi_crop_maxpool(
                f, boxes, 6, 2, 2, channel_block=8, interpret=True
            ) ** 2
        )
    )(feat)
    gr = jax.grad(
        lambda f: jnp.sum(roi_ops.crop_resize_maxpool(f, boxes, 6, 2, 2) ** 2)
    )(feat)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-2)


def test_window_tier_invariants():
    """The narrow window must keep (width - win) a multiple of 8 (the
    aligned-start construction divides by it) and be strictly smaller
    than the full width when enabled."""
    from cap2det_tpu.kernels.roi_pool import _window_tier

    for width in range(2, 32):
        assert _window_tier(width) is None
    for width in range(32, 260):
        win = _window_tier(width)
        if win is None:
            continue
        assert 0 < win < width
        assert (width - win) % 8 == 0
        assert win >= 24


def test_estimate_flops_scales():
    """bench.py's Pallas FLOP accounting: positive, linear in proposals,
    and bwd strictly costlier than fwd."""
    from cap2det_tpu.kernels import roi_pool

    a = roi_pool.estimate_flops(2, 500, 64, 96, 576, 14)
    b = roi_pool.estimate_flops(2, 1000, 64, 96, 576, 14)
    assert a["fwd"] > 0 and a["bwd"] > a["fwd"]
    assert abs(b["fwd"] / a["fwd"] - 2.0) < 0.02  # linear in P (mod pad)
    assert abs(b["bwd"] / a["bwd"] - 2.0) < 0.02


@pytest.mark.parametrize("variant", ["cat", "catv", "catf", "catw"])
def test_cat_backward_matches_scatter(monkeypatch, variant):
    """The round-4 concatenated-matmul dF accumulations (catf = default
    with hierarchical routing, catw = its lane-merged form, cat / catv =
    recorded intermediate variants) must be numerically equivalent to
    the sparse 2-row scatter form they replaced (CAP2DET_ROI_BWD=scatter)
    — same first-tie routing, different summation order."""
    features, boxes = _random_case(7, num_p=11, h=20, w=24, c=16)
    g_target = np.random.RandomState(8).randn(2, 11, 3, 3, 16).astype(
        np.float32
    )

    def loss(f):
        out = roi_pool.roi_crop_maxpool(f, boxes, 6, 2, 2, interpret=True)
        return jnp.sum(out * g_target)

    monkeypatch.setenv("CAP2DET_ROI_BWD", variant)
    g_cat = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    monkeypatch.setenv("CAP2DET_ROI_BWD", "scatter")
    g_scatter = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    np.testing.assert_allclose(g_cat, g_scatter, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant,merge", [("catf", 2), ("catw", 2),
                                           ("catw", 3), ("catw", 4)])
def test_hier_backward_first_tie_on_quantized(monkeypatch, variant, merge):
    """catf/catw fold FIRST-TIE max routing into the recompute
    hierarchically (x winner then y winner). On tie-rich quantized
    features (many exact equals inside 2x2 windows) their gradient must
    match the flat taken-mask scan (scatter) exactly — including catw's
    lane-merged accumulation at merge factors that do and do not divide
    the feature width (w=24: merge 2/4 divide, 3 leaves a ragged tail)."""
    rs = np.random.RandomState(3)
    features = rs.randint(0, 3, size=(2, 20, 24, 16)).astype(np.float32)
    _, boxes = _random_case(7, num_p=11, h=20, w=24, c=16)
    g_target = rs.randn(2, 11, 3, 3, 16).astype(np.float32)

    def loss(f):
        out = roi_pool.roi_crop_maxpool(f, boxes, 6, 2, 2, interpret=True)
        return jnp.sum(out * g_target)

    monkeypatch.setenv("CAP2DET_ROI_BWD", variant)
    monkeypatch.setenv("CAP2DET_ROI_BWD_MERGE", str(merge))
    g_hier = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    monkeypatch.setenv("CAP2DET_ROI_BWD", "scatter")
    g_scatter = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    np.testing.assert_allclose(g_hier, g_scatter, rtol=1e-5, atol=1e-5)


def test_forward_bf16_tmp_close_to_f32(monkeypatch):
    """CAP2DET_ROI_TMP=bf16 stores the y-pass intermediate in bf16
    (recorded NEGATIVE on hardware, BENCH_NOTES r5 — kept opt-in). One
    bf16 rounding between the two lerps: outputs must stay within bf16
    ULP of the f32 path."""
    features, boxes = _random_case(5, num_p=8, h=16, w=24, c=16)
    ref = np.asarray(
        roi_pool.roi_crop_maxpool(features, boxes, 6, 2, 2, interpret=True)
    )
    monkeypatch.setenv("CAP2DET_ROI_TMP", "bf16")
    ours = np.asarray(
        roi_pool.roi_crop_maxpool(features, boxes, 6, 2, 2, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1.6e-2, atol=1e-2)


def test_backward_bf16_dtmp_close_to_f32(monkeypatch):
    """CAP2DET_ROI_BWD_PREC=bf16 rounds the catf backward's matmul
    OPERANDS to bf16 (f32 accumulate); tie routing stays f32-exact, so
    the gradient must match the f32 path to bf16 operand precision."""
    features, boxes = _random_case(6, num_p=9, h=16, w=24, c=16)
    g_target = np.random.RandomState(9).randn(2, 9, 3, 3, 16).astype(
        np.float32
    )

    def loss(f):
        out = roi_pool.roi_crop_maxpool(f, boxes, 6, 2, 2, interpret=True)
        return jnp.sum(out * g_target)

    monkeypatch.setenv("CAP2DET_ROI_BWD", "catf")
    g_ref = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    monkeypatch.setenv("CAP2DET_ROI_BWD_PREC", "bf16")
    g_bf16 = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_bf16, g_ref, rtol=2e-2, atol=2e-2 * scale)


def test_forward_precomp_coords_matches_xla(monkeypatch):
    """CAP2DET_ROI_COORDS=precomp moves the sampling-coordinate chain
    OUT of the kernel (XLA computes idx/frac/inside vectorized over P;
    the kernel reads them from SMEM). Same math, different compilation —
    FMA contraction differences make it near- but not bit-identical to
    the in-kernel scalar chain, so pin against the XLA reference."""
    features, boxes = _random_case(3, num_p=8, h=16, w=48, c=8)
    wide = np.array(
        [[[0.0, 0.0, 1.0, 1.0], [0.1, 0.05, 0.9, 0.98]]], np.float32
    )
    boxes = np.concatenate([boxes[:, :6], np.tile(wide, (2, 1, 1))], axis=1)
    monkeypatch.setenv("CAP2DET_ROI_COORDS", "precomp")
    ours = np.asarray(
        roi_pool.roi_crop_maxpool(features, boxes, 6, 2, 2, interpret=True)
    )
    ref = np.asarray(
        roi_ops.crop_resize_maxpool(features, boxes, 6, 2, 2)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_backward_precomp_coords_matches_scatter(monkeypatch):
    """CAP2DET_ROI_BWD_COORDS=precomp feeds the catf backward's
    recompute with the XLA-precomputed sampling coords. Gradient must
    match the flat taken-mask scan (scatter) within FMA-contraction
    tolerance."""
    features, boxes = _random_case(7, num_p=11, h=20, w=24, c=16)
    g_target = np.random.RandomState(8).randn(2, 11, 3, 3, 16).astype(
        np.float32
    )

    def loss(f):
        out = roi_pool.roi_crop_maxpool(f, boxes, 6, 2, 2, interpret=True)
        return jnp.sum(out * g_target)

    monkeypatch.setenv("CAP2DET_ROI_BWD", "catf")
    monkeypatch.setenv("CAP2DET_ROI_BWD_COORDS", "precomp")
    g_pre = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    monkeypatch.delenv("CAP2DET_ROI_BWD_COORDS")
    monkeypatch.setenv("CAP2DET_ROI_BWD", "scatter")
    g_scatter = np.asarray(jax.grad(loss)(jnp.asarray(features)))
    np.testing.assert_allclose(g_pre, g_scatter, rtol=1e-4, atol=1e-4)
