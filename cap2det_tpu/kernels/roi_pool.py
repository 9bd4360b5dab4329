"""Fused ROI crop_and_resize + max-pool as a Pallas TPU kernel.

The hot op of the model (reference models/utils.py:151-160): crop S x S
bilinear patches for B*P proposals from the stride-16 feature map, then
2x2 max-pool. The XLA einsum formulation (ops/roi.py) materializes a
[B, P, S, W, C] intermediate (~1.5 GB at paper scale) — pure HBM traffic.

This kernel exploits the 2-sparse structure of bilinear weights instead:
per sample row only two feature rows are touched, so the crop is a pair
of dynamic-sliced row lerps out of a VMEM-resident feature block.

  grid = (B, C/CB, P/group); the [H, W, CB] feature block's index map is
  constant in the proposal axis, so Pallas keeps it resident across all
  proposals of an image; per program the kernel computes each S x S crop
  in VMEM scratch and writes the pooled [group, S', S', CB] tile. The
  y-lerp runs over a static half-width x-window when the box is narrow
  (the common selective-search case; 8-aligned start via pl.multiple_of)
  with a full-width fallback branch — 1.55x on the forward at bench
  shapes. Alternative formulations measured and rejected are recorded in
  BENCH_NOTES.md (grouping alone, grouped interp-matrix matmuls =
  impl='mm', strip-matmul y-scatter, windowed-x scatter).

HBM traffic drops to one read of the feature map per image per C-block
plus the pooled outputs — speed-of-light for this op.

The backward kernel recomputes the crop (cheap), routes the pooled
gradient through the max mask, and accumulates dF in float32 across the
P grid axis (dF block index also constant in P: accumulate in VMEM,
write back once). The default accumulation ("cat", round 4) stages each
proposal's x-scattered gradient slab contiguously and lands the whole
group's dF contribution in one concatenated interp-matrix matmul — one
[H, W, CB] block RMW per 8 proposals instead of 8*S two-row RMWs
(19.2 -> 14.5 ms fwd+bwd at bench shapes; CAP2DET_ROI_BWD=scatter keeps
the sparse form for A/B). Proposal boxes receive no gradient — they are
data (the reference's proposals come straight from the reader).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_coords(start, end, crop_size, extent):
    """TF crop_and_resize sampling positions along one axis.

    Returns (floor index [S], lerp weight [S], in-bounds mask [S]) with the
    floor index clamped to [0, extent-2] so idx/idx+1 are always valid
    (weights absorb the boundary case).
    """
    h_max = extent - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (crop_size, 1), 0)[:, 0].astype(
        jnp.float32
    )
    if crop_size > 1:
        coords = start * h_max + i * (end - start) * h_max / (crop_size - 1)
    else:
        coords = jnp.full((crop_size,), (start + end) * 0.5 * h_max)
    # float32 mask: bool vector elements cannot be read as scalars in the
    # TPU lowering.
    inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
    idx = jnp.clip(jnp.floor(coords), 0, extent - 2).astype(jnp.int32)
    frac = (coords - idx.astype(jnp.float32)) * inside
    return idx, frac, inside


def _sample_coords_scalar(start, end, crop_size, extent):
    """`_sample_coords` with every per-tap value computed as a rank-0
    scalar (Python-unrolled) instead of elements of an [S] vector.

    The kernel's tap loops are statically unrolled, so each iteration
    needs idx/frac/mask as SCALARS — extracting them from a vector value
    forces a VPU->scalar-unit round trip per read, and the dynamic-slice
    start depending on the vector pipeline serializes every iteration
    (measured: the x-pass dynamic reads alone were 3.9 ms of the 9.3 ms
    inc2-shape forward, BENCH_NOTES r4). Computing the whole chain from
    the SMEM box scalars keeps it on the scalar core. Expression order
    matches `_sample_coords` exactly for bit-identical results.
    """
    h_max = extent - 1
    idxs, fracs, insides = [], [], []
    for i in range(crop_size):
        if crop_size > 1:
            c = start * h_max + float(i) * (end - start) * h_max / (
                crop_size - 1)
        else:
            c = (start + end) * 0.5 * h_max
        inside = jnp.where((c >= 0.0) & (c <= h_max), 1.0, 0.0)
        idx = jnp.clip(jnp.floor(c), 0, extent - 2).astype(jnp.int32)
        fracs.append((c - idx.astype(jnp.float32)) * inside)
        idxs.append(idx)
        insides.append(inside)
    return idxs, fracs, insides


def _coords(start, end, crop_size, extent):
    """Dispatch between vector and scalar-unrolled sampling
    (CAP2DET_ROI_COORDS=vector reverts; both are bit-identical — pinned
    by tests/test_roi_pool_kernel.py)."""
    if os.environ.get("CAP2DET_ROI_COORDS", "scalar") == "scalar":
        return _sample_coords_scalar(start, end, crop_size, extent)
    return _sample_coords(start, end, crop_size, extent)


def _window_tier(width):
    """Static narrow-path window size, or None when not worthwhile.

    The y-pass is the kernel's dominant cost and scales with the width it
    lerps over. Most selective-search boxes span well under half the
    canvas, so a ~half-width window (8-aligned relative to `width` for
    the sublane-slice constraint) covers them; wide boxes take the
    full-width fallback branch. Measured 1.55x on the forward at bench
    shapes (BENCH_NOTES.md round 3).
    """
    if width < 32:
        return None
    target = max(width // 2, 24)
    win = width - ((width - target) // 8) * 8
    return win if win < width else None


def _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, x0, win, width,
               crop_size):
    """Computes the S x S crop of one proposal into crop_ref.

    Static unroll: crop_size is small (14) and dynamic vector indexing
    does not lower on TPU; each iteration uses pl.ds with a traced start.
    tmp is laid out [W, S, CB] so the x-pass dynamic slice lands on dim 0
    (untiled); Mosaic requires sublane-dim dynamic slices to be 8-aligned,
    which interpolation offsets are not — except the narrow window's x0,
    which is constructed 8-aligned (pl.multiple_of).
    """
    y_idx, y_frac, y_in = ys
    x_idx, x_frac, x_in = xs
    full = win == width
    for i in range(crop_size):
        if full:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), :, :].astype(jnp.float32)
        else:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), pl.ds(x0, win), :].astype(
                jnp.float32
            )
        w = y_in[i]
        tmp_ref[0:win, i, :] = (
            rows[0] * ((1.0 - y_frac[i]) * w) + rows[1] * (y_frac[i] * w)
        ).astype(tmp_ref.dtype)
    for j in range(crop_size):
        start = x_idx[j] if full else x_idx[j] - x0
        cols = tmp_ref[pl.ds(start, 2), :, :].astype(jnp.float32)
        w = x_in[j]
        crop_ref[:, j, :] = (
            cols[0] * ((1.0 - x_frac[j]) * w) + cols[1] * (x_frac[j] * w)
        )


def _crop_pool_pass(feat_ref, tmp_ref, pool_ref, ys, xs, x0, win, width,
                    crop_size):
    """`_crop_pass` with the 2x2/s2 max-pool's X-REDUCTION folded into
    the x-pass: the two crop columns of each pooled output column are
    lerped back-to-back (both live in registers) and their elementwise
    max lands NATURALLY in pool_ref[q] ([ps, S, CB]: q on the untiled
    dim, crop rows on sublanes) — replacing 2 transposed [S, CB] stores
    into crop_ref (a 14-tile scatter each) with 1 natural store, and
    killing the [S,S,CB]->[ps,2,ps,2,CB] double tiled-dim reshape of the
    separate pool phase. The y-pair reduction happens once per proposal
    on pool_ref (a single sublane deinterleave) in `_fwd_kernel`.
    Bit-exact: max is associative/commutative, so pairing x then y
    equals the joint 2x2 window max. Only for pool 2x2/s2 with even
    crop_size (every shipped config); others keep the generic path."""
    y_idx, y_frac, y_in = ys
    x_idx, x_frac, x_in = xs
    full = win == width
    for i in range(crop_size):
        if full:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), :, :].astype(jnp.float32)
        else:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), pl.ds(x0, win), :].astype(
                jnp.float32
            )
        w = y_in[i]
        tmp_ref[0:win, i, :] = (
            rows[0] * ((1.0 - y_frac[i]) * w) + rows[1] * (y_frac[i] * w)
        ).astype(tmp_ref.dtype)
    # "1": adjacent-pair 3-row reads everywhere (item 29: wins wide-box
    # P2000, loses narrow); "full": only in the full-width fallback
    # branch — wide boxes take that branch, so this targets exactly the
    # regime where the fold pays. `full` is static at trace time.
    adj_env = os.environ.get("CAP2DET_ROI_ADJ", "0")
    adj = adj_env == "1" or (adj_env == "full" and full)
    for q in range(crop_size // 2):
        j0, j1 = 2 * q, 2 * q + 1
        s0 = x_idx[j0] if full else x_idx[j0] - x0
        s1 = x_idx[j1] if full else x_idx[j1] - x0
        w0, w1 = x_in[j0], x_in[j1]

        def _pair(c0a, c0b, c1a, c1b):
            v0 = c0a * ((1.0 - x_frac[j0]) * w0) + c0b * (x_frac[j0] * w0)
            v1 = c1a * ((1.0 - x_frac[j1]) * w1) + c1b * (x_frac[j1] * w1)
            pool_ref[q, :, :] = jnp.maximum(v0, v1)

        if adj:
            # The crop's x taps are evenly spaced, so the pooled pair's
            # two 2-row windows usually overlap: ONE 3-row dynamic read
            # covers both, replacing the second read with two scalar-
            # predicated selects. Measured MIXED (BENCH_NOTES r4 item
            # 29: -10% at P2000/wide but +12..18% at P500 and at
            # narrow-box P2000 — the per-q branch overhead beats the
            # saved read), so OFF by default; kept selectable.
            # s0 <= win-3 keeps the 3-row read in bounds (dynamic_slice
            # CLAMPS out-of-range starts, which would silently shift
            # the window at the right edge).
            near = (s1 <= s0 + 1) & (s0 <= win - 3)
            d0 = s1 == s0

            @pl.when(near)
            def _():
                c = tmp_ref[pl.ds(s0, 3), :, :].astype(jnp.float32)
                c1a = jnp.where(d0, c[0], c[1])
                c1b = jnp.where(d0, c[1], c[2])
                _pair(c[0], c[1], c1a, c1b)

            @pl.when(jnp.logical_not(near))
            def _():
                c0 = tmp_ref[pl.ds(s0, 2), :, :].astype(jnp.float32)
                c1 = tmp_ref[pl.ds(s1, 2), :, :].astype(jnp.float32)
                _pair(c0[0], c0[1], c1[0], c1[1])
        else:
            c0 = tmp_ref[pl.ds(s0, 2), :, :].astype(jnp.float32)
            c1 = tmp_ref[pl.ds(s1, 2), :, :].astype(jnp.float32)
            _pair(c0[0], c0[1], c1[0], c1[1])


def _narrow_window(x_idx, crop_size, width, window):
    """(x0 aligned start, narrow-path condition) for one proposal."""
    x_lo = jnp.minimum(x_idx[0], x_idx[crop_size - 1])
    x_hi = jnp.maximum(x_idx[0], x_idx[crop_size - 1])
    x0 = pl.multiple_of(
        jnp.minimum((x_lo // 8) * 8, width - window), 8
    )
    return x0, (x_hi + 2 - x0) <= window


def _read_coords_smem(cidx_ref, cval_ref, axis, g, crop_size):
    """(idxs, fracs, insides) scalar lists for one proposal from the
    precomputed-coords SMEM blocks (axis 0 = y, 1 = x).

    Layout puts the proposal axis second-to-last and a flat coord axis
    last (cidx [1, G, 2S]: y idxs then x idxs; cval [1, G, 4S]:
    y-frac, y-inside, x-frac, x-inside) so the group-blocked SMEM
    BlockSpec satisfies Mosaic's (8, full)-tiling rule — the original
    [.., S, G] layout with G-blocked last dim failed TPU lowering."""
    s = crop_size
    idxs = [cidx_ref[0, g, axis * s + i] for i in range(s)]
    fracs = [cval_ref[0, g, 2 * axis * s + i] for i in range(s)]
    insides = [cval_ref[0, g, (2 * axis + 1) * s + i] for i in range(s)]
    return idxs, fracs, insides


def _fwd_kernel(boxes_ref, *rest, crop_size, pool_kernel, pool_stride,
                group, window, precomp=False):
    if precomp:
        # CAP2DET_ROI_COORDS=precomp: idx/frac/inside arrive as SMEM
        # arrays computed OUTSIDE the kernel (vectorized over P by XLA)
        # — the per-proposal scalar-core coords chain becomes plain SMEM
        # loads, so the first dynamic-slice start no longer waits on a
        # serial scalar pipeline.
        cidx_ref, cval_ref, feat_ref, out_ref, crop_ref, tmp_ref, \
            pool_ref = rest
    else:
        feat_ref, out_ref, crop_ref, tmp_ref, pool_ref = rest
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    pooled_size = (crop_size - pool_kernel) // pool_stride + 1
    fold = (
        pool_kernel == 2 and pool_stride == 2 and crop_size % 2 == 0
        and os.environ.get("CAP2DET_ROI_FWD_POOL", "fold") == "fold"
    )
    for g in range(group):
        p = p_base + g
        if precomp:
            ys = _read_coords_smem(cidx_ref, cval_ref, 0, g, crop_size)
            xs = _read_coords_smem(cidx_ref, cval_ref, 1, g, crop_size)
        else:
            y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
            ys = _coords(y1, y2, crop_size, height)
            xs = _coords(x1, x2, crop_size, width)
        x_idx = xs[0]

        pass_fn = _crop_pool_pass if fold else _crop_pass
        dst = pool_ref if fold else crop_ref
        if window is None:
            pass_fn(feat_ref, tmp_ref, dst, ys, xs, None, width,
                    width, crop_size)
        else:
            x0, narrow = _narrow_window(x_idx, crop_size, width, window)

            @pl.when(narrow)
            def _():
                pass_fn(feat_ref, tmp_ref, dst, ys, xs, x0, window,
                        width, crop_size)

            @pl.when(jnp.logical_not(narrow))
            def _():
                pass_fn(feat_ref, tmp_ref, dst, ys, xs, None, width,
                        width, crop_size)

        if fold:
            m = pool_ref[...]  # [ps(x), S(y rows), CB], x already reduced
            red = jnp.max(
                m.reshape(pooled_size, pooled_size, pool_kernel, cb), axis=2
            )  # [ps(x), ps(y), CB]
            out_ref[0, g, :, :, :] = jnp.transpose(red, (1, 0, 2)).astype(
                out_ref.dtype
            )
        else:
            crop = crop_ref[...]
            windows = crop.reshape(
                pooled_size, pool_kernel, pooled_size, pool_kernel, cb
            )
            out_ref[0, g, :, :, :] = jnp.max(windows, axis=(1, 3)).astype(
                out_ref.dtype
            )


def _interp_matrix(start, end, crop_size, extent):
    """Dense [crop_size, extent] bilinear interpolation matrix.

    Row i holds the two-tap lerp weights of `_sample_coords` at positions
    idx[i] and idx[i]+1 — crop = W_y @ F @ W_x^T. Built with pure vector
    ops (iota + compares): no scalar reads of vectors, no dynamic slices.
    (A windowed variant with an offset/out_cols column remap was built
    for the rejected windowed-x backward — see BENCH_NOTES.md round 3.)
    """
    out_cols = extent
    h_max = extent - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (crop_size, out_cols), 0).astype(
        jnp.float32
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (crop_size, out_cols), 1).astype(
        jnp.float32
    )
    if crop_size > 1:
        coords = start * h_max + i * (end - start) * h_max / (crop_size - 1)
    else:
        coords = (start + end) * 0.5 * h_max + i * 0.0
    inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
    idx = jnp.clip(jnp.floor(coords), 0, extent - 2)
    frac = (coords - idx) * inside
    return inside * (
        (1.0 - frac) * (pos == idx).astype(jnp.float32)
        + frac * (pos == idx + 1).astype(jnp.float32)
    )


def _bwd_kernel(boxes_ref, feat_ref, grad_ref, dfeat_ref, crop_ref, tmp_ref,
                *, crop_size, pool_kernel, pool_stride, group, window):
    """Backward: interp-matrix matmul for the x-scatter, sparse rows for dF.

    Processes `group` proposals per program (see _fwd_kernel). The
    x-direction bilinear scatter is one small matmul landing directly
    in dtmp's [W, S, CB] layout with no transposes:
      dtmp[w, sy, c] = sum_j Wx[j, w] * dcrop[sy, j, c]
                     = dot_general(Wx, dcrop; contract Wx.0 with dcrop.1)
    which replaces a full dtmp zero + 14 dynamic-slice accumulations. The
    y-direction stays a sparse 2-row scatter: a dense Wy^T matmul would
    read-modify-write the whole [H, W, CB] dfeat block per proposal
    (measured no faster than the original all-scatter kernel).
    """
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    pooled_size = (crop_size - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    for gi in range(group):
        p = p_base + gi
        y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
        ys = _coords(y1, y2, crop_size, height)
        xs = _coords(x1, x2, crop_size, width)
        y_idx, y_frac, y_in = ys
        x_idx = xs[0]

        def _scatter(dcrop, x1=x1, x2=x2, y_idx=y_idx, y_frac=y_frac,
                     y_in=y_in):
            """Pushes dcrop back: one x-interp matmul, then a sparse
            2-row y-scatter. Always FULL width: a windowed x variant
            (pl.ds(x0, win) on dfeat's sublane dim) measured SLOWER —
            dynamic-offset sublane RMW writes cost more than the saved
            lanes. A y-interp matmul into a 32-row strip (or full H) with
            one strip RMW also measured SLOWER (fwdbwd 24.5 vs 19.4 ms) —
            third confirmation that dense y-matmuls lose to the sparse
            2-row scatter here. BENCH_NOTES.md round 3.
            """
            wx = _interp_matrix(x1, x2, crop_size, width)  # [S, W]
            dtmp = jax.lax.dot_general(
                wx, dcrop,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W, S, CB]
            for i in range(crop_size):
                w = y_in[i]
                row = dtmp[:, i, :]  # [W, CB]
                contrib = jnp.stack(
                    [row * ((1.0 - y_frac[i]) * w), row * (y_frac[i] * w)],
                    axis=0,
                )  # [2, W, CB]
                dfeat_ref[0, pl.ds(y_idx[i], 2), :, :] += contrib

        # Recompute the crop (same windowed branch as the forward).
        if window is None:
            _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, None, width,
                       width, crop_size)
        else:
            x0, narrow = _narrow_window(x_idx, crop_size, width, window)

            @pl.when(narrow)
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, x0, window,
                           width, crop_size)

            @pl.when(jnp.logical_not(narrow))
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, None, width,
                           width, crop_size)

        # Route pooled gradient to the FIRST max only (TF MaxPoolGrad
        # semantics). A plain `windows >= maxima` mask sends the full
        # gradient to every tied element — and ties are common (post-ReLU
        # zeros, degenerate boxes), inflating dF by up to pool_kernel^2.
        crop = crop_ref[...]
        windows = crop.reshape(
            pooled_size, pool_kernel, pooled_size, pool_kernel, cb
        )
        maxima = jnp.max(windows, axis=(1, 3))  # [ps, ps, cb]
        g = grad_ref[0, gi, :, :, :].astype(jnp.float32)
        taken = jnp.zeros_like(maxima, dtype=jnp.float32)
        pieces = {}
        for ky in range(pool_kernel):
            for kx in range(pool_kernel):
                hit = (
                    (windows[:, ky, :, kx, :] >= maxima).astype(jnp.float32)
                    * (1.0 - taken)
                )
                pieces[(ky, kx)] = g * hit
                taken = jnp.maximum(taken, hit)
        dwindows = jnp.stack(
            [
                jnp.stack(
                    [pieces[(ky, kx)] for kx in range(pool_kernel)], axis=2
                )
                for ky in range(pool_kernel)
            ],
            axis=1,
        )  # [ps, k, ps, k, cb]
        dcrop = dwindows.reshape(crop_size, crop_size, cb)

        _scatter(dcrop)


def _bwd_kernel_cat(boxes_ref, feat_ref, grad_ref, dfeat_ref, crop_ref,
                    tmp_ref, dtmp_ref, *, crop_size, pool_kernel, pool_stride,
                    group, window):
    """Hybrid backward: slice-windowed recompute, concatenated dF matmul.

    Same crop recompute + first-tie routing + per-proposal x-dot as
    `_bwd_kernel`, but instead of 2*S sparse row RMWs per proposal the
    per-proposal dtmp slabs are staged contiguously ([W, G*S, CB], plain
    stores) and the group's whole dF contribution lands in ONE matmul

      dF[h, w, c] += sum_gs Wy_cat[gs, h] * dtmp[w, gs, c]

    i.e. one [H, W*CB] block read-modify-write per `group` proposals
    (~3 MB) instead of group*S two-row RMWs (~22 MB) — the mm backward's
    accumulation scheme without the mm forward's slow matmul recompute.
    Never measured before round 4 (the r2/r3 dense-scatter negatives were
    per-proposal dense matmuls or the full-mm kernel; BENCH_NOTES.md).
    """
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    pooled_size = (s - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    wy_rows = []
    for gi in range(group):
        p = p_base + gi
        y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
        ys = _coords(y1, y2, s, height)
        xs = _coords(x1, x2, s, width)
        x_idx = xs[0]

        # Recompute the crop (same windowed branch as the forward).
        if window is None:
            _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, None, width,
                       width, s)
        else:
            x0, narrow = _narrow_window(x_idx, s, width, window)

            @pl.when(narrow)
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, x0, window,
                           width, s)

            @pl.when(jnp.logical_not(narrow))
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_ref, ys, xs, None, width,
                           width, s)

        # First-tie max routing (TF MaxPoolGrad semantics; see _bwd_kernel).
        crop = crop_ref[...]
        windows = crop.reshape(
            pooled_size, pool_kernel, pooled_size, pool_kernel, cb
        )
        maxima = jnp.max(windows, axis=(1, 3))
        g = grad_ref[0, gi, :, :, :].astype(jnp.float32)
        taken = jnp.zeros_like(maxima, dtype=jnp.float32)
        pieces = {}
        for ky in range(pool_kernel):
            for kx in range(pool_kernel):
                hit = (
                    (windows[:, ky, :, kx, :] >= maxima).astype(jnp.float32)
                    * (1.0 - taken)
                )
                pieces[(ky, kx)] = g * hit
                taken = jnp.maximum(taken, hit)
        dwindows = jnp.stack(
            [
                jnp.stack(
                    [pieces[(ky, kx)] for kx in range(pool_kernel)], axis=2
                )
                for ky in range(pool_kernel)
            ],
            axis=1,
        )
        dcrop = dwindows.reshape(s, s, cb)

        # x-interp dot, staged into this proposal's dtmp slab (no RMW).
        wx = _interp_matrix(x1, x2, s, width)  # [S, W]
        dtmp_ref[:, gi * s:(gi + 1) * s, :] = jax.lax.dot_general(
            wx, dcrop,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtmp_ref.dtype)  # [W, S, CB]
        wy_rows.append(_interp_matrix(y1, y2, s, height))

    wy_cat = jnp.concatenate(wy_rows, axis=0)  # [G*S, H]
    dfeat_ref[0] += jax.lax.dot_general(
        wy_cat, dtmp_ref[...],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W, CB]


def _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs, x0, win,
                    width, crop_size):
    """Backward fold recompute: the same y-pass + paired x-lerps as
    `_crop_pool_pass`, but capturing BOTH the pair maxima (mq) and the
    first-tie x winner mask (hx: column 2q takes ties) — everything the
    hierarchical routing needs, with no full crop materialized."""
    y_idx, y_frac, y_in = ys
    x_idx, x_frac, x_in = xs
    full = win == width
    for i in range(crop_size):
        if full:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), :, :].astype(jnp.float32)
        else:
            rows = feat_ref[0, pl.ds(y_idx[i], 2), pl.ds(x0, win), :].astype(
                jnp.float32
            )
        w = y_in[i]
        tmp_ref[0:win, i, :] = (
            rows[0] * ((1.0 - y_frac[i]) * w) + rows[1] * (y_frac[i] * w)
        ).astype(tmp_ref.dtype)
    for q in range(crop_size // 2):
        vals = []
        for j in (2 * q, 2 * q + 1):
            start = x_idx[j] if full else x_idx[j] - x0
            cols = tmp_ref[pl.ds(start, 2), :, :].astype(jnp.float32)
            w = x_in[j]
            vals.append(
                cols[0] * ((1.0 - x_frac[j]) * w) + cols[1] * (x_frac[j] * w)
            )
        mq_ref[q, :, :] = jnp.maximum(vals[0], vals[1])
        hx_ref[q, :, :] = (vals[0] >= vals[1]).astype(jnp.float32)


def _bwd_kernel_catf(boxes_ref, *rest, crop_size, pool_kernel,
                     pool_stride, group, window, interpret=False,
                     precomp=False):
    """`_bwd_kernel_cat` with HIERARCHICAL first-tie routing folded into
    the recompute (2x2/s2 pools only). Row-major first-tie decomposes
    exactly: the x winner within each row is the left column on ties
    (hx, captured during the paired x-lerps), and the y winner between
    the two row maxima is the upper row on ties (hy) — for window
    elements A,B,C,D in row-major order this picks the first maximal
    one, identical to the old taken-mask scan. Kills the full crop
    scratch, the [S,S,CB]->[ps,2,ps,2,CB] double tiled-dim reshape and
    the four taken-mask passes over tiny [ps,ps,CB] values; the dcropT
    it builds is consumed by the same x-dot with dim0/dim0 contraction
    (dtmp[w,i] = sum_j wx[j,w] dcT[j,i] — unchanged math) and the same
    concatenated dF matmul.

    CAP2DET_ROI_BWD_COORDS=precomp: the recompute's sampling coords
    arrive precomputed via SMEM (see `_precompute_coords`) instead of
    the per-proposal scalar-core chain."""
    if precomp:
        cidx_ref, cval_ref, feat_ref, grad_ref, dfeat_ref, tmp_ref, \
            mq_ref, hx_ref, dtmp_ref = rest
    else:
        feat_ref, grad_ref, dfeat_ref, tmp_ref, mq_ref, hx_ref, \
            dtmp_ref = rest
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    ps = (s - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    wy_rows = []
    for gi in range(group):
        p = p_base + gi
        y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
        if precomp:
            ys = _read_coords_smem(cidx_ref, cval_ref, 0, gi, s)
            xs = _read_coords_smem(cidx_ref, cval_ref, 1, gi, s)
        else:
            ys = _coords(y1, y2, s, height)
            xs = _coords(x1, x2, s, width)
        x_idx = xs[0]

        if window is None:
            _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs, None,
                            width, width, s)
        else:
            x0, narrow = _narrow_window(x_idx, s, width, window)

            @pl.when(narrow)
            def _():
                _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs,
                                x0, window, width, s)

            @pl.when(jnp.logical_not(narrow))
            def _():
                _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs,
                                None, width, width, s)

        m = mq_ref[...]  # [ps(x), S(y rows), CB]
        mp = m.reshape(ps, ps, pool_kernel, cb)
        hy = (mp[:, :, 0, :] >= mp[:, :, 1, :]).astype(jnp.float32)
        g = grad_ref[0, gi, :, :, :].astype(jnp.float32)  # [ps(y), ps(x), CB]
        gt = jnp.transpose(g, (1, 0, 2))  # [ps(x), ps(y), CB]
        dfull = jnp.stack([gt * hy, gt * (1.0 - hy)], axis=2).reshape(
            ps, s, cb
        )  # y-routed, rows interleaved back to S
        hx = hx_ref[...]  # [ps(x), S, CB]
        dct = jnp.stack([dfull * hx, dfull * (1.0 - hx)], axis=1).reshape(
            s, s, cb
        )  # [S_j, S_i, CB]

        wx = _interp_matrix(x1, x2, s, width)  # [S, W]
        # dtmp_ref's dtype (f32 default, bf16 under
        # CAP2DET_ROI_BWD_PREC=bf16) sets the MXU operand precision of
        # both catdots: bf16 operands are the MXU's native single-pass
        # input (f32 matmuls lower as multi-pass decompositions), with
        # accumulation kept f32 via preferred_element_type.
        op_t = dtmp_ref.dtype

        def _op(x):
            # Interpret mode (CPU) lacks bf16xbf16->f32 dots; bf16
            # products are exact in f32, so rounding the operands and
            # multiplying in f32 is value-identical to the MXU path.
            x = x.astype(op_t)
            return x.astype(jnp.float32) if interpret else x

        dtmp_ref[:, gi * s:(gi + 1) * s, :] = jax.lax.dot_general(
            _op(wx), _op(dct),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtmp_ref.dtype)  # [W, S, CB]
        wy_rows.append(_interp_matrix(y1, y2, s, height))

    wy_cat = jnp.concatenate(wy_rows, axis=0)  # [G*S, H]
    dfeat_ref[0] += jax.lax.dot_general(
        _op(wy_cat), _op(dtmp_ref[...]),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W, CB]


def _interp_matrix_strided(start, end, crop_size, extent, stride, offset,
                           out_cols):
    """`_interp_matrix` restricted to positions offset, offset+stride, ...

    Column t of the result holds the lerp weight of feature column
    ``offset + stride*t``; positions beyond ``extent-1`` get all-zero
    columns automatically (idx is clamped to extent-2, so the pos==idx
    and pos==idx+1 matches both fail). Used by the lane-merged backward
    (`_bwd_kernel_catw`) to build the even/odd (mod-`stride`) slices of
    Wx without a strided lane slice in the kernel.
    """
    h_max = extent - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (crop_size, out_cols), 0).astype(
        jnp.float32
    )
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (crop_size, out_cols), 1)
        * stride + offset
    ).astype(jnp.float32)
    if crop_size > 1:
        coords = start * h_max + i * (end - start) * h_max / (crop_size - 1)
    else:
        coords = (start + end) * 0.5 * h_max + i * 0.0
    inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
    idx = jnp.clip(jnp.floor(coords), 0, extent - 2)
    frac = (coords - idx) * inside
    return inside * (
        (1.0 - frac) * (pos == idx).astype(jnp.float32)
        + frac * (pos == idx + 1).astype(jnp.float32)
    )


def _bwd_kernel_catw(boxes_ref, feat_ref, grad_ref, dfeat_ref, tmp_ref,
                     mq_ref, hx_ref, dtmp_ref, dfacc_ref, *, crop_size,
                     pool_kernel, pool_stride, group, window, merge):
    """`_bwd_kernel_catf` with `merge` adjacent feature columns packed
    onto the lane axis of the dtmp slab and the dF accumulator.

    The catf concatenated dF matmul contracts the MIDDLE (sublane) dim of
    dtmp [W, G*S, CB], which Mosaic lowers as W independent [G*S, CB] x
    [G*S, H] matmuls — per-matmul issue overhead dominates (the op is far
    from FLOP-bound). Packing columns w = merge*t + o into lane block o
    of dtmp2 [ceil(W/m), G*S, m*CB] keeps the same contraction but with
    m-fold fewer, m-fold wider matmuls. The x-interp dot splits into m
    strided dots (same products, same f32 sums — bit-identical); the
    accumulator lives in the packed layout and is unpacked to [H, W, CB]
    once per grid column at the last proposal-program.
    """
    height, width, cb = feat_ref.shape[1:]
    w2 = dtmp_ref.shape[0]
    p_base = pl.program_id(2) * group
    s = crop_size
    ps = (s - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfacc_ref[...] = jnp.zeros_like(dfacc_ref)

    wy_rows = []
    for gi in range(group):
        p = p_base + gi
        y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
        ys = _coords(y1, y2, s, height)
        xs = _coords(x1, x2, s, width)
        x_idx = xs[0]

        if window is None:
            _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs, None,
                            width, width, s)
        else:
            x0, narrow = _narrow_window(x_idx, s, width, window)

            @pl.when(narrow)
            def _():
                _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs,
                                x0, window, width, s)

            @pl.when(jnp.logical_not(narrow))
            def _():
                _fold_recompute(feat_ref, tmp_ref, mq_ref, hx_ref, ys, xs,
                                None, width, width, s)

        # Hierarchical first-tie routing (identical to _bwd_kernel_catf).
        m = mq_ref[...]  # [ps(x), S(y rows), CB]
        mp = m.reshape(ps, ps, pool_kernel, cb)
        hy = (mp[:, :, 0, :] >= mp[:, :, 1, :]).astype(jnp.float32)
        g = grad_ref[0, gi, :, :, :].astype(jnp.float32)  # [ps(y), ps(x), CB]
        gt = jnp.transpose(g, (1, 0, 2))  # [ps(x), ps(y), CB]
        dfull = jnp.stack([gt * hy, gt * (1.0 - hy)], axis=2).reshape(
            ps, s, cb
        )
        hx = hx_ref[...]  # [ps(x), S, CB]
        dct = jnp.stack([dfull * hx, dfull * (1.0 - hx)], axis=1).reshape(
            s, s, cb
        )  # [S_j, S_i, CB]

        for o in range(merge):
            wxo = _interp_matrix_strided(
                x1, x2, s, width, merge, o, w2
            )  # [S_j, W2]
            dtmp_ref[:, gi * s:(gi + 1) * s, o * cb:(o + 1) * cb] = (
                jax.lax.dot_general(
                    wxo, dct,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtmp_ref.dtype)
            )  # [W2, S, CB]
        wy_rows.append(_interp_matrix(y1, y2, s, height))

    wy_cat = jnp.concatenate(wy_rows, axis=0)  # [G*S, H]
    dfacc_ref[...] += jax.lax.dot_general(
        wy_cat, dtmp_ref[...],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W2, m*CB]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        acc = dfacc_ref[...]
        unpacked = acc.reshape(height, w2, merge, cb).reshape(
            height, w2 * merge, cb
        )
        dfeat_ref[0] = unpacked[:, :width, :]


def _bwd_kernel_catv(boxes_ref, feat_ref, grad_ref, dfeat_ref, crop_cat_ref,
                     tmp_ref, dtmp_ref, *, crop_size, pool_kernel,
                     pool_stride, group, window):
    """Cat backward with GROUP-VECTORIZED max routing.

    `_bwd_kernel_cat` runs the first-tie routing per proposal — ~25
    vector ops on [7, 2, 7, 2, CB] tiles whose 7-row occupancy wastes
    most of each VPU op, repeated group times per program. Here the
    crop recompute stages every proposal's crop into one [G*S, S, CB]
    scratch (sub-ref views), the pooled-max routing runs ONCE on
    [G, ps, k, ps, k, CB] tensors (G*ps = 56 sublanes per op), and the
    x-dots + concatenated dF matmul proceed as in the cat variant.
    """
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    pooled_size = (s - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    wy_rows = []
    wxs = []
    for gi in range(group):
        p = p_base + gi
        y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
        ys = _coords(y1, y2, s, height)
        xs = _coords(x1, x2, s, width)
        x_idx = xs[0]
        crop_view = crop_cat_ref.at[pl.ds(gi * s, s)]

        if window is None:
            _crop_pass(feat_ref, tmp_ref, crop_view, ys, xs, None, width,
                       width, s)
        else:
            x0, narrow = _narrow_window(x_idx, s, width, window)

            @pl.when(narrow)
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_view, ys, xs, x0, window,
                           width, s)

            @pl.when(jnp.logical_not(narrow))
            def _():
                _crop_pass(feat_ref, tmp_ref, crop_view, ys, xs, None, width,
                           width, s)

        wy_rows.append(_interp_matrix(y1, y2, s, height))
        wxs.append(_interp_matrix(x1, x2, s, width))

    # One first-tie routing pass over the whole group (TF MaxPoolGrad
    # semantics; see _bwd_kernel).
    crop_all = crop_cat_ref[...].reshape(
        group, pooled_size, pool_kernel, pooled_size, pool_kernel, cb
    )
    maxima = jnp.max(crop_all, axis=(2, 4))  # [G, ps, ps, cb]
    g_all = grad_ref[0].astype(jnp.float32)  # [G, ps, ps, cb]
    taken = jnp.zeros_like(maxima, dtype=jnp.float32)
    pieces = {}
    for ky in range(pool_kernel):
        for kx in range(pool_kernel):
            hit = (
                (crop_all[:, :, ky, :, kx, :] >= maxima).astype(jnp.float32)
                * (1.0 - taken)
            )
            pieces[(ky, kx)] = g_all * hit
            taken = jnp.maximum(taken, hit)
    dwindows = jnp.stack(
        [
            jnp.stack(
                [pieces[(ky, kx)] for kx in range(pool_kernel)], axis=3
            )
            for ky in range(pool_kernel)
        ],
        axis=2,
    )  # [G, ps, k, ps, k, cb]
    dcrop_all = dwindows.reshape(group * s, s, cb)

    for gi in range(group):
        dtmp_ref[:, gi * s:(gi + 1) * s, :] = jax.lax.dot_general(
            wxs[gi], dcrop_all[gi * s:(gi + 1) * s],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtmp_ref.dtype)  # [W, S, CB]

    wy_cat = jnp.concatenate(wy_rows, axis=0)  # [G*S, H]
    dfeat_ref[0] += jax.lax.dot_general(
        wy_cat, dtmp_ref[...],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W, CB]


def _fwd_kernel_ymm(boxes_ref, feat_ref, out_ref, tmp_cat_ref, tmp_ref, *,
                    crop_size, pool_kernel, pool_stride, group):
    """Hybrid forward: concatenated y-interp MXU matmul + slice x-pass.

    The r4 "cat" backward showed the group-concatenated interp dot
    ([G*S, H] x [H, W*CB]) beats per-row VPU lerps when the scratch is
    f32 with plain stores; this forward applies the same trade to the
    y-pass — ONE dot computes all `group` proposals' y-interpolated rows
    — then transposes each proposal's slab to the [W, S, CB] layout and
    finishes with the 2-sparse dynamic-slice x-pass + max-pool of the
    slice kernel (the full-mm x-dot at M=S=14 wastes 8/9 of the MXU rows
    and lost in round 3; BENCH_NOTES.md).
    """
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    pooled_size = (s - pool_kernel) // pool_stride + 1

    coords = [
        tuple(boxes_ref[0, k, p_base + g] for k in range(4))
        for g in range(group)
    ]
    wy_cat = jnp.concatenate(
        [_interp_matrix(c[0], c[2], s, height) for c in coords], axis=0
    )  # [G*S, H]
    tmp_cat_ref[...] = jax.lax.dot_general(
        wy_cat, feat_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G*S, W, CB]

    for g in range(group):
        # Relayout this proposal's slab for the x-pass: dynamic 2-row
        # slices need W on the untiled leading dim (see _crop_pass).
        tmp_ref[...] = jnp.swapaxes(tmp_cat_ref[g * s:(g + 1) * s], 0, 1)
        x_idx, x_frac, x_in = _sample_coords(
            coords[g][1], coords[g][3], s, width
        )
        crop_rows = []
        for j in range(s):
            cols = tmp_ref[pl.ds(x_idx[j], 2), :, :]
            w = x_in[j]
            crop_rows.append(
                cols[0] * ((1.0 - x_frac[j]) * w)
                + cols[1] * (x_frac[j] * w)
            )  # [S_y, CB]
        crop = jnp.stack(crop_rows, axis=1)  # [S_y, S_x, CB]
        windows = crop.reshape(
            pooled_size, pool_kernel, pooled_size, pool_kernel, cb
        )
        out_ref[0, g, :, :, :] = jnp.max(windows, axis=(1, 3)).astype(
            out_ref.dtype
        )


def _fwd_kernel_mm(boxes_ref, feat_ref, out_ref, tmp_ref, *,
                   crop_size, pool_kernel, pool_stride, group):
    """Matmul formulation: crop = Wy @ F @ Wx^T with the y-interpolation
    of `group` proposals CONCATENATED into one [group*S, H] matrix — the
    MXU M dimension becomes group*S (112 at S=14, group=8) instead of the
    lane-wasting S=14 that made the round-2 per-proposal matmul variant
    2-4x slower than dynamic slices. No dynamic slices remain at all.
    """
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    pooled_size = (s - pool_kernel) // pool_stride + 1

    coords = [
        tuple(boxes_ref[0, k, p_base + g] for k in range(4))
        for g in range(group)
    ]
    wy_cat = jnp.concatenate(
        [_interp_matrix(c[0], c[2], s, height) for c in coords], axis=0
    )  # [G*S, H]
    feat = feat_ref[0]  # [H, W, CB]
    tmp_ref[...] = jax.lax.dot_general(
        wy_cat, feat.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(tmp_ref.dtype)  # [G*S, W, CB]

    for g in range(group):
        wx = _interp_matrix(coords[g][1], coords[g][3], s, width)  # [S, W]
        crop_t = jax.lax.dot_general(
            wx, tmp_ref[g * s:(g + 1) * s],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_x, S_y, CB] — transposed spatial axes
        windows = crop_t.reshape(
            pooled_size, pool_kernel, pooled_size, pool_kernel, cb
        )
        pooled_t = jnp.max(windows, axis=(1, 3))  # [ps_x, ps_y, cb]
        out_ref[0, g, :, :, :] = jnp.swapaxes(pooled_t, 0, 1).astype(
            out_ref.dtype
        )


def _bwd_kernel_mm(boxes_ref, feat_ref, grad_ref, dfeat_ref, tmp_ref,
                   dtmp_ref, *, crop_size, pool_kernel, pool_stride, group):
    """Matmul backward: recompute crops via the grouped Wy matmul, route
    the pooled gradient through the first-tie max mask, then push it back
    with one small per-proposal x-dot (M=W) and ONE concatenated
    y-scatter matmul dF += Wy_cat^T-contraction (M=H, K=group*S) instead
    of 14 read-modify-write row scatters per proposal."""
    height, width, cb = feat_ref.shape[1:]
    p_base = pl.program_id(2) * group
    s = crop_size
    pooled_size = (s - pool_kernel) // pool_stride + 1

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    coords = [
        tuple(boxes_ref[0, k, p_base + g] for k in range(4))
        for g in range(group)
    ]
    wy_cat = jnp.concatenate(
        [_interp_matrix(c[0], c[2], s, height) for c in coords], axis=0
    )  # [G*S, H]
    feat = feat_ref[0]
    tmp_ref[...] = jax.lax.dot_general(
        wy_cat, feat.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(tmp_ref.dtype)  # [G*S, W, CB]

    for g in range(group):
        wx = _interp_matrix(coords[g][1], coords[g][3], s, width)  # [S, W]
        crop_t = jax.lax.dot_general(
            wx, tmp_ref[g * s:(g + 1) * s],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_x, S_y, CB]
        windows = crop_t.reshape(
            pooled_size, pool_kernel, pooled_size, pool_kernel, cb
        )
        maxima = jnp.max(windows, axis=(1, 3))  # [ps_x, ps_y, cb]
        g_t = jnp.swapaxes(
            grad_ref[0, g, :, :, :], 0, 1
        ).astype(jnp.float32)  # [ps_x, ps_y, cb]
        # First-tie routing in the ORIGINAL [y, x] window order (TF
        # MaxPoolGrad): original window slot (ky, kx) sits at
        # windows[:, kx, :, ky, :] in this transposed layout.
        taken = jnp.zeros_like(maxima, dtype=jnp.float32)
        pieces = {}
        for ky in range(pool_kernel):
            for kx in range(pool_kernel):
                hit = (
                    (windows[:, kx, :, ky, :] >= maxima).astype(jnp.float32)
                    * (1.0 - taken)
                )
                pieces[(ky, kx)] = g_t * hit
                taken = jnp.maximum(taken, hit)
        dwindows = jnp.stack(
            [
                jnp.stack(
                    [pieces[(ky, kx)] for ky in range(pool_kernel)], axis=2
                )
                for kx in range(pool_kernel)
            ],
            axis=1,
        )  # [ps_x, kx, ps_y, ky, cb]
        dcrop_t = dwindows.reshape(s, s, cb)  # [S_x, S_y, CB]
        # dtmp[w, s_y, c] = sum_{s_x} Wx[s_x, w] * dcrop_t[s_x, s_y, c]
        dtmp_ref[:, g * s:(g + 1) * s, :] = jax.lax.dot_general(
            wx, dcrop_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtmp_ref.dtype)  # [W, S_y, CB]

    # dF[h, w, c] += sum_{gs} Wy_cat[gs, h] * dtmp[w, gs, c]
    dfeat_ref[0] += jax.lax.dot_general(
        wy_cat, dtmp_ref[...],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, W, CB]


def estimate_flops(batch, num_proposals, height, width, channels,
                   crop_size, pool_kernel=2, channel_block=128, group=8):
    """Analytic FLOP counts for the slice-impl kernels, per invocation.

    bench.py adds these to XLA's cost analysis (which cannot see inside
    custom calls) so the reported MFU is a true utilization number, not
    a floor. Counting conventions match XLA's: a multiply-add is 2 flops;
    elementwise lerp a*(1-t) + b*t over N elems = 3N; pool max/compare
    passes counted 1 flop per element. The narrow-window fast path is
    assumed taken for every proposal (the common selective-search case);
    wide boxes run the full-width branch, so the y-pass term is a mild
    underestimate when boxes are wide.

    Returns {'fwd': float, 'bwd': float} flops.
    """
    p_pad = -(-num_proposals // group) * group
    c_pad = -(-channels // channel_block) * channel_block
    win = _window_tier(width) or width
    s = crop_size
    per_prop_crop = 3.0 * s * win + 3.0 * s * s  # y-pass + x-pass lerps
    pool = float(s * s)  # max-reduce over k^2 windows
    fwd = batch * p_pad * c_pad * (per_prop_crop + pool)

    # Backward: crop recompute + first-tie routing (~2 passes over the
    # k^2 window grid) + the x-interp dot_general
    # ([S,W] x [S,S,CB] contracting S) + the dF accumulation. The default
    # "cat" variant lands dF via a dense concatenated matmul
    # ([G*S, H] x [W, G*S, CB] -> 2*S*H*W flops per proposal-channel —
    # executed MXU flops, deliberately counted even though the scatter
    # form needs algorithmically fewer); "scatter" does sparse 2-row RMWs.
    routing = 2.0 * s * s * pool_kernel * pool_kernel
    x_dot = 2.0 * s * s * width
    if os.environ.get("CAP2DET_ROI_BWD", "cat") == "cat":
        y_acc = 2.0 * s * height * width
    else:
        y_acc = 3.0 * 2.0 * s * width  # scatter always runs full-width
    bwd = batch * p_pad * c_pad * (
        per_prop_crop + pool + routing + x_dot + y_acc
    )
    return {"fwd": float(fwd), "bwd": float(bwd)}


def _ragged_c():
    """Whether the FORWARD/pool kernels take the raw 576-channel arrays
    and let Pallas mask the last partial 128-lane block (supported —
    probed on this toolchain), instead of XLA-side pad-to-640 +
    slice-back copies. Step-level A/B (BENCH_NOTES r4): ragged wins
    inc2 (31.2-31.5 vs 31.9-32.8 ms, the pad/slice copies around the
    fwd + pool kernels) but REGRESSES bench by ~1 ms when applied to
    the ROI BACKWARD too — so the backward always pads (force=True);
    CAP2DET_RAGGED_C=0 reverts the forward/pools as well."""
    return os.environ.get("CAP2DET_RAGGED_C", "1") == "1"


def _pad_channels(x, cb, force=False):
    """Pads the channel axis to a multiple of the block size. In the
    default CAP2DET_RAGGED_C=1 mode the slice/cat kernels skip this
    (Pallas masks partial lane blocks natively); the mm/ymm variants
    pass force=True — their grids and matmul shapes assume exact
    division."""
    if _ragged_c() and not force:
        return x
    channels = x.shape[-1]
    pad = (-channels) % cb
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _pad_proposals(boxes, group):
    """Pads the proposal axis to a multiple of `group` with zero boxes
    (they crop the top-left 1x1 cell; their outputs are sliced away and,
    in the backward, their incoming gradient is zero-padded so they
    contribute nothing to dF)."""
    num_p = boxes.shape[1]
    pad = (-num_p) % group
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
    return boxes


def _precompute_coords(boxes, crop_size, height, width):
    """XLA-side `_sample_coords` over every proposal at once.

    boxes [B, P, 4] -> (cidx int32 [B, P, 2S], cval f32 [B, P, 4S]):
    cidx packs y idxs then x idxs along the last axis; cval packs
    y-frac, y-inside, x-frac, x-inside (see `_read_coords_smem`). The
    proposal axis sits second-to-last so the group-blocked SMEM
    BlockSpec is Mosaic-legal. Expression order mirrors
    `_sample_coords_scalar` exactly (bit-identical idx/frac), so the
    kernel's sampling is unchanged — only where it is computed moves.
    """
    s = crop_size
    i = jnp.arange(s, dtype=jnp.float32)[None, None, :]  # [1, 1, S]
    idx_parts, val_parts = [], []
    for axis, extent in ((0, height), (1, width)):
        start = boxes[:, :, axis, None]  # [B, P, 1]
        end = boxes[:, :, axis + 2, None]
        h_max = float(extent - 1)
        if s > 1:
            coords = start * h_max + i * (end - start) * h_max / (s - 1)
        else:
            coords = (start + end) * 0.5 * h_max + i * 0.0
        inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
        idx = jnp.clip(jnp.floor(coords), 0, extent - 2)
        frac = (coords - idx) * inside
        idx_parts.append(idx.astype(jnp.int32))  # [B, P, S]
        val_parts.extend([frac, inside])
    return (jnp.concatenate(idx_parts, axis=-1),
            jnp.concatenate(val_parts, axis=-1))


def _forward(features, boxes, crop_size, pool_kernel, pool_stride,
             channel_block, interpret, group):
    group = int(os.environ.get("CAP2DET_ROI_GROUP", group))
    if features.shape[1] < 2 or features.shape[2] < 2:
        # _sample_coords clamps to [0, extent-2]; extent 1 would produce
        # a -1 dynamic-slice start (out-of-bounds read). Fail loudly —
        # a <2-cell feature map means the image was under 32px a side.
        raise ValueError(
            "roi_crop_maxpool needs a feature map of at least 2x2; got %s"
            % (features.shape,)
        )
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block)
    batch, height, width, channels = features.shape
    orig_p = boxes.shape[1]
    boxes = _pad_proposals(boxes, group)
    num_p = boxes.shape[1]
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1

    grid = (batch, pl.cdiv(channels, cb), num_p // group)
    # Mosaic requires the blocked proposal axis divisible by 8.
    # Default since r5: XLA precomputes the sampling coords and the
    # kernel reads SMEM (measured -1.6 ms/step at bench shapes vs the
    # in-kernel scalar chain; CAP2DET_ROI_COORDS=scalar|vector reverts).
    precomp = (os.environ.get("CAP2DET_ROI_COORDS", "precomp") == "precomp"
               and group % 8 == 0)
    kernel = functools.partial(
        _fwd_kernel,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
        group=group,
        window=_window_tier(width),
        precomp=precomp,
    )
    s = crop_size
    extra_args, extra_specs = [], []
    if precomp:
        cidx, cval = _precompute_coords(boxes, s, height, width)
        extra_args = [cidx, cval]
        extra_specs = [
            pl.BlockSpec((1, group, 2 * s), lambda b, c, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, 4 * s), lambda b, c, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            *extra_specs,
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, group, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_p, pooled, pooled, channels), features.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((crop_size, crop_size, cb), jnp.float32),
            # CAP2DET_ROI_TMP=bf16 halves the x-pass dynamic-read bytes
            # (the largest remaining fwd phase per the r4 bisect) at the
            # cost of one bf16 rounding between the y- and x-lerps; the
            # output is cast to bf16 anyway.
            pltpu.VMEM(
                (width, crop_size, cb),
                jnp.bfloat16
                if os.environ.get("CAP2DET_ROI_TMP", "f32") == "bf16"
                else jnp.float32,
            ),
            pltpu.VMEM((pooled, crop_size, cb), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), *extra_args, features)
    return out[:, :orig_p, :, :, :orig_channels]


def _forward_ymm(features, boxes, crop_size, pool_kernel, pool_stride,
                 channel_block, interpret, group):
    if features.shape[1] < 2 or features.shape[2] < 2:
        raise ValueError(
            "roi_crop_maxpool needs a feature map of at least 2x2; got %s"
            % (features.shape,)
        )
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block, force=True)
    batch, height, width, channels = features.shape
    orig_p = boxes.shape[1]
    boxes = _pad_proposals(boxes, group)
    num_p = boxes.shape[1]
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1

    grid = (batch, channels // cb, num_p // group)
    kernel = functools.partial(
        _fwd_kernel_ymm,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, group, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_p, pooled, pooled, channels), features.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((group * crop_size, width, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), features)
    return out[:, :orig_p, :, :, :orig_channels]


def _forward_mm(features, boxes, crop_size, pool_kernel, pool_stride,
                channel_block, interpret, group):
    if features.shape[1] < 2 or features.shape[2] < 2:
        raise ValueError(
            "roi_crop_maxpool needs a feature map of at least 2x2; got %s"
            % (features.shape,)
        )
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block, force=True)
    batch, height, width, channels = features.shape
    orig_p = boxes.shape[1]
    boxes = _pad_proposals(boxes, group)
    num_p = boxes.shape[1]
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1
    # bf16 interpolation intermediates when the features are bf16 (the
    # training path): halves the VMEM scratch; the dots still accumulate
    # in f32 via preferred_element_type. CAP2DET_ROI_MM_SCRATCH=f32
    # forces f32 scratch for A/B (the slice kernel's bf16-scratch
    # negative, BENCH_NOTES.md r4 item 6, suggests bf16 pack/unpack may
    # be part of the r3 mm negative too).
    tmp_dtype = (
        jnp.bfloat16 if features.dtype == jnp.bfloat16 else jnp.float32
    )
    if os.environ.get("CAP2DET_ROI_MM_SCRATCH") == "f32":
        tmp_dtype = jnp.float32

    grid = (batch, channels // cb, num_p // group)
    kernel = functools.partial(
        _fwd_kernel_mm,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, group, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_p, pooled, pooled, channels), features.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((group * crop_size, width, cb), tmp_dtype),
        ],
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), features)
    return out[:, :orig_p, :, :, :orig_channels]


def _backward_mm(features, boxes, grad, crop_size, pool_kernel, pool_stride,
                 channel_block, interpret, group):
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block, force=True)
    grad = _pad_channels(grad, channel_block, force=True)
    batch, height, width, channels = features.shape
    boxes = _pad_proposals(boxes, group)
    num_p = boxes.shape[1]
    if grad.shape[1] != num_p:
        grad = jnp.pad(
            grad, ((0, 0), (0, num_p - grad.shape[1]), (0, 0), (0, 0), (0, 0))
        )
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1
    tmp_dtype = (
        jnp.bfloat16 if features.dtype == jnp.bfloat16 else jnp.float32
    )

    grid = (batch, channels // cb, num_p // group)
    kernel = functools.partial(
        _bwd_kernel_mm,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
        group=group,
    )
    dfeat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
            pl.BlockSpec(
                (1, group, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, height, width, cb), lambda b, c, p: (b, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, height, width, channels), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((group * crop_size, width, cb), tmp_dtype),
            pltpu.VMEM((width, group * crop_size, cb), tmp_dtype),
        ],
        # Blocks + scratch + the f32 dot intermediates exceed the 16MB
        # default scoped-vmem limit; v5e VMEM is far larger.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), features, grad)
    return dfeat[..., :orig_channels].astype(features.dtype)


def _backward(features, boxes, grad, crop_size, pool_kernel, pool_stride,
              channel_block, interpret, group):
    group = int(os.environ.get("CAP2DET_ROI_BWD_GROUP",
                               os.environ.get("CAP2DET_ROI_GROUP", group)))
    orig_channels = features.shape[-1]
    # The backward pads by default: ragged bwd blocks regressed bench
    # ~1 ms with the "cat" kernel (BENCH_NOTES r4 item 23).
    # CAP2DET_RAGGED_BWD=1 retests under newer kernels.
    bwd_pad = os.environ.get("CAP2DET_RAGGED_BWD", "0") != "1"
    features = _pad_channels(features, channel_block, force=bwd_pad)
    grad = _pad_channels(grad, channel_block, force=bwd_pad)
    batch, height, width, channels = features.shape
    boxes = _pad_proposals(boxes, group)
    num_p = boxes.shape[1]
    if grad.shape[1] != num_p:
        grad = jnp.pad(
            grad, ((0, 0), (0, num_p - grad.shape[1]), (0, 0), (0, 0), (0, 0))
        )
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1

    # "catf" (default) folds hierarchical first-tie routing into the
    # recompute on top of "cat"'s concatenated dF matmul — bench step
    # 38.6-39.7 -> 34.8-35.6 ms in the 3-round A/B (BENCH_NOTES r4);
    # it needs a 2x2/s2 pool (every shipped config) and falls back to
    # "cat" otherwise. "cat" stages per-proposal dtmp slabs and lands
    # the group's dF in one concatenated matmul (19.2 -> 14.5 ms
    # fwd+bwd over "scatter", the sparse 2-row RMW form, in r4).
    # Read at trace time.
    variant = os.environ.get("CAP2DET_ROI_BWD", "catf")
    grid = (batch, pl.cdiv(channels, cb), num_p // group)
    bwd_precomp = False  # set by the catf branch; adds coord operands
    if variant == "catv":
        kernel = functools.partial(
            _bwd_kernel_catv,
            crop_size=crop_size,
            pool_kernel=pool_kernel,
            pool_stride=pool_stride,
            group=group,
            window=_window_tier(width),
        )
        scratch = [
            pltpu.VMEM((group * crop_size, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, group * crop_size, cb), jnp.float32),
        ]
        params = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
    elif variant == "catw" and pool_kernel == 2 and pool_stride == 2 \
            and crop_size % 2 == 0:
        merge = int(os.environ.get("CAP2DET_ROI_BWD_MERGE", "2"))
        pooled_rows = (crop_size - pool_kernel) // pool_stride + 1
        w2 = pl.cdiv(width, merge)
        kernel = functools.partial(
            _bwd_kernel_catw,
            crop_size=crop_size,
            pool_kernel=pool_kernel,
            pool_stride=pool_stride,
            group=group,
            window=_window_tier(width),
            merge=merge,
        )
        scratch = [
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
            pltpu.VMEM((pooled_rows, crop_size, cb), jnp.float32),
            pltpu.VMEM((pooled_rows, crop_size, cb), jnp.float32),
            pltpu.VMEM((w2, group * crop_size, merge * cb), jnp.float32),
            pltpu.VMEM((height, w2, merge * cb), jnp.float32),
        ]
        params = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
    elif variant == "catf" and pool_kernel == 2 and pool_stride == 2 \
            and crop_size % 2 == 0:
        pooled_rows = (crop_size - pool_kernel) // pool_stride + 1
        bwd_precomp = (
            # Default since r5 (measured ~-0.5 ms/step at bench shapes;
            # CAP2DET_ROI_BWD_COORDS=kernel reverts).
            os.environ.get("CAP2DET_ROI_BWD_COORDS", "precomp") == "precomp"
            and group % 8 == 0  # Mosaic blocked-axis tiling rule
        )
        kernel = functools.partial(
            _bwd_kernel_catf,
            crop_size=crop_size,
            pool_kernel=pool_kernel,
            pool_stride=pool_stride,
            group=group,
            window=_window_tier(width),
            interpret=interpret,
            precomp=bwd_precomp,
        )
        # CAP2DET_ROI_BWD_PREC=bf16 stores dtmp in bf16, making both
        # catdots native bf16 MXU matmuls (f32 accumulate). The
        # recompute tmp/mq/hx stay f32 so tie routing matches the f32
        # forward exactly; only the already-quantized-on-entry gradient
        # values ride bf16.
        dtmp_t = (
            jnp.bfloat16
            if os.environ.get("CAP2DET_ROI_BWD_PREC", "f32") == "bf16"
            else jnp.float32
        )
        scratch = [
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
            pltpu.VMEM((pooled_rows, crop_size, cb), jnp.float32),
            pltpu.VMEM((pooled_rows, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, group * crop_size, cb), dtmp_t),
        ]
        params = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
    elif variant in ("cat", "catf", "catw"):  # catf/catw: non-2x2/s2 fallback
        kernel = functools.partial(
            _bwd_kernel_cat,
            crop_size=crop_size,
            pool_kernel=pool_kernel,
            pool_stride=pool_stride,
            group=group,
            window=_window_tier(width),
        )
        scratch = [
            pltpu.VMEM((crop_size, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, group * crop_size, cb), jnp.float32),
        ]
        params = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
    else:
        kernel = functools.partial(
            _bwd_kernel,
            crop_size=crop_size,
            pool_kernel=pool_kernel,
            pool_stride=pool_stride,
            group=group,
            window=_window_tier(width),
        )
        scratch = [
            pltpu.VMEM((crop_size, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
        ]
        params = {}
    s = crop_size
    extra_args, extra_specs = [], []
    if bwd_precomp:
        cidx, cval = _precompute_coords(boxes, s, height, width)
        extra_args = [cidx, cval]
        extra_specs = [
            pl.BlockSpec((1, group, 2 * s), lambda b, c, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, 4 * s), lambda b, c, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
        ]
    dfeat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            *extra_specs,
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
            pl.BlockSpec(
                (1, group, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, height, width, cb), lambda b, c, p: (b, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, height, width, channels), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(jnp.transpose(boxes, (0, 2, 1)), *extra_args, features, grad)
    return dfeat[..., :orig_channels].astype(features.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8)
)
def roi_crop_maxpool(features, boxes, crop_size, pool_kernel=2,
                     pool_stride=2, channel_block=128, interpret=False,
                     proposals_per_program=8, impl="slice"):
    """Fused TF-semantics crop_and_resize + max-pool.

    Args:
      features: [B, H, W, C] feature map.
      boxes: [B, P, 4] normalized [ymin, xmin, ymax, xmax].
      crop_size: S (pre-pool crop side).
      proposals_per_program: grid-granularity knob; P is zero-padded to a
        multiple. With impl="mm" this is also the y-matmul's M-dimension
        batching factor (8 * S=14 -> M=112, near the MXU's 128 rows).
      impl: "slice" (2-sparse dynamic-slice lerps), "mm" (grouped
        interp-matrix matmuls at M=group*S; measured 2x slower in r3 —
        recorded negative result), or "ymm" (hybrid: concatenated
        y-interp matmul + slice x-pass; see _fwd_kernel_ymm).

    Returns:
      [B, P, S', S', C] pooled crops, S' = (S - pool_kernel)//pool_stride + 1.
    """
    fwd = {"mm": _forward_mm, "ymm": _forward_ymm}.get(impl, _forward)
    return fwd(
        features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
        interpret, proposals_per_program,
    )


def _fwd(features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
         interpret, proposals_per_program, impl):
    fwd = {"mm": _forward_mm, "ymm": _forward_ymm}.get(impl, _forward)
    out = fwd(
        features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
        interpret, proposals_per_program,
    )
    return out, (features, boxes)


def _bwd(crop_size, pool_kernel, pool_stride, channel_block, interpret,
         proposals_per_program, impl, residuals, grad):
    features, boxes = residuals
    bwd = _backward_mm if impl == "mm" else _backward
    dfeat = bwd(
        features, boxes, grad, crop_size, pool_kernel, pool_stride,
        channel_block, interpret, proposals_per_program,
    )
    return dfeat, None  # proposals are data: no box gradient


roi_crop_maxpool.defvjp(_fwd, _bwd)
