"""Fused SAME-padded pooling (fwd, max-bwd, avg-bwd) as Pallas kernels.

Status: DEFAULT at many-ROI small-spatial shapes, opt-in elsewhere
(see inception_v2._fused_pool_default — the measured gate). At the
voc07_inc2 shapes ([2000, 7x7/4x4, C]) XLA's reduce_window runs 10-30x
off the traffic floor (5a max fwd alone 5.2 ms in-situ) and routing all
second-stage pools through these kernels takes the inc2 step 40.0 ->
34.4 ms. At bench shapes (N=1000) the SAME kernels regress the step
(custom calls un-fuse the slice-VJP chains that XLA fuses into the conv
backwards there), so bench keeps the XLA forms — both sides pinned by
step-level A/B in BENCH_NOTES.md round 4.

What the kernels do: one program loads a [GN, H, W, CB] block, computes
every pool tap as a VMEM value via static shifted slices
(reshape-deinterleave for stride 2 — Mosaic only allows stride-1 vector
slices); the backward recomputes the pooled maxima, routes the upstream
gradient through a first-tie max mask, and accumulates dx entirely in
VMEM; the avg backward spreads g/counts (a linear op, no activation
input).

Tie routing follows TF MaxPoolGrad (reference models/utils.py:165-177
trains under it): the FULL gradient goes to the first maximal element in
row-major window order — pinned against tf.nn.max_pool2d gradients in
tests/test_pool_grad_kernel.py. The default slice VJP splits ties via
the chained-maximum subgradient instead; both are valid subgradients,
and CAP2DET_POOL_GRAD=fused|ref buys exact TF routing at ~3 ms/step.

The plain-XLA `maxpool_grad_reference` implements the identical routing
for CPU execution and as the kernel's test oracle, so gradient semantics
do not depend on the platform when the TF forms are selected.
"""

from __future__ import annotations

import functools
import os

from cap2det_tpu.kernels.roi_pool import _ragged_c

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _same_pads(size, kernel, stride):
    out = -(-size // stride)
    pad_total = max((out - 1) * stride + kernel - size, 0)
    return out, pad_total // 2, pad_total - pad_total // 2


def _resolve_cb(channel_block, channels):
    """Channel block: explicit arg > CAP2DET_POOL_CB env (an int, or
    'full' for the whole axis — a Mosaic-legal lane block that skips the
    576->640 pad entirely and cuts the grid's channel axis to 1) > 128."""
    if channel_block:
        return channel_block
    v = os.environ.get("CAP2DET_POOL_CB")
    if v == "full":
        return channels
    if v:
        return int(v)
    return 128


def _upsample(v, stride, axis):
    """Interleaves stride-1 zeros after each element along `axis` and
    trims to the transposed-strided-slice length (n-1)*stride + 1."""
    if stride == 1:
        return v
    n = v.shape[axis]
    vz = jnp.expand_dims(v, axis + 1)
    zeros = jnp.zeros(
        vz.shape[:axis + 1] + (stride - 1,) + vz.shape[axis + 2:], v.dtype
    )
    u = jnp.concatenate([vz, zeros], axis=axis + 1)
    u = u.reshape(v.shape[:axis] + (n * stride,) + v.shape[axis + 1:])
    return jax.lax.slice_in_dim(u, 0, (n - 1) * stride + 1, axis=axis)


def _sslice(v, axis, start, length, stride):
    """Strided slice along one axis via reshape-deinterleave: Mosaic's
    vector.extract_strided_slice only allows stride 1, so split the axis
    into (n/stride, stride), pick the phase with a unit slice, and take
    the row range."""
    if stride == 1:
        return jax.lax.slice_in_dim(v, start, start + length, axis=axis)
    n = v.shape[axis]
    phase, base = start % stride, start // stride
    pad = (-n) % stride
    if pad:
        widths = [(0, 0)] * v.ndim
        widths[axis] = (0, pad)
        v = jnp.pad(v, widths)
    m = v.shape[axis] // stride
    v = v.reshape(v.shape[:axis] + (m, stride) + v.shape[axis + 1:])
    v = jax.lax.slice_in_dim(v, phase, phase + 1, axis=axis + 1)
    v = v.reshape(v.shape[:axis] + (m,) + v.shape[axis + 2:])
    return jax.lax.slice_in_dim(v, base, base + length, axis=axis)


def _routed_taps(xf, gf, kernel, stride, h, w):
    """Shared routing math (vector ops only — used inside the Pallas
    kernel AND by the XLA reference): returns the accumulated padded
    gradient [N, Hp, Wp, C] to be cropped by (pad_t, pad_l)."""
    oh, pad_t, pad_b = _same_pads(h, kernel, stride)
    ow, pad_l, pad_r = _same_pads(w, kernel, stride)
    hp, wp = h + pad_t + pad_b, w + pad_l + pad_r
    n, cb = xf.shape[0], xf.shape[3]
    xp = jnp.pad(
        xf,
        ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        constant_values=-jnp.inf,
    )
    views = []
    for ky in range(kernel):
        for kx in range(kernel):
            views.append(
                _sslice(
                    _sslice(xp, 1, ky, oh, stride), 2, kx, ow, stride
                )
            )
    out = functools.reduce(jnp.maximum, views)

    taken = jnp.zeros_like(out)
    acc = jnp.zeros((n, hp, wp, cb), jnp.float32)
    t = 0
    for ky in range(kernel):
        for kx in range(kernel):
            hit = (views[t] >= out).astype(jnp.float32) * (1.0 - taken)
            taken = jnp.maximum(taken, hit)
            contrib = _upsample(
                _upsample(gf * hit, stride, 1), stride, 2
            )  # [N, (OH-1)*s+1, (OW-1)*s+1, CB]
            acc = acc + jnp.pad(
                contrib,
                ((0, 0),
                 (ky, hp - ky - contrib.shape[1]),
                 (kx, wp - kx - contrib.shape[2]),
                 (0, 0)),
            )
            t += 1
    return acc, pad_t, pad_l


def _routed_taps_hier(xf, gf, kernel, stride, h, w):
    """`_routed_taps` with the first-tie routing decomposed
    hierarchically (the catf trick, generalized to KxK): row maxima
    Rrow[y, ox] = max over the window's x-taps at EVERY input row are
    computed once; the y-routing picks the first window row whose
    Rrow equals the pooled max (k taps over [N, Hp, OW, C] — OW-wide,
    not Wp-wide), and the x-routing then distributes each row's
    gradient to its first in-row maximum. Row-major-equivalent: the
    first window row containing the max gets it (upper on ties), and
    within that row the leftmost maximum — exactly the flat taken-mask
    scan's order, at ~k+k tap passes instead of k^2 (pinned vs the
    flat form and the tf.nn.max_pool2d goldens in
    tests/test_pool_grad_kernel.py)."""
    oh, pad_t, pad_b = _same_pads(h, kernel, stride)
    ow, pad_l, pad_r = _same_pads(w, kernel, stride)
    hp, wp = h + pad_t + pad_b, w + pad_l + pad_r
    n, cb = xf.shape[0], xf.shape[3]
    xp = jnp.pad(
        xf,
        ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        constant_values=-jnp.inf,
    )
    xcols = [_sslice(xp, 2, kx, ow, stride) for kx in range(kernel)]
    rrow = functools.reduce(jnp.maximum, xcols)  # [N, Hp, OW, CB]
    rows = [_sslice(rrow, 1, ky, oh, stride) for ky in range(kernel)]
    out = functools.reduce(jnp.maximum, rows)  # [N, OH, OW, CB]

    takeny = jnp.zeros_like(out)
    drrow = jnp.zeros((n, hp, ow, cb), jnp.float32)
    for ky in range(kernel):
        hit = (rows[ky] >= out).astype(jnp.float32) * (1.0 - takeny)
        takeny = jnp.maximum(takeny, hit)
        contrib = _upsample(gf * hit, stride, 1)
        drrow = drrow + jnp.pad(
            contrib,
            ((0, 0), (ky, hp - ky - contrib.shape[1]), (0, 0), (0, 0)),
        )
    takenx = jnp.zeros((n, hp, ow, cb), jnp.float32)
    acc = jnp.zeros((n, hp, wp, cb), jnp.float32)
    for kx in range(kernel):
        hit = (xcols[kx] >= rrow).astype(jnp.float32) * (1.0 - takenx)
        takenx = jnp.maximum(takenx, hit)
        contrib = _upsample(drrow * hit, stride, 2)
        acc = acc + jnp.pad(
            contrib,
            ((0, 0), (0, 0), (kx, wp - kx - contrib.shape[2]), (0, 0)),
        )
    return acc, pad_t, pad_l


def _avg_grad_kernel(g_ref, dx_ref, *, kernel, stride):
    """SAME avg-pool backward of one block, entirely in VMEM: spread
    g/counts back over each tap (a linear op — no activation input)."""
    h, w = dx_ref.shape[1:3]
    oh, pad_t, pad_b = _same_pads(h, kernel, stride)
    ow, pad_l, pad_r = _same_pads(w, kernel, stride)
    hp, wp = h + pad_t + pad_b, w + pad_l + pad_r
    ones = jnp.pad(
        jnp.ones((1, h, w, 1), jnp.float32),
        ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
    )
    counts = None
    for ky in range(kernel):
        for kx in range(kernel):
            v = _sslice(_sslice(ones, 1, ky, oh, stride), 2, kx, ow, stride)
            counts = v if counts is None else counts + v
    gt = g_ref[...].astype(jnp.float32) / counts
    n, cb = gt.shape[0], gt.shape[3]
    # Separable spread (linear, exact): distribute over the window's x
    # taps first, then the y taps — 2k shifted adds instead of k^2.
    gx = _upsample(gt, stride, 2)
    sx = None
    for kx in range(kernel):
        t = jnp.pad(
            gx, ((0, 0), (0, 0), (kx, wp - kx - gx.shape[2]), (0, 0))
        )
        sx = t if sx is None else sx + t
    sy = _upsample(sx, stride, 1)
    acc = None
    for ky in range(kernel):
        t = jnp.pad(
            sy, ((0, 0), (ky, hp - ky - sy.shape[1]), (0, 0), (0, 0))
        )
        acc = t if acc is None else acc + t
    dx_ref[...] = acc[:, pad_t:pad_t + h, pad_l:pad_l + w, :].astype(
        dx_ref.dtype
    )


def avgpool_grad(x_shape, dtype, g, kernel, stride, channel_block=None,
                 interpret=False):
    """dx of y = SAME avg-pool given upstream g. Linear — only shapes of
    x are needed. [N, H, W, C]."""
    n, h, w, c = x_shape
    cb = _resolve_cb(channel_block, c)
    gn = _block_rows(h, w, kernel, stride, cb)
    if gn < 8:
        raise ValueError(
            "avgpool_grad: %s too large for the VMEM block budget" %
            (x_shape,)
        )
    gn = _pick_rows(n, gn)
    pad_c = 0 if _ragged_c() else (-c) % cb
    if pad_c:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    pad_n = (-n) % gn
    if pad_n:
        g = jnp.pad(g, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    np_, cp = n + pad_n, c + pad_c
    oh, ow = g.shape[1:3]

    grid = (np_ // gn, pl.cdiv(cp, cb))
    out = pl.pallas_call(
        functools.partial(_avg_grad_kernel, kernel=kernel, stride=stride),
        grid=grid,
        in_specs=[pl.BlockSpec((gn, oh, ow, cb), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((gn, h, w, cb), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((np_, h, w, cp), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(g)
    return out[:n, :, :, :c]


def _grad_kernel(x_ref, g_ref, dx_ref, *, kernel, stride):
    h, w = x_ref.shape[1:3]
    route = (_routed_taps
             if os.environ.get("CAP2DET_MAXPOOL_ROUTE") == "flat"
             else _routed_taps_hier)
    acc, pad_t, pad_l = route(
        x_ref[...].astype(jnp.float32),
        g_ref[...].astype(jnp.float32),
        kernel, stride, h, w,
    )
    dx_ref[...] = acc[:, pad_t:pad_t + h, pad_l:pad_l + w, :].astype(
        dx_ref.dtype
    )


def maxpool_grad_reference(x, g, kernel, stride):
    """First-tie (TF MaxPoolGrad) SAME max-pool backward in plain XLA."""
    h, w = x.shape[1:3]
    acc, pad_t, pad_l = _routed_taps(
        x.astype(jnp.float32), g.astype(jnp.float32), kernel, stride, h, w
    )
    return acc[:, pad_t:pad_t + h, pad_l:pad_l + w, :].astype(x.dtype)


# Sized so the ~10 live [GN, Hp, Wp, CB] f32 intermediates (9 tap views
# + accumulator + masks) stay well inside the raised scoped-vmem limit.
def _fwd_pool_kernel(x_ref, out_ref, *, kind, kernel, stride):
    """SAME pooled forward of one [GN, H, W, CB] block, entirely in VMEM.

    Built for the second-stage shapes where lax.reduce_window runs
    10-30x off the traffic floor (5.2 ms in-situ for [2000,7,7,576] max
    s2 at inc2 — BENCH_NOTES.md r4): tiny tiled spatial dims turn its
    windowed walk into pure relayout, and the shifted-slice XLA form
    materializes every tap in HBM in-situ. Here the taps are VMEM values;
    the avg divisor plane is rebuilt in-kernel from a broadcast ones
    (Pallas rejects captured data constants) — an [OH, OW]-sized cost."""
    h, w = x_ref.shape[1:3]
    if kind == "pool_max":
        xf = x_ref[...]
        fill = -jnp.inf
    else:
        xf = x_ref[...].astype(jnp.float32)
        fill = 0.0
    oh, pad_t, pad_b = _same_pads(h, kernel, stride)
    ow, pad_l, pad_r = _same_pads(w, kernel, stride)
    xp = jnp.pad(
        xf, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        constant_values=fill,
    )
    # Separable: reduce the window's rows first ([*, Hp, OW] taps), then
    # the columns — 2k tap passes instead of k^2, exact for max and for
    # the rectangular-count avg (counts_h * counts_w).
    op = jnp.maximum if kind == "pool_max" else (lambda a, b: a + b)
    rcols = functools.reduce(
        op, [_sslice(xp, 2, kx, ow, stride) for kx in range(kernel)]
    )
    acc = functools.reduce(
        op, [_sslice(rcols, 1, ky, oh, stride) for ky in range(kernel)]
    )
    if kind != "pool_max":
        def _axis_counts(size, osize, pad_lo, pad_hi, axis):
            ones = jnp.pad(
                jnp.ones((1,) * axis + (size,) + (1,) * (3 - axis),
                         jnp.float32),
                [(0, 0)] * axis + [(pad_lo, pad_hi)]
                + [(0, 0)] * (3 - axis),
            )
            return functools.reduce(
                lambda a, b: a + b,
                [_sslice(ones, axis, k, osize, stride)
                 for k in range(kernel)],
            )
        counts = (_axis_counts(h, oh, pad_t, pad_b, 1)
                  * _axis_counts(w, ow, pad_l, pad_r, 2))
        acc = acc / counts
    out_ref[...] = acc.astype(out_ref.dtype)


def pool_fwd(x, kind, kernel, stride, channel_block=None, interpret=False):
    """Fused SAME pool forward for small-spatial inputs. [N,H,W,C]."""
    n, h, w, c = x.shape
    cb = _resolve_cb(channel_block, c)
    gn = _block_rows(h, w, kernel, stride, cb)
    if gn < 8:
        raise ValueError(
            "pool_fwd: %s too large for the VMEM block budget; use "
            "reduce_window" % (x.shape,)
        )
    gn = _pick_rows(n, gn)

    pad_c = 0 if _ragged_c() else (-c) % cb
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    pad_n = (-n) % gn
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    np_, _, _, cp = x.shape
    oh, _, _ = _same_pads(h, kernel, stride)
    ow, _, _ = _same_pads(w, kernel, stride)

    grid = (np_ // gn, pl.cdiv(cp, cb))
    out = pl.pallas_call(
        functools.partial(_fwd_pool_kernel, kind=kind, kernel=kernel,
                          stride=stride),
        grid=grid,
        in_specs=[pl.BlockSpec((gn, h, w, cb), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((gn, oh, ow, cb), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((np_, oh, ow, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x)
    return out[:n, :, :, :c]


_VMEM_BLOCK_BUDGET = 2 * 1024 * 1024  # bytes for the f32 padded x block


def _block_rows(h, w, kernel, stride, cb):
    _, pad_t, pad_b = _same_pads(h, kernel, stride)
    _, pad_l, pad_r = _same_pads(w, kernel, stride)
    per_row = (h + pad_t + pad_b) * (w + pad_l + pad_r) * cb * 4
    gn = _VMEM_BLOCK_BUDGET // max(per_row, 1)
    return int(max(0, min(gn - gn % 8, 512)))


def _pick_rows(n, gn_max):
    """Largest multiple-of-8 block size <= gn_max that divides n, when
    one exists — avoids the N-padding pad ops around every kernel call
    (profiled at ~0.45 ms/step at inc2, BENCH_NOTES.md r4). Falls back
    to gn_max (with padding) when n has no suitable divisor."""
    for gn in range(min(gn_max, n) - min(gn_max, n) % 8, 7, -8):
        if n % gn == 0:
            return gn
    return gn_max


def supported(shape, kernel, stride, channel_block=128):
    """Whether the Pallas path applies: spatial extent small enough that
    a >=8-row block fits the VMEM budget (the second-stage case). Large
    feature maps (stem pools) take the XLA fallback."""
    _, h, w, _ = shape
    return _block_rows(h, w, kernel, stride, channel_block) >= 8


def maxpool_grad(x, g, kernel, stride, channel_block=None, interpret=False):
    """dx of y = SAME max-pool(x) given upstream g, first-tie routing.

    x: [N, H, W, C]; g: [N, OH, OW, C] with OH/OW = ceil(H/stride) etc.
    """
    n, h, w, c = x.shape
    cb = _resolve_cb(channel_block, c)
    gn = _block_rows(h, w, kernel, stride, cb)
    if gn < 8:
        raise ValueError(
            "maxpool_grad: %s too large for the VMEM block budget; use "
            "maxpool_grad_reference" % (x.shape,)
        )
    gn = _pick_rows(n, gn)

    pad_c = 0 if _ragged_c() else (-c) % cb
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    pad_n = (-n) % gn
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    np_, _, _, cp = x.shape
    oh, ow = g.shape[1:3]

    grid = (np_ // gn, pl.cdiv(cp, cb))
    out = pl.pallas_call(
        functools.partial(_grad_kernel, kernel=kernel, stride=stride),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gn, h, w, cb), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((gn, oh, ow, cb), lambda i, j: (i, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((gn, h, w, cb), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((np_, h, w, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, g)
    return out[:n, :, :, :c]
