"""Masked reductions over padded axes.

Everything on TPU is padded to static shapes, so masks are first-class.
Numerical semantics match the reference (core/utils.py:63-214): the
masked max/min/argmax/argmin use the shift-by-extremum trick rather than
-inf substitution, and masked softmax subtracts a large constant from
masked slots, so results are bit-comparable with the TF implementation.

All functions are pure jnp and safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

BIG_NUMBER = 1e10
SMALL_NUMBER = 1e-10


def masked_maximum(data, mask, axis=1, keepdims=True):
    """Max of `data` over `axis` restricted to `mask` > 0.

    If a row is fully masked, returns the unmasked row minimum
    (reference core/utils.py:63-79 behavior).
    """
    axis_min = jnp.min(data, axis=axis, keepdims=True)
    out = jnp.max((data - axis_min) * mask, axis=axis, keepdims=True) + axis_min
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_minimum(data, mask, axis=1, keepdims=True):
    """Min over the masked slots; fully-masked rows give the row maximum."""
    axis_max = jnp.max(data, axis=axis, keepdims=True)
    out = jnp.min((data - axis_max) * mask, axis=axis, keepdims=True) + axis_max
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_sum(data, mask, axis=1, keepdims=True):
    out = jnp.sum(data * mask, axis=axis, keepdims=True)
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_avg(data, mask, axis=1, keepdims=True):
    sums = jnp.sum(data * mask, axis=axis, keepdims=True)
    counts = jnp.maximum(SMALL_NUMBER, jnp.sum(mask, axis=axis, keepdims=True))
    out = sums / counts
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_sum_nd(data, mask, axis=1, keepdims=True):
    """Like masked_sum but `mask` has one fewer trailing dim than `data`."""
    out = jnp.sum(data * mask[..., None], axis=axis, keepdims=True)
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_avg_nd(data, mask, axis=1, keepdims=True):
    sums = jnp.sum(data * mask[..., None], axis=axis, keepdims=True)
    counts = jnp.maximum(
        SMALL_NUMBER, jnp.sum(mask, axis=axis, keepdims=True)[..., None]
    )
    out = sums / counts
    return out if keepdims else jnp.squeeze(out, axis=axis)


def masked_softmax(data, mask, axis=-1):
    """Softmax over the masked slots (masked slots get ~0 probability)."""
    import jax

    return jax.nn.softmax(data - BIG_NUMBER * (1.0 - mask), axis=axis)


def masked_argmax(data, mask, axis=1):
    axis_min = jnp.min(data, axis=axis, keepdims=True)
    return jnp.argmax((data - axis_min) * mask, axis=axis)


def masked_argmin(data, mask, axis=1):
    axis_max = jnp.max(data, axis=axis, keepdims=True)
    return jnp.argmin((data - axis_max) * mask, axis=axis)


def sequence_mask(lengths, maxlen, dtype=jnp.float32):
    """[..., maxlen] mask with 1 where index < length."""
    rng = jnp.arange(maxlen)
    return (rng[None, :] < lengths[..., None]).astype(dtype)
