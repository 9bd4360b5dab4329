"""Shared loss primitives (numerically matching tf.nn equivalents)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy(labels, logits):
    """tf.nn.sigmoid_cross_entropy_with_logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softmax_cross_entropy(labels, logits, axis=-1):
    """tf.nn.softmax_cross_entropy_with_logits (labels are distributions)."""
    log_probs = jax.nn.log_softmax(logits, axis=axis)
    return -jnp.sum(labels * log_probs, axis=axis)


def l2_regularization(params, scale, predicate=None):
    """slim-style l2 regularization: scale * sum(w^2)/2 over weight leaves.

    Args:
      predicate: fn(path_str) -> bool selecting leaves (default: names
        ending in 'weights').
    """
    from cap2det_tpu.train.optimizers import param_path_strings

    flat, _ = jax.tree_util.tree_flatten(params)
    paths = param_path_strings(params)
    total = 0.0
    for path, leaf in zip(paths, flat):
        if predicate is not None:
            if not predicate(path):
                continue
        elif not path.endswith("weights"):
            continue
        total = total + jnp.sum(jnp.square(leaf))
    return scale * 0.5 * total
