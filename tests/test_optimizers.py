"""Fused flat optimizer == per-leaf multi_transform chain.

The trainer's default optimizer (train/optimizers.py
_fused_flat_transform) runs multiplier scaling, per-leaf clipping and
the base optimizer over one concatenated f32 vector of the trainable
leaves — a TPU-native fusion of the reference's per-variable gradient
machinery (reference train/trainer.py:104-146,
core/training_utils.py:14-71). These tests pin that the fused path is
numerically identical to the straightforward per-leaf optax chain for
every Optimizer oneof the schema supports, including freezing,
non-unit multipliers and clip_gradient_norms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cap2det_tpu.config import schema
from cap2det_tpu.train import optimizers

import optax


def _params(rng):
    return {
        "first_stage_feature_extraction": {
            "conv": {"weights": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                     "beta": rng.normal(size=(8,)).astype(np.float32)},
            "Mixed_4e": {"weights": rng.normal(size=(1, 1, 8, 16)).astype(np.float32)},
        },
        "second_stage_feature_extraction": {
            "conv": {"weights": rng.normal(size=(3, 3, 16, 8)).astype(np.float32)},
        },
        "midn": {"weights": rng.normal(size=(8, 5)).astype(np.float32),
                 "biases": np.zeros((5,), np.float32)},
        "embedding": rng.normal(size=(7, 4)).astype(np.float32),
    }


def _train_config(optimizer_line, extra=""):
    from cap2det_tpu.config import pbtxt

    text = """
train_config {
  max_steps: 10
  learning_rate: 0.05
  learning_rate_decay { decay_steps: 3 decay_rate: 0.5 staircase: true }
  optimizer { %s }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier {
    scope: 'first_stage_feature_extraction/Mixed_4e' multiplier: 2.0
  }
  %s
}
""" % (optimizer_line, extra)
    return schema.Pipeline.from_dict(pbtxt.parse(text)).train_config


OPTIMIZERS = [
    "adagrad {}",
    "sgd {}",
    "momentum { momentum: 0.9 }",
    "adam {}",
    "rmsprop {}",
]


@pytest.mark.parametrize("opt_line", OPTIMIZERS)
@pytest.mark.parametrize("clip", ["", "max_gradient_norm: 0.1"])
def test_fused_matches_unfused(opt_line, clip):
    rng = np.random.default_rng(0)
    params = _params(rng)
    cfg = _train_config(opt_line, clip)

    kw = dict(non_trainable_paths=("embedding",))
    tx_f, mask_f, _ = optimizers.build_optimizer(cfg, params, fused=True, **kw)
    tx_u, mask_u, _ = optimizers.build_optimizer(cfg, params, fused=False, **kw)
    assert jax.tree.map(bool, mask_f) == jax.tree.map(bool, mask_u)

    state_f = tx_f.init(params)
    state_u = tx_u.init(params)
    p_f = jax.tree.map(jnp.asarray, params)
    p_u = jax.tree.map(jnp.asarray, params)

    @jax.jit
    def step(p, s, g, which):
        tx = tx_f if which else tx_u
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for i in range(4):
        grads = jax.tree.map(
            lambda x: jnp.asarray(
                np.random.default_rng(100 + i).normal(size=x.shape),
                jnp.float32,
            ),
            params,
        )
        u_f, state_f = tx_f.update(grads, state_f, p_f)
        u_u, state_u = tx_u.update(grads, state_u, p_u)
        p_f = optax.apply_updates(p_f, u_f)
        p_u = optax.apply_updates(p_u, u_u)

    flat_f = jax.tree_util.tree_leaves(p_f)
    flat_u = jax.tree_util.tree_leaves(p_u)
    for a, b in zip(flat_f, flat_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_frozen_leaves_untouched():
    rng = np.random.default_rng(1)
    params = _params(rng)
    cfg = _train_config("adagrad {}")
    tx, mask, _ = optimizers.build_optimizer(
        cfg, params, non_trainable_paths=("embedding",), fused=True
    )
    state = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.ones_like(x), params)
    updates, _ = tx.update(grads, state, params)
    # frozen: whole first-stage scope except Mixed_4e (mult 2.0), plus
    # the non-trainable embedding
    np.testing.assert_array_equal(
        np.asarray(
            updates["first_stage_feature_extraction"]["conv"]["weights"]
        ),
        0.0,
    )
    np.testing.assert_array_equal(np.asarray(updates["embedding"]), 0.0)
    assert np.any(
        np.asarray(
            updates["first_stage_feature_extraction"]["Mixed_4e"]["weights"]
        )
        != 0.0
    )
    assert np.any(np.asarray(updates["midn"]["weights"]) != 0.0)


def test_ema_decay_gate():
    """decay 0.0 (every shipped config) elides the EMA tree; a real
    decay keeps it, with new_ema = d*ema + (1-d)*params."""
    from cap2det_tpu.train import trainer as trainer_lib

    cfg0 = _train_config("adagrad {}", "moving_average_decay: 0.0")
    assert trainer_lib._ema_decay(cfg0) is None

    cfg9 = _train_config("adagrad {}", "moving_average_decay: 0.9")
    assert trainer_lib._ema_decay(cfg9) == pytest.approx(0.9)

    ema = {"w": jnp.zeros((3,))}
    params = {"w": jnp.ones((3,))}
    out = optimizers.ema_update(ema, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    # unset field -> disabled despite the schema default 0.999
    cfg_unset = _train_config("adagrad {}")
    assert trainer_lib._ema_decay(cfg_unset) is None


def test_fused_under_jit_and_donation():
    """The fused update works inside a jitted step with donated state."""
    rng = np.random.default_rng(2)
    params = _params(rng)
    cfg = _train_config("adagrad {}")
    tx, _, _ = optimizers.build_optimizer(cfg, params, fused=True)
    state = {"params": jax.tree.map(jnp.asarray, params), "opt": tx.init(params)}

    @jax.jit
    def step(state, g):
        u, opt = tx.update(g, state["opt"], state["params"])
        return {"params": optax.apply_updates(state["params"], u), "opt": opt}

    g = jax.tree.map(jnp.ones_like, state["params"])
    out1 = step(state, g)
    out2 = step(out1, g)
    assert np.isfinite(
        np.asarray(out2["params"]["midn"]["weights"])
    ).all()
