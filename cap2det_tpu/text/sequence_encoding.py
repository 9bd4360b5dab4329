"""Caption sequence encoders: masked average pooling and LSTM.

Equivalent of the reference core/sequence_encoding.py:11-113 (a vestigial
module there — its config proto was never checked in; kept here for
capability parity). The oneof factory takes small dataclass configs.

The LSTM is a lax.scan over time with static shapes — the caption axis is
short (tens of tokens), so this stays off the critical path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from cap2det_tpu.ops import masked


@dataclass
class AverageEncoder:
    pass


@dataclass
class LstmEncoder:
    hidden_units: int = 128


def average_encode(embeddings, lengths):
    """Masked mean over time: [B, T, D], [B] -> [B, D]."""
    mask = masked.sequence_mask(lengths, embeddings.shape[1])
    return masked.masked_avg_nd(embeddings, mask, axis=1, keepdims=False)


def init_lstm_params(rng, input_dim, hidden_units):
    k1, k2 = jax.random.split(rng)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "kernel": glorot(k1, (input_dim, 4 * hidden_units), jnp.float32),
        "recurrent": glorot(k2, (hidden_units, 4 * hidden_units), jnp.float32),
        "bias": jnp.zeros((4 * hidden_units,), jnp.float32),
    }


def lstm_encode(params, embeddings, lengths):
    """LSTM over time, returning the last valid hidden state [B, H]."""
    batch, time, _ = embeddings.shape
    hidden = params["recurrent"].shape[0]

    def step(carry, xt):
        h, c, t = carry
        gates = xt @ params["kernel"] + h @ params["recurrent"] + params["bias"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        # forget_bias=1.0: BasicLSTMCell semantics (reference
        # core/sequence_encoding.py builds the default cell).
        c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        valid = (t < lengths)[:, None]
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        return (h, c, t + 1), None

    init = (
        jnp.zeros((batch, hidden), embeddings.dtype),
        jnp.zeros((batch, hidden), embeddings.dtype),
        jnp.zeros((), jnp.int32),
    )
    (h, _, _), _ = jax.lax.scan(step, init, jnp.swapaxes(embeddings, 0, 1))
    return h


def get_encode_fn(config, rng=None, input_dim=None):
    """Factory (reference :72-113): returns (params, encode_fn)."""
    if isinstance(config, AverageEncoder):
        return {}, lambda params, emb, lengths: average_encode(emb, lengths)
    if isinstance(config, LstmEncoder):
        params = init_lstm_params(rng, input_dim, config.hidden_units)
        return params, lambda params, emb, lengths: lstm_encode(
            params, emb, lengths
        )
    raise ValueError("unknown encoder config %r" % (config,))
