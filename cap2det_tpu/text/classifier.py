"""Text classifier: frozen word embeddings -> FC -> masked max-pool -> ReLU
-> dropout -> FC(num_classes).

Functional jnp implementation of the reference MLP
(models/label_extractor.py:353-421). Parameters are a flat dict pytree so
the same `apply` serves (a) text-model training under jit/grad and (b)
frozen label extraction. The word-embedding table (GloVe + one random OOV
row, init_width 0.03; reference :373-377) is part of the params but is
never trained — the trainer freezes it by path, matching
``trainable=False`` in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cap2det_tpu.ops import masked


def build_embedding_table(word_embeddings, seed=0, init_width=0.03):
    """GloVe table with an appended random OOV row (reference :274-276)."""
    rng = np.random.RandomState(seed)
    oov = init_width * (rng.rand(1, word_embeddings.shape[-1]) * 2 - 1)
    return np.concatenate([word_embeddings, oov], axis=0).astype(np.float32)


def init_params(rng, vocab_size_with_oov, embedding_dims, hidden_units, num_classes,
                embedding_table=None):
    """Initializes classifier params.

    FC weights use slim's default (variance-scaling uniform) shape of init;
    exact init distribution is not load-bearing for parity (training run
    required either way), so we use glorot-uniform.
    """
    k1, k2 = jax.random.split(rng)
    if embedding_table is None:
        embedding_table = jnp.zeros((vocab_size_with_oov, embedding_dims), jnp.float32)
    else:
        embedding_table = jnp.asarray(embedding_table, jnp.float32)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "word_embedding": {"weights": embedding_table},
        "text_classifier": {
            "layer1": {
                "weights": glorot(k1, (embedding_dims, hidden_units), jnp.float32),
                "biases": jnp.zeros((hidden_units,), jnp.float32),
            },
            "layer2": {
                "weights": glorot(k2, (hidden_units, num_classes), jnp.float32),
                "biases": jnp.zeros((num_classes,), jnp.float32),
            },
        },
    }


def apply(params, token_ids, oov_id, *, dropout_keep_proba=1.0, is_training=False,
          dropout_rng=None):
    """Runs the classifier.

    Args:
      params: dict pytree from `init_params`.
      token_ids: [batch, num_tokens] int array (OOV/padding slots = oov_id).
      oov_id: the out-of-vocabulary id (== vocab size).

    Returns:
      logits: [batch, num_classes].
    """
    emb = params["word_embedding"]["weights"]
    tc = params["text_classifier"]
    token_embs = jnp.take(emb, token_ids, axis=0)  # [B, T, D]
    mask = (token_ids != oov_id).astype(jnp.float32)  # [B, T]

    hidden = (
        jnp.einsum("btd,dh->bth", token_embs, tc["layer1"]["weights"])
        + tc["layer1"]["biases"]
    )
    pooled = masked.masked_maximum(hidden, mask[..., None], axis=1, keepdims=False)
    pooled = jax.nn.relu(pooled)
    if is_training and dropout_keep_proba < 1.0:
        keep = jax.random.bernoulli(dropout_rng, dropout_keep_proba, pooled.shape)
        pooled = jnp.where(keep, pooled / dropout_keep_proba, 0.0)
    logits = pooled @ tc["layer2"]["weights"] + tc["layer2"]["biases"]
    return logits
