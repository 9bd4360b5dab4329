"""Model protocol.

The reference's ModelBase ABC (models/model_base.py:9-74) exposes
build_prediction / build_loss / build_evaluation / get_variables_to_train
/ get_scaffold on a graph-building object. The functional equivalent here
is a protocol over pure functions of (params, batch):

  init_params(rng)                 -> params pytree
  pipeline_kwargs()                -> extras the input pipeline needs
  device_batch(host_batch)         -> jit-ready array dict
  loss(params, batch, rng, is_training) -> (total, loss_dict)   [jittable]
  predictions(params, batch, ...)  -> prediction dict            [jittable]
  non_trainable_paths / non_trainable_substrings -> frozen params
                                      (subsumes get_variables_to_train)

Checkpoint scaffolding (get_scaffold's job) lives in train/checkpoint.py;
warm starts are explicit (`load_pretrained`, extractor checkpoints).
"""

from __future__ import annotations

import abc


class ModelBase(abc.ABC):
    non_trainable_paths = ()
    non_trainable_substrings = ()

    @abc.abstractmethod
    def init_params(self, rng):
        ...

    def pipeline_kwargs(self):
        return {}

    @abc.abstractmethod
    def device_batch(self, host_batch):
        ...

    @abc.abstractmethod
    def loss(self, params, batch, rng=None, is_training=True):
        ...
