"""Converts a TF-slim InceptionV2 classification checkpoint to the params
tree this framework uses.

The reference warm-starts both backbone stages from
``zoo/inception_v2_2016_08_28/inception_v2.ckpt`` via
``tf.train.init_from_checkpoint`` scope remaps (models/utils.py:181-186).
This tool reads the same checkpoint (TF is available in the image at
conversion time only — the training path never imports it) and emits an
orbax tree ``{'InceptionV2': {layer: {'weights'|'depthwise_weights'|...,
'BatchNorm': {...}}}}`` consumed by ``Cap2DetModel.load_pretrained``.

Usage:
  python tools/convert_tf_checkpoint.py \
      --checkpoint zoo/inception_v2_2016_08_28/inception_v2.ckpt \
      --output zoo/inception_v2_jax
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SUFFIXES = (
    "weights",
    "depthwise_weights",
    "pointwise_weights",
    "biases",
    "BatchNorm/beta",
    "BatchNorm/gamma",
    "BatchNorm/moving_mean",
    "BatchNorm/moving_variance",
)


def read_tf_checkpoint(path):
    """Returns {variable_name: np.ndarray} from a TF checkpoint."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(path)
    return {
        name: np.asarray(reader.get_tensor(name))
        for name in reader.get_variable_to_shape_map()
    }


def variables_to_tree(variables, root="InceptionV2"):
    """Nests slash-delimited variable names into the params-tree layout."""
    tree = {}
    for name, value in variables.items():
        if not name.startswith(root + "/"):
            continue
        if not name.endswith(_SUFFIXES):
            continue
        parts = name.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value.astype(np.float32)
    return tree


def convert(checkpoint_path, output_path):
    variables = read_tf_checkpoint(checkpoint_path)
    tree = variables_to_tree(variables)
    if "InceptionV2" not in tree:
        raise ValueError(
            "checkpoint has no InceptionV2/ variables: %s"
            % sorted(variables)[:10]
        )
    from cap2det_tpu.train import checkpoint as ckpt_lib

    ckpt_lib.save_params(output_path, tree)
    n = sum(1 for _ in _iter_leaves(tree))
    print("converted %d tensors -> %s" % (n, output_path))
    return tree


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    convert(args.checkpoint, args.output)


if __name__ == "__main__":
    main()
