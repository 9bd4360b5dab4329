"""Checkpointing with orbax + best-model promotion.

Checkpoint layout: ``<model_dir>/ckpt/<step>/`` orbax trees holding
{params, opt_state, ema, step}. Retention follows TrainConfig
(save_checkpoints_steps / keep_checkpoint_max, reference
train/trainer.py:221-226). Best-model promotion mirrors
core/training_utils.py:233-308: a ``saved_info.txt`` with
``step<TAB>metric`` in the saved-ckpts dir, the winning checkpoint copied
beside it.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_root(model_dir):
    return os.path.join(os.path.abspath(model_dir), "ckpt")


class CheckpointManager:
    def __init__(self, model_dir, keep_max=5):
        self._root = _ckpt_root(model_dir)
        os.makedirs(self._root, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self._root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_max, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step, state):
        self._manager.save(step, args=ocp.args.StandardSave(state))
        self._manager.wait_until_finished()

    def latest_step(self):
        return self._manager.latest_step()

    def restore(self, state_like=None, step=None):
        """Restores a checkpoint; with state_like=None returns the raw tree."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            return None
        if state_like is None:
            return self._manager.restore(step)
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def checkpoint_path(self, step):
        return os.path.join(self._root, str(step))

    def all_steps(self):
        return self._manager.all_steps()

    def close(self):
        self._manager.close()


def save_params(path, params):
    """Standalone params save (e.g. the text-classifier warm-start file)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(params))
    ckptr.wait_until_finished()
    ckptr.close()


def restore_params(path, params_like=None):
    """Restores a params pytree from any of the three layouts a user can
    point a warm-start flag at:

      * a `save_params` file,
      * a trainer checkpoint step dir ``<model_dir>/ckpt/<step>`` — the
        CheckpointManager nests the tree under ``<step>/default/``, which
        StandardCheckpointer cannot open directly,
      * a model_dir itself (the newest step is used) — the natural target
        for ``text_classifier_checkpoint_file`` after scripts/train_text.sh.

    Train-state trees return their 'params' subtree.
    """
    path = os.path.abspath(path)
    candidates = [path, os.path.join(path, "default")]
    step, step_path = latest_checkpoint(path)
    if step is not None:
        candidates.append(os.path.join(step_path, "default"))

    last_err = None
    for candidate in candidates:
        if not os.path.isdir(candidate):
            continue
        ckptr = ocp.StandardCheckpointer()
        try:
            out = ckptr.restore(candidate, target=params_like)
        except Exception as e:  # try the next layout
            last_err = e
            continue
        finally:
            ckptr.close()
        if isinstance(out, dict) and "params" in out and "step" in out:
            return out["params"]
        return out
    raise FileNotFoundError(
        "no restorable checkpoint at %s (tried %s): %s"
        % (path, candidates, last_err)
    )


def latest_checkpoint(model_dir):
    """Returns (step, path) of the newest checkpoint, or (None, None)."""
    root = _ckpt_root(model_dir)
    if not os.path.isdir(root):
        return None, None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    if not steps:
        return None, None
    step = max(steps)
    return step, os.path.join(root, str(step))


def list_checkpoints(model_dir):
    """All retained checkpoints as ascending [(step, path), ...]."""
    root = _ckpt_root(model_dir)
    if not os.path.isdir(root):
        return []
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    return [(s, os.path.join(root, str(s))) for s in steps]


SAVED_INFO = "saved_info.txt"


def save_model_if_it_is_better(
    global_step, model_metric, model_path, saved_ckpts_dir, reverse=False
):
    """Promotes `model_path` into `saved_ckpts_dir` when the metric improves.

    Returns (step_best, metric_best). Matches the reference bookkeeping
    format so tooling reading saved_info.txt keeps working.
    """
    os.makedirs(saved_ckpts_dir, exist_ok=True)
    info_path = os.path.join(saved_ckpts_dir, SAVED_INFO)

    step_best, metric_best = None, None
    if os.path.exists(info_path):
        with open(info_path, "r") as fp:
            step_best, metric_best = fp.readline().strip().split("\t")
        step_best, metric_best = int(step_best), float(metric_best)

    better = (
        metric_best is None
        or (model_metric > metric_best if not reverse else model_metric < metric_best)
    )
    if better:
        step_best, metric_best = int(global_step), float(model_metric)
        with open(info_path, "w") as fp:
            fp.write("%d\t%.8f" % (step_best, metric_best))
        for existing in os.listdir(saved_ckpts_dir):
            if existing.startswith("model.ckpt"):
                full = os.path.join(saved_ckpts_dir, existing)
                shutil.rmtree(full, ignore_errors=True)
        dest = os.path.join(saved_ckpts_dir, "model.ckpt-%d" % step_best)
        shutil.copytree(model_path, dest)
    return step_best, metric_best


def get_best_model_checkpoint(saved_ckpts_dir):
    info_path = os.path.join(saved_ckpts_dir, SAVED_INFO)
    with open(info_path, "r") as fp:
        step_best, _ = fp.readline().strip().split("\t")
    path = os.path.join(saved_ckpts_dir, "model.ckpt-%s" % step_best)
    assert os.path.exists(path), path
    return path
