"""MIDN head, OICR target assignment (vs a reference-semantics loop),
and backbone shape tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cap2det_tpu.models import inception_v2, wsod
from cap2det_tpu.ops import masked


class TestInceptionV2:
    def test_first_stage_shape(self):
        params = inception_v2.init_first_stage_params(jax.random.PRNGKey(0))
        x = np.zeros((1, 64, 64, 3), np.float32)
        out = jax.jit(
            lambda p, x: inception_v2.first_stage(p, x, compute_dtype=jnp.float32)
        )({"InceptionV2": params["InceptionV2"]}, x)
        assert out.shape == (1, 4, 4, 576)

    def test_second_stage_shape(self):
        params = inception_v2.init_second_stage_params(jax.random.PRNGKey(1))
        rois = np.zeros((3, 7, 7, 576), np.float32)
        out = jax.jit(
            lambda p, x: inception_v2.second_stage(p, x, compute_dtype=jnp.float32)
        )(params, rois)
        assert out.shape == (3, 4, 4, 1024)

    def test_preprocess_range(self):
        x = np.array([[0.0, 127.5, 255.0]])
        np.testing.assert_allclose(
            inception_v2.preprocess(x), [[-1.0, 0.0, 1.0]], atol=1e-6
        )


class TestMIDN:
    def test_masked_semantics(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(2, 5, 8).astype(np.float32)
        params = {
            "proba_r_given_c": wsod.init_fc(jax.random.PRNGKey(0), 8, 3),
            "proba_c_given_r": wsod.init_fc(jax.random.PRNGKey(1), 8, 3),
        }
        mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.float32)
        logits, scores, proba = map(
            np.asarray, wsod.midn_head(params, feats, mask)
        )
        assert logits.shape == (2, 3)
        assert scores.shape == (2, 5, 3)
        # Padded proposals carry zero probability and zero score.
        np.testing.assert_allclose(proba[0, 3:], 0.0, atol=1e-7)
        np.testing.assert_allclose(scores[0, 3:], 0.0, atol=1e-7)
        # proba_r_given_c sums to 1 over real proposals.
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
        # scores = sigmoid(class_logits) * proba.
        expected = 1 / (1 + np.exp(-logits))
        np.testing.assert_allclose(
            scores, expected[:, None, :] * proba, rtol=1e-5
        )

    def test_matches_manual_computation(self):
        """MIDN aggregation equals the hand-computed WSDDN formula."""
        feats = np.random.RandomState(1).randn(1, 4, 6).astype(np.float32)
        params = {
            "proba_r_given_c": wsod.init_fc(jax.random.PRNGKey(2), 6, 2),
            "proba_c_given_r": wsod.init_fc(jax.random.PRNGKey(3), 6, 2),
        }
        mask = np.ones((1, 4), np.float32)
        logits, _, _ = map(np.asarray, wsod.midn_head(params, feats, mask))

        l_r = feats @ np.asarray(params["proba_r_given_c"]["weights"]) + np.asarray(
            params["proba_r_given_c"]["biases"]
        )
        l_c = feats @ np.asarray(params["proba_c_given_r"]["weights"]) + np.asarray(
            params["proba_c_given_r"]["biases"]
        )
        p = np.exp(l_r) / np.exp(l_r).sum(axis=1, keepdims=True)
        np.testing.assert_allclose(logits, (l_c * p).sum(axis=1), rtol=1e-4)


def _reference_oicr_targets(labels, proposals, scores_0, mask, iou_thr):
    """Literal per-class transcription of the reference semantics
    (models/utils.py:36-95) in numpy for golden comparison."""
    B, P, C1 = scores_0.shape
    C = C1 - 1
    data = scores_0[:, :, 1:]
    axis_min = data.min(axis=1, keepdims=True)
    ind = ((data - axis_min) * mask[:, :, None]).argmax(axis=1)  # [B, C]

    out = np.zeros((B, P, C), np.float32)
    for b in range(B):
        for c in range(C):
            seed = proposals[b, ind[b, c]]
            for p in range(P):
                box = proposals[b, p]
                iy = max(min(seed[2], box[2]) - max(seed[0], box[0]), 0)
                ix = max(min(seed[3], box[3]) - max(seed[1], box[1]), 0)
                inter = iy * ix
                a1 = max(seed[2] - seed[0], 0) * max(seed[3] - seed[1], 0)
                a2 = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
                union = a1 + a2 - inter
                iou = inter / union if union > 0 else float("nan")
                target = 1.0 if (iou >= iou_thr) else 0.0  # nan -> False
                if labels[b, c] <= 0:
                    target = 0.0
                out[b, p, c] = target
    bkg = (out.sum(-1) <= 0).astype(np.float32)[..., None]
    full = np.concatenate([bkg, out], axis=-1)
    return full / full.sum(-1, keepdims=True)


class TestOICR:
    def test_target_assignment_matches_reference_loop(self):
        rng = np.random.RandomState(3)
        B, P, C = 2, 12, 4
        y0 = rng.uniform(0, 0.6, (B, P))
        x0 = rng.uniform(0, 0.6, (B, P))
        proposals = np.stack(
            [y0, x0, y0 + rng.uniform(0.1, 0.4, (B, P)),
             x0 + rng.uniform(0.1, 0.4, (B, P))], -1
        ).astype(np.float32)
        proposals[0, 9:] = 0.0  # padded slots
        mask = np.ones((B, P), np.float32)
        mask[0, 9:] = 0.0
        scores = rng.rand(B, P, 1 + C).astype(np.float32)
        labels = np.array([[1, 0, 1, 0], [0, 1, 1, 1]], np.float32)

        expected = _reference_oicr_targets(labels, proposals, scores, mask, 0.5)
        got = np.asarray(
            wsod.oicr_target_assignment(labels, proposals, scores, mask, 0.5)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_loss_decreases_toward_targets(self):
        rng = np.random.RandomState(4)
        B, P, C = 1, 6, 2
        proposals = np.array(
            [[[0, 0, 0.5, 0.5], [0, 0, 0.45, 0.5], [0.5, 0.5, 1, 1],
              [0.5, 0.5, 0.9, 1], [0, 0.5, 0.4, 1], [0.6, 0, 1, 0.4]]],
            np.float32,
        )
        mask = np.ones((B, P), np.float32)
        labels = np.array([[1, 1]], np.float32)
        scores_prev = rng.rand(B, P, 1 + C).astype(np.float32)
        targets = np.asarray(
            wsod.oicr_target_assignment(labels, proposals, scores_prev, mask, 0.5)
        )
        # Perfect logits (log targets) give lower loss than random.
        good_logits = np.log(targets + 1e-9)
        bad_logits = rng.randn(B, P, 1 + C).astype(np.float32)
        good = float(
            wsod.oicr_loss(labels, proposals, scores_prev, good_logits, mask, 0.5)
        )
        bad = float(
            wsod.oicr_loss(labels, proposals, scores_prev, bad_logits, mask, 0.5)
        )
        assert good < bad

    def test_fully_masked_rows_are_ignored(self):
        B, P, C = 1, 4, 2
        proposals = np.random.RandomState(0).rand(B, P, 4).astype(np.float32)
        labels = np.ones((B, C), np.float32)
        scores_prev = np.random.RandomState(1).rand(B, P, 1 + C).astype(np.float32)
        logits = np.random.RandomState(2).randn(B, P, 1 + C).astype(np.float32)
        mask = np.array([[1, 1, 0, 0]], np.float32)
        loss1 = float(wsod.oicr_loss(labels, proposals, scores_prev, logits, mask))
        logits2 = logits.copy()
        logits2[0, 2:] = 100.0  # junk in masked rows must not matter
        loss2 = float(wsod.oicr_loss(labels, proposals, scores_prev, logits2, mask))
        np.testing.assert_allclose(loss1, loss2, rtol=1e-6)
