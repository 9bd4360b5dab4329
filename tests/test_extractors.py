"""Golden tests for label extractors.

Mirrors the reference's label_extractor_test.py cases exactly (including
empty-token batches and OOV tokens) plus synthetic-embedding tests for the
word-vector and text-classifier fallback paths.
"""

import numpy as np
import pytest

from cap2det_tpu.config import schema
from cap2det_tpu.text import extractors, classifier, vocab as vocab_lib


@pytest.fixture
def label_file(tmp_path):
    p = tmp_path / "label_file.txt"
    p.write_text("\n".join(["person", "bird", "dining table"]))
    return str(p)


def _build(pbtxt_str):
    from cap2det_tpu.config import pbtxt

    cfg = schema.LabelExtractor.from_dict(pbtxt.parse(pbtxt_str))
    return extractors.build_label_extractor(cfg)


def test_groundtruth_extractor(label_file):
    ex = _build("groundtruth_extractor { label_file: '%s' }" % label_file)
    assert isinstance(ex, extractors.GroundtruthExtractor)
    assert ex.num_classes == 3
    assert ex.classes == ["person", "bird", "dining table"]

    labels = ex.extract_labels(
        [
            ["bird", "person", "dining table"],
            ["dining table", "", ""],
            ["bird", "dining table", ""],
            ["class_?", "class_*", "class_%"],
        ]
    )
    np.testing.assert_array_equal(
        labels, [[1, 1, 1], [0, 0, 1], [0, 1, 1], [0, 0, 0]]
    )
    labels = ex.extract_labels([[], [], [], []])
    np.testing.assert_array_equal(labels, np.zeros((4, 3)))


def test_exact_match_extractor(label_file):
    ex = _build("exact_match_extractor { label_file: '%s' }" % label_file)
    assert isinstance(ex, extractors.ExactMatchExtractor)
    # 'dining table' is renamed to 'table' before matching.
    labels = ex.extract_labels(
        [
            ["bird", "person", "table"],
            ["table", "", ""],
            ["bird", "table", ""],
            ["class_?", "class_*", "class_%"],
        ]
    )
    np.testing.assert_array_equal(
        labels, [[1, 1, 1], [0, 0, 1], [0, 1, 1], [0, 0, 0]]
    )
    # The multiword original does NOT match under exact-match.
    labels = ex.extract_labels([["dining table"]])
    np.testing.assert_array_equal(labels, [[0, 0, 0]])


def test_extend_match_extractor(tmp_path):
    p = tmp_path / "synonyms.txt"
    p.write_text(
        "\n".join(
            [
                "person\tgirl,boy,man,child,adult,rider",
                "bird\tgoose,duck,pelican,flamigo,gull,swan,bluejay",
                "dining table\ttable",
                "tie\t",
            ]
        )
    )
    ex = _build("extend_match_extractor { label_file: '%s' }" % p)
    assert isinstance(ex, extractors.ExtendMatchExtractor)
    assert ex.num_classes == 4
    assert ex.classes == ["person", "bird", "dining table", "tie"]

    labels = ex.extract_labels(
        [
            ["goose", "boy", "table"],
            ["table", "", ""],
            ["swan", "girl", ""],
            ["class_?", "class_*", "tie"],
        ]
    )
    np.testing.assert_array_equal(
        labels,
        [[1, 1, 1, 0], [0, 0, 1, 0], [1, 1, 0, 0], [0, 0, 0, 1]],
    )
    labels = ex.extract_labels([[], [], [], []])
    np.testing.assert_array_equal(labels, np.zeros((4, 4)))


@pytest.fixture
def open_vocab(tmp_path):
    """Synthetic open vocabulary with orthogonal-ish class embeddings."""
    words = ["person", "bird", "table", "man", "goose", "desk", "xyzzy"]
    vpath = tmp_path / "open_vocab.txt"
    vpath.write_text("\n".join(words))
    dims = 8
    emb = np.zeros((len(words), dims), np.float32)
    # classes: person->axis0, bird->axis1, table->axis2
    emb[0, 0] = 1.0
    emb[1, 1] = 1.0
    emb[2, 2] = 1.0
    emb[3] = [0.9, 0.1, 0, 0, 0, 0, 0, 0]  # man ~ person
    emb[4] = [0.1, 0.9, 0, 0, 0, 0, 0, 0]  # goose ~ bird
    emb[5] = [0, 0.1, 0.9, 0, 0, 0, 0, 0]  # desk ~ table
    emb[6] = [0, 0, 0, 0, 0, 0, 0, 1.0]  # unrelated
    epath = tmp_path / "emb.npy"
    np.save(epath, emb)
    return str(vpath), str(epath)


def test_word_vector_match_extractor(tmp_path, label_file, open_vocab):
    vpath, epath = open_vocab
    ex = _build(
        """
        word_vector_match_extractor {
          label_file: '%s'
          open_vocabulary_file: '%s'
          open_vocabulary_word_embedding_file: '%s'
        }
        """
        % (label_file, vpath, epath)
    )
    assert isinstance(ex, extractors.WordVectorMatchExtractor)
    labels = ex.extract_labels(
        [
            ["person"],          # exact match wins
            ["man"],             # no exact match -> cosine top-1 = person
            ["goose", "desk"],   # top-1 across tokens = bird (0.9 sim each; argmax first)
            ["oovword"],         # all OOV -> zeros
            [],                  # empty -> zeros
        ]
    )
    np.testing.assert_array_equal(
        labels,
        [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0], [0, 0, 0]],
    )
    # Exact match suppresses the similarity path entirely.
    labels = ex.extract_labels([["bird", "man"]])
    np.testing.assert_array_equal(labels, [[0, 1, 0]])


def test_word_vector_match_requires_class_embeddings(tmp_path, open_vocab):
    vpath, epath = open_vocab
    lf = tmp_path / "bad_labels.txt"
    lf.write_text("notinvocab")
    with pytest.raises(ValueError, match="no vector representation"):
        _build(
            """
            word_vector_match_extractor {
              label_file: '%s'
              open_vocabulary_file: '%s'
              open_vocabulary_word_embedding_file: '%s'
            }
            """
            % (lf, vpath, epath)
        )


def test_text_classifier_match_extractor(tmp_path, label_file, open_vocab):
    vpath, epath = open_vocab
    ex = _build(
        """
        text_classifier_match_extractor {
          label_file: '%s'
          open_vocabulary_file: '%s'
          open_vocabulary_word_embedding_file: '%s'
          hidden_units: 8
          label_threshold: 0.5
        }
        """
        % (label_file, vpath, epath)
    )
    assert isinstance(ex, extractors.TextClassifierMatchExtractor)

    # Hand-craft classifier params: identity layer1, layer2 reads the first
    # three embedding axes so class c logit = 10 * emb[c] - 5.
    emb_table = ex.embedding_table
    dims = emb_table.shape[1]
    params = {
        "word_embedding": {"weights": emb_table},
        "text_classifier": {
            "layer1": {
                "weights": np.eye(dims, dtype=np.float32),
                "biases": np.zeros((dims,), np.float32),
            },
            "layer2": {
                "weights": 10.0 * np.eye(dims, 3, dtype=np.float32),
                "biases": -5.0 * np.ones((3,), np.float32),
            },
        },
    }
    ex.set_params(params)

    labels = ex.extract_labels(
        [
            ["person"],   # exact match
            ["man"],      # classifier: man emb -> logits [4,-4,-5] -> person
            ["oovword"],  # classifier sees nothing -> relu(masked max)=..., logits<0
            [],
        ]
    )
    np.testing.assert_array_equal(
        labels, [[1, 0, 0], [1, 0, 0], [0, 0, 0], [0, 0, 0]]
    )


def test_classifier_apply_masking():
    """Masked max-pool must ignore OOV/pad tokens."""
    rng = np.random.RandomState(0)
    emb = rng.randn(5, 4).astype(np.float32)
    table = classifier.build_embedding_table(emb, seed=0)
    import jax

    params = classifier.init_params(
        jax.random.PRNGKey(0), 6, 4, 7, 3, embedding_table=table
    )
    ids_padded = np.array([[1, 2, 5, 5]], np.int32)  # 5 == oov
    ids_short = np.array([[1, 2]], np.int32)
    out1 = classifier.apply(params, ids_padded, oov_id=5)
    out2 = classifier.apply(params, ids_short, oov_id=5)
    np.testing.assert_allclose(out1, out2, rtol=1e-5)


def test_vocabulary_encode():
    v = vocab_lib.Vocabulary(["a", "b"])
    out = v.encode([["a", "x"], ["b", "b"]])
    np.testing.assert_array_equal(out, [[0, 2], [1, 1]])
    assert v.oov_id == 2
