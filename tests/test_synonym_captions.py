"""Synonym-caption regime: exact_match degrades, extend_match recovers.

The paper's central comparison (reference README.md:210-216,
models/label_extractor.py:124-207): when captions name objects with
words outside the class vocabulary, exact token match misses the
image-level label while the synonym-table extractor recovers it. This
test pins the label-extraction half of that claim host-side on the
synthetic generator's synonym captions; the training-trajectory half
runs on hardware (scripts/quality_run.sh ... extend_match synonyms,
BENCH_NOTES.md round 4).
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

from cap2det_tpu.config import schema  # noqa: E402
from cap2det_tpu.text import extractors  # noqa: E402
import make_rich_synthetic_dataset as gen  # noqa: E402


def _write_tables(tmp_path):
    label_file = tmp_path / "labels.txt"
    label_file.write_text("".join(c + "\n" for c in gen.CLASSES))
    syn_file = tmp_path / "synonyms.txt"
    syn_file.write_text(
        "".join(
            "%s\t%s\n" % (c, ",".join(gen.SYNONYMS[c])) for c in gen.CLASSES
        )
    )
    return str(label_file), str(syn_file)


def _label_recall(extractor, captions_per_image, gt_classes_per_image):
    """Fraction of ground-truth (image, class) pairs the extractor labels."""
    hit = total = 0
    for captions, gt in zip(captions_per_image, gt_classes_per_image):
        tokens = [t for cap in captions for t in cap]
        labels = extractor.extract_labels([tokens])[0]
        for cls in set(gt):
            total += 1
            hit += int(labels[extractor.classes.index(cls)] > 0)
    return hit / total


def test_extend_match_recovers_synonym_captions(tmp_path):
    label_file, syn_file = _write_tables(tmp_path)
    exact = extractors.ExactMatchExtractor(
        schema.ExactMatchExtractor(label_file=label_file)
    )
    extend = extractors.ExtendMatchExtractor(
        schema.ExtendMatchExtractor(label_file=syn_file)
    )
    assert extend.classes == gen.CLASSES

    rng = np.random.default_rng(0)
    gt_sets, caption_sets = [], []
    for _ in range(120):
        gt = [
            gen.CLASSES[int(rng.integers(len(gen.CLASSES)))]
            for _ in range(int(rng.integers(1, 4)))
        ]
        gt_sets.append(gt)
        caption_sets.append(
            gen.make_captions(rng, gt, "synonyms", synonym_prob=0.8)
        )

    exact_recall = _label_recall(exact, caption_sets, gt_sets)
    extend_recall = _label_recall(extend, caption_sets, gt_sets)
    # With 1-2 captions and p=0.8 per mention, exact match misses most
    # labels; the synonym table recovers every one (it also maps the
    # class names themselves).
    assert extend_recall == 1.0
    assert exact_recall < 0.5

    # Exact-style captions remain fully exact-match extractable.
    exact_caps = [
        gen.make_captions(rng, gt, "exact") for gt in gt_sets
    ]
    assert _label_recall(exact, exact_caps, gt_sets) == 1.0


def test_word_vector_match_resolves_synonyms(tmp_path):
    """The synthetic GloVe stand-in places each synonym near its class
    vector, so the word_vector_match top-1 cosine fallback (reference
    models/label_extractor.py:210-328) must resolve every
    single-object synonym caption to the right class — and must NOT
    fire on images whose captions exact-match (fallback is
    exact-match-first)."""
    label_file, _ = _write_tables(tmp_path)
    vocab_path, emb_path = gen.write_embeddings(str(tmp_path), seed=7)
    wv = extractors.WordVectorMatchExtractor(
        schema.WordVectorMatchExtractor(
            label_file=label_file,
            open_vocabulary_file=vocab_path,
            open_vocabulary_word_embedding_file=emb_path,
        )
    )
    rng = np.random.default_rng(1)
    for cls in gen.CLASSES:
        caps = gen.make_captions(rng, [cls], "synonyms", synonym_prob=1.0)
        tokens = [t for cap in caps for t in cap]
        labels = wv.extract_labels([tokens])[0]
        assert labels.sum() == 1.0
        assert labels[wv.classes.index(cls)] == 1.0

    # Multi-object synonym captions: the fallback adds exactly ONE
    # class (reference argmax semantics), and it is a present one.
    gt = ["red_rect", "blue_triangle"]
    caps = gen.make_captions(rng, gt, "synonyms", synonym_prob=1.0)
    labels = wv.extract_labels([[t for cap in caps for t in cap]])[0]
    assert labels.sum() == 1.0
    assert any(labels[wv.classes.index(c)] == 1.0 for c in gt)


def test_synonyms_are_out_of_vocabulary():
    """No synonym collides with a class name — otherwise the 'synonyms'
    style would not actually remove exact-match evidence."""
    for cls, syns in gen.SYNONYMS.items():
        for syn in syns:
            assert syn not in gen.CLASSES
            assert syn != cls
