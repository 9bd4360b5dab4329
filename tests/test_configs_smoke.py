"""Every shipped config must build its model + input pipeline and complete
one finite train step on synthetic data.

Mirrors the reference's 9 experiment pipelines (`/root/reference/configs/`);
only data-file paths and reader sizes are retargeted at tmp fixtures — the
model sections run exactly as shipped.
"""

import glob
import os

import numpy as np
import pytest

from cap2det_tpu.config import schema, pbtxt
from cap2det_tpu.data import synthetic
from cap2det_tpu.train import trainer as trainer_lib
from cap2det_tpu.train import checkpoint as ckpt_lib
import cap2det_tpu.models  # noqa: F401  (registry side effects)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(REPO, "configs", "*.pbtxt"))
)


def _load(name):
    with open(os.path.join(REPO, "configs", name)) as fid:
        return schema.loads_pipeline(fid.read())


def _repo_path(rel):
    return os.path.join(REPO, rel)


def _classes_from_label_file(path):
    with open(path) as fid:
        lines = [l.rstrip("\n") for l in fid if l.strip()]
    # extend-match synonym tables are "class<TAB>syn,syn,...".
    return [l.split("\t")[0] for l in lines]


def _fix_extractor_paths(ext_cfg, tmp_path):
    """Retargets label/vocab/embedding/ckpt files; returns the class list."""
    label_file = _repo_path(ext_cfg.label_file)
    ext_cfg.label_file = label_file
    classes = _classes_from_label_file(label_file)

    if getattr(ext_cfg, "open_vocabulary_file", ""):
        vocab_file = _repo_path(ext_cfg.open_vocabulary_file)
        ext_cfg.open_vocabulary_file = vocab_file
        with open(vocab_file) as fid:
            vocab_size = sum(1 for l in fid if l.strip())
        emb_path = str(tmp_path / "open_vocab_300d.npy")
        rng = np.random.default_rng(0)
        np.save(emb_path, rng.normal(0, 0.1, (vocab_size, 300)).astype(np.float32))
        ext_cfg.open_vocabulary_word_embedding_file = emb_path

    if getattr(ext_cfg, "text_classifier_checkpoint_file", ""):
        # Synthesize a compatible warm-start checkpoint.
        import jax
        from cap2det_tpu.text import extractors

        extractor = extractors.TextClassifierMatchExtractor(ext_cfg)
        params = extractor.init_params(jax.random.PRNGKey(0))
        ckpt_path = str(tmp_path / "text_ckpt")
        ckpt_lib.save_params(ckpt_path, params)
        ext_cfg.text_classifier_checkpoint_file = ckpt_path

    return classes


def _shrink_reader(reader_cfg, record_path):
    r = reader_cfg.cap2det_reader
    r.input_pattern = [record_path]
    r.shuffle_buffer_size = 4
    r.batch_size = min(r.batch_size, 4)
    r.max_num_proposals = min(r.max_num_proposals, 16)
    if r.image_resizer is not None and r.image_resizer.keep_aspect_ratio_resizer:
        r.image_resizer.keep_aspect_ratio_resizer.min_dimension = 64


@pytest.mark.slow
@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_and_steps(name, tmp_path):
    cfg = _load(name)

    model_cfg = cfg.model
    if model_cfg.cap2det_model is not None:
        ext = model_cfg.cap2det_model.label_extractor
        ext_cfg = getattr(ext, ext.which_oneof())
        classes = _fix_extractor_paths(ext_cfg, tmp_path)
    else:
        classes = _fix_extractor_paths(model_cfg.text_model.label_extractor,
                                       tmp_path)
        _fix_extractor_paths(model_cfg.text_model.text_classifier, tmp_path)

    record = str(tmp_path / "train.record")
    synthetic.write_synthetic_dataset(
        record,
        num_examples=8,
        seed=7,
        classes=classes[:6],
        image_hw=(72, 96),
        num_proposals=16,
        with_image=cfg.train_reader.cap2det_reader.decode_image,
    )
    _shrink_reader(cfg.train_reader, record)
    _shrink_reader(cfg.eval_reader, record)

    losses = []
    state = trainer_lib.train(
        cfg,
        model_dir=None,
        max_steps=1,
        use_mesh=False,
        hooks=[lambda s, st, logs: losses.append(float(logs["loss/total_loss"]))],
    )
    assert int(state["step"]) == 1
    assert losses and all(np.isfinite(l) for l in losses), losses


def test_all_nine_reference_configs_shipped():
    expected = {
        "coco17_exact_match.pbtxt",
        "coco17_extend_match.pbtxt",
        "coco17_groundtruth.pbtxt",
        "coco17_text.pbtxt",
        "coco17_text_classifier_match.pbtxt",
        "coco17_word_vector_match.pbtxt",
        "flickr30k_text_classifier_match.pbtxt",
        "voc07_groundtruth.pbtxt",
        "voc07_inc2.pbtxt",
    }
    assert expected.issubset(set(CONFIGS)), set(CONFIGS)
