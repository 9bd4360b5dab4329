"""COCO TFRecord builder: directory vs zip-streamed ingestion parity.

The reference streams images straight out of the distribution zips
(dataset-tools/create_coco_tf_record.py:79-87); tools/create_coco_tf_record.py
accepts either layout and must produce identical records.
"""

import json
import os
import sys
import zipfile

import numpy as np

from cap2det_tpu.data import pipeline, synthetic, tfrecord

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

import create_coco_tf_record as coco_tool  # noqa: E402


def _make_corpus(root):
    """Synthetic 3-image COCO-layout corpus: images + caption/instance JSON."""
    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "train2017")
    os.makedirs(img_dir)
    images, cap_anns, inst_anns = [], [], []
    for i in range(3):
        h, w = 64 + 8 * i, 96
        pixels = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = "%012d.jpg" % (i + 1)
        with open(os.path.join(img_dir, name), "wb") as fid:
            fid.write(synthetic.encode_jpeg(pixels))
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        cap_anns.append(
            {"image_id": i + 1, "id": 100 + i, "caption": "a dog and a cat"}
        )
        inst_anns.append(
            {
                "image_id": i + 1,
                "id": 200 + i,
                "category_id": 1,
                "bbox": [4.0, 6.0, 20.0, 24.0],
            }
        )
    captions = {"images": images, "annotations": cap_anns}
    instances = {
        "images": images,
        "annotations": inst_anns,
        "categories": [{"id": 1, "name": "dog"}],
    }
    cap_file = os.path.join(root, "captions.json")
    inst_file = os.path.join(root, "instances.json")
    with open(cap_file, "w") as fid:
        json.dump(captions, fid)
    with open(inst_file, "w") as fid:
        json.dump(instances, fid)
    # Distribution-style zip: files nested under the split directory while
    # annotations carry bare basenames.
    zip_path = os.path.join(root, "train2017.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for img in images:
            zf.write(
                os.path.join(img_dir, img["file_name"]),
                "train2017/" + img["file_name"],
            )
    return img_dir, zip_path, cap_file, inst_file


def _read_examples(path):
    shard = path + "-00000-of-00001"
    return [pipeline.parse_example(raw) for raw in tfrecord.read_records(shard)]


def test_zip_ingestion_matches_directory(tmp_path):
    img_dir, zip_path, cap_file, inst_file = _make_corpus(str(tmp_path))
    out_dir = os.path.join(str(tmp_path), "dir.record")
    out_zip = os.path.join(str(tmp_path), "zip.record")

    n1 = coco_tool.create_records(img_dir, cap_file, inst_file, out_dir)
    n2 = coco_tool.create_records(zip_path, cap_file, inst_file, out_zip)
    assert n1 == n2 == 3

    ex_dir = _read_examples(out_dir)
    ex_zip = _read_examples(out_zip)
    for a, b in zip(ex_dir, ex_zip):
        assert a["image_id"] == b["image_id"]
        assert a["image_encoded"] == b["image_encoded"]
        np.testing.assert_array_equal(a["object_boxes"], b["object_boxes"])
        assert a["object_texts"] == b["object_texts"]
        assert a["captions"] == b["captions"]
    # Sanity on content: normalized instance box and tokenized caption.
    ex = ex_dir[0]
    np.testing.assert_allclose(
        ex["object_boxes"][0], [6 / 64, 4 / 96, 30 / 64, 24 / 96], atol=1e-6
    )
    assert ex["object_texts"] == ["dog"]
    assert ex["captions"] == [["a", "dog", "and", "a", "cat"]]
