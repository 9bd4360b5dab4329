"""Field-name constants shared between readers, models, and evaluators.

Mirrors the string keys of the reference (core/standard_fields.py:35-132)
so TFRecord data produced for the TF implementation feeds this framework
unchanged, and prediction dicts stay name-compatible.
"""


class TFExampleFields:
    """Feature keys inside the serialized tf.Example records."""

    image_id = "image/source_id"
    image_encoded = "image/encoded"

    caption_string = "image/caption/string"
    caption_offset = "image/caption/offset"
    caption_length = "image/caption/length"

    number_of_proposals = "image/proposal/num_proposals"
    proposal_box = "image/proposal/bbox"
    proposal_box_ymin = "image/proposal/bbox/ymin"
    proposal_box_xmin = "image/proposal/bbox/xmin"
    proposal_box_ymax = "image/proposal/bbox/ymax"
    proposal_box_xmax = "image/proposal/bbox/xmax"

    object_box = "image/object/bbox"
    object_text = "image/object/class/text"
    object_label = "image/object/class/label"

    object_box_ymin = "image/object/bbox/ymin"
    object_box_xmin = "image/object/bbox/xmin"
    object_box_ymax = "image/object/bbox/ymax"
    object_box_xmax = "image/object/bbox/xmax"


class InputFields:
    """Keys of the per-batch input dict."""

    image = "image"
    image_id = "image_id"
    image_height = "image_height"
    image_width = "image_width"
    image_shape = "image_shape"

    num_captions = "num_captions"
    caption_strings = "caption_strings"
    caption_lengths = "caption_lengths"

    concat_caption_string = "concat_caption_string"
    concat_caption_length = "concat_caption_length"

    # Host-side token-id encodings of the above (this framework computes
    # string->id lookups in the input pipeline; TPUs have no hash tables).
    concat_caption_token_ids = "concat_caption_token_ids"
    object_text_token_ids = "object_text_token_ids"

    num_objects = "number_of_objects"
    object_boxes = "object_boxes"
    object_texts = "object_texts"

    proposals = "proposals"
    num_proposals = "number_of_proposals"

    # Precomputed pseudo labels (host-side label extraction output).
    pseudo_labels = "pseudo_labels"


class DetectionFields:
    """Keys of the prediction/detection dict."""

    num_proposals = "num_proposals"
    proposal_boxes = "proposal_boxes"
    proposal_scores = "proposal_scores"

    class_labels = "class_labels"

    num_detections = "num_detections"
    detection_boxes = "detection_boxes"
    detection_scores = "detection_scores"
    detection_classes = "detection_classes"


class Cap2DetPredictions:
    midn_class_logits = "midn_class_logits"
    midn_proba_r_given_c = "midn_proba_r_given_c"
    oicr_proposal_scores = "oicr_proposal_scores"
