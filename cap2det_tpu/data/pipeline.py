"""Host-side input pipeline: TFRecords -> fixed-shape device batches.

Reimplements the reference reader (readers/cap2det_reader.py:19-269) with
TPU-static shapes:

  * JPEG decode, random horizontal flip with box consistency
    (core/preprocess.py:56-78, cap2det_reader.py:106-132), keep-aspect
    resize (core/imgproc.py:301-353), proposal truncation/padding to
    ``max_num_proposals``.
  * The reference's per-batch random global rescale
    (``batch_resize_scale_value``, cap2det_reader.py:143-172) plus its
    free dynamic H×W padded batching are replaced by **canvas buckets**:
    one fixed (height, width) canvas per (scale, orientation) pair, so
    XLA compiles a handful of programs instead of one per shape.
    Box renormalization from canvas padding matches
    ``_batch_scale_box_fn`` (cap2det_reader.py:174-199) exactly.
  * Caption token-buffer decoding replaces the reference's tf.while_loop
    ``parse_texts`` (core/preprocess.py:151-214) with trivial host
    slicing.
  * Label extraction (string matching) runs here, ahead of the device,
    emitting dense ``pseudo_labels`` — TPUs have no hash tables
    (reference runs lookups inside the loss graph,
    models/label_extractor.py:193-197).

Deviations (documented):
  * Shard filtering hashes image_id with CRC32C rather than TF's
    Fingerprint64 (same determinism/uniformity contract,
    cap2det_reader.py:201-211).
  * Orientation bucketing groups landscape/portrait images into separate
    batches so canvases stay tight; the reference mixes them and pads to
    the per-batch max.
"""

from __future__ import annotations

import random
import threading
import queue as queue_lib

import numpy as np

from cap2det_tpu.config import schema
from cap2det_tpu.data import tf_example, tfrecord
from cap2det_tpu.fields import InputFields, TFExampleFields
from cap2det_tpu.text import extractors as extractors_lib

_WANTED_KEYS = {
    TFExampleFields.image_id,
    TFExampleFields.image_encoded,
    TFExampleFields.caption_string,
    TFExampleFields.caption_offset,
    TFExampleFields.caption_length,
    TFExampleFields.object_box_ymin,
    TFExampleFields.object_box_xmin,
    TFExampleFields.object_box_ymax,
    TFExampleFields.object_box_xmax,
    TFExampleFields.object_label,
    TFExampleFields.object_text,
    TFExampleFields.proposal_box_ymin,
    TFExampleFields.proposal_box_xmin,
    TFExampleFields.proposal_box_ymax,
    TFExampleFields.proposal_box_xmax,
}

_WANTED_KEYS_NO_IMAGE = _WANTED_KEYS - {TFExampleFields.image_encoded}


def _get(parsed, key, kind):
    entry = parsed.get(key)
    if entry is None:
        return []
    return entry[1]


def _boxes_from(parsed, prefix):
    ymin = np.asarray(_get(parsed, prefix + "/ymin", "float"), np.float32)
    xmin = np.asarray(_get(parsed, prefix + "/xmin", "float"), np.float32)
    ymax = np.asarray(_get(parsed, prefix + "/ymax", "float"), np.float32)
    xmax = np.asarray(_get(parsed, prefix + "/xmax", "float"), np.float32)
    return np.stack([ymin, xmin, ymax, xmax], axis=-1) if len(ymin) else np.zeros(
        (0, 4), np.float32
    )


def parse_example(record, decode_image=True):
    """Parses one serialized tf.Example into a host example dict."""
    parsed = tf_example.decode_example(
        record, _WANTED_KEYS if decode_image else _WANTED_KEYS_NO_IMAGE
    )

    tokens = [b.decode("utf-8") for b in _get(parsed, TFExampleFields.caption_string, "bytes")]
    offsets = _get(parsed, TFExampleFields.caption_offset, "int64")
    lengths = _get(parsed, TFExampleFields.caption_length, "int64")
    captions = [
        tokens[int(o) : int(o) + int(l)] for o, l in zip(offsets, lengths)
    ]

    example = {
        "image_id": _get(parsed, TFExampleFields.image_id, "bytes")[0].decode("utf-8"),
        "captions": captions,
        "concat_tokens": tokens,
        "proposals": _boxes_from(parsed, TFExampleFields.proposal_box),
        "object_boxes": _boxes_from(parsed, TFExampleFields.object_box),
        "object_texts": [
            b.decode("utf-8")
            for b in _get(parsed, TFExampleFields.object_text, "bytes")
        ],
        "object_labels": list(_get(parsed, TFExampleFields.object_label, "int64")),
    }
    if decode_image:
        enc = _get(parsed, TFExampleFields.image_encoded, "bytes")
        example["image_encoded"] = enc[0] if enc else None
    return example


def _jpeg_size(data):
    """Image (height, width) from the JPEG header — no pixel decode."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        w, h = im.size
    return h, w


def decode_jpeg(data):
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _round_up(x, m):
    return int(-(-x // m) * m)


def compute_canvas(min_dimension, scale=1.0, aspect_cap=1.5, multiple=32):
    """Fixed (short_side, long_side) canvas for one scale bucket."""
    short = _round_up(round(min_dimension * scale), multiple)
    long = _round_up(round(min_dimension * scale * aspect_cap), multiple)
    return short, long


def resize_to_canvas(image, canvas_hw):
    """Keep-aspect resize so min-dim hits the canvas short side (or the
    image fits, whichever is smaller). Returns (resized, (new_h, new_w)).

    dtype-preserving: uint8 input resizes with cv2's fixed-point bilinear
    (within ±1 intensity of the float path, an order of magnitude below
    the bf16 precision the convs run at, and ~14x faster on the host —
    the f32 resize was the single largest cost in the input pipeline);
    float input keeps the exact f32 bilinear.
    """
    import cv2

    ch, cw = canvas_hw
    h, w = image.shape[:2]
    # Aim: min(new_h,new_w) == canvas short side; cap to fit.
    target = min(ch, cw) / min(h, w)
    scale = min(target, ch / h, cw / w)
    new_h = max(1, min(ch, int(round(h * scale))))
    new_w = max(1, min(cw, int(round(w * scale))))
    if image.dtype == np.uint8:
        src = np.ascontiguousarray(image)  # flips arrive as negative-stride views
    else:
        src = image.astype(np.float32)
    resized = cv2.resize(src, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    return resized, (new_h, new_w)


def fit_image_to_canvas(image, canvas_hw):
    """resize_to_canvas + top-left placement on a zero canvas.

    Returns (canvas_image, (new_h, new_w)); canvas dtype follows the
    input (uint8 in -> uint8 canvas, float in -> float32 canvas).
    """
    resized, (new_h, new_w) = resize_to_canvas(image, canvas_hw)
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), resized.dtype)
    canvas[:new_h, :new_w] = resized
    return canvas, (new_h, new_w)


def _numpy_s2d(x):
    """[H, W, C] -> [H/2, W/2, 4C] space-to-depth, (di, dj, c) phase
    packing — the numpy twin of inception_v2.space_to_depth, kept local
    so pipeline workers never import jax."""
    h, w, c = x.shape
    return (
        x.reshape(h // 2, 2, w // 2, 2, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h // 2, w // 2, 4 * c)
    )


def pack_image_to_canvas(image, canvas_hw):
    """resize + zero-pad + space-to-depth pack in one native pass.

    Returns ([ch/2, cw/2, 12] uint8 packed canvas, (new_h, new_w)) —
    bit-identical to ``_numpy_s2d(fit_image_to_canvas(image)[0])`` but
    ~10x faster (native/image_pack.cc): the intermediate [H, W, 3]
    canvas is never materialized and the pack runs at memcpy speed.
    This is the production training feed layout (the s2d stem conv,
    inception_v2.first_stage).
    """
    if image.dtype != np.uint8:
        raise ValueError("pack_image_to_canvas requires a uint8 image")
    resized, (new_h, new_w) = resize_to_canvas(image, canvas_hw)
    try:
        from cap2det_tpu import native

        if native.available():
            return native.pack_s2d(resized, canvas_hw), (new_h, new_w)
    except Exception:  # pragma: no cover - fall back quietly
        pass
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[:new_h, :new_w] = resized
    return _numpy_s2d(canvas), (new_h, new_w)


def _pad_or_truncate_boxes(boxes, max_num):
    n = min(len(boxes), max_num)
    out = np.zeros((max_num, 4), np.float32)
    out[:n] = boxes[:n]
    return out, n


def _flip_boxes(boxes):
    if not len(boxes):
        return boxes
    ymin, xmin, ymax, xmax = boxes.T
    return np.stack([ymin, 1.0 - xmax, ymax, 1.0 - xmin], axis=-1)


def _shard_hash(image_id, denom):
    return tfrecord.crc32c(image_id.encode("utf-8")) % denom


def _parallel_map(fn, iterable, workers, extra_inflight=2):
    """Order-preserving parallel map over a (possibly infinite) stream.

    Keeps at most ``workers + extra_inflight`` items in flight —
    ThreadPoolExecutor.map would consume the whole iterator eagerly,
    which never terminates on a repeating training stream.
    """
    import collections
    from concurrent.futures import ThreadPoolExecutor

    it = iter(iterable)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = collections.deque()
        try:
            for _ in range(workers + extra_inflight):
                pending.append(pool.submit(fn, next(it)))
        except StopIteration:
            it = None
        while pending:
            result = pending.popleft().result()
            if it is not None:
                try:
                    pending.append(pool.submit(fn, next(it)))
                except StopIteration:
                    it = None
            yield result


def labels_for_examples(extractor, examples):
    """Runs the label extractor over a list of host examples.

    Groundtruth extraction reads object texts; the caption extractors read
    the concatenated caption token buffer (reference cap2det_model.py:292
    via label_extractor input fields).
    """
    if isinstance(extractor, extractors_lib.GroundtruthExtractor):
        texts = [ex["object_texts"] for ex in examples]
    else:
        texts = [ex["concat_tokens"] for ex in examples]
    return extractor.extract_labels(texts)


class InputPipeline:
    """Iterable over fixed-shape batches.

    Args:
      options: schema.Cap2DetReader.
      label_extractor: optional extractor; adds `pseudo_labels` to batches.
      vocab: optional text Vocabulary; adds `concat_caption_token_ids`.
      seed: python RNG seed for shuffling/flip/scale decisions.
      max_caption_tokens: static length of the concatenated token-id field.
      aspect_cap / canvas_multiple: canvas bucket geometry.
      bucket_by_orientation: separate landscape/portrait batches.
      pack_s2d: emit `image` as the space-to-depth-packed uint8 canvas
        [B, H/2, W/2, 12] (the training feed layout, see
        pack_image_to_canvas) instead of the unpacked [B, H, W, 3].
        The trainer enables this via Cap2DetModel.pipeline_kwargs.
    """

    def __init__(
        self,
        options: schema.Cap2DetReader,
        label_extractor=None,
        vocab=None,
        seed=0,
        max_caption_tokens=64,
        aspect_cap=1.5,
        canvas_multiple=32,
        bucket_by_orientation=True,
        prefetch=2,
        pack_s2d=False,
    ):
        if not isinstance(options, schema.Cap2DetReader):
            raise ValueError("options must be a Cap2DetReader config")
        self.options = options
        self.label_extractor = label_extractor
        self.vocab = vocab
        self.seed = seed
        self.max_caption_tokens = max_caption_tokens
        self.aspect_cap = aspect_cap
        self.canvas_multiple = canvas_multiple
        self.bucket_by_orientation = bucket_by_orientation
        self.prefetch = prefetch
        self.pack_s2d = pack_s2d
        if pack_s2d and canvas_multiple % 2:
            raise ValueError("pack_s2d requires an even canvas_multiple")

        self._min_dimension = 600
        self._fixed_hw = None
        resizer = options.image_resizer
        if resizer is not None:
            which = resizer.which_oneof()
            if which == "keep_aspect_ratio_resizer":
                self._min_dimension = resizer.keep_aspect_ratio_resizer.min_dimension
            elif which == "fixed_shape_resizer":
                self._fixed_hw = (
                    resizer.fixed_shape_resizer.height,
                    resizer.fixed_shape_resizer.width,
                )

        if (options.preprocess_options is not None
                and options.preprocess_options.random_crop_prob > 0):
            # The reference's cap2det reader path uses the flip-only v2
            # preprocess (core/preprocess.py:56-78); random_crop belongs
            # to the v1 chain no reader calls, and applying it here would
            # require box/proposal adjustment. Refuse rather than ignore.
            raise ValueError(
                "random_crop_prob is not supported by the cap2det reader "
                "(the reference's v2 preprocess path is flip-only)"
            )

        if options.preprocess_options is not None:
            from cap2det_tpu.data import augment as _augment

            if (_augment.has_photometric(options.preprocess_options)
                    and not options.preprocess_options
                    .enable_photometric_augmentation):
                # Same convention as random_crop above: the reference's
                # cap2det reader only runs the flip-only v2 preprocess
                # (core/preprocess.py:56-78) and would silently IGNORE
                # these knobs. Refuse rather than diverge silently; the
                # chain is available behind the documented opt-in.
                raise ValueError(
                    "photometric preprocess options are ignored by the "
                    "reference's cap2det reader (flip-only v2 path); set "
                    "enable_photometric_augmentation: true to opt in to "
                    "this framework's extension"
                )

        self._scales = list(options.batch_resize_scale_value) or [1.0]
        self._shard = None
        if options.shard_indicator:
            numer, denom = options.shard_indicator.split("/")
            self._shard = (int(numer), int(denom))
            if not 0 <= self._shard[0] < self._shard[1]:
                raise ValueError("bad shard_indicator %r" % options.shard_indicator)

    # -- raw example stream ---------------------------------------------------

    def _file_list(self):
        patterns = self.options.input_pattern
        if isinstance(patterns, (str, bytes)):
            # Guard against a bare-string assignment to the repeated field:
            # list("path") would glob per character and silently match "/".
            patterns = [patterns]
        files = tfrecord.list_files(list(patterns))
        if not files:
            raise FileNotFoundError(
                "no files match %s" % list(self.options.input_pattern)
            )
        return files

    def _read_records(self, path):
        """Record iterator: native C++ reader with readahead when built,
        pure-Python fallback otherwise."""
        try:
            from cap2det_tpu import native

            if native.available():
                return native.read_records_native(path)
        except Exception:  # pragma: no cover - fall back quietly
            pass
        return tfrecord.read_records(path)

    def example_stream(self):
        """Yields parsed host examples (single pass unless training)."""
        rng = random.Random(self.seed)
        is_training = self.options.is_training
        files = self._file_list()
        epoch = 0
        while True:
            ordered = list(files)
            if is_training:
                rng.shuffle(ordered)
            yielded = 0
            for path in ordered:
                for record in self._read_records(path):
                    example = parse_example(record, self.options.decode_image)
                    if self._shard is not None:
                        numer, denom = self._shard
                        if _shard_hash(example["image_id"], denom) != numer:
                            continue
                    yielded += 1
                    yield example
            epoch += 1
            if not is_training:
                return
            if yielded == 0:
                # Spinning epochs over an empty dataset would hang training
                # silently; fail loudly instead.
                raise RuntimeError(
                    "input files %r contain no (unfiltered) examples" % files
                )

    def _shuffled_stream(self):
        """Reservoir-style shuffle buffer (mirrors dataset.shuffle)."""
        if not self.options.is_training or self.options.shuffle_buffer_size <= 1:
            yield from self.example_stream()
            return
        rng = random.Random(self.seed + 1)
        buf = []
        size = self.options.shuffle_buffer_size
        for ex in self.example_stream():
            buf.append(ex)
            if len(buf) >= size:
                idx = rng.randrange(len(buf))
                buf[idx], buf[-1] = buf[-1], buf[idx]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf

    # -- batching --------------------------------------------------------------

    def _encode_captions(self, examples):
        """[B, max_caption_tokens] int32 token ids (pad = OOV id)."""
        out = np.full(
            (len(examples), self.max_caption_tokens),
            self.vocab.oov_id,
            dtype=np.int32,
        )
        for i, ex in enumerate(examples):
            toks = ex["concat_tokens"][: self.max_caption_tokens]
            for j, t in enumerate(toks):
                out[i, j] = self.vocab.lookup(t)
        return out

    def _caption_matrix(self, examples):
        """Padded per-caption string fields (mirrors parse_texts output)."""
        num = max((len(ex["captions"]) for ex in examples), default=0)
        maxlen = max(
            (len(c) for ex in examples for c in ex["captions"]), default=0
        )
        strings = np.full((len(examples), num, maxlen), "", dtype=object)
        lengths = np.zeros((len(examples), num), np.int64)
        counts = np.zeros((len(examples),), np.int32)
        for i, ex in enumerate(examples):
            counts[i] = len(ex["captions"])
            for j, cap in enumerate(ex["captions"]):
                lengths[i, j] = len(cap)
                for k, t in enumerate(cap):
                    strings[i, j, k] = t
        return counts, strings, lengths

    def _assemble_text_batch(self, examples):
        batch = {
            InputFields.image_id: [ex["image_id"] for ex in examples],
            InputFields.object_texts: [ex["object_texts"] for ex in examples],
            "concat_tokens": [ex["concat_tokens"] for ex in examples],
        }
        counts, strings, lengths = self._caption_matrix(examples)
        batch[InputFields.num_captions] = counts
        batch[InputFields.caption_strings] = strings
        batch[InputFields.caption_lengths] = lengths
        if self.vocab is not None:
            batch[InputFields.concat_caption_token_ids] = self._encode_captions(
                examples
            )
        if self.label_extractor is not None:
            batch[InputFields.pseudo_labels] = labels_for_examples(
                self.label_extractor, examples
            )
        return batch

    def _prep_example(self, task):
        """Heavy per-example work: decode, photometric, flip, canvas fit,
        box renormalization. All randomness was pre-drawn in the serial
        pre-stage (task fields), so this runs on the parallel-map threads
        with deterministic output regardless of thread timing."""
        ex, (ch, cw) = task["ex"], task["canvas_hw"]
        opt = self.options
        image = decode_jpeg(ex["image_encoded"])
        if task["photo_seed"] is not None:
            from cap2det_tpu.data import augment

            image = augment.apply_photometric(
                image, opt.preprocess_options, random.Random(task["photo_seed"])
            )
        flip = task["flip"]
        if flip:
            image = image[:, ::-1]
        if self.pack_s2d:
            canvas, (new_h, new_w) = pack_image_to_canvas(image, (ch, cw))
        else:
            canvas, (new_h, new_w) = fit_image_to_canvas(image, (ch, cw))

        props = ex["proposals"][: opt.max_num_proposals]
        obj = ex["object_boxes"]
        if flip:
            props = _flip_boxes(props)
            obj = _flip_boxes(obj)
        # Renormalize from true image extent to canvas extent
        # (reference _batch_scale_box_fn semantics).
        fy, fx = new_h / ch, new_w / cw
        scale_vec = np.array([fy, fx, fy, fx], np.float32)
        ex["_canvas"] = canvas
        ex["_new_hw"] = (new_h, new_w)
        ex["_props_canvas"] = props * scale_vec
        ex["_obj_canvas"] = obj * scale_vec if len(obj) else obj
        return ex

    def _stack_image_batch(self, examples):
        """Stacks prepped examples into the padded device batch."""
        opt = self.options
        batch = self._assemble_text_batch(examples)
        canvas0 = examples[0]["_canvas"]
        if self.pack_s2d:
            # Packed canvases: true canvas extent is 2x the stored dims.
            ch, cw = canvas0.shape[0] * 2, canvas0.shape[1] * 2
        else:
            ch, cw = canvas0.shape[:2]
        images = np.empty(
            (len(examples),) + canvas0.shape, canvas0.dtype
        )
        image_shapes = np.zeros((len(examples), 3), np.int32)
        proposals = np.zeros((len(examples), opt.max_num_proposals, 4), np.float32)
        num_proposals = np.zeros((len(examples),), np.int32)
        object_boxes = []
        for i, ex in enumerate(examples):
            images[i] = ex["_canvas"]
            new_h, new_w = ex["_new_hw"]
            image_shapes[i] = (new_h, new_w, 3)
            props = ex["_props_canvas"]
            proposals[i, : len(props)] = props
            num_proposals[i] = len(props)
            object_boxes.append(ex["_obj_canvas"])

        batch.update(
            {
                InputFields.image: images,
                InputFields.image_shape: image_shapes,
                InputFields.proposals: proposals,
                InputFields.num_proposals: num_proposals,
                InputFields.object_boxes: object_boxes,
                InputFields.num_objects: np.array(
                    [len(b) for b in object_boxes], np.int32
                ),
            }
        )
        return batch

    def __iter__(self):
        return self._prefetched(self._batches())

    def _batches(self):
        opt = self.options
        rng = random.Random(self.seed + 2)
        batch_size = opt.batch_size

        if not opt.decode_image:
            pending = []
            for ex in self._shuffled_stream():
                pending.append(ex)
                if len(pending) == batch_size:
                    yield self._assemble_text_batch(pending)
                    pending = []
            # Trailing partial batch dropped: reference padded_batch uses
            # drop_remainder=True (cap2det_reader.py:252).
            return

        # Serial pre-stage: read JPEG dims (header only — no pixel decode),
        # assign bucket / per-batch scale / flip / photometric seeds in
        # stream order so all randomness is deterministic under `seed`,
        # then fan the heavy decode+augment+fit out to
        # `map_num_parallel_calls` threads (order-preserving).
        flip_prob = 0.0
        if opt.is_training and opt.preprocess_options is not None:
            flip_prob = opt.preprocess_options.random_flip_left_right_prob
        from cap2det_tpu.data import augment as _augment

        photometric = (
            opt.is_training
            and _augment.has_photometric(opt.preprocess_options)
        )
        bucket_counts = {}
        bucket_scale = {}

        def tasks():
            for ex in self._shuffled_stream():
                if ex.get("image_encoded") is None:
                    continue
                h, w = _jpeg_size(ex["image_encoded"])
                landscape = w >= h
                ex["_landscape"] = landscape
                key = (
                    landscape
                    if (self.bucket_by_orientation and self._fixed_hw is None)
                    else True
                )
                idx = bucket_counts.get(key, 0)
                bucket_counts[key] = idx + 1
                if idx % batch_size == 0:
                    # Batch-level decisions, fixed by the batch's first
                    # example (matches the previous assembler semantics).
                    bucket_scale[key] = (
                        (rng.choice(self._scales) if opt.is_training else 1.0),
                        landscape,
                    )
                scale, batch_landscape = bucket_scale[key]
                if self._fixed_hw is not None:
                    ch = _round_up(self._fixed_hw[0] * scale, self.canvas_multiple)
                    cw = _round_up(self._fixed_hw[1] * scale, self.canvas_multiple)
                else:
                    short, long = compute_canvas(
                        self._min_dimension, scale, self.aspect_cap,
                        self.canvas_multiple,
                    )
                    ch, cw = (
                        (short, long) if batch_landscape else (long, short)
                    )
                yield {
                    "ex": ex,
                    "key": key,
                    "canvas_hw": (ch, cw),
                    "flip": opt.is_training and rng.random() < flip_prob,
                    "photo_seed": rng.getrandbits(64) if photometric else None,
                }

        # Cap at the host's core count: with fewer cores than workers the
        # GIL/bandwidth contention makes threads a strict loss (this
        # sandbox has 1 core; real v5e hosts have many).
        import os as _os

        workers = max(1, min(opt.map_num_parallel_calls,
                             _os.cpu_count() or 1))
        if workers > 1:
            prepped = _parallel_map(
                lambda t: (t["key"], self._prep_example(t)), tasks(), workers
            )
        else:
            prepped = ((t["key"], self._prep_example(t)) for t in tasks())

        buckets = {}
        for key, ex in prepped:
            buckets.setdefault(key, []).append(ex)
            if len(buckets[key]) == batch_size:
                yield self._stack_image_batch(buckets[key])
                buckets[key] = []
        # Trailing partial buckets dropped: reference padded_batch uses
        # drop_remainder=True (cap2det_reader.py:252).

    def _prefetched(self, gen):
        if self.prefetch <= 0:
            yield from gen
            return
        q = queue_lib.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []
        stop = threading.Event()

        def put(item):
            # Bounded put that aborts when the consumer abandoned the
            # iterator — a plain q.put would block forever, leaking the
            # thread, a pinned batch, and the open record file.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue_lib.Full:
                    continue
            return False

        def worker():
            try:
                for item in gen:
                    if not put(item):
                        return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()


def build_input_pipeline(reader_config: schema.Reader, **kwargs):
    """Factory from the Reader oneof (mirrors readers/reader.py:11-28)."""
    which = reader_config.which_oneof()
    if which == "cap2det_reader":
        return InputPipeline(reader_config.cap2det_reader, **kwargs)
    raise ValueError("unknown reader %r" % which)
