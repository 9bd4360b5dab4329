"""Caption tokenization for dataset building.

The reference tokenizes captions with NLTK ``word_tokenize`` on
lowercased text (dataset-tools/create_coco_tf_record.py). ``word_tokenize``
is punkt sentence splitting + the Treebank word tokenizer; captions are
single sentences, so the Treebank tokenizer alone reproduces it (and needs
no downloaded model data). A regex fallback covers environments without
nltk.
"""

from __future__ import annotations

import re

_tokenizer = None


def _get_tokenizer():
    global _tokenizer
    if _tokenizer is None:
        try:
            from nltk.tokenize import TreebankWordTokenizer

            _tokenizer = TreebankWordTokenizer()
        except ImportError:
            _tokenizer = _RegexTokenizer()
    return _tokenizer


class _RegexTokenizer:
    _PATTERN = re.compile(r"[a-z0-9]+(?:'[a-z]+)?|[^\sa-z0-9]")

    def tokenize(self, text):
        return self._PATTERN.findall(text)


def tokenize_caption(caption):
    """Lowercases and tokenizes one caption string."""
    return _get_tokenizer().tokenize(caption.lower())


def pack_captions(captions):
    """Packs token lists into the TFRecord token-buffer framing
    (buffer + per-caption offset/length; reference
    create_coco_tf_record.py:79-87)."""
    tokens, offsets, lengths = [], [], []
    for cap in captions:
        toks = tokenize_caption(cap) if isinstance(cap, str) else list(cap)
        offsets.append(len(tokens))
        lengths.append(len(toks))
        tokens.extend(toks)
    return tokens, offsets, lengths
