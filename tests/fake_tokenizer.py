"""Character-level fake tokenizer with llama-like API for pipeline tests.

Designed so preprocess_v1's round-length arithmetic is exactly consistent:
- ids = [BOS] + one id per character, with "</s>" collapsed to the EOS id
- legacy=True (no tokenizers>=0.14 off-by-one adjustment)
With that, cur_len == total_len at the end of masking and no sample is
dropped by the mismatch guard.
"""
from __future__ import annotations

import dataclasses
from typing import List


class _Enc:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    PRINTABLE_OFFSET = 10

    def __init__(self, model_max_length: int = 4096):
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.unk_token_id = 3
        self.model_max_length = model_max_length
        self.legacy = True
        self.vocab_size = 256 + self.PRINTABLE_OFFSET

    def _char_ids(self, text: str) -> List[int]:
        ids = []
        i = 0
        while i < len(text):
            if text.startswith("</s>", i):
                ids.append(self.eos_token_id)
                i += 4
            else:
                ids.append(self.PRINTABLE_OFFSET + (ord(text[i]) % 256))
                i += 1
        return ids

    def __call__(self, text, **kw):
        if isinstance(text, list):
            return _Enc([[self.bos_token_id] + self._char_ids(t) for t in text])
        return _Enc([self.bos_token_id] + self._char_ids(text))

    def encode(self, text: str):
        return self(text).input_ids

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.eos_token_id:
                out.append("</s>")
            elif i >= self.PRINTABLE_OFFSET:
                out.append(chr((i - self.PRINTABLE_OFFSET) % 256))
        return "".join(out)
