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

    def encode(self, text: str, add_special_tokens: bool = True):
        ids = self._char_ids(text)
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def convert_tokens_to_ids(self, token: str) -> int:
        # single-char tokens map to char ids; multi-char specials get
        # stable ids above the char range
        if len(token) == 1:
            return self.PRINTABLE_OFFSET + (ord(token) % 256)
        return 300 + (hash(token) % 100)

    def apply_chat_template(self, turns, tokenize=False,
                            add_generation_prompt=False) -> str:
        # zephyr-style template
        out = ""
        for t in turns:
            out += f"<|{t['role']}|>\n{t['content']}</s>\n"
        if add_generation_prompt:
            out += "<|assistant|>\n"
        return out

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.eos_token_id:
                out.append("</s>")
            elif i >= self.PRINTABLE_OFFSET:
                out.append(chr((i - self.PRINTABLE_OFFSET) % 256))
        return "".join(out)
