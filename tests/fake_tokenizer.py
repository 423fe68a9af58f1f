"""Character-level fake tokenizer with llama-like API for pipeline tests.

Designed so preprocess_v1's round-length arithmetic is exactly consistent:
- ids = [BOS] + one id per character, with "</s>" collapsed to the EOS id
  and a small set of special strings collapsed to single ids
- legacy=True (no tokenizers>=0.14 off-by-one adjustment)
With that, cur_len == total_len at the end of masking and no sample is
dropped by the mismatch guard.
"""
from __future__ import annotations

from typing import List


class _Enc:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    PRINTABLE_OFFSET = 10
    SPECIALS = {
        "</s>": 2,
        "<unk>": 3,
        "<image>": 310,
        "</image>": 311,
        "<slice>": 312,
        "</slice>": 313,
        "<im_patch>": 314,
        "<im_start>": 315,
        "<im_end>": 316,
    }

    def __init__(self, model_max_length: int = 4096):
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.unk_token_id = 3
        self.bos_token = "<s>"
        self.eos_token = "</s>"
        self.unk_token = "<unk>"
        self.model_max_length = model_max_length
        self.legacy = True
        self.vocab_size = 400
        self._id_to_special = {v: k for k, v in self.SPECIALS.items()}

    def _char_ids(self, text: str) -> List[int]:
        ids = []
        i = 0
        while i < len(text):
            matched = False
            for tok, tid in self.SPECIALS.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
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
        if token in self.SPECIALS:
            return self.SPECIALS[token]
        if len(token) == 1:
            return self.PRINTABLE_OFFSET + (ord(token) % 256)
        return 399

    def apply_chat_template(self, turns, tokenize=False,
                            add_generation_prompt=False):
        # zephyr-style template
        out = ""
        for t in turns:
            out += f"<|{t['role']}|>\n{t['content']}</s>\n"
        if add_generation_prompt:
            out += "<|assistant|>\n"
        if tokenize:
            return [self.bos_token_id] + self._char_ids(out)
        return out

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i in self._id_to_special:
                if not (skip_special_tokens and i in (2, 3)):
                    out.append(self._id_to_special[i])
            elif i >= self.PRINTABLE_OFFSET and i < 300:
                out.append(chr((i - self.PRINTABLE_OFFSET) % 256))
        return "".join(out)
