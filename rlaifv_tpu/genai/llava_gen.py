"""LLaVA-1.5 diverse generation + yes/no autocheck reward scoring.

Rebuild of the DDP inference engine (ref: muffin/llava15_gen_data.py:152-406)
as batched decode over the jitted engine:

- diverse gen: N samples/question (repeat_time, GenDataset), T=0.7, 512 new
  tokens (llava15_diverse_gen.sh:25-36);
- autocheck: 1-token greedy prefill, softmax mass on the {yes,Yes,no,No}
  token ids (:266-313) — the reward signal of the whole feedback loop;
- output jsonl rows keep the reference field names so the downstream
  pair-construction stage interoperates (:314-353).

Data parallelism: contiguous rank shards (shard_indices) + merged write,
replacing torchrun/NCCL all_gather_object (:388-404).
"""
from __future__ import annotations

from typing import List

import numpy as np

from rlaifv_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)
from rlaifv_tpu.data import conversation as conversation_lib
from rlaifv_tpu.data.datasets import GenDataset, shard_indices
from rlaifv_tpu.data.image_processing import ClipImageProcessor, decode_image
from rlaifv_tpu.data.multimodal import expand_image_sentinels, tokenizer_image_token
from rlaifv_tpu.genai.engine import DecodeEngine, group_consecutive
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.utils.file_io import write_jsonlines


def wrap_question_for_llava15(
    question: str, tokenizer, mm_use_im_start_end: bool = False,
    conv_mode: str = "llava_v1",
) -> List[int]:
    """Prompt build + image-token splice (ref :152-170)."""
    qs = question.replace(DEFAULT_IMAGE_TOKEN, "")
    if mm_use_im_start_end:
        qs = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
              + DEFAULT_IM_END_TOKEN + "\n" + qs)
    else:
        qs = DEFAULT_IMAGE_TOKEN + "\n" + qs
    conv = conversation_lib.conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    return tokenizer_image_token(conv.get_prompt(), tokenizer)


def yesno_token_ids(tokenizer) -> dict:
    """Token ids for {yes,Yes,no,No} following '<s> ' (ref :266-269)."""
    return {
        word: tokenizer.encode(f"<s> {word}")[-1]
        for word in ("yes", "Yes", "no", "No")
    }


class Llava15Generator:
    """Batched generation over a converted LLaVA-1.5 checkpoint."""

    def __init__(self, model, params, tokenizer, num_patches: int,
                 image_size: int = 336, checkpoint_name: str = "",
                 fused_decode: bool = False):
        self.model = model
        self.tokenizer = tokenizer
        self.num_patches = num_patches
        self.processor = ClipImageProcessor(image_size=image_size)
        # fused_decode: whole-layer-stack Pallas decode kernel (needs an
        # int8 fuse_proj checkpoint with int8 KV cache, ops/fused_decode.py)
        self.engine = DecodeEngine(
            model, params,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id or 0,
            fused_decode=fused_decode,
        )
        self.checkpoint_name = checkpoint_name

    # ------------------------------------------------------------ helpers

    def _prepare(self, items: List[dict]):
        prompts, starts, images = [], [], []
        for item in items:
            ids = wrap_question_for_llava15(item["question"], self.tokenizer)
            ex = expand_image_sentinels(ids, None, self.num_patches)
            prompts.append(ex["input_ids"].tolist())
            starts.append(int(ex["image_start"]))
            # resize-only uint8: normalization happens on device
            # (encode_images), halving the upload vs bf16
            images.append(self.processor.resize_uint8(decode_image(
                item.get("image_bytes") or item.get("image")
            )))
        return prompts, np.asarray(starts), np.stack(images)

    def _meta_row(self, item: dict, **fields) -> dict:
        meta = item.get("metainfos", item.get("metainfo", {}))
        if (isinstance(meta, dict) and "image_path" not in meta
                and item.get("image_path")):
            # ref GenDataset folds top-level image_path into metainfos
            # (llava15_gen_data.py:133) -- downstream autocheck needs it
            meta = {**meta, "image_path": item["image_path"]}
        row = {"question_id": item.get("question_id")}
        if isinstance(meta, dict) and "ds_question_id" in meta:
            row["ds_question_id"] = meta["ds_question_id"]
        elif "ds_question_id" in item:
            row["ds_question_id"] = item["ds_question_id"]
        row["raw_question"] = item["question"]
        row.update(fields)
        row["metainfos"] = meta
        row["model_path"] = self.checkpoint_name
        return row

    # ------------------------------------------------------------ modes

    def diverse_gen(self, items: List[dict], *, temperature: float = 0.7,
                    max_new_tokens: int = 512, batch_size: int = 8,
                    seed: int = 0, continuous: bool = False,
                    share_repeats: bool = True) -> List[dict]:
        """continuous=True uses slot-refill continuous batching: each
        finished row is immediately replaced from the item queue instead of
        waiting for its batch's slowest row (genai/continuous.py).

        share_repeats=True (batch path): GenDataset expands each question
        x repeat_time IDENTICAL prompts (ref muffin/llava15_gen_data.py:
        64-150, default 10) — consecutive identical (question, image) items
        run through engine.generate_repeated: ONE prefill + ONE vision
        encode, n sampled continuations decoded as one batch."""
        sp = SamplingParams(temperature=temperature, do_sample=True)
        # generate_repeated requires the non-fused KV layout (it raises on
        # fused engines) — fused engines fall through to the plain batch path
        if not continuous and share_repeats and not self.engine.fused_decode:
            groups = group_consecutive(items, with_question=True)
            if any(len(g) >= 2 for g in groups):
                out: List[dict] = [None] * len(items)
                singles: List[int] = []
                cap = max(batch_size, 16)
                for group in groups:
                    if len(group) < 2:
                        singles.extend(group)
                        continue
                    prompts, starts, images = self._prepare(
                        [items[group[0]]]
                    )
                    for c0 in range(0, len(group), cap):
                        sub = group[c0 : c0 + cap]
                        res = self.engine.generate_repeated(
                            prompts[0], n=len(sub), image=images[0],
                            image_start=int(starts[0]), sampling=sp,
                            max_new_tokens=max_new_tokens,
                            seed=seed + sub[0],
                        )
                        for b, i in enumerate(sub):
                            out[i] = self._meta_row(
                                items[i],
                                answer=self.tokenizer.decode(
                                    res.tokens[b][: res.lengths[b]],
                                    skip_special_tokens=True,
                                ).strip(),
                            )
                for s0 in range(0, len(singles), batch_size):
                    sub = singles[s0 : s0 + batch_size]
                    chunk = [items[i] for i in sub]
                    prompts, starts, images = self._prepare(chunk)
                    res = self.engine.generate(
                        prompts, images=images, image_starts=starts,
                        sampling=sp, max_new_tokens=max_new_tokens,
                        seed=seed + s0,
                    )
                    for b, i in enumerate(sub):
                        out[i] = self._meta_row(
                            items[i],
                            answer=self.tokenizer.decode(
                                res.tokens[b][: res.lengths[b]],
                                skip_special_tokens=True,
                            ).strip(),
                        )
                return out
        if continuous:
            prompts, starts, images = self._prepare(items)
            # share_keys: identical (question, image) items — the 10x
            # repeat expansion — share one prefill per refill wave
            share_keys = None
            if share_repeats:
                share_keys = [None] * len(items)
                for g, idxs in enumerate(
                    group_consecutive(items, with_question=True)
                ):
                    for i in idxs:
                        share_keys[i] = g
            res = self.engine.generate_continuous(
                prompts, images=images, image_starts=starts,
                slots=batch_size, sampling=sp,
                max_new_tokens=max_new_tokens, seed=seed,
                share_keys=share_keys,
            )
            return [
                self._meta_row(item, answer=self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip())
                for b, item in enumerate(items)
            ]
        out = []
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            prompts, starts, images = self._prepare(chunk)
            res = self.engine.generate(
                prompts, images=images, image_starts=starts,
                sampling=sp, max_new_tokens=max_new_tokens, seed=seed + i,
            )
            for b, item in enumerate(chunk):
                text = self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip()
                out.append(self._meta_row(item, answer=text))
        return out

    def greedy_gen(self, items: List[dict], *, max_new_tokens: int = 1024,
                   batch_size: int = 8, num_beams: int = 1,
                   continuous: bool = False) -> List[dict]:
        """Deterministic benchmark decoding (ref muffin_vqa.py: T=0; the
        eval scripts pass beam 3 — num_beams>1 uses the KV-cached beam)."""
        if continuous and num_beams == 1:
            prompts, starts, images = self._prepare(items)
            res = self.engine.generate_continuous(
                prompts, images=images, image_starts=starts,
                slots=batch_size, sampling=SamplingParams.greedy(),
                max_new_tokens=max_new_tokens,
            )
            return [
                self._meta_row(item, answer=self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip())
                for b, item in enumerate(items)
            ]
        out = []
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            prompts, starts, images = self._prepare(chunk)
            if num_beams > 1:
                res = self.engine.generate_beam(
                    prompts, images=images, image_starts=starts,
                    num_beams=num_beams, max_new_tokens=max_new_tokens,
                )
            else:
                res = self.engine.generate(
                    prompts, images=images, image_starts=starts,
                    sampling=SamplingParams.greedy(),
                    max_new_tokens=max_new_tokens,
                )
            for b, item in enumerate(chunk):
                text = self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip()
                out.append(self._meta_row(item, answer=text))
        return out

    def _score_rows(self, items, logits, ids) -> List[dict]:
        """first-position logits (N, V) -> output rows with yes/no scores
        (softmax over the full vocab, ref muffin/llava15_gen_data.py:305-313)
        and the 1-token greedy answer text."""
        logits = np.asarray(logits, np.float64)
        logits -= logits.max(axis=-1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(axis=-1, keepdims=True)
        out = []
        for b, item in enumerate(items):
            text = self.tokenizer.decode(
                [int(logits[b].argmax())], skip_special_tokens=True
            ).strip()
            scores = {w: float(probs[b, t]) for w, t in ids.items()}
            out.append(self._meta_row(item, answer=text, scores=scores))
        return out

    def autocheck(self, items: List[dict], *, batch_size: int = 8,
                  shared_prefix: bool = True) -> List[dict]:
        """1-token reward scoring: p(yes/Yes/no/No) at the first position.

        shared_prefix=True (default): consecutive items about the SAME image
        (the autocheck jsonl is fact-expanded, so each image appears once per
        fact — dozens of rows) share everything up to the last image token
        (system prompt + 576 image tokens ≈ 90% of the prompt; the fact
        question differs only AFTER the image). The prefix KV is prefilled
        once per image and broadcast; only the short question suffixes run
        per fact (engine.score_shared_prefix) — same scores, a fraction of
        the prefill FLOPs and ONE vision encode per image. Exact split:
        tokenizer_image_token tokenizes the pre-/post-image chunks
        independently, so prefix+suffix == the full prompt's ids.
        """
        ids = yesno_token_ids(self.tokenizer)
        if not shared_prefix or self.engine.fused_decode:
            out = []
            for i in range(0, len(items), batch_size):
                chunk = items[i : i + batch_size]
                prompts, starts, images = self._prepare(chunk)
                res = self.engine.generate(
                    prompts, images=images, image_starts=starts,
                    sampling=SamplingParams.greedy(), max_new_tokens=1,
                )
                out.extend(self._score_rows(chunk, res.first_logits, ids))
            return out

        out: List[dict] = [None] * len(items)
        # group CONSECUTIVE items by image identity (the reference jsonl
        # groups facts of one answer together)
        for group in group_consecutive(items):
            chunk = [items[i] for i in group]
            prompts, starts, images = self._prepare(chunk)
            P = int(starts[0]) + self.num_patches
            prefixes = [p[:P] for p in prompts]
            same = all(
                s == starts[0] and pre == prefixes[0]
                for s, pre in zip(starts, prefixes)
            )
            if not same or len(group) < 2:
                # heterogeneous templates (or a lone row): plain path
                res = self.engine.generate(
                    prompts, images=images, image_starts=starts,
                    sampling=SamplingParams.greedy(), max_new_tokens=1,
                )
                rows = self._score_rows(chunk, res.first_logits, ids)
            else:
                logits = self.engine.score_shared_prefix(
                    prefixes[0], [p[P:] for p in prompts],
                    image=images[0], image_start=int(starts[0]),
                    batch_size=batch_size,
                )
                rows = self._score_rows(chunk, logits, ids)
            for j, i in enumerate(group):
                out[i] = rows[j]
        return out


def run(
    generator: Llava15Generator,
    ds: GenDataset,
    answer_file: str,
    *,
    is_yesno: bool = False,
    batch_size: int = 8,
    temperature: float = 0.7,
    max_tokens: int = 512,
    rank: int = 0,
    world_size: int = 1,
) -> List[dict]:
    """Shard -> generate -> write '{answer_file}.rank{r}' (merge with cat,
    matching the reference chunk-file contract, P4 in SURVEY §2.6)."""
    local = [ds[i] for i in shard_indices(len(ds), world_size, rank)]
    if is_yesno:
        rows = generator.autocheck(local, batch_size=batch_size)
    else:
        rows = generator.diverse_gen(
            local, temperature=temperature, max_new_tokens=max_tokens,
            batch_size=batch_size, seed=rank,
        )
    path = answer_file if world_size == 1 else f"{answer_file}.rank{rank}"
    write_jsonlines(path, rows)
    return rows
