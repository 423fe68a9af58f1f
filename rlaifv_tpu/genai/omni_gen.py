"""OmniLMM-12B generation / autocheck engine + chat wrapper.

Rebuild of the OmniLMM paths (ref: omnilmm/omnilmm_gen_data.py:182-369;
chat.py:23-137 RLAIFV12B). Prompt building: the <image> marker (or a
prepended one) expands to literal <im_start><im_patch>*N<im_end> tokens
(chat.py:62-70), the zephyr chat template renders via omni_preprocess
with generation=True, and decode runs through the shared engine.

Yes/no ids come from tokenizing '\\n<|assistant|>\\nyes' etc. and taking the
final token (ref omnilmm_gen_data.py:236-239).
"""
from __future__ import annotations

from typing import List

import numpy as np

from rlaifv_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)
from rlaifv_tpu.data.image_processing import ClipImageProcessor, decode_image
from rlaifv_tpu.data.preprocess import omni_preprocess
from rlaifv_tpu.genai.engine import DecodeEngine, group_consecutive
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.omnilmm import find_image_start


def expand_question_multimodal(turns: List[dict], image_token_len: int) -> List[dict]:
    """Place the literal image-token span into the first turn
    (ref chat.py:62-70)."""
    span = (DEFAULT_IM_START_TOKEN
            + DEFAULT_IMAGE_PATCH_TOKEN * image_token_len
            + DEFAULT_IM_END_TOKEN)
    turns = [dict(t) for t in turns]
    if DEFAULT_IMAGE_TOKEN in turns[0]["content"]:
        turns[0]["content"] = turns[0]["content"].replace(
            DEFAULT_IMAGE_TOKEN, span
        )
    else:
        turns[0]["content"] = span + "\n" + turns[0]["content"]
    return turns


def wrap_question_for_omni_lmm(question, image_token_len: int, tokenizer):
    """question (str or chat turns) -> dict(input_ids, labels)
    (ref chat.py:72-86)."""
    if isinstance(question, str):
        question = [{"role": "user", "content": question}]
    turns = expand_question_multimodal(question, image_token_len)
    out = omni_preprocess([turns], tokenizer, generation=True)
    return {"input_ids": out["input_ids"][0], "labels": out["labels"][0]}


def omni_yesno_ids(tokenizer) -> dict:
    """(ref omnilmm_gen_data.py:236-239)."""
    return {
        w: tokenizer.encode(f"\n<|assistant|>\n{w}")[-1]
        for w in ("yes", "Yes", "no", "No")
    }


class OmniLMMGenerator:
    """Batched generation over a converted OmniLMM-12B checkpoint."""

    def __init__(self, model, params, tokenizer, *, image_size: int = 448,
                 checkpoint_name: str = "", fused_decode: bool = False):
        self.model = model
        self.tokenizer = tokenizer
        self.num_query = model.cfg.num_query
        self.im_patch_id = tokenizer.convert_tokens_to_ids(
            DEFAULT_IMAGE_PATCH_TOKEN
        )
        # eval transform: plain bicubic resize + CLIP norm, no pad
        # (ref build_transform is_train=False, omnilmm/model/utils.py:455-460)
        self.processor = ClipImageProcessor(
            image_size=image_size, aspect_ratio="square"
        )
        self.engine = DecodeEngine(
            model, params,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id or 0,
            fused_decode=fused_decode,
        )
        self.checkpoint_name = checkpoint_name

    def _prepare(self, items: List[dict]):
        prompts, starts, images = [], [], []
        for item in items:
            wrapped = wrap_question_for_omni_lmm(
                item["question"], self.num_query, self.tokenizer
            )
            ids = wrapped["input_ids"].tolist()
            prompts.append(ids)
            starts.append(find_image_start(ids, self.im_patch_id))
            images.append(self.processor(decode_image(
                item.get("image_bytes") or item.get("image")
            )))
        return prompts, np.asarray(starts, np.int32), np.stack(images)

    def generate(self, items: List[dict], *, sampling: SamplingParams,
                 max_new_tokens: int, batch_size: int = 8, seed: int = 0):
        rows = []
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            prompts, starts, images = self._prepare(chunk)
            res = self.engine.generate(
                prompts, images=images, image_starts=starts,
                sampling=sampling, max_new_tokens=max_new_tokens,
                seed=seed + i,
            )
            for b, item in enumerate(chunk):
                text = self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip()
                rows.append((item, text, res.first_logits[b]))
        return rows

    def generate_beam(self, items: List[dict], *, num_beams: int = 3,
                      sampling: SamplingParams = None,
                      max_new_tokens: int = 512, seed: int = 0):
        """Beam decode, optionally combined with sampling — the 12B chat
        mode is beams=3 WITH T 0.6/top-k 30/top-p 0.9/rep 1.1
        (ref chat.py:98-112)."""
        prompts, starts, images = self._prepare(items)
        res = self.engine.generate_beam(
            prompts, images=images, image_starts=starts,
            num_beams=num_beams, sampling=sampling,
            max_new_tokens=max_new_tokens, seed=seed,
        )
        return [
            (item, self.tokenizer.decode(
                res.tokens[b][: res.lengths[b]], skip_special_tokens=True
            ).strip())
            for b, item in enumerate(items)
        ]

    def diverse_gen(self, items, *, temperature=0.7, max_new_tokens=512,
                    batch_size=8, seed=0, continuous=False,
                    share_repeats: bool = True) -> List[dict]:
        sp = SamplingParams(temperature=temperature, do_sample=True)
        if not continuous and share_repeats:
            rows = self._diverse_gen_shared(
                items, sp, max_new_tokens, batch_size, seed
            )
            if rows is not None:
                return rows
        if continuous:
            prompts, starts, images = self._prepare(items)
            res = self.engine.generate_continuous(
                prompts, images=images, image_starts=starts,
                slots=batch_size, sampling=sp,
                max_new_tokens=max_new_tokens, seed=seed,
            )
            return [
                self._row(item, answer=self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip())
                for b, item in enumerate(items)
            ]
        out = []
        for item, text, _ in self.generate(
            items, sampling=sp, max_new_tokens=max_new_tokens,
            batch_size=batch_size, seed=seed,
        ):
            out.append(self._row(item, answer=text))
        return out

    def _score_row(self, item, logits, ids) -> dict:
        logits = np.asarray(logits, np.float64)
        logits -= logits.max()
        probs = np.exp(logits)
        probs /= probs.sum()
        text = self.tokenizer.decode(
            [int(logits.argmax())], skip_special_tokens=True
        ).strip()
        scores = {w: float(probs[t]) for w, t in ids.items()}
        return self._row(item, answer=text, scores=scores)

    def _diverse_gen_shared(self, items, sp, max_new_tokens, batch_size,
                            seed):
        """Shared prefill for repeat_time-identical prompts (one prefill +
        one EVA02 encode per group, engine.generate_repeated). Returns None
        when nothing is shareable (caller falls through to the plain path)."""
        groups = group_consecutive(items, with_question=True)
        if not any(len(g) >= 2 for g in groups):
            return None
        out: List[dict] = [None] * len(items)
        singles: List[int] = []
        cap = max(batch_size, 16)
        for group in groups:
            if len(group) < 2:
                singles.extend(group)
                continue
            prompts, starts, images = self._prepare([items[group[0]]])
            for c0 in range(0, len(group), cap):
                sub = group[c0 : c0 + cap]
                res = self.engine.generate_repeated(
                    prompts[0], n=len(sub), image=images[0],
                    image_start=int(starts[0]), sampling=sp,
                    max_new_tokens=max_new_tokens, seed=seed + sub[0],
                )
                for b, i in enumerate(sub):
                    out[i] = self._row(
                        items[i],
                        answer=self.tokenizer.decode(
                            res.tokens[b][: res.lengths[b]],
                            skip_special_tokens=True,
                        ).strip(),
                    )
        if singles:
            for j, (item, text, _) in enumerate(self.generate(
                [items[i] for i in singles], sampling=sp,
                max_new_tokens=max_new_tokens, batch_size=batch_size,
                seed=seed,
            )):
                out[singles[j]] = self._row(item, answer=text)
        return out

    def autocheck(self, items, *, batch_size=8,
                  shared_prefix: bool = True) -> List[dict]:
        """shared_prefix=True: fact questions about the same image share
        the template + image-token prefix (the question text comes AFTER
        <im_end>), so the prefix KV — including the EVA02+resampler encode —
        is computed once per image (engine.score_shared_prefix); split is
        exact because each item's full tokenization is sliced, never
        re-tokenized. Scores match the plain path (llava parity test scheme,
        tests/test_omni_gen.py)."""
        ids = omni_yesno_ids(self.tokenizer)
        if not shared_prefix:
            out = []
            for item, text, logits in self.generate(
                items, sampling=SamplingParams.greedy(), max_new_tokens=1,
                batch_size=batch_size,
            ):
                out.append(self._score_row(item, logits, ids))
            return out

        out: List[dict] = [None] * len(items)
        for group in group_consecutive(items):
            chunk = [items[i] for i in group]
            prompts, starts, images = self._prepare(chunk)
            # prefix ends right after <im_end> (start indexes the first
            # <im_patch>; the span is patches*num_query + <im_end>)
            P = int(starts[0]) + self.num_query + 1
            prefixes = [p[:P] for p in prompts]
            same = all(s == starts[0] and pre == prefixes[0]
                       for s, pre in zip(starts, prefixes))
            if not same or len(group) < 2:
                for j, (item, _text, logits) in enumerate(self.generate(
                    chunk, sampling=SamplingParams.greedy(),
                    max_new_tokens=1, batch_size=batch_size,
                )):
                    out[group[j]] = self._score_row(item, logits, ids)
                continue
            logits = self.engine.score_shared_prefix(
                prefixes[0], [p[P:] for p in prompts],
                image=images[0], image_start=int(starts[0]),
                batch_size=batch_size,
            )
            for j, i in enumerate(group):
                out[i] = self._score_row(chunk[j], logits[j], ids)
        return out

    def _row(self, item: dict, **fields) -> dict:
        meta = item.get("metainfos", item.get("metainfo", {}))
        if (isinstance(meta, dict) and "image_path" not in meta
                and item.get("image_path")):
            # ref GenDataset folds top-level image_path into metainfos
            # (llava15_gen_data.py:133) -- downstream autocheck needs it
            meta = {**meta, "image_path": item["image_path"]}
        row = {"question_id": item.get("question_id")}
        if isinstance(meta, dict) and "ds_question_id" in meta:
            row["ds_question_id"] = meta["ds_question_id"]
        row["raw_question"] = item["question"]
        row.update(fields)
        row["metainfos"] = meta
        row["model_path"] = self.checkpoint_name
        return row


class OmniLMMChat:
    """RLAIFV12B equivalent (ref chat.py:88-137): sample decode with
    T 0.6 / top-k 30 / top-p 0.9 / repetition 1.1, max 1024."""

    def __init__(self, model_path: str, *, tokenizer=None,
                 max_new_tokens: int = 1024, image_size: int = 448,
                 int8: bool = False, int4: bool = False,
                 int4_smooth: bool = False, fused_decode: bool = False):
        from rlaifv_tpu.models.convert import (
            convert_omnilmm,
            fuse_llm_projections,
            load_state_dict_dir,
            omnilmm_config_from_hf,
            quantize_llm_int4,
            quantize_llm_int8,
            quantize_vision_int4,
            quantize_vision_int8,
        )
        from rlaifv_tpu.models.omnilmm import OmniLMMForCausalLM

        # int8: the single-chip 12B serving config — weight-only int8 on
        # BOTH towers + int8 KV cache (bf16 12B cannot load on 16G;
        # scripts/bench_12b_serve.py measures this path at full geometry).
        # int4: same shape, half the weight footprint again (5.8G total
        # packed int4 + group scales) — decode speed AND memory headroom.
        # fused_decode: one Pallas kernel walks the Mistral stack per
        # decoded token (requires a quantized base; implies int8 unless
        # int4 is chosen).
        if fused_decode and not (int8 or int4):
            int8 = True
        bits = 4 if int4 else 8
        overrides = (dict(
            llm=dict(quantize=True, quantize_bits=bits,
                     quantize_lm_head=False, kv_cache_dtype="int8",
                     fuse_proj=fused_decode),
            vision=dict(quantize=True, quantize_bits=bits),
        ) if (int8 or int4) else {})
        cfg = omnilmm_config_from_hf(model_path, **overrides)
        model = OmniLMMForCausalLM(cfg)
        params = convert_omnilmm(load_state_dict_dir(model_path))
        if int4:
            if int4_smooth:
                # AWQ smoothing on the LM (models/quant_smooth.py);
                # vision towers keep plain group quant (LayerNorm+bias
                # producers don't admit the exact gamma fold)
                from rlaifv_tpu.models.quant_smooth import (
                    smooth_quantize_for_serving,
                )

                llm_q = smooth_quantize_for_serving(cfg.llm, params["llm"],
                                                    tokenizer)
            else:
                llm_q = quantize_llm_int4(params["llm"])
            params = {
                **params,
                "llm": llm_q,
                "vision_tower": quantize_vision_int4(params["vision_tower"]),
            }
        elif int8:
            params = {
                **params,
                "llm": quantize_llm_int8(params["llm"],
                                         include_lm_head=False),
                "vision_tower": quantize_vision_int8(params["vision_tower"]),
            }
        if fused_decode:
            params = {**params, "llm": fuse_llm_projections(params["llm"])}
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.gen = OmniLMMGenerator(
            model, params, tokenizer, image_size=image_size,
            checkpoint_name=model_path, fused_decode=fused_decode,
        )
        self.max_new_tokens = max_new_tokens

    def chat(self, input: dict) -> str:
        # ref chat.py:98-117: beam 3 COMBINED with sampling
        # (T 0.6/top-k 30/top-p 0.9/rep 1.1)
        rows = self.gen.generate_beam(
            [{"question": input["question"], "image": input["image"],
              "question_id": 0}],
            num_beams=3,
            sampling=SamplingParams.chat_12b(),
            max_new_tokens=self.max_new_tokens,
        )
        return rows[0][1]
