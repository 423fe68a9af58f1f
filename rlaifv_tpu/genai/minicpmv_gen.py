"""MiniCPM-Llama3-V 2.5 diverse generation + autocheck reward scoring.

Rebuild of the reference drivers (ref: minicpm-llama3-v-25/
minicpmv_diverse_gen.py:27-196 and minicpmv_autocheck.py:85-195):
slice-mode prompt assembly, per-slice encode via the fused device image
kernel, llama3 chat template, sampling decode / 1-token yes/no scoring
(ids taken from '{bos}yes' etc., autocheck.py:169-177). Chunked fan-out is
handled by GenDataset(chunk_num/chunk_idx) + the jsonl merge contract.
"""
from __future__ import annotations

from typing import List

import numpy as np

from rlaifv_tpu.constants import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from rlaifv_tpu.data.image_processing import decode_image
from rlaifv_tpu.data.minicpmv_slicing import (
    get_image_placeholder,
    slice_image,
)
from rlaifv_tpu.genai.engine import DecodeEngine, group_consecutive
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.minicpmv import find_unk_spans


class MiniCPMVChat:
    """MiniCPM-Llama3-V 2.5 chat from a real-format checkpoint directory
    (framework extension: the reference chat.py covers only 7B/12B and
    drives MiniCPM-V through remote code — this is the same capability,
    loaded natively)."""

    def __init__(self, model_path: str, *, tokenizer=None,
                 max_new_tokens: int = 1024, int8: bool = False,
                 int4: bool = False, int4_smooth: bool = False,
                 fused_decode: bool = False):
        from rlaifv_tpu.models.convert import (
            convert_minicpmv,
            fuse_llm_projections,
            load_state_dict_dir,
            minicpmv_config_from_hf,
            quantize_llm_int4,
            quantize_llm_int8,
        )
        from rlaifv_tpu.models.minicpmv import MiniCPMVForCausalLM

        # int8/int4: single-chip serving (the bf16 Llama3-8B LM alone is
        # 16G); fused_decode: the multi-layer kernel (implies a quantized
        # base)
        if fused_decode and not (int8 or int4):
            int8 = True
        overrides = {}
        if int8 or int4:
            overrides["llm"] = dict(
                quantize=True, quantize_bits=4 if int4 else 8,
                quantize_lm_head=False, kv_cache_dtype="int8",
                fuse_proj=fused_decode,
            )
        cfg = minicpmv_config_from_hf(model_path, **overrides)
        model = MiniCPMVForCausalLM(cfg)
        params = convert_minicpmv(load_state_dict_dir(model_path))
        if int4 and int4_smooth:
            # AWQ-style activation-aware smoothing before quantization
            # (models/quant_smooth.py) — zero runtime cost, folds into
            # gammas/up columns; calibrated on one short forward
            from rlaifv_tpu.models.quant_smooth import (
                smooth_quantize_for_serving,
            )

            params = {**params, "llm": smooth_quantize_for_serving(
                cfg.llm, params["llm"], tokenizer)}
        elif int4:
            params = {**params, "llm": quantize_llm_int4(params["llm"])}
        elif int8:
            params = {**params, "llm": quantize_llm_int8(
                params["llm"], include_lm_head=False)}
        if fused_decode:
            params = {**params, "llm": fuse_llm_projections(params["llm"])}
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.gen = MiniCPMVGenerator(
            model, params, tokenizer, checkpoint_name=model_path,
            fused_decode=fused_decode,
        )
        self.max_new_tokens = max_new_tokens

    def chat(self, input: dict) -> str:
        return self.gen.chat(
            input["question"], input["image"],
            max_new_tokens=self.max_new_tokens,
        )


class MiniCPMVGenerator:
    def __init__(self, model, params, tokenizer, *, checkpoint_name: str = "",
                 fused_decode: bool = False):
        self.model = model
        self.cfg = model.cfg
        self.tokenizer = tokenizer
        self.unk_id = tokenizer.convert_tokens_to_ids("<unk>")
        self._mean = np.asarray(OPENAI_CLIP_MEAN, np.float32)
        self._std = np.asarray(OPENAI_CLIP_STD, np.float32)
        self.engine = DecodeEngine(
            model, params,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id or 0,
            fused_decode=fused_decode,
        )
        # under fused_decode the engine CONSUMES the per-layer LLM kernels
        # into the stacked arrays — hold its stripped tree, not the donated
        # original (the vision/resampler leaves the encode path needs are
        # untouched by the strip)
        self.params = self.engine.params
        self.checkpoint_name = checkpoint_name
        import jax

        self._encode = jax.jit(
            lambda p, imgs: model.apply(
                {"params": p}, imgs, method=model.encode_slices
            )
        )

    # ---------------------------------------------------------- prompts

    def _build_prompt(self, item: dict):
        """-> (ids, span_starts list, slice images list)."""
        image = decode_image(item.get("image_bytes") or item.get("image"))
        if self.cfg.slice_mode:
            source, patches, grid = slice_image(
                image,
                self.cfg.max_slice_nums,
                self.cfg.scale_resolution,
                self.cfg.patch_size,
            )
            slices = [source] + patches
            placeholder = get_image_placeholder(grid, self.cfg.query_num)
        else:
            slices = [image]
            placeholder = get_image_placeholder(None, self.cfg.query_num)

        content = placeholder + "\n" + item["question"]
        msgs = [{"role": "user", "content": content}]
        ids = self.tokenizer.apply_chat_template(
            msgs, tokenize=True, add_generation_prompt=True
        )
        starts = find_unk_spans(ids, self.unk_id, self.cfg.query_num)
        return ids, starts, slices

    def _normalize(self, arr: np.ndarray) -> np.ndarray:
        """ToTensor+Normalize only — slices are already target-sized by the
        plan (ref: model.transform on slice images, autocheck.py:124)."""
        return ((arr.astype(np.float32) / 255.0) - self._mean) / self._std

    def _prepare(self, items: List[dict]):
        prompts, all_starts, slice_arrays, slice_counts = [], [], [], []
        for item in items:
            ids, starts, slices = self._build_prompt(item)
            prompts.append(ids)
            all_starts.append(starts)
            slice_counts.append(len(slices))
            slice_arrays.extend(np.asarray(s, np.uint8) for s in slices)

        # encode slices grouped by (H, W): one compiled program per bucket
        total = len(slice_arrays)
        feats = [None] * total
        groups = {}
        for i, arr in enumerate(slice_arrays):
            groups.setdefault(arr.shape[:2], []).append(i)
        for shape, idxs in groups.items():
            batch = np.stack([self._normalize(slice_arrays[i]) for i in idxs])
            enc = np.asarray(self._encode(self.params, batch))
            for pos, i in enumerate(idxs):
                feats[i] = enc[pos]
        feats = np.stack(feats)  # (total_slices, Q, D)

        S = max(len(s) for s in all_starts)
        B = len(items)
        D = feats.shape[-1]
        span_features = np.zeros((B, S, self.cfg.query_num, D), feats.dtype)
        span_starts = np.full((B, S), -1, np.int32)
        cursor = 0
        for b in range(B):
            n = slice_counts[b]
            for si, st in enumerate(all_starts[b][:n]):
                span_features[b, si] = feats[cursor + si]
                span_starts[b, si] = st
            cursor += n
        return prompts, span_features, span_starts

    # ---------------------------------------------------------- modes

    def diverse_gen(self, items, *, temperature=0.7, max_new_tokens=512,
                    batch_size=4, seed=0, continuous=False,
                    share_repeats: bool = True) -> List[dict]:
        sp = SamplingParams(temperature=temperature, do_sample=True,
                            repetition_penalty=1.05)
        if not continuous and share_repeats:
            groups = group_consecutive(items, with_question=True)
            if any(len(g) >= 2 for g in groups):
                out: List[dict] = [None] * len(items)
                singles: List[int] = []
                cap = max(batch_size, 16)
                for group in groups:
                    if len(group) < 2:
                        singles.extend(group)
                        continue
                    # one slice encode + one prefill per repeat group
                    prompts, feats, starts = self._prepare([items[group[0]]])
                    active = int((starts[0] >= 0).sum())
                    for c0 in range(0, len(group), cap):
                        sub = group[c0 : c0 + cap]
                        res = self.engine.generate_repeated(
                            prompts[0], n=len(sub),
                            span_features=feats[0][:active],
                            span_starts=starts[0][:active],
                            sampling=sp, max_new_tokens=max_new_tokens,
                            seed=seed + sub[0],
                        )
                        for b, i in enumerate(sub):
                            out[i] = self._row(
                                items[i],
                                answer=self.tokenizer.decode(
                                    res.tokens[b][: res.lengths[b]],
                                    skip_special_tokens=True,
                                ).strip(),
                            )
                for s0 in range(0, len(singles), batch_size):
                    sub = singles[s0 : s0 + batch_size]
                    chunk = [items[i] for i in sub]
                    prompts, feats, starts = self._prepare(chunk)
                    res = self.engine.generate(
                        prompts, span_features=feats, span_starts=starts,
                        sampling=sp, max_new_tokens=max_new_tokens,
                        seed=seed + s0,
                    )
                    for b, i in enumerate(sub):
                        out[i] = self._row(
                            chunk[b],
                            answer=self.tokenizer.decode(
                                res.tokens[b][: res.lengths[b]],
                                skip_special_tokens=True,
                            ).strip(),
                        )
                return out
        if continuous:
            prompts, feats, starts = self._prepare(items)
            res = self.engine.generate_continuous(
                prompts, span_features=feats, span_starts=starts,
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
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            prompts, feats, starts = self._prepare(chunk)
            res = self.engine.generate(
                prompts, span_features=feats, span_starts=starts,
                sampling=sp, max_new_tokens=max_new_tokens, seed=seed + i,
            )
            for b, item in enumerate(chunk):
                text = self.tokenizer.decode(
                    res.tokens[b][: res.lengths[b]], skip_special_tokens=True
                ).strip()
                out.append(self._row(item, answer=text))
        return out

    def _yesno_ids(self):
        return {
            w: self.tokenizer.encode(f"{self.tokenizer.bos_token}{w}")[-1]
            for w in ("yes", "Yes", "no", "No")
        }

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

    def autocheck(self, items, *, batch_size=1,
                  shared_prefix: bool = True) -> List[dict]:
        """shared_prefix=True: fact questions about the same image share the
        sliced-image placeholder prefix (every slice's SigLIP encode AND its
        prefill), so the prefix KV is computed once per image and only the
        question suffixes prefill per fact (engine.score_shared_prefix).
        The split is the group's longest common token prefix — exact, since
        each row's full tokenization is sliced, never re-tokenized."""
        ids = self._yesno_ids()
        if not shared_prefix:
            out = []
            for i in range(0, len(items), batch_size):
                chunk = items[i : i + batch_size]
                prompts, feats, starts = self._prepare(chunk)
                res = self.engine.generate(
                    prompts, span_features=feats, span_starts=starts,
                    sampling=SamplingParams.greedy(), max_new_tokens=1,
                )
                for b, item in enumerate(chunk):
                    out.append(self._score_row(item, res.first_logits[b], ids))
            return out

        out: List[dict] = [None] * len(items)
        sb = max(batch_size, 4)  # suffix rows are tiny; don't run them 1-up
        for group in group_consecutive(items):
            chunk = [items[i] for i in group]
            # span bounds come from tokenization alone — decide shared vs
            # fallback BEFORE paying any SigLIP slice encode
            built = [self._build_prompt(it) for it in chunk]
            prompts = [b[0] for b in built]
            P = self.engine.longest_common_prefix_len(prompts)
            active = [int(s) for s in built[0][1]]
            last_span_end = (max(active) + self.cfg.query_num) if active else 0
            if len(group) < 2 or last_span_end > P:
                for i0 in range(0, len(chunk), batch_size):
                    sub = chunk[i0 : i0 + batch_size]
                    pr, f, st = self._prepare(sub)
                    res = self.engine.generate(
                        pr, span_features=f, span_starts=st,
                        sampling=SamplingParams.greedy(), max_new_tokens=1,
                    )
                    for b, item in enumerate(sub):
                        out[group[i0 + b]] = self._score_row(
                            item, res.first_logits[b], ids
                        )
                continue
            # shared path confirmed: ONE representative encode per group
            _, feats, starts = self._prepare(chunk[:1])
            logits = self.engine.score_shared_prefix(
                prompts[0][:P], [p[P:] for p in prompts],
                span_features=feats[0], span_starts=starts[0],
                batch_size=sb,
            )
            for j, i in enumerate(group):
                out[i] = self._score_row(chunk[j], logits[j], ids)
        return out

    def chat(self, question: str, image, *, max_new_tokens: int = 1024,
             seed: int = 0) -> str:
        """Single-image QA through the sliced multimodal path (the reference
        drives MiniCPM-V via model.chat(), minicpmv_diverse_gen.py:121-140;
        sampling defaults follow its chat call: T 0.7, top-p 0.8,
        repetition 1.05)."""
        prompts, feats, starts = self._prepare(
            [{"question": question, "image": image, "question_id": 0}]
        )
        sp = SamplingParams(temperature=0.7, top_p=0.8, do_sample=True,
                            repetition_penalty=1.05)
        res = self.engine.generate(
            prompts, span_features=feats, span_starts=starts,
            sampling=sp, max_new_tokens=max_new_tokens, seed=seed,
        )
        return self.tokenizer.decode(
            res.tokens[0][: res.lengths[0]], skip_special_tokens=True
        ).strip()

    def _row(self, item, **fields):
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
