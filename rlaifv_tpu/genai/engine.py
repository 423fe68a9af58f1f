"""Batched KV-cache decode engine (prefill + jitted scan loop).

TPU-native replacement for HF `model.generate`
(ref: chat.py:169-178 beam/greedy chat decode; muffin/llava15_gen_data.py:
273-313 sampling + 1-token yes/no scoring). Conventions:

- prompts are LEFT-padded (like the reference's torch_pad_sequence with
  left flip, llava15_gen_data.py:21-36): every row's last prompt token sits
  at the same index, so one shared cache_index drives the decode scan while
  per-row position ids subtract the pad offset.
- the whole decode runs as one lax.scan of single-token steps over a
  static-shape cache — one compiled program per (batch, prompt_len,
  max_new) bucket.
- multimodal prefill splices precomputed vision features (encode once).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.genai.sampling import SamplingParams, sample_token

Array = jax.Array


def left_pad_batch(seqs, pad_id: int, length: Optional[int] = None):
    """List of 1-D int arrays -> (ids (B, L), mask (B, L)) left-padded."""
    L = length or max(len(s) for s in seqs)
    B = len(seqs)
    ids = np.full((B, L), pad_id, np.int32)
    mask = np.zeros((B, L), np.int32)
    for i, s in enumerate(seqs):
        s = np.asarray(s)[-L:]
        ids[i, L - len(s):] = s
        mask[i, L - len(s):] = 1
    return ids, mask


def group_consecutive(items, *, with_question: bool = False):
    """Indices of items sharing an image (and optionally the question),
    grouped regardless of position.

    The gen/autocheck jsonl layouts keep one image's rows together, but a
    pre-shuffled or interleaved file must not silently forfeit the
    shared-prefix fast path (SURVEY 'no silent caps'): items are grouped by
    key over the WHOLE list (first-seen key order, original order inside
    each group). Every caller restores output order by original index
    (`out[i] = ...`), so regrouping never reorders results. When
    non-consecutive duplicates were actually regrouped, one line is logged
    with the count."""
    groups: dict = {}
    for i, item in enumerate(items):
        # mirror the generators' _prepare fallback exactly (`image_bytes or
        # image`): an empty/falsy image_bytes must not group distinct images
        img = item.get("image_bytes") or item.get("image")
        if isinstance(img, np.ndarray):
            img = img.tobytes()
        key = (item["question"] if with_question else None, img,
               item.get("image_path"))
        try:
            hash(key)
        except TypeError:  # e.g. parquet-style {"bytes": ...} image dicts
            key = repr(key)
        groups.setdefault(key, []).append(i)
    out = list(groups.values())
    n_regrouped = sum(
        1 for g in out for a, b in zip(g, g[1:]) if b != a + 1
    )
    if n_regrouped:
        import logging

        logging.getLogger(__name__).info(
            "group_consecutive: regrouped %d non-consecutive shared rows "
            "(shuffled input; shared-prefix fast path preserved)",
            n_regrouped,
        )
    return out


@dataclasses.dataclass
class GenerateResult:
    tokens: np.ndarray  # (B, max_new) generated ids, pad after EOS
    lengths: np.ndarray  # (B,) #generated incl. EOS
    first_logits: np.ndarray  # (B, V) logits of the first generated position


class DecodeEngine:
    """Wraps a multimodal causal LM for batched generation."""

    def __init__(
        self,
        model,
        params,
        *,
        eos_id: int = 2,
        pad_id: int = 0,
        vocab_size: Optional[int] = None,
        fused_decode: bool = False,
        consume_params: bool = True,
    ):
        self.model = model
        self.params = params
        self.eos_id = eos_id
        self.pad_id = pad_id
        self._multimodal = hasattr(model.cfg, "llm")  # wrapped LM vs bare LM
        llm_cfg = model.cfg.llm if self._multimodal else model.cfg
        self.vocab_size = vocab_size or llm_cfg.vocab_size
        self._gen_fns = {}
        self.fused_decode = fused_decode
        self._fused_stacked = None
        if fused_decode:
            # one Pallas kernel walks the whole layer stack per decoded
            # token (ops/fused_decode.py) — int8 fused-proj models (MHA or
            # GQA) with an int8 KV cache
            ok = (llm_cfg.quantize and llm_cfg.fuse_proj
                  and llm_cfg.kv_cache_dtype == "int8"
                  and llm_cfg.num_heads % llm_cfg.num_kv_heads == 0)
            if not ok:
                raise ValueError(
                    "fused_decode requires quantize + fuse_proj + int8 KV "
                    "cache (num_heads must be a multiple of num_kv_heads)"
                )
            from rlaifv_tpu.ops.fused_decode import (
                stack_llama_params,
                strip_llm_kernels,
            )

            llm_params = params["llm"] if self._multimodal else params
            # the per-layer kernels move INTO the stacked arrays: holding
            # both layouts of a 7B int8 model OOMs a 16G chip, so with
            # consume_params (default) the stacking DONATES the per-layer
            # kernel buffers (the caller's tree keeps only the small
            # non-kernel leaves — drop any other reference to it). The
            # flax prefill paths rebuild per-layer kernel views from the
            # stacked arrays inside jit (_fused_prefill_tower).
            self._fused_stacked = stack_llama_params(
                llm_params, llm_cfg, consume=consume_params
            )
            stripped = strip_llm_kernels(llm_params, llm_cfg)
            self.params = ({**params, "llm": stripped} if self._multimodal
                           else stripped)

    def _fused_prefill_tower(self, params, stacked, scache, embeds, mask,
                             pos, col_start, slot_ids=None, n_slots=0):
        """Run a prompt window through the layer stack, writing each
        layer's int8 KV straight into the stacked h-major cache (the
        write-through prefill: the per-layer cache layout never exists
        beyond one layer's (R, Lp) window, so prefill peak memory is
        weights + ONE stacked cache, not two cache layouts). Runs as one
        lax.scan over the stacked weights — temps bounded to one layer's
        (ops/fused_decode.py::stacked_prefill_tower, bit-identical to the
        per-layer flax prefill).

        Returns (final hidden states (R, Lp, D) pre-ln_f, scache). Call
        inside jit with `scache` donated."""
        del params  # the layer stack reads only the stacked arrays
        from rlaifv_tpu.ops.fused_decode import stacked_prefill_tower

        return stacked_prefill_tower(
            stacked, scache, embeds, mask, pos, self._llm_cfg(), col_start,
            slot_ids=slot_ids, n_slots=n_slots,
        )

    def _embed_spliced(self, params, ids, images, image_starts,
                       span_features, span_starts):
        """Token embeddings with vision features spliced in (None-media
        falls through to plain embeddings)."""
        embeds = self._embed(params, jnp.maximum(ids, 0))
        if span_features is not None:
            from rlaifv_tpu.models.minicpmv import splice_multi_span

            return splice_multi_span(embeds, span_features, span_starts)
        if images is not None:
            from rlaifv_tpu.models.llava import splice_image_features

            feats = self.model.apply(
                {"params": params}, images, method=self.model.encode_images
            )
            return splice_image_features(embeds, feats, image_starts)
        return embeds

    def _llm_cfg(self):
        return self.model.cfg.llm if self._multimodal else self.model.cfg

    def _embed(self, params, ids):
        if self._multimodal:
            return self.model.apply(
                {"params": params}, ids, method=lambda m, i: m.llm.embed(i)
            )
        return self.model.apply({"params": params}, ids,
                                method=self.model.embed)

    def _head(self, params, x):
        """Final norm + lm head on a (B, D) post-stack hidden -> (B, V)."""
        cfg = self._llm_cfg()
        h = x[:, None].astype(cfg.dtype)
        if self._multimodal:
            normed = self.model.apply(
                {"params": params}, h, method=lambda m, v: m.llm.model.ln_f(v)
            )
            return self.model.apply(
                {"params": params}, normed,
                method=lambda m, v: m.llm.logits(v),
            )[:, 0]
        normed = self.model.apply(
            {"params": params}, h, method=lambda m, v: m.model.ln_f(v)
        )
        return self.model.apply(
            {"params": params}, normed, method=lambda m, v: m.logits(v)
        )[:, 0]

    def _fused_token_step(self, params, stacked, scache, tok, cache_mask,
                          positions, cache_index, dims, interp):
        """One fused decode step: embed -> layer-stack kernel -> head.
        Returns ((B, V) logits, updated stacked cache)."""
        from rlaifv_tpu.ops.fused_decode import (
            fused_decode_step,
            scatter_new_kv,
        )

        cfg = self._llm_cfg()
        x = self._embed(params, tok[:, None])[:, 0].astype(jnp.float32)
        x_out, new_kv = fused_decode_step(
            stacked, scache, x, cache_mask, positions, cache_index, dims,
            rope_theta=cfg.rope_theta, interpret=interp,
        )
        scache = scatter_new_kv(scache, new_kv, cache_index)
        return self._head(params, x_out), scache

    def _device_images(self, images):
        """Ship images small: uint8 stays uint8 (the resize-only processor
        path — the model normalizes on device, half the bytes of bf16),
        floats ship in the model's compute dtype (half of fp32). Transfer
        is the dominant fixed cost of a generate call on slow links."""
        if images is None:
            return None
        arr = np.asarray(images)
        if arr.dtype == np.uint8:
            return jnp.asarray(arr)
        cfg = self.model.cfg.llm if self._multimodal else self.model.cfg
        return jnp.asarray(arr, dtype=cfg.dtype)

    def _llm(self, params, **kw):
        """Apply the language model (multimodal wrapper or bare LM)."""
        if self._multimodal:
            return self.model.apply(
                {"params": params}, method=lambda m, **k: m.llm(**k), **kw
            )
        return self.model.apply({"params": params}, **kw)

    # -------------------------------------------------- jitted internals

    def _build(self, sp: SamplingParams, max_new: int):
        key = (sp, max_new)
        if key in self._gen_fns:
            return self._gen_fns[key]

        model = self.model
        eos_id, pad_id, V = self.eos_id, self.pad_id, self.vocab_size
        use_rep = sp.repetition_penalty != 1.0
        fused = self.fused_decode
        interp = jax.default_backend() != "tpu"

        @partial(jax.jit, static_argnames=("max_len",))
        def run(params, stacked, ids, mask, images, image_starts,
                span_features, span_starts, rng, max_len):
            B, Lp = ids.shape

            pos = jnp.cumsum(mask, axis=1) - 1  # left-pad aware positions
            pos = jnp.maximum(pos, 0)

            cache_mask = jnp.zeros((B, max_len), jnp.int32)
            cache_mask = cache_mask.at[:, :Lp].set(mask)

            if fused:
                # write-through prefill: the per-layer kernels were stripped
                # at engine init, so the tower restores per-layer views from
                # the stacked arrays and lands int8 KV straight in the
                # stacked h-major cache
                from rlaifv_tpu.ops.fused_decode import (
                    default_dims,
                    init_stacked_cache,
                )

                dims = default_dims(self._llm_cfg(), max_len)
                embeds = self._embed_spliced(
                    params, ids, images, image_starts, span_features,
                    span_starts,
                )
                cache = init_stacked_cache(self._llm_cfg(), B, max_len)
                x, cache = self._fused_prefill_tower(
                    params, stacked, cache, embeds, mask, pos, jnp.int32(0)
                )
                first_logits = self._head(params, x[:, -1])
            else:
                cache = model.init_cache(B, max_len)
                if images is not None or span_features is not None:
                    embeds = self._embed_spliced(
                        params, ids, images, image_starts, span_features,
                        span_starts,
                    )
                    logits, cache = self._llm(
                        params,
                        inputs_embeds=embeds,
                        attention_mask=cache_mask,
                        position_ids=pos,
                        cache=cache,
                        cache_index=jnp.int32(0),
                    )
                else:
                    logits, cache = self._llm(
                        params,
                        input_ids=jnp.maximum(ids, 0),
                        attention_mask=cache_mask,
                        position_ids=pos,
                        cache=cache,
                        cache_index=jnp.int32(0),
                    )
                first_logits = logits[:, -1, :]  # last prompt (left-pad)

            token_seen = jnp.zeros((B, V), jnp.int32)
            if use_rep:
                # scatter-add, NOT a (B, Lp, V) one-hot (650MB at 7B vocab)
                rows = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], ids.shape
                )
                token_seen = token_seen.at[rows, jnp.maximum(ids, 0)].add(
                    mask.astype(jnp.int32)
                )

            prompt_len = mask.sum(axis=1)  # (B,)

            # while_loop (not scan): stop as soon as every row emitted EOS —
            # typical answers are far shorter than max_new, so this saves
            # most decode steps on real workloads.
            tokens_buf = jnp.full((max_new, B), pad_id, jnp.int32)

            def cond(state):
                t, done = state[0], state[6]
                return (t < max_new) & jnp.logical_not(jnp.all(done))

            def body(state):
                (t, cache, cache_mask, last_logits, token_seen, rng, done,
                 tokens_buf) = state
                rng, sub = jax.random.split(rng)
                tok = sample_token(sub, last_logits, sp,
                                   token_seen if use_rep else None)
                tok = jnp.where(done, pad_id, tok)
                new_done = done | (tok == eos_id)
                tokens_buf = jax.lax.dynamic_update_index_in_dim(
                    tokens_buf, tok, t, axis=0
                )

                cache_mask = jax.lax.dynamic_update_slice(
                    cache_mask,
                    (~done).astype(jnp.int32)[:, None],
                    (0, Lp + t),
                )
                pos_t = prompt_len + t
                if fused:
                    last, cache = self._fused_token_step(
                        params, stacked, cache, tok, cache_mask,
                        pos_t.astype(jnp.int32), jnp.int32(Lp) + t, dims,
                        interp,
                    )
                else:
                    step_logits, cache = self._llm(
                        params,
                        input_ids=tok[:, None],
                        attention_mask=cache_mask,
                        position_ids=pos_t[:, None],
                        cache=cache,
                        cache_index=jnp.int32(Lp) + t,
                    )
                    last = step_logits[:, 0]
                if use_rep:
                    token_seen = token_seen.at[jnp.arange(B), tok].add(
                        (~done).astype(jnp.int32)
                    )
                return (t + 1, cache, cache_mask, last,
                        token_seen, rng, new_done, tokens_buf)

            state = (jnp.int32(0), cache, cache_mask, first_logits,
                     token_seen, rng, jnp.zeros((B,), bool), tokens_buf)
            state = jax.lax.while_loop(cond, body, state)
            tokens = state[-1]
            return tokens.T, first_logits  # (B, max_new)

        def call(params, *args, **kw):
            # external signature unchanged: the stacked fused-decode
            # weights ride as a traced argument (capturing them would bake
            # 6.5GB of constants into the executable)
            return run(params, self._fused_stacked, *args, **kw)

        self._gen_fns[key] = call
        return call

    def _build_repeated(self, sp: SamplingParams, max_new: int, n: int):
        """One prompt -> n sampled continuations: prefill at B=1, tile the
        KV cache across n rows, decode at B=n. The diverse-gen fast path —
        GenDataset expands each question x repeat_time identical prompts
        (ref muffin/llava15_gen_data.py:64-150, repeat 10), so the plain
        path pays the prompt prefill and the vision encode 10 times."""
        key = ("repeat", sp, max_new, n)
        if key in self._gen_fns:
            return self._gen_fns[key]

        model = self.model
        eos_id, pad_id, V = self.eos_id, self.pad_id, self.vocab_size
        use_rep = sp.repetition_penalty != 1.0

        @partial(jax.jit, static_argnames=("max_len",))
        def run(params, ids, mask, images, image_starts, span_features,
                span_starts, rng, max_len):
            Lp = ids.shape[1]  # ids/mask (1, Lp), left-padded to a bucket
            pos = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)

            cache = model.init_cache(1, max_len)
            pmask = jnp.zeros((1, max_len), jnp.int32).at[:, :Lp].set(mask)
            if images is not None or span_features is not None:
                embeds = self._embed_spliced(
                    params, ids, images, image_starts, span_features,
                    span_starts,
                )
                logits, cache = self._llm(
                    params, inputs_embeds=embeds, attention_mask=pmask,
                    position_ids=pos, cache=cache, cache_index=jnp.int32(0),
                )
            else:
                logits, cache = self._llm(
                    params, input_ids=jnp.maximum(ids, 0),
                    attention_mask=pmask, position_ids=pos, cache=cache,
                    cache_index=jnp.int32(0),
                )
            first_logits = jnp.broadcast_to(logits[:, -1, :], (n, V))
            prompt_len = mask.sum()  # scalar

            # tile the prefix KV across the sample rows
            cache = jax.tree.map(
                lambda c: jnp.broadcast_to(c, (n,) + c.shape[1:]), cache
            )
            cache_mask = jnp.broadcast_to(pmask, (n, max_len))

            token_seen = jnp.zeros((n, V), jnp.int32)
            if use_rep:
                rows = jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32)[:, None], (n, Lp)
                )
                token_seen = token_seen.at[
                    rows, jnp.broadcast_to(jnp.maximum(ids, 0), (n, Lp))
                ].add(jnp.broadcast_to(mask, (n, Lp)).astype(jnp.int32))

            tokens_buf = jnp.full((max_new, n), pad_id, jnp.int32)

            def cond(state):
                t, done = state[0], state[6]
                return (t < max_new) & jnp.logical_not(jnp.all(done))

            def body(state):
                (t, cache, cache_mask, last_logits, token_seen, rng, done,
                 tokens_buf) = state
                rng, sub = jax.random.split(rng)
                tok = sample_token(sub, last_logits, sp,
                                   token_seen if use_rep else None)
                tok = jnp.where(done, pad_id, tok)
                new_done = done | (tok == eos_id)
                tokens_buf = jax.lax.dynamic_update_index_in_dim(
                    tokens_buf, tok, t, axis=0
                )
                cache_mask = jax.lax.dynamic_update_slice(
                    cache_mask, (~done).astype(jnp.int32)[:, None],
                    (0, Lp + t),
                )
                pos_t = jnp.full((n,), 1, jnp.int32) * (prompt_len + t)
                step_logits, cache = self._llm(
                    params, input_ids=tok[:, None],
                    attention_mask=cache_mask, position_ids=pos_t[:, None],
                    cache=cache, cache_index=jnp.int32(Lp) + t,
                )
                last = step_logits[:, 0]
                if use_rep:
                    token_seen = token_seen.at[jnp.arange(n), tok].add(
                        (~done).astype(jnp.int32)
                    )
                return (t + 1, cache, cache_mask, last, token_seen, rng,
                        new_done, tokens_buf)

            state = (jnp.int32(0), cache, cache_mask, first_logits,
                     token_seen, rng, jnp.zeros((n,), bool), tokens_buf)
            state = jax.lax.while_loop(cond, body, state)
            return state[-1].T, first_logits  # (n, max_new)

        self._gen_fns[key] = run
        return run

    def generate_repeated(
        self,
        prompt,  # ONE token-id sequence (image sentinels pre-expanded)
        *,
        n: int,
        image=None,  # (H, W, 3)
        image_start: int = -1,
        span_features=None,  # (S, Q, D)
        span_starts=None,  # (S,)
        sampling: SamplingParams = SamplingParams.greedy(),
        max_new_tokens: int = 512,
        seed: int = 0,
        prompt_bucket: int = 64,
    ) -> GenerateResult:
        """n sampled continuations of one prompt with ONE prefill and ONE
        vision encode (vs n of each on the plain path)."""
        if self.fused_decode:
            raise ValueError(
                "generate_repeated needs the flax per-layer path; "
                "construct the engine with fused_decode=False"
            )
        Lp = -(-len(prompt) // prompt_bucket) * prompt_bucket
        ids, mask = left_pad_batch([prompt], self.pad_id, Lp)
        off = Lp - len(prompt)
        max_len = -(-(Lp + max_new_tokens) // 128) * 128
        run = self._build_repeated(sampling, max_new_tokens, n)
        tokens, first_logits = run(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            self._device_images(np.asarray(image)[None])
            if image is not None else None,
            jnp.asarray([image_start + off if image_start >= 0 else -1],
                        jnp.int32),
            (jnp.asarray(span_features)[None]
             if span_features is not None else None),
            (jnp.asarray(
                np.where(np.asarray(span_starts) < 0, -1,
                         np.asarray(span_starts) + off), jnp.int32)[None]
             if span_starts is not None else None),
            jax.random.PRNGKey(seed),
            max_len=max_len,
        )
        tokens = np.array(tokens)
        lengths = np.zeros(n, np.int64)
        for i in range(n):
            row = tokens[i]
            eos = np.where(row == self.eos_id)[0]
            lengths[i] = (eos[0] + 1) if len(eos) else len(row)
            tokens[i, lengths[i]:] = self.pad_id
        return GenerateResult(tokens, lengths, np.asarray(first_logits))

    # ------------------------------------------- shared-prefix scoring

    @staticmethod
    def longest_common_prefix_len(seqs) -> int:
        """Length of the longest common prefix of token-id sequences,
        capped at min_len-1 so every row keeps >=1 suffix token. Any split
        at or below the LCP is exact: each row's full tokenization is
        sliced (never re-tokenized), so prefix+suffix == the full ids."""
        first = seqs[0]
        P = min(len(s) for s in seqs) - 1
        for s in seqs[1:]:
            i = 0
            while i < P and s[i] == first[i]:
                i += 1
            P = i
            if P == 0:
                break
        return max(P, 0)

    def _fp_cache(self, B: int, S: int):
        """bf16 KV cache of exactly (B, S) — the shared-prefix path keeps
        the prefix exact regardless of the engine's serving cache dtype
        (the int8 prefill branch attends only over the fresh window, so it
        cannot see a live prefix; the fp branch can: llama.py:399-409)."""
        cfg = self._llm_cfg()
        shape = (B, S, cfg.num_kv_heads, cfg.head_size)
        return [
            {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}
            for _ in range(cfg.num_layers)
        ]

    def _build_prefix_fn(self, P: int):
        key = ("prefix", P)
        if key in self._gen_fns:
            return self._gen_fns[key]

        @jax.jit
        def run(params, ids, images, image_starts, span_features,
                span_starts):
            mask = jnp.ones((1, P), jnp.int32)
            pos = jnp.arange(P, dtype=jnp.int32)[None]
            embeds = self._embed_spliced(
                params, ids, images, image_starts, span_features, span_starts
            )
            _, cache = self._llm(
                params, inputs_embeds=embeds, attention_mask=mask,
                position_ids=pos, cache=self._fp_cache(1, P),
                # STATIC 0 (python int): a traced jnp.int32(0) makes
                # q_offset traced, which forbids the flash kernel for
                # this square prefix prefill (auto falls back to dense)
                cache_index=0,
            )
            return cache

        self._gen_fns[key] = run
        return run

    def _build_suffix_fn(self, P: int, W: int, B: int):
        key = ("suffix", P, W, B)
        if key in self._gen_fns:
            return self._gen_fns[key]

        @jax.jit
        def run(params, pcache, suffix_ids, suffix_mask):
            # broadcast the (1, P) prefix KV across the suffix batch into a
            # (B, P+W) cache; the suffix window then rides the ordinary
            # windowed-prefill path (write at cache_index=P, attend over the
            # full cache with q_offset=P)
            def grow(c):
                out = jnp.zeros((B, P + W) + c.shape[2:], c.dtype)
                src = jnp.broadcast_to(c, (B,) + c.shape[1:])
                return jax.lax.dynamic_update_slice(
                    out, src, (0,) * c.ndim
                )

            cache = jax.tree.map(grow, pcache)
            cmask = jnp.zeros((B, P + W), jnp.int32)
            cmask = cmask.at[:, :P].set(1)
            cmask = cmask.at[:, P:].set(suffix_mask)
            pos = (P + jnp.cumsum(suffix_mask, axis=1) - 1).astype(jnp.int32)
            pos = jnp.maximum(pos, 0)
            logits, _ = self._llm(
                params, input_ids=jnp.maximum(suffix_ids, 0),
                attention_mask=cmask, position_ids=pos, cache=cache,
                cache_index=jnp.int32(P),
            )
            last = jnp.maximum(suffix_mask.sum(axis=1) - 1, 0)
            return logits[jnp.arange(B), last]  # (B, V) fp logits

        self._gen_fns[key] = run
        return run

    def score_shared_prefix(
        self,
        prefix_ids,  # token ids of the shared prefix (image pre-expanded)
        suffixes,  # list of N token-id suffixes (right-appended variants)
        *,
        image=None,  # single (H, W, 3) image spliced into the prefix
        image_start: int = -1,
        span_features=None,  # (S, Q, D) pre-encoded multi-span features
        span_starts=None,  # (S,) starts within the prefix, -1 inactive
        batch_size: int = 16,
        suffix_bucket: int = 32,
    ) -> np.ndarray:
        """Last-position logits for N prompts sharing one prefix.

        The autocheck fast path (ref muffin/llava15_gen_data.py:266-313 runs
        one FULL prefill per fact): every fact question about the same image
        shares the system prompt + image-token prefix — the dominant share
        of the prompt — so the prefix KV is computed ONCE (one vision encode,
        one prefill) and broadcast across fact batches; only the short
        question suffixes are prefilled per fact. Exact because causal
        attention makes shared-prefix KV identical across rows.

        Returns (N, vocab) fp32 logits at each suffix's last position —
        exactly `generate(..., max_new_tokens=1).first_logits`.
        """
        if self.fused_decode:
            raise ValueError(
                "score_shared_prefix needs the flax per-layer path; "
                "construct the engine with fused_decode=False"
            )
        P = len(prefix_ids)
        prefix_fn = self._build_prefix_fn(P)
        pcache = prefix_fn(
            self.params,
            jnp.asarray([prefix_ids], jnp.int32),
            self._device_images(image[None]) if image is not None else None,
            jnp.asarray([image_start], jnp.int32),
            (jnp.asarray(span_features)[None]
             if span_features is not None else None),
            (jnp.asarray(span_starts, jnp.int32)[None]
             if span_starts is not None else None),
        )

        N = len(suffixes)
        if any(len(s) < 1 for s in suffixes):
            # an empty suffix would gather logits from a garbage padded
            # position (llava/omni compute P positionally) — reject loudly
            raise ValueError("score_shared_prefix: every suffix must carry "
                             "at least one token past the shared prefix")
        W = max(len(s) for s in suffixes)
        W = -(-W // suffix_bucket) * suffix_bucket
        suffix_fn = self._build_suffix_fn(P, W, batch_size)
        out = np.zeros((N, self.vocab_size), np.float32)
        for c0 in range(0, N, batch_size):
            chunk = suffixes[c0 : c0 + batch_size]
            ids = np.zeros((batch_size, W), np.int32)
            mask = np.zeros((batch_size, W), np.int32)
            for r, s in enumerate(chunk):
                ids[r, : len(s)] = s
                mask[r, : len(s)] = 1
            for r in range(len(chunk), batch_size):  # pad rows: repeat row 0
                ids[r], mask[r] = ids[0], mask[0]
            logits = suffix_fn(
                self.params, pcache, jnp.asarray(ids), jnp.asarray(mask)
            )
            out[c0 : c0 + len(chunk)] = np.asarray(
                logits, np.float32
            )[: len(chunk)]
        return out

    def _build_pair_score_fn(self, Pmax: int, W: int, B: int):
        """Jitted two-phase scorer: B left-padded prefixes prefill once,
        their KV is duplicated for the 2B win‖rej suffix rows, and only the
        suffixes run the second forward. Returns per-token logps of the
        suffix labels (fp32), sums and means."""
        key = ("pairscore", Pmax, W, B)
        if key in self._gen_fns:
            return self._gen_fns[key]

        from rlaifv_tpu.constants import IGNORE_INDEX

        @jax.jit
        def run(params, pids, pmask, images, image_starts, sids, smask,
                slabels):
            embeds = self._embed_spliced(
                params, pids, images, image_starts, None, None
            )
            ppos = jnp.maximum(jnp.cumsum(pmask, axis=1) - 1, 0)
            # cache width EXACTLY Pmax and a PYTHON-int cache_index: both
            # phases then satisfy the flash kernel's static-offset rule
            # (phase 1 square Lq==Lk, phase 2 the rectangular q_offset mode
            # the paired trainer uses). A traced jnp.int32 index forced the
            # dense fallback — (2B, H, W, Pmax+W) f32 scores per layer made
            # shared-prefix scoring SLOWER than the plain flash forward at
            # 7B (0.63x, measured); flash makes the token-work saving real.
            _, pcache = self._llm(
                params, inputs_embeds=embeds, attention_mask=pmask,
                position_ids=ppos, cache=self._fp_cache(B, Pmax),
                cache_index=0,
            )
            # win rows 0..B-1 and rej rows B..2B-1 share prefix i -> tile
            # KV and append W empty suffix slots
            cache2 = jax.tree.map(
                lambda c: jnp.pad(
                    jnp.concatenate([c, c], axis=0),
                    ((0, 0), (0, W)) + ((0, 0),) * (c.ndim - 2),
                ),
                pcache,
            )
            pmask2 = jnp.concatenate([pmask, pmask], axis=0)
            cmask = jnp.zeros((2 * B, Pmax + W), jnp.int32)
            cmask = cmask.at[:, :Pmax].set(pmask2).at[:, Pmax:].set(smask)
            spos = (
                pmask2.sum(axis=1, keepdims=True)
                + jnp.cumsum(smask, axis=1) - 1
            ).astype(jnp.int32)
            spos = jnp.maximum(spos, 0)
            logits, _ = self._llm(
                params, input_ids=jnp.maximum(sids, 0), attention_mask=cmask,
                position_ids=spos, cache=cache2, cache_index=Pmax,
            )
            # label-logit minus logsumexp == log_softmax gathered at the
            # label, WITHOUT writing the (2B, W, V) f32 normalized tensor
            # (XLA fuses the exp into the reduction)
            logits32 = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(logits32, axis=-1)
            tok = jnp.take_along_axis(
                logits32, jnp.maximum(slabels, 0)[..., None], axis=-1
            )[..., 0] - lse
            m = ((slabels != IGNORE_INDEX) & (smask == 1)).astype(jnp.float32)
            per_token = tok * m
            sums = per_token.sum(axis=1)
            means = sums / jnp.maximum(m.sum(axis=1), 1.0)
            return sums, means, per_token

        self._gen_fns[key] = run
        return run

    def score_pair_logps(
        self,
        prefixes,  # B token-lists (pair i's shared prompt prefix)
        suffixes,  # 2B token-lists: win rows 0..B-1, rej rows B..2B-1
        suffix_labels,  # 2B label-lists, len == len(suffix), -100 masked;
        # entry j is the label for the token PREDICTED by suffix position j
        *,
        images=None,  # (B, H, W, 3) or None
        image_starts=None,  # (B,) in UNPADDED prefix coordinates, -1 none
        pair_batch: int = 8,
        prefix_bucket: int = 128,
        suffix_bucket: int = 64,
    ):
        """Shared-prefix win‖rej scoring (the ref-logp precompute fast path).

        The reference scores each pair with TWO full forwards over
        prompt+answer (muffin/eval/muffin_inference_logp.py:213-280); here
        the shared prompt prefix (system + image tokens + question) prefills
        ONCE per pair and only the two answer suffixes run again — exact,
        because causal attention makes shared-prefix KV identical across
        rows (same slice-not-retokenize split as score_shared_prefix).

        Returns (sums (2B,), means (2B,), per_token: list of 2B fp32 arrays
        trimmed to each suffix's true length).
        """
        if self.fused_decode:
            raise ValueError(
                "score_pair_logps needs the flax per-layer path; "
                "construct the engine with fused_decode=False"
            )
        B_total = len(prefixes)
        assert len(suffixes) == 2 * B_total == len(suffix_labels)
        if any(len(s) < 1 for s in suffixes):
            raise ValueError("score_pair_logps: empty suffix")

        sums = np.zeros(2 * B_total, np.float32)
        means = np.zeros(2 * B_total, np.float32)
        per_token = [None] * (2 * B_total)
        for c0 in range(0, B_total, pair_batch):
            pc = prefixes[c0 : c0 + pair_batch]
            n = len(pc)
            B = pair_batch if B_total > pair_batch else n
            rows = list(range(c0, c0 + n))
            sfx = [suffixes[i] for i in rows] + \
                  [suffixes[B_total + i] for i in rows]
            lab = [suffix_labels[i] for i in rows] + \
                  [suffix_labels[B_total + i] for i in rows]
            Pmax = max(len(p) for p in pc)
            Pmax = -(-Pmax // prefix_bucket) * prefix_bucket
            W = max(len(s) for s in sfx)
            W = -(-W // suffix_bucket) * suffix_bucket

            pids = np.zeros((B, Pmax), np.int32)
            pmask = np.zeros((B, Pmax), np.int32)
            starts = np.full((B,), -1, np.int32)
            for r, p in enumerate(pc):
                off = Pmax - len(p)
                pids[r, off:] = p
                pmask[r, off:] = 1
                if image_starts is not None and image_starts[c0 + r] >= 0:
                    starts[r] = image_starts[c0 + r] + off
            imgs = None
            if images is not None:
                sel = np.asarray(images[c0 : c0 + n])
                if n < B:  # pad pairs: repeat pair 0
                    sel = np.concatenate(
                        [sel, np.repeat(sel[:1], B - n, axis=0)], axis=0
                    )
                imgs = self._device_images(sel)
            if n < B:
                pids[n:], pmask[n:], starts[n:] = pids[0], pmask[0], starts[0]

            sids = np.zeros((2 * B, W), np.int32)
            smask = np.zeros((2 * B, W), np.int32)
            slab = np.full((2 * B, W), -100, np.int32)
            for r in range(n):
                for half, src_row in ((0, r), (B, n + r)):
                    s, l = sfx[src_row], lab[src_row]
                    sids[half + r, : len(s)] = s
                    smask[half + r, : len(s)] = 1
                    slab[half + r, : len(l)] = l
            for r in range(n, B):  # pad rows mirror row 0
                sids[r], smask[r], slab[r] = sids[0], smask[0], slab[0]
                sids[B + r], smask[B + r] = sids[B], smask[B]
                slab[B + r] = slab[B]

            fn = self._build_pair_score_fn(Pmax, W, B)
            s_d, m_d, pt_d = fn(
                self.params, jnp.asarray(pids), jnp.asarray(pmask), imgs,
                jnp.asarray(starts), jnp.asarray(sids), jnp.asarray(smask),
                jnp.asarray(slab),
            )
            s_h = np.asarray(s_d, np.float32)
            m_h = np.asarray(m_d, np.float32)
            pt_h = np.asarray(pt_d, np.float32)
            for r in range(n):
                for dst, src in ((c0 + r, r), (B_total + c0 + r, B + r)):
                    sums[dst] = s_h[src]
                    means[dst] = m_h[src]
                    per_token[dst] = pt_h[src][: len(suffixes[dst])]
        return sums, means, per_token

    def _build_beam(self, num_beams: int, max_new: int, length_penalty: float,
                    sampling=None):
        key = ("beam", num_beams, max_new, length_penalty, sampling)
        if key in self._gen_fns:
            return self._gen_fns[key]

        model = self.model
        eos_id, pad_id = self.eos_id, self.pad_id
        use_rep = sampling is not None and sampling.repetition_penalty != 1.0

        @partial(jax.jit, static_argnames=("max_len",))
        def run(params, ids, mask, images, image_starts, span_features,
                span_starts, rng, max_len):
            from rlaifv_tpu.genai.beam import beam_search

            B, Lp = ids.shape
            cache = model.init_cache(B, max_len)
            pos = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            cache_mask = jnp.zeros((B, max_len), jnp.int32)
            cache_mask = cache_mask.at[:, :Lp].set(mask)

            if images is not None or span_features is not None:
                embeds = model.apply(
                    {"params": params}, jnp.maximum(ids, 0),
                    method=lambda m, i: m.llm.embed(i),
                )
                if span_features is not None:
                    from rlaifv_tpu.models.minicpmv import splice_multi_span

                    embeds = splice_multi_span(embeds, span_features, span_starts)
                else:
                    from rlaifv_tpu.models.llava import splice_image_features

                    feats = model.apply(
                        {"params": params}, images, method=model.encode_images
                    )
                    embeds = splice_image_features(embeds, feats, image_starts)
                logits, cache = self._llm(
                    params, inputs_embeds=embeds, attention_mask=cache_mask,
                    position_ids=pos, cache=cache, cache_index=jnp.int32(0),
                )
            else:
                logits, cache = self._llm(
                    params, input_ids=jnp.maximum(ids, 0),
                    attention_mask=cache_mask, position_ids=pos,
                    cache=cache, cache_index=jnp.int32(0),
                )

            token_seen = None
            if use_rep:
                # prompt tokens count toward the repetition penalty
                # (HF semantics: penalty over the full sequence so far)
                # cfg is LlavaConfig (wraps .llm) or a bare LM config
                V = getattr(model.cfg, "llm", model.cfg).vocab_size
                token_seen = jnp.zeros((B, V), jnp.int32).at[
                    jnp.arange(B)[:, None], jnp.maximum(ids, 0)
                ].max(mask.astype(jnp.int32))

            return beam_search(
                self._llm, params, logits[:, -1, :], cache, cache_mask,
                mask.sum(axis=1), Lp,
                num_beams=num_beams, max_new_tokens=max_new,
                eos_id=eos_id, pad_id=pad_id, length_penalty=length_penalty,
                sampling=sampling, rng=rng, token_seen=token_seen,
            )

        self._gen_fns[key] = run
        return run

    def generate_many(
        self,
        prompts,
        *,
        images=None,
        image_starts=None,
        batch_size: int = 8,
        sampling: SamplingParams = SamplingParams.greedy(),
        max_new_tokens: int = 512,
        seed: int = 0,
        prompt_bucket: int = 64,
    ) -> GenerateResult:
        """Queue-mode generation: sort by prompt length so each batch shares
        a tight padding bucket and the all-done early exit fires together
        (poor-man's continuous batching; the per-batch exit is bounded by
        the slowest row, so homogeneous batches matter)."""
        order = sorted(range(len(prompts)), key=lambda i: len(prompts[i]))
        tokens = [None] * len(prompts)
        lengths = np.zeros(len(prompts), np.int64)
        first_logits = [None] * len(prompts)

        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            res = self.generate(
                [prompts[i] for i in idx],
                images=images[idx] if images is not None else None,
                image_starts=(
                    [image_starts[i] for i in idx]
                    if image_starts is not None else None
                ),
                sampling=sampling,
                max_new_tokens=max_new_tokens,
                seed=seed + start,
                prompt_bucket=prompt_bucket,
            )
            for row, i in enumerate(idx):
                tokens[i] = res.tokens[row]
                lengths[i] = res.lengths[row]
                first_logits[i] = res.first_logits[row]

        width = max(t.shape[0] for t in tokens)
        out = np.full((len(prompts), width), self.pad_id, np.int32)
        for i, t in enumerate(tokens):
            out[i, : t.shape[0]] = t
        return GenerateResult(out, lengths, np.stack(first_logits))

    def generate_continuous(
        self,
        prompts,
        *,
        images=None,
        image_starts=None,
        span_features=None,
        span_starts=None,
        slots: int = 8,
        sampling: SamplingParams = SamplingParams.greedy(),
        max_new_tokens: int = 512,
        seed: int = 0,
        chunk: int = 32,
        prompt_bucket: int = 64,
        collect_first_logits: bool = False,
        max_new_per_prompt=None,
        share_keys=None,
    ) -> GenerateResult:
        """Slot-refill continuous batching (genai/continuous.py): finished
        rows are immediately replaced from the queue instead of waiting for
        the batch's slowest row. Greedy outputs match generate() exactly.

        share_keys (one hashable per prompt, equal key == identical
        prompt+media) lets refills of repeat-expanded prompts share ONE
        prefill + vision encode per distinct key (diverse-gen: 10 repeats,
        ref muffin/llava15_gen_data.py:64-150)."""
        from rlaifv_tpu.genai.continuous import ContinuousGenerator

        gen = ContinuousGenerator(
            self, slots=slots, chunk=chunk, max_new_tokens=max_new_tokens,
            sampling=sampling, prompt_bucket=prompt_bucket,
        )
        return gen.run(
            prompts,
            images=np.asarray(images) if images is not None else None,
            image_starts=image_starts,
            span_features=(np.asarray(span_features)
                           if span_features is not None else None),
            span_starts=span_starts,
            seed=seed,
            collect_first_logits=collect_first_logits,
            max_new_per_prompt=max_new_per_prompt,
            share_keys=share_keys,
        )

    def generate_beam(
        self,
        prompts,
        *,
        images=None,
        image_starts=None,
        span_features=None,
        span_starts=None,
        num_beams: int = 3,
        max_new_tokens: int = 512,
        length_penalty: float = 1.0,
        prompt_bucket: int = 64,
        sampling=None,  # SamplingParams(do_sample) => HF beam_sample mode
        seed: int = 0,
    ) -> GenerateResult:
        """Beam decode. Deterministic by default (7B chat parity, ref
        chat.py:169-178); pass `sampling=SamplingParams.chat_12b()` for the
        combined beam+sample 12B mode (ref chat.py:98-112)."""
        B = len(prompts)
        Lp = max(len(p) for p in prompts)
        Lp = ((Lp + prompt_bucket - 1) // prompt_bucket) * prompt_bucket
        ids, mask = left_pad_batch(prompts, self.pad_id, Lp)
        offs = Lp - np.asarray([len(p) for p in prompts])

        starts = None
        if images is not None:
            starts = np.asarray(image_starts, np.int32) + offs.astype(np.int32)
            starts = np.where(np.asarray(image_starts) < 0, -1, starts)
        sstarts = None
        if span_features is not None:
            sstarts = np.asarray(span_starts, np.int32) + offs[:, None].astype(
                np.int32
            )
            sstarts = np.where(np.asarray(span_starts) < 0, -1, sstarts)

        run = self._build_beam(num_beams, max_new_tokens, length_penalty,
                               sampling)
        seqs, scores = run(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            self._device_images(images),
            jnp.asarray(starts) if starts is not None else None,
            jnp.asarray(span_features) if span_features is not None else None,
            jnp.asarray(sstarts) if sstarts is not None else None,
            jax.random.PRNGKey(seed),
            max_len=-(-(Lp + max_new_tokens) // 128) * 128,
        )
        tokens = np.array(seqs)
        lengths = np.zeros(B, np.int64)
        for i in range(B):
            eos = np.where(tokens[i] == self.eos_id)[0]
            lengths[i] = (eos[0] + 1) if len(eos) else tokens.shape[1]
            tokens[i, lengths[i]:] = self.pad_id
        return GenerateResult(tokens, lengths, np.asarray(scores))

    # -------------------------------------------------- public API

    def generate(
        self,
        prompts,  # list of token-id sequences (image sentinels pre-expanded)
        *,
        images: Optional[np.ndarray] = None,  # (B, H, W, 3)
        image_starts: Optional[np.ndarray] = None,  # relative to each prompt
        span_features=None,  # (B, S, Q, D) pre-encoded multi-span features
        span_starts=None,  # (B, S) relative to each prompt, -1 inactive
        sampling: SamplingParams = SamplingParams.greedy(),
        max_new_tokens: int = 512,
        seed: int = 0,
        prompt_bucket: int = 64,
    ) -> GenerateResult:
        B = len(prompts)
        Lp = max(len(p) for p in prompts)
        Lp = ((Lp + prompt_bucket - 1) // prompt_bucket) * prompt_bucket
        ids, mask = left_pad_batch(prompts, self.pad_id, Lp)
        offs = Lp - np.asarray([len(p) for p in prompts])

        starts = None
        if images is not None:
            # shift image starts by each row's left-pad offset
            starts = np.asarray(image_starts, np.int32) + offs.astype(np.int32)
            starts = np.where(np.asarray(image_starts) < 0, -1, starts)

        sstarts = None
        if span_features is not None:
            sstarts = np.asarray(span_starts, np.int32) + offs[:, None].astype(
                np.int32
            )
            sstarts = np.where(np.asarray(span_starts) < 0, -1, sstarts)

        # 128-aligned so the prefix decode-attention kernel engages
        max_len = -(-(Lp + max_new_tokens) // 128) * 128
        run = self._build(sampling, max_new_tokens)
        tokens, first_logits = run(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            self._device_images(images),
            jnp.asarray(starts) if starts is not None else None,
            jnp.asarray(span_features) if span_features is not None else None,
            jnp.asarray(sstarts) if sstarts is not None else None,
            jax.random.PRNGKey(seed),
            max_len=max_len,
        )
        tokens = np.array(tokens)  # writable copy
        lengths = np.zeros(B, np.int64)
        for i in range(B):
            row = tokens[i]
            eos = np.where(row == self.eos_id)[0]
            lengths[i] = (eos[0] + 1) if len(eos) else len(row)
            tokens[i, lengths[i]:] = self.pad_id
        return GenerateResult(tokens, lengths, np.asarray(first_logits))
