"""Continuous batching for the decode engine: slot-refill generation.

The reference generates with fixed batches (muffin/llava15_gen_data.py:273:
every row waits for the slowest row of its batch). The queue-mode
`generate_many` bounds that waste by length-sorting; this module removes it:
B cache slots decode together, and whenever a slot finishes its sequence a
pending prompt is prefilled into that slot while the others keep decoding.

TPU-native shape discipline — everything is static-shape:

- one global KV cache (B, max_len, KVH, D) with a single shared write column
  `gt` that advances once per decode step (all rows write the same column).
- a refilled prompt is placed so it *ends* at the current `gt`: prefill runs
  in its own (R, Lp_r) window, and the window K/V is scattered into columns
  [gt - Lp_r, gt) of the finished slots. RoPE positions are content-relative
  (per-row cumsum of the validity mask), so cache columns only ever carry
  masking, never positions — which is what makes the shared column work.
- every row's valid window is therefore contiguous and ends at `gt`, so
  cache *compaction* (reclaiming the dead prefix when `gt` nears max_len) is
  a uniform roll-left by `gt - max(cur_pos)` — one fused op, no per-row math.
- decode runs in jitted chunks of T steps with an all-done early exit; the
  host inspects `done` between chunks, harvests finished rows, and refills.

Sampling state (repetition-penalty token counts), per-row position counters
and max-new accounting all reset per-slot at refill. Greedy outputs are
bit-identical to `DecodeEngine.generate` (tests/test_continuous.py).

Shared-repeat refill (`share_keys`): the diverse-gen workload expands each
question x repeat_time IDENTICAL prompts (ref muffin/llava15_gen_data.py:
64-150, repeat 10). With `share_keys` (one hashable key per prompt; equal
key == identical prompt AND media), a refill wave prefills each distinct
key ONCE at B=1 and *scatters* the window KV into all of that key's slots
— and the last window is kept on device ((1, Lp) in the serving cache
dtype, ~14 MB at 7B int8) so stragglers of the same key refill with no
prefill at all, even across compactions (RoPE positions are content-
relative, so a window is valid at any gt). Keys seen only once fall
through to the ordinary batched refill; fused-decode engines ignore
share_keys (the stacked write-through prefill has no per-layer window to
save).
"""
from __future__ import annotations

from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.genai.sampling import SamplingParams, sample_token

Array = jax.Array


def _bucket(n: int, b: int) -> int:
    return ((n + b - 1) // b) * b


def _pow2_at_least(n: int, cap: int) -> int:
    r = 1
    while r < n:
        r *= 2
    return min(r, cap)


class ContinuousGenerator:
    """Drives a DecodeEngine's model with slot-refill continuous batching."""

    def __init__(
        self,
        engine,
        *,
        slots: int = 8,
        chunk: int = 32,
        max_new_tokens: int = 512,
        sampling: SamplingParams = SamplingParams.greedy(),
        prompt_bucket: int = 64,
        headroom: Optional[int] = None,
    ):
        self.engine = engine
        self.model = engine.model
        self.B = slots
        self.T = chunk
        self.max_new = max_new_tokens
        self.sp = sampling
        self.prompt_bucket = prompt_bucket
        self.headroom = headroom or max(2 * chunk, 128)
        self.use_rep = sampling.repetition_penalty != 1.0
        self._fns = engine._gen_fns  # share the engine's compile cache
        # fused multi-layer decode (ops/fused_decode.py): the global cache
        # lives in the kernel's stacked h-major layout the whole run
        self.fused = getattr(engine, "fused_decode", False)

    # ------------------------------------------------------------- jitted

    def _logits_dtype(self):
        cfg = self.model.cfg.llm if self.engine._multimodal else self.model.cfg
        return cfg.dtype

    def _build_refill(self, R: int, Lp: int, mode: str):
        """mode: 'text' | 'images' (encode+single-span splice, LLaVA/OmniLMM)
        | 'spans' (pre-encoded multi-span features, MiniCPM-V slices)."""
        key = ("cont_refill", R, Lp, mode, self.use_rep, self.fused)
        if key in self._fns:
            return self._fns[key]

        engine, model, use_rep = self.engine, self.model, self.use_rep
        fused = self.fused

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
        def refill(params, stacked, cache, cache_mask, token_seen,
                   last_logits, cur_pos, emitted, done, budget, ids, mask,
                   slot_ids, gt, media, starts, budgets_r):
            B = cache_mask.shape[0]
            pos = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            start = gt - Lp

            if fused:
                # write-through tower prefill: per-layer kernels restored
                # from the stacked arrays, window KV scattered straight
                # into the donated stacked h-major cache at the finished
                # slots (engine._fused_prefill_tower)
                embeds = engine._embed_spliced(
                    params, ids,
                    media if mode == "images" else None, starts,
                    media if mode == "spans" else None, starts,
                )
                x, cache = engine._fused_prefill_tower(
                    params, stacked, cache, embeds, mask, pos, start,
                    slot_ids=slot_ids, n_slots=B,
                )
                first = engine._head(params, x[:, -1])
            else:
                sub_cache = model.init_cache(R, Lp)
                if mode != "text":
                    embeds = engine._embed_spliced(
                        params, ids,
                        media if mode == "images" else None, starts,
                        media if mode == "spans" else None, starts,
                    )
                    logits, sub_cache = engine._llm(
                        params, inputs_embeds=embeds, attention_mask=mask,
                        position_ids=pos, cache=sub_cache,
                        cache_index=jnp.int32(0),
                    )
                else:
                    logits, sub_cache = engine._llm(
                        params, input_ids=jnp.maximum(ids, 0),
                        attention_mask=mask, position_ids=pos,
                        cache=sub_cache, cache_index=jnp.int32(0),
                    )
                first = logits[:, -1, :]

                def put(glob, sub):
                    # rank-generic (k/v are 4-D; int8-cache scales 3-D)
                    zeros = (0,) * (glob.ndim - 2)
                    win = jax.lax.dynamic_slice(
                        glob, (0, start) + zeros, (B, Lp) + glob.shape[2:]
                    )
                    win = win.at[slot_ids].set(sub.astype(glob.dtype),
                                               mode="drop")
                    return jax.lax.dynamic_update_slice(
                        glob, win, (0, start) + zeros
                    )

                cache = [
                    {key: put(c[key], s[key]) for key in c}
                    for c, s in zip(cache, sub_cache)
                ]

            cm = cache_mask.at[slot_ids].set(0, mode="drop")
            win = jax.lax.dynamic_slice(cm, (0, start), (B, Lp))
            win = win.at[slot_ids].set(mask, mode="drop")
            cache_mask = jax.lax.dynamic_update_slice(cm, win, (0, start))

            if use_rep:
                V = token_seen.shape[1]
                rows = jnp.broadcast_to(
                    jnp.arange(R, dtype=jnp.int32)[:, None], ids.shape
                )
                sub_seen = jnp.zeros((R, V), jnp.int32).at[
                    rows, jnp.maximum(ids, 0)
                ].add(mask.astype(jnp.int32))
                token_seen = token_seen.at[slot_ids].set(0, mode="drop")
                token_seen = token_seen.at[slot_ids].set(sub_seen, mode="drop")

            last_logits = last_logits.at[slot_ids].set(
                first.astype(last_logits.dtype), mode="drop"
            )
            cur_pos = cur_pos.at[slot_ids].set(
                mask.sum(axis=1).astype(cur_pos.dtype), mode="drop"
            )
            emitted = emitted.at[slot_ids].set(0, mode="drop")
            done = done.at[slot_ids].set(False, mode="drop")
            budget = budget.at[slot_ids].set(budgets_r, mode="drop")
            return (cache, cache_mask, token_seen, last_logits, cur_pos,
                    emitted, done, budget, first)

        self._fns[key] = refill
        return refill

    def _build_window_prefill(self, Lp: int, mode: str):
        """Prefill ONE prompt into a standalone (1, Lp) window cache (the
        serving cache dtype; fused engines: a mini stacked h-major int8
        cache) and return it with the next-token logits. The window is
        position-independent (content-relative RoPE), so it can be
        scattered into any slots at any gt, any number of times."""
        key = ("cont_wprefill", Lp, mode, self.fused)
        if key in self._fns:
            return self._fns[key]

        engine, model = self.engine, self.model
        fused = self.fused

        @jax.jit
        def wprefill(params, stacked, ids, mask, media, starts):
            pos = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            if fused:
                from rlaifv_tpu.ops.fused_decode import init_stacked_cache

                mini = init_stacked_cache(engine._llm_cfg(), 1, Lp)
                embeds = engine._embed_spliced(
                    params, ids,
                    media if mode == "images" else None, starts,
                    media if mode == "spans" else None, starts,
                )
                x, mini = engine._fused_prefill_tower(
                    params, stacked, mini, embeds, mask, pos, jnp.int32(0),
                    slot_ids=jnp.zeros((1,), jnp.int32), n_slots=1,
                )
                return mini, engine._head(params, x[:, -1])
            sub_cache = model.init_cache(1, Lp)
            if mode != "text":
                embeds = engine._embed_spliced(
                    params, ids,
                    media if mode == "images" else None, starts,
                    media if mode == "spans" else None, starts,
                )
                logits, sub_cache = engine._llm(
                    params, inputs_embeds=embeds, attention_mask=mask,
                    position_ids=pos, cache=sub_cache,
                    cache_index=jnp.int32(0),
                )
            else:
                logits, sub_cache = engine._llm(
                    params, input_ids=jnp.maximum(ids, 0),
                    attention_mask=mask, position_ids=pos,
                    cache=sub_cache, cache_index=jnp.int32(0),
                )
            return sub_cache, logits[:, -1, :]

        self._fns[key] = wprefill
        return wprefill

    def _build_scatter_refill(self, K: int, Lp: int):
        """Refill K slots from a saved (1, Lp) window: broadcast-scatter the
        window KV into cache columns [gt-Lp, gt) at `slot_ids` and reset all
        per-slot state — no forward pass. Rows of slot_ids equal to B are
        dropped (dummy pow2 padding), exactly like _build_refill."""
        key = ("cont_scatter", K, Lp, self.use_rep, self.fused)
        if key in self._fns:
            return self._fns[key]

        use_rep = self.use_rep
        fused = self.fused

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
        def scatter(cache, cache_mask, token_seen, last_logits, cur_pos,
                    emitted, done, budget, window, first, ids, mask,
                    slot_ids, gt, budgets_r):
            B = cache_mask.shape[0]
            start = gt - Lp

            def put(glob, sub):
                zeros = (0,) * (glob.ndim - 2)
                win = jax.lax.dynamic_slice(
                    glob, (0, start) + zeros, (B, Lp) + glob.shape[2:]
                )
                src = jnp.broadcast_to(
                    sub.astype(glob.dtype), (K,) + sub.shape[1:]
                )
                win = win.at[slot_ids].set(src, mode="drop")
                return jax.lax.dynamic_update_slice(
                    glob, win, (0, start) + zeros
                )

            def put_stacked(glob, sub):
                # stacked h-major layout (n_layers, KVH, B, L[, Dh]):
                # slots on axis 2, columns on axis 3; window is (.., 1, Lp)
                zeros = (0,) * (glob.ndim - 4)
                win = jax.lax.dynamic_slice(
                    glob, (0, 0, 0, start) + zeros,
                    glob.shape[:2] + (B, Lp) + glob.shape[4:],
                )
                src = jnp.broadcast_to(
                    sub.astype(glob.dtype),
                    sub.shape[:2] + (K,) + sub.shape[3:],
                )
                win = win.at[:, :, slot_ids].set(src, mode="drop")
                return jax.lax.dynamic_update_slice(
                    glob, win, (0, 0, 0, start) + zeros
                )

            if fused:
                cache = {
                    k2: put_stacked(cache[k2], window[k2]) for k2 in cache
                }
            else:
                cache = [
                    {k2: put(c[k2], s[k2]) for k2 in c}
                    for c, s in zip(cache, window)
                ]
            cm = cache_mask.at[slot_ids].set(0, mode="drop")
            win = jax.lax.dynamic_slice(cm, (0, start), (B, Lp))
            win = win.at[slot_ids].set(
                jnp.broadcast_to(mask, (K, Lp)), mode="drop"
            )
            cache_mask = jax.lax.dynamic_update_slice(cm, win, (0, start))

            if use_rep:
                V = token_seen.shape[1]
                sub_seen = jnp.zeros((1, V), jnp.int32).at[
                    jnp.zeros_like(ids), jnp.maximum(ids, 0)
                ].add(mask.astype(jnp.int32))
                token_seen = token_seen.at[slot_ids].set(
                    jnp.broadcast_to(sub_seen, (K, V)), mode="drop"
                )

            last_logits = last_logits.at[slot_ids].set(
                jnp.broadcast_to(
                    first.astype(last_logits.dtype), (K, first.shape[1])
                ),
                mode="drop",
            )
            cur_pos = cur_pos.at[slot_ids].set(
                jnp.broadcast_to(mask.sum(axis=1), (K,)).astype(cur_pos.dtype),
                mode="drop",
            )
            emitted = emitted.at[slot_ids].set(0, mode="drop")
            done = done.at[slot_ids].set(False, mode="drop")
            budget = budget.at[slot_ids].set(budgets_r, mode="drop")
            return (cache, cache_mask, token_seen, last_logits, cur_pos,
                    emitted, done, budget)

        self._fns[key] = scatter
        return scatter

    def _build_chunk(self, max_len: int):
        # max_len keys the fused variant (kernel dims are static per cache
        # length); the per-layer path retraces on shape change anyway
        key = ("cont_chunk", self.sp, self.T, self.max_new, self.use_rep,
               self.fused and max_len)
        if key in self._fns:
            return self._fns[key]

        engine, sp, T = self.engine, self.sp, self.T
        use_rep = self.use_rep
        eos_id, pad_id = engine.eos_id, engine.pad_id
        fused = self.fused
        if fused:
            from rlaifv_tpu.ops.fused_decode import default_dims

            dims = default_dims(engine._llm_cfg(), max_len)
            interp = jax.default_backend() != "tpu"

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6, 7, 8))
        def chunk(params, stacked, cache, cache_mask, token_seen,
                  last_logits, cur_pos, emitted, done, budget, gt, rng):
            B = cache_mask.shape[0]
            buf = jnp.full((T, B), pad_id, jnp.int32)

            def cond(s):
                return (s[0] < T) & jnp.logical_not(jnp.all(s[7]))

            def body(s):
                (t, cache, cache_mask, token_seen, last_logits, cur_pos,
                 emitted, done, gt, rng, buf) = s
                rng, sub = jax.random.split(rng)
                tok = sample_token(sub, last_logits.astype(jnp.float32), sp,
                                   token_seen if use_rep else None)
                tok = jnp.where(done, pad_id, tok)
                emitted = emitted + jnp.logical_not(done)
                new_done = done | (tok == eos_id) | (emitted >= budget)
                buf = jax.lax.dynamic_update_index_in_dim(buf, tok, t, axis=0)

                cache_mask = jax.lax.dynamic_update_slice(
                    cache_mask,
                    jnp.logical_not(done).astype(jnp.int32)[:, None],
                    (0, gt),
                )
                if fused:
                    last, cache = engine._fused_token_step(
                        params, stacked, cache, tok, cache_mask,
                        cur_pos.astype(jnp.int32), gt, dims, interp,
                    )
                else:
                    step_logits, cache = engine._llm(
                        params, input_ids=tok[:, None],
                        attention_mask=cache_mask,
                        position_ids=cur_pos[:, None], cache=cache,
                        cache_index=gt,
                    )
                    last = step_logits[:, 0]
                if use_rep:
                    token_seen = token_seen.at[
                        jnp.arange(B, dtype=jnp.int32), tok
                    ].add(jnp.logical_not(done).astype(jnp.int32))
                cur_pos = cur_pos + jnp.logical_not(done)
                return (t + 1, cache, cache_mask, token_seen,
                        last, cur_pos, emitted, new_done,
                        gt + 1, rng, buf)

            state = (jnp.int32(0), cache, cache_mask, token_seen,
                     last_logits, cur_pos, emitted, done, gt, rng, buf)
            state = jax.lax.while_loop(cond, body, state)
            (_, cache, cache_mask, token_seen, last_logits, cur_pos,
             emitted, done, gt, rng, buf) = state
            # pack everything the host reads into ONE array: each host fetch
            # is a full RPC round-trip on remote-device links, so buf / done /
            # gt / cur_pos ride one transfer (rows: 0..T-1 tokens, T done,
            # T+1 gt, T+2 cur_pos).
            packed = jnp.concatenate(
                [buf,
                 done.astype(jnp.int32)[None, :],
                 jnp.full((1, B), gt, jnp.int32),
                 cur_pos[None, :].astype(jnp.int32)],
                axis=0,
            )
            return (cache, cache_mask, token_seen, last_logits, cur_pos,
                    emitted, done, packed)

        self._fns[key] = chunk
        return chunk

    def _build_compact(self):
        key = ("cont_compact", self.fused)
        if key in self._fns:
            return self._fns[key]

        fused = self.fused

        @partial(jax.jit, donate_argnums=(0, 1))
        def compact(cache, cache_mask, gt, shift):
            def roll(a, axis=1):
                return jnp.roll(a, -shift, axis=axis)

            if fused:  # stacked h-major layout: columns on axis 3
                from rlaifv_tpu.ops.fused_decode import compact_stacked

                # per-layer rolls: a whole-array roll of the multi-GB
                # stacked buffer would need a second full-size allocation
                cache = compact_stacked(cache, shift)
            else:
                cache = [
                    {key: roll(c[key]) for key in c} for c in cache
                ]
            cm = roll(cache_mask)
            cols = jnp.arange(cm.shape[1], dtype=jnp.int32)[None, :]
            cm = jnp.where(cols < gt - shift, cm, 0)
            return cache, cm, gt - shift

        self._fns[key] = compact
        return compact

    # --------------------------------------------------------------- host

    def run(
        self,
        prompts,
        *,
        images: Optional[np.ndarray] = None,
        image_starts=None,
        span_features: Optional[np.ndarray] = None,  # (N, S, Q, D)
        span_starts=None,  # (N, S), -1 inactive
        seed: int = 0,
        collect_first_logits: bool = False,
        max_new_per_prompt=None,  # (N,) per-prompt token budgets
        share_keys=None,  # (N,) hashable; equal key == identical prompt+media
    ):
        """Generate for every prompt; returns a GenerateResult (tokens padded
        to the longest generation, lengths incl. EOS, first_logits only when
        collect_first_logits)."""
        from rlaifv_tpu.genai.engine import GenerateResult, left_pad_batch

        engine, B, T = self.engine, self.B, self.T
        N = len(prompts)
        if N == 0:
            return GenerateResult(
                np.zeros((0, 0), np.int32), np.zeros(0, np.int64),
                np.zeros((0, engine.vocab_size), np.float32),
            )

        # longest-first: guarantees every refill prompt fits left of gt and
        # is the classic makespan heuristic. With share_keys, same-key
        # prompts stay adjacent (equal keys imply equal length, so this
        # never violates longest-first) so a refill wave sees whole runs.
        share = share_keys is not None
        if share:
            rank: dict = {}
            for i in range(N):
                rank.setdefault(share_keys[i], len(rank))
            queue = deque(sorted(
                range(N),
                key=lambda i: (-len(prompts[i]), rank[share_keys[i]], i),
            ))
        else:
            queue = deque(sorted(range(N), key=lambda i: -len(prompts[i])))
        saved = None  # last prefilled window: dict(key, Lp, window, first, ids, mask)
        Lp0 = _bucket(len(prompts[queue[0]]), self.prompt_bucket)
        # 128-aligned so the prefix decode-attention kernel engages
        max_len = -(-(Lp0 + self.max_new + self.headroom) // 128) * 128

        if self.fused:
            from rlaifv_tpu.ops.fused_decode import init_stacked_cache

            cache = init_stacked_cache(engine._llm_cfg(), B, max_len)
        else:
            cache = self.model.init_cache(B, max_len)
        cache_mask = jnp.zeros((B, max_len), jnp.int32)
        token_seen = jnp.zeros((B, engine.vocab_size), jnp.int32)
        last_logits = jnp.zeros((B, engine.vocab_size), self._logits_dtype())
        cur_pos = jnp.zeros((B,), jnp.int32)
        emitted = jnp.zeros((B,), jnp.int32)
        done = jnp.ones((B,), bool)
        budget = jnp.full((B,), self.max_new, jnp.int32)
        budgets = (np.minimum(np.asarray(max_new_per_prompt, np.int32),
                              self.max_new)
                   if max_new_per_prompt is not None
                   else np.full(N, self.max_new, np.int32))
        rng = jax.random.PRNGKey(seed)

        owner = [-1] * B
        chunks_per_slot = [[] for _ in range(B)]
        out_tokens = [None] * N
        first_logits = [None] * N
        host_done = np.ones(B, bool)
        gt_host = Lp0

        def harvest(s):
            p = owner[s]
            if p < 0:
                return
            toks = (np.concatenate(chunks_per_slot[s])
                    if chunks_per_slot[s] else np.zeros(0, np.int32))
            out_tokens[p] = toks
            owner[s] = -1
            chunks_per_slot[s] = []

        def media_for(p, off):
            """(media[None], starts) device args for one prompt, offset to
            its left-padded position — mirrors the batched refill's math."""
            if images is not None:
                st = int(image_starts[p])
                return (
                    engine._device_images(images[p][None]),
                    jnp.asarray([st + off if st >= 0 else -1], jnp.int32),
                )
            if span_features is not None:
                st = np.asarray(span_starts[p], np.int32)
                return (
                    jnp.asarray(span_features[p][None]),
                    jnp.asarray(
                        np.where(st < 0, -1, st + off)[None], jnp.int32
                    ),
                )
            return None, None

        def refill_shared_run(key_r, ps, run_slots):
            """Refill len(ps) slots with ONE identical prompt: prefill the
            window once per distinct key (or reuse the saved window), then
            broadcast-scatter — no forward pass for stragglers."""
            nonlocal cache, cache_mask, token_seen, last_logits
            nonlocal cur_pos, emitted, done, budget, saved
            p0 = ps[0]
            Lp_r = _bucket(len(prompts[p0]), self.prompt_bucket)
            if not (saved and saved["key"] == key_r and saved["Lp"] == Lp_r):
                ids, mask = left_pad_batch([prompts[p0]], engine.pad_id, Lp_r)
                media, starts = media_for(p0, Lp_r - len(prompts[p0]))
                mode = ("images" if images is not None
                        else "spans" if span_features is not None else "text")
                wfn = self._build_window_prefill(Lp_r, mode)
                window, first = wfn(
                    engine.params, engine._fused_stacked,
                    jnp.asarray(ids), jnp.asarray(mask), media, starts,
                )
                saved = dict(key=key_r, Lp=Lp_r, window=window, first=first,
                             ids=jnp.asarray(ids), mask=jnp.asarray(mask))
            K = _pow2_at_least(len(ps), B)
            slot_ids = np.full(K, B, np.int32)  # B = dropped dummy rows
            slot_ids[: len(ps)] = run_slots
            budgets_r = np.full(K, self.max_new, np.int32)
            budgets_r[: len(ps)] = budgets[ps]
            sfn = self._build_scatter_refill(K, Lp_r)
            (cache, cache_mask, token_seen, last_logits, cur_pos, emitted,
             done, budget) = sfn(
                cache, cache_mask, token_seen, last_logits, cur_pos,
                emitted, done, budget, saved["window"], saved["first"],
                saved["ids"], saved["mask"], jnp.asarray(slot_ids),
                jnp.int32(gt_host), jnp.asarray(budgets_r),
            )
            for s, p in zip(run_slots, ps):
                owner[s] = p
                host_done[s] = False
            if collect_first_logits:
                fl = np.asarray(saved["first"], np.float32)[0]
                for p in ps:
                    first_logits[p] = fl

        def refill():
            nonlocal cache, cache_mask, token_seen, last_logits
            nonlocal cur_pos, emitted, done, budget, gt_host
            free = [s for s in range(B) if host_done[s]]
            take = min(len(free), len(queue))
            if take == 0:
                return
            popped = [queue.popleft() for _ in range(take)]
            for s in free[:take]:
                harvest(s)

            # partition: same-key runs of >=2 (or a straggler matching the
            # saved window) refill via broadcast-scatter; the rest batch.
            shared_runs, group = [], []
            if share:
                runs = []
                for p in popped:
                    k = share_keys[p]
                    if runs and runs[-1][0] == k:
                        runs[-1][1].append(p)
                    else:
                        runs.append((k, [p]))
                # a singleton whose key recurs LATER in the queue still
                # wants the shared path: its window gets saved, so the next
                # wave's occurrences refill with no forward at all (a
                # batched-refill singleton would make them pay a second
                # full prefill)
                pending = {share_keys[q] for q in queue}
                for k, ps in runs:
                    skey = saved["key"] if saved else object()
                    if len(ps) >= 2 or k == skey or k in pending:
                        shared_runs.append((k, ps))
                    else:
                        group.extend(ps)
            else:
                group = popped

            # advance the shared write column ONCE so every window placed
            # this wave fits left of it — the skipped columns are mask-0,
            # and longest-first ordering bounds all Lp_r <= Lp0 <=
            # max_len - max_new - headroom.
            lp_need = max(
                (_bucket(len(prompts[ps[0]]), self.prompt_bucket)
                 for _, ps in shared_runs),
                default=0,
            )
            if group:
                lp_need = max(lp_need, _bucket(
                    max(len(prompts[p]) for p in group), self.prompt_bucket
                ))
            if lp_need > gt_host:
                gt_host = lp_need

            slot_iter = iter(free[:take])
            for k, ps in shared_runs:
                refill_shared_run(k, ps, [next(slot_iter) for _ in ps])
            if not group:
                return
            free_rest = list(slot_iter)
            take = len(group)
            Lp_r = _bucket(max(len(prompts[p]) for p in group),
                           self.prompt_bucket)
            R = _pow2_at_least(take, B)

            ids, mask = left_pad_batch(
                [prompts[p] for p in group], engine.pad_id, Lp_r
            )
            if take < R:
                ids = np.concatenate(
                    [ids, np.full((R - take, Lp_r), engine.pad_id, np.int32)]
                )
                mask = np.concatenate(
                    [mask, np.zeros((R - take, Lp_r), np.int32)]
                )
            slot_ids = np.full(R, B, np.int32)  # B = dropped (dummy rows)
            slot_ids[:take] = free_rest[:take]

            media = starts = None
            offs = Lp_r - np.asarray(
                [len(prompts[p]) for p in group], np.int32
            )
            if images is not None:
                media = np.zeros((R,) + images.shape[1:], images.dtype)
                media[:take] = images[group]
                st = np.asarray([image_starts[p] for p in group], np.int32)
                starts = np.zeros(R, np.int32)
                starts[:take] = np.where(st < 0, -1, st + offs)
            elif span_features is not None:
                media = np.zeros((R,) + span_features.shape[1:],
                                 span_features.dtype)
                media[:take] = span_features[group]
                st = np.asarray([span_starts[p] for p in group], np.int32)
                starts = np.full((R,) + st.shape[1:], -1, np.int32)
                starts[:take] = np.where(st < 0, -1, st + offs[:, None])

            budgets_r = np.full(R, self.max_new, np.int32)
            budgets_r[:take] = budgets[group]

            mode = ("images" if images is not None
                    else "spans" if span_features is not None else "text")
            fn = self._build_refill(R, Lp_r, mode)
            (cache, cache_mask, token_seen, last_logits, cur_pos, emitted,
             done, budget, first) = fn(
                engine.params, engine._fused_stacked, cache, cache_mask,
                token_seen, last_logits,
                cur_pos, emitted, done, budget, jnp.asarray(ids),
                jnp.asarray(mask), jnp.asarray(slot_ids), jnp.int32(gt_host),
                (engine._device_images(media) if mode == "images"
                 else jnp.asarray(media) if mode == "spans" else None),
                jnp.asarray(starts) if starts is not None else None,
                jnp.asarray(budgets_r),
            )
            for s, p in zip(free_rest[:take], group):
                owner[s] = p
                host_done[s] = False
            if collect_first_logits:
                fl = np.asarray(first, np.float32)
                for r, p in enumerate(group):
                    first_logits[p] = fl[r]

        chunk_fn = self._build_chunk(max_len)
        compact_fn = self._build_compact()

        refill()
        cur_host = np.zeros(B, np.int64)
        while queue or not host_done.all():
            if gt_host + T > max_len:
                # reclaim the dead prefix: every ACTIVE row's window is the
                # trailing cur_pos columns before gt (finished rows' windows
                # are dead — their tokens live in host buffers).
                active = cur_host[~host_done]
                base = int(active.max()) if active.size else 0
                shift = gt_host - base
                cache, cache_mask, _ = compact_fn(
                    cache, cache_mask, jnp.int32(gt_host), jnp.int32(shift)
                )
                gt_host -= shift

            rng, sub = jax.random.split(rng)
            (cache, cache_mask, token_seen, last_logits, cur_pos, emitted,
             done, packed) = chunk_fn(
                engine.params, engine._fused_stacked, cache, cache_mask,
                token_seen, last_logits, cur_pos, emitted, done, budget,
                jnp.int32(gt_host), sub,
            )
            packed_h = np.asarray(packed)  # single fetch: one RPC
            buf_h = packed_h[:T]
            host_done = packed_h[T].astype(bool)
            gt_host = int(packed_h[T + 1, 0])
            cur_host = packed_h[T + 2]
            for s in range(B):
                if owner[s] >= 0:
                    chunks_per_slot[s].append(buf_h[:, s])
            refill()

        for s in range(B):
            harvest(s)

        lengths = np.zeros(N, np.int64)
        trimmed = []
        for p in range(N):
            row = out_tokens[p]
            eos = np.where(row == engine.eos_id)[0]
            n = int(eos[0]) + 1 if len(eos) else min(len(row), int(budgets[p]))
            n = min(n, int(budgets[p]))
            lengths[p] = n
            trimmed.append(row[:n])
        width = max(self.max_new, 1)
        out = np.full((N, width), engine.pad_id, np.int32)
        for p, t in enumerate(trimmed):
            out[p, : len(t)] = t
        fl = (np.stack([f for f in first_logits])
              if collect_first_logits else None)
        return GenerateResult(out, lengths, fl)
