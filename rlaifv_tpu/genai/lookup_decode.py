"""Prompt-lookup speculative decoding: exact greedy, fewer decode steps.

The decode ladder's rung past int4 weights (PARITY round-5 plan #5):
decode is weight-bandwidth-bound, so the only way below one
weight-read-per-token is to verify SEVERAL tokens per weight read. Prompt
lookup (Saxena 2023, the technique behind HF assisted generation's
prompt_lookup_num_tokens) drafts continuation candidates by matching the
last n-gram against the tokens already seen (prompt + generated) and
verifies the draft with ONE (k+1)-token window forward. Greedy output is
TOKEN-IDENTICAL to step-by-step decoding, and sampled output (speculative
sampling over point-mass drafts, `_spec_accept_resample`) is distributed
IDENTICALLY to plain `sample_token` decoding — acceptance only decides
speed, never quality; temperature/top-k/top-p are honored exactly (the
reference's divide-and-conquer stage samples at T=0.2,
ref utils/llama3_8b_inference.py:176-179). It shines exactly where this pipeline decodes greedily:
divide-and-conquer fact splitting quotes long spans of the answer it is
splitting (ref utils/llama3_8b_inference.py:207 prompts), and chat
answers echo question phrases.

Design notes, TPU-first:
- One jitted while_loop; the (k+1)-token verify window is a STATIC shape,
  so each iteration costs one window forward (≈ one decode step of HBM
  weight traffic) regardless of acceptance.
- The KV cache advances by (1 + accepted) columns per iteration; rejected
  window columns are left stale and are overwritten by the next window
  (the next write starts at most k columns behind the previous window's
  end, and windows are k+1 wide). Validity is the single watermark
  `cur + window`, so no per-column mask bookkeeping is needed.
- Single-stream (B=1) by design: per-row cache advance under batching
  needs per-row scatter columns (documented follow-up); the reference's
  interactive chat (chat.py) and MiniCPM autocheck (bs=1,
  minicpmv_autocheck.py) are single-stream surfaces already.
- Works on the per-layer bf16-KV cache path, whose attention already
  supports windows over a prefix (models/llama.py q_offset=cache_index);
  the int8-KV window branch is prefill-only, so engines wanting lookup
  decode keep kv_cache_dtype="bf16".
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.genai.sampling import (
    NEG_INF,
    SamplingParams,
    filtered_logits,
)


def _spec_accept_resample(rng, fl, draft, eos_id):
    """Exact speculative sampling over point-mass drafts.

    fl: (k+1, V) FILTERED logits (softmax = the target sampling
    distribution p_j after position j). draft: (k,) proposed tokens
    (-1 = no proposal). Returns (a, new_pending):

      - draft j is accepted with probability p_j[draft[j]] (the
        Leviathan/Chen accept rule with a point-mass proposal q = δ_d:
        min(1, p/q) evaluated at d is just p(d));
      - a = length of the leading accepted run (an accepted EOS ends it);
      - new_pending ~ the residual max(0, p_a - δ_{draft[a]}) renormalized
        (= p_a with the rejected token masked) — or plain p_a when there
        was no proposal or all k drafts were accepted.

    The emitted-token distribution is exactly p at every position, so
    sampled output is distributed identically to step-by-step
    `sample_token` decoding; lookup quality is untouched by acceptance.
    """
    k = draft.shape[0]
    probs = jax.nn.softmax(fl, axis=-1)  # (k+1, V)
    d_ok = draft >= 0
    pd = jnp.take_along_axis(
        probs[:k], jnp.maximum(draft, 0)[:, None], axis=1
    )[:, 0] * d_ok
    rng, r_acc, r_new = jax.random.split(rng, 3)
    u = jax.random.uniform(r_acc, (k,))
    acc = u < pd
    run_ok = jnp.cumprod(acc.astype(jnp.int32))
    not_eos = jnp.cumprod((draft != eos_id).astype(jnp.int32))
    pre_eos = jnp.concatenate([jnp.ones((1,), jnp.int32), not_eos[:-1]])
    a = jnp.sum(run_ok * pre_eos)

    l_sel = fl[a]
    # mask the rejected proposal out of the residual (only when there WAS
    # a proposal at the break position, i.e. a < k and draft[a] >= 0)
    d_at = jnp.where(a < k, draft[jnp.minimum(a, k - 1)], -1)
    iota = jnp.arange(fl.shape[1])
    l_sel = jnp.where((iota == d_at) & (d_at >= 0), NEG_INF, l_sel)
    new_pending = jax.random.categorical(r_new, l_sel).astype(jnp.int32)
    return a, new_pending


@dataclasses.dataclass
class LookupResult:
    tokens: list          # emitted ids (truncated after EOS, EOS included
                          # — the engine's GenerateResult convention)
    n_steps: int          # window forwards executed
    n_emitted: int        # tokens emitted before truncation
    tokens_per_step: float


def _build_lookup_fn(engine, Lp: int, max_new: int, k: int, n: int,
                     max_len: int, eos_id: int,
                     sp: Optional[SamplingParams] = None):
    model = engine.model

    @jax.jit
    def run(params, ids, images, image_starts, span_features, span_starts,
            rng0):
        # ---- prefill (mirrors DecodeEngine._build, non-fused path)
        B = 1
        pos = jnp.arange(Lp, dtype=jnp.int32)[None]
        cache = model.init_cache(B, max_len)
        cache_mask = (jnp.arange(max_len) < Lp).astype(jnp.int32)[None]
        if images is not None or span_features is not None:
            embeds = engine._embed_spliced(
                params, ids, images, image_starts, span_features, span_starts
            )
            logits, cache = engine._llm(
                params, inputs_embeds=embeds, attention_mask=cache_mask,
                position_ids=pos, cache=cache, cache_index=jnp.int32(0),
            )
        else:
            logits, cache = engine._llm(
                params, input_ids=jnp.maximum(ids, 0),
                attention_mask=cache_mask,
                position_ids=pos, cache=cache, cache_index=jnp.int32(0),
            )
        if sp is None:
            pending = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            rng = rng0
        else:
            rng, r0 = jax.random.split(rng0)
            pending = jax.random.categorical(
                r0, filtered_logits(logits[0, -1], sp)
            ).astype(jnp.int32)

        # token history drives the n-gram lookup; sentinel ids (e.g. the
        # -200 image slot) clamp to 0 — they never match real drafts
        hist = jnp.zeros((max_len + k + 1,), jnp.int32)
        hist = jax.lax.dynamic_update_slice(hist, jnp.maximum(ids[0], 0),
                                            (0,))
        pos_iota = jnp.arange(max_len + k + 1, dtype=jnp.int32)

        def find_draft(hist, hlen, pending):
            # match the n-gram [hist[hlen-n+1 : hlen], pending] ending at
            # each candidate position p; take the LATEST p (recency wins,
            # matching the HF heuristic), draft = the k tokens after p
            ok = jnp.ones_like(pos_iota, dtype=bool)
            for j in range(n):  # gram position j aligns at p - (n-1) + j
                g = jnp.where(j == n - 1, pending,
                              hist[jnp.maximum(hlen - n + 1 + j, 0)])
                idx = pos_iota - (n - 1) + j
                ok = ok & (hist[jnp.clip(idx, 0, max_len + k)] == g)
            ok = ok & (pos_iota >= n - 1) & (pos_iota < hlen - 1)
            p = jnp.where(ok.any(), jnp.argmax(pos_iota * ok), -1)
            draft = jax.lax.dynamic_slice(
                hist, (jnp.maximum(p + 1, 0),), (k,)
            )
            # no match -> draft of -1s: never equals a real argmax token,
            # so acceptance is 0 and the step degrades to plain decode
            return jnp.where(p >= 0, draft, jnp.full((k,), -1, jnp.int32))

        def cond(st):
            cur = st[0]
            done, out_n = st[3], st[4]
            return (~done) & (out_n < max_new) & (cur + k + 1 <= max_len)

        def body(st):
            cur, hlen, pending, done, out_n, steps, cache, hist, rng = st
            draft = find_draft(hist, hlen, pending)
            window = jnp.concatenate([pending[None], jnp.maximum(draft, 0)]
                                     )[None]  # (1, k+1)
            wpos = (cur + jnp.arange(k + 1, dtype=jnp.int32))[None]
            wmask = (pos_iota[:max_len] < cur + k + 1).astype(jnp.int32)[None]
            logits, cache = engine._llm(
                params, input_ids=window, attention_mask=wmask,
                position_ids=wpos, cache=cache, cache_index=cur,
            )
            if sp is None:
                nxt = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                eq = draft == nxt[:k]
                # accepted = leading-True run length; eos inside the
                # accepted prefix ends the run there (tokens past eos
                # must not count)
                run_ok = jnp.cumprod(eq.astype(jnp.int32))
                not_eos = jnp.cumprod((draft != eos_id).astype(jnp.int32))
                pre_eos = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                           not_eos[:-1]])
                a = jnp.sum(run_ok * pre_eos)
                new_pending = nxt[a]
            else:
                rng, r_step = jax.random.split(rng)
                fl = filtered_logits(logits[0], sp)  # (k+1, V)
                a, new_pending = _spec_accept_resample(
                    r_step, fl, draft, eos_id
                )
            emitted = jnp.concatenate([pending[None], draft])  # (k+1,)
            hist = jax.lax.dynamic_update_slice(hist, emitted, (hlen,))
            n_emit = 1 + a
            hit_eos = (pending == eos_id) | (jnp.max(
                (jnp.arange(k + 1) <= a) & (emitted == eos_id)
            ))
            return (cur + n_emit, hlen + n_emit, new_pending,
                    done | hit_eos, out_n + n_emit, steps + 1, cache, hist,
                    rng)

        st = (jnp.int32(Lp), jnp.int32(Lp), pending, jnp.bool_(False),
              jnp.int32(0), jnp.int32(0), cache, hist, rng)
        cur, hlen, pending, done, out_n, steps, cache, hist, rng = (
            jax.lax.while_loop(cond, body, st)
        )
        # the pending token was produced but its KV never written; emit it
        # if the loop ended with room (matches plain greedy's last token)
        tail_ok = (~done) & (out_n < max_new)
        hist = jnp.where(
            tail_ok,
            jax.lax.dynamic_update_slice(hist, pending[None], (hlen,)),
            hist,
        )
        out_n = out_n + tail_ok.astype(jnp.int32)
        toks = jax.lax.dynamic_slice(hist, (Lp,), (max_new + k + 1,))
        return toks, out_n, steps

    return run


def lookup_generate(
    engine,
    prompt_ids,
    *,
    max_new_tokens: int = 128,
    draft_len: int = 8,
    ngram: int = 2,
    images=None,
    image_starts=None,
    span_features=None,
    span_starts=None,
    eos_id: Optional[int] = None,
    sampling: Optional[SamplingParams] = None,
    seed: int = 0,
) -> LookupResult:
    """Generation with prompt-lookup speculation. sampling=None (default):
    greedy, token-identical to DecodeEngine.generate(greedy).
    sampling=SamplingParams(...): exact speculative sampling — emitted
    tokens are distributed identically to plain `sample_token` decoding
    (see `_spec_accept_resample`); repetition_penalty is not supported on
    this path (it needs the token_seen table the window loop doesn't
    carry). Single prompt (list of ids); media kwargs mirror the engine's
    generate()."""
    if engine.fused_decode:
        raise ValueError("lookup decode runs the per-layer path; build the "
                         "engine with fused_decode=False")
    if sampling is not None and not sampling.do_sample:
        sampling = None  # greedy params = the greedy path
    if sampling is not None and sampling.repetition_penalty != 1.0:
        raise ValueError("lookup decode does not support "
                         "repetition_penalty")
    eos = engine.eos_id if eos_id is None else eos_id
    ids = np.asarray(prompt_ids, np.int32)[None]
    Lp = ids.shape[1]
    max_len = Lp + max_new_tokens + draft_len + 2
    max_len = int(np.ceil(max_len / 64) * 64)

    key = ("lookup", Lp, max_new_tokens, draft_len, ngram, max_len,
           sampling)
    fn = engine._gen_fns.get(key)
    if fn is None:
        fn = _build_lookup_fn(engine, Lp, max_new_tokens, draft_len, ngram,
                              max_len, eos, sp=sampling)
        engine._gen_fns[key] = fn

    toks, out_n, steps = fn(
        engine.params, jnp.asarray(ids),
        engine._device_images(images),
        None if image_starts is None else jnp.asarray(image_starts),
        None if span_features is None else jnp.asarray(span_features),
        None if span_starts is None else jnp.asarray(span_starts),
        jax.random.PRNGKey(seed),
    )
    toks = np.asarray(toks)[: int(out_n)][:max_new_tokens]
    if (toks == eos).any():
        # the engine's convention: the EOS token itself is emitted
        toks = toks[: int(np.argmax(toks == eos)) + 1]
    steps = int(steps)
    emitted = len(toks)
    return LookupResult(
        tokens=[int(t) for t in toks],
        n_steps=steps,
        n_emitted=emitted,
        tokens_per_step=round(emitted / max(steps, 1), 3),
    )
