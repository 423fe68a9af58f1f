"""Jit-safe beam search decode (chat parity: beams=3, T=0 — ref
chat.py:169-178; gen-data beam path muffin/llava15_gen_data.py:330-345).

Design: after prefill, the KV cache is tiled to B*K rows; each scan step
scores K*V continuations per batch row, takes the global top-K, reorders
the cache rows by the chosen parent beams (one gather over the batch axis),
and freezes beams that emit EOS (their only continuation is PAD at frozen
score). Final pick: highest length-normalized score per row.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def beam_search(
    llm_apply,  # (params, **kw) -> (logits, cache)
    params,
    prefill_logits,  # (B, V) logits at the last prompt position
    cache,  # prefill cache, batch dim B
    cache_mask,  # (B, max_len)
    prompt_len,  # (B,)
    Lp: int,
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int,
    length_penalty: float = 1.0,
):
    B, V = prefill_logits.shape
    K = num_beams

    def tile(x):
        return jnp.repeat(x, K, axis=0)  # (B*K, ...)

    cache = jax.tree.map(tile, cache)
    cache_mask = tile(cache_mask)
    prompt_len_k = tile(prompt_len)

    logp0 = jax.nn.log_softmax(prefill_logits.astype(jnp.float32), axis=-1)
    # initialize: beam 0 is live, others -inf so the first step picks the
    # top-K distinct first tokens
    init_scores = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    top_val, top_tok = jax.lax.top_k(logp0, K)  # (B, K)
    scores = init_scores[:, :1] + top_val  # (B, K): top-K first tokens
    tokens0 = top_tok  # (B, K)
    done0 = tokens0 == eos_id
    lengths0 = jnp.ones((B, K), jnp.int32)

    def step(carry, t):
        cache, cache_mask, scores, last_tok, done, lengths, seqs_parent = carry
        # run one decode step for every beam
        flat_tok = last_tok.reshape(B * K, 1)
        cache_mask = cache_mask.at[:, Lp + t].set(1)
        pos_t = (prompt_len_k + t)[:, None]
        logits, new_cache = llm_apply(
            params,
            input_ids=jnp.maximum(flat_tok, 0),
            attention_mask=cache_mask,
            position_ids=pos_t,
            cache=cache,
            cache_index=jnp.int32(Lp) + t,
        )
        logp = jax.nn.log_softmax(
            logits[:, 0].astype(jnp.float32), axis=-1
        ).reshape(B, K, V)

        # frozen beams may only continue with PAD at unchanged score
        frozen = jnp.full((B, K, V), NEG_INF).at[:, :, pad_id].set(0.0)
        logp = jnp.where(done[..., None], frozen, logp)

        total = scores[..., None] + logp  # (B, K, V)
        flat = total.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)  # (B, K)
        parent = idx // V  # (B, K)
        tok = (idx % V).astype(jnp.int32)

        # reorder caches/masks by parent beams
        gather_rows = (
            jnp.arange(B)[:, None] * K + parent
        ).reshape(-1)  # (B*K,)
        new_cache = jax.tree.map(lambda c: c[gather_rows], new_cache)
        cache_mask = cache_mask[gather_rows]

        new_done = jnp.take_along_axis(done, parent, axis=1) | (tok == eos_id)
        parent_done = jnp.take_along_axis(done, parent, axis=1)
        new_lengths = jnp.take_along_axis(lengths, parent, axis=1) + (
            ~parent_done
        ).astype(jnp.int32)

        return (
            (new_cache, cache_mask, new_scores, tok, new_done, new_lengths,
             parent),
            (tok, parent),
        )

    carry0 = (cache, cache_mask, scores, tokens0, done0, lengths0,
              jnp.zeros((B, K), jnp.int32))
    (cache, cache_mask, scores, _, done, lengths, _), (toks, parents) = (
        jax.lax.scan(step, carry0,
                     jnp.arange(1, max_new_tokens, dtype=jnp.int32))
    )

    # backtrack: rebuild sequences from (toks, parents) chains
    T = max_new_tokens - 1

    def backtrack(b_toks, b_parents, first_toks):
        # b_toks/b_parents: (T, K); returns (K, max_new_tokens)
        def walk(beam):
            def body(carry, t):
                beam_idx = carry
                tok = b_toks[T - 1 - t, beam_idx]
                parent = b_parents[T - 1 - t, beam_idx]
                return parent, tok

            beam0, rev = jax.lax.scan(body, beam, jnp.arange(T))
            seq = rev[::-1]
            return jnp.concatenate([first_toks[beam0][None], seq])

        return jax.vmap(walk)(jnp.arange(K))

    seqs = jax.vmap(backtrack)(toks.transpose(1, 0, 2),
                               parents.transpose(1, 0, 2), tokens0)

    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=1)  # (B,)
    best_seqs = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_seqs, best_scores
