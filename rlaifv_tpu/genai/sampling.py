"""Logits processing for the jitted decode loop.

TPU-native replacement for HF generate's logits processors
(ref: chat.py:103-111 uses beam 3 / T 0.6 / top-k 30 / top-p 0.9 /
repetition-penalty 1.1; muffin/llava15_gen_data.py:273-313 uses pure
sampling T 0.7 and 1-token yes/no scoring). Everything is shape-static and
jit-safe: top-k/top-p operate via sort + mask, repetition penalty via a
per-batch token-count table updated functionally.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0  # 0 = off
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    do_sample: bool = True  # False = greedy

    @staticmethod
    def greedy() -> "SamplingParams":
        return SamplingParams(do_sample=False)

    @staticmethod
    def chat_12b() -> "SamplingParams":  # ref chat.py:103-111
        return SamplingParams(0.6, 30, 0.9, 1.1, True)

    @staticmethod
    def diverse_gen() -> "SamplingParams":  # ref llava15_diverse_gen.sh:30
        return SamplingParams(temperature=0.7, do_sample=True)


def apply_repetition_penalty(
    logits: Array, token_seen: Array, penalty: float
) -> Array:
    """HF semantics: seen tokens' logits are divided by the penalty if
    positive, multiplied if negative. token_seen: (B, V) bool/int."""
    if penalty == 1.0:
        return logits
    seen = token_seen.astype(bool)
    scaled = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, scaled, logits)


def apply_top_k(logits: Array, k: int) -> Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: Array, p: float) -> Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the first)
    keep_sorted = jnp.roll(cum < p, 1, axis=-1).at[..., 0].set(True)
    # threshold logit: smallest kept logit
    kth = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < kth, NEG_INF, logits)


def filtered_logits(logits: Array, params: SamplingParams) -> Array:
    """The sampling transform WITHOUT the draw: temperature + top-k +
    top-p filtered logits (f32). softmax of this is the exact sampling
    distribution `sample_token` draws from — speculative verification
    (genai/lookup_decode.py) needs it as a distribution."""
    logits = logits.astype(jnp.float32)
    if params.temperature != 1.0:
        logits = logits / max(params.temperature, 1e-6)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_top_p(logits, params.top_p)
    return logits


def sample_token(
    rng: Array,
    logits: Array,
    params: SamplingParams,
    token_seen: Optional[Array] = None,
) -> Array:
    """(B, V) logits -> (B,) next token ids."""
    logits = logits.astype(jnp.float32)
    if token_seen is not None:
        logits = apply_repetition_penalty(
            logits, token_seen, params.repetition_penalty
        )
    if not params.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = filtered_logits(logits, params)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def yesno_probs(logits: Array, yes_ids, no_ids) -> dict:
    """First-token softmax mass on {yes,Yes} vs {no,No} ids
    (ref: muffin/llava15_gen_data.py:296-313)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    yes = sum(probs[..., i] for i in yes_ids)
    no = sum(probs[..., i] for i in no_ids)
    return {"yes": yes, "no": no}
