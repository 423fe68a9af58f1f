"""MiniCPM-Llama3-V 2.5: SigLIP tower + resampler + Llama3-8B.

Flax rebuild of the trust_remote_code model the reference drives
(ref: minicpm-llama3-v-25/minicpmv_autocheck.py:42-195 — chat-template
prompts with <image><unk>*Q</image> (+ <slice> grid) placeholders, sliced
images with per-slice tgt_sizes, `get_vllm_embedding` splices resampled
features over the unk spans).

Multi-span splice: a sliced image contributes 1 + n_slices feature groups,
each query_num long, at different positions of the same sequence —
handled by a lax.scan of dynamic_update_slice over the (padded) span list,
static shapes throughout.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM, llama_init_cache
from rlaifv_tpu.models.resampler import Resampler, ResamplerConfig
from rlaifv_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTower

Array = jax.Array


def splice_multi_span(
    text_embeds: Array,  # (B, L, D)
    span_features: Array,  # (B, S, Q, D) padded span groups
    span_starts: Array,  # (B, S) int32, -1 = inactive span
) -> Array:
    """Overwrite Q-token spans; inactive spans are no-ops."""

    def per_sample(emb, feats, starts):
        def body(emb, xs):
            feat, start = xs
            active = start >= 0
            s = jnp.maximum(start, 0)
            updated = jax.lax.dynamic_update_slice(
                emb, feat.astype(emb.dtype), (s, 0)
            )
            ghost = (0.0 * feat.sum()).astype(emb.dtype)
            return jnp.where(active, updated, emb + ghost), None

        out, _ = jax.lax.scan(body, emb, (feats, starts))
        return out

    return jax.vmap(per_sample)(text_embeds, span_features, span_starts)


@dataclasses.dataclass(frozen=True)
class MiniCPMVConfig:
    llm: LlamaConfig = dataclasses.field(default_factory=LlamaConfig.llama3_8b)
    vision: SiglipVisionConfig = dataclasses.field(
        default_factory=SiglipVisionConfig.so400m
    )
    query_num: int = 96
    slice_mode: bool = True
    max_slice_nums: int = 9
    scale_resolution: int = 448
    patch_size: int = 14

    @property
    def resampler(self) -> ResamplerConfig:
        import math

        return ResamplerConfig(
            grid_size=int(math.isqrt(self.query_num)),
            embed_dim=self.llm.hidden_size,
            num_heads=max(1, self.llm.hidden_size // 128),
            kv_dim=self.vision.hidden_size,
            dtype=self.llm.dtype,
            param_dtype=self.llm.param_dtype,
            # 2.5 semantics: query_num queries (96 — NOT a square grid; the
            # isqrt grid_size above silently emitted 81 before this), no
            # query-side pos embed — sincos positions ride the keys, per
            # slice tgt_size (tgt_hw in encode_slices)
            num_queries_override=self.query_num,
            query_pos=False,
        )

    @staticmethod
    def minicpm_llama3_v25(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16):
        return MiniCPMVConfig(
            llm=LlamaConfig.llama3_8b(dtype=dtype, param_dtype=param_dtype),
            vision=SiglipVisionConfig.so400m(dtype=dtype, param_dtype=param_dtype),
        )

    @staticmethod
    def minicpm_llama3_v25_int8(dtype=jnp.bfloat16,
                                param_dtype=jnp.bfloat16,
                                bits: int = 8):
        """Single-chip serving: Llama3-8B bf16 alone is 16G; int8 LM +
        int8 KV fits next to the bf16 SigLIP-400M tower (~10G total).
        Convert with models.convert.quantize_llm_int8(params['llm'],
        include_lm_head=False) — or quantize_llm_int4 with bits=4 (packed int4
        LM base 4G: half the decode weight traffic again)."""
        return MiniCPMVConfig(
            llm=LlamaConfig.llama3_8b(
                dtype=dtype, param_dtype=param_dtype, quantize=True,
                quantize_bits=bits, quantize_lm_head=False,
                kv_cache_dtype="int8",
            ),
            vision=SiglipVisionConfig.so400m(dtype=dtype,
                                             param_dtype=param_dtype),
        )

    @staticmethod
    def tiny(**kw) -> "MiniCPMVConfig":
        return MiniCPMVConfig(
            llm=LlamaConfig.tiny(num_kv_heads=2),
            vision=SiglipVisionConfig.tiny(),
            query_num=4,
            scale_resolution=28,
            patch_size=7,
        )


class MiniCPMVForCausalLM(nn.Module):
    cfg: MiniCPMVConfig

    def setup(self):
        self.vision_tower = SiglipVisionTower(self.cfg.vision, name="vpm")
        self.resampler = Resampler(self.cfg.resampler, name="resampler")
        self.llm = LlamaForCausalLM(self.cfg.llm, name="llm")

    def encode_slices(self, images: Array) -> Array:
        """(N, H, W, 3) slice batch -> (N, query_num, llm_hidden).

        Slices may be non-square; the resampler gets the (gh, gw) token
        grid so its kv position table matches (2.5 tgt_sizes semantics)."""
        gh = images.shape[1] // self.cfg.vision.patch_size
        gw = images.shape[2] // self.cfg.vision.patch_size
        return self.resampler(self.vision_tower(images), tgt_hw=(gh, gw))

    # one span group per slice: engine/driver arranges (B, S, Q, D)
    def __call__(
        self,
        input_ids: Array,
        *,
        span_features: Optional[Array] = None,  # (B, S, Q, D)
        span_starts: Optional[Array] = None,  # (B, S)
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
    ):
        ids = jnp.maximum(input_ids, 0)
        embeds = self.llm.embed(ids)
        if span_features is not None:
            embeds = splice_multi_span(embeds, span_features, span_starts)
        return self.llm(
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            cache=cache,
            cache_index=cache_index,
        )

    def forward_with_spans(
        self, input_ids, span_features, span_starts, attention_mask=None
    ) -> Array:
        logits, _ = self(
            input_ids,
            span_features=span_features,
            span_starts=span_starts,
            attention_mask=attention_mask,
        )
        return logits

    def init_cache(self, batch: int, max_len: int) -> list:
        return llama_init_cache(self.cfg.llm, batch, max_len)


def find_unk_spans(input_ids, unk_id: int, query_num: int) -> List[int]:
    """Host-side: starts of contiguous unk runs of exactly query_num
    (the <image>/<slice> placeholder spans, in reading order)."""
    ids = np.asarray(input_ids)
    starts = []
    i = 0
    while i < len(ids):
        if ids[i] == unk_id:
            j = i
            while j < len(ids) and ids[j] == unk_id:
                j += 1
            if j - i == query_num:
                starts.append(i)
            i = j
        else:
            i += 1
    return starts
