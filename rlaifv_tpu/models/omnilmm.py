"""OmniLMM-12B: EVA02-enormous tower + perceiver resampler + Mistral LM.

Flax rebuild of the reference model (ref: omnilmm/model/omnilmm.py:55-265 —
`OmniLMMModel` with `get_vision_embedding` :107, `get_vllm_embedding`
:122-181, token-splice forward :183-265). Image placement differs from
LLaVA: the prompt already contains literal `<im_start><im_patch>*N<im_end>`
tokens (text-level expansion, train_utils.py:161-174), so sequence length
never changes — the model just overwrites the N patch-token embeddings
with resampled vision features, which is exactly our static
`splice_image_features` with start = first patch position.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.eva02 import EvaConfig, EvaVisionTower
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM, llama_init_cache
from rlaifv_tpu.models.llava import splice_image_features
from rlaifv_tpu.models.resampler import Resampler, ResamplerConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OmniLMMConfig:
    llm: LlamaConfig = dataclasses.field(
        default_factory=LlamaConfig.mistral_7b
    )
    vision: EvaConfig = dataclasses.field(default_factory=EvaConfig.enormous)
    num_query: int = 64  # grid 8x8 resampled queries

    @property
    def resampler(self) -> ResamplerConfig:
        import math

        return ResamplerConfig(
            grid_size=int(math.isqrt(self.num_query)),
            embed_dim=self.llm.hidden_size,
            num_heads=max(1, self.llm.hidden_size // 128),
            kv_dim=self.vision.embed_dim,
            dtype=self.llm.dtype,
            param_dtype=self.llm.param_dtype,
        )

    @property
    def num_image_tokens(self) -> int:
        return self.num_query

    @staticmethod
    def omnilmm_12b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16) -> "OmniLMMConfig":
        return OmniLMMConfig(
            llm=LlamaConfig.mistral_7b(dtype=dtype, param_dtype=param_dtype),
            vision=EvaConfig.enormous(dtype=dtype, param_dtype=param_dtype),
            num_query=64,
        )

    @staticmethod
    def omnilmm_12b_int8(dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16,
                         bits: int = 8) -> "OmniLMMConfig":
        """Single-chip 12B serving: int8 LM + int8 KV cache + int8 EVA
        tower (4.4G instead of 8.8G — bf16 12B cannot load on 16G at
        all; the reference labels with this model on A100-80G,
        script/data_gen/omnilmm/omnilmm_autocheck.sh). bits=4: nibble-packed int4
        weights on both towers (5.8G total) — decode bandwidth AND memory
        headroom."""
        return OmniLMMConfig(
            llm=LlamaConfig.mistral_7b(
                dtype=dtype, param_dtype=param_dtype, quantize=True,
                quantize_bits=bits, quantize_lm_head=False,
                kv_cache_dtype="int8",
            ),
            vision=EvaConfig.enormous(
                dtype=dtype, param_dtype=param_dtype, quantize=True,
                quantize_bits=bits,
            ),
            num_query=64,
        )

    @staticmethod
    def tiny(**kw) -> "OmniLMMConfig":
        return OmniLMMConfig(
            llm=LlamaConfig.tiny(num_kv_heads=2),
            vision=EvaConfig.tiny(),
            num_query=4,
        )


class OmniLMMForCausalLM(nn.Module):
    cfg: OmniLMMConfig

    def setup(self):
        self.vision_tower = EvaVisionTower(self.cfg.vision, name="vision_tower")
        self.resampler = Resampler(self.cfg.resampler, name="resampler")
        self.llm = LlamaForCausalLM(self.cfg.llm, name="llm")

    def encode_images(self, images: Array) -> Array:
        """(B, H, W, 3) -> (B, num_query, llm_hidden)
        (ref get_vision_embedding :107-121)."""
        return self.resampler(self.vision_tower(images))

    def forward_with_features(
        self,
        input_ids: Array,
        image_features: Array,
        image_starts: Array,
        attention_mask: Optional[Array] = None,
    ) -> Array:
        ids = jnp.maximum(input_ids, 0)
        embeds = splice_image_features(
            self.llm.embed(ids), image_features, image_starts
        )
        logits, _ = self.llm(inputs_embeds=embeds, attention_mask=attention_mask)
        return logits

    def forward_text(self, input_ids: Array,
                     attention_mask: Optional[Array] = None) -> Array:
        logits, _ = self.llm(
            input_ids=jnp.maximum(input_ids, 0), attention_mask=attention_mask
        )
        return logits

    def hidden_with_features(
        self,
        input_ids: Array,
        image_features: Array,
        image_starts: Array,
        attention_mask: Optional[Array] = None,
    ) -> Array:
        """forward_with_features stopping before the lm_head: (B, L, H).
        Feeds the fused/compact-head DPO logp paths (train/train_step.py) —
        the DPO train step for OmniLMM (ref get_beta_and_logps
        is_llava15=False, muffin/train/trainers.py:161-275) runs the same
        fused win‖rej forward as LLaVA, just with the resampled features
        overwriting the <im_patch> span."""
        ids = jnp.maximum(input_ids, 0)
        embeds = splice_image_features(
            self.llm.embed(ids), image_features, image_starts
        )
        hidden, _ = self.llm.model(
            inputs_embeds=embeds, attention_mask=attention_mask
        )
        return hidden

    def hidden_text(self, input_ids: Array,
                    attention_mask: Optional[Array] = None) -> Array:
        hidden, _ = self.llm.model(
            input_ids=jnp.maximum(input_ids, 0), attention_mask=attention_mask
        )
        return hidden

    def __call__(
        self,
        input_ids: Array,
        *,
        images: Optional[Array] = None,
        image_starts: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
    ):
        ids = jnp.maximum(input_ids, 0)
        embeds = self.llm.embed(ids)
        if images is not None:
            feats = self.encode_images(images)
            embeds = splice_image_features(embeds, feats, image_starts)
        return self.llm(
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            cache=cache,
            cache_index=cache_index,
        )

    def init_cache(self, batch: int, max_len: int) -> list:
        return llama_init_cache(self.cfg.llm, batch, max_len)


def find_image_start(input_ids, im_patch_token: int) -> int:
    """Host-side: first <im_patch> position (-1 when text-only)."""
    import numpy as np

    hits = np.where(np.asarray(input_ids) == im_patch_token)[0]
    return int(hits[0]) if len(hits) else -1
