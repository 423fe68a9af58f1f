"""LLaVA-1.5 meta-architecture: CLIP tower + projector + LLaMA LM.

TPU-first redesign of the reference vision-feature injection
(ref: llava/model/llava_arch.py:150-330 `prepare_inputs_labels_for_multimodal`
and llava/model/language_model/llava_llama.py:41-158). The reference builds
ragged per-sample Python lists (unpad, split on the -200 sentinel, concat,
re-pad) — hostile to XLA. Here the splice is **static-shape**: the host-side
collator pre-expands each sequence so the image span occupies `num_patches`
slots (rlaifv_tpu/data/multimodal.py), and the model overwrites that span
with projected vision features via a vmapped dynamic_update_slice. Token-level
semantics (order, truncation, label masking) are identical; shapes are fixed
so one compiled program serves every batch.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.models.projector import VisionProjector

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llm: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    projector_type: str = "mlp2x_gelu"
    # LLaVA-1.6 anyres surface (ref llava_arch.py:158-205; RLAIF-V trains
    # with 'pad'): grid pinpoints + merge type drive the inference path.
    image_aspect_ratio: str = "pad"
    image_grid_pinpoints: Optional[list] = None
    mm_patch_merge_type: str = "flat"

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches if self.vision.select_feature == "patch" \
            else self.vision.num_positions

    @staticmethod
    def llava15_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, **kw) -> "LlavaConfig":
        return LlavaConfig(
            llm=LlamaConfig.vicuna_7b(dtype=dtype, param_dtype=param_dtype, **kw),
            vision=CLIPVisionConfig.clip_l_336(dtype=dtype, param_dtype=param_dtype),
        )

    @staticmethod
    def tiny(**kw) -> "LlavaConfig":
        return LlavaConfig(
            llm=LlamaConfig.tiny(**kw),
            vision=CLIPVisionConfig.tiny(hidden_size=48),
        )


def splice_image_features(
    text_embeds: Array, image_features: Array, image_starts: Array
) -> Array:
    """Overwrite `num_patches` slots of each sequence with image features.

    text_embeds: (B, L, D); image_features: (B, P, D);
    image_starts: (B,) int32, -1 => text-only sample (features dropped, but
    a zero-strength residual keeps the vision path on the gradient graph,
    mirroring the reference's `cur_image_features[0:0]` trick,
    llava_arch.py:243-248).
    """

    def one(emb, feats, start):
        has_image = start >= 0
        start = jnp.maximum(start, 0)
        spliced = jax.lax.dynamic_update_slice(emb, feats.astype(emb.dtype), (start, 0))
        # Text-only: keep result = emb, but touch feats so grads flow (0 * sum).
        ghost = (0.0 * feats.sum()).astype(emb.dtype)
        return jnp.where(has_image, spliced, emb + ghost)

    return jax.vmap(one)(text_embeds, image_features, image_starts)


class LlavaForCausalLM(nn.Module):
    cfg: LlavaConfig

    def setup(self):
        self.vision_tower = CLIPVisionTower(self.cfg.vision, name="vision_tower")
        self.mm_projector = VisionProjector(
            self.cfg.projector_type,
            self.cfg.llm.hidden_size,
            dtype=self.cfg.llm.dtype,
            param_dtype=self.cfg.llm.param_dtype,
            name="mm_projector",
        )
        self.llm = LlamaForCausalLM(self.cfg.llm, name="llm")

    def encode_images(self, images: Array) -> Array:
        """(B, H, W, 3) -> (B, P, llm_hidden) (ref llava_arch.py:141-147).

        uint8 input = resized-but-unnormalized pixels (the half-bandwidth
        upload path): normalize on device in fp32 — bit-equal to the host
        ClipImageProcessor float output."""
        if images.dtype == jnp.uint8:
            v = self.cfg.vision
            mean = jnp.asarray(v.image_mean, jnp.float32)
            std = jnp.asarray(v.image_std, jnp.float32)
            images = (images.astype(jnp.float32) / 255.0 - mean) / std
            images = images.astype(v.dtype)
        return self.mm_projector(self.vision_tower(images))

    def build_embeds(
        self, input_ids: Array, images: Optional[Array], image_starts: Optional[Array]
    ) -> Array:
        ids = jnp.maximum(input_ids, 0)  # patch-slot sentinels -> dummy token 0
        text_embeds = self.llm.embed(ids)
        if images is None:
            return text_embeds
        feats = self.encode_images(images)
        return splice_image_features(text_embeds, feats, image_starts)

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
        """input_ids are host-side pre-expanded (image span = patch slots)."""
        embeds = self.build_embeds(input_ids, images, image_starts)
        return self.llm(
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            cache=cache,
            cache_index=cache_index,
        )

    def forward_with_features(
        self,
        input_ids: Array,
        image_features: Array,
        image_starts: Array,
        attention_mask: Optional[Array] = None,
    ) -> Array:
        """Forward from precomputed vision features (B or 2B rows). Lets the
        DPO step encode each image once and tile features across win‖rej."""
        ids = jnp.maximum(input_ids, 0)
        embeds = splice_image_features(
            self.llm.embed(ids), image_features, image_starts
        )
        logits, _ = self.llm(inputs_embeds=embeds, attention_mask=attention_mask)
        return logits

    def forward_text(
        self, input_ids: Array, attention_mask: Optional[Array] = None
    ) -> Array:
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
        Feeds the fused-head logp path (ops/fused_head.py), which applies
        the head matmul inside the kernel."""
        ids = jnp.maximum(input_ids, 0)
        embeds = splice_image_features(
            self.llm.embed(ids), image_features, image_starts
        )
        hidden, _ = self.llm.model(
            inputs_embeds=embeds, attention_mask=attention_mask
        )
        return hidden

    def hidden_text(
        self, input_ids: Array, attention_mask: Optional[Array] = None
    ) -> Array:
        hidden, _ = self.llm.model(
            input_ids=jnp.maximum(input_ids, 0), attention_mask=attention_mask
        )
        return hidden

    def decode_step(
        self,
        token_ids: Array,
        cache: list,
        cache_index: Array,
        attention_mask: Optional[Array] = None,
    ):
        """One decode step over cached keys (token_ids: (B, 1))."""
        return self.llm(
            input_ids=token_ids,
            attention_mask=attention_mask,
            cache=cache,
            cache_index=cache_index,
        )

    def init_cache(self, batch: int, max_len: int) -> list:
        from rlaifv_tpu.models.llama import llama_init_cache

        return llama_init_cache(self.cfg.llm, batch, max_len)
