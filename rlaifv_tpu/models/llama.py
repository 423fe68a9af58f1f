"""LLaMA-family decoder in flax.linen — the LM backbone for LLaVA-1.5
(Vicuna-7B), MiniCPM-Llama3-V (Llama3-8B) and the divide-and-conquer engine.

TPU-native replacement for the reference's HF `LlamaForCausalLM` dependency
(ref: llava/model/language_model/llava_llama.py:41-158 wraps HF Llama;
flash-attention is requested at muffin/train/train_llava15.py:338). The math
is kept HF-compatible (RoPE rotate-half layout, RMSNorm epsilon placement,
SiLU gate MLP) so converted safetensors checkpoints reproduce logits exactly.

Sharding: params stay plain arrays; rlaifv_tpu/parallel/sharding.py maps
param paths to PartitionSpecs by rule (tp over heads/ffn, fsdp over the
complementary axis), t5x-style, so HF weight conversion and optimizer
trees never deal with boxed leaves.

Attention runs through rlaifv_tpu.ops.attention which dispatches to a Pallas
flash kernel on TPU or a fused-softmax jnp path elsewhere; decode uses a
static-shape KV cache updated with lax.dynamic_update_slice.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlaifv_tpu.ops.attention import multi_head_attention

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None  # defaults to hidden//heads
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6  # HF Llama default (Vicuna-7B); Llama3 uses 1e-5
    tie_word_embeddings: bool = False
    attn_impl: str = "auto"  # "auto" | "flash" | "dense"
    remat: bool = False
    dtype: Any = jnp.float32  # activation/compute dtype
    param_dtype: Any = jnp.float32
    # weight-only int8 (QuantDense) for all projection/mlp/lm_head kernels
    # (the TPU answer to the loader's 4/8-bit options); differentiable
    # w.r.t. activations (ops/quant_matmul.py dx kernel), so QLoRA-style
    # adapter training over the frozen int8 base works.
    quantize: bool = False
    # 8 = QuantDense int8 (per-out-channel scales); 4 = packed int4 with
    # group-wise scales (ops/int4_matmul.py — the TPU answer to the
    # reference loader's bitsandbytes `load_4bit`, llava/model/builder.py:
    # 30-49): weight HBM traffic halves again vs int8, which is the decode
    # floor. Both are differentiable w.r.t. activations, so QLoRA-style
    # adapter training works over either frozen base (int4 base + bf16
    # adapters IS the original QLoRA recipe).
    quantize_bits: int = 8
    # keep the LM head bf16 when the body is int8: the compact/fused DPO
    # head paths consume the head kernel as a plain array, and the head is
    # the quality-critical projection (QLoRA keeps it unquantized too)
    quantize_lm_head: bool = True
    # "bf16"/"fp" (= cfg.dtype) or "int8": quantized decode cache (see
    # llama_init_cache). Serving memory/bandwidth feature; training and
    # cache-less paths are unaffected.
    kv_cache_dtype: str = "fp"
    # serving: fuse q/k/v into one qkv_proj and gate/up into gate_up_proj
    # (4 projection calls/layer instead of 7 — per-call launch latency
    # dominates weight-bound int8 decode on some runtimes). Param layout
    # changes; convert.py::fuse_llm_projections rewrites a checkpoint tree,
    # bit-identically for int8 (per-out-channel scales concat exactly).
    # Not combinable with LoRA adapters (their target paths name q_proj…).
    fuse_proj: bool = False

    @property
    def head_size(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def vicuna_7b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)

    @staticmethod
    def llama3_8b(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            max_position_embeddings=8192,
            rope_theta=500000.0,
            rms_norm_eps=1e-5,
        )
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def mistral_7b(**kw) -> "LlamaConfig":
        """Mistral-7B / Zephyr-beta: the OmniLMM-12B language backbone
        (ref omnilmm/model/omnilmm.py:55 extends MistralModel)."""
        base = dict(
            vocab_size=32000,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            max_position_embeddings=32768,
            rope_theta=10000.0,
            rms_norm_eps=1e-5,
        )
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_position_embeddings=128,
        )
        base.update(kw)
        return LlamaConfig(**base)


def rope_cos_sin(
    positions: Array, head_dim: int, theta: float, dtype=jnp.float32
) -> Tuple[Array, Array]:
    """HF-layout rotary tables: (..., L, head_dim) with freqs duplicated."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., L, hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: (B, L, H, D); cos/sin: (B, L, D) or (L, D). HF rotate-half layout."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos + rotated * sin).astype(x.dtype)


def llama_init_cache(cfg: LlamaConfig, batch: int, max_len: int) -> list:
    """Static-shape decode cache: per layer (B, max_len, KVH, D).

    kv_cache_dtype="int8": values stored int8 with per-(token, head)
    symmetric scales — cache HBM halves, and the decode read bound (cache +
    weights per step) drops with it. Prefill attention still runs on the
    fresh bf16 k/v (exact); only decode reads pay the quantization error."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_size)
    if cfg.kv_cache_dtype == "int8":
        sshape = shape[:-1]
        return [
            {
                "k": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(sshape, jnp.float32),
                "v": jnp.zeros(shape, jnp.int8),
                "v_scale": jnp.zeros(sshape, jnp.float32),
            }
            for _ in range(cfg.num_layers)
        ]
    return [
        {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}
        for _ in range(cfg.num_layers)
    ]


class RMSNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dtype = x.dtype
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        x = x.astype(jnp.float32)
        x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + self.eps)
        return (x * scale.astype(jnp.float32)).astype(dtype)


class QuantDense(nn.Module):
    """Weight-only int8 Dense: per-output-channel symmetric scales.

    TPU-native stand-in for the reference loader's bitsandbytes 4/8-bit
    options (ref llava/model/builder.py:30-49): weights live in HBM as int8
    (half the bf16 footprint — a 7B LLM fits comfortably next to its KV
    cache on one 16G chip), XLA fuses the dequant into the matmul operand
    read. Param names keep the `kernel`/`scale` sharding rules.
    Inference-only: training paths use the bf16 Dense.
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = False  # vision towers (EVA02/CLIP) use biased Dense
    param_dtype: Any = jnp.float32  # bias dtype only; kernel is int8
    bits: int = 8  # 8: per-out-channel scales; 4: packed nibbles + groups

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        if self.bits == 4:
            # nibble-packed int8 storage (two weights per byte; the s4
            # dtype cannot be laid out for Pallas on this runtime) + group
            # scales along K — see ops/int4_matmul.py
            from rlaifv_tpu.ops.int4_matmul import (
                int4_matmul_grad, pick_int4_group,
            )

            K = x.shape[-1]
            G = pick_int4_group(K)
            kernel = self.param(
                "kernel", nn.initializers.zeros_init(),
                (K // 2, self.features), jnp.int8,
            )
            scale = self.param(
                "scale", nn.initializers.ones_init(),
                (K // G, self.features), jnp.float32,
            )
            y = int4_matmul_grad(x, kernel, scale)
        else:
            kernel = self.param(
                "kernel", nn.initializers.zeros_init(),
                (x.shape[-1], self.features), jnp.int8,
            )
            scale = self.param(
                "scale", nn.initializers.ones_init(),
                (self.features,), jnp.float32,
            )
            if jax.default_backend() == "tpu":
                # Pallas kernel: int8 tiles dequantize in VMEM. The jnp
                # fallback below makes XLA materialize the full dequantized
                # weight in HBM on every call — measured 21x slower decode.
                from rlaifv_tpu.ops.quant_matmul import int8_matmul_grad

                # differentiable w.r.t. x (dx kernel keeps q int8, no
                # transpose materialized) — the QLoRA training path needs
                # gradients to flow THROUGH the frozen base into adapters.
                y = int8_matmul_grad(x, kernel, scale)
            else:
                w = kernel.astype(self.dtype) * scale.astype(self.dtype)[None, :]
                y = x @ w
        if self.has_variable("lora", "a"):
            # QLoRA-style: bf16 adapters over the frozen int8 base (the
            # reference's 8-bit-load + peft combination,
            # llava/model/builder.py:30-49 + train_llava15_lora.py).
            a = self.get_variable("lora", "a").astype(self.dtype)
            b = self.get_variable("lora", "b").astype(self.dtype)
            y = y + (x @ a) @ b
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(),
                (self.features,), self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class LoraDense(nn.Module):
    """nn.Dense(use_bias=False) plus an optional low-rank side-term read
    from the 'lora' variable collection: y = x @ kernel + (x @ a) @ b.

    TPU-design for LoRA at 7B-on-one-chip scale: the reference merges peft
    adapters into the base weights; merging functionally inside the train
    step (train/lora.py::lora_merge) materializes a SECOND full param tree
    per step — fine at proxy scale, OOM at 7B on a 16G chip. Reading
    adapters per-layer from a separate collection adds only the rank-r
    matmuls. The alpha/r scale is pre-folded into b by
    train/lora.py::lora_scaled, so this formulation equals the merged one
    (x@(W + a·b·α/r)) up to fp reassociation. Without a 'lora' collection
    this is exactly nn.Dense(use_bias=False) — same params, same HLO.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        y = jax.lax.dot_general(
            x, kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        if self.has_variable("lora", "a"):
            a = self.get_variable("lora", "a").astype(self.dtype)
            b = self.get_variable("lora", "b").astype(self.dtype)
            y = y + jax.lax.dot_general(
                jax.lax.dot_general(
                    x, a, (((x.ndim - 1,), (0,)), ((), ()))
                ),
                b, (((x.ndim - 1,), (0,)), ((), ())),
            )
        return y


def quantize_kernel_int8(w: "np.ndarray"):
    """(in, out) float kernel -> (int8 kernel, f32 per-out-channel scale)."""
    import numpy as _np

    w = _np.asarray(w, _np.float32)
    scale = _np.abs(w).max(axis=0) / 127.0
    scale = _np.maximum(scale, 1e-8)
    q = _np.clip(_np.round(w / scale[None, :]), -127, 127).astype(_np.int8)
    return q, scale.astype(_np.float32)


def _dense(features: int, cfg: LlamaConfig, names: Tuple[str, ...], name: str):
    if getattr(cfg, "quantize", False):
        return QuantDense(features, dtype=cfg.dtype, name=name,
                          bits=getattr(cfg, "quantize_bits", 8))
    return LoraDense(
        features,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_init=nn.initializers.normal(0.02),
        name=name,
    )


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        cos: Array,
        sin: Array,
        attention_mask: Optional[Array],
        cache: Optional[dict] = None,
        cache_index: Optional[Array] = None,
    ):
        cfg = self.cfg
        B, L, _ = x.shape
        H, KVH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_size

        if cfg.fuse_proj:
            # one fused projection instead of three: per-out-channel int8
            # scales concat exactly, so fusing at load (convert.py::
            # fuse_llm_projections) is bit-identical to separate matmuls —
            # and each Mosaic call costs ~100us of launch latency on some
            # runtimes, which dominates weight-bound decode
            qkv = _dense((H + 2 * KVH) * D, cfg, ("embed", "qkv"),
                         "qkv_proj")(x)
            q = qkv[..., : H * D]
            k = qkv[..., H * D : (H + KVH) * D]
            v = qkv[..., (H + KVH) * D :]
        else:
            q = _dense(H * D, cfg, ("embed", "qkv"), "q_proj")(x)
            k = _dense(KVH * D, cfg, ("embed", "qkv"), "k_proj")(x)
            v = _dense(KVH * D, cfg, ("embed", "qkv"), "v_proj")(x)

        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, KVH, D)
        v = v.reshape(B, L, KVH, D)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if cache is not None and "k_scale" in cache:
            # int8 KV cache: write quantized; prefill attends over the
            # FRESH bf16 k/v (cache columns past L are dead, so the math is
            # exactly the fp-cache prefill); decode reads the int8 cache
            # through the dequantizing prefix kernel.
            from rlaifv_tpu.ops.decode_attention import (
                decode_attention_prefix_int8,
                quantize_kv,
            )

            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            upd = lambda c, x, nd: jax.lax.dynamic_update_slice(  # noqa: E731
                c, x, (0, cache_index) + (0,) * nd
            )
            new_cache = {
                "k": upd(cache["k"], kq, 2),
                "k_scale": upd(cache["k_scale"], ks, 1),
                "v": upd(cache["v"], vq, 2),
                "v_scale": upd(cache["v_scale"], vs, 1),
            }
            if L > 1:
                out = multi_head_attention(
                    q, k, v,
                    attention_mask=(attention_mask[:, :L]
                                    if attention_mask is not None else None),
                    causal=True,
                    q_offset=None,
                    impl=cfg.attn_impl,
                )
            else:
                out = decode_attention_prefix_int8(
                    q[:, 0],
                    new_cache["k"], new_cache["k_scale"],
                    new_cache["v"], new_cache["v_scale"],
                    attention_mask, jnp.asarray(cache_index) + 1,
                )[:, None]
            out = out.reshape(B, L, H * D)
            out = _dense(cfg.hidden_size, cfg, ("qkv", "embed"), "o_proj")(out)
            return out, new_cache

        if cache is not None:
            # Static-shape decode cache: (B, max_len, KVH, D)
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            new_cache = {"k": k, "v": v}

        out = multi_head_attention(
            q,
            k,
            v,
            attention_mask=attention_mask,
            causal=True,
            q_offset=cache_index if cache is not None else None,
            impl=cfg.attn_impl,
        )
        out = out.reshape(B, L, H * D)
        out = _dense(cfg.hidden_size, cfg, ("qkv", "embed"), "o_proj")(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        I = cfg.intermediate_size
        if cfg.fuse_proj:
            gu = _dense(2 * I, cfg, ("embed", "ffn"), "gate_up_proj")(x)
            gate, up = gu[..., :I], gu[..., I:]
        else:
            gate = _dense(I, cfg, ("embed", "ffn"), "gate_proj")(x)
            up = _dense(I, cfg, ("embed", "ffn"), "up_proj")(x)
        down = _dense(cfg.hidden_size, cfg, ("ffn", "embed"), "down_proj")(
            nn.silu(gate) * up
        )
        return down


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, attention_mask, cache=None, cache_index=None):
        cfg = self.cfg
        attn_out, new_cache = LlamaAttention(cfg, name="attn")(
            RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_attn")(x),
            cos,
            sin,
            attention_mask,
            cache,
            cache_index,
        )
        x = x + attn_out
        x = x + LlamaMLP(cfg, name="mlp")(
            RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_mlp")(x)
        )
        return x, new_cache


def _embed_lookup(tok_embed: nn.Embed, input_ids: Array, dtype) -> Array:
    """Token embedding lookup, SPMD-friendly under a data-parallel mesh.

    Under a mesh with dp*fsdp > 1, a gather from the (tp, fsdp)-sharded
    table makes GSPMD replicate-then-repartition around it in BOTH
    directions (fwd gather output, bwd scatter-add of the grad) — XLA's
    "involuntary full rematerialization" warning. A one-hot matmul
    (MaxText's iota-embed trick) partitions natively: the vocab contraction
    psums over tp, hidden all-gathers over fsdp, batch axes stay put.
    Exact (one nonzero per row; adding zeros is exact in any float dtype),
    ~V/(6*I*layers) extra FLOPs at training shapes. Decode (L==1) and
    meshless runs keep the cheap gather — a per-step full-table read would
    swamp decode HBM traffic.
    """
    from rlaifv_tpu.parallel.sharding import active_mesh

    mesh = active_mesh()
    data = 1
    if not mesh.empty and "dp" in mesh.shape:
        data = mesh.shape["dp"] * mesh.shape["fsdp"]
    if data > 1 and input_ids.ndim >= 2 and input_ids.shape[-1] > 1:
        table = tok_embed.embedding.astype(dtype)
        hot = jax.nn.one_hot(input_ids, table.shape[0], dtype=dtype)
        return hot @ table
    return tok_embed(input_ids)


class LlamaModel(nn.Module):
    """Decoder stack. Accepts either token ids or pre-built input embeddings
    (the LLaVA meta-arch feeds spliced embeddings, ref llava_arch.py:150)."""

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.tok_embed = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
        )
        block = LlamaBlock
        if cfg.remat:
            # prevent_cse MUST be True with unrolled layers: XLA's CSE
            # otherwise merges each recomputed activation with its forward
            # twin, silently keeping every layer's intermediates alive
            # (measured: 7B QLoRA step wanted 33.5G HBM with False — remat
            # fully defeated; prevent_cse=False is only safe under lax.scan)
            block = nn.remat(
                LlamaBlock,
                static_argnums=(),
                prevent_cse=True,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        self.blocks = [block(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)]
        self.ln_f = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_f")

    def embed(self, input_ids: Array) -> Array:
        return _embed_lookup(self.tok_embed, input_ids, self.cfg.dtype)

    def __call__(
        self,
        input_ids: Optional[Array] = None,
        *,
        inputs_embeds: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
    ):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = _embed_lookup(self.tok_embed, input_ids, cfg.dtype)
        B, L, _ = inputs_embeds.shape

        if position_ids is None:
            base = jnp.arange(L, dtype=jnp.int32)[None, :]
            if cache_index is not None:
                base = base + cache_index
            position_ids = jnp.broadcast_to(base, (B, L))
        cos, sin = rope_cos_sin(position_ids, cfg.head_size, cfg.rope_theta, cfg.dtype)

        x = inputs_embeds
        new_caches = [] if cache is not None else None
        for i, blk in enumerate(self.blocks):
            layer_cache = cache[i] if cache is not None else None
            x, c = blk(x, cos, sin, attention_mask, layer_cache, cache_index)
            if cache is not None:
                new_caches.append(c)
        x = self.ln_f(x)
        return x, new_caches


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig

    def setup(self):
        self.model = LlamaModel(self.cfg, name="model")
        if not self.cfg.tie_word_embeddings:
            if self.cfg.quantize and self.cfg.quantize_lm_head:
                self.lm_head = QuantDense(
                    self.cfg.vocab_size, dtype=self.cfg.dtype, name="lm_head"
                )
            else:
                self.lm_head = nn.Dense(
                    self.cfg.vocab_size,
                    use_bias=False,
                    dtype=self.cfg.dtype,
                    param_dtype=self.cfg.param_dtype,
                    kernel_init=nn.initializers.normal(0.02),
                    name="lm_head",
                )

    def embed(self, input_ids: Array) -> Array:
        return self.model.embed(input_ids)

    def logits(self, hidden: Array) -> Array:
        if self.cfg.tie_word_embeddings:
            emb = self.model.tok_embed.embedding
            return hidden @ emb.T.astype(hidden.dtype)
        return self.lm_head(hidden)

    def __call__(
        self,
        input_ids: Optional[Array] = None,
        *,
        inputs_embeds: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
    ):
        hidden, new_cache = self.model(
            input_ids,
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            cache=cache,
            cache_index=cache_index,
        )
        return self.logits(hidden), new_cache

    def init_cache(self, batch: int, max_len: int) -> list:
        return llama_init_cache(self.cfg, batch, max_len)
