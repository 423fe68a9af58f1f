"""Logit parity: our flax LLaMA vs HF torch LlamaForCausalLM (tiny, random).

This is the stage-2 gate from SURVEY.md §7: converted weights must reproduce
HF logits on CPU to float tolerance.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from rlaifv_tpu.models.convert import convert_llama
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM


def _make_hf_llama(vocab=97, hidden=32, inter=64, layers=2, heads=4, kv_heads=2,
                   theta=10000.0):
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    cfg = HFConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=64,
        rope_theta=theta,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return HFLlama(cfg).eval()


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_llama_logits_parity(kv_heads):
    hf = _make_hf_llama(kv_heads=kv_heads)
    params = convert_llama(hf.state_dict())

    cfg = LlamaConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=kv_heads, max_position_embeddings=64,
        attn_impl="dense",
    )
    model = LlamaForCausalLM(cfg)

    rng = np.random.default_rng(0)
    B, L = 2, 11
    ids = rng.integers(0, 97, size=(B, L))
    mask = np.ones((B, L), dtype=np.int32)
    mask[1, 8:] = 0  # right padding

    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    ours, _ = model.apply(
        {"params": params},
        jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    ours = np.asarray(ours)

    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid], atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_decode_cache_matches_full_forward():
    cfg = LlamaConfig.tiny(attn_impl="dense")
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(1)
    B, L = 2, 10
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, L)))

    import jax

    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    full_logits, _ = model.apply({"params": params}, ids)

    # prefill first 6 tokens, then decode 4 steps
    max_len = 16
    cache = model.init_cache(B, max_len)
    cache_mask = np.zeros((B, max_len), dtype=np.int32)

    prefill_len = 6
    cache_mask[:, :prefill_len] = 1
    logits, cache = model.apply(
        {"params": params},
        ids[:, :prefill_len],
        cache=cache,
        cache_index=jnp.int32(0),
        attention_mask=jnp.asarray(cache_mask),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :prefill_len]), atol=1e-4
    )

    for t in range(prefill_len, L):
        cache_mask[:, t] = 1
        step_logits, cache = model.apply(
            {"params": params},
            ids[:, t : t + 1],
            cache=cache,
            cache_index=jnp.int32(t),
            attention_mask=jnp.asarray(cache_mask),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), atol=1e-4
        )
