"""No-merge LoRA application (models.llama.LoraDense + 'lora' collection):
must equal the merged formulation kernel' = kernel + a@b·(alpha/r)
(train/lora.py::lora_merge) that the reference's peft merge produces —
without ever materializing a second param tree."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.train.lora import lora_init, lora_merge, lora_scaled
from rlaifv_tpu.train.train_step import LlavaDPOAdapter


def _setup():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P, S = cfg.num_image_tokens, cfg.vision.image_size
    ids = jnp.asarray(
        np.random.default_rng(0).integers(
            5, cfg.llm.vocab_size - 1, size=(2, P + 12)
        ),
        jnp.int32,
    )
    images = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, S, S, 3)), jnp.float32
    )
    starts = jnp.asarray([0, 3])
    params = model.init(
        jax.random.PRNGKey(0), ids, images=images, image_starts=starts
    )["params"]
    # non-zero b so the delta actually bites
    lora = lora_init(jax.random.PRNGKey(1), params, r=4)
    lora = jax.tree.map(
        lambda x: x + 0.02 * np.random.default_rng(2).normal(size=x.shape)
        .astype(np.float32),
        lora,
    )
    return model, params, lora, ids, images, starts


@pytest.mark.slow
def test_collection_matches_merged():
    model, params, lora, ids, images, starts = _setup()
    adapter = LlavaDPOAdapter(model)
    mask = jnp.ones_like(ids)

    feats = adapter.encode_images_fn(params, images)
    merged = lora_merge(params, lora, alpha=16.0)
    want = adapter.forward_with_features(merged, ids, feats, starts, mask)

    got = adapter.forward_with_features(
        {"params": params, "lora": lora_scaled(lora, alpha=16.0)},
        ids, feats, starts, mask,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )
    # and without the collection the model is bit-identical to before
    base = adapter.forward_with_features(params, ids, feats, starts, mask)
    assert float(jnp.abs(base - want).max()) > 1e-4  # adapters do something


@pytest.mark.slow
def test_collection_grads_match_merged():
    model, params, lora, ids, images, starts = _setup()
    adapter = LlavaDPOAdapter(model)
    mask = jnp.ones_like(ids)
    feats = adapter.encode_images_fn(params, images)

    def loss_merged(l):
        m = lora_merge(params, l, alpha=16.0)
        return jnp.sum(
            adapter.forward_with_features(m, ids, feats, starts, mask) ** 2
        )

    def loss_coll(l):
        v = {"params": params, "lora": lora_scaled(l, alpha=16.0)}
        return jnp.sum(
            adapter.forward_with_features(v, ids, feats, starts, mask) ** 2
        )

    gm = jax.grad(loss_merged)(lora)
    gc = jax.grad(loss_coll)(lora)
    for a, b in zip(jax.tree_util.tree_leaves(gm),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def test_quant_dense_reads_lora():
    """QLoRA path: adapters bite on the int8 base too (CPU fallback path)."""
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny(quantize=True)
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    # int8 kernels init to zeros; set scales/kernels to something real
    rng = np.random.default_rng(0)

    def fill(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = fill(v)
            elif v.dtype == jnp.int8:
                out[k] = jnp.asarray(
                    rng.integers(-40, 40, size=v.shape), jnp.int8
                )
            else:
                out[k] = v
        return out

    params = fill(params)
    lora = lora_init(jax.random.PRNGKey(1), params, r=2,
                     target=r"model/.*(q_proj|up_proj)/kernel$")
    assert jax.tree_util.tree_leaves(lora), "no targets matched"
    lora = jax.tree.map(lambda x: x + 0.05, lora)

    base = model.apply({"params": params}, ids)[0]
    with_lora = model.apply(
        {"params": params, "lora": lora_scaled(lora, alpha=16.0)}, ids
    )[0]
    assert float(jnp.abs(base - with_lora).max()) > 1e-4


@pytest.mark.slow
def test_qlora_train_step():
    """Full QLoRA DPO train step: frozen int8 base (+bf16 head), adapters in
    the 'lora' collection, gradients flow through the dx kernel path (CPU
    fallback here; the dx kernel itself is covered in test_quant_matmul)."""
    import optax

    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig as LC
    from rlaifv_tpu.models.llava import LlavaForCausalLM as LM
    from rlaifv_tpu.train.train_step import (
        DPOHparams,
        DPOTrainState,
        make_lora_dpo_train_step,
    )
    from rlaifv_tpu.utils.synth import synth_dpo_batch

    tiny = LC.tiny()
    cfg = LC(
        llm=LlamaConfig.tiny(quantize=True, quantize_lm_head=False),
        vision=tiny.vision,
    )
    model = LM(cfg)
    batch = synth_dpo_batch(cfg, n_pairs=2, max_len=96, answer_len=16)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"][:2],
        images=batch["images"][:2], image_starts=batch["image_starts"][:2],
    )["params"]

    # int8 kernels init to zeros — and an all-zero base routes EVERY adapter
    # gradient through a zero matmul (db = (x@a)^T dy with x or dy = 0), so
    # fill the base with real weights first
    rng = np.random.default_rng(7)

    def fill(p):
        return jax.tree.map(
            lambda v: jnp.asarray(rng.integers(-30, 30, size=v.shape),
                                  jnp.int8)
            if v.dtype == jnp.int8 else v,
            p,
        )

    params = fill(params)
    # shrink scales so int8*30-ish weights don't blow up the tiny model
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: v * 0.01
        if path and getattr(path[-1], "key", "") == "scale" else v,
        params,
    )
    lora = lora_init(jax.random.PRNGKey(1), params, r=4)
    assert jax.tree_util.tree_leaves(lora), "no adapter targets on int8 base"

    from rlaifv_tpu.train.train_step import LlavaDPOAdapter

    opt = optax.adamw(1e-3)
    state = DPOTrainState(jnp.int32(0), lora, opt.init(lora))
    step = make_lora_dpo_train_step(
        LlavaDPOAdapter(model), opt, DPOHparams(beta=0.1), lora_alpha=16.0
    )
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    s1, m1 = step(state, params, batch)
    s2, m2 = step(s1, params, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # adapters moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(s2.params))
    )
    assert moved
    # frozen base untouched
    for a, b in zip(jax.tree_util.tree_leaves(base_before),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
