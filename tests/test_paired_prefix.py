"""Shared-prefix paired DPO forward (train/paired_forward.py) parity.

Win/rej rows share the prompt prefix; the paired path computes it once per
pair and lets suffix queries attend over the tiled prefix KV with a static
q_offset. These tests pin loss AND parameter-gradient parity against the
plain concatenated forward (the reference semantics,
muffin/train/trainers.py:188-205) for the hparam variants the trainer uses.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.train.train_step import (
    DPOHparams,
    LlavaDPOAdapter,
    dpo_loss_from_batch,
)


def _pair(rng, vocab, img_size):
    q = rng.integers(5, vocab, size=6).tolist()
    image = rng.normal(size=(img_size, img_size, 3)).astype(np.float32)

    def side(ans):
        ids = [1] + q[:3] + [IMAGE_TOKEN_INDEX] + q[3:] + ans + [2]
        labels = [IGNORE_INDEX] * (len(ids) - len(ans) - 1) + ans + [2]
        return {
            "input_ids": np.asarray(ids, np.int64),
            "labels": np.asarray(labels, np.int64),
            "image": image,
            "ref_win_logp": -20.0, "ref_win_avg_logp": -2.0,
            "ref_rej_logp": -25.0, "ref_rej_avg_logp": -2.5,
        }

    win = side(rng.integers(5, vocab, size=5).tolist())
    rej = side(rng.integers(5, vocab, size=7).tolist())
    return rej, win


@pytest.fixture(scope="module")
def setup():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)
    rng = np.random.default_rng(7)
    coll = DPOCollator(
        pad_token_id=0, max_len=48, num_patches=cfg.num_image_tokens, beta=0.1
    )
    batch = coll([_pair(rng, cfg.llm.vocab_size, cfg.vision.image_size)
                  for _ in range(3)])
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        jb["input_ids"][:2],
        images=jb["images"][:2],
        image_starts=jb["image_starts"][:2],
    )["params"]
    # common prefix = [bos, q0..q2, <patches>, q3..q5]; answers follow
    P = 1 + 3 + cfg.num_image_tokens + 3
    B = jb["images"].shape[0]
    np.testing.assert_array_equal(  # fixture sanity: prefix truly shared
        np.asarray(jb["input_ids"][:B, :P]), np.asarray(jb["input_ids"][B:, :P])
    )
    return adapter, jb, params, P


def _loss_and_grads(adapter, params, jb, hp):
    def f(p):
        return dpo_loss_from_batch(adapter, p, jb, hp)[0]

    return jax.value_and_grad(f)(params)


@pytest.mark.slow
@pytest.mark.parametrize("variant", [
    dict(),
    dict(dpo_use_average=True),
    dict(dpo_token_weighted=True),
])
def test_paired_matches_plain(setup, variant):
    adapter, jb, params, P = setup
    if variant.get("dpo_token_weighted"):
        B, L = jb["win_labels"].shape
        jb = dict(jb)
        jb["ref_win_per_token_logp"] = jnp.zeros((B, L - 1), jnp.float32)
        jb["ref_rej_per_token_logp"] = jnp.zeros((B, L - 1), jnp.float32)
    loss_plain, grad_plain = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1, **variant)
    )
    loss_pair, grad_pair = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1, shared_prefix_len=P, **variant)
    )
    np.testing.assert_allclose(float(loss_pair), float(loss_plain), rtol=2e-5)
    flat_plain = jax.tree_util.tree_leaves_with_path(grad_plain)
    flat_pair = jax.tree_util.tree_leaves(grad_pair)
    for (path, gx), gp in zip(flat_plain, flat_pair):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_paired_matches_plain_fused_head(setup):
    adapter, jb, params, P = setup
    loss_plain, grad_plain = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1, lm_head_impl="fused")
    )
    loss_pair, grad_pair = _loss_and_grads(
        adapter, params, jb,
        DPOHparams(beta=0.1, lm_head_impl="fused", shared_prefix_len=P),
    )
    np.testing.assert_allclose(float(loss_pair), float(loss_plain), rtol=2e-5)
    for (path, gx), gp in zip(
        jax.tree_util.tree_leaves_with_path(grad_plain),
        jax.tree_util.tree_leaves(grad_pair),
    ):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_paired_matches_plain_remat(setup):
    """The PAIR-as-remat-cell path (cfg.llm.remat=True) must stay exact."""
    model = LlavaForCausalLM(LlavaConfig.tiny(remat=True))
    adapter = LlavaDPOAdapter(model)
    _, jb, params, P = setup
    loss_plain, _ = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1)
    )
    loss_pair, _ = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1, shared_prefix_len=P)
    )
    np.testing.assert_allclose(float(loss_pair), float(loss_plain), rtol=2e-5)


@pytest.mark.slow
def test_paired_suffix_trim_matches_plain(setup):
    """shared_suffix_len drops the padded tail past the answers — loss and
    grads must still match the full plain forward exactly."""
    adapter, jb, params, P = setup
    labels = np.asarray(jb["labels"])
    last = int(np.max(np.where(labels != IGNORE_INDEX)[1])) + 1
    W = last - P + 3  # a little slack, well short of L-P
    assert W < jb["input_ids"].shape[1] - P
    loss_plain, grad_plain = _loss_and_grads(
        adapter, params, jb, DPOHparams(beta=0.1)
    )
    loss_pair, grad_pair = _loss_and_grads(
        adapter, params, jb,
        DPOHparams(beta=0.1, shared_prefix_len=P, shared_suffix_len=W),
    )
    np.testing.assert_allclose(float(loss_pair), float(loss_plain), rtol=2e-5)
    for (path, gx), gp in zip(
        jax.tree_util.tree_leaves_with_path(grad_plain),
        jax.tree_util.tree_leaves(grad_pair),
    ):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_paired_suffix_trim_token_weighted(setup):
    adapter, jb, params, P = setup
    B, L = jb["win_labels"].shape
    jb = dict(jb)
    jb["ref_win_per_token_logp"] = jnp.zeros((B, L - 1), jnp.float32)
    jb["ref_rej_per_token_logp"] = jnp.zeros((B, L - 1), jnp.float32)
    labels = np.asarray(jb["labels"])
    last = int(np.max(np.where(labels != IGNORE_INDEX)[1])) + 1
    W = last - P + 3
    hp0 = DPOHparams(beta=0.1, dpo_token_weighted=True)
    hp1 = DPOHparams(beta=0.1, dpo_token_weighted=True,
                     shared_prefix_len=P, shared_suffix_len=W)
    l0, _ = dpo_loss_from_batch(adapter, params, jb, hp0)
    l1, _ = dpo_loss_from_batch(adapter, params, jb, hp1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)


def test_paired_rejects_bad_prefix_len(setup):
    adapter, jb, params, _ = setup
    L = jb["input_ids"].shape[1]
    with pytest.raises(ValueError, match="shared_prefix_len"):
        dpo_loss_from_batch(
            adapter, params, jb, DPOHparams(beta=0.1, shared_prefix_len=L)
        )


def test_paired_text_only(setup):
    """images=None exercises the embed-only prefix path."""
    adapter, jb, params, P = setup
    jb = {k: v for k, v in jb.items() if k != "images"}
    hp0 = DPOHparams(beta=0.1)
    hp1 = DPOHparams(beta=0.1, shared_prefix_len=P)
    l0, _ = dpo_loss_from_batch(adapter, params, jb, hp0)
    l1, _ = dpo_loss_from_batch(adapter, params, jb, hp1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)


def test_derive_shared_prefix_len(setup):
    from rlaifv_tpu.train.train_step import (
        derive_shared_prefix_len,
        validate_shared_prefix,
    )

    _, jb, _, P = setup
    batch = {k: np.asarray(v) for k, v in jb.items()}
    got = derive_shared_prefix_len(batch, num_patches=16)
    # image-end rule: starts are the same for every fixture row, so the
    # derived P is image_start + 16, <= the true common prefix
    assert got == int(batch["image_starts"].max()) + 16
    assert 0 < got <= P
    validate_shared_prefix(batch, got, num_patches=16)

    text_only = {k: v for k, v in batch.items() if k != "images"}
    got_t = derive_shared_prefix_len(text_only, num_patches=0)
    assert got_t == P  # min pair-common prefix of this batch
    validate_shared_prefix(text_only, got_t)

    # divergence before the image ends -> no paired speedup expressible
    bad = dict(batch)
    ids = batch["input_ids"].copy()
    B = ids.shape[0] // 2
    ids[0, 1] = ids[B, 1] + 1
    bad["input_ids"] = ids
    assert derive_shared_prefix_len(bad, num_patches=16) == 0


def test_validate_shared_prefix(setup):
    from rlaifv_tpu.train.train_step import validate_shared_prefix

    _, jb, _, P = setup
    batch = {k: np.asarray(v) for k, v in jb.items()}
    validate_shared_prefix(batch, P, num_patches=16)  # clean batch passes

    B = batch["images"].shape[0]
    with pytest.raises(ValueError, match="diverges"):
        validate_shared_prefix(batch, P + 4, num_patches=16)
    bad = dict(batch)
    bad["image_starts"] = batch["image_starts"] + (P - 8)
    with pytest.raises(ValueError, match="image span"):
        validate_shared_prefix(bad, P, num_patches=16)

    labels = batch["labels"]
    last = int(np.max(np.where(labels != IGNORE_INDEX)[1])) + 1
    validate_shared_prefix(batch, P, num_patches=16,
                           suffix_len=last - P)  # covers every label
    with pytest.raises(ValueError, match="drops supervised"):
        validate_shared_prefix(batch, P, num_patches=16,
                               suffix_len=last - P - 2)


def test_paired_hw_flops_accounting():
    # the paired-forward hardware-FLOP count (bench MFU denominator) must be
    # strictly below the plain count and above the head+vision floor
    from rlaifv_tpu.models.llava import LlavaConfig
    from rlaifv_tpu.utils.synth import (
        llava_flops_per_pair,
        llava_flops_per_pair_hw,
    )

    cfg = LlavaConfig.tiny()
    L, C, P, W = 1024, 320, 290, 384
    plain = llava_flops_per_pair_hw(cfg, L, C)
    paired = llava_flops_per_pair_hw(cfg, L, C, P, W)
    assert paired < plain
    # token work ratio bounds the drop: (Pa + 2W) / (2L) with Pa=ceil128(P)
    Pa = -(-P // 128) * 128
    assert paired / plain > (Pa + 2 * W) / (2 * L) * 0.5
    # W=0 means "no trim" (suffix = L - P), still cheaper than plain
    assert llava_flops_per_pair_hw(cfg, L, C, P, 0) < plain
    # and the reference accounting is untouched by paired args
    assert llava_flops_per_pair(cfg, L) > plain
