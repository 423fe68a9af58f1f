"""Static-shape multimodal splice: semantics vs the reference ragged algorithm.

The reference splices image features into the token-embedding stream with
per-sample Python loops (llava/model/llava_arch.py:237-313). We verify our
host-expansion + device-splice pipeline produces the same embedding sequence
order: embed(text_before) ++ image_feats ++ embed(text_after).
"""
import numpy as np
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.multimodal import expand_image_sentinels
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM, splice_image_features


def test_expand_image_sentinels():
    ids = [1, 5, 6, IMAGE_TOKEN_INDEX, 7, 8, 2]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8, 2]
    out = expand_image_sentinels(ids, labels, num_patches=4)
    assert out["image_start"] == 3
    np.testing.assert_array_equal(
        out["input_ids"],
        [1, 5, 6] + [IMAGE_TOKEN_INDEX] * 4 + [7, 8, 2],
    )
    np.testing.assert_array_equal(
        out["labels"], [IGNORE_INDEX] * 3 + [IGNORE_INDEX] * 4 + [7, 8, 2]
    )


def test_expand_no_image():
    out = expand_image_sentinels([1, 2, 3], [1, 2, 3], num_patches=4)
    assert out["image_start"] == -1
    np.testing.assert_array_equal(out["input_ids"], [1, 2, 3])


def test_expand_truncation():
    ids = [1, IMAGE_TOKEN_INDEX, 7, 8]
    out = expand_image_sentinels(ids, None, num_patches=4, max_len=5)
    assert len(out["input_ids"]) == 5
    assert out["image_start"] == 1


def test_splice_matches_reference_order():
    rng = np.random.default_rng(0)
    B, L, P, D = 3, 12, 4, 8
    text = rng.normal(size=(B, L, D)).astype(np.float32)
    feats = rng.normal(size=(B, P, D)).astype(np.float32)
    starts = np.array([2, 0, -1], dtype=np.int32)  # mid, begin, text-only

    got = np.asarray(
        splice_image_features(jnp.asarray(text), jnp.asarray(feats), jnp.asarray(starts))
    )

    want = text.copy()
    for b, s in enumerate(starts):
        if s >= 0:
            want[b, s : s + P] = feats[b]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_splice_gradient_flows_for_text_only():
    # The ghost-residual trick must keep the vision path differentiable even
    # when every sample in the batch is text-only (mirrors llava_arch.py:243).
    B, L, P, D = 2, 6, 3, 4
    text = jnp.ones((B, L, D))
    starts = jnp.full((B,), -1, dtype=jnp.int32)

    def f(feats):
        return splice_image_features(text, feats, starts).sum()

    g = jax.grad(f)(jnp.ones((B, P, D)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_llava_tiny_forward():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens  # 4x4 patches for the tiny tower
    rng = np.random.default_rng(0)

    prompt = [1, 10, 11, IMAGE_TOKEN_INDEX, 12, 13, 2]
    ex = expand_image_sentinels(prompt, None, P)
    L = len(ex["input_ids"])
    ids = np.stack([ex["input_ids"], ex["input_ids"]])
    starts = np.array([ex["image_start"]] * 2)
    imgs = rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
                      ).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(ids),
        images=jnp.asarray(imgs),
        image_starts=jnp.asarray(starts),
    )["params"]
    logits, _ = model.apply(
        {"params": params},
        jnp.asarray(ids),
        images=jnp.asarray(imgs),
        image_starts=jnp.asarray(starts),
    )
    assert logits.shape == (2, L, cfg.llm.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
