"""Shared-prefix ref-logp precompute speedup at 7B geometry, one v5e chip.

The reference scores every preference pair with TWO full prompt+answer
forwards at bs=1 (muffin/eval/muffin_inference_logp.py:213-280). Our plain
path already batches pairs; the shared-prefix path additionally prefills
each pair's prompt prefix ONCE and runs only the two answer suffixes
(engine.score_pair_logps — exact, parity-gated in tests/test_pipeline.py
and tests/test_omni_train.py). This bench measures plain vs shared on the
same rows at LLaVA-7B int8 geometry (576-token image span + ~130-token
question, ~220-token answers, max_len 1024) and asserts the shared pass
really took the engine fast path (no silent fallback — the round-3 parity
test was vacuous exactly that way).

The one-time pass over the 83k-pair RLAIF-V dataset is a real cost of the
iterative protocol; this is the number that divides it.

Prints ONE JSON line. Weights random; timing only. BENCH7B_TINY=1 (or a
non-TPU platform) smoke-runs the same code path at tiny geometry.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.ref_logp import score_preference_rows
    from tests.fake_tokenizer import FakeTokenizer

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tiny = os.environ.get("BENCH7B_TINY", "") == "1" or not on_tpu

    if tiny:
        cfg = LlavaConfig.tiny()
        n_small, n_big, batch_pairs, max_len = 2, 4, 2, 320
        q_chars, a_chars = 24, 20
    else:
        cfg = LlavaConfig(
            llm=LlamaConfig.vicuna_7b(
                quantize=True, quantize_lm_head=False,
                dtype=dtype, param_dtype=dtype,
            ),
            vision=CLIPVisionConfig(
                image_size=336, patch_size=14, hidden_size=1024,
                intermediate_size=4096, num_layers=24, num_heads=16,
                dtype=dtype, param_dtype=dtype,
            ),
        )
        n_small = int(os.environ.get("BENCH7B_ROWS", 16))
        n_big = 3 * n_small
        batch_pairs = int(os.environ.get("BENCH7B_PAIRS", 8))
        max_len = 1024
        q_chars, a_chars = 130, 220

    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)

    init = jax.jit(model.init)
    params = init(
        jax.random.PRNGKey(0), jnp.ones((2, P + 8), jnp.int32),
        images=jnp.zeros((2, S, S, 3), dtype),
        image_starts=jnp.asarray([1, 1]),
    )["params"]

    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))

    def text(n):
        return "".join(rng.choice(letters, size=n))

    rows = []
    for i in range(n_big):
        rows.append({
            "idx": str(i),
            "question": text(q_chars),
            "chosen": text(a_chars),
            "rejected": text(a_chars + int(rng.integers(-8, 8))),
            # uint8 array: ClipImageProcessor resizes + normalizes on host
            "image": rng.integers(0, 255, size=(S, S, 3)).astype(np.uint8),
        })

    from rlaifv_tpu.data.image_processing import ClipImageProcessor

    tok = FakeTokenizer()
    kw = dict(max_len=max_len, num_patches=P, batch_pairs=batch_pairs,
              progress=False, lm_head_impl="compact", compact_len=256,
              image_processor=ClipImageProcessor(image_size=S))

    # spy: the shared pass must actually take the engine fast path
    shared_rows = [0]
    orig = DecodeEngine.score_pair_logps

    def spy(self, prefixes, *a, **k):
        shared_rows[0] += len(prefixes)
        return orig(self, prefixes, *a, **k)

    DecodeEngine.score_pair_logps = spy

    def timed(shared):
        """Steady-state pairs/s via CALL-LEVEL differencing.

        Each score_preference_rows call rebuilds its jitted closures, so a
        single-call timing is dominated by re-tracing/lowering (~15 s at
        7B) that the REAL job — one call over the whole 83k-row dataset —
        pays exactly once. t(3N rows) - t(N rows) cancels the per-call
        fixed cost (same programs, XLA disk-cache hot after the warm call)
        and leaves 2N pairs of pure chunk throughput, host encode and
        image upload included.
        """
        k = dict(kw, shared_prefix=shared)
        score_preference_rows(rows[:n_small], model, params, tok, **k)
        t0 = time.perf_counter()
        out_small = score_preference_rows(rows[:n_small], model, params,
                                          tok, **k)
        t_sm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = score_preference_rows(rows, model, params, tok, **k)
        t_bg = time.perf_counter() - t0
        del out_small
        return (n_big - n_small) / max(t_bg - t_sm, 1e-9), out

    pairs_s_plain, out_plain = timed(False)
    shared_rows[0] = 0
    pairs_s_shared, out_shared = timed(True)  # warm + small + big passes
    want_rows = 2 * n_small + n_big
    assert shared_rows[0] == want_rows, (
        f"shared path scored {shared_rows[0]}/{want_rows} rows — the rest "
        "silently fell back to the plain scorer"
    )
    # exactness on the bench rows too (sums within bf16 accumulation noise)
    for a, b in zip(out_plain, out_shared):
        np.testing.assert_allclose(a[0], b[0], rtol=2e-3, atol=2e-1)
        np.testing.assert_allclose(a[3], b[3], rtol=2e-3, atol=2e-1)
    print(json.dumps({
        "metric": "ref_logp_shared_pairs_per_sec_per_chip",
        "value": round(pairs_s_shared, 2),
        "unit": "pairs/s",
        "vs_baseline": None,
        "detail": {
            "model": ("llava15-7b-geometry int8 (bf16 head)"
                      if not tiny else "tiny-smoke"),
            "rows": f"{n_big}-{n_small} call-differenced",
            "batch_pairs": batch_pairs,
            "max_len": max_len,
            "pairs_per_sec_plain": round(pairs_s_plain, 2),
            "speedup_shared_vs_plain": round(
                pairs_s_shared / pairs_s_plain, 2),
            "hours_for_83k_pairs_plain": round(83000 / pairs_s_plain / 3600,
                                               2),
            "hours_for_83k_pairs_shared": round(
                83000 / pairs_s_shared / 3600, 2),
            "note": "ref being beaten runs 2 bs-1 full forwards per pair "
                    "(muffin_inference_logp.py:213-280); plain here is "
                    "already batched — shared additionally prefills each "
                    "prompt once and scores only the answer suffixes",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
