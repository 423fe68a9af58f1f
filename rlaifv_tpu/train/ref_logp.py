"""Reference-logp precompute: frozen model scores every preference pair once.

Rebuild of the T6 bridge (ref: muffin/eval/muffin_inference_logp.py:315-344
`inference_logp`, :213-280 `get_multimodal_sample_logps`). The reference
runs per-sample win/rej forwards at batch size 1 per GPU; here win‖rej pairs
are batched through one jitted forward (vision encoded once per image) and
results are written in the same chunked-parquet cache contract, making the
cache itself the restart checkpoint (datasets.py:35-52).

Multi-host: rows are sharded contiguously per process (shard_indices) and
gathered with multihost_utils.process_allgather — the XLA-native
`all_gather_object` equivalent.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX
from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.data.datasets import shard_indices, write_logp_parquet
from rlaifv_tpu.data.preprocess import encode_preference_sample, preprocess_v1
from rlaifv_tpu.train.dpo import get_batch_logps


def make_score_fn(model, params, *, shift: bool = True,
                  lm_head_impl: str = "xla", compact_len: int = 0):
    """Jitted (batch) -> (sum, avg, per_token) for the concatenated win‖rej.

    lm_head_impl="fused" routes through the fused Pallas head so the
    (2B, L, V) logits never materialize — at 7B shapes that tensor is the
    scoring pass's peak activation (multi-GB), letting batch_pairs grow.
    lm_head_impl="compact" (requires compact_len > 0) runs the head only on
    the <= compact_len loss positions per row (see get_batch_logps_compact)
    and scatters the per-token logps back to full (2B, L-1) shape, so the
    parquet contract is unchanged; the caller must guarantee compact_len
    bounds the answer lengths (score_preference_rows asserts per batch).
    Keep the SAME impl as training (train_step hp.lm_head_impl): both paths
    are the same math, but matching them keeps the policy≡reference ⇒
    loss=log 2 cancellation exact.
    """

    fused = lm_head_impl == "fused"
    compact = lm_head_impl == "compact"
    if compact and compact_len <= 0:
        raise ValueError("lm_head_impl='compact' requires compact_len > 0")
    use_hidden = fused or compact

    # params must be a jit ARGUMENT: a closed-over 7B tree gets baked into
    # the program as constants (7.6 GB captured at lowering, measured)
    @jax.jit
    def _score(params, batch):
        fwd_feats = (
            model.hidden_with_features if use_hidden
            else model.forward_with_features
        )
        fwd_text = model.hidden_text if use_hidden else model.forward_text
        images = batch.get("images")
        if images is not None:
            feats = model.apply(
                {"params": params}, images, method=model.encode_images
            )
            feats2 = jnp.concatenate([feats, feats], axis=0)
            out = model.apply(
                {"params": params},
                batch["input_ids"],
                feats2,
                batch["image_starts"],
                batch["attention_mask"],
                method=fwd_feats,
            )
        else:
            out = model.apply(
                {"params": params},
                batch["input_ids"],
                batch["attention_mask"],
                method=fwd_text,
            )
        if compact:
            from rlaifv_tpu.train.dpo import get_batch_logps_compact
            from rlaifv_tpu.train.train_step import LlavaDPOAdapter

            labels = batch["labels"]
            w = LlavaDPOAdapter(model).lm_head_kernel(params)
            lp = get_batch_logps_compact(
                out, w, labels, n_pos=compact_len, shift=shift
            )
            # scatter compact per-token logps back to the full (2B, L-1)
            # layout the parquet expects; masked slots add exactly 0
            rows = jnp.arange(labels.shape[0])[:, None]
            per_token = jnp.zeros(
                (labels.shape[0], labels.shape[1] - 1), jnp.float32
            ).at[rows, lp.pos].add(lp.per_token * lp.mask)
            return lp.sum, lp.mean, per_token
        if fused:
            from rlaifv_tpu.train.dpo import get_batch_logps_from_hidden
            from rlaifv_tpu.train.train_step import LlavaDPOAdapter

            w = LlavaDPOAdapter(model).lm_head_kernel(params)
            lp = get_batch_logps_from_hidden(
                out, w, batch["labels"], shift=shift
            )
        else:
            lp = get_batch_logps(out, batch["labels"], shift=shift)
        return lp.sum, lp.mean, lp.per_token

    def score(batch):
        return _score(params, batch)

    return score


def _encode_rows(rows, tokenizer, mm_cfg, preprocess_func=None):
    if preprocess_func is None:
        # llava15 contract: has_image tokenization with the kept <image>
        # tag (ref PreferenceInferenceDataset, muffin_inference_logp.py:159)
        preprocess_func = partial(preprocess_v1, has_image=True)
    encoded = []
    for row in rows:
        # wrap raw parquet columns as conversation turns
        # (ref PreferenceInferenceDataset, muffin_inference_logp.py:136-146)
        src = {
            "question": {"from": "human",
                         "value": f"<image>\n{row['question']}"},
            "chosen": {"from": "gpt", "value": row["chosen"]},
            "rejected": {"from": "gpt", "value": row["rejected"]},
        }
        if "image_bytes" in row or "image" in row:
            src["image"] = row.get("image_bytes", row.get("image"))
        encoded.append(
            encode_preference_sample(
                src, tokenizer, mm_cfg, preprocess_func=preprocess_func,
            )
        )
    return encoded


def _shared_split(ex_w, ex_r, num_patches: int):
    """Split one expanded pair at the longest shared prompt prefix.

    Returns (S, prefix, sfx_w, sfx_r, lab_w, lab_r) or None when the pair
    can't share (no common prefix before the first label, or the image span
    crosses the split)."""
    import numpy as np

    w_ids, w_lab = ex_w["input_ids"], ex_w["labels"]
    r_ids, r_lab = ex_r["input_ids"], ex_r["labels"]
    start = int(ex_w["image_start"])
    if start != int(ex_r["image_start"]):
        return None
    n = min(len(w_ids), len(r_ids))
    neq = np.nonzero(w_ids[:n] != r_ids[:n])[0]
    common = int(neq[0]) if len(neq) else n
    firsts = [
        int(np.nonzero(lab != IGNORE_INDEX)[0][0])
        for lab in (w_lab, r_lab)
        if (lab != IGNORE_INDEX).any()
    ]
    if len(firsts) < 2:
        return None
    S = min(common, *firsts) - 1
    if S < 1 or (start >= 0 and start + num_patches > S):
        return None

    def side(ids, lab):
        # suffix position j predicts token S+j+1 (shift-1 layout)
        sl = np.full(len(ids) - S, IGNORE_INDEX, np.int32)
        sl[: len(lab) - S - 1] = lab[S + 1 :]
        return ids[S:].tolist(), sl.tolist()

    sfx_w, lab_w = side(w_ids, w_lab)
    sfx_r, lab_r = side(r_ids, r_lab)
    return S, w_ids[:S].tolist(), sfx_w, sfx_r, lab_w, lab_r


def _score_rows_shared(rows, model, params, tokenizer, *, max_len,
                       num_patches, batch_pairs, mm_cfg, progress,
                       family=None):
    """Shared-prefix variant of score_preference_rows: the prompt prefix
    (system + image tokens + question) prefills ONCE per pair; only the two
    answer suffixes run the second forward (engine.score_pair_logps). Exact
    same outputs as the plain path (parity test
    tests/test_pipeline.py::test_shared_prefix_ref_logp_parity); pairs that
    cannot share (image span crossing the split, no labels) fall back to
    the plain scorer. Ref being beaten: two full forwards per pair,
    muffin/eval/muffin_inference_logp.py:213-280."""
    import numpy as np

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.train.family import get_family

    spec = get_family(family or "llava15")
    encoded = _encode_rows(rows, tokenizer, mm_cfg, spec.preprocess_func)
    prefixes, sfx_w, sfx_r, lab_w, lab_r = [], [], [], [], []
    images, starts, order, fallback = [], [], [], []
    meta = []  # (S, win_valid, rej_valid)
    for i, (rej, win) in enumerate(encoded):
        ex_w = spec.expand_inst(win, num_patches, max_len, tokenizer)
        ex_r = spec.expand_inst(rej, num_patches, max_len, tokenizer)
        split = _shared_split(ex_w, ex_r, num_patches)
        if split is None or win.get("image") is None:
            fallback.append(i)
            continue
        S, prefix, sw, sr, lw, lr = split
        order.append(i)
        prefixes.append(prefix)
        sfx_w.append(sw)
        sfx_r.append(sr)
        lab_w.append(lw)
        lab_r.append(lr)
        images.append(win["image"])
        starts.append(int(ex_w["image_start"]))
        meta.append((S, len(ex_w["input_ids"]), len(ex_r["input_ids"])))

    out: List[Optional[list]] = [None] * len(rows)
    if order:
        engine = DecodeEngine(
            model, params,
            eos_id=getattr(tokenizer, "eos_token_id", 2) or 2,
            pad_id=tokenizer.pad_token_id or 0,
        )
        it = range(0, len(order), batch_pairs)
        if progress:
            import tqdm

            it = tqdm.tqdm(it, desc="ref-logp(shared)")
        for c0 in it:
            rows_c = slice(c0, c0 + batch_pairs)
            idxs = order[rows_c]
            n = len(idxs)
            sums, means, per_tok = engine.score_pair_logps(
                prefixes[rows_c],
                sfx_w[rows_c] + sfx_r[rows_c],
                lab_w[rows_c] + lab_r[rows_c],
                images=np.stack(images[rows_c]).astype(np.float32),
                image_starts=starts[rows_c],
                pair_batch=batch_pairs,
            )
            for j, i in enumerate(idxs):
                S, w_len, r_len = meta[c0 + j]

                def full(pt, L_valid):
                    arr = np.zeros(L_valid - 1, np.float32)
                    arr[S : L_valid - 1] = pt[: L_valid - 1 - S]
                    return arr.tolist()

                out[i] = [
                    float(sums[j]), float(means[j]),
                    full(per_tok[j], w_len),
                    float(sums[n + j]), float(means[n + j]),
                    full(per_tok[n + j], r_len),
                ]
    if fallback:
        plain = score_preference_rows(
            [rows[i] for i in fallback], model, params, tokenizer,
            max_len=max_len, num_patches=num_patches,
            batch_pairs=batch_pairs, multimodal_cfg=mm_cfg,
            progress=False, shared_prefix=False, family=family,
        )
        for i, res in zip(fallback, plain):
            out[i] = res
    return out


def score_preference_rows(
    rows: Sequence[dict],
    model,
    params,
    tokenizer,
    *,
    max_len: int = 2048,
    num_patches: int = 576,
    batch_pairs: int = 8,
    image_processor: Optional[Callable] = None,
    multimodal_cfg: Optional[dict] = None,
    progress: bool = True,
    lm_head_impl: str = "xla",
    compact_len: int = 0,
    shared_prefix: bool = False,
    family: Optional[str] = None,
) -> List[list]:
    """Returns per-row [win_logp, win_avg, win_per_token, rej_logp,
    rej_avg, rej_per_token] (the reference 'logps' tuple order).

    shared_prefix=True prefills each pair's shared prompt prefix once and
    scores only the win/rej answer suffixes (~1.5-2x on prompt-heavy rows;
    see _score_rows_shared). lm_head_impl is ignored on that path (the
    suffix logits are already compact: answers only).

    family ("llava15" default | "omnilmm") picks the encode convention —
    preprocess_v1 + sentinel expansion vs omni_preprocess + literal
    <im_patch> spans (train/family.py)."""
    from rlaifv_tpu.train.family import get_family

    spec = get_family(family or "llava15")
    image_processor = image_processor or spec.image_processor()
    mm_cfg = multimodal_cfg or spec.mm_cfg(image_processor, num_patches)
    if shared_prefix:
        return _score_rows_shared(
            rows, model, params, tokenizer, max_len=max_len,
            num_patches=num_patches, batch_pairs=batch_pairs,
            mm_cfg=mm_cfg, progress=progress, family=family,
        )
    collator = DPOCollator(
        pad_token_id=tokenizer.pad_token_id,
        max_len=max_len,
        num_patches=num_patches,
        **spec.collator_kwargs(tokenizer),
    )
    score = make_score_fn(model, params, lm_head_impl=lm_head_impl,
                          compact_len=compact_len)

    out: List[list] = []
    it = range(0, len(rows), batch_pairs)
    if progress:
        import tqdm

        it = tqdm.tqdm(it, desc="ref-logp")
    for start in it:
        chunk = rows[start : start + batch_pairs]
        encoded = _encode_rows(chunk, tokenizer, mm_cfg, spec.preprocess_func)
        batch = collator(encoded)
        if lm_head_impl == "compact":
            # a too-small bound would silently zero dropped tokens in the
            # cache — fail loudly on the host before scoring
            n_valid = int((batch["labels"][:, 1:] != IGNORE_INDEX).sum(-1).max())
            if n_valid > compact_len:
                raise ValueError(
                    f"compact_len={compact_len} < {n_valid} loss positions "
                    "in this batch; raise compact_len or use lm_head_impl="
                    "'xla'/'fused'"
                )
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "beta"}
        sums, avgs, per_tok = jax.device_get(score(jb))

        B = len(chunk)
        labels = batch["labels"]
        for i in range(B):
            win_len = int((labels[i] != IGNORE_INDEX).sum())
            rej_len = int((labels[B + i] != IGNORE_INDEX).sum())
            # store per-token logps over the valid prefix (non-pad region)
            win_valid = int(batch["attention_mask"][i].sum()) - 1
            rej_valid = int(batch["attention_mask"][B + i].sum()) - 1
            out.append([
                float(sums[i]),
                float(avgs[i]),
                per_tok[i][:win_valid].tolist(),
                float(sums[B + i]),
                float(avgs[B + i]),
                per_tok[B + i][:rej_valid].tolist(),
            ])
    return out


def inference_logp(
    rows: Sequence[dict],
    model,
    params,
    tokenizer,
    out_dir: str,
    *,
    max_len: int = 2048,
    num_patches: int = 576,
    batch_pairs: int = 8,
    image_processor: Optional[Callable] = None,
    lm_head_impl: str = "xla",
    compact_len: int = 0,
    shared_prefix: bool = True,
    family: Optional[str] = None,
) -> None:
    """Score all rows (sharded across hosts) and write the logp parquet cache.

    shared_prefix=True (default): each pair's prompt prefix prefills once and
    only the two answer suffixes run again — same values (parity-gated), a
    fraction of the FLOPs on the one-time pass over all pairs."""
    world = jax.process_count()
    rank = jax.process_index()
    local = shard_indices(len(rows), world, rank)
    local_rows = [rows[i] for i in local]

    local_logps = score_preference_rows(
        local_rows, model, params, tokenizer,
        max_len=max_len, num_patches=num_patches, batch_pairs=batch_pairs,
        image_processor=image_processor, lm_head_impl=lm_head_impl,
        compact_len=compact_len, shared_prefix=shared_prefix, family=family,
    )

    if world > 1:
        # ragged per-token lists need the pickle-gather, not the array
        # allgather (core/distributed.py::all_gather_objects)
        from rlaifv_tpu.core.distributed import all_gather_objects

        gathered = all_gather_objects(local_logps)
        all_logps = [x for shard in gathered for x in shard]
    else:
        all_logps = local_logps

    if rank == 0:
        write_logp_parquet(rows, out_dir, all_logps)
