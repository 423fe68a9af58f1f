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
from rlaifv_tpu.data.image_processing import ClipImageProcessor
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

    @jax.jit
    def score(batch):
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

    return score


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
) -> List[list]:
    """Returns per-row [win_logp, win_avg, win_per_token, rej_logp,
    rej_avg, rej_per_token] (the reference 'logps' tuple order)."""
    image_processor = image_processor or ClipImageProcessor()
    mm_cfg = multimodal_cfg or {
        "is_multimodal": True,
        "image_processor": image_processor,
        "image_token_len": num_patches,
        "use_im_start_end": False,
        "keep_image_tag": True,
    }
    collator = DPOCollator(
        pad_token_id=tokenizer.pad_token_id,
        max_len=max_len,
        num_patches=num_patches,
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
        encoded = []
        for row in chunk:
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
            # llava15 contract: has_image tokenization with the kept <image>
            # tag (ref PreferenceInferenceDataset, muffin_inference_logp.py:159)
            encoded.append(
                encode_preference_sample(
                    src, tokenizer, mm_cfg,
                    preprocess_func=partial(preprocess_v1, has_image=True),
                )
            )
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
) -> None:
    """Score all rows (sharded across hosts) and write the logp parquet cache."""
    world = jax.process_count()
    rank = jax.process_index()
    local = shard_indices(len(rows), world, rank)
    local_rows = [rows[i] for i in local]

    local_logps = score_preference_rows(
        local_rows, model, params, tokenizer,
        max_len=max_len, num_patches=num_patches, batch_pairs=batch_pairs,
        image_processor=image_processor, lm_head_impl=lm_head_impl,
        compact_len=compact_len,
    )

    if world > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(local_logps)
        all_logps = [x for shard in gathered for x in shard]
    else:
        all_logps = local_logps

    if rank == 0:
        write_logp_parquet(rows, out_dir, all_logps)
