"""Trace the DPO train step at bench geometry and print an op-time rollup.

Captures a jax.profiler device trace of K compact-head steps (the bench.py
configuration) and converts the xplane with xprof into per-HLO stats,
printed as a category rollup + top ops by self time. This is the tracing
capability the reference lacks entirely (SURVEY.md §5).

Usage: python scripts/profile_dpo_step.py [logdir] [impl]
  impl: compact (default) | xla | fused
"""
import json
import os
import sys
import tempfile
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_step(impl: str):
    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.train_step import (
        DPOHparams, DPOTrainState, LlavaDPOAdapter,
        make_dpo_train_step, make_optimizer,
    )
    from rlaifv_tpu.utils.synth import synth_dpo_batch

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = LlavaConfig(
        llm=LlamaConfig(
            vocab_size=32000, hidden_size=1536, intermediate_size=4096,
            num_layers=12, num_heads=12, num_kv_heads=12,
            max_position_embeddings=2048, remat=False,
            dtype=dtype, param_dtype=dtype,
        ),
        vision=CLIPVisionConfig(
            image_size=224, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=24, num_heads=16,
            dtype=dtype, param_dtype=dtype,
        ),
    )
    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)
    n_pairs = 8 if on_tpu else 1
    batch = synth_dpo_batch(cfg, n_pairs=n_pairs, max_len=1024, answer_len=256)
    n_valid = int((np.asarray(batch["labels"])[:, 1:] != -100).sum(-1).max())
    compact_len = int(np.ceil(n_valid / 64) * 64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"][:2],
        images=batch["images"][:2],
        image_starts=batch["image_starts"][:2],
    )["params"]
    hp = DPOHparams(beta=0.1, lm_head_impl=impl,
                    compact_len=compact_len if impl == "compact" else 0)
    opt = make_optimizer(5e-7, total_steps=100)
    state = DPOTrainState(jnp.int32(0), params, opt.init(params))
    step_fn = make_dpo_train_step(adapter, opt, hp)

    @partial(jax.jit, donate_argnums=0)
    def run(state, batch):
        def body(st, _):
            st, m = step_fn(st, batch)
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, None, length=3)
        return st, losses[-1]

    return run, state, batch


def rollup(logdir: str):
    """Find the xplane under logdir and print hlo-stats rollups."""
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = []
    for root, _, files in os.walk(logdir):
        xplanes += [os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb")]
    assert xplanes, f"no xplane.pb under {logdir}"
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    parsed = json.loads(data) if data.lstrip().startswith(("[", "{")) else None
    if isinstance(parsed, list):
        return parsed
    if isinstance(parsed, dict) and "rows" in parsed:
        # gviz DataTable: {cols: [{label}...], rows: [{c: [{v}...]}...]}
        labels = [c.get("label") or c.get("id") for c in parsed["cols"]]
        return [
            {lab: (cell or {}).get("v") for lab, cell in zip(labels, r["c"])}
            for r in parsed["rows"]
        ]
    # gviz csv fallback
    import csv
    import io
    return list(csv.DictReader(io.StringIO(data)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    logdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dpo_trace_")
    impl = sys.argv[2] if len(sys.argv) > 2 else "compact"

    run, state, batch = build_step(impl)
    state, l = run(state, batch)
    float(l)  # compile + warm (host fetch = real sync on the tunnel)

    jax.profiler.start_trace(logdir)
    state, l = run(state, batch)
    float(l)
    jax.profiler.stop_trace()

    rows = rollup(logdir)
    key_time = next((k for k in rows[0] if "self" in k.lower()
                     and "time" in k.lower() and "%" not in k), None)
    key_cat = next((k for k in rows[0] if "category" in k.lower()), None)
    key_name = next((k for k in rows[0] if "name" in k.lower()), None)
    cats = {}
    for r in rows:
        t = float(r.get(key_time, 0) or 0)
        cats[r.get(key_cat, "?")] = cats.get(r.get(key_cat, "?"), 0.0) + t
    total = sum(cats.values())
    print(f"\n== category rollup ({impl}, total self-time {total/1e6:.2f} ms"
          " over 3 steps) ==")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {c:40s} {t/1e6:8.2f} ms  {100*t/total:5.1f}%")
    print("\n== top ops ==")
    for r in sorted(rows, key=lambda r: -float(r.get(key_time, 0) or 0))[:15]:
        t = float(r.get(key_time, 0) or 0)
        print(f"  {t/1e6:8.2f} ms  {r.get(key_cat,'?'):28s} "
              f"{str(r.get(key_name,'?'))[:70]}")
    print("\ntrace dir:", logdir)


if __name__ == "__main__":
    main()
