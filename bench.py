"""Benchmark: DPO throughput on one chip — REAL 7B geometry + 470M proxy.

Prints at least ONE JSON line of the form:
  {"metric": "dpo_pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R, "real_geometry": {...}, ...}

Output discipline (survives driver timeouts and tunnel deaths — round 4
lost all its perf evidence to rc=124/empty-tail): the last committed
result (BENCH_LAST.json) is printed FIRST with "stale": true, a watchdog
thread force-emits the best-known line and exits before BENCH_DEADLINE_S
(default 2700s), and a tunnel-health probe fails the real-geometry
section over to stale fallbacks instead of letting one hung sub-bench
burn the budget. The LAST JSON line in the output is always the most
informative one.

The headline `value` tracks the 470M proxy (comparable across every round);
`real_geometry` carries the numbers that matter — LLaVA-1.5-**7B** QLoRA DPO
pairs/s/chip (the largest config that fits one v5e chip,
scripts/bench_7b_lora.py) and shared-prefix autocheck facts/s
(scripts/bench_autocheck_shared.py) — measured IN-RUN as subprocesses (one
process owns the TPU at a time, so they run before the proxy claims the
chip). Each sub-bench gets a slice of BENCH_RG_BUDGET_S (default 3000 s,
persistent compile cache at /root/.jax_cache keeps warm runs ~1-3 min); on
budget-trip or failure the last committed numbers from
BENCH_REAL_GEOMETRY.json are emitted with "stale": true rather than nothing.
BENCH_REAL_GEOMETRY=0 skips the section.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md — `published = {}`), so the baseline is an analytic estimate of
the reference stack's A100 throughput on the SAME model config: A100 peak
312 bf16 TFLOP/s at 45% MFU (a generous DeepSpeed ZeRO-2 + flash-attn
figure), i.e. vs_baseline = ours_pairs_per_sec / (0.45*312e12/flops_per_pair).
The reference recipe being replaced is an 8xA100 DeepSpeed node
(script/train/llava15_train.sh:6-48) and per-fact full-prefill autocheck
(script/data_gen/omnilmm/omnilmm_autocheck.sh:26-38).

BENCH7B_SHARDED=1 instead runs the multi-chip readiness bench: AOT-compile
the full 7B full-FT DPO step over the dp2xfsdp2xtp2 virtual mesh + execute
a reduced-depth step (scripts/bench_7b_sharded.py — VERDICT r1 next #3).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from functools import partial

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_STALE_FILE = os.path.join(_HERE, "BENCH_REAL_GEOMETRY.json")
_LAST_FILE = os.path.join(_HERE, "BENCH_LAST.json")

# Output discipline (round 4 lost ALL its perf evidence to a hang + driver
# timeout: rc=124, empty tail): the last committed full result is printed
# FIRST (flagged stale), so the driver's tail is parseable no matter where
# a tunnel death or compile hang strikes; a fresh line follows on success.
# A watchdog thread force-emits the best-known result and exits before the
# driver's timeout can void the run (os._exit fires even if the main
# thread is stuck inside a blocked XLA/runtime call).
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2700"))
_partials: dict = {}  # real-geometry results completed so far


def _best_known_line(reason: str) -> dict:
    out = {"metric": "dpo_pairs_per_sec_per_chip", "value": None,
           "unit": "pairs/s", "vs_baseline": None}
    try:
        with open(_LAST_FILE) as f:
            out = json.load(f)
    except Exception:
        pass
    out["stale"] = True
    out["stale_reason"] = reason
    # overlay the freshest real-geometry measurements: the committed book
    # (timestamped entries from refresh_real_geometry.py) beats whatever
    # BENCH_LAST carried, and this run's own completed sub-benches beat both
    rg = out.get("real_geometry")
    rg = dict(rg) if isinstance(rg, dict) else {}
    try:
        with open(_STALE_FILE) as f:
            book = json.load(f)
        rg.update({k: v for k, v in book.items()
                   if isinstance(v, dict) and v.get("measured_at")})
    except Exception:
        pass
    rg.update(_partials)
    if rg:
        out["real_geometry"] = rg
    return out


def _emit_stale_first():
    print(json.dumps(_best_known_line(
        "pre-run fallback emitted before measurement; a fresh line follows "
        "if the run completes")), flush=True)


def _start_watchdog():
    def fire():
        print(json.dumps(_best_known_line(
            f"watchdog: wall clock hit {_DEADLINE_S:.0f}s before the run "
            "completed (hang or slow compile); partial fresh sub-benches "
            "included")), flush=True)
        os._exit(0)

    t = threading.Timer(_DEADLINE_S, fire)
    t.daemon = True
    t.start()
    return t

# (name, script, extra env) — each prints ONE JSON line on stdout.
# Ordered so a budget trip degrades gracefully: the headline 7B training
# numbers and the autocheck metric come first, the slow-compiling 12B run
# last (its stale fallback is the previous committed measurement).
_RG_SUBBENCHES = [
    ("qlora7b_dpo", "bench_7b_lora.py", {}),
    # shared-prefix paired forward + suffix trim (train/paired_forward.py):
    # the pair's prompt runs once and the dead padded tail is dropped —
    # same loss/grads (tests/test_paired_prefix.py), ~3x the pairs/s
    ("qlora7b_dpo_paired", "bench_7b_lora.py",
     {"BENCH7B_PREFIX": "auto", "BENCH7B_PAIRS": "8"}),
    ("autocheck_shared_llava", "bench_autocheck_shared.py",
     {"BENCH_MODEL": "llava"}),
    # shared-prefix ref-logp precompute vs the plain batched scorer
    # (engine.score_pair_logps; the one-time pass over 83k pairs)
    ("ref_logp_shared", "bench_7b_ref_logp.py", {}),
    # OmniLMM-12B QLoRA DPO (BASELINE config 4) on one 16G chip
    ("qlora12b_omni_dpo", "bench_12b_omni_lora.py", {}),
    # decode floor ladder: the multi-layer fused kernel at 7B geometry,
    # int8 weights vs nibble-packed int4 (weight traffic = the decode bound;
    # int4 halves it — ops/int4_matmul.py). Tail position: if the budget
    # trips, the headline metrics above are already fresh.
    ("fused_decode_int8", "bench_fused_decode.py", {}),
    ("fused_decode_int4", "bench_fused_decode.py", {"BENCHFD_BITS": "4"}),
    # single-stream exact-greedy speculation (genai/lookup_decode.py):
    # plain-vs-window step cost at llama3-8B serving geometry
    ("lookup_decode", "bench_lookup_decode.py", {}),
]


def _run_sub(script: str, extra_env: dict, timeout_s: float) -> dict:
    env = dict(os.environ, **extra_env)
    p = subprocess.run(
        [sys.executable, os.path.join(_HERE, "scripts", script)],
        capture_output=True, text=True, timeout=timeout_s, env=env,
    )
    if p.returncode != 0:
        raise RuntimeError(
            f"{script} rc={p.returncode}: {p.stderr.strip()[-400:]}"
        )
    return json.loads(p.stdout.strip().splitlines()[-1])


def _probe_platform(timeout_s: float = 120) -> str:
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return p.stdout.strip().splitlines()[-1] if p.returncode == 0 else "?"
    except Exception:
        return "?"


_HEALTH_CACHE = {}


def _probe_tunnel_health(timeout_s: float = 120) -> bool:
    """One tiny jit with an int32 operand + f32 scalar fetch, in a
    subprocess. The round-5 axon failure mode hangs exactly this (integer
    operands/outputs stall while f32-only programs run) — failing fast
    here saves the whole budget from being burned by the first sub-bench."""
    if "ok" in _HEALTH_CACHE:
        return _HEALTH_CACHE["ok"]
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "a = jnp.asarray(np.arange(256, dtype=np.int32));"
             "print(float(jax.jit(lambda x: x.astype(jnp.float32).sum())(a)))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        ok = p.returncode == 0
    except Exception:
        ok = False
    _HEALTH_CACHE["ok"] = ok  # one verdict per bench run (sick stays sick)
    return ok


def real_geometry_section() -> dict:
    """Driver-witnessed 7B-geometry numbers (VERDICT r2 next #1)."""
    platform = _probe_platform()
    if platform == "?":  # one retry: a single flaky probe subprocess must
        platform = _probe_platform()  # not discard the whole section
    if platform != "tpu":
        # the 7B sub-benches are interpret-mode-slow off-TPU; the stale
        # numbers are TPU-measured, so emitting them here would mislabel
        return {"skipped": f"non-tpu platform ({platform})"}
    stale_all = {}
    if os.path.exists(_STALE_FILE):
        try:
            with open(_STALE_FILE) as f:
                stale_all = json.load(f)
        except Exception:
            stale_all = {}

    def stale_for(name, reason):
        stale = dict(stale_all.get(name) or {})
        stale["stale"] = True
        stale["stale_reason"] = reason[:200]
        return stale

    if not _probe_tunnel_health():
        return {
            name: stale_for(name, "tunnel unhealthy: int32-operand jit "
                            "hangs (axon degraded state)")
            for name, _, _ in _RG_SUBBENCHES
        }
    out = {}
    budget = float(os.environ.get("BENCH_RG_BUDGET_S", "1800"))
    per_bench = float(os.environ.get("BENCH_RG_PER_BENCH_S", "600"))
    t0 = time.perf_counter()
    sick = False
    for name, script, extra in _RG_SUBBENCHES:
        remaining = budget - (time.perf_counter() - t0)
        try:
            if remaining < 30:
                raise TimeoutError(f"budget exhausted ({budget:.0f}s)")
            _HEALTH_CACHE.pop("ok", None)  # re-probe between entries
            if sick or not _probe_tunnel_health(90):
                # re-probe between entries: the tunnel sickens mid-run on
                # this runtime; stale-fall the rest instead of burning
                # per_bench on each
                sick = True
                raise RuntimeError("tunnel went unhealthy mid-section")
            res = _run_sub(script, extra, min(remaining, per_bench))
            res["stale"] = False
            out[name] = res
            _partials[name] = res  # watchdog emits these on a late hang
        except Exception as e:  # budget / OOM / crash -> last committed
            out[name] = stale_for(name, f"{type(e).__name__}: {e}")
    return out


def main():
    if os.environ.get("BENCH7B_SHARDED", "") == "1":
        sys.path.insert(0, os.path.join(_HERE, "scripts"))
        from bench_7b_sharded import main as sharded_main

        sharded_main()
        return

    _emit_stale_first()
    _start_watchdog()

    # real-geometry sub-benches run FIRST: they need the whole chip, and the
    # proxy bench below initializes jax in this process (device lock)
    real_geometry = None
    if os.environ.get("BENCH_REAL_GEOMETRY", "1") == "1":
        real_geometry = real_geometry_section()

    platform = _probe_platform()
    if platform == "?" or (platform == "tpu"
                           and not _probe_tunnel_health()):
        # sick tunnel (round-5 axon state: integer-dtype programs hang,
        # or device init itself stalls): the proxy bench would stall
        # until the watchdog — emit the best-known line now and exit
        # clean instead
        out = _best_known_line(
            f"tunnel unhealthy (platform probe={platform!r}); proxy "
            "bench skipped — all values are last-committed measurements")
        if real_geometry is not None:
            out["real_geometry"] = real_geometry
        print(json.dumps(out), flush=True)
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.train_step import (
        DPOHparams,
        DPOTrainState,
        LlavaDPOAdapter,
        make_dpo_train_step,
        make_optimizer,
    )
    from rlaifv_tpu.utils.synth import (
        llava_flops_per_pair,
        llava_flops_per_pair_hw,
        synth_dpo_batch,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    # ~470M-param LLaMA + CLIP-L-like tower at 224px: fits v5e (16G) with
    # bf16 params/grads + fp32 adam state and seq 1024.
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = LlavaConfig(
        llm=LlamaConfig(
            vocab_size=32000,
            hidden_size=1536,
            intermediate_size=4096,
            num_layers=12,
            num_heads=12,
            num_kv_heads=12,
            max_position_embeddings=2048,
            # no remat: the 470M proxy's activations fit HBM, and full
            # rematerialization costs ~1/3 extra FLOPs per step
            remat=False,
            dtype=dtype,
            param_dtype=dtype,
        ),
        vision=CLIPVisionConfig(
            image_size=224,
            patch_size=14,
            hidden_size=1024,
            intermediate_size=4096,
            num_layers=24,
            num_heads=16,
            dtype=dtype,
            param_dtype=dtype,
        ),
    )
    seq_len = 1024
    n_pairs = int(os.environ.get("BENCH_PAIRS", 8)) if on_tpu else 1

    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)
    batch = synth_dpo_batch(cfg, n_pairs=n_pairs, max_len=seq_len, answer_len=256)
    # compact head: the LM head runs only on the label positions that carry
    # loss (answers + eos) — identical math (tests/test_compact_head.py),
    # measured 1.15x the full-head step at this geometry (PARITY.md). The
    # static bound comes from the actual batch, rounded up to a lane multiple.
    n_valid = int((np.asarray(batch["labels"])[:, 1:] != -100).sum(-1).max())
    compact_len = int(np.ceil(n_valid / 64) * 64)

    # shared-prefix paired forward (train/paired_forward.py): win/rej share
    # the question+image prompt, so the pair's prefix runs ONCE and the dead
    # padded tail past the answers is trimmed — identical loss/grads
    # (tests/test_paired_prefix.py), ~half the executed token work. Same
    # derivation as the trainer's shared_prefix_len=-1 / bench_7b_lora
    # BENCH7B_PREFIX=auto. BENCH_PREFIX=0 restores the plain path.
    prefix_env = os.environ.get("BENCH_PREFIX", "auto")
    shared_prefix = shared_suffix = 0
    if prefix_env == "auto":
        ids = np.asarray(batch["input_ids"])
        eq = ids[:n_pairs] == ids[n_pairs:]
        full = eq.all(axis=1)
        firsts = np.where(full, ids.shape[1], np.argmin(eq, axis=1))
        shared_prefix = int(firsts.min())
        labels_np = np.asarray(batch["labels"])
        last = int(np.max(np.where(labels_np != -100)[1])) + 1
        shared_suffix = min(
            -(-max(last - shared_prefix, 1) // 128) * 128,
            seq_len - shared_prefix,
        )
    elif int(prefix_env) > 0:
        shared_prefix = int(prefix_env)
    if shared_prefix > 0:
        from rlaifv_tpu.train.train_step import validate_shared_prefix

        validate_shared_prefix(batch, shared_prefix, cfg.num_image_tokens,
                               suffix_len=shared_suffix)

    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # batch-of-1 init: images are per-pair while ids/starts are per-row
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1],
        images=batch["images"][:1],
        image_starts=batch["image_starts"][:1],
    )["params"]

    hp = DPOHparams(beta=0.1, lm_head_impl="compact", compact_len=compact_len,
                    shared_prefix_len=shared_prefix,
                    shared_suffix_len=shared_suffix)
    opt = make_optimizer(5e-7, total_steps=100)
    state = DPOTrainState(jnp.int32(0), params, opt.init(params))
    step_fn = make_dpo_train_step(adapter, opt, hp)

    # The axon remote-execution tunnel returns from block_until_ready before
    # the device finishes; only a host fetch truly synchronizes. Run K steps
    # inside one jitted scan, fetch a scalar, and difference two K values to
    # cancel the RPC + dispatch overhead.
    def make_runner(k):
        @partial(jax.jit, donate_argnums=0)
        def run(state, batch):
            def body(st, _):
                st, m = step_fn(st, batch)
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, None, length=k)
            return st, losses[-1]

        return run

    k_small, k_big = (1, 5) if on_tpu else (1, 3)
    run_small, run_big = make_runner(k_small), make_runner(k_big)

    def timed(run):
        nonlocal state
        t0 = time.perf_counter()
        state, l = run(state, batch)
        float(l)  # host fetch = real sync
        return time.perf_counter() - t0

    # compile + warm both programs (state is donated through)
    timed(run_small)
    timed(run_big)

    t_small = min(timed(run_small) for _ in range(3))
    t_big = min(timed(run_big) for _ in range(3))
    dt = (t_big - t_small) / (k_big - k_small)

    pairs_per_sec = n_pairs / dt
    fpp = llava_flops_per_pair(cfg, seq_len)
    fpp_hw = llava_flops_per_pair_hw(cfg, seq_len, compact_len,
                                     shared_prefix, shared_suffix)
    peak = 197e12 if on_tpu else 1e12  # v5e bf16 peak
    # effective MFU in reference-FLOPs (counts head work the compact head
    # skips) vs hardware MFU (FLOPs actually executed) — report both
    mfu_ref = pairs_per_sec * fpp / peak
    mfu_hw = pairs_per_sec * fpp_hw / peak

    # secondary metric: fused on-device image preprocess (BASELINE metric 3)
    preprocess_ms = None
    try:
        import functools as _ft

        from rlaifv_tpu.ops.image_kernels import (
            _resize_normalize,
            pil_resize_weights,
        )

        Bi, S, D = 64, 640, 336
        rngn = np.random.default_rng(0)
        imgs = jnp.asarray(
            rngn.integers(0, 255, size=(Bi, S, S, 3), dtype=np.uint8)
        )
        Wr = jnp.asarray(pil_resize_weights(S, D))
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

        @_ft.partial(jax.jit, static_argnames=("k",))
        def chain(imgs, k):
            def body(i, acc):
                x = imgs + i.astype(jnp.uint8)
                out = _resize_normalize(x, Wr, Wr, mean, std, True)
                return acc + out.mean()

            return jax.lax.fori_loop(0, k, body, 0.0)

        float(chain(imgs, 1))
        float(chain(imgs, 11))

        def t(k):
            t0 = time.perf_counter()
            float(chain(imgs, k))
            return time.perf_counter() - t0

        t1 = min(t(1) for _ in range(3))
        t11 = min(t(11) for _ in range(3))
        preprocess_ms = round((t11 - t1) / 10 / Bi * 1000, 4)
    except Exception:
        pass

    ref_a100 = 0.45 * 312e12 / fpp  # analytic reference estimate (see docstring)
    result = {
        "metric": "dpo_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_a100, 3),
        "vs_baseline_kind": "analytic-a100-estimate",
        "real_geometry": real_geometry,
        "detail": {
            "model": "llava15-proxy-470m",
            "seq_len": seq_len,
            "pairs_per_batch": n_pairs,
            "lm_head_impl": "compact",
            "compact_len": compact_len,
            "shared_prefix": shared_prefix,
            "shared_suffix": shared_suffix,
            "step_ms": round(dt * 1000, 1),
            "mfu_ref_flops": round(mfu_ref, 3),
            "mfu_hw": round(mfu_hw, 3),
            "preprocess_ms_per_image_640_to_336": preprocess_ms,
            "platform": dev.platform,
            "device": str(dev),
        },
    }
    print(json.dumps(result), flush=True)
    if on_tpu:  # the next round's pre-run fallback is this fresh line
        try:
            with open(_LAST_FILE, "w") as f:
                json.dump(result, f, indent=1)
        except OSError:
            pass


if __name__ == "__main__":
    main()
