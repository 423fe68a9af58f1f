"""Re-baseline every real-geometry bench, resumably, across tunnel windows.

VERDICT r4 #4 (stale fallbacks predate the round-4 engine changes) and
the round-5 decode-ladder measurements (#1) need a healthy axon tunnel,
which this round comes and goes in ~25-minute windows. This runner:

  - health-probes the round-5 failure mode (int32-operand jit) before
    every entry and stops the moment the tunnel sickens,
  - runs each bench in a subprocess with a timeout,
  - merges fresh results into BENCH_REAL_GEOMETRY.json immediately
    (per-entry flush — a kill or hang loses one entry, never the rest),
    stamped with the git rev, and
  - on the next invocation skips entries already measured at this rev
    (REFRESH_FORCE=1 re-measures everything).

Drive it in a loop from a tunnel watcher; exits 0 when all entries are
fresh at the current rev.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.join(_HERE, "..")
_OUT = os.path.join(_ROOT, "BENCH_REAL_GEOMETRY.json")

# (name, script, env) — mirrors bench.py's _RG_SUBBENCHES plus the
# round-5 decode ladder + drift entries.
# ordered for short tunnel-health windows: the round-5 flagship ladder
# (int8-vs-int4 fused decode + drift + lookup — small, fast compiles)
# first, then the heavier 7B/12B training+serving configs
ENTRIES = [
    ("fused_decode_int8", "bench_fused_decode.py", {}),
    ("fused_decode_int4", "bench_fused_decode.py", {"BENCHFD_BITS": "4"}),
    ("int4_drift_7b_slice", "bench_int4_drift.py", {}),
    ("lookup_decode", "bench_lookup_decode.py", {}),
    ("serve7b_int8", "bench_7b_serve.py", {}),
    ("serve7b_int4", "bench_7b_serve.py", {"BENCH7B_BITS": "4"}),
    ("qlora7b_dpo", "bench_7b_lora.py", {}),
    ("qlora7b_dpo_paired", "bench_7b_lora.py",
     {"BENCH7B_PREFIX": "auto", "BENCH7B_PAIRS": "8"}),
    ("autocheck_shared_llava", "bench_autocheck_shared.py",
     {"BENCH_MODEL": "llava"}),
    ("ref_logp_shared", "bench_7b_ref_logp.py", {}),
    # 12B entries carry their own timeout (4th field): EVA02+Mistral
    # compiles are the slowest in the suite
    ("qlora12b_omni_dpo", "bench_12b_omni_lora.py", {}, 1500),
    ("qlora12b_omni_dpo_int4", "bench_12b_omni_lora.py",
     {"BENCH12B_BITS": "4"}, 1500),
    ("serve12b_int4_fused", "bench_12b_serve.py",
     {"BENCH12B_BITS": "4", "BENCH12B_FUSED": "1"}, 1500),
]


def _rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_ROOT,
            capture_output=True, text=True,
        ).stdout.strip()
    except Exception:
        return "?"


def _healthy(timeout_s: float = 75) -> bool:
    try:
        return subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "a = jnp.asarray(np.arange(256, dtype=np.int32));"
             "print(float(jax.jit(lambda x: x.astype(jnp.float32)"
             ".sum())(a)))"],
            capture_output=True, timeout=timeout_s,
        ).returncode == 0
    except Exception:
        return False


def main() -> int:
    rev = _rev()
    force = os.environ.get("REFRESH_FORCE") == "1"
    per_bench = float(os.environ.get("REFRESH_PER_BENCH_S", "900"))
    try:
        with open(_OUT) as f:
            book = json.load(f)
    except Exception:
        book = {}

    # freshness = measured during this round (the rev is stamped per entry
    # as provenance but doc-only commits must not invalidate measurements)
    pending = [
        e for e in ENTRIES
        if force or not (book.get(e[0]) or {}).get("measured_at")
    ]
    if not pending:
        print(f"all {len(ENTRIES)} entries fresh (latest rev {rev})")
        return 0
    print(f"{len(pending)} entries to refresh at rev {rev}:",
          ", ".join(e[0] for e in pending), flush=True)

    for name, script, env, *rest in pending:
        entry_timeout = rest[0] if rest else per_bench
        if not _healthy():
            print(f"tunnel unhealthy before {name} — stopping (resumable)",
                  flush=True)
            return 2
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(_HERE, script)],
                capture_output=True, text=True,
                timeout=max(entry_timeout, per_bench),
                env=dict(os.environ, **env),
            )
            if p.returncode != 0:
                raise RuntimeError(p.stderr.strip()[-300:])
            res = json.loads(p.stdout.strip().splitlines()[-1])
        except Exception as e:
            print(f"[FAIL] {name} ({time.time()-t0:.0f}s): "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        res["rev"] = rev
        res["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
        # reload-merge before flushing: concurrent edits to other entries
        # (e.g. an interactive invalidation) must not be clobbered by this
        # process's stale in-memory copy
        try:
            with open(_OUT) as f:
                book = json.load(f)
        except Exception:
            pass
        book[name] = res
        with open(_OUT, "w") as f:
            json.dump(book, f, indent=1)
        print(f"[OK] {name} ({time.time()-t0:.0f}s): value={res.get('value')}"
              f" {res.get('unit', '')}", flush=True)

    still = [e[0] for e in ENTRIES
             if not (book.get(e[0]) or {}).get("measured_at")]
    print("remaining:", ", ".join(still) if still else "none", flush=True)
    return 0 if not still else 1


if __name__ == "__main__":
    sys.exit(main())
