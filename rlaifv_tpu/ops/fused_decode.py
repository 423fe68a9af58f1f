"""Multi-layer fused decode step: ONE Pallas kernel per generated token.

The round-1 serve bench showed 7B int8 decode at 1.21x the HBM floor with
the remaining gap split between per-call Mosaic launch latency (~5 calls/
layer x 32 layers) and fusion boundaries (PARITY.md round-2 plan #1). This
kernel walks ALL layers inside one pallas_call: grid = (n_layers, phases),
the hidden state lives in VMEM scratch across the whole grid (TPU grids
are sequential), and every weight/cache block is DMA'd exactly once per
token — the step's HBM traffic is the true floor: int8 weights + live
int8 KV prefix.

Per layer the phase schedule is static:

  [0, nq)              ln_attn + x@Wqkv col-blocks      (int8 MXU)
  nq                   rope, quantize fresh k/v (out), init online softmax
                       with the fresh column
  [nq+1, nq+1+natt)    attention over int8 cache blocks (clamped to the
                       live prefix like ops/decode_attention.py)
  nq+1+natt            softmax finalize -> attnout, quantize per head row
  [o0, o0+no)          x += attnout@Wo col-blocks (residual in scratch)
  [m0, m0+3*nI)        per I-block: gate, up (+silu*), down (+residual)

Mosaic layout rules shape the design (lane-dim reshapes are illegal):
q/k/v live in HEAD-MAJOR (heads*B, Dh) scratches filled by per-head-chunk
stores straight out of the qkv matmul blocks; the cache is stacked
h-major (n_layers, KVH, B, L, Dh) so cache blocks merge to the same row
order with a leading reshape; rotate-half rope uses a lane roll + sign
mask instead of lane slicing; the o projection contracts per head
((H, B, Dh) x (H, Dh, bn) batched over H, per-(head,row) scales applied
before the head sum, which keeps activation quantization exact).

The fresh k/v never touch the cache inside the kernel: they are emitted
as outputs and scattered by one XLA dynamic_update_slice over the stacked
cache — so the kernel reads the cache strictly below `cache_index`.

Requires cfg.quantize + cfg.fuse_proj + kv_cache_dtype="int8". MHA
(vicuna-7B) and GQA (llama3-8B, num_heads a multiple of num_kv_heads)
both supported: attention state lives in (kv-head, batch, rep) row order
so each cache block batches one matmul per kv row over all its rep q
rows — no cache expansion; q reorders once per layer at rope time and
back at finalize (identity reshapes under MHA).
Activation quantization matches QuantDense (per-row symmetric) and
attention matches decode_attention_prefix_int8 (quantize the small side;
fold contracted-axis v scales into p).

VMEM: at 7B geometry the double-buffered weight/cache blocks total ~90MB,
over XLA's default 16MB scoped-vmem budget (a flag default, not the v5e
hardware limit). Processes running this kernel must set
`--xla_tpu_scoped_vmem_limit_kib=101376` in XLA_FLAGS before jax
initializes (see ensure_vmem_budget()).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30

VMEM_LIMIT_KIB = 101376  # 99MB of the v5e's VMEM for the kernel pipeline


def ensure_vmem_budget():
    """Raise the scoped-vmem flag the 7B kernel needs. Must run before the
    TPU backend initializes (libtpu parses LIBTPU_INIT_ARGS once); call it
    at process start in anything that serves with fused decode."""
    import os

    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (
            args + f" --xla_tpu_scoped_vmem_limit_kib={VMEM_LIMIT_KIB}"
        ).strip()


@dataclasses.dataclass(frozen=True)
class FusedDecodeDims:
    n_layers: int
    D: int          # hidden
    H: int          # query heads
    KVH: int        # kv heads (must equal H)
    Dh: int         # head dim
    I: int          # true intermediate (model config)
    Ip: int         # padded intermediate the kernel runs (128-multiple
                    # with a legal lane block; zero-padded cols are exact)
    L: int          # cache max length
    eps: float      # rms norm epsilon
    bn_qkv: int
    bl: int
    bn_o: int
    bi: int
    # int4 mode (QuantDense bits=4 / convert.quantize_llm_int4): weights
    # stream as nibble-packed int8 (two per byte; ops/int4_matmul
    # pack_int4 layout) with group-wise scales; weight HBM traffic HALVES
    # vs int8, which is the decode floor. Group sizes follow the
    # checkpoint layout (ops/int4_matmul.pick_int4_group per matrix).
    w4: bool = False
    g_d: int = 128     # group along D (qkv + gate/up contractions)
    g_o: int = 128     # group along H*Dh (o contraction; % Dh == 0)
    g_down: int = 128  # group along I/Ip (down contraction)

    @property
    def gpb_down(self) -> int:
        """down-proj quantization groups per bi block."""
        return self.bi // self.g_down

    @property
    def sdb(self) -> int:
        """sdown BAND rows per bi block: Mosaic requires second-minor
        block dims be 8-multiples (or the full array dim) — vicuna's
        bi=1408/g=128 gives 11 scale rows per block, so each block's
        scales are stored padded to the next 8-multiple (zero rows are
        never read: _gdot4 indexes only the first gpb_down)."""
        g = self.gpb_down
        if self.nI == 1 or g % 8 == 0:
            return g
        return -(-g // 8) * 8

    @property
    def Nq(self) -> int:
        return (self.H + 2 * self.KVH) * self.Dh

    @property
    def nq(self) -> int:
        return self.Nq // self.bn_qkv

    @property
    def natt(self) -> int:
        return self.L // self.bl

    @property
    def no(self) -> int:
        return self.D // self.bn_o

    @property
    def nI(self) -> int:
        return self.Ip // self.bi

    @property
    def att_prep(self) -> int:
        return self.nq

    @property
    def att0(self) -> int:
        return self.nq + 1

    @property
    def att_fin(self) -> int:
        return self.att0 + self.natt

    @property
    def o0(self) -> int:
        return self.att_fin + 1

    @property
    def m0(self) -> int:
        return self.o0 + self.no

    @property
    def phases(self) -> int:
        return self.m0 + 3 * self.nI


def _pick_block(n: int, targets) -> int:
    for t in targets:
        if n % t == 0:
            return t
    raise ValueError(f"no block divides {n} among {targets}")


def _pick_intermediate(I: int):
    """(Ip, bi): pad I up to a 128-multiple that admits a lane-legal MLP
    block. Mosaic requires lane-dim block sizes be multiples of 128 (or
    the full dim) — vicuna-7B's I=11008 = 128x86 has no 128-multiple
    divisor in the VMEM-friendly [512, 2048] range, so 2 lanes of zero
    padding (11264 = 8x1408) buy a legal bi=1408 at 2.3% extra MLP
    traffic. Zero-padded columns are numerically exact (gate=up=0 =>
    silu(0)*0 = 0 contribution through down)."""
    base = -(-I // 128) * 128
    lo = min(512, base)
    for pad in range(0, 9):
        Ip = base + pad * 128
        for t in range(min(2048, Ip), lo - 1, -128):
            if Ip % t == 0:
                return Ip, t
    return base, 128


def default_dims(cfg, L: int) -> FusedDecodeDims:
    D, H, KVH, Dh = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                     cfg.head_size)
    Nq = (H + 2 * KVH) * Dh
    # bn_qkv must divide the q and k sections so each phase's chunks land
    # in one tensor
    qkv_targets = [t for t in (2048, 1024, 512, 256, 128, Dh)
                   if H * Dh % t == 0 and KVH * Dh % t == 0 and Nq % t == 0]
    Ip, bi = _pick_intermediate(cfg.intermediate_size)
    w4 = getattr(cfg, "quantize_bits", 8) == 4
    g_d = g_o = g_down = 128
    if w4:
        from rlaifv_tpu.ops.int4_matmul import pick_int4_group

        g_d = pick_int4_group(D)
        g_o = pick_int4_group(H * Dh)
        g_down = pick_int4_group(cfg.intermediate_size)
        assert g_o % Dh == 0, (
            f"int4 o-projection needs whole heads per group (g_o={g_o}, "
            f"Dh={Dh})"
        )
        assert bi % g_down == 0 and Ip % g_down == 0, (
            f"int4 mlp tiling: g_down={g_down} must divide bi={bi} and "
            f"Ip={Ip}"
        )
    return FusedDecodeDims(
        n_layers=cfg.num_layers, D=D, H=H, KVH=KVH, Dh=Dh,
        I=cfg.intermediate_size, Ip=Ip, L=L, eps=cfg.rms_norm_eps,
        bn_qkv=qkv_targets[0],
        bl=_pick_block(L, (128, 256, L)),
        bn_o=_pick_block(D, (2048, 1024, 512, 256, 128, D)),
        bi=bi,
        w4=w4, g_d=g_d, g_o=g_o, g_down=g_down,
    )


def stack_llama_params(llm_params: dict, cfg, *, consume: bool = False) -> dict:
    """Per-layer tree (quantize+fuse_proj layout) -> stacked arrays.

    MLP arrays are zero-padded from I to the kernel's Ip (same
    `_pick_intermediate` choice as `default_dims`) so lane-dim blocks are
    Mosaic-legal; padded columns contribute exactly zero.

    consume=True DONATES the per-layer kernel buffers to the stacking
    program (jit + donate): XLA reuses their HBM for the stacked outputs,
    so both layouts of a 6.6GB int8 7B kernel set never coexist — eager
    stacking peaks at ~15.7G on a 16G chip. The donated per-layer kernel
    arrays are dead afterwards (on backends that honor donation)."""
    model = llm_params["model"]
    n = cfg.num_layers
    I = cfg.intermediate_size

    kernels = [
        [model[f"layer_{i}"][grp][name]["kernel"] for i in range(n)]
        for grp, name in _KERNEL_PATHS
    ]
    scales = [
        [model[f"layer_{i}"][grp][name]["scale"] for i in range(n)]
        for grp, name in _KERNEL_PATHS
    ]
    ln = [
        [model[f"layer_{i}"]["ln_attn"]["scale"],
         model[f"layer_{i}"]["ln_mlp"]["scale"]]
        for i in range(n)
    ]
    # int4 checkpoints (convert.quantize_llm_int4): 2-D group scales
    w4 = np.ndim(scales[0][0]) == 2
    Ip, bi = _pick_intermediate(I)

    def build(kernels, scales, ln):
        wqkv, wo, wgu, wdown = kernels
        sqkv, so, sgu, sdown = scales

        def pad_gu(a):  # (n, [1,] 2I) or (n, D|D/2|D/g, 2I) -> ... 2Ip
            if Ip == I:
                return a
            z = jnp.zeros(a.shape[:-1] + (Ip - I,), a.dtype)
            return jnp.concatenate([a[..., :I], z, a[..., I:], z], axis=-1)

        def pad_down(a):  # (n, I, D) -> (n, Ip, D); w4 packed: I/2 -> Ip/2
            if Ip == I:
                return a
            rows = (Ip - I) // 2 if w4 else Ip - I
            z = jnp.zeros((a.shape[0], rows, a.shape[2]), a.dtype)
            return jnp.concatenate([a, z], axis=1)

        def pad_groups(a):  # (n, I/g, D) -> (n, Ip/g, D), zero groups
            if Ip == I:
                return a
            g = I // a.shape[1]
            z = jnp.zeros((a.shape[0], (Ip - I) // g, a.shape[2]), a.dtype)
            return jnp.concatenate([a, z], axis=1)

        def band_down_scales(a):  # (n, Ip/g, D) -> (n, nI*sdb, D)
            # per-bi-block scale rows padded to the Mosaic-legal band
            # (FusedDecodeDims.sdb); zero rows are never indexed
            rows = a.shape[1]
            g = Ip // rows
            gpb = bi // g
            band = gpb if (Ip // bi == 1 or gpb % 8 == 0) else -(-gpb // 8) * 8
            if band == gpb:
                return a
            nI = rows // gpb
            a = a.reshape(a.shape[0], nI, gpb, a.shape[2])
            z = jnp.zeros((a.shape[0], nI, band - gpb, a.shape[3]), a.dtype)
            return jnp.concatenate([a, z], axis=2).reshape(
                a.shape[0], nI * band, -1
            )

        if not w4:
            return {
                "wqkv": jnp.stack(wqkv),
                "sqkv": jnp.stack(sqkv)[:, None],
                "wo": jnp.stack(wo),
                "so": jnp.stack(so)[:, None],
                "wgu": pad_gu(jnp.stack(wgu)),
                "sgu": pad_gu(jnp.stack(sgu)[:, None]),
                "wdown": pad_down(jnp.stack(wdown)),
                "sdown": jnp.stack(sdown)[:, None],
                "ln": jnp.stack([jnp.stack(pair) for pair in ln]).astype(
                    jnp.float32
                ),
            }

        # int4: kernels are nibble-packed int8 at (K/2, N); scales are
        # 2-D (K/g, N). Zero-padded bytes/columns and zero-scale groups
        # are exact for the same reason as int8 (integer contributions of
        # zero are zero; silu(0)*0 = 0).
        return {
            "wqkv": jnp.stack(wqkv),           # (n, D/2, Nq) packed
            "sqkv": jnp.stack(sqkv),           # (n, D/g_d, Nq)
            "wo": jnp.stack(wo),               # (n, H*Dh/2, D) packed
            "so": jnp.stack(so),               # (n, H*Dh/g_o, D)
            "wgu": pad_gu(jnp.stack(wgu)),     # (n, D/2, 2Ip) packed
            "sgu": pad_gu(jnp.stack(sgu)),     # (n, D/g_d, 2Ip)
            "wdown": pad_down(jnp.stack(wdown)),  # (n, Ip/2, D) packed
            "sdown": band_down_scales(
                pad_groups(jnp.stack(sdown))
            ),  # (n, nI*sdb, D) banded group scales
            "ln": jnp.stack([jnp.stack(pair) for pair in ln]).astype(
                jnp.float32
            ),
        }

    if consume:
        out = jax.jit(build, donate_argnums=(0,))(kernels, scales, ln)
        # donation can't alias here (many buffers -> one stacked array), and
        # on some backends unaliased donated buffers stay alive as long as
        # the CALLER still references them — a 7B int8 kernel set is 6.6GB
        # of dead weight. Enforce the ownership transfer: materialize the
        # stacked arrays, then delete the per-layer kernel buffers.
        jax.block_until_ready(out)
        for group in kernels:
            for arr in group:
                try:
                    arr.delete()
                except Exception:
                    pass  # already deleted by a donation-honoring backend
        return out
    return build(kernels, scales, ln)


def stack_cache(cache_list) -> dict:
    """list of per-layer int8 cache dicts (B, L, KVH, Dh) -> stacked
    HEAD-MAJOR (n_layers, KVH, B, L, Dh) kernel layout."""
    k = jnp.stack([c["k"] for c in cache_list]).transpose(0, 3, 1, 2, 4)
    v = jnp.stack([c["v"] for c in cache_list]).transpose(0, 3, 1, 2, 4)
    ks = jnp.stack([c["k_scale"] for c in cache_list]).transpose(0, 3, 1, 2)
    vs = jnp.stack([c["v_scale"] for c in cache_list]).transpose(0, 3, 1, 2)
    return {"k": k, "k_scale": ks, "v": v, "v_scale": vs}


_KERNEL_PATHS = (("attn", "qkv_proj"), ("attn", "o_proj"),
                 ("mlp", "gate_up_proj"), ("mlp", "down_proj"))


def strip_llm_kernels(llm_params: dict, cfg) -> dict:
    """Drop the big per-layer kernels from the flax tree — after
    stack_llama_params they live ONLY in the stacked arrays (int8 7B
    kernels are 6.6GB; holding both layouts OOMs a 16G chip).
    restore_llm_kernels rebuilds per-layer views inside jit for the flax
    prefill path (XLA reads slices of the stacked operands — no duplicate
    residency)."""
    model = {**llm_params["model"]}
    for i in range(cfg.num_layers):
        layer = {**model[f"layer_{i}"]}
        for grp, name in _KERNEL_PATHS:
            g = {**layer[grp]}
            mod = {**g[name]}
            mod.pop("kernel")
            g[name] = mod
            layer[grp] = g
        model[f"layer_{i}"] = layer
    return {**llm_params, "model": model}


def stacked_prefill_tower(stacked, scache, embeds, mask, pos, cfg,
                          col_start, slot_ids=None, n_slots: int = 0):
    """Run a prompt window through the whole layer stack directly on the
    STACKED weights under one lax.scan, writing each layer's int8 KV into
    the stacked h-major cache at columns [col_start, col_start + Lp)
    (write-through prefill; see write_prefill_window for slot scatter).

    Bit-identical to the flax per-layer prefill: the same primitives run
    with the same dtypes (int8_matmul_grad / QuantDense-fallback,
    apply_rope, multi_head_attention, quantize_kv), and the zero-padded
    MLP columns are exact — integer matmul contributions of zero rows are
    zero, and padded gate/up columns produce silu(0)*0 = 0, without
    changing the per-row activation quantization scales. vs the unrolled
    restore-per-layer formulation this keeps HLO temps bounded to ONE
    layer's (no 32x unpad-concat copies — the 7B serve prefill OOMed on
    those) and compiles a single layer body.

    Returns (final hidden states (R, Lp, D) pre-ln_f, scache)."""
    from rlaifv_tpu.models.llama import apply_rope, rope_cos_sin
    from rlaifv_tpu.ops.attention import multi_head_attention
    from rlaifv_tpu.ops.decode_attention import quantize_kv

    R, Lp = mask.shape
    D, H, KVH, Dh = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                     cfg.head_size)
    eps = cfg.rms_norm_eps
    cos, sin = rope_cos_sin(pos, Dh, cfg.rope_theta, cfg.dtype)

    Ip, _ = _pick_intermediate(cfg.intermediate_size)
    w4 = getattr(cfg, "quantize_bits", 8) == 4
    if w4:
        # int4 stacked layout: nibble-packed int8 at (K/2, N), so the
        # generic int4 matmul applies directly (group size derives
        # from the scale shape, bit-identical to QuantDense(bits=4))
        from rlaifv_tpu.ops.int4_matmul import int4_matmul_grad

        def _mm(x, w, s):
            return int4_matmul_grad(x, w, s)
    elif jax.default_backend() == "tpu":
        from rlaifv_tpu.ops.quant_matmul import int8_matmul_grad as _mm
    else:
        def _mm(x, w, s):  # QuantDense's CPU fallback, bit-for-bit
            wd = w.astype(x.dtype) * s.astype(x.dtype)[None, :]
            return x @ wd

    def rms(x, scale):  # models.llama.RMSNorm, bit-for-bit
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
        return (xf * scale.astype(jnp.float32)).astype(x.dtype)

    def _sq(s):  # int8 stacked scales carry a leading singleton; int4 2-D
        return s if w4 else s[0]

    def body(carry, wl):
        x, sc, i = carry
        xn = rms(x, wl["ln"][0])
        qkv = _mm(xn, wl["wqkv"], _sq(wl["sqkv"]))
        q = qkv[..., : H * Dh].reshape(R, Lp, H, Dh)
        k = qkv[..., H * Dh : (H + KVH) * Dh].reshape(R, Lp, KVH, Dh)
        v = qkv[..., (H + KVH) * Dh :].reshape(R, Lp, KVH, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        out = multi_head_attention(
            q, k, v, attention_mask=mask, causal=True, q_offset=None,
            impl=cfg.attn_impl,
        ).reshape(R, Lp, H * Dh)
        x = x + _mm(out, wl["wo"], _sq(wl["so"]))
        xn2 = rms(x, wl["ln"][1])
        gu = _mm(xn2, wl["wgu"], _sq(wl["sgu"]))
        gate, up = gu[..., :Ip], gu[..., Ip:]
        act = jax.nn.silu(gate) * up
        x = x + _mm(act, wl["wdown"], _sq(wl["sdown"]))
        mini = {"k": kq, "k_scale": ks, "v": vq, "v_scale": vs}
        sc = write_prefill_window(sc, i, mini, col_start, slot_ids, n_slots)
        return (x, sc, i + 1), None

    (x, scache, _), _ = jax.lax.scan(
        body, (embeds, scache, jnp.int32(0)), stacked
    )
    return x, scache


def write_prefill_window(scache: dict, i: int, mini: dict, col_start,
                         slot_ids=None, n_slots: int = 0) -> dict:
    """Write one layer's prefill window cache (model layout (R, Lp, KVH
    [, Dh])) into the stacked h-major cache at columns [col_start,
    col_start + Lp).

    slot_ids=None: the window rows ARE the batch rows (engine prefill,
    R == B). Otherwise rows scatter to `slot_ids` slots of the n_slots
    batch; ids >= n_slots drop (continuous-batching dummy rows).

    This is the write-through half of the fused-decode memory plan: the
    per-layer (B, L) cache layout never exists at full (max_len x n_layers)
    size — each layer's (R, Lp) window transposes (one ~100MB transient)
    and lands in the donated stacked buffer immediately."""
    def to_hmajor(a):  # (R, Lp, KVH[, Dh]) -> (KVH, R, Lp[, Dh])
        perm = (2, 0, 1, 3) if a.ndim == 4 else (2, 0, 1)
        return a.transpose(perm)

    def put(glob, sub):
        sub = to_hmajor(sub).astype(glob.dtype)[None]  # (1, KVH, R, Lp[, Dh])
        Lp = sub.shape[3]
        lead = (i, 0, 0, col_start) + (0,) * (glob.ndim - 4)
        if slot_ids is None:
            return jax.lax.dynamic_update_slice(glob, sub, lead)
        size = (1,) + glob.shape[1:2] + (n_slots, Lp) + glob.shape[4:]
        win = jax.lax.dynamic_slice(glob, lead, size)
        win = win.at[:, :, slot_ids].set(sub, mode="drop")
        return jax.lax.dynamic_update_slice(glob, win, lead)

    return {
        "k": put(scache["k"], mini["k"]),
        "k_scale": put(scache["k_scale"], mini["k_scale"]),
        "v": put(scache["v"], mini["v"]),
        "v_scale": put(scache["v_scale"], mini["v_scale"]),
    }


def compact_stacked(scache: dict, shift) -> dict:
    """Roll every cache column left by `shift` (continuous-batching
    compaction), one layer at a time: a whole-array jnp.roll of a 4.8GB
    donated buffer needs a second 4.8GB allocation; per-layer rolls bound
    the transient to ~2 layer slices."""
    n = scache["k"].shape[0]

    def body(i, sc):
        def roll_layer(a):
            lead = (i,) + (0,) * (a.ndim - 1)
            sl = jax.lax.dynamic_slice(a, lead, (1,) + a.shape[1:])
            sl = jnp.roll(sl, -shift, axis=3)
            return jax.lax.dynamic_update_slice(a, sl, lead)

        return {k: roll_layer(v) for k, v in sc.items()}

    return jax.lax.fori_loop(0, n, body, scache)


def init_stacked_cache(cfg, batch: int, max_len: int) -> dict:
    """Fresh all-zero stacked h-major int8 cache (the layout stack_cache
    produces) — for engines that keep the cache stacked from the start."""
    n, KVH, Dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_size
    return {
        "k": jnp.zeros((n, KVH, batch, max_len, Dh), jnp.int8),
        "k_scale": jnp.zeros((n, KVH, batch, max_len), jnp.float32),
        "v": jnp.zeros((n, KVH, batch, max_len, Dh), jnp.int8),
        "v_scale": jnp.zeros((n, KVH, batch, max_len), jnp.float32),
    }


def unstack_cache(stacked: dict):
    n = stacked["k"].shape[0]
    return [
        {
            "k": stacked["k"][i].transpose(1, 2, 0, 3),
            "k_scale": stacked["k_scale"][i].transpose(1, 2, 0),
            "v": stacked["v"][i].transpose(1, 2, 0, 3),
            "v_scale": stacked["v_scale"][i].transpose(1, 2, 0),
        }
        for i in range(n)
    ]


def _quant_rows(x):
    """(..., N) f32 -> int8 with per-row scales (..., 1); QuantDense/
    decode_attention activation scheme."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-20) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _unpack4(qp, g):
    """(g/2, n) packed byte rows of ONE group -> (g, n) int8 in natural
    order (ops/int4_matmul pack_int4 layout: lo block then hi block).
    i32 widen + shift/mask — i8 shifts do not legalize in Mosaic and the
    s4 dtype cannot be laid out for a Pallas operand on this runtime."""
    b = qp.astype(jnp.int32)
    lo = ((b & 0xF) ^ 8) - 8
    hi = b >> 4
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _gdot4(xq, qp, s2d, g):
    """Group-scaled int4 matmul tile: xq (B, K) int8, qp (K/2, bn) packed
    tile, s2d (K/g, bn) group scales -> (B, bn) f32 (missing only the
    per-row activation scale). Each group's bytes unpack to int8 in VMEM,
    then one int8 MXU sub-dot per group, f32 rescale-accumulate — the
    group scale sits inside the contraction so it cannot fold into one
    output rescale the way int8's per-column scales do."""
    hg = g // 2
    ng = (2 * qp.shape[0]) // g
    out = None
    for i in range(ng):
        q8 = _unpack4(qp[i * hg : (i + 1) * hg], g)
        part = jax.lax.dot_general(
            xq[:, i * g : (i + 1) * g], q8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * s2d[i : i + 1, :]
        out = part if out is None else out + part
    return out


def _rms(x, scale, eps):
    x = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return x * r * scale.astype(jnp.float32)


def _kernel(
    scalars_ref,  # [valid_blocks, cache_index]
    # inputs
    x_in_ref, cossin_ref, mask_ref, ln_ref,
    wqkv_ref, sqkv_ref, kc_ref, ksc_ref, vc_ref, vsc_ref,
    wo_ref, so_ref, wgu_ref, sgu_ref, wdown_ref, sdown_ref,
    # outputs
    xout_ref, nk_ref, nks_ref, nv_ref, nvs_ref,
    # scratch
    x_s, x8_s, xs_s, qh_s, kh_s, vh_s, q8_s, qs_s,
    m_s, l_s, acc_s, ao8_s, aos_s, g_s, a8_s, as_s,
    *, dims: FusedDecodeDims, scale: float,
):
    d = dims
    B = x_s.shape[0]
    N = d.H * B          # q rows, head-major (h*B + b)
    n_rep = d.H // d.KVH
    Nkv = d.KVH * B      # kv rows, kv-head-major (g*B + b)
    layer = pl.program_id(0)
    p = pl.program_id(1)
    chunks = d.bn_qkv // d.Dh
    nq_q = d.H * d.Dh // d.bn_qkv       # phases in the q section
    nq_k = d.KVH * d.Dh // d.bn_qkv

    # ---------------- qkv phases: matmul one col-block, store per head
    @pl.when(p < d.nq)
    def _qkv():
        @pl.when(p == 0)
        def _ln1():
            @pl.when(layer == 0)
            def _init_x():
                x_s[...] = x_in_ref[...].astype(jnp.float32)

            xn = _rms(x_s[...], ln_ref[0, 0], d.eps)
            q8, qs = _quant_rows(xn)
            x8_s[...] = q8
            xs_s[...] = qs

        if d.w4:
            y = _gdot4(x8_s[...], wqkv_ref[0], sqkv_ref[0], d.g_d) * xs_s[...]
        else:
            acc = jax.lax.dot_general(
                x8_s[...], wqkv_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B, bn)
            y = acc.astype(jnp.float32) * xs_s[...] * sqkv_ref[0, 0][None, :]

        # bn_qkv divides the q/k/v sections, so a whole phase belongs to
        # exactly one of them; chunk j is head (local_phase*chunks + j)
        for j in range(chunks):
            blk = y[:, j * d.Dh : (j + 1) * d.Dh]  # (B, Dh)

            @pl.when(p < nq_q)
            def _to_q(blk=blk, j=j):
                h = p * chunks + j
                qh_s[pl.ds(h * B, B), :] = blk

            @pl.when((p >= nq_q) & (p < nq_q + nq_k))
            def _to_k(blk=blk, j=j):
                h = (p - nq_q) * chunks + j
                kh_s[pl.ds(h * B, B), :] = blk

            @pl.when(p >= nq_q + nq_k)
            def _to_v(blk=blk, j=j):
                h = (p - nq_q - nq_k) * chunks + j
                vh_s[pl.ds(h * B, B), :] = blk

    # ---------------- attention prep: rope + fresh kv + softmax init
    @pl.when(p == d.att_prep)
    def _prep():
        cos = jnp.broadcast_to(
            cossin_ref[0][None], (d.H, B, d.Dh)
        ).reshape(N, d.Dh)
        sin = jnp.broadcast_to(
            cossin_ref[1][None], (d.H, B, d.Dh)
        ).reshape(N, d.Dh)
        half = d.Dh // 2
        # rotate-half without lane slicing: roll by half + sign mask
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d.Dh), 1)
        sign = jnp.where(lane < half, -1.0, 1.0)

        def rope(x):  # (rows, Dh)
            rot = pltpu.roll(x, half, 1) * sign
            return x * cos[: x.shape[0]] + rot * sin[: x.shape[0]]

        q = rope(qh_s[...])
        k = rope(kh_s[...])
        v = vh_s[...]
        qh_s[...] = q
        kh_s[...] = k

        # fresh k/v out (scattered into the cache by the caller)
        k8, ks = _quant_rows(k)
        v8, vs = _quant_rows(v)
        nk_ref[0] = k8.reshape(d.KVH, B, d.Dh)
        nv_ref[0] = v8.reshape(d.KVH, B, d.Dh)
        ones8 = jnp.ones((1, 1, 8), jnp.float32)
        nks_ref[0] = ks.reshape(d.KVH, B, 1) * ones8
        nvs_ref[0] = vs.reshape(d.KVH, B, 1) * ones8

        # attention state lives in (kv-head, batch, rep) row order so GQA
        # cache blocks batch per kv row without expansion; reorder q once
        # here and back at finalize (both identities when n_rep == 1)
        q_gbj = q.reshape(d.KVH, n_rep, B, d.Dh).swapaxes(1, 2).reshape(
            N, d.Dh
        )
        q8, qs = _quant_rows(q_gbj)
        q8_s[...] = q8.reshape(Nkv, n_rep, d.Dh)
        qs_s[...] = qs

        # softmax init with the always-live fresh column
        s_new = jnp.sum(
            q_gbj.reshape(Nkv, n_rep, d.Dh) * k[:, None, :], axis=-1
        ).reshape(N, 1) * scale
        m_s[...] = s_new
        l_s[...] = jnp.ones_like(s_new)
        acc_s[...] = jnp.broadcast_to(
            v[:, None, :], (Nkv, n_rep, d.Dh)
        ).reshape(N, d.Dh)

    # ---------------- attention cache blocks
    il = p - d.att0

    @pl.when((p >= d.att0) & (p < d.att_fin) & (il < scalars_ref[0]))
    def _att():
        kblk = kc_ref[0].reshape(Nkv, d.bl, d.Dh)
        vblk = vc_ref[0].reshape(Nkv, d.bl, d.Dh)
        ks = ksc_ref[0].reshape(Nkv, d.bl)
        vs = vsc_ref[0].reshape(Nkv, d.bl)

        s3 = jax.lax.dot_general(
            q8_s[...], kblk,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (Nkv, n_rep, bl) — per kv row, all its rep q rows at once
        ks_r = jnp.broadcast_to(
            ks[:, None, :], (Nkv, n_rep, d.bl)
        ).reshape(N, d.bl)
        s = s3.reshape(N, d.bl).astype(jnp.float32) * qs_s[...] * ks_r * scale
        # mask: engine validity AND strictly below cache_index (the fresh
        # column is handled separately; its cache slot is still unwritten)
        col = il * d.bl + jax.lax.broadcasted_iota(jnp.int32, (1, d.bl), 1)
        live = jnp.broadcast_to(
            (mask_ref[...] != 0)[None, :, None], (d.KVH, B, n_rep, d.bl)
        ).reshape(N, d.bl) & (col < scalars_ref[1])
        s = jnp.where(live, s, NEG_INF)

        m_old = m_s[...]
        m_new = jnp.maximum(
            m_old, jnp.maximum(jnp.max(s, axis=1, keepdims=True), NEG_INF / 2)
        )
        pmat = jnp.exp(s - m_new)
        corr = jnp.exp(m_old - m_new)
        l_s[...] = l_s[...] * corr + jnp.sum(pmat, axis=1, keepdims=True)

        vs_r = jnp.broadcast_to(
            vs[:, None, :], (Nkv, n_rep, d.bl)
        ).reshape(N, d.bl)
        pv = pmat * vs_r
        p8, ps = _quant_rows(pv)
        accv = jax.lax.dot_general(
            p8.reshape(Nkv, n_rep, d.bl), vblk,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (Nkv, n_rep, Dh)
        acc_s[...] = (acc_s[...] * corr
                      + accv.reshape(N, d.Dh).astype(jnp.float32) * ps)
        m_s[...] = m_new

    # ---------------- attention finalize: per-(head,row) quantization
    @pl.when(p == d.att_fin)
    def _fin():
        out = acc_s[...] / jnp.maximum(l_s[...], 1e-30)  # (N, Dh) gbj order
        # back to head-major rows for the per-head o contraction
        out = out.reshape(d.KVH, B, n_rep, d.Dh).swapaxes(1, 2).reshape(
            N, d.Dh
        )
        a8, asc = _quant_rows(out)
        ao8_s[...] = a8
        aos_s[...] = asc

    # ---------------- o projection col blocks (+ residual), batched per
    # head: scales are per (head, row) so dequant happens before the sum
    io = p - d.o0

    @pl.when((p >= d.o0) & (p < d.m0))
    def _o():
        a8 = ao8_s[...].reshape(d.H, B, d.Dh)
        if d.w4:
            # group scales are per-head-constant (g_o % Dh == 0 asserted
            # in default_dims), applied before the head sum like the
            # per-(head, row) activation scales
            hgo = d.g_o // 2
            ngo = d.H * d.Dh // d.g_o
            w = jnp.concatenate(
                [_unpack4(wo_ref[0][i * hgo : (i + 1) * hgo], d.g_o)
                 for i in range(ngo)], axis=0,
            ).reshape(d.H, d.Dh, d.bn_o)
            hpg = d.g_o // d.Dh
            sh = so_ref[0]  # (H*Dh/g_o, bn)
            if hpg > 1:
                sh = jnp.repeat(sh, hpg, axis=0)  # (H, bn)
            part = jax.lax.dot_general(
                a8, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            part = part * aos_s[...].reshape(d.H, B, 1) * sh[:, None, :]
            y = jnp.sum(part, axis=0)
        else:
            w = wo_ref[0].reshape(d.H, d.Dh, d.bn_o)
            part = jax.lax.dot_general(
                a8, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (H, B, bn)
            part = part.astype(jnp.float32) * aos_s[...].reshape(d.H, B, 1)
            y = jnp.sum(part, axis=0) * so_ref[0, 0][None, :]
        sl = pl.ds(io * d.bn_o, d.bn_o)
        x_s[:, sl] = x_s[:, sl] + y

    # ---------------- mlp: (gate, up+act, down) per I block
    pm = p - d.m0
    i_blk = pm // 3
    sub = pm - i_blk * 3

    def _gu_block():
        if d.w4:
            return _gdot4(x8_s[...], wgu_ref[0], sgu_ref[0], d.g_d) * xs_s[...]
        acc = jax.lax.dot_general(
            x8_s[...], wgu_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs_s[...] * sgu_ref[0, 0][None, :]

    @pl.when((p >= d.m0) & (sub == 0))
    def _gate():
        @pl.when(pm == 0)
        def _ln2():
            xn = _rms(x_s[...], ln_ref[0, 1], d.eps)
            q8, qs = _quant_rows(xn)
            x8_s[...] = q8
            xs_s[...] = qs

        g_s[...] = _gu_block()

    @pl.when((p >= d.m0) & (sub == 1))
    def _up():
        up = _gu_block()
        g = g_s[...]
        a = (g * jax.nn.sigmoid(g)) * up  # silu(gate) * up
        a8, asc = _quant_rows(a)
        a8_s[...] = a8
        as_s[...] = asc

    @pl.when((p >= d.m0) & (sub == 2))
    def _down():
        if d.w4:
            y = _gdot4(a8_s[...], wdown_ref[0], sdown_ref[0], d.g_down)
            y = y * as_s[...]
        else:
            acc = jax.lax.dot_general(
                a8_s[...], wdown_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * as_s[...] * sdown_ref[0, 0][None, :]
        x_s[...] = x_s[...] + y

        @pl.when((layer == d.n_layers - 1) & (pm == 3 * d.nI - 1))
        def _emit():
            xout_ref[...] = x_s[...].astype(xout_ref.dtype)


def fused_decode_step(
    stacked: dict,
    cache: dict,  # stacked h-major int8 cache (see stack_cache)
    x: Array,  # (B, D) hidden after embedding
    mask: Array,  # (B, L) validity of cache columns
    positions: Array,  # (B,) rope positions of the fresh token
    cache_index,  # scalar int32: cache column to write / prefix length
    dims: FusedDecodeDims,
    *,
    rope_theta: float = 10000.0,
    interpret: bool = False,
):
    """One full decode layer-stack step -> (x_out (B, D) f32, new_kv dict).

    The caller scatters new_kv into the stacked cache at `cache_index`
    (scatter_new_kv) and runs the final norm + lm_head on x_out.
    """
    d = dims
    assert d.H % d.KVH == 0, "num_heads must be a multiple of num_kv_heads"
    B = x.shape[0]
    scale = 1.0 / (d.Dh ** 0.5)

    inv = 1.0 / (
        rope_theta
        ** (jnp.arange(0, d.Dh, 2, dtype=jnp.float32) / d.Dh)
    )
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]
    ang = jnp.concatenate([ang, ang], axis=-1)  # (B, Dh) HF duplicated layout
    cossin = jnp.stack([jnp.cos(ang), jnp.sin(ang)])  # (2, B, Dh)

    valid_blocks = jnp.maximum((cache_index + d.bl - 1) // d.bl, 0)
    scalars = jnp.asarray(
        [jnp.int32(valid_blocks), jnp.int32(cache_index)], jnp.int32
    )

    nq, att0, o0, m0 = d.nq, d.att0, d.o0, d.m0

    def qkv_map(l, p, s):
        return (l, 0, jnp.clip(p, 0, nq - 1))

    def sqkv_map(l, p, s):
        return (l, 0, jnp.clip(p, 0, nq - 1))

    def cache_map(l, p, s):
        blk = jnp.clip(p - att0, 0, jnp.maximum(s[0] - 1, 0))
        return (l, 0, 0, blk, 0)

    def cache_s_map(l, p, s):
        blk = jnp.clip(p - att0, 0, jnp.maximum(s[0] - 1, 0))
        return (l, 0, 0, blk)

    def mask_map(l, p, s):
        return (0, jnp.clip(p - att0, 0, jnp.maximum(s[0] - 1, 0)))

    def o_map(l, p, s):
        return (l, 0, jnp.clip(p - o0, 0, d.no - 1))

    def so_map(l, p, s):
        return (l, 0, jnp.clip(p - o0, 0, d.no - 1))

    def gu_map(l, p, s):
        pm = jnp.maximum(p - m0, 0)
        i = pm // 3
        sub = pm - i * 3
        blk = jnp.where(sub == 0, i, d.nI + i)
        return (l, 0, jnp.clip(blk, 0, 2 * d.nI - 1))

    sgu_map = gu_map

    def down_map(l, p, s):
        pm = p - m0
        return (l, jnp.clip((pm - 2) // 3, 0, d.nI - 1), 0)

    if d.w4:
        # int4 group scales stream per down block (rows [i*bi/g, ...))
        sdown_map = down_map
    else:
        def sdown_map(l, p, s):
            return (l, 0, 0)

    def const0(l, p, s):
        return (0, 0)

    N = d.H * B
    # under int4 the weight blocks halve their row counts (nibble-packed
    # int8 (K/2, N) — ops/int4_matmul pack_int4 layout; group-local, so
    # whole-group tiles unpack without global context) and the scale
    # blocks are 2-D group scales instead of leading-singleton per-column
    kq_rows = d.D // 2 if d.w4 else d.D
    ko_rows = d.H * d.Dh // 2 if d.w4 else d.H * d.Dh
    kd_rows = d.bi // 2 if d.w4 else d.bi
    sq_rows = d.D // d.g_d if d.w4 else 1
    so_rows = d.H * d.Dh // d.g_o if d.w4 else 1
    sd_rows = d.sdb if d.w4 else 1  # banded (see FusedDecodeDims.sdb)
    w_specs = [
        pl.BlockSpec((1, kq_rows, d.bn_qkv), qkv_map),        # wqkv
        pl.BlockSpec((1, sq_rows, d.bn_qkv), sqkv_map),       # sqkv
    ]
    o_specs = [
        pl.BlockSpec((1, ko_rows, d.bn_o), o_map),            # wo
        pl.BlockSpec((1, so_rows, d.bn_o), so_map),           # so
    ]
    mlp_specs = [
        pl.BlockSpec((1, kq_rows, d.bi), gu_map),             # wgu
        pl.BlockSpec((1, sq_rows, d.bi), sgu_map),            # sgu
        pl.BlockSpec((1, kd_rows, d.D), down_map),            # wdown
        pl.BlockSpec((1, sd_rows, d.D), sdown_map),           # sdown
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d.n_layers, d.phases),
        in_specs=[
            pl.BlockSpec((B, d.D), const0),                       # x_in
            pl.BlockSpec((2, B, d.Dh), lambda l, p, s: (0, 0, 0)),  # cossin
            pl.BlockSpec((B, d.bl), mask_map),                    # mask
            pl.BlockSpec((1, 2, d.D), lambda l, p, s: (l, 0, 0)),  # ln
            *w_specs,
            pl.BlockSpec((1, d.KVH, B, d.bl, d.Dh), cache_map),   # k cache
            pl.BlockSpec((1, d.KVH, B, d.bl), cache_s_map),       # k scale
            pl.BlockSpec((1, d.KVH, B, d.bl, d.Dh), cache_map),   # v cache
            pl.BlockSpec((1, d.KVH, B, d.bl), cache_s_map),       # v scale
            *o_specs,
            *mlp_specs,
        ],
        out_specs=[
            pl.BlockSpec((B, d.D), const0),                       # x_out
            pl.BlockSpec((1, d.KVH, B, d.Dh),
                         lambda l, p, s: (l, 0, 0, 0)),           # new k
            pl.BlockSpec((1, d.KVH, B, 8),
                         lambda l, p, s: (l, 0, 0, 0)),           # new ks
            pl.BlockSpec((1, d.KVH, B, d.Dh),
                         lambda l, p, s: (l, 0, 0, 0)),           # new v
            pl.BlockSpec((1, d.KVH, B, 8),
                         lambda l, p, s: (l, 0, 0, 0)),           # new vs
        ],
        scratch_shapes=[
            pltpu.VMEM((B, d.D), jnp.float32),        # x residual
            pltpu.VMEM((B, d.D), jnp.int8),           # x quantized
            pltpu.VMEM((B, 1), jnp.float32),          # x row scales
            pltpu.VMEM((N, d.Dh), jnp.float32),       # q (head-major rows)
            pltpu.VMEM((d.KVH * B, d.Dh), jnp.float32),  # k fresh
            pltpu.VMEM((d.KVH * B, d.Dh), jnp.float32),  # v fresh
            pltpu.VMEM((d.KVH * B, d.H // d.KVH, d.Dh), jnp.int8),  # q8 gbj
            pltpu.VMEM((N, 1), jnp.float32),          # q scales (gbj order)
            pltpu.VMEM((N, 1), jnp.float32),          # m
            pltpu.VMEM((N, 1), jnp.float32),          # l
            pltpu.VMEM((N, d.Dh), jnp.float32),       # acc (gbj order)
            pltpu.VMEM((N, d.Dh), jnp.int8),          # attnout int8
            pltpu.VMEM((N, 1), jnp.float32),          # attnout scales
            pltpu.VMEM((B, d.bi), jnp.float32),       # gate block
            pltpu.VMEM((B, d.bi), jnp.int8),          # act int8
            pltpu.VMEM((B, 1), jnp.float32),          # act scales
        ],
    )

    x_out, nk, nks, nv, nvs = pl.pallas_call(
        functools.partial(_kernel, dims=d, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, d.D), jnp.float32),
            jax.ShapeDtypeStruct((d.n_layers, d.KVH, B, d.Dh), jnp.int8),
            jax.ShapeDtypeStruct((d.n_layers, d.KVH, B, 8), jnp.float32),
            jax.ShapeDtypeStruct((d.n_layers, d.KVH, B, d.Dh), jnp.int8),
            jax.ShapeDtypeStruct((d.n_layers, d.KVH, B, 8), jnp.float32),
        ],
        interpret=interpret,
    )(
        scalars,
        x.astype(jnp.float32), cossin, mask.astype(jnp.int32),
        stacked["ln"],
        stacked["wqkv"], stacked["sqkv"],
        cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
        stacked["wo"], stacked["so"],
        stacked["wgu"], stacked["sgu"],
        stacked["wdown"], stacked["sdown"],
    )
    new_kv = {"k": nk, "k_scale": nks[..., 0], "v": nv,
              "v_scale": nvs[..., 0]}
    return x_out, new_kv


def scatter_new_kv(cache: dict, new_kv: dict, cache_index) -> dict:
    """Write the kernel's fresh per-layer k/v into the stacked h-major
    cache at column `cache_index` (one dynamic_update_slice per array)."""
    def upd(buf, val):
        # buf (n_layers, KVH, B, L[, Dh]); val (n_layers, KVH, B[, Dh])
        val = jnp.expand_dims(val, 3).astype(buf.dtype)
        start = (0, 0, 0, cache_index) + ((0,) if buf.ndim == 5 else ())
        return jax.lax.dynamic_update_slice(buf, val, start)

    return {
        "k": upd(cache["k"], new_kv["k"]),
        "k_scale": upd(cache["k_scale"], new_kv["k_scale"]),
        "v": upd(cache["v"], new_kv["v"]),
        "v_scale": upd(cache["v_scale"], new_kv["v_scale"]),
    }
