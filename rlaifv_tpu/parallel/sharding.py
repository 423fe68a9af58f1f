"""Device mesh + parameter sharding rules (GSPMD over ICI).

TPU-native replacement for DeepSpeed ZeRO-2/3 and torch.distributed
(ref: script/zero2.json:16-23, zero3.json:16-27, P1/P2 in SURVEY.md §2.6).
ZeRO-3 == sharding every param/optimizer leaf over the combined
('dp','fsdp') axes; tensor parallelism for the 12B models rides the 'tp'
axis over ICI. XLA inserts the reduce-scatter/all-gather collectives that
DeepSpeed hand-rolls in CUDA.

Rules are (regex over the '/'-joined param path) -> PartitionSpec, first
match wins — params stay plain arrays (no boxed metadata), so the same
rules apply to optimizer-state leaves of identical shape.
"""
from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Tree = Any

MESH_AXES = ("dp", "fsdp", "tp")


def create_mesh(
    dp: int = 1,
    fsdp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. fsdp=None absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None:
        assert n % (dp * tp) == 0, f"{n} devices not divisible by dp*tp={dp*tp}"
        fsdp = n // (dp * tp)
    need = dp * fsdp * tp
    assert need <= n, f"mesh dp*fsdp*tp={need} exceeds {n} devices"
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, MESH_AXES)


# (pattern, spec). Axis conventions:
#   embed-dim -> fsdp-sharded on one side, tp on heads/ffn side
#   1-D params (biases, norm scales) replicated
PARAM_RULES: List[Tuple[str, P]] = [
    (r"tok_embed/embedding$", P("tp", "fsdp")),
    (r"attn/(q_proj|k_proj|v_proj|qkv_proj)/kernel$", P("fsdp", "tp")),
    (r"attn/(o_proj|out_proj)/kernel$", P("tp", "fsdp")),
    (r"mlp/(gate_proj|up_proj|gate_up_proj)/kernel$", P("fsdp", "tp")),
    (r"mlp/down_proj/kernel$", P("tp", "fsdp")),
    (r"lm_head/kernel$", P("fsdp", "tp")),
    (r"(fc1|fc\d+)/kernel$", P("fsdp", "tp")),
    (r"fc2/kernel$", P("tp", "fsdp")),
    (r"patch_embed/kernel$", P(None, None, None, "fsdp")),
    (r"pos_embed$", P(None, "fsdp")),
    (r"(bias|scale|cls_token)$", P()),
]

# Activation sharding: batch over (dp, fsdp) — the ZeRO-equivalent data axis.
BATCH_SPEC = P(("dp", "fsdp"))


def spec_for_path(path: str, rules=None) -> P:
    for pat, spec in rules or PARAM_RULES:
        if re.search(pat, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _shrink_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop axes that don't divide the dim (tiny test models, odd vocab)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        size = np.prod([mesh.shape[a] for a in (
            axis if isinstance(axis, tuple) else (axis,))])
        out.append(axis if shape[i] % size == 0 else None)
    return P(*out)


def param_specs(params: Tree, mesh: Mesh, rules=None) -> Tree:
    """PartitionSpec tree matching `params` (divisibility-checked)."""

    def one(key_path, leaf):
        spec = spec_for_path(_path_str(key_path), rules)
        return _shrink_spec(spec, np.shape(leaf), mesh)

    return jax.tree_util.tree_map_with_path(one, params)


def param_shardings(params: Tree, mesh: Mesh, rules=None) -> Tree:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params, mesh, rules),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Tree, mesh: Mesh, rules=None) -> Tree:
    """Place a host param tree onto the mesh according to the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def shard_batch(batch: Tree, mesh: Mesh) -> Tree:
    """Shard every leaf along its leading (batch) dim over (dp, fsdp)."""
    ns = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def one(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        data_size = mesh.shape["dp"] * mesh.shape["fsdp"]
        if x.shape[0] % data_size:
            return jax.device_put(x, rep)
        return jax.device_put(
            x, NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (x.ndim - 1))))
        )

    return jax.tree.map(one, batch)


def active_mesh() -> Mesh:
    """The mesh installed by an enclosing `with mesh:` (empty Mesh if none).

    jax.interpreters.pxla.thread_resources is deprecated since 0.8.2; the
    replacement lives in jax._src.mesh (same object).
    """
    try:
        from jax._src import mesh as _mesh_lib

        return _mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover — future-jax fallback
        from jax.interpreters import pxla

        return pxla.thread_resources.env.physical_mesh


def pin_batch_activation(x):
    """Constrain an activation's leading dim to the (dp, fsdp) data axes.

    No-op when no mesh is active (single-chip jit) or when the leading dim
    doesn't divide the data axes. Used by the paired forward: without the
    pin, GSPMD propagation picks a (dp, ., tp)-sharded layout for the
    suffix stream (the tiled-prefix KV concat confuses it) and then pays a
    replicate-then-repartition ("involuntary full rematerialization") in
    front of every MLP matmul.
    """
    mesh = active_mesh()
    if mesh.empty or "dp" not in mesh.shape:
        return x
    data = mesh.shape["dp"] * mesh.shape["fsdp"]
    if x.ndim == 0 or x.shape[0] % data:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(("dp", "fsdp"), *([None] * (x.ndim - 1)))
    )
