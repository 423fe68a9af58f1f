"""LoRA as factored param-tree deltas.

Rebuild of the reference LoRA path (ref: muffin/train/train_llava15_lora.py:
112-134 — peft injection on every linear layer except the projector, vision
tower and lm_head; r 64, alpha 16, dropout 0.05; ZeRO-3-aware split save
:137-197). TPU-design: no module surgery — adapters live in a separate
pytree {path: {a (in,r), b (r,out)}}; the train step merges kernel + a@b *
(alpha/r) functionally, so one model definition serves full FT, LoRA FT and
inference with merged weights (llava/model/builder.py:52-86 merge-on-load).
"""
from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Tree = Any

# ref find_all_linear_names: skip vision tower / projector / lm_head
DEFAULT_TARGET = r"llm/.*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$"
DEFAULT_EXCLUDE = r"(vision_tower|mm_projector|lm_head)"


def _flatten(tree: Tree, prefix: str = "") -> List[Tuple[str, Any]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(v, f"{prefix}{k}/"))
    else:
        out.append((prefix[:-1], tree))
    return out


def _set(tree: Tree, path: str, value) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def lora_target_paths(
    params: Tree,
    target: str = DEFAULT_TARGET,
    exclude: str = DEFAULT_EXCLUDE,
) -> List[str]:
    paths = []
    for path, leaf in _flatten(params):
        if re.search(exclude, path):
            continue
        if re.search(target, path) and np.ndim(leaf) == 2:
            paths.append(path)
    return paths


def lora_init(
    rng: jax.Array,
    params: Tree,
    *,
    r: int = 64,
    target: str = DEFAULT_TARGET,
    exclude: str = DEFAULT_EXCLUDE,
    dtype=jnp.float32,
) -> Tree:
    """a ~ kaiming-uniform (peft default), b = 0 (delta starts at zero)."""
    lora: Tree = {}
    for path in lora_target_paths(params, target, exclude):
        leaf = _get(params, path)
        fan_in = leaf.shape[0]
        # packed-int4 base (QuantDense bits=4): the kernel stores two
        # logical K rows per int8 byte and carries 2-D group scales; the
        # adapter operates in the LOGICAL (K, N) space
        module = _get(params, path.rsplit("/kernel", 1)[0])
        scale = module.get("scale") if isinstance(module, dict) else None
        if (np.ndim(scale) == 2
                and getattr(leaf, "dtype", None) == jnp.int8):
            fan_in *= 2
        rng, sub = jax.random.split(rng)
        bound = float(np.sqrt(6.0 / fan_in))
        a = jax.random.uniform(
            sub, (fan_in, r), dtype, minval=-bound, maxval=bound
        )
        b = jnp.zeros((r, leaf.shape[1]), dtype)
        # adapters sit at the module level: ".../q_proj" -> {a, b}
        module_path = path.rsplit("/kernel", 1)[0]
        _set(lora, module_path, {"a": a, "b": b})
    return lora


def _get(tree: Tree, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def lora_merge(params: Tree, lora: Tree, alpha: float = 16.0,
               r: Optional[int] = None) -> Tree:
    """params with kernel' = kernel + (alpha/r) * a @ b, other leaves shared."""

    def walk(p_node, l_node):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        for k, v in p_node.items():
            sub = l_node.get(k) if isinstance(l_node, dict) else None
            if isinstance(sub, dict) and "a" in sub and "b" in sub:
                a, b = sub["a"], sub["b"]
                scale = alpha / a.shape[1]
                delta = ((a @ b) * scale).astype(v["kernel"].dtype)
                out[k] = dict(v, kernel=v["kernel"] + delta)
            else:
                out[k] = walk(v, sub)
        return out

    return walk(params, lora)


def lora_scaled(lora: Tree, alpha: float = 16.0) -> Tree:
    """Fold the alpha/r scale into b, so models.llama.LoraDense's unscaled
    x@a@b side-term equals the merged kernel' = kernel + a@b·(alpha/r).
    Gradients flow through the fold (chain rule), so training on the raw
    {a, b} tree matches the merged formulation exactly."""

    def walk(node):
        if isinstance(node, dict) and "a" in node and "b" in node:
            r = node["a"].shape[1]
            return {"a": node["a"], "b": node["b"] * (alpha / r)}
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(lora)


def save_lora(path: str, lora: Tree, alpha: float, r: int) -> None:
    """Adapters saved separately from base weights (ref :184-197 contract)."""
    flat = {p: np.asarray(v) for p, v in _flatten(lora)}
    flat["__alpha__"] = np.float32(alpha)
    flat["__r__"] = np.int32(r)
    np.savez(path, **flat)


def load_lora(path: str) -> Tuple[Tree, float, int]:
    data = np.load(path)
    lora: Tree = {}
    alpha, r = 16.0, 64
    for key in data.files:
        if key == "__alpha__":
            alpha = float(data[key])
        elif key == "__r__":
            r = int(data[key])
        else:
            _set(lora, key, jnp.asarray(data[key]))
    return lora, alpha, r
