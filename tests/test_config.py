"""Config tree round-trip + checkpoint-resume contract."""
import json
import os

import pytest

from rlaifv_tpu.core.checkpoint import has_resumable_checkpoint
from rlaifv_tpu.core.config import Config, resolve_dtype


def test_config_roundtrip(tmp_path):
    c = Config()
    c.training.dpo_beta = 0.25
    c.training.use_lora = True
    c.model.model_name_or_path = "/ckpt"
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as f:
        json.dump(c.to_dict(), f)
    c2 = Config.from_json(path)
    assert c2.training.dpo_beta == 0.25
    assert c2.training.use_lora is True
    assert c2.model.model_name_or_path == "/ckpt"


def test_shipped_configs_load():
    for name in ("configs/llava15_dpo.json", "configs/llava15_dpo_lora.json"):
        c = Config.from_json(name)
        # reference recipe knobs survive (llava15_train.sh)
        assert c.training.max_steps == 2672
        assert c.training.save_steps == 167
        assert c.training.dpo_beta == 0.1
    lora = Config.from_json("configs/llava15_dpo_lora.json")
    assert lora.training.use_lora and lora.training.lora_r == 64


def test_resolve_dtype():
    import jax.numpy as jnp

    assert resolve_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(KeyError):
        resolve_dtype("float8")


def test_has_resumable_checkpoint(tmp_path):
    d = str(tmp_path)
    assert not has_resumable_checkpoint(d)
    os.makedirs(os.path.join(d, "167"))
    assert has_resumable_checkpoint(d)
    assert not has_resumable_checkpoint(str(tmp_path / "missing"))


def test_qlora_config_wiring():
    """model.quantize=true flows into the llm config (int8 base, bf16 head)
    and the loader path can produce the matching param layout."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np

    from train import build_llava
    from rlaifv_tpu.core.config import Config
    from rlaifv_tpu.models.convert import quantize_llm_int8

    c = Config()
    c.model.quantize = True
    cfg, _model = build_llava(c)
    assert cfg.llm.quantize and not cfg.llm.quantize_lm_head

    llm = {
        "model": {"layer_0": {"attn": {"q_proj": {
            "kernel": np.ones((8, 8), np.float32)}}}},
        "lm_head": {"kernel": np.ones((8, 16), np.float32)},
    }
    q = quantize_llm_int8(llm, include_lm_head=False)
    assert q["model"]["layer_0"]["attn"]["q_proj"]["kernel"].dtype == np.int8
    assert q["lm_head"]["kernel"].dtype == np.float32  # head stays float


def test_checkpoint_roundtrips_packed_int4_tree(tmp_path):
    """A QLoRA-over-int4 training state (packed int8 kernels + 2-D group
    scales + float adapters) survives orbax save/restore bit-exactly —
    the packed redesign keeps every leaf an orbax-native dtype."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rlaifv_tpu.core.checkpoint import CheckpointManager
    from rlaifv_tpu.models.convert import quantize_llm_int4
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))[
        "params"
    ]
    q = quantize_llm_int4(params)
    state = {"params": q, "step": jnp.int32(7)}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(7, state, force=True)
    mgr.wait()
    back = mgr.restore(jax.tree.map(np.zeros_like, state))
    mgr.close()
    flat_a = jax.tree_util.tree_leaves_with_path(state)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        got = flat_b[path]
        assert np.asarray(got).dtype == np.asarray(leaf).dtype, path
        np.testing.assert_array_equal(np.asarray(got), np.asarray(leaf))
