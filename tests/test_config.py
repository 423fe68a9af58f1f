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
