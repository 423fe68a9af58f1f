"""Trainer loop: runs steps, checkpoints, resumes; LoRA variant trains only
adapters while the base stays frozen."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.core.config import Config
from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.parallel.sharding import create_mesh
from rlaifv_tpu.train.lora import (
    lora_init,
    lora_merge,
    lora_target_paths,
    load_lora,
    save_lora,
)
from rlaifv_tpu.train.trainer import DPOTrainer
from rlaifv_tpu.utils.synth import synth_preference_pairs


class _ListDataset:
    def __init__(self, pairs):
        self.pairs = pairs

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        return self.pairs[i]


@pytest.fixture(scope="module")
def setup():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    pairs = synth_preference_pairs(cfg, 8, answer_len=12, question_len=8)
    ds = _ListDataset(pairs)
    coll = DPOCollator(pad_token_id=0, max_len=48, num_patches=P)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, P + 8), jnp.int32),
        images=jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
        image_starts=jnp.asarray([0, 0]),
    )["params"]
    return cfg, model, ds, coll, params


def _config(tmp, steps=4, **kw):
    c = Config()
    c.training.output_dir = str(tmp)
    c.training.max_steps = steps
    c.training.learning_rate = 1e-3
    c.training.save_steps = 2
    c.training.mesh_dp = 1
    c.training.mesh_fsdp = 2
    c.training.mesh_tp = 1
    for k, v in kw.items():
        setattr(c.training, k, v)
    return c


@pytest.mark.slow
def test_trainer_runs_and_checkpoints(setup, tmp_path):
    cfg, model, ds, coll, params = setup
    mesh = create_mesh(dp=1, fsdp=2, tp=1, devices=jax.devices()[:2])
    import jax.numpy as _jnp
    fresh = jax.tree.map(lambda x: _jnp.array(np.asarray(x)), params)
    trainer = DPOTrainer(
        _config(tmp_path), model, fresh, ds, coll, mesh=mesh
    )
    state = trainer.train()
    assert int(state.step) == 4
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))

    # resume: a fresh trainer picks up at step 4 and continues to 6
    fresh2 = jax.tree.map(lambda x: _jnp.array(np.asarray(x)), params)
    trainer2 = DPOTrainer(
        _config(tmp_path, steps=6), model, fresh2, ds, coll, mesh=mesh
    )
    assert trainer2.start_step == 4
    state2 = trainer2.train()
    assert int(state2.step) == 6


@pytest.mark.slow
def test_gradient_accumulation(setup, tmp_path):
    """gradient_accumulation=k: k micro-batches per optimizer update (optax
    MultiSteps); the loop runs max_steps*k micro-steps and params only move
    on every k-th micro-batch."""
    cfg, model, ds, coll, params = setup
    c = _config(tmp_path, steps=2, gradient_accumulation=2, save_steps=100)
    trainer = DPOTrainer(c, model, jax.device_get(params), ds, coll)

    p0 = jax.device_get(trainer.state.params["mm_projector"])
    batches = iter(trainer._batches(0))
    from rlaifv_tpu.parallel.sharding import shard_batch

    with trainer.mesh:
        sb = shard_batch(next(batches), trainer.mesh)
        trainer.state, _ = trainer._step(trainer.state, sb)
        p1 = jax.device_get(trainer.state.params["mm_projector"])
        # first micro-step: gradients accumulated, no optimizer update yet
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
            np.testing.assert_array_equal(a, b)
        sb = shard_batch(next(batches), trainer.mesh)
        trainer.state, _ = trainer._step(trainer.state, sb)
        p2 = jax.device_get(trainer.state.params["mm_projector"])
        assert any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
        )

    state = trainer.train()
    assert int(state.step) == 2 + 2 * 2  # 2 warm micro-steps + max_steps*k


def test_lora_targets_exclude_tower_and_head(setup):
    _, _, _, _, params = setup
    paths = lora_target_paths(params)
    assert paths, "no lora targets found"
    assert all("vision_tower" not in p for p in paths)
    assert all("lm_head" not in p for p in paths)
    assert all("mm_projector" not in p for p in paths)
    assert any("q_proj" in p for p in paths)


def test_lora_merge_zero_b_is_identity(setup):
    _, _, _, _, params = setup
    lora = lora_init(jax.random.PRNGKey(1), params, r=4)
    merged = lora_merge(params, lora, alpha=16.0)
    # b=0 at init: merge must be exactly identity
    k0 = params["llm"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"]
    k1 = merged["llm"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))


@pytest.mark.slow
def test_lora_trainer_base_frozen(setup, tmp_path):
    cfg, model, ds, coll, params = setup
    mesh = create_mesh(dp=1, fsdp=2, tp=1, devices=jax.devices()[:2])
    import jax.numpy as _jnp
    base = jax.tree.map(lambda x: _jnp.array(np.asarray(x)), params)
    lora = lora_init(jax.random.PRNGKey(1), params, r=4)
    trainer = DPOTrainer(
        _config(tmp_path, steps=3, learning_rate=1e-2),
        model, lora, ds, coll, mesh=mesh,
        base_params=base, lora_alpha=16.0,
    )
    state = trainer.train()
    # adapters moved
    b = state.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]["b"]
    assert float(jnp.abs(b).sum()) > 0
    # base untouched
    np.testing.assert_array_equal(
        np.asarray(trainer.base_params["llm"]["model"]["layer_0"]["attn"]
                   ["q_proj"]["kernel"]),
        np.asarray(params["llm"]["model"]["layer_0"]["attn"]["q_proj"]
                   ["kernel"]),
    )


def test_lora_save_load_roundtrip(setup, tmp_path):
    _, _, _, _, params = setup
    lora = lora_init(jax.random.PRNGKey(2), params, r=4)
    path = str(tmp_path / "adapters.npz")
    save_lora(path, lora, alpha=16.0, r=4)
    loaded, alpha, r = load_lora(path)
    assert alpha == 16.0 and r == 4
    a0 = lora["llm"]["model"]["layer_0"]["attn"]["q_proj"]["a"]
    a1 = loaded["llm"]["model"]["layer_0"]["attn"]["q_proj"]["a"]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1))


@pytest.mark.slow
def test_trainer_auto_picks_compact(setup, tmp_path):
    """compact_len > 0 flips the auto head selection to the compact path and
    training steps run (overflow metric present and zero)."""
    from rlaifv_tpu.train.trainer import DPOTrainer

    cfg, model, ds, coll, params = setup
    c = _config(tmp_path / "compact", steps=2, compact_len=32)
    tr = DPOTrainer(c, model, jax.tree_util.tree_map(jnp.copy, params),
                    ds, coll)
    assert tr.hp.lm_head_impl == "compact"
    assert tr.hp.compact_len == 32
    tr.train()
    import json, os
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "compact"), "metrics.jsonl"))]
    assert any("compact_overflow" in m for m in lines)
    assert all(m.get("compact_overflow", 0) == 0 for m in lines)


@pytest.mark.slow
def test_compact_overflow_raises(setup, tmp_path):
    """An undersized compact_len must hard-fail the training run (matching
    ref_logp.py's hard-fail), not just log dropped-token counts."""
    cfg, model, ds, coll, params = setup
    # answer_len=12 -> ~13 loss positions/row; compact_len=4 overflows.
    c = _config(tmp_path / "overflow", steps=3, compact_len=4)
    tr = DPOTrainer(c, model, jax.tree_util.tree_map(jnp.copy, params),
                    ds, coll)
    with pytest.raises(ValueError, match="compact head overflow"):
        tr.train()


@pytest.mark.slow
def test_qlora_trainer_int8_base(setup, tmp_path):
    """DPOTrainer LoRA path over a frozen int8-quantized base: the full
    train.py QLoRA configuration (model.quantize + training.use_lora) at
    trainer level — adapters train, checkpoints resume."""
    import dataclasses

    from rlaifv_tpu.models.convert import quantize_llm_int8

    cfg, _, ds, coll, params = setup
    qcfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(cfg.llm, quantize=True,
                                quantize_lm_head=False),
    )
    qmodel = LlavaForCausalLM(qcfg)
    base = {k: v for k, v in params.items()}
    base["llm"] = quantize_llm_int8(params["llm"], include_lm_head=False)
    base = jax.tree.map(jnp.asarray, base)

    lora = lora_init(jax.random.PRNGKey(3), base, r=4)
    mesh = create_mesh(dp=1, fsdp=2, tp=1, devices=jax.devices()[:2])
    out = tmp_path / "qlora"
    trainer = DPOTrainer(
        _config(out, steps=3, learning_rate=1e-2, save_steps=2),
        qmodel, lora, ds, coll, mesh=mesh,
        base_params=base, lora_alpha=16.0,
    )
    state = trainer.train()
    b = state.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]["b"]
    assert float(jnp.abs(b).sum()) > 0  # adapters moved through int8 base
    # int8 base untouched
    assert trainer.base_params["llm"]["model"]["layer_0"]["attn"]["q_proj"][
        "kernel"
    ].dtype == jnp.int8

    # resume continues from the saved adapter state
    lora2 = lora_init(jax.random.PRNGKey(3), base, r=4)
    tr2 = DPOTrainer(
        _config(out, steps=5, learning_rate=1e-2, save_steps=2),
        qmodel, lora2, ds, coll, mesh=mesh,
        base_params=base, lora_alpha=16.0,
    )
    assert tr2.start_step == 3
    tr2.train()


@pytest.mark.slow
def test_qlora_trainer_int4_base(setup, tmp_path):
    """DPOTrainer LoRA path over a frozen packed-int4 base (the
    ORIGINAL QLoRA recipe: 4-bit base + bf16 adapters; train.py's
    model.quantize_bits=4) — adapters move, the packed base stays frozen."""
    import dataclasses

    from rlaifv_tpu.models.convert import quantize_llm_int4

    cfg, _, ds, coll, params = setup
    qcfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(cfg.llm, quantize=True, quantize_bits=4,
                                quantize_lm_head=False),
    )
    qmodel = LlavaForCausalLM(qcfg)
    base = {k: v for k, v in params.items()}
    base["llm"] = quantize_llm_int4(params["llm"])
    base = jax.tree.map(jnp.asarray, base)

    lora = lora_init(jax.random.PRNGKey(3), base, r=4)
    mesh = create_mesh(dp=1, fsdp=2, tp=1, devices=jax.devices()[:2])
    trainer = DPOTrainer(
        _config(tmp_path / "qlora4", steps=2, learning_rate=1e-2,
                save_steps=2),
        qmodel, lora, ds, coll, mesh=mesh,
        base_params=base, lora_alpha=16.0,
    )
    state = trainer.train()
    b = state.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]["b"]
    assert float(jnp.abs(b).sum()) > 0  # adapters moved via the packed base
    assert trainer.base_params["llm"]["model"]["layer_0"]["attn"]["q_proj"][
        "kernel"
    ].dtype == jnp.int8  # nibble-packed (K/2, N)


@pytest.mark.slow
def test_auto_prefix_rederives_on_shorter_batch(setup, tmp_path):
    """shared_prefix_len=-1 (text-only data): the first batch derives P;
    a later batch whose pair-common prefix is SHORTER must re-derive and
    rebuild the step with a logged warning instead of hard-failing a long
    run mid-flight (ADVICE r3: trainer.py)."""
    cfg, model, _, _, params = setup
    rng = np.random.default_rng(0)
    vocab = cfg.llm.vocab_size
    L = 32

    def mk_pair(diverge_at):
        base = rng.integers(5, vocab, size=L).astype(np.int64)
        win_ids, rej_ids = base.copy(), base.copy()
        rej_ids[diverge_at:] = rng.integers(5, vocab, size=L - diverge_at)
        def side(ids):
            labels = ids.copy()
            labels[:diverge_at] = -100
            return {"input_ids": ids, "labels": labels}
        win, rej = side(win_ids), side(rej_ids)
        win.update(ref_win_logp=-20.0, ref_win_avg_logp=-2.0)
        rej.update(ref_rej_logp=-22.0, ref_rej_avg_logp=-2.2)
        return rej, win

    # place the LONG-prefix pair wherever the seed-0 permutation visits
    # first, so step 1 derives P=20 and step 2 hits the P=10 pair
    order = np.random.default_rng(0).permutation(2)
    pairs = [None, None]
    pairs[int(order[0])] = mk_pair(20)
    pairs[int(order[1])] = mk_pair(10)

    coll = DPOCollator(pad_token_id=0, max_len=L, num_patches=0)
    mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    config = _config(tmp_path / "redrive", steps=2, seed=0,
                     per_device_batch_pairs=1, mesh_fsdp=1,
                     shared_prefix_len=-1)
    import warnings

    fresh = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    trainer = DPOTrainer(config, model, fresh, _ListDataset(pairs),
                         coll, mesh=mesh)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state = trainer.train()
    assert int(state.step) == 2
    msgs = [str(w.message) for w in caught]
    assert any("re-deriving P=10" in m for m in msgs), msgs
    assert trainer.hp.shared_prefix_len == 10

    # explicit (non-auto) P keeps the hard-fail contract
    config2 = _config(tmp_path / "hard", steps=2, seed=0,
                      per_device_batch_pairs=1, mesh_fsdp=1,
                      shared_prefix_len=20)
    fresh2 = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    trainer2 = DPOTrainer(config2, model, fresh2, _ListDataset(pairs),
                          coll, mesh=mesh)
    with pytest.raises(ValueError):
        trainer2.train()
