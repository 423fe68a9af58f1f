"""End-to-end DPO train step on an 8-device virtual mesh (dp×fsdp×tp).

Exercises the full stack the driver's dryrun_multichip checks: collator ->
sharded batch -> pjit train step -> optimizer update, with params sharded
over fsdp and the batch over (dp, fsdp).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.parallel.sharding import (
    create_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from rlaifv_tpu.train.train_step import (
    DPOHparams,
    DPOTrainState,
    LlavaDPOAdapter,
    dpo_loss_from_batch,
    make_dpo_train_step,
    make_optimizer,
)


def _fake_pair(rng, vocab, img_size, with_logps=True):
    q = rng.integers(5, vocab, size=6).tolist()
    win_ans = rng.integers(5, vocab, size=5).tolist()
    rej_ans = rng.integers(5, vocab, size=7).tolist()
    image = rng.normal(size=(img_size, img_size, 3)).astype(np.float32)

    def side(ans):
        ids = [1] + q[:3] + [IMAGE_TOKEN_INDEX] + q[3:] + ans + [2]
        labels = [IGNORE_INDEX] * (len(ids) - len(ans) - 1) + ans + [2]
        return {
            "input_ids": np.asarray(ids, np.int64),
            "labels": np.asarray(labels, np.int64),
            "image": image,
        }

    win, rej = side(win_ans), side(rej_ans)
    if with_logps:
        win.update(ref_win_logp=-20.0, ref_win_avg_logp=-2.0)
        rej.update(ref_rej_logp=-25.0, ref_rej_avg_logp=-2.5)
    return rej, win


@pytest.fixture(scope="module")
def setup():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)
    rng = np.random.default_rng(0)
    P = cfg.num_image_tokens
    coll = DPOCollator(pad_token_id=0, max_len=48, num_patches=P, beta=0.1)
    pairs = [_fake_pair(rng, cfg.llm.vocab_size, cfg.vision.image_size)
             for _ in range(4)]
    batch = coll(pairs)

    ids0 = jnp.asarray(batch["input_ids"][:2])
    params = model.init(
        jax.random.PRNGKey(0),
        ids0,
        images=jnp.asarray(batch["images"][:2]),
        image_starts=jnp.asarray(batch["image_starts"][:2]),
    )["params"]
    return cfg, model, adapter, coll, batch, params


def test_collator_shapes(setup):
    cfg, _, _, coll, batch, _ = setup
    B, L = 4, coll.max_len
    assert batch["input_ids"].shape == (2 * B, L)
    assert batch["labels"].shape == (2 * B, L)
    assert batch["images"].shape[0] == B
    assert batch["image_starts"].shape == (2 * B,)
    assert batch["win_token_weight"].shape == (B, L - 1)
    # image span carries sentinel ids and ignored labels
    i0 = int(batch["image_starts"][0])
    assert (batch["input_ids"][0, i0 : i0 + coll.num_patches] == IMAGE_TOKEN_INDEX).all()
    assert (batch["labels"][0, i0 : i0 + coll.num_patches] == IGNORE_INDEX).all()


def test_loss_runs_unsharded(setup):
    _, _, adapter, _, batch, params = setup
    hp = DPOHparams(beta=0.1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, metrics = dpo_loss_from_batch(adapter, params, jb, hp)
    assert np.isfinite(float(loss))
    assert "rewards_train/accuracies" in metrics


@pytest.mark.slow
def test_fused_head_impl_matches_xla(setup):
    """lm_head_impl='fused' (Pallas fused head, interpret on CPU) must match
    the logits path in loss and in parameter gradients."""
    _, _, adapter, _, batch, params = setup
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_with(impl):
        hp = DPOHparams(beta=0.1, lm_head_impl=impl)

        def f(p):
            return dpo_loss_from_batch(adapter, p, jb, hp)[0]

        return jax.value_and_grad(f)(params)

    loss_x, grad_x = loss_with("xla")
    loss_f, grad_f = loss_with("fused")
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(grad_x)
    flat_f = jax.tree_util.tree_leaves(grad_f)
    for (path, gx), gf in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("hp", [
    DPOHparams(beta=0.1),
    DPOHparams(beta=0.5, dpo_use_average=True),
    DPOHparams(beta=0.1, dpo_token_weighted=True),
    DPOHparams(beta=0.1, sft_weight=0.5),
    DPOHparams(beta=0.1, lm_head_impl="fused"),
])
@pytest.mark.slow
def test_train_step_sharded(setup, hp):
    _, _, adapter, _, batch, params = setup
    mesh = create_mesh(dp=2, fsdp=2, tp=2)

    if hp.dpo_token_weighted:
        B, L = batch["win_labels"].shape
        batch = dict(batch)
        batch["ref_win_per_token_logp"] = np.zeros((B, L - 1), np.float32)
        batch["ref_rej_per_token_logp"] = np.zeros((B, L - 1), np.float32)

    opt = make_optimizer(1e-3, total_steps=20)
    step_fn = make_dpo_train_step(adapter, opt, hp)

    with mesh:
        sharded_params = shard_params(params, mesh)
        opt_state = opt.init(sharded_params)
        state = DPOTrainState(jnp.int32(0), sharded_params, opt_state)
        sb = shard_batch(batch, mesh)
        jitted = jax.jit(step_fn)

        losses = []
        for _ in range(5):
            state, metrics = jitted(state, sb)
            losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses))
    # optimizing the same batch must reduce the DPO objective
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_param_shardings_cover_big_axes():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    mesh = create_mesh(dp=1, fsdp=4, tp=2)
    sh = param_shardings(params, mesh)
    spec = sh["llm"]["model"]["layer_0"]["mlp"]["gate_proj"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec("fsdp", "tp")
