"""Worker for the REAL 2-process `jax.distributed` test.

Launched twice by tests/test_two_process.py with a localhost coordinator.
Exercises every multi-host branch the single-process suite can only no-op
(VERDICT r2 next #2): core.distributed.initialize / all_gather_objects /
barrier / assert_consistent with process_count() == 2, plus a sharded
inference_logp whose rows split across the two processes and merge on
rank 0 (ref: muffin/eval/muffin_inference_logp.py:331-342
`all_gather_object` + barrier + rank-0 parquet write).

Run: python tests/two_process_worker.py <port> <process_id> <out_dir>
Prints "WORKER_OK <pid>" on success.
"""
import io
import os
import sys


def main() -> None:
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    os.environ["RLAIFV_DISTRIBUTED_DEBUG"] = "1"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax

    # the axon site hook re-adds the TPU platform regardless of
    # JAX_PLATFORMS; pin CPU at config level BEFORE distributed init
    # (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from rlaifv_tpu.core import distributed as dist

    # env-driven init path (core/distributed.py:19-33)
    dist.initialize()
    assert dist.process_count() == 2, jax.devices()
    assert dist.process_index() == pid
    assert dist.is_primary() == (pid == 0)

    # --- ragged object gather: the all_gather_object equivalent ---------
    payload = {"rank": pid, "ragged": [[0.5] * (pid + 1), "x" * (3 - pid)]}
    gathered = dist.all_gather_objects(payload)
    assert [g["rank"] for g in gathered] == [0, 1], gathered
    assert gathered[1]["ragged"][0] == [0.5, 0.5]
    assert gathered[0]["ragged"][1] == "xxx"

    # --- barrier --------------------------------------------------------
    dist.barrier("two_process_test")

    # --- assert_consistent: agree passes, diverge raises ----------------
    dist.assert_consistent({"seed": 0, "cfg": "tiny"}, "agree")
    raised = False
    try:
        dist.assert_consistent({"rank": pid}, "diverge")
    except AssertionError:
        raised = True
    assert raised, "divergent value must raise on every process"

    # --- sharded ref-logp precompute, merged on rank 0 ------------------
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from rlaifv_tpu.data.image_processing import ClipImageProcessor
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.ref_logp import inference_logp
    from tests.fake_tokenizer import FakeTokenizer

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    P = cfg.num_image_tokens
    size = cfg.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((2, P + 8), jnp.int32),
        images=jnp.zeros((2, size, size, 3)),
        image_starts=jnp.asarray([0, 0]),
    )["params"]

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):  # odd count -> uneven 2/1 shard split
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        rows.append({
            "idx": str(i),
            "question": f"What is in image {i}?",
            "chosen": f"A small {i} cat.",
            "rejected": f"A big {i} dog and a hat.",
            "image": {"bytes": buf.getvalue(), "path": f"img{i}.png"},
            "image_path": f"img{i}.png",
            "origin_dataset": "unit",
            "origin_split": "{}",
        })

    inference_logp(
        rows, model, params, tok, out_dir,
        max_len=192, num_patches=P, batch_pairs=2,
        image_processor=ClipImageProcessor(image_size=size),
    )
    dist.barrier("after_parquet")
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
