"""Export a training run back to a reference/HF-loadable checkpoint dir.

The reference's iterative protocol feeds each round's HF checkpoint back in
as the next base model (ref README.md:205-221) and its loader consumes full
checkpoints or peft adapter dirs (ref llava/model/builder.py:26-167). This
CLI closes that loop for runs trained here:

  python scripts/export_hf.py --config cfg.json \
      --train-dir output/run1 --out output/run1_hf [--step N]

- full-FT runs  -> pytorch_model.bin + config.json (+ tokenizer files and
  the dead final ViT block passed through from the base checkpoint)
- LoRA/QLoRA    -> adapter_model.bin + adapter_config.json (peft layout;
  load with `load_pretrained_llava(adapter_dir, base_dir)` or the
  reference's --model-base path)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="the training config json of the run")
    ap.add_argument("--train-dir", default=None,
                    help="training output dir (default: config output_dir)")
    ap.add_argument("--out", required=True, help="export directory")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side conversion only

    import numpy as np

    from rlaifv_tpu.core.checkpoint import CheckpointManager
    from rlaifv_tpu.core.config import Config
    from rlaifv_tpu.models.export import export_llava_hf, export_peft_lora

    config = Config.from_json(args.config)
    t = config.training
    train_dir = args.train_dir or t.output_dir
    ckpt = CheckpointManager(os.path.join(train_dir, "checkpoints"))
    step = args.step if args.step is not None else ckpt.latest_step()
    print(f"[export] restoring step {step} from {train_dir}")
    state = ckpt.restore_raw(step)
    params = state["params"]

    def _is_lora_tree(node):
        if isinstance(node, dict):
            if {"a", "b"} <= set(node):
                return True
            return any(_is_lora_tree(v) for v in node.values())
        return False

    # decide by the tree's actual shape, not the config: demo runs train
    # full-FT under any config, and a full tree exported as peft would be
    # silently empty
    if _is_lora_tree(params):
        out = export_peft_lora(
            params, args.out,
            alpha=float(getattr(t, "lora_alpha", 16.0)),
            r=int(getattr(t, "lora_r", 64)),
            base_model_name=config.model.model_name_or_path,
        )
        print(f"[export] peft adapter dir: {out} "
              f"(load with model_base={config.model.model_name_or_path})")
    else:
        import train as train_entry

        cfg, _ = train_entry.build_llava(config)
        base = config.model.model_name_or_path
        out = export_llava_hf(
            params, args.out, cfg=cfg,
            base_dir=base if base and os.path.isdir(base) else None,
            dtype=np.float16,
        )
        print(f"[export] full checkpoint dir: {out}")


if __name__ == "__main__":
    main()
