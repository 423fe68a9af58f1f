"""RLAIFVChat — single-image QA API, reference-compatible.

TPU rebuild of the reference chat entry (ref: chat.py:143-241 —
`RLAIFV7B.chat` builds an llava_v1 prompt, splices the image sentinel,
pads/normalizes the image and decodes with beam 3 / T 0 / max 1024).
Model selection by path substring is preserved (chat.py:221-228). Decode
runs through the jitted KV-cache engine with beam-3 search (reference
decode config).
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from rlaifv_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)
from rlaifv_tpu.data import conversation as conversation_lib
from rlaifv_tpu.data.image_processing import ClipImageProcessor, decode_image
from rlaifv_tpu.data.multimodal import expand_image_sentinels, tokenizer_image_token
from rlaifv_tpu.genai.engine import DecodeEngine
from rlaifv_tpu.genai.sampling import SamplingParams


class RLAIFV7B:
    """LLaVA-1.5-7B (CLIP-L/14-336 + Vicuna-7B) chat."""

    def __init__(self, model_path: str, model_base: Optional[str] = None,
                 max_new_tokens: int = 1024, load_8bit: bool = False,
                 load_4bit: bool = False, kv_int8: bool = False,
                 lookup_decode: bool = False):
        import jax
        import numpy as np

        from transformers import AutoTokenizer

        from rlaifv_tpu.models.llava import LlavaForCausalLM
        from rlaifv_tpu.models.convert import (
            llava_config_from_hf,
            load_pretrained_llava,
        )

        # load_8bit / load_4bit: weight-only int8 / packed-int4 LLM
        # (QuantDense; the TPU answer to the reference loader's
        # bitsandbytes load_8bit/load_4bit pair, builder.py:30-49)
        llm_over = {}
        if load_4bit:
            llm_over.update(quantize=True, quantize_bits=4,
                            quantize_lm_head=False)
        elif load_8bit:
            llm_over["quantize"] = True
        if kv_int8:
            # int8 decode cache: ~1% decode-logit quantization error,
            # half the cache memory/bandwidth (prefill stays exact)
            llm_over["kv_cache_dtype"] = "int8"
        # RLAIFV_INT4_SMOOTH=1: activation-aware (AWQ-style) smoothing
        # before int4 quantization (models/quant_smooth.py) — plays the
        # robustness role bitsandbytes nf4's double quantization plays in
        # the reference loader. Calibrates on one short text forward.
        int4_smooth = (load_4bit
                       and os.environ.get("RLAIFV_INT4_SMOOTH") == "1")
        overrides = {"llm": llm_over} if llm_over else {}
        cfg = llava_config_from_hf(model_base or model_path, **overrides)
        self.cfg = cfg
        self.model = LlavaForCausalLM(cfg)
        # handles full / LoRA-over-base / projector-delta checkpoints
        # (ref llava/model/builder.py:26-167)
        params = load_pretrained_llava(
            model_path, model_base=model_base,
            vision_layers_to_run=cfg.vision.layers_to_run,
            quantize_llm=(False if int4_smooth
                          else "int4" if load_4bit else load_8bit),
        )

        try:
            # slow tokenizer preferred for llama tokenization parity
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_path, use_fast=False
            )
        except (ValueError, OSError):
            self.tokenizer = AutoTokenizer.from_pretrained(model_path)

        if int4_smooth:
            from rlaifv_tpu.models.llama import LlamaForCausalLM
            from rlaifv_tpu.models.quant_smooth import (
                quantize_llm_int4_smooth,
            )

            cfg_f = llava_config_from_hf(model_base or model_path)
            calib = self.tokenizer(
                "A chat between a curious human and an artificial "
                "intelligence assistant. The assistant gives helpful, "
                "detailed, and polite answers to the human's questions.",
                return_tensors="np",
            )["input_ids"].astype(np.int32)
            params = {**params, "llm": quantize_llm_int4_smooth(
                LlamaForCausalLM(cfg_f.llm), params["llm"], calib
            )}
        self.image_processor = ClipImageProcessor(image_size=cfg.vision.image_size)
        self.engine = DecodeEngine(
            self.model, params,
            eos_id=self.tokenizer.eos_token_id,
            pad_id=self.tokenizer.pad_token_id or 0,
        )
        self.max_new_tokens = max_new_tokens
        # prompt-lookup speculative greedy (genai/lookup_decode.py): a
        # SPEED mode — exact greedy tokens, fewer decode steps. The
        # reference default stays beam-3 (ref chat.py:169-178); lookup
        # needs the bf16-KV window path, so it excludes --kv-int8.
        if lookup_decode and kv_int8:
            raise ValueError("--lookup-decode needs the bf16 KV cache "
                             "(drop --kv-int8)")
        self.lookup_decode = lookup_decode
        self.mm_use_im_start_end = False
        self.image_newline = None
        if cfg.image_aspect_ratio == "anyres":
            from rlaifv_tpu.models.convert import load_image_newline

            self.image_newline = load_image_newline(model_path)
            self._encode_views = jax.jit(
                lambda p, v: self.model.apply(
                    {"params": p}, v, method=self.model.encode_images
                )
            )

    def chat(self, input: dict) -> str:
        question = input["question"]
        if self.mm_use_im_start_end:
            question = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                        + DEFAULT_IM_END_TOKEN + "\n" + question)
        else:
            question = DEFAULT_IMAGE_TOKEN + "\n" + question

        conv = conversation_lib.conv_templates["llava_v1"].copy()
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        ids = tokenizer_image_token(prompt, self.tokenizer)

        if self.cfg.image_aspect_ratio == "anyres":
            # LLaVA-1.6 path: ragged merged features ride the span splice
            # (ref llava_arch.py:158-205); B=1 keeps shapes static per call.
            from rlaifv_tpu.models.anyres import encode_anyres

            merged = encode_anyres(
                self.model, self.engine.params, self.image_processor,
                self.cfg, input["image"],
                image_newline=self.image_newline,
                encode_fn=self._encode_views,
            )
            T = merged.shape[0]
            ex = expand_image_sentinels(ids, None, T)
            result = self.engine.generate_beam(
                [ex["input_ids"].tolist()],
                span_features=merged[None, None],
                span_starts=[[int(ex["image_start"])]],
                num_beams=3,
                max_new_tokens=self.max_new_tokens,
            )
        else:
            ex = expand_image_sentinels(ids, None, self.cfg.num_image_tokens)
            # resize-only uint8, normalized on device (half the upload)
            image = self.image_processor.resize_uint8(
                decode_image(input["image"])
            )

            if self.lookup_decode:
                from rlaifv_tpu.genai.lookup_decode import lookup_generate

                res = lookup_generate(
                    self.engine, ex["input_ids"].tolist(),
                    images=image[None],
                    image_starts=[int(ex["image_start"])],
                    max_new_tokens=self.max_new_tokens,
                )
                return self.tokenizer.decode(
                    res.tokens, skip_special_tokens=True
                ).strip()

            # ref chat.py:169-178: do_sample=False, num_beams=3
            result = self.engine.generate_beam(
                [ex["input_ids"].tolist()],
                images=image[None],
                image_starts=[int(ex["image_start"])],
                num_beams=3,
                max_new_tokens=self.max_new_tokens,
            )
        out = result.tokens[0][: result.lengths[0]]
        return self.tokenizer.decode(out, skip_special_tokens=True).strip()


class RLAIFVChat:
    """Pick the model family by path substring (ref chat.py:221-228)."""

    def __init__(self, model_path: str, load_8bit: bool = False,
                 load_4bit: bool = False, kv_int8: bool = False,
                 lookup_decode: bool = False):
        if "12B" in model_path:
            from rlaifv_tpu.genai.omni_gen import OmniLMMChat  # noqa: F401

            # --load-8bit => the single-chip 12B config (int8 both towers
            # + int8 KV); --load-4bit halves the weights again; bf16 12B
            # needs a bigger device
            self.model = OmniLMMChat(model_path, int8=load_8bit,
                                     int4=load_4bit)
        elif "minicpm" in model_path.lower():
            # framework extension: the reference chat.py stops at 7B/12B;
            # MiniCPM-Llama3-V 2.5 rides the same API here
            from rlaifv_tpu.genai.minicpmv_gen import MiniCPMVChat

            self.model = MiniCPMVChat(model_path, int8=load_8bit,
                                      int4=load_4bit)
        else:
            base = None
            if "lora" in model_path.lower():
                # ref chat.py:228: LoRA checkpoints load over the llava base
                base = os.environ.get(
                    "RLAIFV_MODEL_BASE", "liuhaotian/llava-v1.5-7b"
                )
            self.model = RLAIFV7B(model_path, model_base=base,
                                  load_8bit=load_8bit, load_4bit=load_4bit,
                                  kv_int8=kv_int8,
                                  lookup_decode=lookup_decode)

    def chat(self, input: dict) -> str:
        return self.model.chat(input)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--image", default="./examples/test.jpeg")
    ap.add_argument("--question", default="Why did the car in the picture stop?")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 decode KV cache (half memory, ~1%% decode "
                         "quantization error)")
    ap.add_argument("--load-8bit", action="store_true",
                    help="weight-only int8 LLM (halves weight HBM)")
    ap.add_argument("--load-4bit", action="store_true",
                    help="weight-only packed int4 LLM, group-128 scales "
                         "(halves weight HBM again vs int8)")
    ap.add_argument("--lookup-decode", action="store_true",
                    help="7B only: exact-greedy prompt-lookup speculation "
                         "instead of beam-3 — same-quality class, fewer "
                         "decode steps (genai/lookup_decode.py)")
    args = ap.parse_args()

    chat_model = RLAIFVChat(args.model_path, load_8bit=args.load_8bit,
                            load_4bit=args.load_4bit, kv_int8=args.kv_int8,
                            lookup_decode=args.lookup_decode)
    print(chat_model.chat({"image": args.image, "question": args.question}))
