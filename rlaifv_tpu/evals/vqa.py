"""Benchmark answer generation (E1).

Rebuild of ref muffin/eval/muffin_vqa.py:31-114 (llava15_chair.py is
byte-identical there — one implementation here): read a benchmark jsonl of
{question_id, image(b64)|image_path, question}, batch-generate greedy
answers, write {question_id, prompt, text, model_id, metadata} rows,
supporting --num-chunks/--chunk-idx slicing.
"""
from __future__ import annotations

import argparse
from typing import List

import numpy as np

from rlaifv_tpu.data.datasets import chunk_indices
from rlaifv_tpu.genai.llava_gen import Llava15Generator
from rlaifv_tpu.utils.file_io import read_jsonlines, write_jsonlines


def generate_answers(
    generator: Llava15Generator,
    rows: List[dict],
    *,
    max_new_tokens: int = 1024,
    batch_size: int = 8,
    num_chunks: int = 1,
    chunk_idx: int = 0,
    model_id: str = "",
    num_beams: int = 1,  # eval scripts use 3 (ref eval_rlaifv_objhal.sh)
) -> List[dict]:
    idx = chunk_indices(len(rows), num_chunks, chunk_idx)
    rows = [rows[i] for i in idx]

    out = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        items = [
            {
                "question": r["question"] if "question" in r else r["text"],
                "question_id": r.get("question_id", r.get("id")),
                "image": r.get("image"),
                "image_bytes": r.get("image_bytes"),
                "metainfos": r.get("metainfos", {}),
            }
            for r in chunk
        ]
        answers = generator.greedy_gen(
            items, max_new_tokens=max_new_tokens, batch_size=batch_size,
            num_beams=num_beams,
        )
        for r, a in zip(chunk, answers):
            out.append({
                "question_id": a["question_id"],
                "prompt": a["raw_question"],
                "text": a["answer"],
                "model_id": model_id,
                "metadata": r.get("metainfos", {}),
            })
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--question-file", required=True)
    ap.add_argument("--answers-file", required=True)
    ap.add_argument("--num-chunks", type=int, default=1)
    ap.add_argument("--chunk-idx", type=int, default=0)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    # ref muffin/eval/muffin_vqa.py --num_beams 3 via eval_rlaifv_objhal.sh
    ap.add_argument("--num-beams", type=int, default=3)
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from rlaifv_tpu.models.convert import (
        llava_config_from_hf,
        load_llava_checkpoint,
    )
    from rlaifv_tpu.models.llava import LlavaForCausalLM

    cfg = llava_config_from_hf(args.model_path)
    model = LlavaForCausalLM(cfg)
    params = load_llava_checkpoint(
        args.model_path, vision_layers_to_run=cfg.vision.layers_to_run
    )
    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False)
    gen = Llava15Generator(model, params, tokenizer, cfg.num_image_tokens,
                           checkpoint_name=args.model_path)
    rows = read_jsonlines(args.question_file)
    out = generate_answers(
        gen, rows, max_new_tokens=args.max_new_tokens,
        num_chunks=args.num_chunks, chunk_idx=args.chunk_idx,
        model_id=args.model_path.split("/")[-1],
        num_beams=args.num_beams,
    )
    write_jsonlines(args.answers_file, out)


if __name__ == "__main__":
    main()
