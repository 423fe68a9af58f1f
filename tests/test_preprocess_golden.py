"""preprocess_v1 masking with a realistic BPE tokenizer (built offline).

The fake char tokenizer checks arithmetic self-consistency; this builds an
actual Metaspace-BPE via the `tokenizers` library (same family as llama's
sentencepiece behavior) and asserts the semantic contract on supervised
positions: exactly the assistant responses (+ sep2) are supervised, for
single- and multi-round conversations, with and without the image sentinel.
"""
import numpy as np
import pytest

from rlaifv_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.preprocess import preprocess_v1


@pytest.fixture(scope="module")
def bpe_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions.",
        "USER: ASSISTANT: What is shown in the image?",
        "There is a small red car parked near the road.",
        "A dog is running on green grass beside a tree.",
        "Yes, the picture shows two cats and a ball.",
        "Why did the car stop? Because the light turned red.",
    ] * 20

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    # full printable alphabet: like llama's byte fallback, no token may
    # collapse to <unk> (pad==unk would corrupt total_len accounting)
    import string

    trainer = trainers.BpeTrainer(
        vocab_size=600, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=list(string.printable) + ["▁"],
    )
    tok.train_from_iterator(corpus, trainer)

    from tokenizers.processors import TemplateProcessing

    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<unk>",
    )
    fast.model_max_length = 2048
    fast.legacy = True  # metaspace BPE keeps the legacy boundary behavior
    return fast


def _supervised_text(tokenizer, ids, labels):
    sup = [int(i) for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    return tokenizer.decode(sup)


@pytest.mark.parametrize("has_image", [False, True])
def test_single_round_masks_only_response(bpe_tokenizer, has_image):
    q = ("<image>\nWhat is shown in the image?" if has_image
         else "What is shown in the image?")
    source = [
        {"from": "human", "value": q},
        {"from": "gpt", "value": "There is a small red car parked near the road."},
    ]
    out = preprocess_v1([source], bpe_tokenizer, has_image=has_image)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (labels != IGNORE_INDEX).sum() > 0, "nothing supervised"

    sup = _supervised_text(bpe_tokenizer, ids, labels)
    assert "small red car" in sup
    assert "What is shown" not in sup
    assert "curious human" not in sup  # system prompt masked
    if has_image:
        assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
        # sentinel is never supervised
        assert all(l == IGNORE_INDEX for i, l in zip(ids, labels)
                   if i == IMAGE_TOKEN_INDEX)


def test_multi_round_masks_each_instruction(bpe_tokenizer):
    source = [
        {"from": "human", "value": "Why did the car stop?"},
        {"from": "gpt", "value": "Because the light turned red."},
        {"from": "human", "value": "What is shown in the image?"},
        {"from": "gpt", "value": "A dog is running on green grass."},
    ]
    out = preprocess_v1([source], bpe_tokenizer, has_image=False)
    ids, labels = out["input_ids"][0], out["labels"][0]
    sup = _supervised_text(bpe_tokenizer, ids, labels)
    assert "light turned red" in sup
    assert "green grass" in sup
    assert "Why did the car stop" not in sup
    assert "What is shown" not in sup


def test_no_tokenization_mismatch_warning(bpe_tokenizer, capsys):
    source = [
        {"from": "human", "value": "What is shown in the image?"},
        {"from": "gpt", "value": "Yes, the picture shows two cats."},
    ]
    preprocess_v1([source], bpe_tokenizer, has_image=False)
    captured = capsys.readouterr()
    assert "tokenization mismatch" not in captured.out
