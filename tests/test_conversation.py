"""Byte-parity of conversation prompt rendering vs the reference templates."""
import pytest

from rlaifv_tpu.data import conversation as conv_mod
from tests.util_ref import load_ref_module, ref_available

pytestmark = pytest.mark.skipif(not ref_available(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_conv():
    return load_ref_module("llava/conversation.py", "ref_conversation")


ROUNDS = [
    [("q", "What is in the image?"), ("a", "A cat sitting on a mat.")],
    [
        ("q", "<image>\nDescribe the image."),
        ("a", "A busy street."),
        ("q", "Any cars?"),
        ("a", "Yes, two red cars."),
    ],
    [("q", "Hello"), ("a", None)],  # generation prompt: empty assistant slot
]


@pytest.mark.parametrize(
    # "plain" is excluded: its sep2 is None and the reference itself can only
    # render it through the pretrain path, never via get_prompt on >1 round.
    "name", ["v0", "v1", "vicuna_v1", "llava_v0", "llava_v1", "llama_2", "mpt"]
)
@pytest.mark.parametrize("rounds_idx", range(len(ROUNDS)))
def test_prompt_parity(ref_conv, name, rounds_idx):
    rounds = ROUNDS[rounds_idx]
    ours = conv_mod.conv_templates[name].copy()
    theirs = ref_conv.conv_templates[name].copy()
    for i, (_, text) in enumerate(rounds):
        ours.append_message(ours.roles[i % 2], text)
        theirs.append_message(theirs.roles[i % 2], text)
    assert ours.get_prompt() == theirs.get_prompt()


def test_default_is_llava_v1_style():
    # muffin/conversation.py:373 makes llava_v1 the training-time default
    assert conv_mod.default_conversation.roles == ("USER", "ASSISTANT")
    assert conv_mod.default_conversation.sep2 == "</s>"
    assert conv_mod.default_conversation.sep_style == conv_mod.SeparatorStyle.TWO
