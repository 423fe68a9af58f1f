"""Parity test of our diff-span logic vs the reference utils/diff_lib.py."""
import numpy as np
import pytest

from rlaifv_tpu.data.diff_lib import get_diff_ids
from tests.util_ref import load_ref_module, ref_available

pytestmark = pytest.mark.skipif(not ref_available(), reason="reference absent")


@pytest.fixture(scope="module")
def ref_diff():
    return load_ref_module("utils/diff_lib.py", "ref_diff_lib")


CASES = [
    ([1, 2, 3, 4, 5], [1, 2, 3, 4, 5]),
    ([1, 2, 3, 4, 5, 6, 7], [1, 2, 3, 9, 9, 5, 6, 7]),
    ([1, 2, 3], [4, 5, 6]),
    ([], [1, 2, 3]),
    ([1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6, 7, 8]),  # pure insert at end
    ([7, 8, 1, 2, 3, 4], [1, 2, 3, 4]),  # pure delete at start
    ([1, 1, 2, 2, 3, 3, 4, 4], [1, 1, 9, 9, 3, 3, 8, 8]),
]


@pytest.mark.parametrize("a,b", CASES)
def test_get_diff_ids_matches_reference(ref_diff, a, b):
    ours = get_diff_ids(a, b, min_match_size=3)
    theirs = ref_diff.get_diff_ids(a, b, min_match_size=3)
    assert ours[0] == list(theirs[0])
    assert ours[1] == list(theirs[1])


def test_get_diff_ids_random(ref_diff):
    rng = np.random.default_rng(0)
    for _ in range(50):
        n, m = rng.integers(1, 60, size=2)
        a = rng.integers(0, 10, size=n).tolist()
        b = rng.integers(0, 10, size=m).tolist()
        for mms in (1, 3, 5):
            assert get_diff_ids(a, b, mms) == tuple(
                list(x) for x in ref_diff.get_diff_ids(a, b, mms)
            )
