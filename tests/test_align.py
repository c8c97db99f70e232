"""Global alignment: native C++ vs the pinned Python replica."""
import numpy as np
import pytest

from poreover_tpu import native
from poreover_tpu.ops.nw import global_pair_banded_py, global_pair_py


def _random_pair(rng, n, mut=0.1):
    s = "".join(rng.choice(list("ACGT"), size=n))
    out = []
    for c in s:
        r = rng.random()
        if r < mut / 3:
            continue  # deletion
        if r < 2 * mut / 3:
            out.append(rng.choice(list("ACGT")))  # substitution
        elif r < mut:
            out.append(c)
            out.append(rng.choice(list("ACGT")))  # insertion
        else:
            out.append(c)
    return s, "".join(out)


def test_native_builds():
    assert native.load() is not None, "native library failed to build"


def test_dense_matches_python_replica():
    rng = np.random.default_rng(0)
    for n in (5, 20, 60):
        s1, s2 = _random_pair(rng, n)
        a_cpp = native.global_pair(s1, s2)
        a_py = global_pair_py(s1, s2)
        assert a_cpp == a_py


def test_banded_matches_python_replica():
    rng = np.random.default_rng(1)
    for n in (20, 80, 150):
        s1, s2 = _random_pair(rng, n)
        a_cpp = native.global_pair_banded(s1, s2, band_width=30)
        a_py = global_pair_banded_py(s1, s2, band_width=30)
        assert a_cpp == a_py


def test_identical_sequences_align_perfectly():
    s = "ACGTACGTAAGGTTCC" * 5
    a1, a2 = native.global_pair(s, s)
    assert a1 == s and a2 == s
    b1, b2 = native.global_pair_banded(s, s, band_width=10)
    assert b1 == s and b2 == s


def test_alignment_preserves_sequences():
    """Removing gaps recovers the originals (sanity across quirks)."""
    rng = np.random.default_rng(3)
    s1, s2 = _random_pair(rng, 120)
    a1, a2 = native.global_pair_banded(s1, s2, band_width=50)
    assert a1.replace("-", "") == s1
    assert a2.replace("-", "") == s2
    assert len(a1) == len(a2)
