"""Batched 1D decoding == per-read decoding.

The TPU build replaces the reference's per-read multiprocessing.Pool
(decode.py:158-162) with length-bucketed vmapped kernel launches; these
tests pin the batch paths to the sequential ones on mixed-length reads.
"""
import numpy as np
import pytest

from poreover_tpu.models import transducer
from poreover_tpu.ops.beam import beam_search, beam_search_batch
from poreover_tpu.ops.viterbi import (
    viterbi_path_masked,
    viterbi_path_masked_batch,
)


def _random_softmax(T, S, seed):
    rng = np.random.default_rng(seed)
    y = rng.dirichlet(np.ones(S), size=T)
    return np.log(y)


@pytest.mark.parametrize("model,S", [("ctc", 5), ("ctc_merge_repeats", 5),
                                     ("ctc_flipflop", 8)])
def test_beam_batch_matches_single(model, S):
    ys = [_random_softmax(T, S, seed) for seed, T in enumerate([23, 40, 17, 40])]
    batch = beam_search_batch(ys, beam_width=8, model=model)
    single = [beam_search(y, beam_width=8, model=model) for y in ys]
    assert batch == single


def test_viterbi_masked_batch_matches_single():
    mask = transducer.flipflop_transition_mask()
    ys = [_random_softmax(T, 8, 100 + seed) for seed, T in enumerate([31, 12, 45])]
    batch = viterbi_path_masked_batch([y.astype(np.float32) for y in ys], mask)
    for y, p in zip(ys, batch):
        ref = np.asarray(viterbi_path_masked(y.astype(np.float32), mask))
        np.testing.assert_array_equal(np.asarray(p), ref)


def test_decode_driver_batched(tmp_path):
    """decode() with >1 npy reads produces the same FASTA as per-read calls,
    and a corrupt read is skipped instead of aborting the run."""
    from types import SimpleNamespace

    from poreover_tpu.decoding.decode import decode, decode_read
    from poreover_tpu.io.trace import model_from_trace

    rng = np.random.default_rng(0)
    names = []
    for i, T in enumerate([30, 44, 30]):
        y = rng.dirichlet(np.ones(5), size=T)
        np.save(tmp_path / f"r{i}.npy", y)
        names.append(f"r{i}")
    # a corrupt trace: wrong ndim
    np.save(tmp_path / "bad.npy", np.zeros((3, 3, 3)))

    args = SimpleNamespace(
        **{"in": [str(tmp_path)]},
        basecaller="poreover",
        algorithm="beam",
        beam_width=6,
        window=400,
        out=str(tmp_path / "out"),
        threads=2,
    )
    decode(args)
    fasta = (tmp_path / "out.fasta").read_text()
    records = {}
    name = None
    for line in fasta.splitlines():
        if line.startswith(">"):
            name = line[1:]
            records[name] = ""
        elif name is not None:
            records[name] += line
    assert set(records) == set(names)  # bad.npy skipped, rest decoded
    for name in names:
        m = model_from_trace(str(tmp_path / f"{name}.npy"), "poreover")
        assert records[name] == decode_read(m, "beam", beam_width=6)
