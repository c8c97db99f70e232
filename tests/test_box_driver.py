"""Anchored (--skip_matches) driver path: the batched box consensus
(every pair's anchor boxes pooled into lockstep kernel lanes) must produce
byte-identical output to the sequential per-box path.

Runs on the CPU XLA engine (tiny synthetic pairs); the TPU Pallas engine is
covered by tests/test_pallas.py equivalence with the same XLA engine.
"""
import os
from types import SimpleNamespace

import numpy as np

_REVCOMP_CTC = [3, 2, 1, 0, 4]


def _make_pairs(workdir: str, n_pairs: int = 2, T: int = 90) -> None:
    """Reads whose basecalls agree in runs with scattered mismatches, so
    get_anchors finds match anchors and leaves boxes between them."""
    rng = np.random.default_rng(5)
    lines = []
    for i in range(n_pairs):
        seq = rng.integers(0, 4, size=T // 3)
        y = np.full((T, 5), 0.02, np.float32)
        for t in range(T):
            if t % 3 == 2:
                y[t, 4] = 0.92  # blank
            else:
                y[t, seq[t // 3]] = 0.92
        y /= y.sum(1, keepdims=True)
        y2 = y.copy()
        for t in (12, 13, 45, 46, 72):
            y2[t] = np.roll(y2[t], 1)  # perturb a few emissions
            y2[t] /= y2[t].sum()
        np.save(f"{workdir}/b{i}_1.npy", y)
        np.save(f"{workdir}/b{i}_2.npy", y2[::-1][:, _REVCOMP_CTC])
        lines.append(f"b{i}_1.npy b{i}_2.npy")
    with open(f"{workdir}/pairs.txt", "w") as f:
        f.write("\n".join(lines) + "\n")


def _args(workdir: str, out: str, threads: int):
    return SimpleNamespace(
        **{"in": [f"{workdir}/pairs.txt"]},
        dir=workdir, out=out, basecaller="poreover",
        reverse_complement=True, threads=threads, method="envelope",
        single="viterbi", logging="info", profile=None, debug=False,
        algorithm="beam", alignment="banded", beam_width=3,
        debug_envelope=False, diagonal_envelope=False, diagonal_width=50,
        padding=5, skip_matches=True, skip_threshold=3,
        beam_search_method="row_col", window=200,
    )


def test_batched_boxes_match_sequential(tmp_path):
    from poreover_tpu.decoding.pair import pair_decode

    workdir = str(tmp_path)
    _make_pairs(workdir)

    pair_decode(_args(workdir, f"{workdir}/seq", threads=1))
    pair_decode(_args(workdir, f"{workdir}/bat", threads=4))

    for suffix in (".1d.fasta", ".2d.fasta"):
        with open(f"{workdir}/seq{suffix}") as f:
            want = f.read()
        with open(f"{workdir}/bat{suffix}") as f:
            got = f.read()
        assert got == want, f"{suffix}: batched boxes diverge from sequential"
    with open(f"{workdir}/bat.2d.fasta") as f:
        body = f.read()
    assert body.count(">") == 2 and "consensus" in body
    # sanity: the anchored mode actually produced non-trivial consensi
    seqs = [line for line in body.splitlines()
            if line and not line.startswith(">")]
    assert all(len(s) > 0 for s in seqs)
