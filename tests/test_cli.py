"""End-to-end CLI smoke tests on small synthetic reads."""
import json
import os

import numpy as np
import pytest

from poreover_tpu.cli import main


def _write_probs(path, rng, T=60):
    y = rng.random((T, 5)) + np.eye(5)[rng.integers(0, 5, T)] * 6
    y = y / y.sum(axis=1, keepdims=True)
    np.save(path, y.astype(np.float32))
    return y


def test_cli_decode_viterbi(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "r1.npy"
    _write_probs(p, rng)
    out = tmp_path / "out"
    main(["decode", str(p), "--basecaller", "poreover", "--out", str(out)])
    fasta = (tmp_path / "out.fasta").read_text()
    assert fasta.startswith(">r1")
    seq = "".join(fasta.split("\n")[1:]).strip()
    assert set(seq) <= set("ACGT")


def test_cli_decode_beam(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / "r1.npy"
    _write_probs(p, rng, T=40)
    out = tmp_path / "beam"
    main([
        "decode", str(p), "--basecaller", "poreover", "--algorithm", "beam",
        "--beam_width", "8", "--out", str(out),
    ])
    assert (tmp_path / "beam.fasta").exists()


def test_cli_pair_decode_two_files(tmp_path):
    rng = np.random.default_rng(2)
    # same underlying sequence, two noisy prob tables
    base = rng.integers(0, 4, 25)
    def noisy(seed):
        r = np.random.default_rng(seed)
        T = 50
        y = r.random((T, 5)) * 0.25
        pos = np.linspace(0, T - 1, len(base)).astype(int)
        for i, b in zip(pos, base):
            y[i, b] += 5.0
        y[:, 4] += 1.5
        for i, b in zip(pos, base):
            y[i, 4] = 0.05
        return (y / y.sum(axis=1, keepdims=True)).astype(np.float32)

    p1 = tmp_path / "a.npy"
    p2 = tmp_path / "b.npy"
    np.save(p1, noisy(3))
    np.save(p2, noisy(4))
    out = tmp_path / "pair"
    main([
        "pair-decode", str(p1), str(p2), "--basecaller", "poreover",
        "--out", str(out), "--padding", "10",
    ])
    fasta = (tmp_path / "pair.fasta").read_text()
    assert fasta.startswith(">consensus")
    seq = "".join(fasta.split("\n")[1:]).strip()
    assert len(seq) > 5


def test_cli_pairs_file(tmp_path):
    rng = np.random.default_rng(5)
    p1 = tmp_path / "x.npy"
    p2 = tmp_path / "y.npy"
    _write_probs(p1, rng, T=40)
    np.save(p2, np.load(p1))  # identical pair
    pairs = tmp_path / "pairs.txt"
    pairs.write_text(f"{p1.name}\t{p2.name}\n")
    out = tmp_path / "o"
    main([
        "pair-decode", str(pairs), "--basecaller", "poreover",
        "--dir", str(tmp_path), "--out", str(out), "--padding", "10",
    ])
    assert (tmp_path / "o.1d.fasta").exists()
    assert (tmp_path / "o.2d.fasta").exists()
    log = (tmp_path / "o.log").read_text()
    assert "read1" in log
