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


def _noisy_pair(tmp_path, seed=2, T=50, nbase=25):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, nbase)

    def noisy(s):
        r = np.random.default_rng(s)
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
    np.save(p1, noisy(seed + 1))
    np.save(p2, noisy(seed + 2))
    return p1, p2


def test_cli_pair_decode_method_split(tmp_path):
    """Deprecated --method split: diagonal boxes, no 1D stage
    (reference pair_decode.py:337-354)."""
    p1, p2 = _noisy_pair(tmp_path, seed=6)
    out = tmp_path / "split"
    main([
        "pair-decode", str(p1), str(p2), "--basecaller", "poreover",
        "--method", "split", "--window", "20", "--out", str(out),
    ])
    fasta = (tmp_path / "split.fasta").read_text()
    assert fasta.startswith(">consensus;split")
    seq = "".join(fasta.split("\n")[1:]).strip()
    assert set(seq) <= set("ACGT") and len(seq) > 5


def test_cli_pair_decode_method_align(tmp_path):
    """Deprecated --method align: anchor boxes decoded densely
    (reference pair_decode.py:470-479)."""
    # two reads from the same base sequence with interior substitutions in
    # read 2: match runs must END inside the alignment to become anchors
    # (get_anchors never flushes the trailing run — reference quirk,
    # pair_decode.py:53-89)
    rng = np.random.default_rng(9)
    base = rng.integers(0, 4, 30)
    base2 = base.copy()
    base2[8] = (base2[8] + 1) % 4
    base2[20] = (base2[20] + 2) % 4
    base2[27] = (base2[27] + 1) % 4

    def encode(b, path, T=60):
        y = np.full((T, 5), 0.02)
        pos = np.linspace(0, T - 1, len(b)).astype(int)
        y[:, 4] = 2.0
        for i, c in zip(pos, b):
            y[i, :] = 0.02
            y[i, c] = 5.0
        np.save(path, (y / y.sum(axis=1, keepdims=True)).astype(np.float32))

    p1 = tmp_path / "a.npy"
    p2 = tmp_path / "b.npy"
    encode(base, p1)
    encode(base2, p2)
    out = tmp_path / "alignm"
    main([
        "pair-decode", str(p1), str(p2), "--basecaller", "poreover",
        "--method", "align", "--skip_threshold", "3", "--out", str(out),
    ])
    fasta = (tmp_path / "alignm.fasta").read_text()
    assert fasta.startswith(">consensus")
    seq = "".join(fasta.split("\n")[1:]).strip()
    assert set(seq) <= set("ACGT") and len(seq) > 5


def test_cli_pair_decode_debug_pickle(tmp_path, monkeypatch):
    """--debug drops debug.p with alignment intermediates
    (reference pair_decode.py:482-490)."""
    import pickle

    monkeypatch.chdir(tmp_path)
    p1, p2 = _noisy_pair(tmp_path, seed=12)
    out = tmp_path / "dbg"
    main([
        "pair-decode", str(p1), str(p2), "--basecaller", "poreover",
        "--debug", "--out", str(out),
    ])
    with open(tmp_path / "debug.p", "rb") as f:
        blob = pickle.load(f)
    assert {"alignment", "sequence_to_signal1", "sequence_to_signal2"} <= set(blob)


def test_cli_pairs_file_batched(tmp_path):
    """--threads N on a pairs file routes stage 4 through the batched
    Pallas kernel in lockstep waves; output must match sequential."""
    import filecmp

    pairs_lines = []
    for s in (20, 30):
        p1, p2 = _noisy_pair(tmp_path, seed=s)
        q1 = tmp_path / f"r{s}_1.npy"
        q2 = tmp_path / f"r{s}_2.npy"
        os.rename(p1, q1)
        os.rename(p2, q2)
        pairs_lines.append(f"{q1.name} {q2.name}")
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("\n".join(pairs_lines) + "\n")

    main([
        "pair-decode", str(pairs), "--basecaller", "poreover",
        "--dir", str(tmp_path), "--out", str(tmp_path / "seq"),
        "--padding", "10",
    ])
    main([
        "pair-decode", str(pairs), "--basecaller", "poreover",
        "--dir", str(tmp_path), "--out", str(tmp_path / "bat"),
        "--padding", "10", "--threads", "2",
    ])
    assert filecmp.cmp(tmp_path / "seq.2d.fasta", tmp_path / "bat.2d.fasta",
                       shallow=False)
    assert filecmp.cmp(tmp_path / "seq.1d.fasta", tmp_path / "bat.1d.fasta",
                       shallow=False)


def test_cli_pairs_file_fault_isolation(tmp_path):
    """A corrupt trace in a pairs file yields a skipped log row; the other
    pairs still decode, in input order, with or without batching (the
    reference's Pool isolates worker crashes — we must not do worse)."""
    pairs_lines = []
    for s in (20, 30):
        p1, p2 = _noisy_pair(tmp_path, seed=s)
        q1 = tmp_path / f"r{s}_1.npy"
        q2 = tmp_path / f"r{s}_2.npy"
        os.rename(p1, q1)
        os.rename(p2, q2)
        pairs_lines.append(f"{q1.name} {q2.name}")
    # corrupt pair spliced into the middle
    np.save(tmp_path / "bad.npy", np.zeros((2, 2, 2)))
    pairs_lines.insert(1, "bad.npy bad.npy")
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("\n".join(pairs_lines) + "\n")

    for name, extra in (("seq", []), ("bat", ["--threads", "2"])):
        main([
            "pair-decode", str(pairs), "--basecaller", "poreover",
            "--dir", str(tmp_path), "--out", str(tmp_path / name),
            "--padding", "10", *extra,
        ])
        log_rows = [
            l.split("\t") for l in (tmp_path / f"{name}.log").read_text().splitlines()
            if l and not l.startswith("#")
        ]
        assert len(log_rows) == 3
        assert log_rows[1][0] == "bad.npy" and log_rows[1][-1] == "1"
        fasta = (tmp_path / f"{name}.2d.fasta").read_text()
        assert fasta.count(">") == 2

    import filecmp

    for suffix in (".2d.fasta", ".1d.fasta", ".log"):
        a, b = tmp_path / f"seq{suffix}", tmp_path / f"bat{suffix}"
        if suffix == ".log":
            # strip the arg-dump header line (threads differ by design)
            strip = lambda p: "\n".join(
                l for l in p.read_text().splitlines() if not l.startswith("# {")
            )
            assert strip(a) == strip(b)
        else:
            assert filecmp.cmp(a, b, shallow=False)
