"""Accuracy benchmark subcommand with the built-in seeded aligner."""
import numpy as np
import pytest

from poreover_tpu.benchmark import (
    KmerIndex,
    align_to_reference,
    alignment_stats,
    benchmark_sequence_file,
    read_fastx,
    revcomp,
)


@pytest.fixture
def genome(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    path = tmp_path / "ref.fasta"
    path.write_text(">chr1\n" + "\n".join(seq[i:i+70] for i in range(0, len(seq), 70)) + "\n")
    return str(path), seq


def _mutate(rng, s, rate=0.05):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice(list("ACGT")))
        elif r < rate:
            out.append(c)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


def test_read_fastx(tmp_path, genome):
    path, seq = genome
    recs = read_fastx(path)
    assert len(recs) == 1
    assert recs[0][0] == "chr1"
    assert recs[0][1] == seq


def test_align_perfect_read(genome):
    path, seq = genome
    idx = KmerIndex(path)
    query = seq[1000:2000]
    res = align_to_reference(idx, query)
    assert res is not None
    a_q, a_r, contig, strand = res
    stats = alignment_stats(a_q, a_r)
    assert stats["identity"] == 1.0
    assert strand == 1


def test_align_reverse_strand(genome):
    path, seq = genome
    idx = KmerIndex(path)
    query = revcomp(seq[2000:3000])
    res = align_to_reference(idx, query)
    assert res is not None
    stats = alignment_stats(res[0], res[1])
    assert stats["identity"] == 1.0
    assert res[3] == -1


def test_benchmark_noisy_reads(tmp_path, genome):
    path, seq = genome
    rng = np.random.default_rng(1)
    reads = []
    for i in range(4):
        start = rng.integers(0, 3000)
        reads.append((f"r{i}", _mutate(rng, seq[start:start + 1200])))
    fasta = tmp_path / "reads.fasta"
    fasta.write_text("".join(f">{n}\n{s}\n" for n, s in reads))
    idx = KmerIndex(path)
    rows, extras = benchmark_sequence_file(str(fasta), idx, full=True)
    assert all(r["mapped"] for r in rows)
    ids = [r["identity"] for r in rows]
    assert all(0.85 < x <= 1.0 for x in ids), ids
    assert all("homopolymer_columns" in r for r in rows)
    # error-position histograms accumulated (mutated reads must show errors)
    hist = extras["error_positions"]
    assert set(hist) == {"insertion", "deletion", "mismatch"}
    assert sum(h.sum() for h in hist.values()) > 0
    assert all(h.shape == (200,) for h in hist.values())
