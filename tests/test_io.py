"""Trace loader behavior vs the reference contract (decode.py:29-112)."""
import numpy as np
import pytest

from poreover_tpu.io import trace as trace_io
from poreover_tpu.utils.fasta import fasta_format

REF_DATA = "/root/reference/data"


def test_load_logits_probs_vs_logits(tmp_path):
    rng = np.random.default_rng(0)
    probs = rng.random((10, 5))
    probs = probs / probs.sum(axis=1, keepdims=True)
    p = tmp_path / "probs.npy"
    np.save(p, probs)
    out = trace_io.load_logits(str(p))
    assert np.allclose(out, np.log(probs))

    logits = rng.normal(size=(10, 5)) * 3
    p2 = tmp_path / "logits.npy"
    np.save(p2, logits)
    out2 = trace_io.load_logits(str(p2))
    assert np.allclose(np.exp(out2).sum(axis=1), 1.0)


def test_load_logits_flatten(tmp_path):
    rng = np.random.default_rng(1)
    probs = rng.random((3, 7, 5))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    p = tmp_path / "windows.npy"
    np.save(p, probs)
    flat = trace_io.load_logits(str(p), flatten=True)
    assert flat.shape == (21, 5)


def test_model_from_reference_npy():
    model = trace_io.model_from_trace(REF_DATA + "/reads/read1.npy", "poreover")
    assert model.kind == "poreover"
    assert model.log_prob.shape[1] == 5
    # valid (log-)distributions per timestep
    assert np.allclose(np.exp(model.log_prob).sum(axis=1), 1.0, atol=1e-4)


def test_model_from_reference_flappie_trace():
    model = trace_io.model_from_trace(REF_DATA + "/flappie_trace.hdf5")
    assert model.kind == "flipflop"
    assert model.log_prob.shape[1] == 8
    assert np.all(model.log_prob <= 0)


def test_model_from_reference_guppy_fast5():
    model = trace_io.model_from_trace(REF_DATA + "/guppy_flipflop.fast5")
    assert model.kind == "flipflop"
    assert model.log_prob.shape[1] == 8


def test_model_from_csv():
    model = trace_io.model_from_trace("/root/reference/tests/poreover.csv")
    assert model.kind == "poreover"
    assert model.log_prob.shape == (500, 5)


def test_fasta_format_wraps_at_60():
    seq = "A" * 130
    out = fasta_format("read", seq)
    lines = out.split("\n")
    assert lines[0] == ">read"
    assert [len(l) for l in lines[1:-1]] == [60, 60, 10]
    assert out.endswith("\n")
