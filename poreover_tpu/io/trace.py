"""Loaders for basecaller probability traces.

Behavioral contract mirrors the reference's loaders
(poreover/decoding/decode.py:29-112):

- ``.npy`` files hold either softmax probabilities or raw logits. If the
  first row sums to ~1 they are treated as probabilities (log is taken),
  otherwise they are normalized to log-likelihoods via logsumexp.
- Bonito ``.npy`` traces store the blank in column 0; we reorder columns to
  blank-last [1,2,3,4,0] (reference decode.py:79).
- Flappie ``.hdf5``: first read group's ``trace`` dataset, uint8 counts in
  [0,255], scaled ``log((t+eps)/(255+eps))`` (reference decode.py:89-94).
- Guppy ``.fast5``: dataset ``/Analyses/Basecall_1D_000/BaseCalled_template/
  Trace``, same uint8 scaling (reference decode.py:97-102).
- ``.csv``: header row skipped; 5 columns -> poreover CTC model, 8 columns
  -> flip-flop model (reference decode.py:83-88).
"""
from __future__ import annotations

import os

import numpy as np

from ..models import transducer


def softmax(logits: np.ndarray) -> np.ndarray:
    x = logits - np.max(logits, axis=-1, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=-1, keepdims=True)


def logit_to_log_likelihood(logits: np.ndarray) -> np.ndarray:
    """Normalize raw logits into valid log-likelihoods along the last axis."""
    m = np.max(logits, axis=-1, keepdims=True)
    lse = m + np.log(np.sum(np.exp(logits - m), axis=-1, keepdims=True))
    return logits - lse


def load_logits(file_path: str, flatten: bool = False) -> np.ndarray:
    arr = np.load(file_path)
    if np.isclose(np.sum(arr[0]), 1):
        arr = np.log(arr)
    else:
        arr = logit_to_log_likelihood(arr)
    if flatten and arr.ndim > 2:
        arr = np.concatenate(arr)
    return arr


def trace_from_flappie(path: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as hdf:
        read_id = list(hdf)[0]
        return np.array(hdf[read_id]["trace"])


def trace_from_guppy(path: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as hdf:
        return np.array(hdf["/Analyses/Basecall_1D_000/BaseCalled_template/Trace"])


_UINT8_EPS = 0.0000001


def _scale_uint8_trace(trace: np.ndarray) -> np.ndarray:
    return np.log((trace + _UINT8_EPS) / (255 + _UINT8_EPS))


def model_from_trace(path: str, basecaller: str = ""):
    """Load a probability trace and wrap it in the right transducer model."""
    _, ext = os.path.splitext(str(path))
    if ext == ".npy" and basecaller == "poreover":
        return transducer.poreover(load_logits(path, flatten=True))
    if ext == ".npy" and basecaller == "bonito":
        trace = load_logits(path, flatten=True)
        return transducer.bonito(trace[:, [1, 2, 3, 4, 0]])
    if ext == ".csv":
        trace = np.log(np.loadtxt(path, delimiter=",", skiprows=1))
        if trace.shape[1] == 5:
            return transducer.poreover(trace)
        if trace.shape[1] == 8:
            return transducer.flipflop(trace)
        raise ValueError(f"CSV trace with {trace.shape[1]} columns not recognized")
    if ext == ".hdf5" or basecaller == "flappie":
        return transducer.flipflop(_scale_uint8_trace(trace_from_flappie(path)))
    if ext == ".fast5" or basecaller == "guppy":
        return transducer.flipflop(_scale_uint8_trace(trace_from_guppy(path)))
    raise ValueError(
        "Could not load trace probabilities from {!r}; specify the producing "
        "basecaller with --basecaller [poreover/guppy/flappie/bonito]".format(path)
    )
