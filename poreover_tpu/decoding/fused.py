"""Fused basecall+decode: raw signal in, sequence out, one device program.

The reference architecturally separates basecalling (network.py:181-298:
fast5 -> softmax probs -> .npy on disk) from decoding (decode.py:41-51:
.npy -> sequence), so every read's [T, 5] probability matrix crosses the
host/device boundary twice. On TPU the network forward and the viterbi
argmax fuse into ONE jitted program: only the [T] float32 signal ships to
the device (5x fewer bytes than the probs) and only the [T] int8 argmax
path returns (20x fewer). On the dev chip's tunneled link this is the
difference between transfer-bound and compute-bound end-to-end decode;
on production PCIe it removes a disk round-trip and host staging.

Semantics: per-step argmax of the network logits == argmax of the saved
softmax probs (softmax is monotone per row), so the FASTA equals the
unfused call -> decode pipeline byte-for-byte (gated in bench.py).
"""
from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("poreover_tpu")


def make_fused_viterbi(model, params, window: int = 1000):
    """Returns fn(signal_windows [NB, 128, window, 1]) -> int8 argmax
    paths [NB*128*window], all on device.

    The per-step argmax IS the poreover-kind viterbi path
    (models/transducer.py:110-114), so no separate decode kernel runs —
    the network output feeds the reduction without leaving the chip.
    """

    @jax.jit
    def run(sig):
        nb, b, w, _ = sig.shape
        logits = model.apply({"params": params}, sig.reshape(nb * b, w, 1))
        return jnp.argmax(logits, axis=-1).astype(jnp.int8).reshape(-1)

    return run


def fused_basecall_viterbi(run, signal: np.ndarray, window: int = 1000,
                           alphabet: str = "ACGT") -> str:
    """signal [T] float32 -> sequence, via one fused device call."""
    from ..io.fast5 import batch_input

    batches, last_index = batch_input(signal, window_size=window)
    path = np.asarray(run(jnp.asarray(batches, jnp.float32)))
    T = (len(batches) - 1) * 128 * window + (
        last_index if last_index else 128 * window)
    path = path[:T]
    A = len(alphabet)
    return "".join(alphabet[c] for c in path if c < A)


def call_and_decode(args) -> None:
    """CLI: ``call --decode viterbi`` — fast5 signal -> FASTA in one
    device program per batch (plus the .npy probs only if requested)."""
    import glob
    import os

    from ..io.fast5 import parse_fast5
    from ..utils.fasta import fasta_format

    from ..network.call import (
        _is_tf_bundle, _model_from_args, latest_checkpoint, load_params,
    )

    model = _model_from_args(args)
    weights = args.weights
    if weights is None:
        weights = "/root/reference/data/model/checkpoint-124"
    elif os.path.isdir(weights) and latest_checkpoint(weights):
        weights = latest_checkpoint(weights)
    if _is_tf_bundle(weights):
        from ..io.tf_checkpoint import load_keras_conv1_bigru3

        params = jax.tree.map(jnp.asarray, load_keras_conv1_bigru3(weights))
    else:
        params = load_params(weights)

    run = make_fused_viterbi(model, params, window=args.window)

    in_path = getattr(args, "in")
    if os.path.isdir(in_path):
        files = sorted(glob.glob(os.path.join(in_path, "*.fast5")))
    else:
        files = [in_path]

    out_path = (args.out or "fused") + ".fasta"
    n = 0
    with open(out_path, "w") as out_f:
        for f in files:
            try:
                _, signal = parse_fast5(f, scaling=args.scaling)
                seq = fused_basecall_viterbi(run, signal,
                                             window=args.window)
                print(fasta_format(Path(f).stem, seq), file=out_f)
                n += 1
            except Exception as exc:
                log.warning("fused basecall failed for %s: %s", f, exc)
    log.info("fused call+decode: wrote %d/%d sequences to %s",
             n, len(files), out_path)
