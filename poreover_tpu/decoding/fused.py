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


@partial(jax.jit, static_argnames=("L", "A", "B"))
def _pack_planes(y, lens_vec, L, A, B):
    """Device analogue of pallas_beam1d.prepare_beam1d's host packing:
    y [n, Tf, A+1] log-probs -> ([8B, L] emission planes, [B, 128] lens).
    Steps beyond a read's length are kernel no-ops, so the plane tails may
    carry the forward's padding garbage."""
    from ..ops import pallas_beam1d as pb

    n, Tf = y.shape[0], y.shape[1]
    yp = jnp.full((8 * B, L), pb._NEG, jnp.float32)
    for c in range(A + 1):
        yp = yp.at[c * B:c * B + n, :Tf].set(y[:, :, c])
    # root_prev row: cumulative blank through t-1 (prepare_beam1d's rows
    # (A+1)*B..), masked to each read's true length
    t = jnp.arange(Tf, dtype=jnp.int32)[None, :]
    valid = t < lens_vec[:n, None]
    blank = jnp.where(valid, y[:, :, A], 0.0)
    cum = jnp.cumsum(blank, axis=1)
    root = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.float32), cum[:, :-1]], axis=1)
    root = jnp.where(valid, root, pb._NEG)
    yp = yp.at[(A + 1) * B:(A + 1) * B + n, :Tf].set(root)
    lens = jnp.where(jnp.arange(B)[:, None] < n, lens_vec[:, None], 1)
    lens = jnp.broadcast_to(lens, (B, 128)).astype(jnp.int32)
    return yp, lens


def make_fused_beam(model, params, window: int = 1000,
                    beam_width: int = 25, alphabet: str = "ACGT"):
    """Fused basecall + beam search: network forward, log-softmax and
    emission-plane packing run as ONE jitted device program whose output
    planes feed the Pallas 1D beam kernel (ops/pallas_beam1d.py) directly
    in HBM — the [T, 5] probability matrix never visits the host. Only
    the raw signal windows ship up; only the int8 provenance characters
    come back (the kernel's traceback already runs on device).

    Matches the two-stage pipeline byte-for-byte: the unfused path saves
    ``softmax(logits)`` then decodes ``log(probs)`` (network/call.py:112,
    io/trace.py:40-48), so the fused program computes
    ``log(softmax(logits))`` with the same two ops. Up to 8 reads batch
    into the kernel's lane planes per launch; padded steps beyond a
    read's length are exact no-ops in the kernel (pallas_beam1d.py:112).

    On non-TPU backends the same fused forward runs and the decode falls
    back to the XLA beam engine on the fetched log-probs — the seam the
    differential test pins (tests/test_network.py).

    Reference pipeline boundary: network.py:288-298 -> decode.py:41-51.

    Returns ``decode_reads(signals) -> list[str]``.
    """
    from ..ops import pallas_beam1d as pb

    A = len(alphabet)
    B = 8

    @jax.jit
    def fwd128(chunk):
        # [128, window, 1] — the SAME batch shape the unfused call driver
        # feeds the network (network/call.py), so the logits are
        # bit-identical to the two-stage pipeline's; a different batch
        # shape would re-tile the MXU matmuls and the default-precision
        # noise (amplified by log on small probabilities) measurably
        # perturbs the emissions
        logits = model.apply({"params": params}, chunk)
        return jnp.log(jax.nn.softmax(logits, axis=-1))

    @partial(jax.jit, static_argnames=("L",))
    def pack(y_parts, lens_vec, L):
        # y_parts [n, nb, 128, window, A+1] -> planes via _pack_planes
        n, nb = y_parts.shape[0], y_parts.shape[1]
        y = y_parts.reshape(n, nb * 128 * window, A + 1)
        return _pack_planes(y, lens_vec, L, A, B)

    def decode_reads(signals) -> list[str]:
        from ..io.fast5 import batch_input

        out: list[str] = []
        for g0 in range(0, len(signals), B):
            group = signals[g0:g0 + B]
            n = len(group)
            batched = [batch_input(np.asarray(s, np.float32), window)
                       for s in group]
            nb = max(len(b) for b, _ in batched)
            sig = np.zeros((n, nb, 128, window, 1), np.float32)
            lens_vec = np.ones(B, np.int32)
            for b, (batches, last) in enumerate(batched):
                sig[b, :len(batches)] = batches
                lens_vec[b] = ((len(batches) - 1) * 128 * window
                               + (last if last else 128 * window))
            Tf = nb * 128 * window
            L = ((Tf + pb.RING - 1) // pb.RING) * pb.RING
            sig_d = jnp.asarray(sig)
            y_parts = jnp.stack([
                jnp.stack([fwd128(sig_d[b, k]) for k in range(nb)])
                for b in range(n)
            ])
            yp, lens = pack(y_parts, jnp.asarray(lens_vec), L)
            if jax.default_backend() == "tpu":
                kout = pb._run_kernel(yp, lens, B, beam_width, A, L,
                                      MODEL=0)
                tb = pb._traceback_device(*kout, lens, beam_width, A, B)
                out.extend(pb.fetch_beam1d(
                    dict(n_real=n, alphabet=alphabet), tb))
            else:
                from ..ops.beam import beam_search_batch

                yp_h = np.asarray(yp)
                ys = [
                    np.stack([yp_h[c * B + b][:lens_vec[b]]
                              for c in range(A + 1)], axis=1)
                    for b in range(n)
                ]
                out.extend(beam_search_batch(
                    ys, beam_width=beam_width, model="ctc"))
        return out

    return decode_reads


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

    if args.decode == "beam":
        decode_reads = make_fused_beam(
            model, params, window=args.window,
            beam_width=getattr(args, "beam_width", 25))
    else:
        run = make_fused_viterbi(model, params, window=args.window)

    in_path = getattr(args, "in")
    if os.path.isdir(in_path):
        files = sorted(glob.glob(os.path.join(in_path, "*.fast5")))
    else:
        files = [in_path]

    out_path = (args.out or "fused") + ".fasta"
    n = 0
    with open(out_path, "w") as out_f:
        if args.decode == "beam":
            names, signals = [], []
            for f in files:
                try:
                    _, signal = parse_fast5(f, scaling=args.scaling)
                    names.append(Path(f).stem)
                    signals.append(signal)
                except Exception as exc:
                    log.warning("fused basecall failed for %s: %s", f, exc)
            for name, seq in zip(names, decode_reads(signals)):
                print(fasta_format(name, seq), file=out_f)
                n += 1
        else:
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
