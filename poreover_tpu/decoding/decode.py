"""1D decode driver: probability traces -> FASTA.

Workload layer mirroring the reference driver (poreover/decoding/decode.py:
114-192): glob input files by basecaller extension, decode each read with the
selected algorithm, write one FASTA. Where the reference fans out with a
multiprocessing.Pool, we batch reads and let the TPU kernels process them;
file IO stays on host.
"""
from __future__ import annotations

import glob
import logging
import os
import sys
from pathlib import Path

import numpy as np

from ..io.trace import model_from_trace
from ..models.transducer import MODEL_STRING
from ..utils.fasta import fasta_format

log = logging.getLogger("poreover_tpu")

_BASECALLER_EXT = {
    "guppy": ".fast5",
    "flappie": ".hdf5",
    "bonito": ".npy",
    "poreover": ".npy",
}


def collect_input_files(in_paths, basecaller: str):
    if len(in_paths) == 1 and os.path.isdir(in_paths[0]):
        ext = _BASECALLER_EXT[basecaller]
        return sorted(glob.glob(os.path.join(in_paths[0], "*" + ext)))
    return list(in_paths)


def decode_read(model, algorithm: str, beam_width: int = 25, window: int = 400) -> str:
    """Decode one read's probability table to a sequence string."""
    if algorithm == "viterbi":
        return model.viterbi_decode()
    if algorithm == "beam":
        from ..ops.beam import beam_search

        return beam_search(
            model.log_prob, beam_width=beam_width, model=MODEL_STRING[model.kind]
        )
    if algorithm == "prefix":
        assert model.kind == "poreover"
        from ..ops.prefix import prefix_search_log

        # window the read as the reference does (decode.py:182-188) so results
        # are comparable with its chunked prefix search
        seq = []
        i = 0
        t_max = model.t_max
        while i + window < t_max:
            seq.append(prefix_search_log(model.log_prob[i : i + window])[0])
            i += window
        seq.append(prefix_search_log(model.log_prob[i:])[0])
        return "".join(seq)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _path_to_seq(model, path: np.ndarray) -> str:
    """Viterbi path -> sequence per model kind (transducer.py:72/83/148
    semantics, applied to a device-computed path)."""
    if model.kind == "poreover":
        return model.path_to_string(path)
    if model.kind == "bonito":
        keep = np.ones(len(path), dtype=bool)
        keep[1:] = path[1:] != path[:-1]
        return model.path_to_string(path[keep])
    from ..models.transducer import remove_repeated

    return remove_repeated(model.path_to_string(path)).upper()


def _decode_batched(entries, algorithm: str, beam_width: int, wave: int):
    """Decode (idx, path, model) entries in length-bucketed device batches.

    One kernel launch per (kind, length-bucket, wave) instead of one per
    read — the TPU equivalent of the reference's Pool(threads) fan-out
    (decode.py:158-162). Waves are software-pipelined: every wave is
    dispatched (H2D enqueue + async kernel) before any result is fetched,
    so wave i+1's transfer overlaps wave i's compute (JAX async dispatch).
    Returns {idx: seq}; a failing wave falls back to per-read decoding so
    one bad read never loses the others.
    """
    import jax

    from ..ops.beam import _pad_bucket

    groups: dict[tuple, list] = {}
    for e in entries:
        key = (e[2].kind, _pad_bucket(e[2].t_max))
        groups.setdefault(key, []).append(e)

    results = {}
    pending = []  # (batch, finalize) in dispatch order

    def dispatch(batch, kind, bucket):
        if algorithm == "beam":
            if (kind in ("poreover", "bonito", "flipflop")
                    and jax.default_backend() == "tpu"
                    and not jax.config.jax_enable_x64
                    # kernel packs W*(A+1) candidates into one 128-lane
                    # plane; wider beams take the XLA batch path directly
                    # instead of throwing + degrading per-read (ADVICE r4)
                    and beam_width * 5 <= 128):
                # all three model kinds ride the Pallas lane-table kernel
                # (ops/pallas_beam1d.py, ~60-125x the XLA scan's per-step
                # cost); dispatch is async, strings decode at fetch
                from ..ops.pallas_beam1d import (
                    fetch_beam1d, launch_beam1d, prepare_beam1d,
                )

                prep = prepare_beam1d(
                    [e[2].log_prob for e in batch], beam_width=beam_width,
                    model=MODEL_STRING[kind])
                outs = launch_beam1d(prep)
                return lambda: [
                    (e[0], s)
                    for e, s in zip(batch, fetch_beam1d(prep, outs))
                ]
            from ..ops.beam import beam_search_batch

            # beam_search_batch pads/buckets internally; dispatch cost is
            # one call — its outputs are host strings, so it stays eager
            seqs = beam_search_batch(
                [e[2].log_prob for e in batch],
                beam_width=beam_width,
                model=MODEL_STRING[kind],
            )
            return lambda: [(e[0], s) for e, s in zip(batch, seqs)]
        if kind == "flipflop":
            from ..ops.viterbi import viterbi_path_masked_batch

            paths = viterbi_path_masked_batch(
                [e[2].log_prob.astype(np.float32) for e in batch],
                batch[0][2].transition,
            )
            return lambda: [
                (e[0], _path_to_seq(e[2], np.asarray(p)))
                for e, p in zip(batch, paths)
            ]
        # unconstrained CTC kinds: Viterbi == per-step argmax
        from ..ops.viterbi import argmax_path_batch

        Tp = bucket
        yb = np.full(
            (len(batch), Tp, batch[0][2].log_prob.shape[1]),
            -np.inf, np.float32,
        )
        # pad with blank-wins rows so the padded tail decodes to gaps
        # that drop out of the string
        yb[:, :, -1] = 0.0
        for i, e in enumerate(batch):
            yb[i, : e[2].t_max] = e[2].log_prob
        dev_paths = argmax_path_batch(jax.device_put(yb))  # async

        def finalize():
            paths = np.asarray(dev_paths)
            return [
                (e[0], _path_to_seq(e[2], paths[i, : e[2].t_max]))
                for i, e in enumerate(batch)
            ]

        return finalize

    def fallback(batch):
        for idx, path, model in batch:
            try:
                results[idx] = decode_read(
                    model, algorithm, beam_width=beam_width
                )
            except Exception as exc:
                log.warning("skipping %s: %s", path, exc)

    def drain_one():
        batch, finalize = pending.pop(0)
        try:
            for idx, seq in finalize():
                results[idx] = seq
        except Exception:
            log.exception("batched wave failed; falling back per-read")
            fallback(batch)

    # depth-1 software pipeline: wave i+1's H2D/dispatch overlaps wave i's
    # compute, but each finalize (which drops the wave's device buffers)
    # runs before wave i+2 launches — HBM holds at most two waves, not the
    # whole read set (ADVICE r4 medium; same shape as pair.py's
    # _batched_consensus pipeline)
    for (kind, bucket), group in sorted(groups.items()):
        for w0 in range(0, len(group), wave):
            batch = group[w0 : w0 + wave]
            log.info(
                "decoding wave: %d reads (kind=%s, bucket=%d, algorithm=%s)",
                len(batch), kind, bucket, algorithm,
            )
            try:
                pending.append((batch, dispatch(batch, kind, bucket)))
            except Exception:
                log.exception(
                    "batched wave dispatch failed; per-read fallback"
                )
                fallback(batch)
            while len(pending) > 1:
                drain_one()

    while pending:
        drain_one()
    return results


def decode(args) -> None:
    in_files = collect_input_files(getattr(args, "in"), args.basecaller)
    log.info("found %d reads to decode", len(in_files))

    # multi-host: stride the read list across hosts, one FASTA shard each
    # (replaces the reference's Pool fan-out, decode.py:158-162)
    import jax

    n_hosts = jax.process_count()
    shard = ""
    if n_hosts > 1:
        from ..parallel.sharding import shard_reads_for_host

        in_files = shard_reads_for_host(in_files)
        shard = f".host{jax.process_index()}"
        log.info(
            "host %d/%d: decoding %d reads in this shard",
            jax.process_index(), n_hosts, len(in_files),
        )
    out_path = args.out + shard + ".fasta"
    threads = max(int(getattr(args, "threads", 1) or 1), 1)

    # host IO first, isolating per-read load failures (the reference's Pool
    # silently swallows crashed workers, decode.py:140-162; we log + skip)
    entries = []
    for idx, path in enumerate(in_files):
        try:
            entries.append((idx, path, model_from_trace(path, args.basecaller)))
        except Exception as exc:
            log.warning("skipping unreadable trace %s: %s", path, exc)

    results: dict[int, str] = {}
    if args.algorithm in ("viterbi", "beam") and len(entries) > 1:
        results = _decode_batched(
            entries, args.algorithm, args.beam_width, wave=max(16, threads)
        )
    else:
        for idx, path, model in entries:
            try:
                results[idx] = decode_read(
                    model,
                    args.algorithm,
                    beam_width=args.beam_width,
                    window=args.window,
                )
            except Exception as exc:
                log.warning("decode failed for %s: %s", path, exc)

    with open(out_path, "w") as out_f:
        for idx, path in enumerate(in_files):
            if idx in results:
                print(fasta_format(Path(path).stem, results[idx]), file=out_f)
    log.info("wrote %d/%d sequences to %s", len(results), len(in_files), out_path)

    if n_hosts > 1:
        with open(args.out + shard + ".idx", "w") as f:
            for idx in range(len(in_files)):
                print(1 if idx in results else 0, file=f)

        from ..parallel.sharding import make_mesh, merge_stats

        merged = merge_stats(
            {"reads": len(in_files), "decoded": len(results)}, make_mesh()
        )
        log.info("cluster totals (all hosts): %s", merged)

        # process 0 reconstructs the single fasta the reference's Pool
        # callback writes (decode.py:140-162); the stats collective above
        # is the barrier proving every shard is on disk
        if jax.process_index() == 0:
            from ..parallel.merge import merge_decode_shards

            merge_decode_shards(args.out, n_hosts)
            log.info("merged %d host shards into %s.fasta", n_hosts, args.out)
