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


def decode(args) -> None:
    in_files = collect_input_files(getattr(args, "in"), args.basecaller)
    log.info("found %d reads to decode", len(in_files))
    out_path = args.out + ".fasta"
    with open(out_path, "w") as out_f:
        for path in in_files:
            model = model_from_trace(path, args.basecaller)
            seq = decode_read(
                model,
                args.algorithm,
                beam_width=args.beam_width,
                window=args.window,
            )
            print(fasta_format(Path(path).stem, seq), file=out_f)
    log.info("wrote sequences to %s", out_path)
