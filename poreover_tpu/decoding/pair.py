"""1D^2 pair consensus decoding pipeline (flagship workload).

Stages per pair (mirroring reference poreover/decoding/pair_decode.py:305-529):
  1. 1D basecall both reads (Viterbi or beam) + signal<->sequence mapping
  2. Global alignment of the two 1D basecalls (banded NW)
  3. Build the banded alignment envelope over the U x V lattice
  4. Consensus decode over the envelope (2D beam search or pair prefix search)

Implemented incrementally; see pair_decode() below.
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from ..io.trace import model_from_trace
from ..models.transducer import MODEL_STRING
from ..utils.fasta import fasta_format
from . import envelope as envelope_mod

log = logging.getLogger("poreover_tpu")


def get_sequence_mapping(path, kind: str):
    """Map a Viterbi path to (sequence->signal, signal->sequence) indices.

    Matches reference pair_decode.py:114-142 for each model kind.
    """
    signal_to_sequence = []
    sequence_to_signal = []
    label_len = 0
    if kind == "poreover":
        for i, p in enumerate(path):
            if p < 4:
                sequence_to_signal.append(i)
                signal_to_sequence.append(label_len)
                label_len += 1
    elif kind == "flipflop":
        for i, _ in enumerate(path):
            if i == 0:
                sequence_to_signal.append(i)
                signal_to_sequence.append(label_len)
            else:
                if path[i] != path[i - 1]:
                    label_len += 1
                    sequence_to_signal.append(i)
                signal_to_sequence.append(label_len)
    elif kind == "bonito":
        for i, p in enumerate(path):
            if p == 4 or path[i] == path[i - 1]:
                pass
            else:
                sequence_to_signal.append(i)
                signal_to_sequence.append(label_len)
                label_len += 1
    return sequence_to_signal, signal_to_sequence


def pair_decode(args) -> None:  # pragma: no cover - CLI wiring
    raise NotImplementedError("pair-decode pipeline lands with the 2D kernels")
