"""1D^2 pair consensus decoding pipeline (flagship workload).

Stages per pair (mirroring reference poreover/decoding/pair_decode.py:305-529):
  1. 1D basecall both reads (Viterbi or beam+acceptor) + signal<->sequence maps
  2. Global alignment of the two 1D basecalls (banded NW, native C++)
  3. Build the banded alignment envelope over the U x V lattice (host numpy)
  4. Consensus decode over the envelope on TPU (2D beam search row_col by
     default, or pair prefix search)

Skip rules and the TSV summary log match the reference: length mismatch
> 1000 bases (pair_decode.py:372-375), pairwise identity < 0.5 (:395-398).
"""
from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

import numpy as np

from .. import native
from ..io.trace import model_from_trace
from ..models.transducer import MODEL_STRING
from ..utils.fasta import fasta_format
from . import envelope as envelope_mod

log = logging.getLogger("poreover_tpu")

LOG_COLUMNS = ["read1", "read2", "length1", "length2", "sequence_identity", "skipped"]


def get_sequence_mapping(path, kind: str):
    """Map a Viterbi path to (sequence->signal, signal->sequence) indices
    (reference pair_decode.py:114-142)."""
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


def get_anchors(alignment, matches: int, indels: int):
    """Contiguous match/indel stretches usable as anchors
    (reference pair_decode.py:53-89)."""
    state_start = 0
    state_counter = 1
    prev_state = "START"
    anchor_ranges = []
    anchor_type = []
    for i, (a1, a2) in enumerate(alignment.T):
        if a1 == a2:
            state = "mat"
        elif a1 == "-":
            state = "ins"
        elif a2 == "-":
            state = "del"
        else:
            state = "mis"
        if prev_state == state and state != "mis":
            state_counter += 1
        else:
            if prev_state == "ins" and state_counter >= indels:
                anchor_ranges.append((state_start, i))
                anchor_type.append(prev_state)
            if prev_state == "del" and state_counter >= indels:
                anchor_ranges.append((state_start, i))
                anchor_type.append(prev_state)
            if prev_state == "mat" and state_counter >= matches:
                anchor_ranges.append((state_start, i))
                anchor_type.append(prev_state)
            prev_state = state
            state_counter = 1
            state_start = i
    return anchor_ranges, anchor_type


def _consensus_fn(args, kind: str):
    """Pick the consensus decoding function (reference parallel_decoder,
    pair_decode.py:144-228)."""
    model_string = MODEL_STRING[kind]

    if args.algorithm == "beam":

        def fn(y1, y2, env):
            from ..ops.beam2d import beam_search_2d

            return beam_search_2d(
                y1,
                y2,
                envelope=env,
                beam_width=args.beam_width,
                model=model_string,
                method=args.beam_search_method,
            )

        return fn

    if args.algorithm == "prefix":
        assert model_string == "ctc"

        def fn(y1, y2, env):
            from ..ops.pair_prefix import pair_prefix_search_log

            return pair_prefix_search_log(y1, y2, env)[0]

        return fn

    raise ValueError(f"unknown pair algorithm {args.algorithm!r}")


def pair_decode_helper(args):
    in_path = list(getattr(args, "in"))
    assert len(in_path) == 2, "exactly two reads are required"

    path1 = Path(in_path[0])
    path2 = Path(in_path[1])
    if path1.suffix == ".fast5":
        path1 = path1.with_suffix(".npy")
    if path2.suffix == ".fast5":
        path2 = path2.with_suffix(".npy")

    model1 = model_from_trace(os.path.join(args.dir, path1), args.basecaller)
    model2 = model_from_trace(os.path.join(args.dir, path2), args.basecaller)
    U = model1.t_max
    V = model2.t_max

    if args.reverse_complement:
        model2.reverse_complement()
    assert model1.kind == model2.kind

    decoding_fn = _consensus_fn(args, model1.kind)
    summary = {"read1": in_path[0], "read2": in_path[1]}

    alignment = None
    if not args.diagonal_envelope:
        # ---- stage 1: 1D basecalls ----
        if args.single == "viterbi":
            basecall1, viterbi_path1 = model1.viterbi_decode(return_path=True)
            basecall2, viterbi_path2 = model2.viterbi_decode(return_path=True)
        else:
            from ..ops.acceptor import viterbi_acceptor
            from ..ops.beam import beam_search

            basecall1 = beam_search(model1.log_prob, model=MODEL_STRING[model1.kind])
            viterbi_path1 = viterbi_acceptor(model1.log_prob, basecall1, band_size=1000)
            basecall2 = beam_search(model2.log_prob, model=MODEL_STRING[model2.kind])
            viterbi_path2 = viterbi_acceptor(model2.log_prob, basecall2, band_size=1000)

        if abs(len(basecall1) - len(basecall2)) > 1000:
            log.warning("skipping pair due to length mismatch")
            summary.update(
                length1=len(basecall1), length2=len(basecall2), skipped=1
            )
            return (summary,)

        sequence_to_signal1, _ = get_sequence_mapping(viterbi_path1, model1.kind)
        assert len(sequence_to_signal1) == len(basecall1)
        sequence_to_signal2, _ = get_sequence_mapping(viterbi_path2, model2.kind)
        assert len(sequence_to_signal2) == len(basecall2)

        # ---- stage 2: align the 1D basecalls ----
        if args.alignment == "full":
            a1, a2 = native.global_pair(basecall1, basecall2)[:2]
        else:
            a1, a2 = native.global_pair_banded(basecall1, basecall2)
        alignment = np.array([list(a1), list(a2)])
        sequence_identity = np.sum(alignment[0] == alignment[1]) / len(alignment[0])

        if sequence_identity < 0.5:
            log.warning(
                "skipping pair due to low pairwise identity (%.3f); did you "
                "mean --reverse_complement?", sequence_identity,
            )
            summary.update(
                length1=len(basecall1),
                length2=len(basecall2),
                sequence_identity=sequence_identity,
                skipped=1,
            )
            return (summary,)

        summary.update(
            length1=len(basecall1),
            length2=len(basecall2),
            sequence_identity=sequence_identity,
            skipped=0,
        )

        # alignment column -> sequence index map (pair_decode.py:403-410)
        alignment_to_sequence = np.zeros(alignment.shape, dtype=int)
        for i, col in enumerate(alignment.T):
            for s in range(2):
                if col[s] == "-":
                    alignment_to_sequence[s, i] = alignment_to_sequence[s, i - 1]
                else:
                    alignment_to_sequence[s, i] = alignment_to_sequence[s, i - 1] + 1

    y1 = model1.log_prob
    y2 = model2.log_prob

    # ---- stage 3: envelope ----
    if args.diagonal_envelope:
        alignment_envelope = envelope_mod.diagonal_envelope(
            U, V, args.diagonal_width
        )
    else:
        alignment_col = envelope_mod.get_alignment_columns(alignment)
        alignment_envelope = envelope_mod.build_envelope(
            y1, y2, alignment_col, sequence_to_signal1, sequence_to_signal2,
            padding=args.padding,
        )

    if getattr(args, "debug_envelope", False):
        size = alignment_envelope[:, 1] - alignment_envelope[:, 0]
        print(
            path1.stem, path2.stem, len(basecall1), len(basecall2), U, V,
            np.mean(size), np.std(size), np.median(size), np.min(size),
            np.max(size),
        )
        return ({"skipped": 1},)

    # ---- stage 4: consensus ----
    if not args.skip_matches:
        joined_basecalls = decoding_fn(y1, y2, alignment_envelope)
    else:
        anchor_ranges, anchor_type = get_anchors(
            alignment, matches=args.skip_threshold, indels=100
        )
        assert len(anchor_ranges) > 0, (
            "No matches/indels of sufficient length found in alignment"
        )
        basecall_boxes = []
        basecall_anchors = []
        for i, (curr_start, curr_end) in enumerate(anchor_ranges):
            if anchor_type[i] == "mat":
                anchor_seq = "".join(alignment[0, curr_start:curr_end])
            elif anchor_type[i] == "ins":
                anchor_seq = "".join(alignment[1, curr_start:curr_end])
            else:
                anchor_seq = "".join(alignment[0, curr_start:curr_end])
            basecall_anchors.append(
                (sequence_to_signal1[alignment_to_sequence[0, curr_start]], anchor_seq)
            )
            if i > 0:
                basecall_boxes.append(
                    (
                        sequence_to_signal1[
                            alignment_to_sequence[0, anchor_ranges[i - 1][1]]
                        ],
                        sequence_to_signal1[alignment_to_sequence[0, curr_start]],
                    )
                )
            else:
                basecall_boxes.append(
                    (0, sequence_to_signal1[alignment_to_sequence[0, curr_start]])
                )
        basecall_boxes.append(
            (
                sequence_to_signal1[
                    alignment_to_sequence[0, anchor_ranges[-1][1]]
                ],
                U,
            )
        )
        basecalls = []
        for b0, b1 in basecall_boxes:
            env_slice = alignment_envelope[b0:b1]
            if len(env_slice) == 0:
                continue
            y1_ = y1[b0:b1]
            y2_ = y2[env_slice[0, 0]: env_slice[-1, 1]]
            env_ = env_slice - env_slice[0, 0]
            basecalls.append((b0, decoding_fn(y1_, y2_, env_)))
        joined_basecalls = "".join(
            s for _, s in sorted(basecalls + basecall_anchors)
        )

    if args.diagonal_envelope:
        return (
            fasta_format(
                f"consensus;{path1.stem};{path2.stem}", joined_basecalls
            ),
            summary,
        )
    return (
        fasta_format(in_path[0], basecall1) + fasta_format(in_path[1], basecall2),
        fasta_format(f"consensus;{path1.stem};{path2.stem}", joined_basecalls),
        summary,
    )


def pair_decode(args) -> None:
    in_path = getattr(args, "in")
    if len(in_path) == 1:
        # pairs file: one "read1 read2" pair per line (pair_decode.py:252-297)
        with open(in_path[0]) as f:
            pairs = [line.split() for line in f if line.split()]
        out_1d = open(args.out + ".1d.fasta", "w")
        out_2d = open(args.out + ".2d.fasta", "w")
        log_f = open(args.out + ".log", "w", 1)
        print("# PoreOver-TPU pair-decode", file=log_f)
        print("# " + str(vars(args)), file=log_f)
        print("# " + "\t".join(LOG_COLUMNS), file=log_f)
        log.info("found %d read pairs in %s", len(pairs), in_path[0])
        for pair in pairs:
            import copy

            args_copy = copy.copy(args)
            setattr(args_copy, "in", pair)
            result = pair_decode_helper(args_copy)
            if len(result) == 3:
                print(result[0], file=out_1d)
                print(result[1], file=out_2d)
                print(
                    "\t".join(str(result[2].get(k, "")) for k in LOG_COLUMNS),
                    file=log_f,
                )
            elif len(result) == 2:
                print(result[0], file=out_2d)
                print(
                    "\t".join(str(result[1].get(k, "")) for k in ["read1", "read2"]),
                    file=log_f,
                )
            else:
                print(
                    "\t".join(str(result[0].get(k, "")) for k in LOG_COLUMNS),
                    file=log_f,
                )
        out_1d.close()
        out_2d.close()
        log_f.close()
    else:
        result = pair_decode_helper(args)
        print(result[-1], file=sys.stderr)
        with open(args.out + ".fasta", "w") as f:
            print(result[-2] if len(result) > 1 else "", file=f)
