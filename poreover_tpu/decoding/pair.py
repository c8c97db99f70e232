"""1D^2 pair consensus decoding pipeline (flagship workload).

Stages per pair (mirroring reference poreover/decoding/pair_decode.py:305-529):
  1. 1D basecall both reads (Viterbi or beam+acceptor) + signal<->sequence maps
  2. Global alignment of the two 1D basecalls (banded NW, native C++)
  3. Build the banded alignment envelope over the U x V lattice (host numpy)
  4. Consensus decode over the envelope on TPU (2D beam search row_col by
     default, or pair prefix search)

Skip rules and the TSV summary log match the reference: length mismatch
> 1000 bases (pair_decode.py:372-375), pairwise identity < 0.5 (:395-398).

Deprecated reference surfaces are kept for parity: ``--method split``
(diagonal boxes, pair_decode.py:337-354), ``--method align`` (anchor boxes,
:510-522 via 4-coordinate boxes :460-476), ``--debug`` pickling (:454-465,
:482-490).

TPU scale-out: with a pairs file, ``--threads N`` decodes N pairs in
lockstep through one batched Pallas kernel launch per wave — the TPU-native
equivalent of the reference's ``multiprocessing.Pool(args.threads)``
(pair_decode.py:292-297).
"""
from __future__ import annotations

import logging
import os
import pickle
import sys
import time
from pathlib import Path

import numpy as np

from .. import native
from ..io.trace import model_from_trace
from ..models.transducer import MODEL_STRING
from ..utils.fasta import fasta_format
from ..utils.timers import timers
from . import envelope as envelope_mod

log = logging.getLogger("poreover_tpu")

LOG_COLUMNS = ["read1", "read2", "length1", "length2", "sequence_identity", "skipped"]

# reference pair_decode.py:190 — refuse prefix-search boxes above 1 GB
MEM_LIMIT = 1_000_000_000


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


def anchored_box_workloads(y1, y2, envelope, alignment, s2s1, s2s2,
                           matches: int = 10, indels: int = 100):
    """Anchor/box decomposition for a prepared pair (the --skip_matches
    machinery as a standalone function, reference pair_decode.py:412-452):
    returns (box_workloads, anchors) where box_workloads are
    (sort_key, y1_slice, y2_slice, env_slice) consensus problems between
    anchors and anchors are (sort_key, sequence) taken verbatim from the
    1D alignment. Returns (None, None) when no anchors exist."""
    anchor_ranges, anchor_type = get_anchors(alignment, matches=matches,
                                             indels=indels)
    if not anchor_ranges:
        return None, None
    U, V = len(y1), len(y2)
    a2s = np.zeros(alignment.shape, dtype=int)
    for i, col in enumerate(alignment.T):
        for s in range(2):
            if col[s] == "-":
                a2s[s, i] = a2s[s, i - 1]
            else:
                a2s[s, i] = a2s[s, i - 1] + 1
    boxes, anchors = [], []
    for i, (cs, ce) in enumerate(anchor_ranges):
        if anchor_type[i] == "ins":
            seq = "".join(alignment[1, cs:ce])
        else:  # 'mat' and 'del' take read 1's letters
            seq = "".join(alignment[0, cs:ce])
        anchors.append((s2s1[a2s[0, cs]], seq))
        if i > 0:
            boxes.append((s2s1[a2s[0, anchor_ranges[i - 1][1]]],
                          s2s1[a2s[0, cs]],
                          s2s2[a2s[1, anchor_ranges[i - 1][1]]],
                          s2s2[a2s[1, cs]]))
        else:
            boxes.append((0, s2s1[a2s[0, cs]], 0, s2s2[a2s[1, cs]]))
    boxes.append((s2s1[a2s[0, anchor_ranges[-1][1]]], U,
                  s2s2[a2s[1, anchor_ranges[-1][1]]], V))
    return extract_box_workloads(y1, y2, envelope, boxes), anchors


def extract_box_workloads(y1, y2, envelope, basecall_boxes):
    """Slice the per-pair consensus problem into independent anchor-box
    workloads (reference pair_decode.py:510-522 semantics): each box decodes
    the envelope restricted to its row range, rebased to its own y slices.
    Returns [(sort_key, y1_slice, y2_slice, env_slice), ...]; boxes with an
    empty row range contribute nothing (no signal)."""
    out = []
    for b in basecall_boxes:
        b0, b1 = b[0], b[1]
        env_slice = envelope[b0:b1]
        if len(env_slice) == 0:
            continue
        y2lo, y2hi = int(env_slice[0, 0]), int(env_slice[-1, 1])
        out.append((b0, y1[b0:b1], y2[y2lo:y2hi], env_slice - y2lo))
    return out


def _consensus_fn(args, kind: str):
    """Pick the envelope consensus decoding function (reference
    parallel_decoder._beam_search_2d_envelope / _prefix_search_2d_envelope,
    pair_decode.py:166-173, 210-215)."""
    model_string = MODEL_STRING[kind]

    if args.algorithm == "beam":
        if getattr(args, "exact", False):
            # reference-exact mode: unbounded-memo semantics via the
            # graveyard engine (see ops/beam2d_planned.EXACT_GRACE)
            def fn(y1, y2, env):
                from ..ops.beam2d_planned import beam_search_2d_planned

                return beam_search_2d_planned(
                    y1, y2, env, beam_width=args.beam_width,
                    model=model_string, exact=True,
                )

            return fn

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


def _consensus_box_fn(args, kind: str):
    """Dense-box consensus function for the deprecated --method split/align
    (reference parallel_decoder._beam_search_2d / _prefix_search_2d,
    pair_decode.py:149-164, 188-209). Returns fn(y1, y2, b, b_tot,
    u1, u2, v1, v2) -> (u1, sequence)."""
    model_string = MODEL_STRING[kind]

    def decode_1d(y):
        from ..ops.prefix import prefix_search_log

        return prefix_search_log(np.asarray(y))[0]

    def fn(y1, y2, b, b_tot, u1, u2, v1, v2):
        size = (u2 - u1 + 1) * (v2 - v1 + 1)
        print(
            f"\t {b}/{b_tot} Basecalling box {u1}-{u2}x{v1}-{v2} "
            f"(size: {size} elements)...",
            file=sys.stderr,
        )
        if size <= 1:
            return (u1, "")
        if (u2 - u1) < 1:
            return (u1, decode_1d(y2[v1:v2]))
        if (v2 - v1) < 1:
            return (u1, decode_1d(y1[u1:u2]))
        if args.algorithm == "beam":
            from ..ops.beam2d import beam_search_2d

            # dense box; reference default traversal is "row"
            # (decoding_cpp.pyx:107 method_="row")
            return (
                u1,
                beam_search_2d(
                    y1[u1:u2], y2[v1:v2],
                    beam_width=args.beam_width, model=model_string,
                    method="row",
                ),
            )
        assert model_string == "ctc"
        if size * 8 > MEM_LIMIT:
            log.error(
                "Box too large to basecall %d-%d:%d-%d (size: %d elements)",
                u1, u2, v1, v2, size,
            )
            return (u1, "")
        from ..ops.pair_prefix import pair_prefix_search_log

        try:
            return (u1, pair_prefix_search_log(y1[u1:u2], y2[v1:v2])[0])
        except Exception:
            log.warning(
                "Error while basecalling box %d-%d:%d-%d", u1, u2, v1, v2
            )
            return (u1, "")

    return fn


def pair_decode_helper(args, _workload_sink=None):
    """Decode one pair.

    ``_workload_sink``: optional callable — when the pair reaches the
    standard envelope consensus stage (method=envelope, no skip_matches /
    debug_envelope), the prepared (y1, y2, envelope) workload plus a
    ``finish(joined_basecalls)`` continuation are handed to the sink and
    this function returns None. pair_decode uses this to batch many pairs'
    stage 4 into one TPU kernel launch.
    """
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

    summary = {"read1": in_path[0], "read2": in_path[1]}
    y1 = model1.log_prob
    y2 = model2.log_prob

    # ---- deprecated --method split: diagonal boxes, no 1D stage ----
    # (reference pair_decode.py:337-354)
    if args.method == "split":
        box_fn = _consensus_box_fn(args, model1.kind)
        box_ranges = []
        u_step = args.window
        for u in range(u_step, U, u_step):
            box_ranges.append(
                (u - u_step, u, int(V / U * (u - u_step)), int(V / U * u))
            )
        if box_ranges:
            box_ranges.append((box_ranges[-1][1], U, box_ranges[-1][3], V))
        else:
            # U <= window: single box covering everything (the reference
            # crashes here, pair_decode.py:337-354 — avoidable)
            box_ranges.append((0, U, 0, V))
        basecalls = [
            box_fn(y1, y2, i, len(box_ranges) - 1, *b)
            for i, b in enumerate(box_ranges)
        ]
        joined_basecalls = "".join(b[1] for b in basecalls)
        return (
            fasta_format(
                f"consensus;{args.method};{path1.stem};{path2.stem}",
                joined_basecalls,
            ),
            summary,
        )

    alignment = None
    if not args.diagonal_envelope:
        # ---- stage 1: 1D basecalls ----
        _t0 = time.perf_counter()
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
        timers.seconds["1d_basecall"] += time.perf_counter() - _t0

        # ---- stage 2: align the 1D basecalls ----
        _t0 = time.perf_counter()
        if args.alignment == "full":
            a1, a2 = native.global_pair(basecall1, basecall2)[:2]
        else:
            a1, a2 = native.global_pair_banded(basecall1, basecall2)
        alignment = np.array([list(a1), list(a2)])
        sequence_identity = np.sum(alignment[0] == alignment[1]) / len(alignment[0])
        timers.seconds["align_1d"] += time.perf_counter() - _t0

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

    # ---- anchor boxes for --skip_matches / --method align ----
    # (reference pair_decode.py:412-452: 4-coordinate boxes over both axes)
    if args.skip_matches or args.method == "align":
        anchor_ranges, anchor_type = get_anchors(
            alignment, matches=args.skip_threshold, indels=100
        )
        assert len(anchor_ranges) > 0, (
            "No matches/indels of sufficient length found in alignment"
        )
        basecall_boxes = []
        basecall_anchors = []
        for i, (curr_start, curr_end) in enumerate(anchor_ranges):
            if anchor_type[i] == "ins":
                anchor_seq = "".join(alignment[1, curr_start:curr_end])
            else:  # 'mat' and 'del' both take read 1's letters
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
                        sequence_to_signal2[
                            alignment_to_sequence[1, anchor_ranges[i - 1][1]]
                        ],
                        sequence_to_signal2[alignment_to_sequence[1, curr_start]],
                    )
                )
            else:
                basecall_boxes.append(
                    (
                        0,
                        sequence_to_signal1[alignment_to_sequence[0, curr_start]],
                        0,
                        sequence_to_signal2[alignment_to_sequence[1, curr_start]],
                    )
                )
        basecall_boxes.append(
            (
                sequence_to_signal1[alignment_to_sequence[0, anchor_ranges[-1][1]]],
                U,
                sequence_to_signal2[alignment_to_sequence[1, anchor_ranges[-1][1]]],
                V,
            )
        )
        assert abs(len(basecall_boxes) - len(basecall_anchors)) == 1

        if args.debug:
            with open("debug.p", "wb") as pfile:
                pickle.dump(
                    {
                        "alignment_to_sequence": alignment_to_sequence,
                        "sequence_to_signal1": sequence_to_signal1,
                        "sequence_to_signal2": sequence_to_signal2,
                        "alignment": alignment,
                        "basecall_boxes": basecall_boxes,
                        "basecall_anchors": basecall_anchors,
                        "anchor_ranges": anchor_ranges,
                    },
                    pfile,
                )

        # ---- deprecated --method align: decode anchor boxes densely ----
        if args.method == "align":
            box_fn = _consensus_box_fn(args, model1.kind)
            basecalls = [
                box_fn(y1, y2, i, len(basecall_boxes) - 1, *b)
                for i, b in enumerate(basecall_boxes)
            ]
            joined_basecalls = "".join(
                s for _, s in sorted(basecalls + basecall_anchors)
            )
            return (
                fasta_format(in_path[0], basecall1)
                + fasta_format(in_path[1], basecall2),
                fasta_format(
                    f"consensus;{path1.stem};{path2.stem}", joined_basecalls
                ),
                summary,
            )

    # ---- stage 3: envelope ----
    _t0 = time.perf_counter()
    if args.diagonal_envelope:
        alignment_envelope = envelope_mod.diagonal_envelope(
            U, V, args.diagonal_width
        )
    else:
        if args.debug:
            with open("debug.p", "wb") as pfile:
                pickle.dump(
                    {
                        "alignment_to_sequence": alignment_to_sequence,
                        "sequence_to_signal1": sequence_to_signal1,
                        "sequence_to_signal2": sequence_to_signal2,
                        "alignment": alignment,
                    },
                    pfile,
                )
        alignment_col = envelope_mod.get_alignment_columns(alignment)
        alignment_envelope = envelope_mod.build_envelope(
            y1, y2, alignment_col, sequence_to_signal1, sequence_to_signal2,
            padding=args.padding,
        )

    timers.seconds["envelope"] += time.perf_counter() - _t0

    if getattr(args, "debug_envelope", False):
        size = alignment_envelope[:, 1] - alignment_envelope[:, 0]
        print(
            path1.stem, path2.stem, len(basecall1), len(basecall2), U, V,
            np.mean(size), np.std(size), np.median(size), np.min(size),
            np.max(size),
        )
        return ({"skipped": 1},)

    def _format_result(joined_basecalls):
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

    # ---- stage 4: consensus ----
    decoding_fn = _consensus_fn(args, model1.kind)
    if not args.skip_matches:
        # only plain-CTC traces may enter the batched kernels; e.g. under
        # --basecaller poreover an 8-column CSV yields a flipflop model that
        # must take the per-pair flipflop path (ADVICE r1)
        if _workload_sink is not None and model1.kind == "poreover":
            _workload_sink(
                (y1, y2, alignment_envelope), _format_result, summary
            )
            return None
        _t0 = time.perf_counter()
        joined_basecalls = decoding_fn(y1, y2, alignment_envelope)
        timers.seconds["consensus_2d"] += time.perf_counter() - _t0
        timers.add_work(
            "consensus_2d",
            float(np.sum(alignment_envelope[:, 1] - alignment_envelope[:, 0])),
        )
    else:
        box_workloads = extract_box_workloads(
            y1, y2, alignment_envelope, basecall_boxes
        )
        if _workload_sink is not None and model1.kind == "poreover":
            # batched anchored mode: every box across every pair becomes
            # one lane of the batched TPU kernel; the finish continuation
            # stitches box consensi with the anchor sequences
            anchors = list(basecall_anchors)

            def _finish_boxes(seqs, _anchors=anchors, _bw=box_workloads):
                joined = "".join(s for _, s in sorted(
                    _anchors + [(k, s) for (k, *_), s in zip(_bw, seqs)]
                ))
                return _format_result(joined)

            _workload_sink(
                [(wl[1], wl[2], wl[3]) for wl in box_workloads],
                _finish_boxes, summary,
            )
            return None
        basecalls = [
            (k, decoding_fn(y1_, y2_, env_))
            for k, y1_, y2_, env_ in box_workloads
        ]
        joined_basecalls = "".join(
            s for _, s in sorted(basecalls + basecall_anchors)
        )

    return _format_result(joined_basecalls)


def _batch_fn(exact: bool = False):
    import jax

    if exact:
        # reference-exact (graveyard) mode batches through the XLA planned
        # engine — the Pallas kernel implements windowed-memo semantics only
        import os
        from functools import partial

        seg = os.environ.get("POREOVER_EXACT_SEG")
        if seg:
            # segmented launches survive the TPU worker's program-size
            # fault (docs/EXACTNESS.md r5) — opt-in: batched exact is
            # crash-free but measured slower than per-pair (B=1)
            from ..ops.beam2d_planned import (
                beam_search_2d_planned_batch_seg,
            )
            return partial(beam_search_2d_planned_batch_seg, exact=True,
                           seg=int(seg))
        from ..ops.beam2d_planned import beam_search_2d_planned_batch
        return partial(beam_search_2d_planned_batch, exact=True)
    if jax.default_backend() == "tpu" and not jax.config.jax_enable_x64:
        from ..ops.pallas_pair_beam_batch import pair_beam_pallas_batch
        return pair_beam_pallas_batch
    from ..ops.beam2d_planned import beam_search_2d_planned_batch
    return beam_search_2d_planned_batch


def _batched_consensus(workloads, args, kind: str):
    """Decode many prepared (y1, y2, envelope) consensus workloads in
    lockstep waves of ``args.threads`` through one batched kernel launch per
    wave — the TPU-native replacement for the reference's per-pair process
    pool. On TPU hardware the waves are software-pipelined through the
    Pallas mega-kernel: wave i+1's host prep + H2D overlaps wave i's device
    compute (prepare/launch/fetch split). Elsewhere the vmapped XLA engine
    runs wave-at-a-time (identical output, tested)."""
    import jax

    exact = getattr(args, "exact", False)
    wave = max(int(args.threads), 1)
    out: list[str] = []
    chunks = [workloads[i:i + wave] for i in range(0, len(workloads), wave)]

    _t0 = time.perf_counter()
    if (not exact and jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64):
        from ..ops.pallas_pair_beam_batch import (
            fetch_prepared, launch_prepared, prepare_pairs,
        )

        pending = None
        for i, chunk in enumerate(chunks):
            log.info("consensus wave %d/%d (pipelined Pallas launch)",
                     i + 1, len(chunks))
            prep = prepare_pairs(chunk, beam_width=args.beam_width)
            outs = launch_prepared(prep)
            if pending is not None:
                out.extend(fetch_prepared(*pending))
            pending = (prep, outs)
        if pending is not None:
            out.extend(fetch_prepared(*pending))
    else:
        batch_fn = _batch_fn(exact=exact)
        # an active device mesh (multi-chip entry points) shards each
        # wave's batch dim across devices — per-pair math is local, so
        # outputs are byte-identical to the unsharded run
        from ..parallel.sharding import active_mesh

        mesh = active_mesh()
        if mesh is not None:
            from functools import partial as _partial

            batch_fn = _partial(batch_fn, mesh=mesh)
            log.info("consensus waves sharded over %d-device mesh",
                     mesh.devices.size)
        for i, chunk in enumerate(chunks):
            log.info("consensus wave %d/%d (one batched kernel launch)",
                     i + 1, len(chunks))
            out.extend(batch_fn(chunk, beam_width=args.beam_width))
    timers.seconds["consensus_2d"] += time.perf_counter() - _t0
    timers.add_work(
        "consensus_2d",
        float(sum(np.sum(env[:, 1] - env[:, 0])
                  for _, _, env in workloads)),
    )
    return out


def _use_box_kernel() -> bool:
    import jax

    return jax.default_backend() == "tpu" and not jax.config.jax_enable_x64


def batched_box_decode(flat_workloads, beam_width: int = 5):
    """Decode a flat list of (y1, y2, env) anchor boxes. On TPU this is the
    segmented box-batch Pallas kernel — hundreds of boxes per launch, each
    lane running its boxes back-to-back, per-step cost independent of the
    lane count (ops/pallas_box_beam.py). Boxes whose live span overflows
    the kernel's static storage strip are rerouted through the general
    lockstep kernel in length-sorted waves; off-TPU everything takes the
    general/XLA path. Returns one sequence per box, in order."""
    n = len(flat_workloads)
    seqs: list = [None] * n
    rest = list(range(n))
    if _use_box_kernel():
        from ..ops.pallas_box_beam import box_beam_pallas

        box_seqs, overflow = box_beam_pallas(
            flat_workloads, beam_width=beam_width)
        for i, s in enumerate(box_seqs):
            seqs[i] = s
        rest = list(overflow)
        if rest:
            log.info("box kernel: %d/%d boxes overflowed the static strip; "
                     "rerouting through the general kernel", len(rest), n)
    if rest:
        batch_fn = _batch_fn()
        order = sorted(rest, key=lambda i: (len(flat_workloads[i][0])
                                            + len(flat_workloads[i][1])))
        wave = 32
        for i in range(0, len(order), wave):
            sel = order[i:i + wave]
            out = batch_fn([flat_workloads[j] for j in sel],
                           beam_width=beam_width)
            for j, s in zip(sel, out):
                seqs[j] = s
    return seqs


def _batched_box_consensus(box_lists, args, kind: str):
    """Anchored mode (--skip_matches): pool every pair's anchor boxes into
    one box-batch decode — the inter-anchor boxes are tiny independent
    consensus problems (p50 ~40 plan steps on real reads), so hundreds of
    them ride one segmented kernel launch as lane segments. Returns one
    list of box sequences per input pair, in order."""
    flat = []   # (pair_idx, box_idx)
    wls = []
    for pi, boxes in enumerate(box_lists):
        for bi, wl in enumerate(boxes):
            flat.append((pi, bi))
            wls.append(wl)
    log.info("anchored consensus: %d boxes across %d pairs (box-batch "
             "kernel)", len(wls), len(box_lists))
    _t0 = time.perf_counter()
    seqs = batched_box_decode(wls, beam_width=args.beam_width)
    timers.seconds["consensus_2d"] += time.perf_counter() - _t0
    timers.add_work(
        "consensus_2d",
        float(sum(np.sum(env[:, 1] - env[:, 0]) for _, _, env in wls)),
    )
    results = {key: s for key, s in zip(flat, seqs)}
    return [[results[(pi, bi)] for bi in range(len(boxes))]
            for pi, boxes in enumerate(box_lists)]


def _batchable(args, kind: str) -> bool:
    """The batched Pallas kernel covers the default configuration
    (plain-CTC row_col envelope beam search) and its anchored
    --skip_matches variant (boxes pool into lockstep lanes)."""
    return (
        args.algorithm == "beam"
        and args.beam_search_method == "row_col"
        and kind == "poreover"
        and args.method == "envelope"
        and not getattr(args, "debug_envelope", False)
        # --exact batches through the XLA graveyard engine, but not in
        # anchored mode (box pooling is windowed-memo Pallas territory)
        and not (getattr(args, "exact", False) and args.skip_matches)
        # on TPU the batched exact scan (B>1) reproducibly faults the
        # runtime worker (docs/EXACTNESS.md); exact decodes per-pair there
        # unless the segmented-scan workaround is active (ADVICE r4 high)
        and not (getattr(args, "exact", False) and _exact_batch_unsafe())
        and args.threads > 1
    )


def _exact_batch_unsafe() -> bool:
    """Batched (B>1) full-length exact-mode scans crash the axon TPU
    worker; the CPU backend runs them fine, and the segmented engine
    (POREOVER_EXACT_SEG, docs/EXACTNESS.md r5) runs crash-free on TPU
    too — but measured slower than per-pair, so it stays opt-in."""
    import jax
    import os

    if os.environ.get("POREOVER_EXACT_SEG"):
        return False
    return jax.default_backend() == "tpu"


def pair_decode(args) -> None:
    timers.reset()
    in_path = getattr(args, "in")
    if len(in_path) == 1:
        # pairs file: one "read1 read2" pair per line (pair_decode.py:252-297)
        with open(in_path[0]) as f:
            pairs = [line.split() for line in f if line.split()]

        # ---- multi-host scale-out: each host decodes a stride of the
        # pairs list and writes its own output shard; counters merge over
        # the mesh at the end. Replaces the reference's single-machine Pool
        # fan-out (pair_decode.py:292-297) with jax.distributed sharding.
        import jax

        n_hosts = jax.process_count()
        if n_hosts > 1:
            from ..parallel.sharding import shard_reads_for_host

            pairs = shard_reads_for_host(pairs)
            shard = f".host{jax.process_index()}"
            log.info(
                "host %d/%d: decoding %d pairs in this shard",
                jax.process_index(), n_hosts, len(pairs),
            )
        else:
            shard = ""
        out_1d = open(args.out + shard + ".1d.fasta", "w")
        out_2d = open(args.out + shard + ".2d.fasta", "w")
        log_f = open(args.out + shard + ".log", "w", 1)
        print("# PoreOver-TPU pair-decode", file=log_f)
        print("# " + str(vars(args)), file=log_f)
        print("# " + "\t".join(LOG_COLUMNS), file=log_f)
        log.info("found %d read pairs in %s", len(pairs), in_path[0])

        kind = {"poreover": "poreover", "bonito": "bonito",
                "guppy": "flipflop", "flappie": "flipflop"}.get(
                    args.basecaller, args.basecaller)
        batching = _batchable(args, kind)

        def emit(result):
            if result is None:
                return
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

        import copy

        # Results are buffered per pair index and emitted strictly in input
        # order (a --threads N run writes identical files to --threads 1;
        # the reference's Pool callback order was nondeterministic). Batched
        # stage-4 workloads flush in waves of `wave` pairs so host memory
        # holds at most one wave of log-prob planes (ADVICE r1) and TPU work
        # overlaps the next pairs' host-side stages 1-3.
        wave = max(int(args.threads), 1)
        results: dict[int, tuple | None] = {}
        pending: list[tuple] = []  # (pair idx, workload, finish, summary)
        emit_cursor = 0

        def emit_ready():
            nonlocal emit_cursor
            while emit_cursor < len(pairs) and emit_cursor in results:
                emit(results[emit_cursor])
                emit_cursor += 1

        def flush_pending():
            if not pending:
                return
            box_mode = args.skip_matches
            try:
                if box_mode:
                    seqs = _batched_box_consensus(
                        [wl for _, wl, _, _ in pending], args, kind
                    )
                else:
                    seqs = _batched_consensus(
                        [wl for _, wl, _, _ in pending], args, kind
                    )
            except Exception:
                log.exception(
                    "batched consensus wave failed; falling back per-pair"
                )
                decoding_fn = _consensus_fn(args, kind)
                seqs = []
                for _, wl, _, _ in pending:
                    try:
                        if box_mode:
                            seqs.append([decoding_fn(*b) for b in wl])
                        else:
                            seqs.append(decoding_fn(*wl))
                    except Exception:
                        log.exception("per-pair consensus failed; skipping")
                        seqs.append(None)
            for (idx, wl, finish, summ), seq in zip(pending, seqs):
                if seq is None:
                    results[idx] = ({**summ, "skipped": 1},)
                else:
                    results[idx] = finish(seq)
            pending.clear()
            emit_ready()

        for idx, pair in enumerate(pairs):
            args_copy = copy.copy(args)
            setattr(args_copy, "in", pair)
            sink = (
                (lambda wl, finish, summ, idx=idx:
                 pending.append((idx, wl, finish, summ)))
                if batching else None
            )
            try:
                r = pair_decode_helper(args_copy, _workload_sink=sink)
            except Exception as exc:
                # one corrupt trace must not abort the whole pairs file (the
                # reference's Pool.apply_async swallows worker crashes)
                log.warning("pair %s failed: %s", pair, exc)
                r = ({"read1": pair[0], "read2": pair[1], "skipped": 1},)
            if r is not None:
                results[idx] = r
            emit_ready()
            if len(pending) >= wave:
                flush_pending()
        flush_pending()
        emit_ready()

        out_1d.close()
        out_2d.close()
        log_f.close()
        timers.log_summary("pair-decode stage timers")

        if n_hosts > 1:
            # sidecar: per-local-pair fasta record counts, so the merge can
            # walk the shard streams past skipped pairs
            with open(args.out + shard + ".idx", "w") as f:
                for i in range(len(pairs)):
                    r = results.get(i)
                    n1, n2 = (2, 1) if r and len(r) == 3 else (
                        (0, 1) if r and len(r) == 2 else (0, 0))
                    print(n1, n2, file=f)

            # collective-merged run totals (every host must participate);
            # this is also the barrier proving every shard is on disk
            from ..parallel.sharding import make_mesh, merge_stats

            skipped = sum(
                1 for r in results.values()
                if r and r[-1].get("skipped") in (1, "1")
            )
            merged = merge_stats(
                {
                    "pairs": len(pairs),
                    "skipped": skipped,
                    "consensus_cells": timers.counts.get("consensus_2d", 0.0),
                    "consensus_s": timers.seconds.get("consensus_2d", 0.0),
                },
                make_mesh(),
            )
            log.info("cluster totals (all hosts): %s", merged)

            # process 0 reconstructs the single fasta/log triplet the
            # reference's Pool callback writes (pair_decode.py:262-284)
            import jax

            if jax.process_index() == 0:
                from ..parallel.merge import merge_pair_shards

                merge_pair_shards(args.out, n_hosts)
                log.info("merged %d host shards into %s.{1d,2d}.fasta/.log",
                         n_hosts, args.out)
    else:
        result = pair_decode_helper(args)
        print(result[-1], file=sys.stderr)
        with open(args.out + ".fasta", "w") as f:
            print(result[-2] if len(result) > 1 else "", file=f)
        timers.log_summary("pair-decode stage timers")
