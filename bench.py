"""Benchmark: pair-consensus decoding throughput, TPU vs single-core CPU.

Prints ONE JSON line:
  {"metric": "pair_decode_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": R}

Workload: the bundled read pair (data/reads/read1.npy + read2.npy,
reverse-complemented) through the full pair-decode pipeline's consensus
stage — 2D row_col beam search (width 5) over the alignment envelope built
exactly as `pair-decode --padding 5` does. The baseline is a freshly-written
single-core C++ implementation of the same trie+hashmap algorithm the
reference uses (native/pair_beam_cpu.cpp), measured on this machine — the
reference itself (TF2 + Cython) cannot run in this image.

Extra context metrics go to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the Pallas mega-kernel takes minutes to
# compile cold; cached recompiles are seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def build_workload():
    from poreover_tpu.decoding import envelope as em
    from poreover_tpu.decoding.pair import get_sequence_mapping
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu import native

    m1 = model_from_trace("/root/reference/data/reads/read1.npy", "poreover")
    m2 = model_from_trace("/root/reference/data/reads/read2.npy", "poreover")
    m2.reverse_complement()
    b1, p1 = m1.viterbi_decode(return_path=True)
    b2, p2 = m2.viterbi_decode(return_path=True)
    s2s1, _ = get_sequence_mapping(p1, "poreover")
    s2s2, _ = get_sequence_mapping(p2, "poreover")
    a1, a2 = native.global_pair_banded(b1, b2)
    alignment = np.array([list(a1), list(a2)])
    cols = em.get_alignment_columns(alignment)
    env = em.build_envelope(m1.log_prob, m2.log_prob, cols, s2s1, s2s2, padding=5)
    return m1.log_prob, m2.log_prob, env


def main() -> None:
    y1, y2, env = build_workload()
    cells = int(np.sum(env[:, 1] - env[:, 0]))
    print(
        f"# workload: U={len(y1)} V={len(y2)} envelope cells={cells}",
        file=sys.stderr,
    )

    from poreover_tpu.ops.pallas_pair_beam import pair_beam_pallas
    from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

    # ---- TPU: single-pair and batched mega-kernels; best honest rate ----
    B = 8
    pairs = [(y1, y2, env)] * B
    t0 = time.time()
    outs = pair_beam_pallas_batch(pairs, beam_width=5)
    warm = time.time() - t0
    print(f"# tpu warm-up batch (incl. compile): {warm:.2f}s", file=sys.stderr)
    t0 = time.time()
    seq_single = pair_beam_pallas(y1, y2, env, beam_width=5)
    warm = time.time() - t0
    print(f"# tpu warm-up single (incl. compile): {warm:.2f}s",
          file=sys.stderr)

    runs = 3
    batch_time = float("inf")
    single_time = float("inf")
    for _ in range(runs):
        t0 = time.time()
        outs = pair_beam_pallas_batch(pairs, beam_width=5)
        batch_time = min(batch_time, time.time() - t0)
        t0 = time.time()
        seq_single = pair_beam_pallas(y1, y2, env, beam_width=5)
        single_time = min(single_time, time.time() - t0)
    seq_tpu = outs[0]
    assert all(s == seq_tpu for s in outs) and seq_single == seq_tpu
    print(
        f"# tpu single: {single_time:.2f}s/pair; batch of {B}: "
        f"{batch_time / B:.2f}s/pair",
        file=sys.stderr,
    )
    tpu_time = min(batch_time / B, single_time)
    print(
        f"# tpu consensus: {tpu_time:.2f}s/pair, "
        f"len={len(seq_tpu)}, {cells / tpu_time / 1e6:.2f}M cells/s",
        file=sys.stderr,
    )

    # ---- CPU baseline: same algorithm class, single core ----
    from poreover_tpu.native import (
        pair_beam_row_col_cpu,
        pair_beam_row_col_cpu_emul,
    )

    cpu_time = float("inf")
    for _ in range(2):
        t0 = time.time()
        seq_cpu = pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
        cpu_time = min(cpu_time, time.time() - t0)
    # exactness oracle: f64 trie decoder restricted to the TPU engines'
    # windowed-table memo semantics — the TPU output must equal this
    # byte-for-byte; vs the unbounded-memo trie the output may differ at
    # isolated near-ties (here: 1 char in ~6.5k)
    seq_emul = pair_beam_row_col_cpu_emul(y1, y2, env, beam_width=5)
    from poreover_tpu.native import global_pair_banded

    a1, a2 = global_pair_banded(seq_cpu, seq_tpu)
    ident = sum(x == z for x, z in zip(a1, a2)) / max(len(a1), 1)
    print(
        f"# cpu baseline: {cpu_time:.2f}s/pair, len={len(seq_cpu)}, "
        f"match={'yes' if seq_cpu == seq_tpu else 'NO'} "
        f"(windowed-semantics f64 oracle match="
        f"{'yes' if seq_emul == seq_tpu else 'NO'}, "
        f"trie-vs-tpu aligned identity~{ident:.4f})",
        file=sys.stderr,
    )

    reads_per_s = 2.0 / tpu_time
    vs_baseline = cpu_time / tpu_time
    print(
        json.dumps(
            {
                "metric": "pair_decode_reads_per_s",
                "value": round(reads_per_s, 4),
                "unit": "reads/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
