"""Benchmark: the full BASELINE.md protocol on real hardware.

Workloads (BASELINE.md "Baseline protocol"):
  1. viterbi  — Viterbi decode of basecaller probs (single read)
  2. beam     — 1D beam search (width 25) over data/reads npy batch
  3. flipflop — flip-flop decode of both bundled ONT traces
  4. pair     — pair-decode of data/pairs.txt (banded 2D consensus) [HEADLINE]
  5. call     — PoreOverNet conv1_bigru3 forward over data/read.fast5

Prints ONE JSON line on stdout (the headline pair-decode metric with
vs_baseline = single-core CPU trie time / TPU time); every workload's
numbers go to stderr and to bench_results.json. Each workload and each
TPU engine has fallbacks — this script never exits non-zero because one
path fails.

CPU baselines are the same algorithm class the reference uses, measured on
this machine single-core: numpy Viterbi (transducer.py:35-73 is numpy), the
fresh C++ trie row_col implementation (native/pair_beam_cpu.cpp) for the 2D
consensus (the reference itself — TF2 + Cython — cannot run in this image).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import traceback

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

DATA = "/root/reference/data"
RESULTS: dict = {}
_RESULTS_PATH = os.path.join(os.path.dirname(__file__) or ".",
                             "bench_results.json")
try:
    with open(_RESULTS_PATH) as _f:
        PREV: dict = json.load(_f)
except Exception:
    PREV = {}


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _timed(fn, n=3):
    """Run fn n times; return (last_output, min_s, median_s)."""
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return out, min(ts), sorted(ts)[len(ts) // 2]


def _note_prev(name: str) -> None:
    """Regression check vs the previous bench_results.json (VERDICT r3
    item 4: two consecutive rounds shipped unflagged slowdowns)."""
    cur = RESULTS.get(name)
    prev = PREV.get(name)
    if not isinstance(cur, dict) or not isinstance(prev, dict):
        return
    pt, ct = prev.get("tpu_s"), cur.get("tpu_s")
    if not pt or not ct:
        return
    cur["vs_prev_speedup"] = round(pt / ct, 3)
    if ct > 1.3 * pt:
        cur["regression_warning"] = (
            f"tpu_s {pt} -> {ct}: >1.3x slower than previous bench run")
        log(f"WARNING: {name} REGRESSED vs previous bench: "
            f"{pt}s -> {ct}s ({ct / pt:.2f}x slower)")


# --------------------------------------------------------------------------
# stage-1..3 pipeline shared by the pair workloads (host side)
# --------------------------------------------------------------------------

def build_pair_workload(npy1: str, npy2: str, padding: int = 5,
                        with_alignment: bool = False):
    """Stages 1-3 of pair-decode: 1D viterbi, NW align, envelope."""
    from poreover_tpu.decoding import envelope as em
    from poreover_tpu.decoding.pair import get_sequence_mapping
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu import native

    m1 = model_from_trace(npy1, "poreover")
    m2 = model_from_trace(npy2, "poreover")
    m2.reverse_complement()
    b1, p1 = m1.viterbi_decode(return_path=True)
    b2, p2 = m2.viterbi_decode(return_path=True)
    s2s1, _ = get_sequence_mapping(p1, "poreover")
    s2s2, _ = get_sequence_mapping(p2, "poreover")
    a1, a2 = native.global_pair_banded(b1, b2)
    alignment = np.array([list(a1), list(a2)])
    cols = em.get_alignment_columns(alignment)
    env = em.build_envelope(m1.log_prob, m2.log_prob, cols, s2s1, s2s2,
                            padding=padding)
    if with_alignment:
        return (m1.log_prob, m2.log_prob, env,
                dict(alignment=alignment, s2s1=np.array(s2s1),
                     s2s2=np.array(s2s2)))
    return m1.log_prob, m2.log_prob, env


def build_workload():
    """The bundled real pair (kept for scratch scripts / tests)."""
    return build_pair_workload(f"{DATA}/reads/read1.npy",
                               f"{DATA}/reads/read2.npy")


def _synth_read_pair(rng, n_bases: int):
    """Simulate one 1D^2 read pair: a random template strand and its
    reverse-complement strand (with ~5% substitutions), each rendered as
    CTC emissions with geometric dwell (~7 steps/base, the bundled reads'
    ratio) and Gaussian logit noise. Gives VERDICT-r4-item-2's 'synthetic
    pairs of realistic 40-70k lengths with real envelopes' — the envelope
    comes from the real stage-1..3 pipeline, not from the simulator."""
    comp = 3  # ACGT: complement = 3 - code
    seq = rng.integers(0, 4, n_bases)
    seq2 = seq.copy()
    m = rng.random(n_bases) < 0.05
    seq2[m] = (seq2[m] + rng.integers(1, 4, int(m.sum()))) % 4
    seq2 = (comp - seq2)[::-1]

    def sim(s):
        dw = 1 + rng.geometric(0.16, size=len(s))
        T = int(dw.sum())
        base_of = np.repeat(np.arange(len(s)), dw)
        first = np.ones(T, bool)
        first[1:] = base_of[1:] != base_of[:-1]
        logits = rng.normal(0, 1.2, (T, 5)).astype(np.float32)
        ch = np.where(first, s[base_of], 4)
        logits[np.arange(T), ch] += 4.0
        return (logits - np.log(np.exp(logits).sum(1, keepdims=True))
                ).astype(np.float32)

    return sim(seq), sim(seq2)


def synth_pair_workloads(n: int, seed: int = 7):
    """n distinct synthetic pairs through the real basecall/align/envelope
    pipeline (temp .npy files so the exact production loaders run)."""
    rng = np.random.default_rng(seed)
    out = []
    with tempfile.TemporaryDirectory() as td:
        for i in range(n):
            nb = int(rng.integers(5200, 8200))
            y1, y2 = _synth_read_pair(rng, nb)
            p1 = os.path.join(td, f"s{i}_1.npy")
            p2 = os.path.join(td, f"s{i}_2.npy")
            np.save(p1, y1)
            np.save(p2, y2)
            out.append(tuple(build_pair_workload(p1, p2)))
    return out


def _aligned_identity(a: str, b: str) -> float:
    from poreover_tpu import native

    x, z = native.global_pair_banded(a, b)
    return sum(c == d for c, d in zip(x, z)) / max(len(x), 1)


def bench_reference_cpu(workloads) -> float | None:
    """Time the REFERENCE implementation's own header-only C++ row_col
    decoder (jordisr/poreover BeamSearch.h) single-core on the same pairs —
    the literal 'single-core CPU PoreOver' of the BASELINE.md protocol.
    Built on demand against the read-only reference headers."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    binp = os.path.join(repo, "native", "ref_baseline")
    srcp = os.path.join(repo, "native", "ref_baseline.cpp")
    try:
        if not os.path.exists(binp) or (
            os.path.getmtime(srcp) > os.path.getmtime(binp)
        ):
            subprocess.run(
                ["g++", "-O3", "-std=c++14", "-I",
                 "/root/reference/poreover", "-o", binp, srcp],
                check=True, capture_output=True, timeout=300,
            )
        with tempfile.TemporaryDirectory() as td:
            for i, (y1, y2, env) in enumerate(workloads):
                np.array([len(y1), len(y2)], np.int64).tofile(
                    f"{td}/dims_{i}.i64")
                np.asarray(y1, np.float64).tofile(f"{td}/y1_{i}.f64")
                np.asarray(y2, np.float64).tofile(f"{td}/y2_{i}.f64")
                np.asarray(env, np.int64).tofile(f"{td}/env_{i}.i64")
            t0 = time.perf_counter()
            subprocess.run([binp, td, str(len(workloads))], check=True,
                           capture_output=True, timeout=600)
            return time.perf_counter() - t0
    except Exception:
        log("reference-C++ baseline unavailable (non-fatal)")
        traceback.print_exc(file=sys.stderr)
        return None


# --------------------------------------------------------------------------
# workload 1: viterbi decode
# --------------------------------------------------------------------------

def _bench_fused_viterbi():
    """Fused basecall+decode pipeline vs the reference's two-stage one,
    end-to-end from raw signal, same checkpoint-124 weights."""
    import jax

    from poreover_tpu.decoding.fused import (
        fused_basecall_viterbi, make_fused_viterbi,
    )
    from poreover_tpu.io.fast5 import parse_fast5
    from poreover_tpu.io.tf_checkpoint import load_keras_conv1_bigru3
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.network.model import build_model

    import jax.numpy as jnp

    _, signal = parse_fast5(f"{DATA}/read.fast5", scaling="standard")
    model = build_model("conv1_bigru3")
    params = jax.tree.map(
        jnp.asarray,
        load_keras_conv1_bigru3("/root/reference/data/model/checkpoint-124"))
    run = make_fused_viterbi(model, params, window=1000)

    seq = fused_basecall_viterbi(run, signal)  # warm (compile)
    Bf = 16
    _, fused_s, _ = _timed(
        lambda: [fused_basecall_viterbi(run, signal) for _ in range(Bf)],
        n=2)

    # unfused pipeline on the same read: call -> .npy -> viterbi decode
    with tempfile.TemporaryDirectory() as td:
        from types import SimpleNamespace

        from poreover_tpu.network.call import call

        def unfused_once():
            call(SimpleNamespace(
                **{"in": f"{DATA}/read.fast5"}, out=None, dir=td,
                weights=None, model=None, scaling="standard",
                use_id=False, window=1000, format="npy", no_stack=False))
            m = model_from_trace(f"{td}/read.npy", "poreover")
            return m.viterbi_decode()

        seq_unfused = unfused_once()  # warm
        _, unfused_s, _ = _timed(
            lambda: [unfused_once() for _ in range(Bf)], n=1)
    assert seq == seq_unfused, (
        "fused call+decode output differs from the two-stage pipeline")
    log(f"viterbi[fused call+decode]: {Bf / fused_s:.2f} reads/s e2e vs "
        f"{Bf / unfused_s:.2f} unfused ({unfused_s / fused_s:.1f}x), "
        "outputs identical")
    return dict(
        fused_reads_per_s_e2e=round(Bf / fused_s, 3),
        unfused_reads_per_s_e2e=round(Bf / unfused_s, 3),
        fused_vs_unfused=round(unfused_s / fused_s, 3),
        fused_match="identical",
    )


def _bench_fused_beam():
    """Fused basecall+beam-search (r5): network forward + log-softmax +
    plane packing in jitted device programs feeding the Pallas beam1d
    kernel in HBM — only the raw [T] signal ships up, int8 chars come
    back. Unlike the fused-viterbi row, byte-parity with the two-stage
    pipeline is unreachable by construction (the unfused path takes
    np.log of the saved probs on HOST libm and np.cumsum sequentially;
    the fused program computes log/cumsum with TPU arithmetic, and CTC
    beam near-ties flip on the last ulp), so the gate is sequence
    identity, reported alongside."""
    import jax
    import jax.numpy as jnp

    from poreover_tpu.decoding.fused import make_fused_beam
    from poreover_tpu.io.fast5 import parse_fast5
    from poreover_tpu.io.tf_checkpoint import load_keras_conv1_bigru3
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.network.model import build_model
    from poreover_tpu.ops.pallas_beam1d import beam1d_pallas_batch

    _, signal = parse_fast5(f"{DATA}/read.fast5", scaling="standard")
    model = build_model("conv1_bigru3")
    params = jax.tree.map(
        jnp.asarray,
        load_keras_conv1_bigru3("/root/reference/data/model/checkpoint-124"))
    decode_reads = make_fused_beam(model, params, window=1000,
                                   beam_width=25)

    Bf = 8
    fused_seq = decode_reads([signal])[0]  # warm (compile)
    _, fused_s, _ = _timed(lambda: decode_reads([signal] * Bf), n=2)

    # two-stage on the same read: call -> .npy -> load -> Pallas beam
    with tempfile.TemporaryDirectory() as td:
        from types import SimpleNamespace

        from poreover_tpu.network.call import call

        def unfused_once():
            call(SimpleNamespace(
                **{"in": f"{DATA}/read.fast5"}, out=None, dir=td,
                weights=None, model=None, scaling="standard",
                use_id=False, window=1000, format="npy", no_stack=False))
            m = model_from_trace(f"{td}/read.npy", "poreover")
            return beam1d_pallas_batch([m.log_prob.astype(np.float32)],
                                       beam_width=25)[0]

        seq_unfused = unfused_once()  # warm
        _, unfused_s, _ = _timed(lambda: [unfused_once()
                                          for _ in range(Bf)], n=1)
    ident = _aligned_identity(fused_seq, seq_unfused)
    assert ident > 0.999, (
        f"fused call+beam diverges from two-stage: identity {ident}")
    log(f"beam[fused call+decode]: {Bf / fused_s:.2f} reads/s e2e vs "
        f"{Bf / unfused_s:.2f} unfused ({unfused_s / fused_s:.1f}x), "
        f"identity {ident:.5f}")
    return dict(
        fused_reads_per_s_e2e=round(Bf / fused_s, 3),
        unfused_reads_per_s_e2e=round(Bf / unfused_s, 3),
        fused_vs_unfused=round(unfused_s / fused_s, 3),
        fused_identity=round(ident, 5),
        fused_match=("identical" if fused_seq == seq_unfused
                     else "ulp-class (log/cumsum on TPU vs host libm)"),
    )


def bench_viterbi():
    """Methodology (VERDICT r2 item 4): the round-2 row timed per-call
    host->device transfer of a 40 MB batch over the tunneled device link —
    dispatch/transfer, not compute. Production decode keeps probs
    device-resident for the whole pipeline, so the headline vs_baseline is
    the device-compute number (device-resident inputs, block_until_ready);
    the end-to-end number (fresh H2D each call) is reported alongside."""
    import jax

    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.ops.viterbi import argmax_path_batch

    m = model_from_trace(f"{DATA}/reads/read1.npy", "poreover")
    y = m.log_prob.astype(np.float32)
    T = len(y)

    yb1 = y[None]
    _ = np.asarray(argmax_path_batch(yb1))  # warm (compile)
    lat = _best_of(lambda: np.asarray(argmax_path_batch(yb1)))
    B = 128
    yb = np.broadcast_to(y, (B, T, y.shape[1])).copy()
    yb_dev = jax.device_put(yb)
    _ = argmax_path_batch(yb_dev).block_until_ready()
    dev = _best_of(lambda: argmax_path_batch(yb_dev).block_until_ready())
    _ = np.asarray(argmax_path_batch(yb))
    e2e = _best_of(lambda: np.asarray(argmax_path_batch(yb)), n=2)

    # host->device link bandwidth (context for the e2e number: on this
    # dev chip the probs travel a tunneled link; production PCIe makes
    # the same transfer negligible)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(yb.copy()))
    h2d_mb_s = yb.nbytes / 1e6 / (time.perf_counter() - t0)

    # pipelined e2e: the production driver dispatches every wave (H2D +
    # kernel, async) before fetching any result (_decode_batched), so
    # transfer of wave i+1 overlaps compute of wave i
    WV = 32

    def run_pipelined():
        handles = [
            argmax_path_batch(jax.device_put(yb[i:i + WV]))
            for i in range(0, B, WV)
        ]
        return [np.asarray(h) for h in handles]

    _ = run_pipelined()
    e2e_pipe = _best_of(run_pipelined, n=2)
    # the tunnel sometimes moves one big jit-managed transfer faster than
    # four device_puts; report throughput from the better path
    e2e_best = min(e2e, e2e_pipe)

    # single-core numpy baseline — the reference's decode path
    # (transducer.py:72-73: per-step argmax + gap collapse, numpy)
    cpu = _best_of(lambda: [np.argmax(y, axis=1) for _ in range(B)], n=2)

    # ---- fused call+decode (r5, VERDICT item 7): signal -> sequence in
    # one device program; only [T] f32 signal + [T] int8 path cross the
    # link (vs [T,5] probs each way in the reference's two-stage
    # pipeline). Gated on byte-equality with the unfused call -> .npy ->
    # viterbi-decode pipeline on data/read.fast5.
    fused_stats = {}
    try:
        fused_stats = _bench_fused_viterbi()
    except Exception:
        log("fused call+decode bench FAILED (non-fatal)")
        traceback.print_exc(file=sys.stderr)

    RESULTS["viterbi"] = dict(
        **fused_stats,
        reads_per_s=round(B / dev, 3),
        bases_per_s=round(B * T / dev, 1),
        single_read_latency_s=round(lat, 5),
        tpu_s=round(dev, 5),
        e2e_s=round(e2e, 5),
        e2e_pipelined_s=round(e2e_pipe, 5),
        reads_per_s_e2e=round(B / e2e_best, 3),
        h2d_mb_s=round(h2d_mb_s, 1),
        cpu_s=round(cpu, 5),
        vs_baseline=round(cpu / dev, 3),
        vs_baseline_e2e=round(cpu / e2e_best, 3),
    )
    log(f"viterbi: T={T} batch{B} device={dev*1e3:.2f}ms (incl H2D "
        f"{e2e*1e3:.2f}ms) cpu={cpu*1e3:.2f}ms ({cpu/dev:.2f}x device, "
        f"{cpu/e2e:.2f}x e2e); single-read latency {lat*1e3:.1f}ms")


# --------------------------------------------------------------------------
# workload 2: 1D beam search over data/reads
# --------------------------------------------------------------------------

_SAT_READS_CACHE = []


def _sat_reads():
    """All 12 distinct bundled reads (VERDICT r4 item 2): the 2 .npy
    probabilities plus checkpoint-124 basecalls of the 10 fast5s."""
    if _SAT_READS_CACHE:
        return list(_SAT_READS_CACHE)
    from poreover_tpu.io.trace import model_from_trace

    ys = []
    for name in ("read1.npy", "read2.npy"):
        m = model_from_trace(f"{DATA}/reads/{name}", "poreover")
        ys.append(m.log_prob)
    try:
        fast5s = sorted(
            f for f in os.listdir(f"{DATA}/reads") if f.endswith(".fast5"))
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            npys = _call_fast5s_to_npy(
                td, [f"{DATA}/reads/{f}" for f in fast5s])
            for k in sorted(npys):
                if os.path.exists(npys[k]):
                    ys.append(np.load(npys[k]))
            log(f"sat reads: basecalled {len(ys)-2} fast5s in "
                f"{time.perf_counter()-t0:.1f}s -> {len(ys)} distinct reads")
    except Exception:
        log("sat reads: fast5 basecall failed, using the 2 .npy reads")
        traceback.print_exc(file=sys.stderr)
    _SAT_READS_CACHE.extend(ys)
    return list(ys)


def bench_beam():
    import jax

    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.ops.beam import beam_search_batch

    ys = []
    for name in ("read1.npy", "read2.npy"):
        m = model_from_trace(f"{DATA}/reads/{name}", "poreover")
        ys.append(m.log_prob)
    total_T = sum(len(y) for y in ys)

    seqs = beam_search_batch(ys, beam_width=25)  # warm
    seqs, tpu, tpu_med = _timed(
        lambda: beam_search_batch(ys, beam_width=25), n=3)

    # single-core CPU baseline: fresh C++ trie beam, the reference's
    # algorithm class (BeamSearch.h:18-58; native/beam1d_cpu.cpp)
    from poreover_tpu import native

    t0 = time.perf_counter()
    seqs_cpu = [native.beam_search_1d_cpu(y, beam_width=25) for y in ys]
    cpu = time.perf_counter() - t0
    idents = []
    for a, b in zip(seqs, seqs_cpu):
        x, z = native.global_pair_banded(a, b)
        idents.append(sum(c == d for c, d in zip(x, z)) / max(len(x), 1))

    # saturated throughput: the scan's per-step cost is nearly flat in the
    # vmap batch axis, so reads/s/chip is measured at a full wave (the two
    # bundled reads replicated to B=32); outputs asserted identical
    import jax

    SAT_B = int(os.environ.get("BENCH_BEAM_SAT_B", "128"))
    # distinct inputs first (12 bundled reads), replication only beyond
    ys_dist = _sat_reads()
    ys_sat = (ys_dist * ((SAT_B + len(ys_dist) - 1) // len(ys_dist)))[:SAT_B]
    # XLA-engine reference outputs for the distinct set (the correctness
    # gate for the kernel's saturated run)
    want_dist = list(seqs) + beam_search_batch(ys_dist[2:], beam_width=25)
    sat_engine = "xla_scan"
    sat = None
    if jax.default_backend() == "tpu":
        # saturated throughput engine: the Pallas 1D beam kernel
        # (ops/pallas_beam1d.py) — the XLA scan's per-step cost scales
        # with its [B,125,125] equality cubes and plateaus ~6 reads/s;
        # the kernel's lane-table replaces them with [B,128] planes.
        # Device-resident methodology as elsewhere.
        try:
            from poreover_tpu.ops.pallas_beam1d import (
                fetch_beam1d, launch_beam1d, prepare_beam1d,
            )

            # length-bucketed waves, the production driver's batching
            # shape (_pad_bucket groups): one max-padded B=128 launch
            # wastes ~35% of its steps on padding with this length mix
            # (35-94k) and the kernel's per-step cost is B-linear beyond
            # B~64 — two bucketed B=64 launches measured 1.54x faster
            # (scratch/beam_bucket.py)
            order = sorted(range(len(ys_dist)), key=lambda i: len(ys_dist[i]))
            half = len(order) // 2
            buckets = [order[:half], order[half:]]
            per_b = SAT_B // len(buckets)
            sels = [(idx * ((per_b + len(idx) - 1) // len(idx)))[:per_b]
                    for idx in buckets]
            t0 = time.perf_counter()
            preps = [prepare_beam1d([ys_dist[i] for i in sel],
                                    beam_width=25) for sel in sels]

            def run_sat():
                hs = [(p, launch_beam1d(p)) for p in preps]
                return [s for p, h in hs for s in fetch_beam1d(p, h)]

            out_sat = run_sat()  # warm
            log(f"beam[sat pallas {len(buckets)}x{per_b} bucketed]: warm "
                f"(incl compile) {time.perf_counter() - t0:.1f}s")
            out_sat, sat, _ = _timed(run_sat, n=3)
            flat_sel = [i for sel in sels for i in sel]
            assert all(out_sat[k] == want_dist[flat_sel[k]]
                       for k in range(SAT_B)), \
                "pallas beam1d outputs diverge from XLA engine"
            sat_engine = "pallas_beam1d_bucketed"
            ys_sat = [ys_dist[i] for i in flat_sel]
        except Exception:
            log("beam sat: pallas_beam1d FAILED, falling back to XLA")
            traceback.print_exc(file=sys.stderr)
            sat = None
    if sat is None:
        out_sat = beam_search_batch(ys_sat, beam_width=25)  # warm
        out_sat, sat, _ = _timed(
            lambda: beam_search_batch(ys_sat, beam_width=25), n=3)
        assert all(out_sat[i] == want_dist[i % len(ys_dist)]
                   for i in range(SAT_B)), "1D beam sat outputs diverge"
    total_T_sat = sum(len(y) for y in ys_sat)
    # CPU cost scales with time steps: normalize the measured single-core
    # s/step to the saturated set's length mix
    cpu_s_per_step = cpu / total_T
    vs_sat = cpu_s_per_step * total_T_sat / sat

    fused_stats = {}
    if jax.default_backend() == "tpu":
        try:
            fused_stats = _bench_fused_beam()
        except Exception:
            log("fused call+beam bench FAILED (non-fatal)")
            traceback.print_exc(file=sys.stderr)

    RESULTS["beam"] = dict(
        **fused_stats,
        reads_per_s=round(len(ys) / tpu, 3),
        bases_per_s=round(total_T / tpu, 1),
        tpu_s=round(tpu, 3), tpu_s_med=round(tpu_med, 3),
        cpu_s=round(cpu, 3),
        vs_baseline=round(cpu / tpu, 3),
        sat_engine=sat_engine,
        sat_batch=SAT_B,
        distinct_inputs=len(ys_dist),
        sat_s=round(sat, 3),
        reads_per_s_sat=round(SAT_B / sat, 3),
        # beam cells = time steps x candidate slots (W*(A+1)) per read
        cells_per_s_sat=round(total_T_sat * 25 * 5 / sat, 1),
        vs_baseline_sat=round(vs_sat, 3),
        seq_lens=[len(s) for s in seqs],
        min_cpu_identity=round(min(idents), 5),
    )
    log(f"beam25: {len(ys)} reads T={total_T} tpu={tpu:.2f}s cpu={cpu:.2f}s "
        f"({cpu/tpu:.2f}x, min_ident={min(idents):.4f}); "
        f"sat B={SAT_B} ({len(ys_dist)} distinct) {sat:.2f}s "
        f"{SAT_B/sat:.2f} reads/s ({vs_sat:.1f}x single-core)")


# --------------------------------------------------------------------------
# workload 3: flip-flop decode of the bundled traces
# --------------------------------------------------------------------------

def bench_flipflop():
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.ops.viterbi import viterbi_path_masked_batch

    models = [
        model_from_trace(f"{DATA}/guppy_flipflop.fast5", "guppy"),
        model_from_trace(f"{DATA}/flappie_trace.hdf5", "flappie"),
    ]
    ys = [m.log_prob.astype(np.float32) for m in models]
    mask = models[0].transition
    total_T = sum(len(y) for y in ys)

    _ = viterbi_path_masked_batch(ys, mask)  # warm
    _, tpu, tpu_med = _timed(
        lambda: viterbi_path_masked_batch(ys, mask), n=3)

    # single-core numpy viterbi baseline (the reference's transducer.py:35-59)
    def np_viterbi(y, trans):
        T, S = y.shape
        v = y[0].copy()
        ptr = np.zeros((T, S), np.int32)
        tt = trans.T
        for t in range(1, T):
            sc = tt + v[None, :]
            ptr[t] = np.argmax(sc, axis=1)
            v = y[t] + np.max(sc, axis=1)
        return v

    cpu = _best_of(lambda: [np_viterbi(y, mask) for y in ys], n=1)

    # ---- flip-flop BEAM through the Pallas lane-table kernel (r5: the
    # generalized 2-state kernel covers ctc_flipflop; before, flip-flop
    # beam fell back to the ~125x-slower XLA scan). Gate: == XLA engine.
    beam_stats = {}
    import jax

    if jax.default_backend() == "tpu":
        try:
            from poreover_tpu.ops.beam import beam_search_batch
            from poreover_tpu.ops.pallas_beam1d import (
                fetch_beam1d, launch_beam1d, prepare_beam1d,
            )

            t0 = time.perf_counter()
            prep = prepare_beam1d(ys, beam_width=25, model="ctc_flipflop")
            out_b = fetch_beam1d(prep, launch_beam1d(prep))
            log(f"flipflop[beam pallas]: warm (incl compile) "
                f"{time.perf_counter()-t0:.1f}s")
            out_b, beam_s, _ = _timed(
                lambda: fetch_beam1d(prep, launch_beam1d(prep)), n=3)
            want = beam_search_batch(ys, beam_width=25,
                                     model="ctc_flipflop")
            assert out_b == want, "pallas flipflop beam diverges from XLA"
            beam_stats = dict(
                beam_engine="pallas_beam1d",
                beam_s=round(beam_s, 3),
                beam_reads_per_s=round(len(ys) / beam_s, 3),
            )
            log(f"flipflop[beam]: {beam_s:.2f}s "
                f"({len(ys)/beam_s:.2f} reads/s, outputs == XLA engine)")
        except Exception:
            log("flipflop beam kernel FAILED (non-fatal)")
            traceback.print_exc(file=sys.stderr)

    RESULTS["flipflop"] = dict(
        reads_per_s=round(len(ys) / tpu, 3),
        bases_per_s=round(total_T / tpu, 1),
        tpu_s=round(tpu, 3), tpu_s_med=round(tpu_med, 3),
        cpu_s=round(cpu, 3),
        vs_baseline=round(cpu / tpu, 3),
        **beam_stats,
    )
    log(f"flipflop: {len(ys)} traces T={total_T} tpu={tpu:.3f}s "
        f"cpu={cpu:.2f}s ({cpu/tpu:.1f}x)")


# --------------------------------------------------------------------------
# workload 4 (HEADLINE): pair-decode data/pairs.txt
# --------------------------------------------------------------------------

def _call_fast5s_to_npy(tmpdir: str, fast5s: list) -> dict:
    """Basecall fast5 reads with the bundled checkpoint -> .npy probs."""
    from types import SimpleNamespace
    from poreover_tpu.network.call import call

    args = SimpleNamespace(
        **{"in": f"{DATA}/reads"}, out=None, dir=tmpdir, weights=None,
        model=None, scaling="standard", use_id=False, window=1000,
        format="npy", no_stack=False,
    )
    call(args)
    return {os.path.splitext(os.path.basename(f))[0]: os.path.join(
        tmpdir, os.path.splitext(os.path.basename(f))[0] + ".npy")
        for f in fast5s}


def _pair_saturation(workloads, seqs_tpu, cpu_time, cells):
    """Saturated pair throughput on DISTINCT real-scale inputs (VERDICT
    r4 item 2: no more 5-pairs-replicated headlines): the bundled real
    pairs plus synthetic 35-60k-step pairs with pipeline-built envelopes.

    Engines: (a) the full-pair segmented box kernel — one launch, every
    pair in its own lane, flat-in-B control + lazy-map hot-window vector
    work; (b) pipelined waves of 5 through the general kernel (the
    production --threads path). Cross-engine outputs are asserted equal
    (independent engines, bit-identical windowed-memo semantics).

    The single-core CPU baseline (unbounded-trie C++) is timed on the
    real pairs plus two synthetic pairs and extrapolated per-cell to the
    full set (running it on every pair would take ~10 min/rep)."""
    from poreover_tpu import native
    from poreover_tpu.ops.pallas_pair_beam_batch import (
        fetch_prepared, launch_prepared, prepare_pairs,
    )

    n_real = len(workloads)
    SAT_PAIRS = int(os.environ.get("BENCH_PAIR_SAT", "32"))
    t0 = time.perf_counter()
    synth = synth_pair_workloads(max(SAT_PAIRS - n_real, 0))
    wl_sat = list(workloads) + synth
    n_sat = len(wl_sat)
    sat_cells = sum(int(np.sum(env[:, 1] - env[:, 0]))
                    for _, _, env in wl_sat)
    log(f"pair sat: {n_sat} distinct pairs ({n_real} real + "
        f"{len(synth)} synthetic), {sat_cells/1e6:.1f}M cells, built in "
        f"{time.perf_counter()-t0:.1f}s")

    best_rate, sat_shape, out_ref = 0.0, None, None

    # (a) full-pair segmented engine, one launch, device-resident
    try:
        from poreover_tpu.ops.pallas_box_beam import (
            fetch_prepared_box, launch_prepared_box, prepare_pairs_box,
        )

        t0 = time.perf_counter()
        prep_box = prepare_pairs_box(wl_sat, beam_width=5)
        out_box = fetch_prepared_box(prep_box, launch_prepared_box(prep_box))
        log(f"pair[sat box B={prep_box['B']}]: warm (incl compile) "
            f"{time.perf_counter()-t0:.1f}s")
        out_box, box_s, _ = _timed(
            lambda: fetch_prepared_box(prep_box,
                                       launch_prepared_box(prep_box)), n=3)
        assert all(out_box[i] == seqs_tpu[i] for i in range(n_real)), \
            "box engine diverges from headline engine on the real pairs"
        out_ref = out_box
        best_rate, sat_shape = n_sat / box_s, f"box_1x{n_sat}"
        log(f"pair[sat box]: {box_s:.2f}s = {2*n_sat/box_s:.2f} reads/s")
    except Exception:
        log("pair sat: box engine FAILED (non-fatal)")
        traceback.print_exc(file=sys.stderr)

    # (b) pipelined waves through the general kernel, sweeping the wave
    # size: the kernel's per-step cost is nonlinear in B (fixed overhead
    # amortizes up to ~B=8, then the per-pair eviction regions dominate),
    # so the optimum is measured per run rather than assumed
    for wave_sz in (5, 8):
        try:
            prepsN = [prepare_pairs(wl_sat[k:k + wave_sz], beam_width=5)
                      for k in range(0, n_sat, wave_sz)]

            def run_waves(prepsN=prepsN):
                hs = [(p, launch_prepared(p)) for p in prepsN]
                return [s for p, h in hs for s in fetch_prepared(p, h)]

            outw = run_waves()  # warm
            outw, satw, _ = _timed(run_waves, n=3)
            if out_ref is not None:
                assert outw == out_ref, \
                    "general-kernel wave outputs diverge across engines"
            else:
                assert all(outw[i] == seqs_tpu[i] for i in range(n_real)), \
                    "wave outputs diverge from headline engine"
                out_ref = outw
            rate = n_sat / satw
            log(f"pair[sat {len(prepsN)}x{wave_sz} pipelined]: {satw:.2f}s "
                f"= {2*rate:.2f} reads/s (best so far {2*best_rate:.2f})")
            if rate > best_rate:
                best_rate, sat_shape = rate, f"{len(prepsN)}x{wave_sz}"
        except Exception:
            log(f"pair sat: general-kernel waves of {wave_sz} FAILED "
                "(non-fatal)")
            traceback.print_exc(file=sys.stderr)

    if not best_rate:
        raise RuntimeError("no saturation engine succeeded")

    # CPU baseline: measured cells/s on the real pairs (+2 synthetic),
    # extrapolated per-cell to the full distinct set
    sub = synth[:2]
    t0 = time.perf_counter()
    for y1, y2, env in sub:
        native.pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
    cpu_sub_s = time.perf_counter() - t0
    sub_cells = sum(int(np.sum(env[:, 1] - env[:, 0])) for _, _, env in sub)
    cpu_cells_per_s = (cells + sub_cells) / (cpu_time + cpu_sub_s)
    cpu_pairs_per_s = cpu_cells_per_s / (sat_cells / n_sat)
    return dict(
        sat_batch=n_sat,
        sat_shape=sat_shape,
        distinct_inputs=n_sat,
        sat_s=round(n_sat / best_rate, 3),
        reads_per_s_sat=round(2.0 * best_rate, 3),
        cells_per_s_sat=round(sat_cells / n_sat * best_rate, 1),
        vs_baseline_sat=round(best_rate / cpu_pairs_per_s, 3),
        sat_baseline_note=(
            f"cpu cells/s measured on {n_real} real + {len(sub)} "
            f"synthetic pairs ({cpu_cells_per_s:.0f} cells/s), "
            "extrapolated per-cell to the full distinct set"),
    )


def bench_pair():
    from poreover_tpu import native

    # ---- assemble the pairs.txt workload; fall back to the bundled pair
    workloads = []
    extras = []
    try:
        with open(f"{DATA}/pairs.txt") as f:
            pair_names = [line.split() for line in f if line.split()]
        fast5s = sorted({f"{DATA}/reads/{n}" for p in pair_names for n in p})
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            npys = _call_fast5s_to_npy(td, fast5s)
            npys = {k: v for k, v in npys.items() if os.path.exists(v)}
            log(f"pair: basecalled {len(npys)} fast5 reads in "
                f"{time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            for n1, n2 in pair_names:
                s1 = os.path.splitext(n1)[0]
                s2 = os.path.splitext(n2)[0]
                *wl, ex = build_pair_workload(npys[s1], npys[s2],
                                              with_alignment=True)
                workloads.append(tuple(wl))
                extras.append(ex)
            log(f"pair: built {len(workloads)} envelopes in "
                f"{time.perf_counter()-t0:.1f}s")
    except Exception:
        log("pair: pairs.txt pipeline failed, using bundled read1/read2 pair")
        traceback.print_exc(file=sys.stderr)
        *wl, ex = build_pair_workload(f"{DATA}/reads/read1.npy",
                                      f"{DATA}/reads/read2.npy",
                                      with_alignment=True)
        workloads = [tuple(wl)]
        extras = [ex]

    n_pairs = len(workloads)
    cells = sum(int(np.sum(env[:, 1] - env[:, 0])) for _, _, env in workloads)
    log(f"pair: {n_pairs} pairs, {cells/1e6:.2f}M envelope cells")

    # ---- TPU: batched Pallas kernel, with graceful fallbacks ----
    # Methodology (same as the viterbi row, VERDICT r2 item 4): tpu_s is
    # the device-resident time (inputs pre-transferred; includes kernel,
    # provenance D2H and host traceback) — production pipelines the H2D of
    # the next wave under the compute of the current one (decoding/pair
    # _batched_consensus). e2e_s is a full fresh call incl. host prep +
    # H2D over this dev chip's ~20 MB/s tunnel, reported alongside.
    seqs_tpu, engine, tpu_time = None, None, float("inf")
    tpu_med = e2e_s = None

    def try_pallas_resident():
        nonlocal seqs_tpu, engine, tpu_time, tpu_med, e2e_s
        from poreover_tpu.ops.pallas_pair_beam_batch import (
            fetch_prepared, launch_prepared, prepare_pairs,
        )

        t0 = time.perf_counter()
        prep = prepare_pairs(workloads, beam_width=5)
        out = fetch_prepared(prep, launch_prepared(prep))
        log(f"pair[pallas_batch]: warm (incl compile) "
            f"{time.perf_counter() - t0:.1f}s")
        out, tpu_time, tpu_med = _timed(
            lambda: fetch_prepared(prep, launch_prepared(prep)), n=3)
        _, e2e_s, _ = _timed(
            lambda: fetch_prepared(p := prepare_pairs(workloads,
                                                      beam_width=5),
                                   launch_prepared(p)), n=2)
        seqs_tpu, engine = out, "pallas_batch"

    def try_engine(name, fn):
        nonlocal seqs_tpu, engine, tpu_time, tpu_med
        if seqs_tpu is not None:
            return
        try:
            if fn is None:
                try_pallas_resident()
                return
            t0 = time.perf_counter()
            out = fn()
            warm = time.perf_counter() - t0
            log(f"pair[{name}]: warm (incl compile) {warm:.1f}s")
            out, tpu_time, tpu_med = _timed(fn, n=3)
            seqs_tpu, engine = out, name
        except Exception:
            log(f"pair[{name}]: FAILED, falling back")
            traceback.print_exc(file=sys.stderr)

    def run_pallas_single():
        from poreover_tpu.ops.pallas_pair_beam import pair_beam_pallas
        return [pair_beam_pallas(y1, y2, env, beam_width=5)
                for y1, y2, env in workloads]

    def run_xla():
        from poreover_tpu.ops.beam2d_planned import (
            beam_search_2d_planned_batch,
        )
        return beam_search_2d_planned_batch(workloads, beam_width=5)

    try_engine("pallas_batch", None)
    try_engine("pallas_single", run_pallas_single)
    try_engine("xla_planned", run_xla)
    if seqs_tpu is None:
        RESULTS["pair"] = dict(error="all TPU engines failed")
        return

    # ---- CPU baseline: single-core C++ trie with the reference's
    # UNBOUNDED per-node memos (PrefixTree.h semantics) — the trie_match
    # stat below therefore measures the windowed-memo TPU engines against
    # reference semantics, while oracle_exact measures them against the f64
    # windowed-memo oracle (same intended semantics, double precision) ----
    t0 = time.perf_counter()
    seqs_cpu = [
        native.pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
        for y1, y2, env in workloads
    ]
    cpu_time = time.perf_counter() - t0

    # correctness: (a) vs the f64 windowed-memo oracle — same semantics,
    # double precision; occasional sub-n/n here is an f32 near-tie flip
    # (verified: the independent XLA f32 engine produces the identical
    # sequence), see docs/EXACTNESS.md; (b) semantic gap vs the unbounded
    # trie — bounded, same doc
    oracle_match = sum(
        native.pair_beam_row_col_cpu_emul(y1, y2, env, beam_width=5) == s
        for (y1, y2, env), s in zip(workloads, seqs_tpu)
    )
    n_match = sum(a == b for a, b in zip(seqs_tpu, seqs_cpu))
    idents = []
    for a, b in zip(seqs_tpu, seqs_cpu):
        x, z = native.global_pair_banded(a, b)
        idents.append(sum(c == d for c, d in zip(x, z)) / max(len(x), 1))
    reads_per_s = 2.0 * n_pairs / tpu_time
    vs = cpu_time / tpu_time

    # ---- the literal reference implementation, single core (BeamSearch.h
    # header C++ timed directly; within ~7% of our reimplemented oracle)
    cpu_ref = bench_reference_cpu(workloads)

    # ---- saturated throughput: the chip is latency-bound at B=5 (the
    # kernel is a sequential plan-step grid whose per-step cost is far
    # below the VPU/MXU roofline); reads/s/chip — the BASELINE.md
    # north-star metric — is measured by replicating the 5 pairs
    # round-robin to a larger lockstep batch in ONE launch (the round-2
    # B=20 attempt OOMed VMEM; the HBM emission rings fixed that).
    # Outputs are asserted identical to the unreplicated run.
    sat = {}
    if engine == "pallas_batch":
        try:
            sat = _pair_saturation(workloads, seqs_tpu, cpu_time, cells)
        except Exception:
            log("pair saturation measurement FAILED (non-fatal)")
            traceback.print_exc(file=sys.stderr)

    RESULTS["pair"] = dict(
        engine=engine, n_pairs=n_pairs,
        reads_per_s=round(reads_per_s, 3),
        cells_per_s=round(cells / tpu_time, 1),
        bases_per_s=round(sum(len(s) for s in seqs_tpu) / tpu_time, 1),
        tpu_s=round(tpu_time, 3), tpu_s_med=round(tpu_med, 3),
        **({"e2e_s": round(e2e_s, 3)} if e2e_s else {}),
        cpu_s=round(cpu_time, 3),
        vs_baseline=round(vs, 3),
        oracle_exact=f"{oracle_match}/{n_pairs}",
        trie_match=f"{n_match}/{n_pairs}",
        min_trie_identity=round(min(idents), 5),
        # measurement provenance (VERDICT r2 item 9): what each stat
        # compares against
        baselines=dict(
            cpu_s="native/pair_beam_cpu.cpp f64 UNBOUNDED trie "
                  "(reference PrefixTree.h semantics, reimplemented)",
            cpu_ref_s="the reference's own BeamSearch.h header C++, "
                      "compiled from /root/reference (row_col, f64)",
            oracle_exact="vs pair_beam_row_col_cpu_emul: f64 "
                         "windowed-memo oracle (the TPU engines' intended "
                         "semantics)",
            trie_match="vs the unbounded trie (reference semantics)",
        ),
        **({"cpu_ref_s": round(cpu_ref, 3),
            "vs_reference": round(cpu_ref / tpu_time, 3)}
           if cpu_ref else {}),
        **sat,
    )
    log(f"pair[{engine}]: {n_pairs} pairs tpu={tpu_time:.2f}s "
        f"cpu={cpu_time:.2f}s refC++={cpu_ref if cpu_ref else -1:.2f}s "
        f"({vs:.2f}x) "
        f"oracle_exact={oracle_match}/{n_pairs} "
        f"trie_match={n_match}/{n_pairs} "
        f"min_trie_ident={min(idents):.4f} "
        f"{cells/tpu_time/1e6:.2f}M cells/s")

    # ---- anchored fast mode (--skip_matches, the reference's own fast
    # flag at its default threshold): boxes across all pairs become
    # lockstep kernel lanes; CPU comparison runs the SAME anchored
    # algorithm single-core (apples to apples), and the quality trade-off
    # vs the full-envelope consensus is reported, not hidden.
    try:
        bench_pair_anchored(workloads, extras, seqs_cpu, cpu_time)
    except Exception:
        log("pair_fast (anchored) measurement FAILED (non-fatal)")
        traceback.print_exc(file=sys.stderr)

    try:
        bench_pair_exact(workloads, seqs_cpu, cpu_time)
    except Exception:
        log("pair_exact measurement FAILED (non-fatal)")
        traceback.print_exc(file=sys.stderr)

    try:
        if len(workloads) > 1:
            bench_pair_f64(workloads, seqs_tpu)
    except Exception:
        log("pair_f64 measurement FAILED (non-fatal)")
        traceback.print_exc(file=sys.stderr)


def bench_pair_anchored(workloads, extras, seqs_full_cpu, cpu_full_s,
                        threshold: int = 10):
    """Anchored --skip_matches mode through the production box-batch
    engine (ops/pallas_box_beam.py via decoding.pair.batched_box_decode):
    every anchor box across every pair becomes a lane segment of ONE
    segmented Pallas launch (reference pair_decode.py:412-452,510-522)."""
    from poreover_tpu import native
    from poreover_tpu.decoding.pair import (
        anchored_box_workloads, batched_box_decode,
    )

    n_pairs = len(workloads)
    flat = []      # (pair_idx, sort_key, (y1, y2, env))
    anchors = []   # per pair: [(key, seq)]
    for (y1, y2, env), ex in zip(workloads, extras):
        bw, anc = anchored_box_workloads(
            y1, y2, env, ex["alignment"], ex["s2s1"], ex["s2s2"],
            matches=threshold)
        if bw is None:
            log("pair_fast: a pair has no anchors; skipping workload")
            return
        anchors.append(anc)
        for (k, y1s, y2s, envs) in bw:
            flat.append((len(anchors) - 1, k, (y1s, y2s, envs)))

    box_wls = [flat[j][2] for j in range(len(flat))]
    log(f"pair_fast: thr={threshold} {len(flat)} boxes -> box-batch kernel")

    t0 = time.perf_counter()
    box_seqs = batched_box_decode(box_wls, beam_width=5)
    warm = time.perf_counter() - t0
    log(f"pair_fast: warm (incl compiles) {warm:.1f}s")
    box_seqs, tpu_time, tpu_med = _timed(
        lambda: batched_box_decode(box_wls, beam_width=5), n=3)

    # CPU: the SAME anchored decomposition, single-core unbounded trie
    t0 = time.perf_counter()
    box_cpu = [native.pair_beam_row_col_cpu(*box_wls[j], beam_width=5)
               for j in range(len(flat))]
    cpu_time = time.perf_counter() - t0

    def stitch(seq_of):
        parts = [list(a) for a in anchors]
        for j, (pi, k, _) in enumerate(flat):
            parts[pi].append((k, seq_of(j)))
        return ["".join(s for _, s in sorted(p)) for p in parts]

    stitched = stitch(lambda j: box_seqs[j])
    stitched_cpu = stitch(lambda j: box_cpu[j])
    box_match = sum(box_seqs[j] == box_cpu[j] for j in range(len(flat)))

    # ---- classify every box mismatch (VERDICT r4 item 4a): the CPU
    # comparison above is the f64 UNBOUNDED trie, so a mismatch can be
    # (1) windowed-memo semantics (the TPU engines' documented contract,
    #     docs/EXACTNESS.md) — Pallas == the f64 windowed-memo oracle;
    # (2) an f32 near-tie — Pallas == the independent f32 XLA engine,
    #     both != the f64 oracle;
    # (3) a kernel bug — Pallas disagrees with BOTH. Must be zero.
    mm_sem = mm_tie = mm_bug = 0
    if box_match < len(flat):
        from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

        for j in range(len(flat)):
            if box_seqs[j] == box_cpu[j]:
                continue
            y1s, y2s, envs = box_wls[j]
            if box_seqs[j] == native.pair_beam_row_col_cpu_emul(
                    y1s, y2s, envs, beam_width=5):
                mm_sem += 1
            elif box_seqs[j] == beam_search_2d_planned(
                    y1s, y2s, envs, beam_width=5):
                mm_tie += 1
            else:
                mm_bug += 1
        log(f"pair_fast: {len(flat)-box_match} box mismatches vs trie = "
            f"{mm_sem} windowed-memo semantics + {mm_tie} f32 ties + "
            f"{mm_bug} UNEXPLAINED")
    ident_full = [
        _aligned_identity(s, f) for s, f in zip(stitched, seqs_full_cpu)]
    ident_cpu = [
        _aligned_identity(s, f) for s, f in zip(stitched, stitched_cpu)]

    cells = sum(int(np.sum(e[:, 1] - e[:, 0])) for _, _, (_, _, e) in flat)
    RESULTS["pair_fast"] = dict(
        engine="pallas_box", threshold=threshold,
        n_boxes=len(flat), n_pairs=n_pairs,
        reads_per_s=round(2.0 * n_pairs / tpu_time, 3),
        cells_per_s=round(cells / tpu_time, 1),
        tpu_s=round(tpu_time, 3), tpu_s_med=round(tpu_med, 3),
        cpu_s=round(cpu_time, 3),
        vs_baseline_same_mode=round(cpu_time / tpu_time, 3),
        vs_full_cpu=round(cpu_full_s / tpu_time, 3),
        box_trie_match=f"{box_match}/{len(flat)}",
        box_mismatch_classes=dict(windowed_semantics=mm_sem,
                                  f32_tie=mm_tie, unexplained=mm_bug),
        min_identity_vs_cpu_anchored=round(min(ident_cpu), 5),
        min_identity_vs_full=round(min(ident_full), 5),
        baselines=dict(
            cpu_s="SAME anchored boxes, unbounded trie single-core",
            vs_full_cpu="against the full-envelope unbounded-trie time "
                        "(different output: see min_identity_vs_full)",
        ),
    )
    log(f"pair_fast[thr={threshold}]: {n_pairs} pairs {len(flat)} boxes "
        f"tpu={tpu_time:.2f}s cpu_anchored={cpu_time:.2f}s "
        f"({cpu_time/tpu_time:.1f}x same-mode, "
        f"{cpu_full_s/tpu_time:.1f}x vs full-CPU) "
        f"box_match={box_match}/{len(flat)} "
        f"min_ident_vs_full={min(ident_full):.4f}")


def bench_pair_exact(workloads, seqs_trie_cpu, cpu_full_s):
    """--exact mode (unbounded-memo reference semantics via the graveyard
    engine) on the real pairs, on TPU: resolves the f32 tie-flip question
    empirically (VERDICT r3 item 3). trie_match compares against the
    single-core unbounded C++ trie (PrefixTree.h:74-148 semantics)."""
    from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

    n_pairs = len(workloads)

    # per-pair (B=1): the batch-of-5 exact scan crashes this dev chip's
    # TPU worker (axon runtime fault, reproducible; B=1 runs fine), so the
    # exact row decodes sequentially. One warm pass compiles every pair's
    # geometry; the timed pass is hot.
    def run():
        return [beam_search_2d_planned(y1, y2, env, beam_width=5,
                                       exact=True)
                for y1, y2, env in workloads]

    t0 = time.perf_counter()
    seqs = run()
    warm = time.perf_counter() - t0
    log(f"pair_exact: warm (incl compile) {warm:.1f}s")
    # 2 timed reps (not the single rep ADVICE r4 flagged): the row costs
    # minutes, so 2 is the compromise — min is the headline, med honest
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        seqs = run()
        reps.append(time.perf_counter() - t0)
    tpu_time = min(reps)
    tpu_med = sorted(reps)[len(reps) // 2]

    n_match = sum(a == b for a, b in zip(seqs, seqs_trie_cpu))
    idents = [_aligned_identity(a, b)
              for a, b in zip(seqs, seqs_trie_cpu)]
    cells = sum(int(np.sum(env[:, 1] - env[:, 0]))
                for _, _, env in workloads)
    RESULTS["pair_exact"] = dict(
        engine="xla_planned_exact", n_pairs=n_pairs,
        reads_per_s=round(2.0 * n_pairs / tpu_time, 3),
        cells_per_s=round(cells / tpu_time, 1),
        tpu_s=round(tpu_time, 3), tpu_s_med=round(tpu_med, 3),
        cpu_s=round(cpu_full_s, 3),
        vs_baseline=round(cpu_full_s / tpu_time, 3),
        trie_match=f"{n_match}/{n_pairs}",
        min_trie_identity=round(min(idents), 5),
        baselines=dict(
            cpu_s="native/pair_beam_cpu.cpp f64 UNBOUNDED trie "
                  "(reference PrefixTree.h semantics) on the same pairs",
            trie_match="vs that trie — exact mode targets equality",
        ),
    )
    log(f"pair_exact: {n_pairs} pairs tpu={tpu_time:.2f}s "
        f"({cpu_full_s/tpu_time:.2f}x) trie_match={n_match}/{n_pairs} "
        f"min_ident={min(idents):.5f}")


def bench_pair_f64(workloads, seqs_tpu=None):
    """--f64 probe (VERDICT r4 item 4b): pair 1 — the one bundled pair
    whose f32 output misses the f64 windowed-memo oracle by one indel
    (docs/EXACTNESS.md r5) — decoded in float64 via the XLA engine on the
    HOST CPU (x64 isolated in a subprocess; f64-on-TPU is emulated and
    reproducibly faults this dev chip's axon worker, same fault class as
    the batched exact scan). Measured r5 finding: f64 does NOT recover
    the oracle — it reproduces the f32 engines' 6499-base output exactly,
    so the indel is not precision but one internal beam decision that two
    f64 implementations of the same windowed algorithm resolve
    differently (docs/EXACTNESS.md r5; the oracle's pick scores 6.10 nats
    better under the full-lattice joint objective, scratch/tie_gap.py).
    The row classifies whatever it measures; `--exact` remains the
    byte-parity mode (trie_match 5/5)."""
    import pickle
    import subprocess

    with tempfile.TemporaryDirectory() as td:
        y1, y2, env = workloads[1]
        np.save(f"{td}/y1.npy", y1)
        np.save(f"{td}/y2.npy", y2)
        np.save(f"{td}/env.npy", env)
        code = f"""
import time, numpy as np, sys, json
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned
y1 = np.load({td!r} + "/y1.npy"); y2 = np.load({td!r} + "/y2.npy")
env = np.load({td!r} + "/env.npy")
t0 = time.perf_counter()
s = beam_search_2d_planned(y1, y2, env, beam_width=5)
warm = time.perf_counter() - t0
t0 = time.perf_counter()
s = beam_search_2d_planned(y1, y2, env, beam_width=5)
print(json.dumps(dict(seq=s, warm_s=round(warm, 2),
                      tpu_s=round(time.perf_counter() - t0, 3),
                      backend=jax.default_backend())))
"""
        r = subprocess.run([sys.executable, "-c", code], timeout=3600,
                           capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        info = json.loads(r.stdout.strip().splitlines()[-1])
    from poreover_tpu import native

    oracle = native.pair_beam_row_col_cpu_emul(*workloads[1], beam_width=5)
    oracle_ok = info["seq"] == oracle
    f32_ok = seqs_tpu is not None and info["seq"] == seqs_tpu[1]
    if oracle_ok:
        note = "--f64 CLI flag; f64 recovers the windowed-memo oracle"
    elif f32_ok:
        note = ("f64 reproduces the f32 engines' output, NOT the f64 "
                "C++ oracle: the pair1 indel is a single internal beam "
                "decision two f64 implementations resolve differently, "
                "not f32 rounding (docs/EXACTNESS.md r5); --exact is "
                "the byte-parity mode")
    else:
        note = ("f64 output matches neither the oracle nor the f32 "
                "engines — unclassified, investigate")
    RESULTS["pair_f64"] = dict(
        engine="xla_planned_f64", pair="pair1 (the 1/5 oracle_exact miss)",
        backend=info["backend"], tpu_s=round(info["tpu_s"], 3),
        oracle_exact="1/1" if oracle_ok else "0/1",
        matches_f32_engines="1/1" if f32_ok else "0/1",
        note=note,
    )
    log(f"pair_f64: backend={info['backend']} {info['tpu_s']:.1f}s "
        f"oracle_match={oracle_ok} f32_engine_match={f32_ok}")


# --------------------------------------------------------------------------
# workload 5: NN forward (call)
# --------------------------------------------------------------------------

def bench_call():
    from types import SimpleNamespace
    from poreover_tpu.network.call import call

    with tempfile.TemporaryDirectory() as td:
        args = SimpleNamespace(
            **{"in": f"{DATA}/read.fast5"}, out=None, dir=td,
            weights=None, model=None, scaling="standard", use_id=False,
            window=1000, format="npy", no_stack=False,
        )
        t0 = time.perf_counter()
        call(args)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        call(args)
        hot = time.perf_counter() - t0
        out = [f for f in os.listdir(td) if f.endswith(".npy")]
        probs = np.load(os.path.join(td, out[0]))
    samples = probs.shape[0] if probs.ndim == 2 else (
        probs.shape[0] * probs.shape[1])
    RESULTS["call"] = dict(
        samples=int(samples),
        samples_per_s=round(samples / hot, 1),
        tpu_s=round(hot, 3), warm_s=round(warm, 3),
    )
    log(f"call: {samples} samples tpu={hot:.2f}s "
        f"({samples/hot/1e3:.1f}k samples/s)")


def bench_train():
    """CTC train-step throughput, conv1_bigru3 (the reference trains this
    with tf.compat.v1.nn.ctc_loss, network.py:78-129; data/training.npz is
    not bundled, so a deterministic synthetic set stands in — the compute
    shape is identical: [64, 1000, 1] windows, ~50-label targets)."""
    import jax
    import jax.numpy as jnp
    import optax

    from poreover_tpu.network.model import build_model, init_params
    from poreover_tpu.ops.ctc import ctc_loss

    rng = np.random.default_rng(0)
    B, T, L = 64, 1000, 50
    X = jnp.asarray(rng.normal(size=(B, T, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, size=(B, L)), jnp.int32)
    ylen = jnp.full((B,), L, jnp.int32)

    model = build_model("conv1_bigru3")
    params = init_params(model, jax.random.PRNGKey(0), window=T)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, X, y, ylen):
        def loss_fn(p):
            logits = model.apply({"params": p}, X)
            return jnp.mean(ctc_loss(logits, y, ylen))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, X, y, ylen)
    float(loss)
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, X, y, ylen)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    RESULTS["train"] = dict(
        batch=B, window=T,
        steps_per_s=round(1.0 / best, 3),
        samples_per_s=round(B * T / best, 1),
        tpu_s=round(best, 4), warm_s=round(warm, 2),
        loss=round(float(loss), 4),
    )
    log(f"train: conv1_bigru3 B={B} T={T} {best*1e3:.1f}ms/step "
        f"({B*T/best/1e3:.0f}k samples/s) loss={float(loss):.3f}")


def main() -> None:
    for name, fn in [
        ("viterbi", bench_viterbi),
        ("beam", bench_beam),
        ("flipflop", bench_flipflop),
        ("call", bench_call),
        ("train", bench_train),
        ("pair", bench_pair),
    ]:
        try:
            fn()
        except Exception:
            log(f"workload {name} FAILED")
            traceback.print_exc(file=sys.stderr)
            RESULTS[name] = dict(error="failed; see stderr")
    for name in list(RESULTS):
        _note_prev(name)

    with open(_RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"full results: {json.dumps(RESULTS)}")

    pair = RESULTS.get("pair", {})
    # headline = reads/s/chip (BASELINE.md north-star): the saturated
    # measurement when available, else the as-is pairs.txt batch
    print(json.dumps({
        "metric": "pair_decode_reads_per_s",
        "value": pair.get("reads_per_s_sat", pair.get("reads_per_s", 0.0)),
        "unit": "reads/s",
        "vs_baseline": pair.get("vs_baseline_sat",
                                pair.get("vs_baseline", 0.0)),
    }))


if __name__ == "__main__":
    main()
