"""Direct (slow, hashmap-based) replica of the reference 2D by-row beam
search, for differential testing of the vectorized kernel.

Ports the semantics of BeamSearch.h:110-260 + PrefixTree.h 2D node updates
+ Beam.h pruning verbatim: per-node per-read hashmaps keyed by t, pointer
dedup, node_greater_max comparator, reset_max at row starts.
"""
from __future__ import annotations

import numpy as np

NEG = -np.inf


def lse(a, b):
    return np.logaddexp(a, b)


class Node2D:
    __slots__ = (
        "last", "parent", "children", "depth",
        "p", "pa", "pb",  # per-read maps: total, comp_a, comp_b
        "last_t", "last_prob", "max_prob", "max_t",
    )

    def __init__(self, last, parent):
        self.last = last
        self.parent = parent
        self.children = []
        self.depth = 0 if parent is None else parent.depth + 1
        self.p = [{}, {}]
        self.pa = [{}, {}]
        self.pb = [{}, {}]
        self.last_t = [0, 0]
        self.last_prob = [0.0, 0.0]
        self.max_prob = [NEG, NEG]
        self.max_t = [0, 0]

    def at(self, i, t):
        return self.p[i].get(t, NEG)

    def set_prob(self, i, t, a_val, b_val):
        tot = lse(a_val, b_val)
        self.p[i][t] = tot
        self.pa[i][t] = a_val
        self.pb[i][t] = b_val
        self.last_t[i] = t
        self.last_prob[i] = tot
        if tot > self.max_prob[i]:
            self.max_prob[i] = tot
            self.max_t[i] = t

    def reset_max(self):
        self.max_prob = [NEG, NEG]

    def max_probability(self):
        return self.last_prob[0] + self.max_prob[1]


class Tree2D:
    def __init__(self, y1, y2, alphabet, model):
        self.y = [np.asarray(y1), np.asarray(y2)]
        self.alphabet = alphabet
        self.A = len(alphabet)
        self.model = model
        self.root = Node2D(self.A, None)
        if model == "ctc":
            self.root.p[0][-1] = 0.0
            self.root.p[1][-1] = 0.0
            for i in (0, 1):
                s = 0.0
                for t in range(len(self.y[i])):
                    s += self.y[i][t][self.A]
                    self.root.p[i][t] = s
        elif model == "ctc_merge_repeats":
            for i in (0, 1):
                self.root.p[i][-1] = 0.0
                self.root.pa[i][-1] = 0.0  # gap part
                self.root.pb[i][-1] = NEG
        else:  # ctc_flipflop
            for i in (0, 1):
                self.root.p[i][-1] = 0.0
                self.root.pa[i][-1] = np.log(0.5)
                self.root.pb[i][-1] = np.log(0.5)

    def expand(self, n):
        if not n.children:
            for c in range(self.A):
                n.children.append(Node2D(c, n))
        return n.children

    def label(self, n):
        out = []
        while n is not None and n.parent is not None:
            out.append(self.alphabet[n.last])
            n = n.parent
        return "".join(reversed(out))

    def update(self, n, i, t):
        y = self.y[i]
        if self.model == "ctc":
            emit = n.parent.at(i, t - 1) + y[t][n.last]
            stay = n.at(i, t - 1) + y[t][self.A]
            tot = lse(emit, stay)
            # single-component state: store in comp_a
            n.set_prob(i, t, tot, NEG)
        elif self.model == "ctc_merge_repeats":
            gap = n.at(i, t - 1) + y[t][self.A]
            if n.parent.depth == 0 and t == 0:
                nogap = y[t][n.last]
            elif n.parent.last == n.last:
                nogap = lse(
                    n.parent.pa[i].get(t - 1, NEG) + y[t][n.last],
                    n.pb[i].get(t - 1, NEG) + y[t][n.last],
                )
            else:
                nogap = lse(
                    n.parent.at(i, t - 1) + y[t][n.last],
                    n.pb[i].get(t - 1, NEG) + y[t][n.last],
                )
            n.set_prob(i, t, gap, nogap)
        else:  # flipflop: comp_a = flip, comp_b = flop
            A = self.A
            stay_flip = n.pa[i].get(t - 1, NEG) + y[t][n.last]
            stay_flop = n.pb[i].get(t - 1, NEG) + y[t][n.last + A]
            if n.parent.depth == 0 and t == 0:
                emit_flip = y[t][n.last]
                emit_flop = y[t][n.last + A]
            elif n.parent.last == n.last:
                emit_flip = n.parent.pb[i].get(t - 1, NEG) + y[t][n.last]
                emit_flop = n.parent.pa[i].get(t - 1, NEG) + y[t][n.last + A]
            else:
                emit_flip = (
                    lse(n.parent.pa[i].get(t - 1, NEG), n.parent.pb[i].get(t - 1, NEG))
                    + y[t][n.last]
                )
                emit_flop = NEG
            n.set_prob(i, t, lse(emit_flip, stay_flip), lse(emit_flop, stay_flop))


def beam_search_2d_by_row_replica(
    y1, y2, alphabet="ACGT", beam_width=25, model="ctc", envelope=None,
    return_beam_trace=False,
):
    tree = Tree2D(y1, y2, alphabet, model)
    U, V = len(y1), len(y2)
    beam = []
    for n in tree.expand(tree.root):
        tree.update(n, 0, 0)
        tree.update(n, 1, 0)
        beam.append(n)

    trace = []
    u_range = range(0, U) if envelope is not None else range(1, U)
    for u in u_range:
        if envelope is not None:
            row_start, row_end = int(envelope[u][0]), int(envelope[u][1])
        else:
            row_start, row_end = 0, V
        # u-phase: iterate over the current beam only (bounded by its size;
        # the reference indexes up to beam_width which over-reads early)
        for b in range(min(beam_width, len(beam))):
            n = beam[b]
            tree.update(n, 0, u)
            for child in tree.expand(n):
                tree.update(child, 0, u)
                beam.append(child)
        # v-phase
        for v in range(row_start, row_end):
            for n in beam:
                if v == row_start:
                    n.reset_max()
                tree.update(n, 1, v)
        # prune: pointer-dedup then top-W by comparator
        uniq = list(dict.fromkeys(beam))
        uniq.sort(key=lambda n: n.max_probability(), reverse=True)
        beam = uniq[:beam_width]
        if return_beam_trace:
            trace.append([(tree.label(n), n.max_probability()) for n in beam])
    if return_beam_trace:
        return tree.label(beam[0]), trace
    return tree.label(beam[0])


def beam_search_2d_row_col_replica(
    y1, y2, envelope, alphabet="ACGT", beam_width=25, model="ctc",
    return_beam_trace=False,
):
    """Exact port of beam_search_2d_by_row_col (BeamSearch.h:262-397)."""
    tree = Tree2D(y1, y2, alphabet, model)
    U, V = len(y1), len(y2)
    env = [(int(a), int(b)) for a, b in envelope]
    env_t = [[-1, -1] for _ in range(V)]
    for u in range(U):
        for x in range(env[u][0], min(env[u][1], V)):
            if env_t[x][0] < 0:
                env_t[x] = [u, u + 1]
            else:
                env_t[x][1] += 1

    beam = []
    for n in tree.expand(tree.root):
        tree.update(n, 0, 0)
        tree.update(n, 1, 0)
        beam.append(n)

    u = v = 0
    trace = []
    # the C++ leaves row/col bounds unassigned when the diagonal has passed
    # the envelope segment (BeamSearch.h:309-337 has no else); in practice
    # the stack slots retain the previous iteration's values, so the walk
    # continues with stale windows — reproduced here.
    row_start = row_end = col_start = col_end = 0
    while u <= U - 1 and v <= V - 1:
        row_s, row_e = env[u]
        col_s, col_e_env = env_t[v]
        if row_s <= v < row_e:
            row_start, row_end = v, row_e
        elif v < row_s:
            for b in range(min(beam_width, len(beam))):
                tree.update(beam[b], 1, v)
            v += 1
            continue
        # else: keep stale row bounds
        if col_s >= 0 and col_s <= u < col_e_env:
            col_start, col_end = u, col_e_env
        elif col_s >= 0 and u < col_s:
            for b in range(min(beam_width, len(beam))):
                tree.update(beam[b], 0, u)
            u += 1
            continue
        # else: keep stale col bounds

        beam_size = len(beam)
        for b in range(beam_size):
            n = beam[b]
            tree.update(n, 0, col_start)
            tree.update(n, 1, row_start)
            n.reset_max()
            for ch in tree.expand(n):
                ch.reset_max()
                tree.update(ch, 0, col_start)
                tree.update(ch, 1, row_start)
                beam.append(ch)
        for u_ in range(col_start, col_end):
            for n in beam:
                tree.update(n, 0, u_)
        for v_ in range(row_start, row_end):
            for n in beam:
                tree.update(n, 1, v_)
        uniq = list(dict.fromkeys(beam))
        uniq.sort(key=lambda n: n.max_prob[0] + n.max_prob[1], reverse=True)
        beam = uniq[:beam_width]
        if return_beam_trace:
            trace.append(
                [
                    (tree.label(n), n.max_prob[0], n.max_prob[1])
                    for n in beam
                ]
            )
        u += 1
        v += 1
    if return_beam_trace:
        return tree.label(beam[0]), trace, tree, beam
    return tree.label(beam[0])


def beam_search_2d_grid_replica(
    y1, y2, alphabet="ACGT", beam_width=5, model="ctc", envelope=None,
):
    """Exact port of beam_search_2d_grid (reference BeamSearch2.h:33-184):
    one beam per lattice cell (u, v) with previous beam = (u-1, v-1), all
    beams sharing the global per-node memo trie; node_greater comparator
    (last probability, Beam.h:10-18). Quadratic in the lattice / envelope
    size, like the reference — the reference itself hides this method
    behind a suppressed flag as a benchmark control (__main__.py:89).

    Device-kernel note (r5 analysis): cell (u, v) depends only on
    (u-1, v-1), so the lattice decomposes into independent diagonal
    chains that would batch perfectly onto the 1D lane-table kernel
    (lanes = candidates, rows = diagonals, two emission streams). The
    blocker is semantic, not mechanical: the reference's grid beams
    share ONE unbounded memo trie across all cells, so a fixed-shape
    candidate table would carry the windowed-memo divergence documented
    in docs/EXACTNESS.md and could not be pinned against this replica.
    Given the reference suppresses the method, this host replica (exact
    semantics, cell-guarded) remains the supported form."""
    tree = Tree2D(y1, y2, alphabet, model)
    U, V = len(y1), len(y2)

    empty_beam = []
    for n in tree.expand(tree.root):
        tree.update(n, 0, 0)
        tree.update(n, 1, 0)
        empty_beam.append(n)

    if envelope is None:
        env = [(0, V)] * U
    else:
        env = [(int(a), int(b)) for a, b in envelope]

    # beams stored per cell; with an envelope, cells outside a row's range
    # fall back to the init beam (SparseMatrix default, BeamSearch2.h:135)
    beams = {}
    for u in range(U):
        row_start, row_end = env[u]
        for v in range(row_start, row_end):
            this_beam = []
            prev_beam = (
                beams.get((u - 1, v - 1), empty_beam)
                if (u > 0 and v > 0)
                else empty_beam
            )
            for n in prev_beam:
                tree.update(n, 0, u)
                tree.update(n, 1, v)
                this_beam.append(n)
                for ch in tree.expand(n):
                    tree.update(ch, 0, u)
                    tree.update(ch, 1, v)
                    this_beam.append(ch)
            uniq = list(dict.fromkeys(this_beam))
            uniq.sort(
                key=lambda n: n.last_prob[0] + n.last_prob[1], reverse=True
            )
            beams[(u, v)] = uniq[:beam_width]

    top = beams.get((U - 1, V - 1), empty_beam)[0]
    return tree.label(top)
