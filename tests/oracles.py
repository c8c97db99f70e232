"""Brute-force enumeration oracles for decoding tests.

The golden-oracle strategy follows the reference test suite
(reference tests/testing.py:21-156): on tiny alphabets and a handful of time
steps, enumerate EVERY path, sum path probabilities per collapsed label, and
compare kernels against the exact distribution.

- CTCProfile      : plain CTC merge (drop gaps, keep repeats)  — "poreover"
- BonitoProfile   : CTC with repeat merging                    — "bonito"
- FlipFlopProfile : 8-state flip/flop transition-legal paths
- JointProfile    : product distribution of two profiles + P(agree)
"""
from __future__ import annotations

import itertools
from collections import OrderedDict

import numpy as np


def remove_gaps(chars) -> str:
    return "".join(c for c in chars if c != "-")


def collapse_repeats(chars) -> str:
    out = []
    prev = None
    for c in chars:
        if c != prev:
            out.append(c)
        prev = c
    return "".join(out)


class EnumProfile:
    """Exact label distribution of a profile by path enumeration."""

    def __init__(self, softmax: np.ndarray, alphabet, merge_fn):
        self.softmax = np.asarray(softmax, dtype=np.float64)
        self.alphabet = tuple(alphabet)
        self.merge_fn = merge_fn
        self.label_prob_: "OrderedDict[str, float]" = OrderedDict()
        self.path_prob: dict = {}
        self.total_path_prob = 0.0
        self._enumerate()
        self.label_prob_ = OrderedDict(
            sorted(self.label_prob_.items(), key=lambda kv: kv[1], reverse=True)
        )

    def _paths(self):
        T = len(self.softmax)
        return itertools.product(range(len(self.alphabet)), repeat=T)

    def _enumerate(self):
        T = len(self.softmax)
        for path in self._paths():
            p = float(np.prod(self.softmax[np.arange(T), np.array(path)]))
            self.total_path_prob += p
            self.path_prob[path] = p
            label = self.merge_fn([self.alphabet[i] for i in path])
            self.label_prob_[label] = self.label_prob_.get(label, 0.0) + p
        assert np.isclose(self.total_path_prob, 1.0), self.total_path_prob

    def label_prob(self, label: str) -> float:
        return self.label_prob_.get(label, 0.0)

    def all_labels(self):
        return self.label_prob_.keys()

    def top_label(self):
        return next(iter(self.label_prob_.items()))

    def viterbi_decode(self) -> str:
        best = max(self.path_prob.items(), key=lambda kv: kv[1])[0]
        return self.merge_fn([self.alphabet[i] for i in best])

    def prefix_prob(self, prefix: str, gap_index: int) -> float:
        """Total mass of paths whose collapsed label extends ``prefix``
        and that do not end on a gap (matches reference testing.py:69-78)."""
        total = 0.0
        T = len(self.softmax)
        for t in range(T):
            for path in itertools.product(range(len(self.alphabet)), repeat=t + 1):
                if path[-1] == gap_index:
                    continue
                label = self.merge_fn([self.alphabet[i] for i in path])
                if label == prefix:
                    total += float(
                        np.prod(self.softmax[np.arange(t + 1), np.array(path)])
                    )
        return total


class CTCProfile(EnumProfile):
    """PoreOver-style CTC: drop gaps, keep repeats. Alphabet ends with '-'? No:
    pass e.g. ('A','B','') and gaps are ''-labeled implicitly by remove_gaps."""

    def __init__(self, softmax, alphabet):
        super().__init__(softmax, alphabet, remove_gaps)


class BonitoProfile(EnumProfile):
    """CTC with merged repeats: collapse runs first, then drop gaps."""

    def __init__(self, softmax, alphabet):
        super().__init__(softmax, alphabet, lambda cs: remove_gaps(collapse_repeats(cs)))


def flipflop_transition(size: int) -> np.ndarray:
    ones = np.ones((size, size))
    eye = np.identity(size)
    return np.block([[ones, eye], [ones, eye]])


class FlipFlopProfile(EnumProfile):
    """Enumerates only transition-legal flip/flop paths."""

    def __init__(self, softmax, alphabet):
        self.flipflop_size = len(alphabet) // 2
        self.transition = flipflop_transition(self.flipflop_size)
        super().__init__(
            softmax, alphabet, lambda cs: collapse_repeats(cs).upper()
        )

    def _enumerate(self):
        T = len(self.softmax)
        paths = [[i] for i in range(len(self.alphabet))]
        for _t in range(1, T):
            paths = [
                p + [j]
                for p in paths
                for j in np.where(self.transition[p[-1]] == 1)[0]
            ]
        for path in paths:
            p = float(np.prod(self.softmax[np.arange(T), np.array(path)]))
            self.total_path_prob += p
            path_string = "".join(self.alphabet[i] for i in path)
            self.path_prob[path_string] = p
            label = self.merge_fn(path_string)
            self.label_prob_[label] = self.label_prob_.get(label, 0.0) + p
        # NOTE: legal-path mass does not sum to 1 (transition mask removes
        # flip->other-flop paths); the reference oracle doesn't assert it either.


class JointProfile:
    """Product of two label distributions, as in reference testing.py:136-156."""

    def __init__(self, prof1, prof2):
        self.joint_label_prob_ = OrderedDict()
        self.prob_agree = 0.0
        for label in prof1.all_labels():
            jp = prof1.label_prob(label) * prof2.label_prob(label)
            self.joint_label_prob_[label] = jp
            self.prob_agree += jp
        self.joint_label_prob_ = OrderedDict(
            sorted(self.joint_label_prob_.items(), key=lambda kv: kv[1], reverse=True)
        )

    def top_label(self):
        return next(iter(self.joint_label_prob_.items()))

    def label_prob(self, label):
        return self.joint_label_prob_.get(label, 0.0)
