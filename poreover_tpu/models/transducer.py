"""CTC-style transducer model registry.

Mirrors the behavioral surface of the reference's transducer classes
(poreover/decoding/transducer.py:11-106) — the same three model kinds with
the same decode/reverse-complement semantics — but the Viterbi path search
runs as a jitted JAX scan (see poreover_tpu.ops.viterbi) instead of a numpy
per-timestep loop.

Model kinds (shared vocabulary with the decoding kernels):

- ``poreover`` (model string "ctc"): [T,5] log-probs, columns A,C,G,T,blank.
  Viterbi decode == per-step argmax with blanks dropped, repeats KEPT
  (reference transducer.py:72-73).
- ``bonito`` (model string "ctc_merge_repeats"): [T,5] blank-last.
  Viterbi decode == argmax path, collapse consecutive repeats (incl. blank
  runs), then drop blanks (reference transducer.py:83-89).
- ``flipflop`` (model string "ctc_flipflop"): [T,8] A,C,G,T,a,c,g,t with the
  8-state transition mask (reference transducer.py:94-103); decode is a true
  Viterbi DP + traceback, then collapse repeats and uppercase.
"""
from __future__ import annotations

import numpy as np

DNA = "ACGT"
# complement permutation of [A,C,G,T,blank] -> [T,G,C,A,blank]
_REVCOMP_CTC = np.array([3, 2, 1, 0, 4])
# complement permutation of [A,C,G,T,a,c,g,t] -> [T,G,C,A,t,g,c,a]
_REVCOMP_FLIPFLOP = np.array([3, 2, 1, 0, 7, 6, 5, 4])

MODEL_STRING = {
    "poreover": "ctc",
    "bonito": "ctc_merge_repeats",
    "flipflop": "ctc_flipflop",
    "guppy": "ctc_flipflop",
    "flappie": "ctc_flipflop",
}


def flipflop_transition_mask() -> np.ndarray:
    """Allowed transitions between the 8 flip-flop states.

    mask[i, j] == 1 iff state j can follow state i: any flip state is always
    reachable; a flop state only from itself or its flip twin
    (reference transducer.py:94-103).
    """
    size = 4
    ones = np.ones((size, size))
    eye = np.eye(size)
    return np.block([[ones, eye], [ones, eye]]).astype(np.float32)


def remove_repeated(s: str) -> str:
    out = []
    prev = None
    for ch in s:
        if ch != prev:
            out.append(ch)
        prev = ch
    return "".join(out)


class Transducer:
    """Log-probability table + alphabet, with decode helpers."""

    kind: str = "base"

    def __init__(self, log_prob: np.ndarray, alphabet):
        self.log_prob = np.asarray(log_prob, dtype=np.float64)
        self.alphabet = list(alphabet)
        assert self.log_prob.shape[1] == len(self.alphabet)

    @property
    def t_max(self) -> int:
        return len(self.log_prob)

    def __getitem__(self, i):
        return self.log_prob[i]

    def path_to_string(self, path: np.ndarray) -> str:
        return "".join(self.alphabet[int(p)] for p in path)

    def argmax_decode(self, return_path: bool = False):
        path = np.argmax(self.log_prob, axis=1)
        s = self.path_to_string(path)
        return (s, path) if return_path else s

    def viterbi_decode(self, return_path: bool = False):
        raise NotImplementedError

    def reverse_complement(self) -> None:
        raise NotImplementedError

    def __repr__(self):
        return (
            f"transducer(kind={self.kind}, alphabet={''.join(self.alphabet)}, "
            f"t_max={self.t_max})"
        )


class poreover(Transducer):
    kind = "poreover"

    def __init__(self, log_prob, alphabet: str = DNA):
        super().__init__(log_prob, list(alphabet) + [""])

    def reverse_complement(self) -> None:
        self.log_prob = self.log_prob[::-1, _REVCOMP_CTC]

    def viterbi_decode(self, return_path: bool = False):
        # With no transition constraints the Viterbi path is the per-step
        # argmax; blanks render as '' so they drop out of the string while
        # repeats are preserved (reference transducer.py:72-73).
        return self.argmax_decode(return_path)


class bonito(Transducer):
    kind = "bonito"

    def __init__(self, log_prob, alphabet: str = DNA):
        super().__init__(log_prob, list(alphabet) + [""])

    def reverse_complement(self) -> None:
        self.log_prob = self.log_prob[::-1, _REVCOMP_CTC]

    def viterbi_decode(self, return_path: bool = False):
        path = np.argmax(self.log_prob, axis=1)
        keep = np.ones(len(path), dtype=bool)
        keep[1:] = path[1:] != path[:-1]
        s = self.path_to_string(path[keep])
        return (s, path) if return_path else s


class flipflop(Transducer):
    kind = "flipflop"

    def __init__(self, log_prob):
        super().__init__(log_prob, list(DNA) + list(DNA.lower()))
        self.transition = flipflop_transition_mask()

    def reverse_complement(self) -> None:
        self.log_prob = self.log_prob[::-1, _REVCOMP_FLIPFLOP]

    def viterbi_decode(self, return_path: bool = False):
        from ..ops.viterbi import viterbi_path_masked

        path = np.asarray(
            viterbi_path_masked(self.log_prob.astype(np.float32), self.transition)
        )
        s = remove_repeated(self.path_to_string(path)).upper()
        return (s, path) if return_path else s


def from_kind(kind: str, log_prob) -> Transducer:
    cls = {"poreover": poreover, "bonito": bonito, "flipflop": flipflop}[kind]
    return cls(log_prob)
