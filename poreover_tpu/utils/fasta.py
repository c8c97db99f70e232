"""FASTA formatting identical to the reference writer.

Reference: poreover/decoding/decode.py:20-27 (60-column wrap, trailing
newline after the final partial line, including for empty sequences).
"""
from __future__ import annotations


def fasta_format(name: str, seq: str, width: int = 60) -> str:
    lines = [">" + name]
    pos = 0
    while pos + width < len(seq):
        lines.append(seq[pos : pos + width])
        pos += width
    lines.append(seq[pos:])
    return "\n".join(lines) + "\n"


def write_fasta(path: str, records) -> None:
    """Write an iterable of (name, seq) records to ``path``."""
    with open(path, "w") as f:
        for name, seq in records:
            f.write(fasta_format(name, seq))
