"""Merge per-host output shards into the single files the reference emits.

A multi-host run strides its work list across processes
(``shard_reads_for_host``: host h takes items h, h+n, h+2n, ...) and each
host writes ``<out>.host<h>.*`` shards. The reference funnels every
worker's result through one Pool callback into ONE fasta/log
(pair_decode.py:262-284); these helpers reconstruct that single output by
round-robin interleaving the shards back into original input order.

Because a skipped pair/read emits fewer (or zero) fasta records, each host
also writes a ``.host<h>.idx`` sidecar with one line per local work item
giving its record counts — the merger uses it to walk the shard streams
without guessing. Merging runs on process 0 after the end-of-run stats
collective (which is the barrier proving every host finished writing).
"""
from __future__ import annotations

import os


def _read_fasta_records(path: str) -> list[str]:
    """Split a FASTA file into whole records ('>' header + sequence lines)."""
    if not os.path.exists(path):
        return []
    records: list[str] = []
    cur: list[str] = []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    records.append("".join(cur))
                cur = [line]
            elif cur:
                cur.append(line)
    if cur:
        records.append("".join(cur))
    return records


def _read_log(path: str) -> tuple[list[str], list[str]]:
    """(comment/header lines, data lines) of a TSV log shard."""
    header, data = [], []
    with open(path) as f:
        for line in f:
            (header if line.startswith("#") else data).append(line)
    return header, data


def merge_pair_shards(prefix: str, n_hosts: int) -> None:
    """Merge ``<prefix>.host*.{1d.fasta,2d.fasta,log,idx}`` into the single
    ``<prefix>.{1d.fasta,2d.fasta,log}`` triplet, in original pair order."""
    idx: list[list[tuple[int, int]]] = []
    fa1: list[list[str]] = []
    fa2: list[list[str]] = []
    logs: list[list[str]] = []
    header: list[str] = []
    for h in range(n_hosts):
        base = f"{prefix}.host{h}"
        with open(base + ".idx") as f:
            idx.append([tuple(map(int, line.split())) for line in f])
        fa1.append(_read_fasta_records(base + ".1d.fasta"))
        fa2.append(_read_fasta_records(base + ".2d.fasta"))
        hdr, data = _read_log(base + ".log")
        logs.append(data)
        if h == 0:
            header = hdr
    total = sum(len(ix) for ix in idx)
    pos1 = [0] * n_hosts
    pos2 = [0] * n_hosts
    with open(prefix + ".1d.fasta", "w") as f1, \
            open(prefix + ".2d.fasta", "w") as f2, \
            open(prefix + ".log", "w") as fl:
        fl.writelines(header)
        for g in range(total):
            h, k = g % n_hosts, g // n_hosts
            n1, n2 = idx[h][k]
            for _ in range(n1):
                f1.write(fa1[h][pos1[h]])
                pos1[h] += 1
            for _ in range(n2):
                f2.write(fa2[h][pos2[h]])
                pos2[h] += 1
            fl.write(logs[h][k])


def merge_decode_shards(prefix: str, n_hosts: int) -> None:
    """Merge ``<prefix>.host*.{fasta,idx}`` into ``<prefix>.fasta``."""
    idx: list[list[int]] = []
    fas: list[list[str]] = []
    for h in range(n_hosts):
        base = f"{prefix}.host{h}"
        with open(base + ".idx") as f:
            idx.append([int(line.split()[0]) for line in f])
        fas.append(_read_fasta_records(base + ".fasta"))
    total = sum(len(ix) for ix in idx)
    pos = [0] * n_hosts
    with open(prefix + ".fasta", "w") as out:
        for g in range(total):
            h, k = g % n_hosts, g // n_hosts
            for _ in range(idx[h][k]):
                out.write(fas[h][pos[h]])
                pos[h] += 1
