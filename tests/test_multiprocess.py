"""Real multi-process coverage: a 2-process jax.distributed CPU cluster
runs the production pair-decode driver end-to-end (VERDICT r2 item 6).

Verifies that (a) each host decodes its stride of the pairs file and
writes a shard, (b) the cross-host stats collective completes, and
(c) process 0's shard merge reconstructs byte-identical output to a
single-process run of the same workload.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")

_REVCOMP_CTC = [3, 2, 1, 0, 4]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_pairs(workdir: str, n_pairs: int = 3, T: int = 60) -> None:
    """Synthetic read pairs: read2 is the exact reverse-complement trace of
    read1, so --reverse_complement recovers identical models (identity 1.0,
    no skips) and the consensus is well defined."""
    rng = np.random.default_rng(11)
    lines = []
    for i in range(n_pairs):
        y = rng.dirichlet(np.ones(5) * 0.3, size=T).astype(np.float32)
        np.save(f"{workdir}/p{i}_1.npy", y)
        np.save(f"{workdir}/p{i}_2.npy", y[::-1][:, _REVCOMP_CTC])
        lines.append(f"p{i}_1.npy p{i}_2.npy")
    with open(f"{workdir}/pairs.txt", "w") as f:
        f.write("\n".join(lines) + "\n")


def _run_worker(coord, pid, nproc, workdir, mode="pair"):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, WORKER, coord, str(pid), str(nproc), workdir, mode],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_pair_decode(tmp_path):
    workdir = str(tmp_path)
    _make_pairs(workdir)

    # single-process reference run (same worker entry, nproc=1)
    p = _run_worker("unused", 0, 1, workdir)
    out, _ = p.communicate(timeout=480)
    assert p.returncode == 0, out

    # 2-process jax.distributed cluster on localhost
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_run_worker(coord, pid, 2, workdir) for pid in range(2)]
    outs = [pr.communicate(timeout=480)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o

    # each host wrote its shard; process 0 merged them
    for h in range(2):
        assert os.path.exists(f"{workdir}/multi.host{h}.2d.fasta"), outs[h]
        assert os.path.exists(f"{workdir}/multi.host{h}.idx")
    # cross-host stats collective produced the true totals
    assert any("'pairs': 3.0" in o for o in outs), outs[0]

    # merged output == single-process output, byte for byte (fasta);
    # log data lines equal too (headers embed the out path, which differs)
    for suffix in (".1d.fasta", ".2d.fasta"):
        with open(f"{workdir}/single{suffix}") as f:
            want = f.read()
        with open(f"{workdir}/multi{suffix}") as f:
            got = f.read()
        assert got == want, f"{suffix} merged output diverges"
    strip = lambda path: [
        line for line in open(path) if not line.startswith("#")
    ]
    assert strip(f"{workdir}/multi.log") == strip(f"{workdir}/single.log")
