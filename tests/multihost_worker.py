"""Worker entry for the real 2-process multi-host test.

Each OS process initializes jax.distributed against a localhost
coordinator (CPU backend, 2 virtual devices per process) and runs the
production pair-decode or decode driver on its shard. Launched by
tests/test_multiprocess.py — and by __graft_entry__.dryrun_multichip —
with: coordinator pid nproc workdir mode.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

# sitecustomize registers the axon TPU backend and overrides JAX_PLATFORMS,
# so the env var alone is not enough (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pair_args(workdir: str, out: str):
    from types import SimpleNamespace

    return SimpleNamespace(
        **{"in": [f"{workdir}/pairs.txt"]},
        dir=workdir, out=out, basecaller="poreover",
        reverse_complement=True, threads=2, method="envelope",
        single="viterbi", logging="info", profile=None, debug=False,
        algorithm="beam", alignment="banded", beam_width=3,
        debug_envelope=False, diagonal_envelope=False, diagonal_width=50,
        padding=5, skip_matches=False, skip_threshold=10,
        beam_search_method="row_col", window=200,
    )


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO)
    coord, pid, nproc, workdir, mode = sys.argv[1:6]
    nproc = int(nproc)
    if nproc > 1:
        jax.distributed.initialize(coord, nproc, int(pid))
    from poreover_tpu.decoding.pair import pair_decode

    out = f"{workdir}/{'multi' if nproc > 1 else 'single'}"
    if mode == "pair":
        pair_decode(pair_args(workdir, out))
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"worker {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
