"""Multi-chip / multi-host scale-out.

The reference's only parallelism is a per-read multiprocessing.Pool
(decode.py:158-162, pair_decode.py:292-297) with zero inter-process
communication. The TPU-native equivalents here:

- data-parallel read batches over a ``jax.sharding.Mesh`` ("data" axis):
  probability windows are sharded on the batch axis, model parameters are
  replicated, gradients reduce over ICI via jit-inserted collectives;
- multi-host work distribution by ``jax.process_index()`` striding over the
  read/pair list (each host writes its own FASTA shard);
- accuracy/throughput counters merged with ``psum`` collectives rather than
  files.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---- process-wide active mesh: drivers consult this to shard their
# batched waves across devices (set by multi-chip entry points; the
# reference has no equivalent — its scale-out is process pools) ----
_ACTIVE_MESH: Mesh | None = None


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


class use_mesh:
    """Context manager: route driver wave batches through a device mesh
    (data-parallel sharding of the batched consensus/decode kernels)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._old = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._old
        return False


def shard_reads_for_host(items):
    """Static stride partition of a work list across hosts
    (the TPU-native replacement for the reference's Pool fan-out)."""
    n = jax.process_count()
    i = jax.process_index()
    return list(items)[i::n]


def merge_stats(stats: dict, mesh: Mesh) -> dict:
    """Sum genuinely per-host scalar counters across all hosts.

    Each host contributes its ``stats`` exactly once: the values are placed
    in the shard of its first local device and zeros elsewhere, so a global
    sum over the 'data' axis is the true cross-host total — no
    divide-by-device-count replication hack (that was only correct when all
    hosts fed identical values). Works unchanged on a single process.
    """
    keys = sorted(stats)
    K = max(len(keys), 1)
    n_local = jax.local_device_count()
    n_global = len(mesh.devices.reshape(-1))
    local = np.zeros((n_local, K), np.float32)
    if keys:
        local[0] = [float(stats[k]) for k in keys]
    sharding = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(
        sharding, local, (n_global, K)
    )

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def allsum(x):
        return jnp.sum(x, axis=0)  # XLA inserts the cross-host reduce

    out = np.asarray(allsum(garr))
    return {k: float(v) for k, v in zip(keys, out)}


def data_parallel_sharding(mesh: Mesh):
    """(input sharding [batch on 'data'], replicated sharding)."""
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())


def sharded_train_step(model, optimizer, mesh: Mesh):
    """jit a data-parallel CTC training step over the mesh.

    Batch axes shard over "data"; params/opt state replicate; XLA inserts
    the gradient all-reduce over ICI.
    """
    from ..ops.ctc import ctc_loss

    batch_sh, rep_sh = data_parallel_sharding(mesh)

    @partial(
        jax.jit,
        in_shardings=(rep_sh, rep_sh, batch_sh, batch_sh, batch_sh),
        out_shardings=(rep_sh, rep_sh, rep_sh),
    )
    def step(params, opt_state, X, y, ylen):
        def loss_fn(p):
            logits = model.apply({"params": p}, X)
            return jnp.mean(ctc_loss(logits, y, ylen))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def sharded_decode_viterbi(mesh: Mesh):
    """jit a batched Viterbi argmax decode with reads sharded over 'data'."""
    batch_sh, _ = data_parallel_sharding(mesh)

    @partial(jax.jit, in_shardings=(batch_sh,), out_shardings=batch_sh)
    def decode(y):
        return jnp.argmax(y, axis=-1).astype(jnp.int32)

    return decode
