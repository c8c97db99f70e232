"""``call``: neural-network basecalling forward pass -> per-read .npy probs.

Mirrors reference call/call_helper (poreover/network/network.py:181-298):
window the scaled signal into [128, window, 1] batches, run the jitted
forward pass + softmax on TPU, concatenate, save ``.npy`` softmax probs (or
``.csv``). Weights load from an orbax checkpoint directory or file; with no
weights given we look for the bundled default checkpoint.
"""
from __future__ import annotations

import glob
import json
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fast5 import batch_input, parse_fast5
from .model import PoreOverNet, build_model, init_params

log = logging.getLogger("poreover_tpu")

DEFAULT_CHECKPOINT = (
    Path(__file__).resolve().parent.parent.parent / "data" / "model"
)


def save_params(params, path: str, arch_config: dict | None = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()
    if arch_config is not None:
        with open(path + ".json", "w") as f:
            json.dump(arch_config, f)


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)


def latest_checkpoint(directory: str):
    """Newest checkpoint-N path inside ``directory`` (reference uses
    tf.train.latest_checkpoint; we sort our own checkpoint dirs)."""
    cands = sorted(
        glob.glob(os.path.join(directory, "checkpoint-*")),
        key=lambda p: (len(p), p),
    )
    cands = [c for c in cands if not c.endswith(".json")]
    return cands[-1] if cands else None


def _model_from_args(args) -> PoreOverNet:
    if getattr(args, "model", None):
        with open(args.model) as f:
            cfg = json.load(f)
        return PoreOverNet(**cfg)
    return build_model(
        num_neurons=getattr(args, "num_neurons", 128),
        kernel_size=getattr(args, "kernel_size", 9),
        filters=getattr(args, "filters", 256),
    )


def _is_tf_bundle(prefix: str) -> bool:
    return os.path.exists(prefix + ".index")


def call(args) -> None:
    model = _model_from_args(args)

    weights = args.weights
    if weights is None:
        # same default as the reference (network.py:196-202): the bundled
        # checkpoint-124, read directly from the TF bundle format
        weights = "/root/reference/data/model/checkpoint-124"
        if not _is_tf_bundle(weights):
            raise SystemExit(
                "no --weights given and no bundled checkpoint found; train "
                "one with `poreover-tpu train`"
            )
    elif os.path.isdir(weights) and latest_checkpoint(weights):
        weights = latest_checkpoint(weights)

    if _is_tf_bundle(weights):
        from ..io.tf_checkpoint import load_keras_conv1_bigru3

        import jax.numpy as _jnp

        params = jax.tree.map(
            _jnp.asarray, load_keras_conv1_bigru3(weights)
        )
    else:
        params = load_params(weights)

    in_path = getattr(args, "in")
    if os.path.isdir(in_path):
        files = sorted(glob.glob(os.path.join(in_path, "*.fast5")))
    else:
        files = [in_path]

    @jax.jit
    def forward(batch):
        return jax.nn.softmax(model.apply({"params": params}, batch), axis=-1)

    for fast5 in files:
        call_helper(args, forward, fast5)


def call_helper(args, forward, fast5_file: str) -> None:
    read_id, signal = parse_fast5(fast5_file, scaling=args.scaling)
    padded_batches, last_index = batch_input(signal, window_size=args.window)

    outputs = []
    for batch in padded_batches:
        probs = forward(jnp.asarray(batch, jnp.float32))
        outputs.append(np.concatenate(np.asarray(probs)))
    if last_index > 0:
        outputs[-1] = outputs[-1][:last_index]
    probs_concat = np.concatenate(outputs)

    if args.use_id:
        out_prefix = os.path.join(
            args.dir,
            read_id.decode("utf-8") if isinstance(read_id, bytes) else str(read_id),
        )
    else:
        out_prefix = os.path.join(args.dir, Path(fast5_file).stem)

    if args.format == "csv":
        np.savetxt(
            out_prefix + ".csv", probs_concat, delimiter=",",
            header=",".join(["A", "C", "G", "T", ""]), comments="",
        )
    else:
        np.save(out_prefix, probs_concat)
    log.info("wrote %s probabilities for %s", probs_concat.shape, out_prefix)
