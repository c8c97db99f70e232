"""``train``: CTC training loop with checkpointing.

Mirrors reference train/train_ctc_model (poreover/network/network.py:78-179):
npz training data {signal, labels, row_lengths}, Adam, loss every
--loss_every, checkpoints every --save_every plus a final save, holdout
validation via normalized edit distance, run directory named
"{model}_{name}_{date}_{time}" with a train.log of the arguments.

TPU-first: one jitted update step (value_and_grad over ops.ctc.ctc_loss)
over fixed-shape [B, 1000, 1] batches with padded label arrays.
"""
from __future__ import annotations

import datetime
import json
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.ctc import ctc_loss
from .call import save_params
from .model import build_model, init_params

log = logging.getLogger("poreover_tpu")


def load_training_npz(path: str):
    """-> (signal [N, T, 1] float32, labels [N, Lmax] int32, lengths [N])."""
    data = np.load(path)
    signal = np.expand_dims(data["signal"], axis=2).astype(np.float32)
    flat = data["labels"].astype(np.int32)
    row_lengths = data["row_lengths"].astype(np.int32)
    Lmax = int(row_lengths.max())
    labels = np.zeros((len(row_lengths), Lmax), np.int32)
    pos = 0
    for i, n in enumerate(row_lengths):
        labels[i, :n] = flat[pos : pos + n]
        pos += n
    return signal, labels, row_lengths


def edit_distance(a, b) -> int:
    """Levenshtein distance (for validation error, reference network.py:69-76)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def greedy_labels(probs: np.ndarray) -> list:
    """argmax path, keep non-blank (reference validation: x[x < 4])."""
    paths = np.argmax(probs, axis=-1)
    return [p[p < 4] for p in paths]


def validation_error(forward, params, batches) -> float:
    dists = []
    for X, y, ylen in batches:
        probs = np.asarray(forward(params, jnp.asarray(X)))
        hyp = greedy_labels(probs)
        for h, lab, n in zip(hyp, y, ylen):
            truth = lab[:n]
            if len(truth) == 0:
                continue
            dists.append(edit_distance(list(h), list(truth)) / len(truth))
    return float(np.mean(dists)) if dists else float("nan")


def train(args) -> None:
    out_dir = "{}_{}_{}".format(
        args.model, args.name, datetime.datetime.now().strftime("%Y-%m-%d_%H-%M")
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "train.log"), "w") as f:
        print("Command-line arguments:", file=f)
        for k, v in vars(args).items():
            print(k, "=", v, file=f)

    seed = args.seed if args.seed is not None else 0
    rng = np.random.default_rng(seed)

    signal, labels, row_lengths = load_training_npz(args.data)
    N = len(signal)
    window = signal.shape[1]

    model = build_model(
        arch=args.model, num_neurons=args.num_neurons,
        kernel_size=args.kernel_size, filters=args.filters,
    )
    params = init_params(model, jax.random.PRNGKey(seed), window=window)
    if args.restart:
        from .call import latest_checkpoint, load_params

        path = args.restart
        if os.path.isdir(path) and latest_checkpoint(path):
            path = latest_checkpoint(path)
        params = load_params(path, template=params)

    arch_config = dict(
        arch=args.model, num_neurons=args.num_neurons,
        kernel_size=args.kernel_size, filters=args.filters,
    )
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(arch_config, f)

    optimizer = optax.adam(args.learning_rate)
    opt_state = optimizer.init(params)

    merge = bool(getattr(args, "ctc_merge_repeated", False))

    @jax.jit
    def update(params, opt_state, X, y, ylen):
        def loss_fn(p):
            logits = model.apply({"params": p}, X)
            return jnp.mean(
                ctc_loss(logits, y, ylen, merge_repeated=merge)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def forward(params, X):
        return jax.nn.softmax(model.apply({"params": params}, X), axis=-1)

    # shuffle + holdout split (reference network.py:154-179)
    order = rng.permutation(N)
    B = args.batch_size
    n_batches = N // B
    validation_size = int(n_batches * args.holdout)
    batches = [
        (
            signal[order[i * B : (i + 1) * B]],
            labels[order[i * B : (i + 1) * B]],
            row_lengths[order[i * B : (i + 1) * B]],
        )
        for i in range(n_batches)
    ]
    test_batches = batches[:validation_size]
    train_batches = batches[validation_size:]
    log.info(
        "training on %d batches of %d (holdout %d batches)",
        len(train_batches), B, len(test_batches),
    )

    # scalar metrics stream to metrics.jsonl (one JSON object per event) —
    # the TPU build's equivalent of the reference's TF summary writer
    # (network.py:90,115-122); readable with pandas.read_json(lines=True)
    metrics_f = open(os.path.join(out_dir, "metrics.jsonl"), "w", 1)

    def emit_metric(**kv):
        print(json.dumps(kv), file=metrics_f)

    t = 0
    checkpoint = 0
    t_start = time.perf_counter()
    for _epoch in range(args.epochs):
        for X, y, ylen in train_batches:
            params, opt_state, loss = update(
                params, opt_state, jnp.asarray(X), jnp.asarray(y),
                jnp.asarray(ylen),
            )
            if t % args.save_every == 0:
                save_params(
                    params, os.path.join(out_dir, f"checkpoint-{checkpoint}"),
                    arch_config,
                )
                checkpoint += 1
                if validation_size > 0:
                    err = validation_error(forward, params, test_batches)
                    print(
                        f"Iteration:{t}\tEdit distance (test):{err}",
                        file=sys.stderr,
                    )
                    emit_metric(step=t, test_edit_distance=float(err))
            if t % args.loss_every == 0:
                print(f"Iteration:{t}\tLoss:{float(loss)}", file=sys.stderr)
                emit_metric(
                    step=t, loss=float(loss),
                    elapsed_s=round(time.perf_counter() - t_start, 3),
                )
            t += 1
    save_params(params, os.path.join(out_dir, "final"), arch_config)
    metrics_f.close()
