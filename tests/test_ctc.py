"""CTC loss vs forward op, optax reference, and enumeration oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from poreover_tpu.ops import forward as fwd
from poreover_tpu.ops.ctc import ctc_loss
from oracles import BonitoProfile, CTCProfile


def _rand_logits(rng, B, T, S):
    return jnp.asarray(rng.normal(size=(B, T, S)) * 2)


def test_ctc_loss_no_merge_matches_forward():
    rng = np.random.default_rng(0)
    logits = _rand_logits(rng, 3, 6, 3)
    labels = jnp.asarray(np.array([[0, 1, 0], [1, 1, 0], [0, 0, 0]], np.int32))
    lengths = jnp.asarray(np.array([3, 2, 1], np.int32))
    losses = ctc_loss(logits, labels, lengths, merge_repeated=False)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for b in range(3):
        lab = "".join("AB"[c] for c in np.asarray(labels[b])[: int(lengths[b])])
        expect = -fwd.forward(logp[b], lab, alphabet="AB", model="ctc")
        assert np.isclose(float(losses[b]), expect), (b, float(losses[b]), expect)


def test_ctc_loss_no_merge_oracle():
    """Loss equals -log of the enumerated plain-CTC label probability."""
    rng = np.random.default_rng(1)
    y = rng.random((5, 3))
    y = y / y.sum(axis=1, keepdims=True)
    prof = CTCProfile(y, ("A", "B", ""))
    logits = jnp.asarray(np.log(y))[None]
    labels = jnp.asarray(np.array([[0, 1, 0, 0, 0]], np.int32))
    loss = ctc_loss(logits, labels, jnp.asarray([2], jnp.int32))
    assert np.isclose(float(loss[0]), -np.log(prof.label_prob("AB")))


def test_ctc_loss_merge_matches_optax():
    import optax

    rng = np.random.default_rng(2)
    B, T, L, S = 4, 8, 3, 5
    logits = _rand_logits(rng, B, T, S)
    labels = jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.int32))
    lengths = jnp.asarray(np.array([3, 2, 3, 1], np.int32))

    ours = ctc_loss(logits, labels, lengths, merge_repeated=True)

    label_paddings = (
        jnp.arange(L)[None, :] >= lengths[:, None]
    ).astype(jnp.float32)
    logit_paddings = jnp.zeros((B, T), jnp.float32)
    ref = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=S - 1
    )
    assert np.allclose(np.asarray(ours), np.asarray(ref), atol=1e-4), (
        np.asarray(ours), np.asarray(ref),
    )


def test_ctc_loss_gradients_finite():
    rng = np.random.default_rng(3)
    logits = _rand_logits(rng, 2, 6, 5)
    labels = jnp.asarray(np.array([[0, 1, 2], [3, 3, 0]], np.int32))
    lengths = jnp.asarray(np.array([3, 2], np.int32))
    for merge in (False, True):
        g = jax.grad(
            lambda lg: jnp.sum(ctc_loss(lg, labels, lengths, merge_repeated=merge))
        )(logits)
        assert np.all(np.isfinite(np.asarray(g)))
