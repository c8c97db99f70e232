"""PoreOverNet architectures in flax.

Re-implementation of the reference's Keras model zoo
(poreover/network/network.py:14-64): bigru3, conv1_bigru3 (default),
conv2_bigru3, conv1_gru5, taiyaki_like. The GRU cell reproduces Keras'
``reset_after=True`` gate math exactly (separate input and recurrent biases,
reset gate applied after the recurrent matmul) so that TF checkpoint weights
can be mapped in 1:1 for output-parity testing of ``call``.

TPU notes: the recurrence is a ``lax.scan`` whose step is a single fused
[B, 3H] matmul on the MXU; inputs are time-major inside the scan. Batch and
window sizes stay static (the call driver pads to fixed windows, reference
network.py:253-263).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class KerasGRUCell(nn.Module):
    """GRU cell with Keras(v2) reset_after semantics.

    z = sigmoid(x W_z + b_iz + h U_z + b_rz)
    r = sigmoid(x W_r + b_ir + h U_r + b_rr)
    n = tanh  (x W_n + b_in + r * (h U_n + b_rn))
    h' = (1 - z) * n + z * h
    """

    features: int

    @nn.compact
    def __call__(self, h, x):
        H = self.features
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (x.shape[-1], 3 * H)
        )
        recurrent_kernel = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (H, 3 * H)
        )
        input_bias = self.param("input_bias", nn.initializers.zeros, (3 * H,))
        recurrent_bias = self.param(
            "recurrent_bias", nn.initializers.zeros, (3 * H,)
        )

        xk = x @ kernel + input_bias
        hk = h @ recurrent_kernel + recurrent_bias
        xz, xr, xn = jnp.split(xk, 3, axis=-1)
        hz, hr, hn = jnp.split(hk, 3, axis=-1)
        z = jax.nn.sigmoid(xz + hz)
        r = jax.nn.sigmoid(xr + hr)
        n = jnp.tanh(xn + r * hn)
        h_new = ((1.0 - z) * n + z * h).astype(h.dtype)
        return h_new, h_new


class GRULayer(nn.Module):
    """Unidirectional GRU over [B, T, D]; optionally processes the sequence
    backwards and un-reverses the output (Keras go_backwards + our re-flip,
    giving the same output ordering as stacking expects)."""

    features: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        cell = KerasGRUCell(self.features, name="cell")
        if self.reverse:
            x = x[:, ::-1, :]
        h0 = jnp.zeros((B, self.features), x.dtype)
        xs = jnp.swapaxes(x, 0, 1)  # [T, B, D]

        scan = nn.scan(
            lambda c, carry, inp: c(carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        _, ys = scan(cell, h0, xs)
        ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
        if self.reverse:
            ys = ys[:, ::-1, :]
        return ys


class BiGRU(nn.Module):
    """Bidirectional GRU, concat merge (Keras Bidirectional default)."""

    features: int

    @nn.compact
    def __call__(self, x):
        fwd = GRULayer(self.features, reverse=False, name="forward")(x)
        bwd = GRULayer(self.features, reverse=True, name="backward")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class PoreOverNet(nn.Module):
    """Configurable architecture matching reference build_model variants."""

    arch: str = "conv1_bigru3"
    num_neurons: int = 128
    kernel_size: int = 9
    filters: int = 256
    num_labels: int = 4

    @nn.compact
    def __call__(self, x):
        # x: [B, T, 1] scaled signal
        if self.arch == "bigru3":
            for i in range(3):
                x = BiGRU(self.num_neurons, name=f"bigru{i}")(x)
        elif self.arch == "conv1_bigru3":
            x = nn.Conv(self.filters, (self.kernel_size,), padding="SAME",
                        name="conv0")(x)
            x = nn.relu(x)
            for i in range(3):
                x = BiGRU(self.num_neurons, name=f"bigru{i}")(x)
        elif self.arch == "conv2_bigru3":
            x = nn.Conv(self.filters, (self.kernel_size,), padding="SAME",
                        name="conv0")(x)
            x = nn.relu(x)
            x = nn.Conv(self.filters, (self.kernel_size,), padding="SAME",
                        name="conv1")(x)
            x = nn.relu(x)
            for i in range(3):
                x = BiGRU(self.num_neurons, name=f"bigru{i}")(x)
        elif self.arch == "conv1_gru5":
            x = nn.Conv(self.filters, (self.kernel_size,), padding="SAME",
                        name="conv0")(x)
            x = nn.relu(x)
            for i in range(5):
                x = GRULayer(self.num_neurons, reverse=(i % 2 == 1),
                             name=f"gru{i}")(x)
        elif self.arch == "taiyaki_like":
            x = nn.Conv(256, (19,), strides=(2,), padding="SAME", name="conv0")(x)
            x = nn.relu(x)
            for i in range(5):
                x = GRULayer(256, reverse=(i % 2 == 1), name=f"gru{i}")(x)
        else:
            raise ValueError(f"unknown architecture {self.arch!r}")
        return nn.Dense(self.num_labels + 1, name="dense")(x)


def build_model(arch: str = "conv1_bigru3", num_neurons: int = 128,
                kernel_size: int = 9, filters: int = 256) -> PoreOverNet:
    return PoreOverNet(
        arch=arch, num_neurons=num_neurons, kernel_size=kernel_size,
        filters=filters,
    )


def init_params(model: PoreOverNet, rng, window: int = 1000):
    return model.init(rng, jnp.zeros((1, window, 1)))["params"]
