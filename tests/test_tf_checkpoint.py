"""TensorBundle reader vs the bundled reference checkpoint."""
import numpy as np
import pytest

from poreover_tpu.io.tf_checkpoint import TFCheckpoint, load_keras_conv1_bigru3

PREFIX = "/root/reference/data/model/checkpoint-124"


def test_index_parses():
    ckpt = TFCheckpoint(PREFIX)
    keys = ckpt.keys()
    assert len(keys) == 23
    assert any("forward_layer" in k for k in keys)


def test_tensor_shapes_and_values():
    ckpt = TFCheckpoint(PREFIX)
    conv_k = ckpt.get("layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE")
    assert conv_k.shape == (9, 1, 256)
    assert conv_k.dtype == np.float32
    assert np.all(np.isfinite(conv_k))
    gru_b = ckpt.get(
        "layer_with_weights-1/forward_layer/cell/bias/.ATTRIBUTES/VARIABLE_VALUE"
    )
    assert gru_b.shape == (2, 384)  # reset_after: input + recurrent biases
    dense_k = ckpt.get("layer_with_weights-4/kernel/.ATTRIBUTES/VARIABLE_VALUE")
    assert dense_k.shape == (256, 5)


def test_params_tree_matches_flax_model():
    import jax
    import jax.numpy as jnp

    from poreover_tpu.network.model import build_model, init_params

    params = load_keras_conv1_bigru3(PREFIX)
    model = build_model("conv1_bigru3")
    template = init_params(model, jax.random.PRNGKey(0), window=16)

    flat_t = jax.tree.leaves_with_path(template)
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree.leaves_with_path(jax.tree.map(jnp.asarray, params))}
    for key, val in flat_t:
        ks = jax.tree_util.keystr(key)
        assert ks in flat_p, f"missing imported param {ks}"
        assert flat_p[ks].shape == val.shape, (ks, flat_p[ks].shape, val.shape)

    # forward pass with imported weights produces finite logits
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.zeros((1, 16, 1), jnp.float32),
    )
    assert np.all(np.isfinite(np.asarray(out)))
