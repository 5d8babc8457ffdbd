"""kerasify-format MLP loader + JAX inference (the Plass coding filter).

The reference bundles serialized Keras MLPs (data/predict_coding_*.model,
kerasify binary format) used by Plass's `filternoncoding` to score
protein fragments for coding potential; the capability is compiled into
the CarpeDeam binary but not registered in its command table (SURVEY.md
§2.3, lib/kerasify/keras_model.{h,cpp}).  This module provides the same
capability TPU-natively: a format-exact loader and a jitted batched
forward pass (small matmuls -> MXU).

Format (little-endian; keras_model.cpp:18-64,632-660):
  uint32 num_layers; per layer: uint32 layer_type; Dense(1): uint32 rows,
  cols, bias_n, float32 weights[rows*cols], float32 biases[bias_n],
  uint32 activation; Activation(5): uint32 activation.
"""
from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

_DENSE = 1
_FLATTEN = 3
_ELU = 4
_ACTIVATION = 5

_ACT_LINEAR, _ACT_RELU, _ACT_SOFTPLUS, _ACT_SIGMOID, _ACT_TANH, \
    _ACT_HARD_SIGMOID = 1, 2, 3, 4, 5, 6


class KerasifyModel:
    def __init__(self, layers):
        self.layers = layers  # list of ("dense", W, b, act) | ("act", act)

    @staticmethod
    def load(path: str) -> "KerasifyModel":
        with open(path, "rb") as fh:
            data = fh.read()
        off = 0

        def u32():
            nonlocal off
            (v,) = struct.unpack_from("<I", data, off)
            off += 4
            return v

        def floats(n):
            nonlocal off
            v = np.frombuffer(data, dtype="<f4", count=n, offset=off).copy()
            off += 4 * n
            return v

        layers = []
        for _ in range(u32()):
            lt = u32()
            if lt == _DENSE:
                rows, cols, bn = u32(), u32(), u32()
                w = floats(rows * cols).reshape(rows, cols)
                b = floats(bn)
                act = u32()
                layers.append(("dense", w, b, act))
            elif lt == _ACTIVATION:
                layers.append(("act", u32()))
            elif lt == _FLATTEN:
                layers.append(("flatten",))
            elif lt == _ELU:
                layers.append(("elu", floats(1)[0] if False else 1.0))
            else:
                raise NotImplementedError(f"kerasify layer type {lt}")
        return KerasifyModel(layers)

    def forward_fn(self):
        """Returns a jittable f(x: (B, in_dim)) -> (B, out_dim) float32."""
        params = [(jnp.asarray(w), jnp.asarray(b), act)
                  for (kind, *rest) in self.layers if kind == "dense"
                  for (w, b, act) in [tuple(rest)]]
        extra_acts = [rest[0] for (kind, *rest) in self.layers
                      if kind == "act"]

        def apply_act(x, act):
            if act == _ACT_RELU:
                return jnp.maximum(x, 0.0)
            if act == _ACT_SOFTPLUS:
                return jnp.log1p(jnp.exp(x))
            if act == _ACT_SIGMOID:
                return jax.nn.sigmoid(x)
            if act == _ACT_TANH:
                return jnp.tanh(x)
            if act == _ACT_HARD_SIGMOID:
                return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
            return x

        def fwd(x):
            x = jnp.asarray(x, dtype=jnp.float32)
            for i, (w, b, act) in enumerate(params):
                x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
                x = apply_act(x, act)
            for act in extra_acts:
                x = apply_act(x, act)
            return x

        return jax.jit(fwd)


def coding_scores(model_path: str, features: np.ndarray) -> np.ndarray:
    """Score (B, 57) feature rows with a bundled predict_coding model."""
    model = KerasifyModel.load(model_path)
    return np.asarray(model.forward_fn()(features))
