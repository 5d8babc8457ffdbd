"""Kerasify coding-filter MLP: loader + forward pass vs the reference's
vendored C++ kerasify implementation.

Goldens in tests/data/kerasify_*.txt were produced by
tools/kerasify_golden.cpp (links /root/reference/lib/kerasify verbatim)
on the bundled predict_coding models with a deterministic LCG input
stream, replicated below.
"""
import os

import numpy as np
import pytest

from carpedeam_tpu.ops.coding_mlp import KerasifyModel

DATA = os.path.join(os.path.dirname(__file__), "data")
MODELS = "/root/reference/data"


def _lcg_features(n_rows, in_dim):
    state = 42
    mask = (1 << 64) - 1
    out = np.zeros((n_rows, in_dim), dtype=np.float32)
    for r in range(n_rows):
        for i in range(in_dim):
            state = (state * 6364136223846793005
                     + 1442695040888963407) & mask
            v = np.float32((state >> 33) & 0xFFFF) / np.float32(65536.0)
            out[r, i] = (v - np.float32(0.5)) * np.float32(0.2)
    return out


@pytest.mark.parametrize("model,in_dim", [
    ("predict_coding_acc9743_57x32x64", 57),
    ("predict_coding_acc9260_56x96", 56),
])
def test_forward_matches_reference_kerasify(model, in_dim):
    golden_path = os.path.join(DATA, f"kerasify_{model}.txt")
    model_path = os.path.join(MODELS, f"{model}.model")
    if not (os.path.exists(golden_path) and os.path.exists(model_path)):
        pytest.skip("golden or model unavailable")
    golden = np.loadtxt(golden_path, dtype=np.float64).reshape(16, -1)
    km = KerasifyModel.load(model_path)
    x = _lcg_features(16, in_dim)
    y = np.asarray(km.forward_fn()(x), dtype=np.float64)
    assert y.shape[0] == 16
    np.testing.assert_allclose(y.reshape(16, -1), golden, rtol=2e-5,
                               atol=2e-6)


def test_loader_shapes():
    path = os.path.join(MODELS, "predict_coding_acc9743_57x32x64.model")
    if not os.path.exists(path):
        pytest.skip("model unavailable")
    km = KerasifyModel.load(path)
    dense = [l for l in km.layers if l[0] == "dense"]
    assert [w.shape for (_, w, b, a) in dense] == [(57, 32), (32, 64),
                                                  (64, 1)]
