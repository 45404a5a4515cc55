"""LPIPS (JAX VGG16): weight-file contract + graceful offline degradation."""

import numpy as np
import pytest

from gs_tpu.utils import lpips as lpips_mod


def _tiny_vgg_weights(rng):
    """Random weights in the exact npz schema convert_torch_weights emits."""
    out = {}
    cin = 3
    for i, (cout, _pool) in enumerate(lpips_mod._VGG_PLAN):
        out[f"conv{i}_w"] = rng.normal(scale=0.05, size=(3, 3, cin, cout)).astype(
            np.float32
        )
        out[f"conv{i}_b"] = np.zeros((cout,), np.float32)
        cin = cout
    tap_channels = [
        lpips_mod._VGG_PLAN[i][0] for i in lpips_mod._TAP_LAYERS
    ]
    for j, c in enumerate(tap_channels):
        out[f"lin{j}_w"] = np.abs(rng.normal(size=(c,))).astype(np.float32)
    out["mean"] = np.array([0.485, 0.456, 0.406], np.float32)
    out["std"] = np.array([0.229, 0.224, 0.225], np.float32)
    return out


class TestLpips:
    def test_unavailable_without_weights(self, monkeypatch, tmp_path):
        monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
        lpips_mod._load_weights.cache_clear()
        assert lpips_mod.lpips_fn() is None

    def test_metric_properties_with_synthetic_weights(self, monkeypatch, tmp_path):
        rng = np.random.default_rng(0)
        path = tmp_path / "w.npz"
        np.savez(path, **_tiny_vgg_weights(rng))
        monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", str(path))
        lpips_mod._load_weights.cache_clear()
        fn = lpips_mod.lpips_fn()
        assert fn is not None

        x = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        y = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        import jax.numpy as jnp

        same = float(fn(jnp.asarray(x), jnp.asarray(x)))
        diff = float(fn(jnp.asarray(x), jnp.asarray(y)))
        assert abs(same) < 1e-6  # identical images -> zero distance
        assert diff > 0.0  # different images -> positive distance
        # symmetric
        diff2 = float(fn(jnp.asarray(y), jnp.asarray(x)))
        np.testing.assert_allclose(diff, diff2, rtol=1e-5)
        lpips_mod._load_weights.cache_clear()
