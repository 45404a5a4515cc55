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


class TestTorchOracleEquivalence:
    """JAX port vs a test-local torch implementation of the reference recipe.

    The reference LPIPS (lpipsPyTorch/modules/{lpips,networks,utils}.py) is
    torchvision VGG16 conv features tapped at relu{1_2,2_2,3_3,4_3,5_3},
    z-scored inputs, channel-unit-normalized activations, squared diffs
    through 1x1 lin weights, spatial mean, sum over layers. torchvision is
    absent here, so the oracle builds the identical conv/relu/maxpool
    pipeline in plain torch from the SAME weight npz; agreement validates
    every architectural choice of the port (the only thing left untested
    offline is the pretrained weight VALUES, which convert_torch_weights
    fetches verbatim).
    """

    def _torch_lpips(self, w, x, y):
        import torch

        def features(img):
            t = torch.from_numpy(img[None].copy())
            mean = torch.from_numpy(w["mean"]).reshape(1, 3, 1, 1)
            std = torch.from_numpy(w["std"]).reshape(1, 3, 1, 1)
            t = (t - mean) / std
            taps = []
            for i, (_cout, pool) in enumerate(lpips_mod._VGG_PLAN):
                if pool:
                    t = torch.nn.functional.max_pool2d(t, 2, 2)
                kernel = torch.from_numpy(
                    w[f"conv{i}_w"].transpose(3, 2, 0, 1).copy())  # OIHW
                bias = torch.from_numpy(w[f"conv{i}_b"])
                t = torch.nn.functional.conv2d(t, kernel, bias, padding=1)
                t = torch.relu(t)
                if i in lpips_mod._TAP_LAYERS:
                    taps.append(t[0])
            return taps

        def unit(f):
            return f / (torch.sqrt((f * f).sum(0, keepdim=True)) + 1e-10)

        total = 0.0
        for j, (a, b) in enumerate(zip(features(x), features(y))):
            diff = (unit(a) - unit(b)) ** 2
            lin = torch.from_numpy(w[f"lin{j}_w"]).reshape(-1, 1, 1)
            total = total + (lin * diff).sum(0).mean()
        return float(total)

    def test_port_matches_torch_oracle(self, monkeypatch, tmp_path):
        torch = pytest.importorskip("torch")  # noqa: F841
        rng = np.random.default_rng(3)
        w = _tiny_vgg_weights(rng)
        path = tmp_path / "w.npz"
        np.savez(path, **w)
        monkeypatch.setenv("GS_TPU_LPIPS_WEIGHTS", str(path))
        lpips_mod._load_weights.cache_clear()
        fn = lpips_mod.lpips_fn()
        assert fn is not None

        x = rng.uniform(0, 1, (3, 37, 41)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.12, x.shape), 0, 1).astype(np.float32)
        ours = float(fn(x, y))
        oracle = self._torch_lpips(w, x, y)
        assert oracle > 1e-6
        np.testing.assert_allclose(ours, oracle, rtol=2e-4)
        lpips_mod._load_weights.cache_clear()
