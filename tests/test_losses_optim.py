"""Losses vs an independent torch implementation; Adam vs torch.optim.Adam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gs_tpu.models import optim
from gs_tpu.ops import knn
from gs_tpu.utils import losses, metrics


def torch_ssim(a, b, window_size=11, sigma=1.5):
    """Independent torch SSIM (standard Wang et al. formulation)."""
    coords = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = (g / g.sum()).float()
    win2d = torch.outer(g, g)[None, None]
    c = a.shape[0]
    win = win2d.expand(c, 1, -1, -1)
    pad = window_size // 2

    def blur(x):
        return F.conv2d(x[None], win, padding=pad, groups=c)[0]

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1**2
    s2 = blur(b * b) - mu2**2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return m.mean().item()


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 40, 40))
        assert abs(float(losses.ssim(img, img)) - 1.0) < 1e-5

    @pytest.mark.parametrize("seed", [0, 1])
    def test_ssim_matches_torch(self, seed):
        rng = np.random.default_rng(seed)
        a = rng.uniform(0, 1, (3, 37, 53)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        assert abs(ours - ref) < 1e-4

    def test_l1_and_photometric(self):
        a = jnp.ones((3, 8, 8)) * 0.5
        b = jnp.zeros((3, 8, 8))
        assert abs(float(losses.l1_loss(a, b)) - 0.5) < 1e-7
        lam = 0.2
        total = float(losses.photometric_loss(a, b, lam))
        expected = 0.8 * 0.5 + 0.2 * (1.0 - float(losses.ssim(a, b)))
        assert abs(total - expected) < 1e-6

    def test_psnr(self):
        a = jnp.full((3, 4, 4), 0.5)
        b = jnp.full((3, 4, 4), 0.6)
        expected = 20 * np.log10(1.0 / 0.1)
        np.testing.assert_allclose(float(metrics.psnr(a, b)[0, 0]), expected, rtol=1e-4)


class TestAdam:
    def test_matches_torch_adam(self):
        rng = np.random.default_rng(0)
        params_np = {"xyz": rng.normal(size=(16, 3)).astype(np.float32),
                     "opacity": rng.normal(size=(16, 1)).astype(np.float32)}
        lrs = {"xyz": 1e-2, "opacity": 5e-2}

        tp = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in params_np.items()}
        topt = torch.optim.Adam(
            [{"params": [tp[k]], "lr": lrs[k]} for k in params_np], lr=0.0, eps=1e-15
        )

        jp = {k: jnp.asarray(v) for k, v in params_np.items()}
        jstate = optim.init(jp)
        jlrs = {k: jnp.float32(v) for k, v in lrs.items()}

        for step in range(5):
            grads_np = {k: rng.normal(size=v.shape).astype(np.float32)
                        for k, v in params_np.items()}
            topt.zero_grad()
            for k in tp:
                tp[k].grad = torch.from_numpy(grads_np[k].copy())
            topt.step()
            jp, jstate = optim.update(jp, {k: jnp.asarray(v) for k, v in grads_np.items()},
                                      jstate, jlrs)
            for k in params_np:
                np.testing.assert_allclose(
                    np.asarray(jp[k]), tp[k].detach().numpy(), rtol=5e-5, atol=1e-6,
                    err_msg=f"{k} step {step}",
                )

    def test_surgery_mask_and_reset(self):
        p = {"xyz": jnp.ones((4, 3))}
        st = optim.init(p)
        p2, st = optim.update(p, {"xyz": jnp.ones((4, 3))}, st, {"xyz": jnp.float32(0.1)})
        keep = jnp.array([True, False, True, False])
        st2 = optim.mask_slots(st, keep)
        assert float(jnp.abs(st2.mu["xyz"][1]).sum()) == 0.0
        assert float(jnp.abs(st2.mu["xyz"][0]).sum()) > 0.0
        st3 = optim.reset_group(st2, "xyz")
        assert float(jnp.abs(st3.mu["xyz"]).sum()) == 0.0
        assert int(st3.step["xyz"]) == 1  # step survives surgery (torch parity)


class TestKNN:
    def test_matches_numpy_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        got = np.asarray(knn.mean_knn_sq_dist(jnp.asarray(pts), k=3, chunk=64))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_warns_at_brute_force_scale(self, monkeypatch):
        import warnings

        monkeypatch.setattr(knn, "_BRUTE_FORCE_WARN_N", 64)
        pts = jnp.asarray(
            np.random.default_rng(1).normal(size=(128, 3)).astype(np.float32))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = knn.mean_knn_sq_dist(pts, k=3, chunk=64)
        assert any("O(N^2)" in str(x.message) for x in w)
        assert out.shape == (128,)


class TestBandedLoss:
    def test_band_partition_reproduces_full_loss(self):
        from gs_tpu.utils import losses

        rng = np.random.default_rng(0)
        h, w = 61, 47  # odd, non-multiple of the band count
        a = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
        full_l1 = float(losses.l1_loss(a, b))
        full_ssim = float(losses.ssim(a, b))
        for n_bands in (1, 2, 4, 8):
            band_rows = -(-h // n_bands)
            l1s = ssims = 0.0
            for i in range(n_bands):
                l1_sum, ssim_sum = losses.banded_photometric_terms(
                    a, b, i * band_rows, band_rows)
                l1s += float(l1_sum)
                ssims += float(ssim_sum)
            denom = 3 * h * w
            np.testing.assert_allclose(l1s / denom, full_l1, rtol=1e-6)
            np.testing.assert_allclose(ssims / denom, full_ssim, rtol=1e-6)
