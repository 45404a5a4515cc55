"""Generate the committed float64 golden rasterization bundle.

A THIRD independent implementation of the reference compositing contract
(besides the closed-form oracle and the lax.scan reference): plain NumPy,
float64, literal per-splat sequential semantics — skip (alpha < 1/255,
power > 0), cap (0.99), termination (T*(1-alpha) < 1e-4), rect-of-tiles
visibility — with the analytic backward chain of the reference CUDA kernel
(including its choice to ignore the alpha cap in the chain rule).

Run once (`python tests/make_golden_raster.py`) to regenerate
``tests/golden/raster_golden.npz``; tests compare the fp32 production
backends against these fp64 values (BASELINE config 1's "allclose vs
reference" with the self-referential loop cut: if the three independent
implementations agree at fp32-rounding tolerance, a shared systematic bug
would have to be reproduced three ways).

Reference contract: diff-gaussian-rasterization call sites at
gaussian_renderer/__init__.py:98-112 and SURVEY.md §2.2a steps 3-4.
"""

import os

import numpy as np

ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
TILE = 16

H, W, N = 96, 80, 384
SEED = 7


def make_inputs():
    rng = np.random.default_rng(SEED)
    means2d = rng.uniform(-10, max(H, W) + 10, (N, 2)).astype(np.float32)
    a = rng.uniform(0.03, 0.5, N)
    c = rng.uniform(0.03, 0.5, N)
    b = rng.uniform(-0.9, 0.9, N) * np.sqrt(a * c)
    conics = np.stack([a, b, c], -1).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    opac = rng.uniform(0.05, 1.0, N).astype(np.float32)
    depths = rng.uniform(2, 8, N).astype(np.float32)
    # screen radius from the conic's covariance eigenvalues (conic = cov^-1)
    det = a * c - b * b
    cov_tr_half = 0.5 * (a + c) / det  # (cov_xx + cov_yy)/2
    cov_det = 1.0 / det
    lam = cov_tr_half + np.sqrt(np.maximum(0.1, cov_tr_half**2 - cov_det))
    radii = np.ceil(3.0 * np.sqrt(lam)).astype(np.int32)
    radii[:8] = 0  # a few culled splats exercise the invisible path
    bg = np.array([0.15, 0.25, 0.35], np.float32)
    # cotangents for the backward golden
    g_img = rng.normal(0, 1, (3, H, W)).astype(np.float32)
    g_t = rng.normal(0, 1, (H, W)).astype(np.float32)
    return means2d, conics, colors, opac, depths, radii, bg, g_img, g_t


def tile_rect(means2d, radii, tiles_x, tiles_y):
    r = radii.astype(np.float64)
    x0 = np.clip(np.floor((means2d[:, 0] - r) / TILE), 0, tiles_x).astype(int)
    y0 = np.clip(np.floor((means2d[:, 1] - r) / TILE), 0, tiles_y).astype(int)
    x1 = np.clip(np.floor((means2d[:, 0] + r + TILE - 1) / TILE), 0, tiles_x).astype(int)
    y1 = np.clip(np.floor((means2d[:, 1] + r + TILE - 1) / TILE), 0, tiles_y).astype(int)
    empty = radii <= 0
    return x0, y0, np.where(empty, x0, x1), np.where(empty, y0, y1)


def golden(means2d, conics, colors, opac, depths, radii, bg, g_img, g_t):
    f8 = np.float64
    means2d, conics, colors = f8(means2d), f8(conics), f8(colors)
    opac, bg = f8(opac), f8(bg)
    tiles_x, tiles_y = -(-W // TILE), -(-H // TILE)
    order = np.argsort(np.where(radii > 0, depths, np.inf), kind="stable")

    px, py = np.meshgrid(np.arange(W, dtype=f8), np.arange(H, dtype=f8))
    px, py = px.ravel(), py.ravel()
    tx, ty = (px / TILE).astype(int), (py / TILE).astype(int)
    x0, y0, x1, y1 = tile_rect(np.float32(means2d), radii, tiles_x, tiles_y)

    n_pix = H * W
    t = np.ones(n_pix, f8)
    done = np.zeros(n_pix, bool)
    color = np.zeros((n_pix, 3), f8)
    # forward, remembering per-splat (contrib mask, T_before) for backward
    recs = []
    for idx in order:
        dx = means2d[idx, 0] - px
        dy = means2d[idx, 1] - py
        ca, cb, cc = conics[idx]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = np.minimum(ALPHA_MAX, opac[idx] * np.exp(power))
        in_rect = (tx >= x0[idx]) & (tx < x1[idx]) & (ty >= y0[idx]) & (ty < y1[idx])
        use = in_rect & (radii[idx] > 0) & (alpha >= ALPHA_SKIP) & (power <= 0) & ~done
        test_t = t * (1.0 - alpha)
        stop = use & (test_t < T_EPS)
        contrib = use & ~stop
        w = np.where(contrib, alpha * t, 0.0)
        color += w[:, None] * colors[idx][None, :]
        recs.append((idx, contrib, t.copy()))
        t = np.where(contrib, test_t, t)
        done |= stop

    t_fin = t
    img = (color + t_fin[:, None] * bg[None, :]).T.reshape(3, H, W)

    # backward: reverse replay with suffix accumulators
    gc = f8(g_img).reshape(3, n_pix).T  # [P,3]
    # bg composite: dL/dT += gC . bg ; plus the direct T cotangent
    gt_eff = f8(g_t).ravel() + gc @ bg
    d_means2d = np.zeros((N, 2), f8)
    d_conics = np.zeros((N, 3), f8)
    d_colors = np.zeros((N, 3), f8)
    d_opac = np.zeros(N, f8)
    s_after = np.zeros(n_pix, f8)
    tfin_term = t_fin * gt_eff
    for idx, contrib, t_before in reversed(recs):
        dx = means2d[idx, 0] - px
        dy = means2d[idx, 1] - py
        ca, cb, cc = conics[idx]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = np.minimum(ALPHA_MAX, opac[idx] * np.exp(power))
        omb = np.where(contrib, 1.0 - alpha, 1.0)
        w = np.where(contrib, alpha * t_before, 0.0)
        b = gc @ colors[idx]  # [P]
        d_colors[idx] += w @ gc
        d_alpha = np.where(contrib, t_before * b - (s_after + tfin_term) / omb, 0.0)
        g_exp = np.exp(power)
        d_opac[idx] += np.sum(np.where(contrib, g_exp * d_alpha, 0.0))
        d_power = np.where(contrib, opac[idx] * g_exp * d_alpha, 0.0)
        d_conics[idx, 0] += np.sum(-0.5 * dx * dx * d_power)
        d_conics[idx, 1] += np.sum(-dx * dy * d_power)
        d_conics[idx, 2] += np.sum(-0.5 * dy * dy * d_power)
        d_means2d[idx, 0] += np.sum(-(ca * dx + cb * dy) * d_power)
        d_means2d[idx, 1] += np.sum(-(cc * dy + cb * dx) * d_power)
        wb = np.where(contrib, w * b, 0.0)
        s_after += wb

    return img, t_fin.reshape(H, W), d_means2d, d_conics, d_colors, d_opac


def main():
    ins = make_inputs()
    means2d, conics, colors, opac, depths, radii, bg, g_img, g_t = ins
    img, t_fin, d_m, d_c, d_col, d_o = golden(*ins)
    out = os.path.join(os.path.dirname(__file__), "golden", "raster_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        height=H, width=W,
        means2d=means2d, conics=conics, colors=colors, opacities=opac,
        depths=depths, radii=radii, bg=bg, g_img=g_img, g_t=g_t,
        image=img.astype(np.float64), t_final=t_fin.astype(np.float64),
        d_means2d=d_m, d_conics=d_c, d_colors=d_col, d_opacities=d_o,
    )
    print(f"wrote {out}: image mean {img.mean():.6f}, "
          f"|d_means2d| max {np.abs(d_m).max():.4f}")


if __name__ == "__main__":
    main()
