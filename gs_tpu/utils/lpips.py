"""LPIPS v0.1 (VGG16) re-implemented in JAX.

Rebuild of the reference's self-contained lpipsPyTorch package
(``lpipsPyTorch/modules/lpips.py``, ``networks.py:66-96``, ``utils.py:11-30``):
frozen VGG16 conv features at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized
activations, squared differences weighted by learned 1x1 "lin" layers,
spatial + layer mean.

Weights: the reference downloads torchvision VGG16 + richzhang lin weights at
first metrics run. This environment has no network egress and no torchvision,
so weights load from a local ``.npz`` (env ``GS_TPU_LPIPS_WEIGHTS`` or
``~/.cache/gs_tpu/lpips_vgg.npz``). ``convert_torch_weights`` produces that
file on any machine that has torchvision + the lin checkpoint. Without the
file, :func:`lpips_fn` returns ``None`` and metrics report LPIPS as null.

Expected npz keys: ``conv{i}_w`` [KH,KW,Cin,Cout] / ``conv{i}_b`` [Cout] for
the 13 VGG16 convs (i = 0..12), ``lin{j}_w`` [C_j] for the 5 lin layers, and
``mean``/``std`` [3] input normalizers (ImageNet shift/scale, scaled for
[0,1]-range inputs as in lpipsPyTorch).
"""

from __future__ import annotations

import functools
import os

import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer; features taken
# after the ReLU of convs 1, 3, 6, 9, 12 (torchvision indices 3,8,15,22,29)
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_TAP_LAYERS = (1, 3, 6, 9, 12)

DEFAULT_WEIGHTS = os.path.expanduser("~/.cache/gs_tpu/lpips_vgg.npz")


def _weights_path() -> str | None:
    path = os.environ.get("GS_TPU_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    return path if os.path.exists(path) else None


@functools.lru_cache(maxsize=1)
def _load_weights():
    path = _weights_path()
    if path is None:
        return None
    with np.load(path) as z:
        return {k: np.asarray(z[k]) for k in z.files}


def lpips_fn():
    """Returns ``lpips(x, y) -> scalar`` for [3,H,W] pairs in [0,1], or None.

    None means the VGG weights file is unavailable (offline environment).
    """
    w = _load_weights()
    if w is None:
        return None

    import jax
    import jax.numpy as jnp

    mean = jnp.asarray(w["mean"]).reshape(3, 1, 1)
    std = jnp.asarray(w["std"]).reshape(3, 1, 1)

    def features(x):
        # x: [3,H,W] in [0,1] -> list of [C,h,w] tap activations
        x = (x - mean) / std
        x = x[None]  # NCHW
        taps = []
        for i, (_, pool) in enumerate(_VGG_PLAN):
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
            kernel = jnp.asarray(w[f"conv{i}_w"])  # [KH,KW,Cin,Cout]
            bias = jnp.asarray(w[f"conv{i}_b"])
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NCHW", "HWIO", "NCHW")
            )
            x = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
            ) + bias.reshape(1, -1, 1, 1)
            x = jax.nn.relu(x)
            if i in _TAP_LAYERS:
                taps.append(x[0])
        return taps

    def unit_normalize(f):
        norm = jnp.sqrt(jnp.sum(f * f, axis=0, keepdims=True)) + 1e-10
        return f / norm

    @jax.jit
    def lpips(x, y):
        fx, fy = features(x), features(y)
        total = 0.0
        for j, (a, b) in enumerate(zip(fx, fy)):
            diff = (unit_normalize(a) - unit_normalize(b)) ** 2  # [C,h,w]
            lin = jnp.asarray(w[f"lin{j}_w"]).reshape(-1, 1, 1)  # [C,1,1]
            total = total + jnp.mean(jnp.sum(lin * diff, axis=0))
        return total

    return lpips


def convert_torch_weights(out_path: str = DEFAULT_WEIGHTS) -> str:
    """One-time converter: torchvision VGG16 + richzhang lin -> npz.

    Run on a machine with torchvision and network access; copy the npz here.
    """
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity"
           "/master/lpips/weights/v0.1/vgg.pth")
    lin_sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                                map_location="cpu")
    out = {}
    conv_i = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1
    for j in range(5):
        key = f"lin{j}.model.1.weight"
        out[f"lin{j}_w"] = lin_sd[key].detach().numpy().reshape(-1)
    # lpipsPyTorch normalizers for [0,1] inputs (modules/utils.py)
    out["mean"] = np.array([0.485, 0.456, 0.406], np.float32)
    out["std"] = np.array([0.229, 0.224, 0.225], np.float32)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    return out_path
