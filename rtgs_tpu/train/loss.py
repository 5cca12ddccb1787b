"""Training losses: L1 + D-SSIM, the recipe the reference's stub names
(``/root/reference/src/rtgs/solver.py:28-31`` TODO: "Compute loss (L1 loss
and D-SSIM loss)") and the standard 3DGS objective:

    L = (1 − λ) · L1 + λ · (1 − SSIM),   λ = 0.2.

SSIM uses the standard 11×11 Gaussian window (σ = 1.5), implemented as two
separable 1-D convolutions so XLA maps it onto fused VPU passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def l1_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img - target))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    w = jnp.exp(-(x**2) / (2 * sigma**2))
    return w / jnp.sum(w)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable 'same' convolution over the two leading spatial axes of an
    (W, H, C) image."""
    k = window.shape[0]
    pad = k // 2

    def conv1d(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
        # (..., L + 2p) ⊛ (k,) via strided windows.
        out = jnp.zeros_like(x)
        for i in range(k):
            out = out + window[i] * jax.lax.dynamic_slice_in_dim(
                xp, i, x.shape[-1], axis=-1)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 0), 1)


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img: jnp.ndarray, target: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, c1: float = 0.01**2, c2: float = 0.03**2):
    """Mean SSIM between two (W, H, C) images in [0, 1]."""
    w = _gaussian_window(window_size, sigma)
    mu1, mu2 = _blur(img, w), _blur(target, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img * img, w) - mu1_sq
    s2 = _blur(target * target, w) - mu2_sq
    s12 = _blur(img * target, w) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


def render_loss(img: jnp.ndarray, target: jnp.ndarray,
                lambda_dssim: float = 0.2) -> jnp.ndarray:
    """The 3DGS objective: (1−λ)·L1 + λ·(1−SSIM)."""
    return ((1 - lambda_dssim) * l1_loss(img, target)
            + lambda_dssim * (1 - ssim(img, target)))


def psnr(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
