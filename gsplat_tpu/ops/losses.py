"""L1 + SSIM training losses.

Reimplements /root/reference/gaussian_splatting/losses.py:27-185 semantics:

* L1 = mean |pred - target|,
* SSIM with an 11x11 Gaussian window (sigma=1.5), C1=0.01^2, C2=0.03^2,
  zero ("same") padding, computed per channel and averaged,
* combined loss = lambda_l1 * L1 + lambda_ssim * (1 - SSIM).

TPU design: the reference loops over channels calling conv2d once per channel
per statistic; here all channels and all five filtered statistics
(mu1, mu2, E[p^2], E[t^2], E[pt]) go through ONE depthwise
`lax.conv_general_dilated` with feature_group_count, which XLA maps onto the
convolution units in a single fused pass. The Gaussian window is separable but
11x11 is small enough that one 2D depthwise conv is fastest on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    import numpy as np

    coords = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return (g[:, None] * g[None, :]).astype(np.float32)


def gaussian_window(window_size: int = 11, sigma: float = 1.5, dtype=jnp.float32):
    """[window_size, window_size] normalized Gaussian window."""
    return jnp.asarray(_gaussian_window_np(window_size, sigma), dtype=dtype)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error."""
    return jnp.mean(jnp.abs(pred - target))


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' (zero-padded) 2D filter.

    Args:
        x: [B, C, H, W]
        window: [k, k]
    """
    c = x.shape[1]
    k = window.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (c, 1, k, k))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM between images in [B?, H, W, C] layout (matches reference).

    Uses zero padding like the reference's F.conv2d(padding=k//2)
    (losses.py:112-122), so border statistics match bit-for-bit in spirit.
    """
    if pred.ndim == 3:
        pred = pred[None]
        target = target[None]
    # [B, H, W, C] -> [B, C, H, W]
    p = jnp.transpose(pred, (0, 3, 1, 2))
    t = jnp.transpose(target, (0, 3, 1, 2))
    window = gaussian_window(window_size, sigma, p.dtype)

    c1 = 0.01**2
    c2 = 0.03**2

    # One fused depthwise pass over the 5 statistics, stacked on batch axis.
    stats = jnp.concatenate([p, t, p * p, t * t, p * t], axis=0)
    f = _depthwise_blur(stats, window)
    b = p.shape[0]
    mu1, mu2, e_pp, e_tt, e_pt = (f[i * b : (i + 1) * b] for i in range(5))

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = e_pp - mu1_sq
    sigma2_sq = e_tt - mu2_sq
    sigma12 = e_pt - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    # Reference averages per channel then means over channels — identical to a
    # global mean since channels have equal pixel counts.
    return jnp.mean(ssim_map)


def ssim_loss(pred, target, window_size: int = 11) -> jnp.ndarray:
    return 1.0 - ssim(pred, target, window_size)


def compute_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lambda_l1: float = 0.8,
    lambda_ssim: float = 0.2,
):
    """Combined loss; returns (total, {'l1', 'ssim', 'total'}) like the
    reference losses.py:158-185 (components as jnp scalars, not floats)."""
    l1 = l1_loss(pred, target)
    s = ssim_loss(pred, target)
    total = lambda_l1 * l1 + lambda_ssim * s
    return total, {"l1": l1, "ssim": s, "total": total}
