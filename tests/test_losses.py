"""Loss parity tests vs the reference (L1, SSIM, combined)."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops import compute_loss, l1_loss, ssim_loss


def _images(rng):
    pred = rng.uniform(0, 1, (96, 80, 3)).astype(np.float32)
    target = np.clip(pred + rng.normal(0, 0.1, pred.shape), 0, 1).astype(np.float32)
    return pred, target


def test_l1_matches_reference(ref, torch, rng):
    import sys

    sys.path.insert(0, "/root/reference")
    from gaussian_splatting.losses import l1_loss as ref_l1

    pred, target = _images(rng)
    ours = float(l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    theirs = float(ref_l1(torch.from_numpy(pred), torch.from_numpy(target)))
    assert abs(ours - theirs) < 1e-6


def test_ssim_matches_reference(ref, torch, rng):
    import sys

    sys.path.insert(0, "/root/reference")
    from gaussian_splatting.losses import ssim_loss as ref_ssim

    pred, target = _images(rng)
    ours = float(ssim_loss(jnp.asarray(pred), jnp.asarray(target)))
    theirs = float(ref_ssim(torch.from_numpy(pred), torch.from_numpy(target)))
    assert abs(ours - theirs) < 1e-5


def test_compute_loss_matches_reference(ref, torch, rng):
    import sys

    sys.path.insert(0, "/root/reference")
    from gaussian_splatting.losses import compute_loss as ref_compute

    pred, target = _images(rng)
    total, comps = compute_loss(jnp.asarray(pred), jnp.asarray(target), 0.8, 0.2)
    ref_total, ref_comps = ref_compute(
        torch.from_numpy(pred), torch.from_numpy(target), 0.8, 0.2
    )
    assert abs(float(total) - float(ref_total)) < 1e-5
    assert abs(float(comps["l1"]) - ref_comps["l1"]) < 1e-5
    assert abs(float(comps["ssim"]) - ref_comps["ssim"]) < 1e-5


def test_loss_gradients_flow(rng):
    pred, target = _images(rng)

    def f(x):
        total, _ = compute_loss(x, jnp.asarray(target))
        return total

    g = jax.grad(f)(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
