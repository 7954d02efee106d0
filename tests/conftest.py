"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All tests run on CPU (deterministic, no TPU needed) with 8 virtual devices so
sharding tests exercise real collectives (SURVEY.md §4 test strategy). The
PyTorch reference at /root/reference is imported as the numerical oracle when
present; tests that need it skip cleanly elsewhere.
"""

import os
import sys

# NOTE: on this image the axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME (and jax.config jax_platforms) do force CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def ref():
    """Import the PyTorch reference package as the oracle."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference implementation not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import gaussian_splatting as gs  # noqa: F401

    return gs


@pytest.fixture(scope="session")
def torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def make_scene(rng, n=256, seed_offset=0, dtype=np.float32):
    """Random Gaussians in front of a camera at the origin looking down +z."""
    r = np.random.default_rng(1234 + seed_offset)
    pos = np.stack(
        [
            r.uniform(-2.0, 2.0, n),
            r.uniform(-2.0, 2.0, n),
            r.uniform(3.0, 8.0, n),
        ],
        axis=-1,
    ).astype(dtype)
    scale_raw = (r.normal(0, 0.3, (n, 3)) - 2.0).astype(dtype)
    q_raw = r.normal(0, 1.0, (n, 4)).astype(dtype)
    q_raw[:, 3] += 2.0  # bias toward identity, avoid near-zero quats
    opacity_raw = r.normal(0.5, 1.0, n).astype(dtype)
    f_dc = r.normal(0, 0.8, (n, 3)).astype(dtype)
    f_rest = (r.normal(0, 0.05, (n, 45))).astype(dtype)
    c2w = np.eye(4, dtype=dtype)
    # Slightly rotated / translated camera for generality.
    th = 0.08
    c2w[:3, :3] = np.array(
        [
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ],
        dtype=dtype,
    )
    c2w[:3, 3] = np.array([0.1, -0.05, 0.2], dtype=dtype)
    return {
        "pos": pos,
        "scale_raw": scale_raw,
        "q_raw": q_raw,
        "opacity_raw": opacity_raw,
        "f_dc": f_dc,
        "f_rest": f_rest,
        "c2w": c2w,
    }


@pytest.fixture()
def scene(rng):
    return make_scene(rng)


CAMERA = dict(H=128, W=128, fx=120.0, fy=118.0, cx=64.5, cy=63.5)


@pytest.fixture()
def camera():
    return dict(CAMERA)
