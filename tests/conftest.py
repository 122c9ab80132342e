"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64."""

import os
import sys

# Must be set before jax import. Force CPU: the ambient environment may
# point JAX_PLATFORMS at the tunneled TPU, which is far too slow for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's axon TPU plugin preimports jax via a .pth hook, so env
# vars set above never reach jax's config init. Set both knobs explicitly
# post-import: tests run on the virtual CPU devices with x64 enabled.
jax.config.update("jax_platforms", "cpu")
# NOTE on precision: the f64() paths fall back to float32 here (x64 off).
# The golden tests against the C oracle pass at f32 (keypoints row-exact,
# descriptors within 2e-3), and enabling x64 tripled compile times on this
# single-core host (28-test suite: 20 min vs ~6). The x64 configuration was
# validated once in full; day-to-day CI runs f32, like the TPU fast path.
# Persistent compilation cache: recompiles dominate test time otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle():
    from tests import oracle as orc_mod
    o = orc_mod.get()
    if o is None:
        pytest.skip("reference oracle unavailable")
    return o


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def make_blob_volume(shape_zyx=(32, 32, 32), n_blobs=None, seed=7,
                     dtype=np.float32):
    """Deterministic smooth synthetic volume: sum of Gaussian blobs."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape_zyx
    if n_blobs is None:
        n_blobs = max(40, nz * ny * nx // 400)
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    vol = np.zeros(shape_zyx, np.float64)
    for _ in range(n_blobs):
        cz, cy, cx = rng.uniform(0, nz), rng.uniform(0, ny), rng.uniform(0, nx)
        sig = rng.uniform(1.2, 4.0)
        amp = rng.uniform(-1.0, 1.0)
        vol += amp * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                            / (2 * sig * sig))
    return vol.astype(dtype)
