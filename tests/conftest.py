"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (the standard JAX fake-multi-device trick).
Must run before jax initializes its backends.
"""
import os

# Force override: the image's sitecustomize pins JAX_PLATFORMS=axon (TPU) and
# may import jax before this file runs, so set both the env var and the config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full oracle-parity + multi-epoch "
             "sweeps; default suite measures ~30 min on this 4-core "
             "host — 197 tests, r5)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_scene(rng, n_views=3, h=16, w=24, noise=0.1):
    """Random-but-sane multi-view camera setup for geometry tests."""
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]], np.float32)
    Ks, Rs, ts = [], [], []
    for i in range(n_views):
        angle = noise * (rng.random(3) - 0.5)
        cx, sx = np.cos(angle[0]), np.sin(angle[0])
        cy, sy = np.cos(angle[1]), np.sin(angle[1])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        R = (Rx @ Ry).astype(np.float32)
        t = (0.3 * (rng.random((3, 1)) - 0.5)).astype(np.float32)
        Ks.append(K.copy())
        Rs.append(R)
        ts.append(t)
    return (np.stack(Ks), np.stack(Rs), np.stack(ts))


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_state():
    """Clear jax's in-process compilation caches between test MODULES.

    The full suite accumulates hundreds of compiled CPU executables (plus
    torch state from the reference-oracle tests); past ~160 tests the XLA
    CPU client has been observed aborting inside a later compile. Bounding
    the cache keeps per-module state independent; recompiles within a
    module are unaffected.
    """
    yield
    import gc
    jax.clear_caches()
    gc.collect()
