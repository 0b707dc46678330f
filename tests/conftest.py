import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4 test plan (c)).
# Force CPU even when the environment routes JAX at a (tunneled) TPU — tests
# must be hermetic and fast; TPU execution is covered by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lps_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize imports jax at interpreter startup (before pytest),
# so the env vars above are too late for jax's config snapshot — go through
# jax.config, which works because backend init is lazy.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


REFERENCE_BIN = "/root/repo/.refbuild/longphase-s"


@pytest.fixture(scope="session")
def reference_binary():
    if not os.path.exists(REFERENCE_BIN):
        pytest.skip("reference binary not built")
    return REFERENCE_BIN


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    from longphase_s_tpu.testing.simulate import make_fixture

    out = tmp_path_factory.mktemp("fix_small")
    return make_fixture(str(out), seed=7, length=120000, coverage=20,
                        read_len=12000, snp_rate=0.001)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: exercises the real accelerator (skipped when no "
        "backend is reachable)")
