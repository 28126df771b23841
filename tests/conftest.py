"""Test configuration: CPU-only JAX with 8 virtual devices for sharding tests.

Must set flags before jax is imported anywhere.
"""

import os
import pathlib
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402

DATA = pathlib.Path("/root/reference/examples/data")
GOLDEN = REPO / "tests" / "golden"
IDX_TGZ = DATA / "hg19.small.tar.gz"
IDX_DIR = pathlib.Path("/tmp/ref")
IDX_PREFIX = IDX_DIR / "hg19.small.fa"


def _ensure_index():
    if not IDX_PREFIX.with_suffix(".fa.bwt").exists():
        IDX_DIR.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["tar", "xzf", str(IDX_TGZ), "-C", str(IDX_DIR)], check=True
        )
    return str(IDX_PREFIX)


@pytest.fixture(scope="session")
def idx_prefix():
    return _ensure_index()


@pytest.fixture(scope="session")
def index(idx_prefix):
    from mpibwa_tpu.index import format as fmt

    return fmt.load_index(idx_prefix)


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def fastq_path(name: str) -> pathlib.Path:
    return DATA / name


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running full-dataset tests")
    config.addinivalue_line(
        "markers",
        "huge: GRCh38-scale (>=2^31 positions) builds, ~40 min + ~60 GB RAM")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return
    skip = pytest.mark.skip(reason="slow; run with -m slow")
    skip_huge = pytest.mark.skip(reason="huge; run with -m huge")
    for item in items:
        if "huge" in item.keywords:
            item.add_marker(skip_huge)
        elif "slow" in item.keywords:
            item.add_marker(skip)
