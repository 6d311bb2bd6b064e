import os
import sys

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.  NOTE: this
# environment pins JAX_PLATFORMS=axon via sitecustomize, so the env var must
# be overridden *and* jax.config updated after import (see below).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one XLA compile cache shared by every CLI subprocess the tests spawn
# (each test's throwaway index dir would otherwise recompile everything)
os.environ.setdefault(
    "MOVI_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".xla_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["MOVI_TPU_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DATA = "/root/reference/tests_data"


def _ref_data_available():
    return os.path.exists(os.path.join(REF_DATA, "ref.fasta"))


requires_ref_data = pytest.mark.skipif(
    not _ref_data_available(), reason="reference tests_data not mounted"
)


@pytest.fixture(scope="session")
def bwt_runs():
    from movi_tpu.build.prepare_ref import prepare_ref
    from movi_tpu.build.suffix import build_bwt_runs

    ref = prepare_ref(os.path.join(REF_DATA, "ref.fasta"))
    return build_bwt_runs(ref.text)


@pytest.fixture(scope="session")
def index_regular_thr(bwt_runs):
    from movi_tpu.index.structure import build_move_index

    return build_move_index(bwt_runs, "regular-thresholds")


@pytest.fixture(scope="session")
def sample_reads():
    from movi_tpu.io.fastx import iter_fastx

    return list(iter_fastx(os.path.join(REF_DATA, "sample.fastq")))


@pytest.fixture(scope="session")
def golden_pmls_sorted():
    with open(os.path.join(REF_DATA, "sample.fastq.pmls.sorted")) as f:
        return f.read()
