import os
import sys

# Force CPU JAX with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (tests never touch the real chip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# small shape buckets: XLA-CPU compile time scales with the padded shapes,
# and tests only exercise semantics, not production batch sizes
os.environ.setdefault("CARPEDEAM_PAIR_BUCKET", "2048")
os.environ.setdefault("CARPEDEAM_POS_BUCKET", "8192")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# A site hook may force an accelerator platform into jax.config (overriding
# JAX_PLATFORMS); pin the config itself so tests genuinely run on the
# 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_EXAMPLE = "/root/reference/example"
GOLDEN = "/root/repo/.golden"


@pytest.fixture(scope="session")
def example_reads():
    from carpedeam_tpu.io import SeqDB
    return SeqDB.from_fastx(os.path.join(REF_EXAMPLE, "test_data.fq.gz"))


@pytest.fixture(scope="session")
def damage_model():
    from carpedeam_tpu.damage import DamageModel
    return DamageModel.load(os.path.join(REF_EXAMPLE, "dhigh"))


def golden_tmp():
    """Path to the reference run's nuclassemble tmp dir (all intermediates),
    or None if the golden run has not been produced on this machine."""
    base = os.path.join(GOLDEN, "tmp2")
    if not os.path.isdir(base):
        return None
    for d1 in os.listdir(base):
        nt = os.path.join(base, d1, "nuclassembly_tmp")
        if os.path.isdir(nt):
            for d2 in os.listdir(nt):
                if os.path.isfile(os.path.join(nt, d2, "pref_0.dbtype")):
                    return os.path.join(nt, d2)
    return None


needs_golden = pytest.mark.skipif(golden_tmp() is None,
                                  reason="reference golden run not available")
