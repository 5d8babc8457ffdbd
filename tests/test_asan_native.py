"""AddressSanitizer gate for the native kernels (the reference's ASan CI
build, azure-pipelines.yml sanitizer job).

Builds the same native TUs with -fsanitize=address into a separate
shared object and runs representative kernels through it in a
subprocess (libasan preloaded); ASan aborts the subprocess on any
out-of-bounds access / use-after-free, so exit status is the verdict.
"""
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
NATIVE = os.path.join(ROOT, "carpedeam_tpu", "native")

DRIVER = r"""
import os, sys
sys.path.insert(0, os.environ["CARPEDEAM_REPO"])
import numpy as np
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu import native
from carpedeam_tpu.params import Params
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.read_assembly import read_assembly
from carpedeam_tpu.ops.banded_align import banded_align
from carpedeam_tpu.ops.rescore_tpu import pack_sequences
from carpedeam_tpu.damage import DamageModel

assert native.get_lib() is not None, "asan native lib not loaded"
db_full = SeqDB.from_fastx("/root/reference/example/test_data.fq.gz")
db = db_full.select(np.arange(4000))
dm = DamageModel.load("/root/reference/example/dhigh")
p = Params()
pref = kmermatcher(db, p.kmer_size_reads, p.kmers_per_sequence,
                   p.kmers_per_sequence_scale,
                   p.include_only_extendable_reads, p.hash_shift)
aln = rescorediagonal(db, pref, p.seq_id_thr, p.eval_thr, p.aln_len_thr)
corr = correction(db, aln, dm, p.corr_reads_ry_seq_id, p.seq_id_thr)
out = read_assembly(corr, aln, dm, p.seq_id_thr, p.ry_seq_id_thr,
                    p.likelihood_threshold, p.random_align_penal,
                    p.excess_penal, p.max_seq_len, False, p.min_cov_safe)
assert len(out) == len(db)
pack_sequences(db, max_len=128)
rng = np.random.default_rng(0)
q = rng.integers(0, 4, 200).astype(np.uint8)
t = np.concatenate([q[:90], rng.integers(0, 4, 3).astype(np.uint8),
                    q[90:]])
banded_align(q, t)
print("ASAN-DRIVER-OK")
"""


def _libasan():
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, check=True)
        path = out.stdout.strip()
        return path if os.path.sep in path and os.path.exists(path) \
            else None
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


@pytest.mark.skipif(_libasan() is None, reason="no libasan on toolchain")
def test_native_kernels_clean_under_asan(tmp_path):
    srcs = [os.path.join(NATIVE, f) for f in sorted(os.listdir(NATIVE))
            if f.endswith(".cpp")]
    so = os.path.join(str(tmp_path), "_native_asan.so")
    subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address", "-fno-omit-frame-pointer",
         "-shared", "-fPIC", "-std=c++17", "-fopenmp", *srcs, "-o", so],
        check=True, capture_output=True)
    env = dict(os.environ)
    env.update({
        "CARPEDEAM_NATIVE_SO": so,
        "CARPEDEAM_REPO": ROOT,
        "LD_PRELOAD": _libasan(),
        # ctypes/numpy hold allocations past exit; leak checking would
        # only report interpreter noise
        "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
        "JAX_PLATFORMS": "cpu",
    })
    proc = subprocess.run([sys.executable, "-c", DRIVER], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ASAN-DRIVER-OK" in proc.stdout
