"""Multi-host distribution contract: the sharded kmermatcher (per-range
extraction + spill + merge + single group/scan, the reference's MPI
design) must be bit-identical to the single-node stage, both in-process
and across real jax.distributed process groups."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.parallel.distributed import (kmermatcher_sharded,
                                                shards_for_process)


def _pref_equal(a, b):
    return (np.array_equal(a.qkey, b.qkey) and np.array_equal(a.tkey, b.tkey)
            and np.array_equal(a.score, b.score)
            and np.array_equal(a.diag, b.diag)
            and np.array_equal(a.starts, b.starts)
            and np.array_equal(a.qkeys, b.qkeys))


def test_sharded_kmermatcher_bit_identical(example_reads):
    db = example_reads.select(np.arange(0, len(example_reads), 20))
    single = kmermatcher(db, 20, 200, 0.2, False)
    for n_shards in (2, 5):
        sharded = kmermatcher_sharded(db, 20, 200, 0.2, False,
                                      n_shards=n_shards)
        assert _pref_equal(single, sharded), n_shards


def test_round_robin_shard_assignment():
    assert shards_for_process(5, 0, 2) == [0, 2, 4]
    assert shards_for_process(5, 1, 2) == [1, 3]
    all_shards = sorted(shards_for_process(7, 0, 3)
                        + shards_for_process(7, 1, 3)
                        + shards_for_process(7, 2, 3))
    assert all_shards == list(range(7))


def test_rescorediagonal_range_decomposition(example_reads):
    """Record-range decomposition + merge == full rescorediagonal run."""
    from carpedeam_tpu.parallel.distributed import (
        decompose_by_residue_count, merge_aln_ranges, rescorediagonal_range)
    from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

    db = example_reads.select(np.arange(0, len(example_reads), 30))
    pref = kmermatcher(db, 20, 200, 0.2, False)
    full = rescorediagonal(db, pref, seq_id_thr=0.9)
    # pref queries are in pref.qkeys order; decompose over their lengths
    key2id = db.key_to_id()
    qlens = db.lengths[[key2id[int(k)] for k in pref.qkeys]]
    ranges = decompose_by_residue_count(qlens, 3)
    parts = [rescorediagonal_range(db, pref, 0.9, rg) for rg in ranges
             if rg[0] < rg[1]]
    merged = merge_aln_ranges(parts)
    assert merged.to_text() == full.to_text()


_WORKER = r"""
import os, sys, pickle
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.parallel import distributed as D

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
shard_dir = sys.argv[4]
D.initialize("localhost:" + port, nproc, pid, local_device_count=2)
db = SeqDB.load(os.path.join(shard_dir, "reads"))
pref = D.process_kmermatcher(db, (20, 200, 0.2, False, 67), shard_dir,
                             pid, nproc, n_shards=4,
                             barrier=D.psum_barrier)
if pid == 0:
    pref.save(os.path.join(shard_dir, "pref_dist"))
print("proc", pid, "done")
"""


@pytest.mark.skipif(os.environ.get("CARPEDEAM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_jax_distributed(example_reads, tmp_path):
    """Two real OS processes in a jax.distributed group split the hash
    ranges, spill shards, barrier, and process 0's merged result equals
    the single-node stage."""
    from carpedeam_tpu.aligndb import PrefDB

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    db = example_reads.select(np.arange(0, len(example_reads), 40))
    db.save(str(tmp_path / "reads"))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = "29817"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for pid in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    dist = PrefDB.load(str(tmp_path / "pref_dist"))
    single = kmermatcher(db, 20, 200, 0.2, False)
    assert _pref_equal(single, dist), outs


@pytest.mark.skipif(os.environ.get("CARPEDEAM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_pipeline(example_reads, tmp_path):
    """Full `ancient_assemble` across two ranks (shared-filesystem
    barrier, CARPEDEAM_RANK/WORLD env — the reference's --mpi-runner
    contract): kmermatcher splits by hash ranges, rescorediagonal by
    record ranges, rank 0 writes, and the final FASTA is byte-identical
    to the single-process run."""
    db = example_reads.select(np.arange(0, len(example_reads), 8))
    db.headers = [f"r{i}" for i in range(len(db))]
    reads = tmp_path / "sub.fasta"
    db.to_fasta(str(reads))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}

    def run(tag, world):
        out = tmp_path / f"{tag}.fasta"
        procs = []
        for rank in range(world):
            e = dict(env)
            if world > 1:
                e["CARPEDEAM_WORLD"] = str(world)
                e["CARPEDEAM_RANK"] = str(rank)
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "carpedeam_tpu.cli",
                 "ancient_assemble", str(reads), str(out),
                 str(tmp_path / f"tmp_{tag}"), "--ancient-damage",
                 "/root/reference/example/dhigh"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=e))
        outs = [p.communicate(timeout=240)[0].decode() for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        return out.read_bytes()

    single = run("single", 1)
    dist = run("dist", 2)
    assert single == dist


def test_world_flag_launcher(example_reads, tmp_path):
    """`ancient_assemble --world 2` spawns + supervises two ranks from
    ONE command (the RUNNER analogue) and the FASTA is byte-identical
    to the single-process run."""
    db = example_reads.select(np.arange(0, len(example_reads), 8))
    db.headers = [f"r{i}" for i in range(len(db))]
    reads = tmp_path / "sub.fasta"
    db.to_fasta(str(reads))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}

    def run(tag, extra):
        out = tmp_path / f"{tag}.fasta"
        p = subprocess.run(
            [sys.executable, "-m", "carpedeam_tpu.cli",
             "ancient_assemble", str(reads), str(out),
             str(tmp_path / f"tmp_{tag}"), "--ancient-damage",
             "/root/reference/example/dhigh", *extra],
            capture_output=True, env=env, timeout=300)
        assert p.returncode == 0, p.stdout + p.stderr
        return out.read_bytes()

    single = run("w1", [])
    world2 = run("w2", ["--world", "2"])
    assert single == world2


def test_world_flag_failure_terminates_group(tmp_path):
    """A failing rank (bad input) must take the whole group down with a
    nonzero exit instead of hanging on the barrier."""
    p = subprocess.run(
        [sys.executable, "-m", "carpedeam_tpu.cli", "ancient_assemble",
         str(tmp_path / "missing.fq"), str(tmp_path / "o.fasta"),
         str(tmp_path / "tmp"), "--ancient-damage",
         "/root/reference/example/dhigh", "--world", "2"],
        capture_output=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert p.returncode != 0
