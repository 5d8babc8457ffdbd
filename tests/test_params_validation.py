"""Flag validation + friendly CLI errors (the reference's per-flag regex
validation, lib/mmseqs/src/commons/Parameters.cpp parseParameters)."""
import pytest

from carpedeam_tpu.cli import main
from carpedeam_tpu.params import ParamError, Params


def test_defaults_validate():
    Params().validate()


@pytest.mark.parametrize("field,value", [
    ("seq_id_thr", 1.7), ("seq_id_thr", -0.1),
    ("kmer_size_reads", 40), ("kmer_size_reads", 2),
    ("kmer_size_reads", 32),            # strand flag needs bit 63 free
    ("random_align_penal", 0.0), ("excess_penal", -0.5),
    ("kmers_per_sequence_scale", -0.1),
    ("compressed", 2), ("split_memory_limit", "10Q"),
    ("split_memory_limit", "-5G"), ("protein_filter_threshold", 1.5),
    ("filter_proteins", 3),
    ("num_iterations", 0), ("threads", 0),
    ("num_iterations_reads", 99),       # > num_iterations
    ("eval_thr", -1.0), ("use_device", "gpu"),
    ("cov_mode", 7), ("verbosity", 9),
])
def test_bad_values_raise_named_flag(field, value):
    with pytest.raises(ParamError):
        Params().copy(**{field: value}).validate()


def test_cli_invalid_flag_exits_cleanly(capsys):
    rc = main(["ancient_assemble", "in.fq", "out.fa", "tmp",
               "--min-seq-id", "1.7"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "--min-seq-id" in err and "Traceback" not in err


def test_cli_missing_input_exits_cleanly(capsys):
    rc = main(["ancient_assemble", "/nonexistent_dir/reads.fq",
               "out.fa", "tmp"])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_user_flags_override_workflow_defaults():
    """The reference applies workflow defaults BEFORE parseParameters
    (GuidedNuclassembler.cpp:45 vs :83), so an explicit --num-iterations
    12 must survive ancient_assemble's guided overrides."""
    import argparse

    from carpedeam_tpu.params import Params, add_flags, params_from_args

    ap = argparse.ArgumentParser()
    add_flags(ap)
    args = ap.parse_args(["--num-iterations", "12", "--unsafe", "1"])
    p = params_from_args(args)
    assert "num_iterations" in p.explicit
    g = p.copy_defaults(num_iterations=10, num_iterations_reads=5,
                        max_seq_len=200000)
    assert g.num_iterations == 12          # user flag wins
    assert g.num_iterations_reads == 5     # workflow default applies
    assert g.max_seq_len == 200000
    # and the checkpoint hash ignores the parse metadata
    q = p.copy(explicit=frozenset())
    assert p.hash() == q.hash()
