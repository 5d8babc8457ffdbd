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
