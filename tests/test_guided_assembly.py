"""Protein-guided extension (guidedassembleresult port): synthetic
overlap assembly with stop-codon guards."""
import numpy as np

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.guided_assembly import guided_assembly
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

_CODON = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L", "CTT": "L", "CTC": "L",
    "CTA": "L", "CTG": "L", "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V", "TCT": "S", "TCC": "S",
    "TCA": "S", "TCG": "S", "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T", "GCT": "A", "GCC": "A",
    "GCA": "A", "GCG": "A", "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q", "AAT": "N", "AAC": "N",
    "AAA": "K", "AAG": "K", "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W", "CGT": "R", "CGC": "R",
    "CGA": "R", "CGG": "R", "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def _translate(s):
    return "".join(_CODON[s[i:i + 3]] for i in range(0, len(s) - 2, 3))


def _world(seqs):
    nucl = SeqDB.from_sequences(seqs)
    aa = SeqDB.from_sequences([_translate(s) for s in seqs])
    pref = kmermatcher(nucl, 20, 200, 0.2, False)
    aln = rescorediagonal(nucl, pref, seq_id_thr=0.9)
    return nucl, aa, aln


def test_guided_extension_merges_overlaps():
    rng = np.random.default_rng(11)
    genome = "".join("ACG"[b] for b in rng.integers(0, 3, 120))  # no T -> no stops
    a, b = genome[:60], genome[30:]
    nucl, aa, aln = _world([a, b])
    out_n, out_a = guided_assembly(nucl, aa, aln, seq_id_thr=0.9)
    exts = [out_n.seq_str(i) for i in range(2) if out_n.ext[i]]
    assert any(s == genome for s in exts), exts
    # aa DB extended consistently (length = nucl length // 3 of the merge)
    j = [i for i in range(2) if out_n.ext[i]][0]
    assert out_a.ext[j]


def test_guided_extension_blocked_by_stop_codon():
    rng = np.random.default_rng(12)
    core = "".join("ACG"[b] for b in rng.integers(0, 3, 57))
    # query ends with a stop codon (TAA) -> right extension excluded
    a = core + "TAA"
    b = core[27:] + "TAA" + "".join("ACG"[x] for x in rng.integers(0, 3, 27))
    nucl, aa, aln = _world([a, b])
    assert _translate(a)[-1] == "*"
    out_n, _ = guided_assembly(nucl, aa, aln, seq_id_thr=0.9)
    # query 0 must not be right-extended past its stop
    assert out_n.seq_str(0) == a or not out_n.ext[0]
